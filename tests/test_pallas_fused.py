"""Fused Pallas decode (kernels/pallas_decode.py) parity vs the XLA core.

Runs the three-kernel fused pipeline in Pallas interpret mode on CPU
over the RAGGED-lane pack (codec/batch.py pack_decode_batch_lanes) and
compares per-protein reconstructed atoms against decode_seg_core's
sequential gather-free core (nerf_impl="xla") on the [B, S]-grid pack —
the parity oracle the fused kernels mirror operation-for-operation. The
only accepted deviation is the compact wire's own +-1 milli-angstrom
offset quantum (the fused reverse pass skips the acos->cos round-trip
the XLA core performs, a ~1 ulp identity; see
pallas_decode._bond_angle_cs).

On TPU hardware the same kernels run compiled (tools/exp_fused_check.py,
tools/exp_fused_bench.py); the driver's bench exercises that path.
"""
import numpy as np
import pytest

from foldcomp_tpu.codec.batch import (_gather_a14, pack_decode_batch_lanes,
                                      pack_decode_batch_seg)
from foldcomp_tpu.codec.encoder import encode
from foldcomp_tpu.kernels.decode import decode_seg_core
from foldcomp_tpu.kernels.pallas_decode import decode_seg_fused

from conftest import require_fixture


def _encode_fixture(name):
    from foldcomp_tpu.io.pdb import parse_pdb
    from foldcomp_tpu.io.structure import (identify_chains,
                                           identify_discontinuous_fragments,
                                           remove_alternative_positions)
    atoms = remove_alternative_positions(
        parse_pdb(require_fixture(name).read_bytes()))
    (cs, ce), = identify_chains(atoms)
    (fs, fe), = identify_discontinuous_fragments(atoms, cs, ce)
    return encode(atoms.slice(fs, fe))


@pytest.fixture(scope="module")
def fcz_pair(ref_test_dir):
    """Two differently-sized payloads exercising ragged lanes."""
    return [_encode_fixture("test.pdb"), _encode_fixture("test_af.pdb")]


def _run_fused(fczs):
    arrays, metas = pack_decode_batch_lanes(fczs)
    off, ca = decode_seg_fused(
        arrays["seg_records"], arrays["mins_lane"], arrays["cont_lane"],
        arrays["sc_codes_seg"], arrays["fwd9"], arrays["rev9"],
        arrays["is_first"], arrays["seg_m"], interpret=True)
    return (np.asarray(off), np.asarray(ca)), metas


def _run_xla(fczs):
    arrays, metas = pack_decode_batch_seg(fczs)
    off, ca = decode_seg_core(
        arrays["seg_records"], arrays["mins_lane"], arrays["cont_lane"],
        arrays["sc_codes_seg"], arrays["anchor_xyz"], arrays["seg_m"],
        res_index=arrays["res_index"], refine_iters=2, nerf_impl="xla",
        gather_free=True, compact=True, sc_impl="select")
    return (np.asarray(off), np.asarray(ca)), metas


def test_fused_matches_xla_core(fcz_pair):
    fczs = [fcz_pair[0], fcz_pair[1], fcz_pair[0]]
    outs_f, metas_f = _run_fused(fczs)
    outs_x, metas_x = _run_xla(fczs)
    for mf, mx in zip(metas_f, metas_x):
        a_f = _gather_a14(outs_f, mf)
        a_x = _gather_a14(outs_x, mx)
        assert a_f.shape == a_x.shape
        # both wires quantize offsets to 1 mA around f32 CA
        assert np.abs(a_f - a_x).max() < 2.5e-3


def test_fused_roundtrip_rmsd(fcz_pair, ref_test_dir):
    """Decoded coordinates through the fused path stay inside the
    reference all-atom RMSD gate (build.sh:34-38)."""
    from foldcomp_tpu.codec.decoder import decode
    from foldcomp_tpu.core.exact import rmsd
    from foldcomp_tpu.io.pdb import parse_pdb
    from foldcomp_tpu.io.structure import remove_alternative_positions
    from foldcomp_tpu.kernels.sidechain import atom_mask

    f = fcz_pair[0]
    outs, metas = _run_fused([f])
    m = metas[0]
    atom14 = _gather_a14(outs, m)                     # [n, 14, 3]

    mask = np.asarray(atom_mask(m.res_code))
    got = atom14[mask]

    exact = decode(f)
    orig = remove_alternative_positions(
        parse_pdb((ref_test_dir / "test.pdb").read_bytes()))
    n = min(len(got), exact.coords.shape[0])
    d = np.abs(got[:n] - exact.coords[:n]).max()
    assert d < 5e-3, f"fused decode deviates {d} A from exact decoder"

    r_gate = rmsd(got[:n], orig.coords[:n])
    assert abs(r_gate - 0.0826751) < 1.5e-3


def test_lanes_pack_matches_seg_pack_metadata(fcz_pair):
    """The ragged pack's per-residue (lane, rec) map reaches the same
    records as the [B, S]-grid pack's."""
    fczs = [fcz_pair[1], fcz_pair[0]]
    al, ml = pack_decode_batch_lanes(fczs)
    as_, ms = pack_decode_batch_seg(fczs)
    for a, b in zip(ml, ms):
        assert a.n_residue == b.n_residue
        assert np.array_equal(a.rec_of, b.rec_of)
        assert np.array_equal(a.res_code, b.res_code)
        assert np.allclose(a.temp, b.temp)
    # lane window contents agree lane-for-lane (ragged vs grid ids);
    # the lanes pack is byte-plane-major [8, SEG, NL] (round 5: the
    # kernels unpack in VMEM), the grid pack stays [SEG, N, 8]
    segw = al["seg_records"].shape[1]
    assert segw == as_["seg_records"].shape[0]
    for a, b in zip(ml, ms):
        recs_l = np.transpose(al["seg_records"][:, :, a.lane_of],
                              (1, 2, 0))
        recs_s = as_["seg_records"][:, b.lane_of, :]
        assert np.array_equal(recs_l, recs_s)
