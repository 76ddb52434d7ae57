"""Fused Pallas decode (kernels/pallas_decode.py) parity vs the XLA core.

Runs the three-kernel fused pipeline in Pallas interpret mode on CPU and
compares its compact planar output against decode_seg_core's sequential
gather-free core (nerf_impl="xla") — the parity oracle the fused kernels
mirror operation-for-operation. The only accepted deviation is the
compact wire's own +-1 milli-angstrom offset quantum (the fused reverse
pass skips the acos->cos round-trip the XLA core performs, a ~1 ulp
identity; see pallas_decode._bond_angle_cs).

On TPU hardware the same kernels run compiled (tools/exp_fused_bench.py);
the driver's bench exercises that path.
"""
import numpy as np
import pytest

from foldcomp_tpu.codec import fcz
from foldcomp_tpu.codec.batch import pack_decode_batch_seg
from foldcomp_tpu.codec.encoder import encode
from foldcomp_tpu.kernels.decode import decode_seg_core
from foldcomp_tpu.kernels.pallas_decode import decode_seg_fused

from conftest import require_fixture


@pytest.fixture(scope="module")
def fcz_pair(ref_test_dir):
    """Two differently-sized payloads exercising ragged lanes."""
    from foldcomp_tpu.io.pdb import parse_pdb
    from foldcomp_tpu.io.structure import (identify_chains,
                                           identify_discontinuous_fragments,
                                           remove_alternative_positions)
    out = []
    for name in ("test.pdb", "test_af.pdb"):
        atoms = remove_alternative_positions(
            parse_pdb(require_fixture(name).read_bytes()))
        (cs, ce), = identify_chains(atoms)
        (fs, fe), = identify_discontinuous_fragments(atoms, cs, ce)
        out.append(encode(atoms.slice(fs, fe)))
    return out


def test_fused_matches_xla_core(fcz_pair):
    fczs = [fcz_pair[0], fcz_pair[1], fcz_pair[0]]
    arrays, metas = pack_decode_batch_seg(fczs)
    r = sum(m.n_residue for m in metas)

    off_f, ca_f = decode_seg_fused(
        arrays["seg_records"], arrays["mins_lane"], arrays["cont_lane"],
        arrays["sc_codes_seg"], arrays["anchor_xyz"], arrays["seg_m"],
        arrays["res_index"], interpret=True)
    off_x, ca_x = decode_seg_core(
        arrays["seg_records"], arrays["mins_lane"], arrays["cont_lane"],
        arrays["sc_codes_seg"], arrays["anchor_xyz"], arrays["seg_m"],
        res_index=arrays["res_index"], refine_iters=2, nerf_impl="xla",
        gather_free=True, compact=True, sc_impl="select")

    off_f = np.asarray(off_f)[:, :, :r].astype(np.int32)
    off_x = np.asarray(off_x)[:, :, :r].astype(np.int32)
    ca_f, ca_x = np.asarray(ca_f)[:, :r], np.asarray(ca_x)[:, :r]

    assert np.abs(ca_f - ca_x).max() < 1e-3
    assert np.abs(off_f - off_x).max() <= 1          # the wire quantum

    co_f = off_f / 1000.0 + ca_f[:, None, :]
    co_x = off_x / 1000.0 + ca_x[:, None, :]
    assert np.abs(co_f - co_x).max() < 2.5e-3


def test_fused_roundtrip_rmsd(fcz_pair, ref_test_dir):
    """Decoded coordinates through the fused path stay inside the
    reference all-atom RMSD gate (build.sh:34-38)."""
    from foldcomp_tpu.codec.decoder import decode
    from foldcomp_tpu.core.exact import rmsd
    from foldcomp_tpu.io.pdb import parse_pdb
    from foldcomp_tpu.io.structure import remove_alternative_positions
    from foldcomp_tpu.kernels.sidechain import atom_mask

    f = fcz_pair[0]
    arrays, metas = pack_decode_batch_seg([f])
    off, ca = decode_seg_fused(
        arrays["seg_records"], arrays["mins_lane"], arrays["cont_lane"],
        arrays["sc_codes_seg"], arrays["anchor_xyz"], arrays["seg_m"],
        arrays["res_index"], interpret=True)
    m = metas[0]
    r = m.n_residue
    coords = (np.asarray(off)[:, :, :r].astype(np.float32) / 1000.0
              + np.asarray(ca)[:, None, :r])          # [3, 14, R]
    atom14 = np.transpose(coords, (2, 1, 0))          # [R, 14, 3]

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
