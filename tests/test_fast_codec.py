"""Batched (TPU fast-path) codec vs the exact host codec.

The fast path runs plain float32 on device; parity targets are
quantization-level, not byte-level: record bins may flip only at ~1-ulp
boundaries, decoded coordinates must stay far inside the reference CI RMSD
gate (build.sh:34-38: 0.0826751 +/- 0.001 for test.pdb).
"""
import numpy as np
import pytest

from foldcomp_tpu.codec import fcz
from foldcomp_tpu.codec.batch import decode_fcz_batch, encode_fragment_batch
from foldcomp_tpu.codec.decoder import decode as decode_exact
from foldcomp_tpu.codec.encoder import encode as encode_exact
from foldcomp_tpu.core.exact import rmsd
from foldcomp_tpu.io.pdb import parse_pdb
from foldcomp_tpu.io.structure import (identify_chains,
                                       identify_discontinuous_fragments,
                                       remove_alternative_positions)

from conftest import require_fixture


def _load_fragment(path):
    atoms = parse_pdb(path.read_bytes())
    atoms = remove_alternative_positions(atoms)
    (cs, ce), = identify_chains(atoms)
    (fs, fe), = identify_discontinuous_fragments(atoms, cs, ce)
    return atoms.slice(fs, fe)


@pytest.fixture(scope="module")
def test_pdb_fragment():
    return _load_fragment(require_fixture("test.pdb"))


@pytest.fixture(scope="module")
def test_af_fcz():
    return fcz.parse(require_fixture("test_af.fcz").read_bytes())


def test_fast_decode_matches_exact(test_af_fcz):
    exact = decode_exact(test_af_fcz)
    fast = decode_fcz_batch([test_af_fcz], refine_iters=2)[0]
    assert exact.atom_name == fast.atom_name
    assert np.abs(exact.coords - fast.coords).max() < 1e-3
    assert np.abs(np.asarray(exact.temp_factor)
                  - np.asarray(fast.temp_factor)).max() < 1e-3


def test_fast_decode_large(test_pdb_fragment):
    f = encode_exact(test_pdb_fragment)
    exact = decode_exact(f)
    fast = decode_fcz_batch([f], refine_iters=2)[0]
    assert exact.atom_name == fast.atom_name
    # max atom deviation well below the quantization noise floor
    assert np.abs(exact.coords - fast.coords).max() < 0.02
    assert rmsd(exact.coords, fast.coords) < 2e-3


def test_fast_roundtrip_rmsd_gate(test_pdb_fragment):
    """Fast encode + fast decode must hold the reference all-atom RMSD gate."""
    f = encode_fragment_batch([test_pdb_fragment])[0]
    dec = decode_fcz_batch([f], refine_iters=2)[0]
    # pair decoded atoms against the source by order (both canonical)
    n = min(len(dec), len(test_pdb_fragment))
    r = rmsd(test_pdb_fragment.coords[:n], dec.coords[:n])
    assert abs(r - 0.0826751) < 1e-3, r


def test_fast_encode_bins_match_exact(test_pdb_fragment):
    """The fast encoder is BIT-IDENTICAL to the exact encoder: the device
    computes the f32 angle parts, the host finishes with the reference's
    f64-promoted acos (torsion_angle.cpp:63-65) and exact quantization,
    and near-boundary side-chain values are rescued by exact host
    recompute (codec/batch.py finish_encode_host)."""
    f_exact = encode_exact(test_pdb_fragment)
    f_fast = encode_fragment_batch([test_pdb_fragment])[0]
    assert f_fast.n_residue == f_exact.n_residue
    assert f_fast.n_sc_torsion == f_exact.n_sc_torsion
    assert (f_fast.anchor_indices == f_exact.anchor_indices).all()
    assert np.array_equal(f_fast.anchor_coords, f_exact.anchor_coords)
    assert np.array_equal(f_fast.mins, f_exact.mins)
    assert np.array_equal(f_fast.cont_fs, f_exact.cont_fs)
    assert np.array_equal(f_fast.records, f_exact.records)
    assert np.array_equal(f_fast.sc_codes, f_exact.sc_codes)
    assert np.array_equal(f_fast.tf_codes, f_exact.tf_codes)
    assert fcz.serialize(f_fast) == fcz.serialize(f_exact)


def test_fast_encode_byte_parity_all_fixtures():
    """Every fixture fragment serializes byte-identically via the fast
    (batched device) encoder."""
    frags = []
    for name in ("test.pdb", "test_af.pdb", "multichain.pdb"):
        atoms = parse_pdb(require_fixture(name).read_bytes())
        atoms = remove_alternative_positions(atoms)
        for cs, ce in identify_chains(atoms):
            for fs, fe in identify_discontinuous_fragments(atoms, cs, ce):
                f = atoms.slice(fs, fe)
                if len(f) > 6:
                    frags.append(f)
    assert len(frags) >= 4
    fasts = encode_fragment_batch(frags)
    for frag, ff in zip(frags, fasts):
        assert fcz.serialize(ff) == fcz.serialize(encode_exact(frag)), \
            frag.title


def test_fast_batch_mixed_lengths(test_pdb_fragment, test_af_fcz):
    """A ragged batch (28-residue + 736-residue proteins) decodes correctly."""
    f_big = encode_exact(test_pdb_fragment)
    batch = decode_fcz_batch([test_af_fcz, f_big, test_af_fcz],
                             refine_iters=2)
    singles = [decode_fcz_batch([f], refine_iters=2)[0]
               for f in (test_af_fcz, f_big, test_af_fcz)]
    for got, want in zip(batch, singles):
        assert got.atom_name == want.atom_name
        assert np.abs(got.coords - want.coords).max() < 1e-4


def test_fast_encoded_bytes_decode_with_exact_decoder(test_pdb_fragment):
    """Serialized fast-encoded FCZ parses and decodes via the exact path."""
    f_fast = encode_fragment_batch([test_pdb_fragment])[0]
    blob = fcz.serialize(f_fast)
    f2 = fcz.parse(blob)
    dec = decode_exact(f2)
    n = min(len(dec), len(test_pdb_fragment))
    r = rmsd(test_pdb_fragment.coords[:n], dec.coords[:n])
    assert abs(r - 0.0826751) < 1e-3, r


def test_sidechain_onehot_bit_parity():
    """place_sidechains_onehot_c (one-hot MXU lookups + distinct-value
    selects) is bit-identical to the select-chain form on random lanes."""
    from foldcomp_tpu.kernels.sidechain import (place_sidechains_c,
                                                place_sidechains_onehot_c)

    rng = np.random.default_rng(7)
    s, n = 24, 192
    bbx = rng.normal(0, 5, (3, s, n)).astype(np.float32)
    bby = rng.normal(0, 5, (3, s, n)).astype(np.float32)
    bbz = rng.normal(0, 5, (3, s, n)).astype(np.float32)
    code = rng.integers(0, 24, (s, n)).astype(np.int32)
    sc_t = rng.uniform(-180, 180, (11, s, n)).astype(np.float32)
    a = place_sidechains_c(bbx, bby, bbz, code, sc_t, gather_free=True)
    b = place_sidechains_onehot_c(bbx, bby, bbz, code, sc_t)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_stream_ragged_tail_padding(test_pdb_fragment):
    """decode_fcz_stream pads partial tail batches to the jit batch size
    (a ragged batch dim would compile a fresh device program per distinct
    remainder); outputs stay complete, in input order, no padding leaks."""
    from foldcomp_tpu.codec.batch import decode_fcz_stream

    f = encode_exact(test_pdb_fragment)
    n = 11                                   # not a multiple of batch_size=4
    payloads = []
    for i in range(n):
        p = fcz.parse(fcz.serialize(f))
        p.tag = i
        payloads.append(p)
    got = list(decode_fcz_stream(iter(payloads), batch_size=4,
                                 bucket_window=2))
    assert [p.tag for p, _ in got] == list(range(n))
    assert len({t for _, t in got}) == 1     # identical inputs, one text
    exact_text = got[0][1]
    assert exact_text.count("ATOM") >= test_pdb_fragment.coords.shape[0] // 14


def test_div1000_cr_exhaustive_sample():
    """The correctly-rounded /1000 matches numpy across a dense sample.

    The full +/- int24 domain was verified exhaustively on both the TPU
    and CPU backends during development; this keeps a dense randomized
    slice of that proof in the suite (every backend the tests run on)."""
    import jax.numpy as jnp

    from foldcomp_tpu.kernels.encode import _div1000_cr

    rng = np.random.default_rng(7)
    xi = rng.integers(-(2 ** 24) + 1, 2 ** 24, 1 << 20).astype(np.int32)
    # include the boundary/tie-prone structure: exact thousands +/- 1,
    # tiny values, and the domain edges
    edges = np.concatenate([
        np.arange(-2000, 2001, dtype=np.int32),
        np.array([2 ** 24 - 1, -(2 ** 24) + 1], np.int32),
        (np.arange(1, 16000, dtype=np.int32) * 1000),
        (np.arange(1, 16000, dtype=np.int32) * 1000 + 1),
        (np.arange(1, 16000, dtype=np.int32) * 1000 - 1)])
    xi = np.concatenate([xi, edges])
    dev = np.asarray(_div1000_cr(jnp.asarray(xi)))
    host = xi.astype(np.float32) / np.float32(1000.0)
    np.testing.assert_array_equal(dev, host)


def test_compact_coord_batch_engages_on_pdb(test_pdb_fragment):
    """Parsed 3-decimal PDB coords take the compact int wire form and the
    compact kernel's output is bit-identical to the f32 kernel's."""
    from foldcomp_tpu.codec.batch import (_compact_coord_batch,
                                          fragment_to_tensors)
    from foldcomp_tpu.kernels.encode import (encode_sc_q_core,
                                             encode_sc_q_core_compact)

    a14, rc, _tf, _meta = fragment_to_tensors(test_pdb_fragment)
    atom14 = a14[None]
    res_code = rc[None].astype(np.int32)
    compact = _compact_coord_batch(atom14)
    assert compact is not None, "PDB coords must take the compact path"
    base, delta, present = compact
    assert delta.dtype == np.int16 and present.dtype == np.uint16
    q_c, f_c = encode_sc_q_core_compact(base, delta, present, res_code)
    q_f, f_f = encode_sc_q_core(atom14, res_code)
    np.testing.assert_array_equal(np.asarray(q_c), np.asarray(q_f))
    np.testing.assert_array_equal(np.asarray(f_c), np.asarray(f_f))


def test_compact_coord_batch_falls_back():
    """Coordinates that are not exact milli-angstrom integers (or that
    overflow the delta range) reject the compact form."""
    from foldcomp_tpu.codec.batch import _compact_coord_batch

    atom14 = np.full((1, 4, 14, 3), 1.2345678, np.float32)
    assert _compact_coord_batch(atom14) is None
    # exact millicoords but a >32.7 A intra-residue span
    atom14 = np.zeros((1, 4, 14, 3), np.float32)
    atom14[0, :, 0] = 1.0
    atom14[0, :, 13] = 40.0
    assert _compact_coord_batch(atom14) is None
    # NaN padding rejects too
    atom14 = np.zeros((1, 4, 14, 3), np.float32)
    atom14[0, 1, 5] = np.nan
    assert _compact_coord_batch(atom14) is None


def test_encode_submit_finish_pipelined(test_pdb_fragment):
    """Two in-flight submit handles finish to the same bytes as the
    synchronous encode_tensor_batch."""
    from foldcomp_tpu.codec.batch import (encode_finish, encode_submit,
                                          encode_tensor_batch,
                                          fragment_to_tensors)

    a14, rc, tf, meta = fragment_to_tensors(test_pdb_fragment)
    meta = dict(meta, error=None)
    tensors = [(a14, rc, tf)] * 6
    metas = [meta] * 6
    sync = encode_tensor_batch(tensors[:3], metas[:3])
    h1 = encode_submit(tensors[:3], metas[:3])
    h2 = encode_submit(tensors[3:], metas[3:])
    out1, out2 = encode_finish(h1), encode_finish(h2)
    for f in (*out1, *out2):
        assert fcz.serialize(f) == fcz.serialize(sync[0])


def test_device_stitch_res_mode_matches_host_stitch(test_pdb_fragment,
                                                    test_af_fcz):
    """decode_seg_core with res_index (device-side stitch, residue-space
    output) reproduces the host fancy-index stitch bit-for-bit, full and
    compact forms, on a mixed-length batch."""
    from foldcomp_tpu.codec.batch import pack_decode_batch_seg
    from foldcomp_tpu.kernels.decode import decode_seg_core

    f_long = encode_exact(test_pdb_fragment)
    batch = [test_af_fcz, f_long, test_af_fcz, f_long]
    arrays, metas = pack_decode_batch_seg(batch)
    kw = dict(refine_iters=2, nerf_impl="xla", gather_free=True,
              sc_impl="onehot")
    seg = np.asarray(decode_seg_core(
        arrays["seg_records"], arrays["mins_lane"], arrays["cont_lane"],
        arrays["sc_codes_seg"], arrays["anchor_xyz"], arrays["seg_m"],
        **kw))
    res = np.asarray(decode_seg_core(
        arrays["seg_records"], arrays["mins_lane"], arrays["cont_lane"],
        arrays["sc_codes_seg"], arrays["anchor_xyz"], arrays["seg_m"],
        res_index=arrays["res_index"], **kw))
    off_c, ca_c = decode_seg_core(
        arrays["seg_records"], arrays["mins_lane"], arrays["cont_lane"],
        arrays["sc_codes_seg"], arrays["anchor_xyz"], arrays["seg_m"],
        res_index=arrays["res_index"], compact=True, **kw)
    off_c, ca_c = np.asarray(off_c), np.asarray(ca_c)
    seg_pad = seg.shape[1]
    for m in metas:
        host = seg.reshape(-1, 14, 3)[m.lane_of * seg_pad + m.rec_of]
        dev = res[m.res_base:m.res_base + m.n_residue]
        np.testing.assert_array_equal(host, dev)
        sl = slice(m.res_base, m.res_base + m.n_residue)
        ca = ca_c[:, sl]                        # planar [3, n]
        o = off_c[:, :, sl].astype(np.float32)  # planar [3, 14, n]
        recon = np.transpose(ca[:, None, :] + o * np.float32(0.001),
                             (2, 1, 0))
        assert np.nanmax(np.abs(recon - host)) < 6e-4  # 0.5 mm + rounding


def test_fast_decode_alt_order_matches_exact(test_af_fcz):
    """--alt atom ordering through the batched decoder matches the exact
    decoder's alternative ordering atom-for-atom."""
    exact = decode_exact(test_af_fcz, use_alt_order=True)
    fast = decode_fcz_batch([test_af_fcz], use_alt_order=True)[0]
    assert exact.atom_name == fast.atom_name
    assert np.abs(exact.coords - fast.coords).max() < 1e-3


def test_gather_a14_planar_compact_branch(test_pdb_fragment, test_af_fcz):
    """codec/batch._gather_a14 on the PLANAR compact wire ([3,14,R] i16 +
    [3,R] f32 — what the accelerator res_index path ships): per-protein
    reconstruction must match the seg-space host stitch to the compact
    form's 0.5 mm quantization."""
    from foldcomp_tpu.codec.batch import (_gather_a14,
                                          pack_decode_batch_seg)
    from foldcomp_tpu.kernels.decode import decode_seg_core

    f_long = encode_exact(test_pdb_fragment)
    batch = [test_af_fcz, f_long, test_af_fcz]
    arrays, metas = pack_decode_batch_seg(batch)
    kw = dict(refine_iters=2, nerf_impl="xla", gather_free=True,
              sc_impl="onehot")
    seg = np.asarray(decode_seg_core(
        arrays["seg_records"], arrays["mins_lane"], arrays["cont_lane"],
        arrays["sc_codes_seg"], arrays["anchor_xyz"], arrays["seg_m"],
        **kw))
    off, ca = decode_seg_core(
        arrays["seg_records"], arrays["mins_lane"], arrays["cont_lane"],
        arrays["sc_codes_seg"], arrays["anchor_xyz"], arrays["seg_m"],
        res_index=arrays["res_index"], compact=True, **kw)
    outs_np = (np.asarray(off), np.asarray(ca))
    assert outs_np[0].ndim == 3 and outs_np[0].shape[0] == 3
    seg_pad = seg.shape[1]
    for m in metas:
        host = seg.reshape(-1, 14, 3)[m.lane_of * seg_pad + m.rec_of]
        got = _gather_a14(outs_np, m)
        assert got.shape == host.shape
        assert got.flags["C_CONTIGUOUS"]
        assert np.nanmax(np.abs(got - host)) < 6e-4
