"""Fused Pallas encode (kernels/pallas_encode.py) parity vs the XLA core.

Runs the two-kernel fused encode in Pallas interpret mode on CPU and
gates the scheme's contract at two levels:

- parts level: records / sc_q / flags vs kernels/encode.py
  _parity_jit_compact with parts_eps=0 (the TPU configuration the fused
  epilogue mirrors verbatim) — identical by construction wherever the
  kernel cosines are bit-equal to the XLA graph's;
- bytes level: the full encode_submit/encode_finish pipeline with
  FOLDCOMP_TPU_FUSED_ENC=interpret must serialize BYTE-IDENTICAL to the
  exact host encoder (codec/encoder.py), the same gate the XLA device
  path holds (tests/test_encode_device.py; reference contract
  foldcomp.cpp:450-606 + sidechain.cpp:170).

On TPU hardware the same kernels run compiled; tools/exp_fused_check.py
verifies the compiled outputs and the driver bench gates them
(device_parity_ok).
"""
import numpy as np
import pytest

pytestmark = pytest.mark.filterwarnings("error::RuntimeWarning")

from test_property_roundtrip import synthesize

from foldcomp_tpu.codec import fcz
from foldcomp_tpu.codec.batch import (_compact_coord_batch,
                                      encode_fragment_batch,
                                      fragment_to_tensors)
from foldcomp_tpu.codec.encoder import encode as encode_exact


def _milli(atoms):
    """Quantize synthetic coords to the milli-angstrom grid (every real
    PDB/mmCIF coordinate is 3-decimal, so the compact integer wire the
    fused encode rides is always available in production)."""
    c = np.asarray(atoms.coords, np.float32)
    atoms.coords[:] = (np.rint(c * 1000.0).astype(np.int32)
                       .astype(np.float32) / np.float32(1000.0))
    return atoms


def _tensor_batch(frames, l_bucket=32):
    tensors = [fragment_to_tensors(a) for a in frames]
    b = len(tensors)
    l_pad = -(-max(t[0].shape[0] for t in tensors) // l_bucket) * l_bucket
    atom14 = np.zeros((b, l_pad, 14, 3), np.float32)
    res_code = np.zeros((b, l_pad), np.int32)
    n_res = np.zeros(b, np.int32)
    for k, (a14, rc, tf, _) in enumerate(tensors):
        m = a14.shape[0]
        atom14[k, :m] = a14
        res_code[k, :m] = rc
        n_res[k] = m
    return atom14, res_code, n_res


def test_fused_parts_match_xla_core():
    """Fused interpret-mode parts vs the production XLA compact core at
    the same backend parts_eps. Unflagged rows (the ones the host trusts
    verbatim) must be identical; flagged rows are host-rescued anyway
    (byte equality after rescue is test_fused_end_to_end_byte_parity).
    Covers degenerate geometry (NaN guards) too."""
    from foldcomp_tpu.kernels.encode import encode_parity_core_compact
    from foldcomp_tpu.kernels.pallas_encode import \
        encode_parity_fused_compact

    frames = [_milli(synthesize(n, s))
              for n, s in ((5, 0), (24, 1), (60, 2))]
    # degenerate: duplicate a backbone atom -> zero-length bond vector
    bad = _milli(synthesize(30, 5))
    ca_rows = [i for i, nm in enumerate(bad.atom_name) if nm == "CA"]
    bad.coords[ca_rows[10]] = bad.coords[ca_rows[10] - 1]
    frames.append(bad)

    atom14, res_code, n_res = _tensor_batch(frames)
    compact = _compact_coord_batch(atom14)
    assert compact is not None
    fused = {k: np.asarray(v) for k, v in encode_parity_fused_compact(
        *compact, res_code, n_res, interpret=True).items()}
    xla = {k: np.asarray(v) for k, v in encode_parity_core_compact(
        *compact, res_code, n_res).items()}

    trusted_bb = (fused["bb_flags"] | xla["bb_flags"]) == 0
    rec_eq = (fused["records"] == xla["records"]).all(axis=2)
    assert bool(rec_eq[trusted_bb].all())
    trusted_sc = (fused["sc_flag_bits"] | xla["sc_flag_bits"]) == 0
    sc_eq = (fused["sc_q"] == xla["sc_q"]).all(axis=2)
    assert bool(sc_eq[trusted_sc].all())
    # both paths flag the same wide eps bands; band-edge disagreement
    # must stay sparse (a blow-up here = a broken kernel, not ulp noise)
    n_rows = res_code.size
    for k in ("bb_flags", "cand_bits", "sc_flag_bits"):
        diff = int((fused[k] != xla[k]).sum())
        assert diff <= max(4, n_rows // 50), (k, diff)


def test_fused_lane_pad_quantum():
    """The adaptive lane-group padding is output-invariant: a 1-protein
    batch (128-lane pad, g=1) equals its row in a 5-protein batch."""
    from foldcomp_tpu.kernels.pallas_encode import \
        encode_parity_fused_compact

    frames = [_milli(synthesize(n, s)) for n, s in
              ((40, 3), (12, 4), (65, 6), (24, 7), (33, 8))]
    atom14, res_code, n_res = _tensor_batch(frames)
    full = encode_parity_fused_compact(
        *_compact_coord_batch(atom14), res_code, n_res, interpret=True)
    one = encode_parity_fused_compact(
        *_compact_coord_batch(atom14[:1]), res_code[:1], n_res[:1],
        interpret=True)
    assert np.array_equal(np.asarray(full["records"][0]),
                          np.asarray(one["records"][0]))
    assert np.array_equal(np.asarray(full["sc_q"][0]),
                          np.asarray(one["sc_q"][0]))


def test_fused_end_to_end_byte_parity(monkeypatch):
    """encode via the fused path (interpret) -> FCZ bytes identical to
    the exact host encoder, the full-device gate of
    tests/test_encode_device.py applied to the Pallas kernels."""
    monkeypatch.setenv("FOLDCOMP_TPU_FUSED_ENC", "interpret")
    frames = [_milli(synthesize(n, s))
              for n in (5, 24, 130) for s in (0, 1)]
    exact = [encode_exact(a) for a in frames]
    dev = encode_fragment_batch(frames)
    for i, (e, d) in enumerate(zip(exact, dev)):
        assert d is not None, i
        assert fcz.serialize(e) == fcz.serialize(d), i


def test_fused_end_to_end_fixture(monkeypatch, ref_test_dir):
    """Byte parity on the real test.pdb fixture through the fused path."""
    from conftest import require_fixture

    from foldcomp_tpu.io.pdb import parse_pdb
    from foldcomp_tpu.io.structure import (identify_chains,
                                           identify_discontinuous_fragments,
                                           remove_alternative_positions)

    monkeypatch.setenv("FOLDCOMP_TPU_FUSED_ENC", "interpret")
    atoms = remove_alternative_positions(
        parse_pdb(require_fixture("test.pdb").read_bytes()))
    (cs, ce), = identify_chains(atoms)
    (fs, fe), = identify_discontinuous_fragments(atoms, cs, ce)
    frag = atoms.slice(fs, fe)
    e = encode_exact(frag)
    d = encode_fragment_batch([frag])[0]
    assert d is not None
    assert fcz.serialize(e) == fcz.serialize(d)


def _live_of(frames, l_bucket=32):
    tensors = [fragment_to_tensors(a) for a in frames]
    live = [(i, (t[0], t[1], t[2])) for i, t in enumerate(tensors)]
    l_pad = -(-max(t[0].shape[0] for t in tensors) // l_bucket) * l_bucket
    return live, l_pad


def test_native_planar_wire_matches_numpy():
    """fcz_pack_encode_wire (C, one pass, plane-major) vs the numpy
    fill + _compact_coord_batch + transpose chain: atom14 fill, baseT,
    deltaT, present all bit-identical, pad proteins/lanes zeroed."""
    from foldcomp_tpu.codec.batch import _pack_encode_wire_native
    from foldcomp_tpu.kernels.pallas_encode import fused_pb
    from foldcomp_tpu.native import get_lib

    if get_lib() is None:
        pytest.skip("native library unavailable")
    frames = [_milli(synthesize(n, s)) for n, s in
              ((40, 3), (12, 4), (65, 6), (24, 7), (33, 8))]
    live, l = _live_of(frames)
    b = len(live)
    atom14 = np.empty((b, l, 14, 3), np.float32)
    wire = _pack_encode_wire_native(live, atom14)
    assert isinstance(wire, tuple)
    baseT, deltaT, present = wire

    ref = np.zeros((b, l, 14, 3), np.float32)
    for k, (_, (a14, _rc, _tf)) in enumerate(live):
        ref[k, :a14.shape[0]] = a14
    assert np.array_equal(atom14, ref)
    nb, nd, npres = _compact_coord_batch(ref)
    pb = fused_pb(l)
    bp = -(-b // pb) * pb
    refB = np.zeros((3, bp, l), np.int32)
    refB[:, :b] = np.transpose(nb, (2, 0, 1))
    refD = np.zeros((42, bp, l), np.int16)
    refD[:, :b] = np.transpose(np.asarray(nd).reshape(b, l, 42),
                               (2, 0, 1))
    refP = np.zeros((bp, l), np.uint16)
    refP[:b] = npres
    assert np.array_equal(np.asarray(baseT), refB)
    assert np.array_equal(np.asarray(deltaT), refD)
    assert np.array_equal(np.asarray(present), refP)


def test_native_planar_wire_f32_fallback():
    """A single non-milli-exact coordinate drops the C pack to the f32
    verdict — exactly when the numpy pass returns None — with the
    atom14 fill still complete (no second fill pass needed)."""
    from foldcomp_tpu.codec.batch import _pack_encode_wire_native
    from foldcomp_tpu.native import get_lib

    if get_lib() is None:
        pytest.skip("native library unavailable")
    frames = [_milli(synthesize(20, 9)), _milli(synthesize(9, 10))]
    frames[1].coords[3, 1] = np.float32(0.00012345)   # not on the grid
    live, l = _live_of(frames)
    b = len(live)
    atom14 = np.empty((b, l, 14, 3), np.float32)
    assert _pack_encode_wire_native(live, atom14) == "f32"
    ref = np.zeros((b, l, 14, 3), np.float32)
    for k, (_, (a14, _rc, _tf)) in enumerate(live):
        ref[k, :a14.shape[0]] = a14
    assert np.array_equal(atom14, ref)
    assert _compact_coord_batch(ref) is None


def test_planar_parts_match_compact():
    """encode_parity_fused_planar on the C wire == the same fused
    kernel fed through the [B, L] wire + device transpose (identical
    jit graph past the prologue, so outputs must be bit-equal)."""
    from foldcomp_tpu.codec.batch import _pack_encode_wire_native
    from foldcomp_tpu.kernels.pallas_encode import (
        encode_parity_fused_compact, encode_parity_fused_planar)
    from foldcomp_tpu.native import get_lib

    if get_lib() is None:
        pytest.skip("native library unavailable")
    frames = [_milli(synthesize(n, s))
              for n, s in ((5, 0), (24, 1), (60, 2))]
    atom14, res_code, n_res = _tensor_batch(frames)
    live = [(i, (np.ascontiguousarray(atom14[i, :n_res[i]]), None, None))
            for i in range(len(frames))]
    scratch = np.empty_like(atom14)
    wire = _pack_encode_wire_native(live, scratch)
    assert isinstance(wire, tuple)
    baseT, deltaT, present = wire
    b = len(frames)
    bp = present.shape[0]
    code_p = np.pad(res_code, ((0, bp - b), (0, 0)))
    nres_p = np.pad(n_res, (0, bp - b))
    planar = encode_parity_fused_planar(baseT, deltaT, present, code_p,
                                        nres_p, n_out=b, interpret=True)
    compact = encode_parity_fused_compact(
        *_compact_coord_batch(atom14), res_code, n_res, interpret=True)
    for k in ("records", "bb_flags", "cand_bits", "sc_q",
              "sc_flag_bits"):
        assert np.array_equal(np.asarray(planar[k]),
                              np.asarray(compact[k])), k


def test_fused_end_to_end_without_planar_wire(monkeypatch):
    """The numpy-wire fused path (FOLDCOMP_TPU_PLANAR_WIRE=0) stays
    byte-exact — the fallback when the native library is absent."""
    monkeypatch.setenv("FOLDCOMP_TPU_FUSED_ENC", "interpret")
    monkeypatch.setenv("FOLDCOMP_TPU_PLANAR_WIRE", "0")
    frames = [_milli(synthesize(n, s)) for n, s in ((26, 3), (7, 4))]
    exact = [encode_exact(a) for a in frames]
    dev = encode_fragment_batch(frames)
    for i, (e, d) in enumerate(zip(exact, dev)):
        assert d is not None, i
        assert fcz.serialize(e) == fcz.serialize(d), i


def test_native_planar_wire_threaded_chunks():
    """Chunk-threaded pack (fcz_pack_encode_wire_range over uneven
    protein ranges) is bit-identical to the single-call pack, and a
    poisoned protein in ANY chunk drops the whole batch to the f32
    verdict."""
    import os

    from foldcomp_tpu.codec.batch import _pack_encode_wire_native
    from foldcomp_tpu.native import get_lib

    if get_lib() is None:
        pytest.skip("native library unavailable")
    frames = [_milli(synthesize(6 + 5 * i, 20 + i)) for i in range(7)]
    live, l = _live_of(frames)
    b = len(live)
    prev = os.environ.get("FOLDCOMP_TPU_PACK_THREADS")
    try:
        os.environ["FOLDCOMP_TPU_PACK_THREADS"] = "1"
        a1 = np.empty((b, l, 14, 3), np.float32)
        w1 = _pack_encode_wire_native(live, a1)
        os.environ["FOLDCOMP_TPU_PACK_THREADS"] = "3"
        a3 = np.empty((b, l, 14, 3), np.float32)
        w3 = _pack_encode_wire_native(live, a3)
        assert isinstance(w1, tuple) and isinstance(w3, tuple)
        assert np.array_equal(a1, a3)
        for x, y in zip(w1, w3):
            assert np.array_equal(np.asarray(x), np.asarray(y))
        # poison one protein in the middle chunk
        bad = frames[3]
        bad.coords[2, 0] = np.float32(0.00012345)
        live_bad, l2 = _live_of(frames)
        ab = np.empty((b, l2, 14, 3), np.float32)
        assert _pack_encode_wire_native(live_bad, ab) == "f32"
    finally:
        if prev is None:
            os.environ.pop("FOLDCOMP_TPU_PACK_THREADS", None)
        else:
            os.environ["FOLDCOMP_TPU_PACK_THREADS"] = prev
