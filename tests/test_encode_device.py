"""Full-device byte-parity encode (kernels/encode.py encode_parity_core).

The device quantizes all 6 backbone streams + side chains + records and
flags the sparse set the host must recompute exactly (boundary bins,
quantizer-extreme candidates, NaN guards, division-rounding ties —
codec/batch.py finish_encode_device). These tests gate the scheme's core
claim: the finished output is BYTE-IDENTICAL to the exact host encoder on
every input, including adversarial geometry. If an XLA change ever breaks
the per-backend parts-noise assumption (kernels/encode.py _PARTS_EPS_*),
this file is what fails.
"""
import numpy as np
import pytest

from test_property_roundtrip import synthesize

# the parity path must stay RuntimeWarning-clean: the intentional
# NaN-through-quantizer reference-parity sites are wrapped in np.errstate
# (core/exact.py, codec/batch.py), so any warning here is a NEW NaN source
pytestmark = pytest.mark.filterwarnings("error::RuntimeWarning")

from foldcomp_tpu.codec import fcz
from foldcomp_tpu.codec.batch import (encode_fragment_batch,
                                      encode_tensor_batch,
                                      finish_encode_host,
                                      fragment_to_tensors)
from foldcomp_tpu.codec.encoder import encode as encode_exact


def _assert_serial_equal(frames):
    exact = [encode_exact(a) for a in frames]
    dev = encode_fragment_batch(frames)
    for i, (e, d) in enumerate(zip(exact, dev)):
        assert d is not None, i
        assert np.array_equal(np.asarray(e.records),
                              np.asarray(d.records)), i
        assert np.array_equal(np.asarray(e.mins), np.asarray(d.mins)), i
        assert np.array_equal(np.asarray(e.cont_fs),
                              np.asarray(d.cont_fs)), i
        assert fcz.serialize(e) == fcz.serialize(d), i


def test_parity_synthetic_corpus():
    frames = [synthesize(n, s) for n in (5, 24, 130) for s in range(3)]
    _assert_serial_equal(frames)


def test_parity_small_proteins():
    """n_res < 4 routes through the full-host fallback."""
    frames = [synthesize(n, 9) for n in (2, 3, 4)]
    _assert_serial_equal(frames)


def test_parity_degenerate_geometry():
    """Duplicate/collinear atoms hit the NaN-guard paths (denom2 <= 0 in
    the dihedral, NaN propagation in the unguarded bond angle). The
    device output must byte-match the host finisher, which reproduces
    the reference semantics bit-for-bit."""
    atoms = synthesize(30, 5)
    # duplicate one backbone atom pair -> zero-length bond vector
    ca_rows = [i for i, nm in enumerate(atoms.atom_name) if nm == "CA"]
    atoms.coords[ca_rows[10]] = atoms.coords[ca_rows[10] - 1]  # CA == N
    a14, rc, tf, meta = fragment_to_tensors(atoms)
    meta = dict(meta, error=None)
    dev = encode_tensor_batch([(a14, rc, tf)], [meta])[0]

    import os
    os.environ["FOLDCOMP_TPU_ENC"] = "host"
    try:
        host = encode_tensor_batch([(a14, rc, tf)], [meta])[0]
    finally:
        del os.environ["FOLDCOMP_TPU_ENC"]
    assert fcz.serialize(dev) == fcz.serialize(host)


def test_parity_wide_bfactor_and_exact_omega():
    """tempFactor extremes + omega values at exactly +-180 (guard rows
    are min/max candidates; the sign of a zero determinant must follow
    the host's where(det<0) branch)."""
    frames = []
    for seed in (11, 12):
        atoms = synthesize(50, seed)
        tfs = np.asarray(atoms.temp_factor)
        tfs[::7] = 0.013   # wide, irregular range
        tfs[3::11] = 99.99
        frames.append(atoms)
    _assert_serial_equal(frames)


def test_host_and_device_finishers_agree_batchwise():
    """Same padded batch through finish_encode_device (sparse rescue)
    and finish_encode_host (full numpy) — every array equal."""
    from foldcomp_tpu.codec.batch import encode_submit

    frames = [synthesize(n, s) for n, s in ((40, 1), (65, 2), (24, 3))]
    tensors = [fragment_to_tensors(a) for a in frames]
    metas = [dict(m, error=None) for _, _, _, m in tensors]
    h = encode_submit([(a, r, t) for a, r, t, _ in tensors], metas)
    assert h["device_bb"]
    parts = {k: np.asarray(v) for k, v in h["parts"].items()}
    from foldcomp_tpu.codec.batch import finish_encode_device
    out_d = finish_encode_device(parts, h["atom14"], h["res_code"],
                                 h["tf_ca"], h["res_mask"])
    out_h = finish_encode_host(parts, h["atom14"], h["res_code"],
                               h["tf_ca"], h["res_mask"])
    for k in ("records", "sc_q", "tf_q", "mins", "cont_fs", "tf_min",
              "tf_cont"):
        assert np.array_equal(np.asarray(out_d[k]), np.asarray(out_h[k]),
                              equal_nan=True), k
