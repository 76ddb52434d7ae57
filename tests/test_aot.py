"""kernels/aot.py mechanics on the CPU backend.

The real artifact path (export of the compiled Mosaic kernels) only
exists on an accelerator — exercised on hardware by verify.py's
decode_aot/decode_default check and the driver bench. Here: key
stability, graceful degradation (no artifact, failed export), and the
production path staying intact when AOT can contribute nothing."""
import os

import numpy as np
import pytest

from test_property_roundtrip import synthesize

from foldcomp_tpu.codec.batch import pack_decode_batch_lanes
from foldcomp_tpu.codec.encoder import encode
from foldcomp_tpu.kernels import aot


@pytest.fixture()
def lanes_arrays(tmp_path, monkeypatch):
    monkeypatch.setenv("FOLDCOMP_TPU_JAX_CACHE", str(tmp_path))
    aot._SAVING.clear()
    aot._CALLS.clear()
    aot._SEEN_JIT.clear()
    fczs = [encode(synthesize(30, 1)), encode(synthesize(12, 2))]
    arrays, metas = pack_decode_batch_lanes(fczs)
    arrays = dict(arrays)
    arrays.pop("nl_out", None)
    return arrays


def test_key_stable_and_shape_sensitive(lanes_arrays):
    k1 = aot._decode_key(lanes_arrays, 2, None)
    k2 = aot._decode_key(dict(lanes_arrays), 2, None)
    assert k1 == k2
    assert aot._decode_key(lanes_arrays, 1, None) != k1
    assert aot._decode_key(lanes_arrays, 2, 128) != k1
    bigger = dict(lanes_arrays,
                  fwd9=np.zeros((9, 2 * lanes_arrays["fwd9"].shape[1]),
                                np.float32))
    assert aot._decode_key(bigger, 2, None) != k1


def test_no_artifact_returns_none(lanes_arrays):
    assert aot.try_decode_call(lanes_arrays, 2, None) is None


def test_save_degrades_gracefully_on_cpu(lanes_arrays, tmp_path):
    # CPU backend: the Mosaic lowering inside export fails; save must
    # swallow it, leave no artifact, and the loader must still miss
    aot.save_decode_aot(lanes_arrays, 2, None, background=False)
    aot.wait_pending(5.0)
    d = aot._aot_dir()
    files = os.listdir(d) if d and os.path.isdir(d) else []
    assert not [f for f in files if f.endswith(".jaxexp")]
    assert aot.try_decode_call(lanes_arrays, 2, None) is None


def test_corrupt_artifact_is_discarded(lanes_arrays):
    d = aot._aot_dir()
    os.makedirs(d, exist_ok=True)
    key = aot._decode_key(lanes_arrays, 2, None)
    path = os.path.join(d, f"decode_{key}.jaxexp")
    with open(path, "wb") as fh:
        fh.write(b"not a serialized export")
    assert aot.try_decode_call(lanes_arrays, 2, None) is None
    assert not os.path.exists(path)   # stale artifact removed


def test_disabled_by_env(lanes_arrays, monkeypatch):
    monkeypatch.setenv("FOLDCOMP_TPU_AOT", "0")
    assert aot.try_decode_call(lanes_arrays, 2, None) is None
    aot.save_decode_aot(lanes_arrays, 2, None, background=False)
    d = aot._aot_dir()
    files = os.listdir(d) if d and os.path.isdir(d) else []
    assert not [f for f in files if f.endswith(".jaxexp")]


def test_no_mid_process_switch(lanes_arrays):
    """Once a signature ran the jit path in-process, a later-appearing
    artifact must NOT be loaded (switching would pay a fresh compile
    mid-stream — observed poisoning a timed loop 10x)."""
    aot.save_decode_aot(lanes_arrays, 2, None, background=False)
    d = aot._aot_dir()
    os.makedirs(d, exist_ok=True)
    key = aot._decode_key(lanes_arrays, 2, None)
    path = os.path.join(d, f"decode_{key}.jaxexp")
    with open(path, "wb") as fh:          # artifact appears afterwards
        fh.write(b"whatever")
    assert aot.try_decode_call(lanes_arrays, 2, None) is None
    assert os.path.exists(path)           # and is NOT touched/deleted


def test_kind_and_format_version_separate_keys(lanes_arrays):
    """bbdec and decode share the input signature but NOT the key —
    artifact kinds carry a format version so an output-contract change
    (the bbdec f32->i16 wire) can never serve a stale pytree."""
    k_dec = aot._decode_key(lanes_arrays, 2, None)
    k_bb = aot._decode_key(lanes_arrays, 2, None, kind="bbdec")
    assert k_dec != k_bb
    # bumping a kind's version must change its key
    old = aot._FORMAT_VERSION["bbdec"]
    try:
        aot._FORMAT_VERSION["bbdec"] = old + 1
        assert aot._decode_key(lanes_arrays, 2, None,
                               kind="bbdec") != k_bb
    finally:
        aot._FORMAT_VERSION["bbdec"] = old
