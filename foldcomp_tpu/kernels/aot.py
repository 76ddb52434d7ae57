"""AOT-exported decode executables: fresh processes skip the jit trace.

A fresh CLI process pays ~3 s to its first decoded batch even with a
warm persistent compile cache: ~1.5 s of jit TRACING/lowering (three
Pallas kernels) + ~1.6 s cached-compile/program-upload (PROFILE.md
round 5). The compile cache cannot help with tracing — that happens
before lowering ever reaches XLA. jax.export can: the traced+lowered
StableHLO (with the Mosaic kernels embedded as serialized custom
calls) is written to disk once per (platform, shape signature), and a
fresh process deserializes it and goes straight to the (cached)
compile.

Artifacts are keyed by jax version + platform + the full input
shape/dtype signature + the static config, so a mismatch simply misses
and the normal jit path runs. Export costs one extra trace; it happens
in a background thread after the first jitted decode (or synchronously
in `foldcomp_tpu warmup`), so no production dispatch ever waits on it.
Set FOLDCOMP_TPU_AOT=0 to disable both sides.

The reference has no analog (a C++ binary's first touch is free); this
is the TPU-native replacement for that property, same as the persistent
compile cache (backend.enable_persistent_cache).
"""
from __future__ import annotations

import hashlib
import os
import threading

_LOCK = threading.Lock()
_CALLS: dict = {}          # key -> jitted exported.call
_SAVING: set = set()       # keys with an export attempt in flight/done
_THREADS: list = []        # in-flight background export threads

# Each export costs one extra trace (~2-4 s of host CPU). A mixed-
# length stream dispatches many shapes per job; cap the background
# spend so saves never become a meaningful fraction of a job's host
# budget (the hottest shapes recur first and win the slots).
_MAX_SAVES_PER_PROCESS = 4
# Keep the artifact dir bounded: newest-N by mtime survive a save.
_MAX_ARTIFACTS = 32


def _enabled() -> bool:
    return os.environ.get("FOLDCOMP_TPU_AOT", "1") != "0"


def _aot_dir():
    cache = os.environ.get("FOLDCOMP_TPU_JAX_CACHE")
    if cache == "0":
        return None
    if not cache:
        cache = os.path.join(os.path.expanduser("~"), ".cache",
                             "foldcomp_tpu_jax")
    return os.path.join(cache, "aot")


def _decode_key(arrays: dict, refine_iters: int, nl_out) -> str:
    import jax
    sig = [jax.__version__, jax.default_backend(),
           str(refine_iters), str(nl_out)]
    for name in sorted(arrays):
        v = arrays[name]
        # skip non-array entries (e.g. the int nl_out rides in the dict
        # on some call paths and as the explicit argument on others —
        # the key must not depend on which)
        if v is None or not hasattr(v, "dtype"):
            continue
        sig.append(f"{name}:{v.dtype}:{tuple(v.shape)}")
    return hashlib.sha1("|".join(sig).encode()).hexdigest()[:24]


def _decode_args(arrays: dict):
    return (arrays["seg_records"], arrays["mins_lane"],
            arrays["cont_lane"], arrays["sc_codes_seg"], arrays["fwd9"],
            arrays["rev9"], arrays["is_first"], arrays["seg_m"])


def try_decode_call(arrays: dict, refine_iters: int, nl_out):
    """Jitted exported-call for this exact signature, or None.

    First hit deserializes from disk (skipping the trace); subsequent
    calls reuse the in-process jit wrapper like any warm jit."""
    if not _enabled():
        return None
    d = _aot_dir()
    if d is None:
        return None
    key = _decode_key(arrays, refine_iters, nl_out)
    with _LOCK:
        if key in _CALLS:
            return _CALLS[key]
    path = os.path.join(d, f"decode_{key}.jaxexp")
    try:
        with open(path, "rb") as fh:
            blob = fh.read()
    except OSError:
        return None
    try:
        import jax
        from jax import export as jexport
        exp = jexport.deserialize(bytearray(blob))
        call = jax.jit(exp.call)
    except Exception:  # noqa: BLE001 — stale/incompatible artifact
        try:
            os.unlink(path)
        except OSError:
            pass
        return None
    with _LOCK:
        _CALLS.setdefault(key, call)
    return call


def save_decode_aot(arrays: dict, refine_iters: int, nl_out,
                    background: bool = True):
    """Export + serialize the fused decode for this signature.

    background=True runs the extra trace in a daemon thread so the
    caller's dispatch path never waits; one attempt per key per
    process. No-op when disabled, already saved, or on any export
    error (the normal jit path is always intact)."""
    if not _enabled():
        return
    d = _aot_dir()
    if d is None:
        return
    key = _decode_key(arrays, refine_iters, nl_out)
    path = os.path.join(d, f"decode_{key}.jaxexp")
    with _LOCK:
        if key in _SAVING or len(_SAVING) >= _MAX_SAVES_PER_PROCESS:
            return
        _SAVING.add(key)
    if os.path.exists(path):
        return
    import jax.numpy as jnp
    specs = {k: jnp.zeros(v.shape, v.dtype) if v is not None else None
             for k, v in arrays.items() if k != "nl_out"}

    def work():
        try:
            from jax import export as jexport

            from .pallas_decode import decode_seg_fused
            exp = jexport.export(decode_seg_fused)(
                *_decode_args(specs), refine_iters=refine_iters,
                nl_out=nl_out)
            blob = exp.serialize()
            os.makedirs(d, exist_ok=True)
            tmp = path + f".{os.getpid()}"
            with open(tmp, "wb") as fh:
                fh.write(blob)
            os.replace(tmp, path)
            # bound the artifact dir (oldest-by-mtime beyond the cap)
            files = sorted(
                (os.path.join(d, f) for f in os.listdir(d)
                 if f.endswith(".jaxexp")),
                key=lambda p: os.path.getmtime(p), reverse=True)
            for old in files[_MAX_ARTIFACTS:]:
                try:
                    os.unlink(old)
                except OSError:
                    pass
        except Exception:  # noqa: BLE001 — AOT is best-effort
            if os.environ.get("FOLDCOMP_TPU_AOT_DEBUG"):
                import traceback
                traceback.print_exc()

    if background:
        t = threading.Thread(target=work, daemon=True)
        with _LOCK:
            _THREADS.append(t)
        t.start()
    else:
        work()


def wait_pending(timeout: float = 30.0):
    """Join in-flight background exports (the `warmup` command calls
    this so its artifacts are guaranteed on disk before exit)."""
    import time
    deadline = time.monotonic() + timeout
    with _LOCK:
        threads = list(_THREADS)
    for t in threads:
        t.join(max(deadline - time.monotonic(), 0.0))
