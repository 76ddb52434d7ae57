"""AOT-exported codec executables: fresh processes skip the jit trace.

A fresh CLI process pays ~3 s to its first decoded batch even with a
warm persistent compile cache: ~1.5 s of jit TRACING/lowering (three
Pallas kernels) + ~1.6 s cached-compile/program-upload (PROFILE.md
round 5). The compile cache cannot help with tracing — that happens
before lowering ever reaches XLA. jax.export can: the traced+lowered
StableHLO (with the Mosaic kernels embedded as serialized custom
calls) is written to disk once per (platform, shape signature), and a
fresh process deserializes it and goes straight to the (cached)
compile. Measured on this tunnel: time to first decoded 512-batch
2.9-5.7 s -> 1.26 s steady-state.

Covered paths: the fused Pallas decode (decode_seg_fused) and the
fused planar encode (_fused_parity_jit, planar wire). Artifacts are
keyed by jax version + platform + the full input shape/dtype signature
+ the static config, so a mismatch simply misses and the normal jit
path runs. Export costs one extra trace; it happens in a background
thread after the first jitted call (or synchronously via
`foldcomp_tpu warmup`, which joins the threads), capped at
_MAX_SAVES_PER_PROCESS so mixed-shape streams never spend a
meaningful fraction of their host budget exporting. Set
FOLDCOMP_TPU_AOT=0 to disable both sides.

The reference has no analog (a C++ binary's first touch is free); this
is the TPU-native replacement for that property, same as the persistent
compile cache (backend.enable_persistent_cache).
"""
from __future__ import annotations

import hashlib
import os
import threading

_LOCK = threading.Lock()
_CALLS: dict = {}          # (kind, key) -> jitted exported.call
_SAVING: set = set()       # (kind, key) with an export attempt made
_SEEN_JIT: set = set()     # (kind, key) already traced via jit here
_THREADS: list = []        # in-flight background export threads

# Each export costs one extra trace (~2-4 s of host CPU). A mixed-
# length stream dispatches many shapes per job; cap the background
# spend so saves never become a meaningful fraction of a job's host
# budget (the hottest shapes recur first and win the slots).
_MAX_SAVES_PER_PROCESS = 4
# Keep the artifact dir bounded: newest-N PER KIND survive a save
# (a global cap let a burst of decode shapes evict the few encode
# artifacts — observed: 23 decode / 3 encode / 6 wclass at cap 32, and
# a cold compress then paid the full trace+compile again).
_MAX_ARTIFACTS_PER_KIND = 24


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


# Artifact FORMAT versions, baked into every key: an artifact's inputs
# can stay identical while its OUTPUT contract changes (the bbdec wire
# went f32 [NL,SEG,9] -> (i16 offsets, f32 ca) with the same input
# signature — a stale artifact then quietly serves the OLD format).
# Bump the kind's version whenever its output pytree changes.
_FORMAT_VERSION = {"decode": 1, "encode": 1, "wclass": 1, "bbdec": 2}


def _sig_key(static_parts, arrays) -> str:
    """sha1 over jax version + backend + statics + array signatures.

    Non-array entries are skipped (e.g. the int nl_out rides the
    arrays dict on some call paths and as an explicit argument on
    others — the key must not depend on which)."""
    import jax
    sig = [jax.__version__, jax.default_backend()]
    sig += [str(p) for p in static_parts]
    for name, v in arrays:
        if v is None or not hasattr(v, "dtype"):
            continue
        sig.append(f"{name}:{v.dtype}:{tuple(v.shape)}")
    return hashlib.sha1("|".join(sig).encode()).hexdigest()[:24]


def _try_call(kind: str, key: str):
    """Jitted exported-call for (kind, key), or None.

    First hit deserializes from disk (skipping the trace); subsequent
    calls reuse the in-process jit wrapper like any warm jit. A stale
    or incompatible artifact is deleted and the caller falls through to
    the normal jit path."""
    if not _enabled():
        return None
    d = _aot_dir()
    if d is None:
        return None
    with _LOCK:
        if (kind, key) in _CALLS:
            return _CALLS[(kind, key)]
        # NEVER switch paths mid-process: once this signature ran the
        # jit path here, its executable is warm — loading an artifact
        # that a background save just produced would pay a fresh
        # deserialize + compile for zero gain (observed poisoning a
        # timed loop 10x when the save landed mid-measurement)
        if (kind, key) in _SEEN_JIT:
            return None
    path = os.path.join(d, f"{kind}_{key}.jaxexp")
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
        _CALLS.setdefault((kind, key), call)
    return call


def _save(kind: str, key: str, export_thunk, background: bool):
    """Run export_thunk() -> jax.export.Exported, serialize to disk.

    background=True runs the extra trace in a daemon thread so the
    caller's dispatch path never waits; one attempt per key per
    process. No-op when disabled, already saved, over the per-process
    cap, or on any export error (the normal jit path is always
    intact; FOLDCOMP_TPU_AOT_DEBUG=1 prints swallowed errors)."""
    with _LOCK:
        # the caller just ran the jit path for this signature
        _SEEN_JIT.add((kind, key))
    if not _enabled():
        return
    d = _aot_dir()
    if d is None:
        return
    path = os.path.join(d, f"{kind}_{key}.jaxexp")
    with _LOCK:
        if (kind, key) in _SAVING or \
                len(_SAVING) >= _MAX_SAVES_PER_PROCESS:
            return
        _SAVING.add((kind, key))
    if os.path.exists(path):
        return

    def work():
        try:
            blob = export_thunk().serialize()
            os.makedirs(d, exist_ok=True)
            tmp = path + f".{os.getpid()}"
            with open(tmp, "wb") as fh:
                fh.write(blob)
            os.replace(tmp, path)
            # bound the artifact dir (oldest-by-mtime beyond the
            # per-kind cap)
            files = sorted(
                (os.path.join(d, f) for f in os.listdir(d)
                 if f.endswith(".jaxexp")
                 and f.startswith(kind + "_")),
                key=lambda p: os.path.getmtime(p), reverse=True)
            for old in files[_MAX_ARTIFACTS_PER_KIND:]:
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


# ---------------------------------------------------------------------------
# Fused decode (kernels/pallas_decode.decode_seg_fused)
# ---------------------------------------------------------------------------

def _decode_key(arrays: dict, refine_iters: int, nl_out,
                kind: str = "decode") -> str:
    return _sig_key((f"v{_FORMAT_VERSION[kind]}", refine_iters, nl_out),
                    sorted(arrays.items()))


def _decode_args(arrays: dict):
    return (arrays["seg_records"], arrays["mins_lane"],
            arrays["cont_lane"], arrays["sc_codes_seg"], arrays["fwd9"],
            arrays["rev9"], arrays["is_first"], arrays["seg_m"])


def try_decode_call(arrays: dict, refine_iters: int, nl_out):
    return _try_call("decode", _decode_key(arrays, refine_iters, nl_out))


def save_decode_aot(arrays: dict, refine_iters: int, nl_out,
                    background: bool = True):
    key = _decode_key(arrays, refine_iters, nl_out)
    import jax.numpy as jnp
    specs = {k: jnp.zeros(v.shape, v.dtype)
             for k, v in arrays.items()
             if v is not None and hasattr(v, "dtype")}

    def export_thunk():
        from jax import export as jexport

        from .pallas_decode import decode_seg_fused
        return jexport.export(decode_seg_fused)(
            *_decode_args(specs), refine_iters=refine_iters,
            nl_out=nl_out)

    _save("decode", key, export_thunk, background)


# ---------------------------------------------------------------------------
# Fused planar encode (kernels/pallas_encode._fused_parity_jit)
# ---------------------------------------------------------------------------

def _encode_args_named(baseT, deltaT, present, res_code, n_res):
    return (("baseT", baseT), ("deltaT", deltaT), ("present", present),
            ("res_code", res_code), ("n_res", n_res))


def _encode_key(args_named, pb: int, parts_eps: float) -> str:
    return _sig_key((f"v{_FORMAT_VERSION['encode']}", pb, parts_eps),
                    args_named)


def try_encode_call(baseT, deltaT, present, res_code, n_res,
                    pb: int, parts_eps: float):
    named = _encode_args_named(baseT, deltaT, present, res_code, n_res)
    return _try_call("encode", _encode_key(named, pb, parts_eps))


def save_encode_aot(baseT, deltaT, present, res_code, n_res,
                    pb: int, parts_eps: float, background: bool = True):
    named = _encode_args_named(baseT, deltaT, present, res_code, n_res)
    key = _encode_key(named, pb, parts_eps)
    import jax.numpy as jnp
    specs = [jnp.zeros(v.shape, v.dtype) for _, v in named]

    def export_thunk():
        from jax import export as jexport

        from .pallas_encode import _fused_parity_jit
        return jexport.export(_fused_parity_jit)(
            *specs, pb=pb, parts_eps=parts_eps, planar=True)

    _save("encode", key, export_thunk, background)


# ---------------------------------------------------------------------------
# Width-classed fused decode (kernels/pallas_decode.decode_seg_fused_classes)
# ---------------------------------------------------------------------------

def _classes_named(c: dict, prev_idx):
    named = []
    for k in ("recs", "mins", "cont", "sct", "fwd", "rev", "isf",
              "segm"):
        for i, v in enumerate(c[k]):
            named.append((f"{k}{i}", v))
    named.append(("prev_idx", prev_idx))
    return tuple(named)


def _classes_key(c: dict, prev_idx, refine_iters: int,
                 nl_outs: tuple) -> str:
    return _sig_key((f"v{_FORMAT_VERSION['wclass']}", refine_iters)
                    + tuple(nl_outs), _classes_named(c, prev_idx))


def try_classes_call(c: dict, prev_idx, refine_iters: int,
                     nl_outs: tuple):
    return _try_call("wclass",
                     _classes_key(c, prev_idx, refine_iters, nl_outs))


def save_classes_aot(c: dict, prev_idx, refine_iters: int,
                     nl_outs: tuple, background: bool = True):
    key = _classes_key(c, prev_idx, refine_iters, nl_outs)
    import jax.numpy as jnp
    spec = {k: tuple(jnp.zeros(v.shape, v.dtype) for v in c[k])
            for k in ("recs", "mins", "cont", "sct", "fwd", "rev",
                      "isf", "segm")}
    pspec = jnp.zeros(prev_idx.shape, prev_idx.dtype)

    def export_thunk():
        from jax import export as jexport

        from .pallas_decode import decode_seg_fused_classes
        return jexport.export(decode_seg_fused_classes)(
            spec["recs"], spec["mins"], spec["cont"], spec["sct"],
            spec["fwd"], spec["rev"], spec["isf"], spec["segm"], pspec,
            refine_iters=refine_iters, nl_outs=nl_outs)

    _save("wclass", key, export_thunk, background)


# ---------------------------------------------------------------------------
# bb-only fused decode (decode_seg_fused with wire="bb")
# ---------------------------------------------------------------------------

def try_bbdec_call(arrays: dict, refine_iters: int, nl_out):
    return _try_call("bbdec", _decode_key(arrays, refine_iters, nl_out,
                                          kind="bbdec"))


def save_bbdec_aot(arrays: dict, refine_iters: int, nl_out,
                   background: bool = True):
    key = _decode_key(arrays, refine_iters, nl_out, kind="bbdec")
    import jax.numpy as jnp
    specs = {k: jnp.zeros(v.shape, v.dtype)
             for k, v in arrays.items()
             if v is not None and hasattr(v, "dtype")}

    def export_thunk():
        from jax import export as jexport

        from .pallas_decode import decode_seg_fused
        return jexport.export(decode_seg_fused)(
            *_decode_args(specs), refine_iters=refine_iters,
            nl_out=nl_out, wire="bb")

    _save("bbdec", key, export_thunk, background)
