"""Backend selection helper.

The accelerator plugin (e.g. a remote-attached TPU) can fail to initialize —
tunnel down, device held by another process. The codec is backend-agnostic,
so the batched paths degrade to CPU instead of crashing.
"""
from __future__ import annotations

import os
import sys

CACHE_DIR = os.environ.get("FOLDCOMP_TPU_JAX_CACHE",
                           os.path.join(os.path.expanduser("~"), ".cache",
                                        "foldcomp_tpu_jax"))


def enable_persistent_cache() -> None:
    """Point JAX's persistent compilation cache at a stable location.

    First-touch cost of the batched paths is the jit compile (~20-40 s
    for the standard decode/encode shapes). On runtimes that support the
    persistent cache (local TPU/CPU PJRT), a fresh CLI process reuses
    the compiled executables, so only the first invocation EVER pays it
    (`foldcomp_tpu warmup` pre-pays it explicitly). Remote-compile
    services that bypass the cache (the axon tunnel) just ignore it.
    Disable with FOLDCOMP_TPU_JAX_CACHE=0."""
    if CACHE_DIR in ("0", ""):
        return
    import jax
    try:
        os.makedirs(CACHE_DIR, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
        # cache EVERYTHING: through a remote-compile tunnel even a
        # trivial jit(dynamic_slice) pays a ~0.5 s round trip, and a
        # cold CLI start triggers dozens of them — a cache hit is
        # ~0.05 s (measured; see PROFILE.md round-5 cold-start section)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:  # noqa: BLE001 — older jax or read-only home
        pass


def ensure_backend() -> str:
    """Return the active platform name, falling back to CPU if needed.

    A plugin-pinned JAX_PLATFORMS value (e.g. "axon") can name a backend
    that never registered in THIS process — observed when the plugin's
    sitecustomize registration is cwd-dependent — while a real
    accelerator platform (e.g. "tpu") is available under its own name.
    Retry with auto-selection before surrendering to CPU, so the CLI's
    device paths reach the accelerator from any working directory."""
    import jax
    enable_persistent_cache()
    try:
        return jax.devices()[0].platform
    except RuntimeError as first_err:
        try:
            jax.config.update("jax_platforms", "")
            plat = jax.devices()[0].platform
            if plat != "cpu":
                print(f"[Info] configured backend unavailable "
                      f"({first_err}); auto-selected '{plat}'",
                      file=sys.stderr)
            return plat
        except RuntimeError as e:
            print(f"[Warning] accelerator backend unavailable ({e}); "
                  "falling back to CPU", file=sys.stderr)
            jax.config.update("jax_platforms", "cpu")
            return jax.devices()[0].platform
