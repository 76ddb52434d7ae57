"""Backend selection helper.

The accelerator plugin (e.g. a remote-attached TPU) can fail to initialize —
tunnel down, device held by another process. The codec is backend-agnostic,
so the batched paths degrade to CPU instead of crashing.
"""
from __future__ import annotations

import sys


def ensure_backend() -> str:
    """Return the active platform name, falling back to CPU if needed."""
    import jax
    try:
        return jax.devices()[0].platform
    except RuntimeError as e:
        print(f"[Warning] accelerator backend unavailable ({e}); "
              "falling back to CPU", file=sys.stderr)
        jax.config.update("jax_platforms", "cpu")
        return jax.devices()[0].platform
