"""Compiled-path parity check: every device codec path vs the exact host
codec, on the live backend (TPU: compiled Mosaic kernels; CPU: XLA).

Thin CLI over foldcomp_tpu.verify.device_parity_check — the same check
the driver bench gates (device_parity_ok). Exits nonzero on any failure.

Usage: [JAX_PLATFORMS=cpu] python tools/exp_fused_check.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from foldcomp_tpu.verify import device_parity_check
    res = device_parity_check()
    print(json.dumps(res, indent=1))
    if not res.get("device_parity_ok"):
        print("PARITY FAILED", file=sys.stderr)
        return 1
    print("PARITY OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
