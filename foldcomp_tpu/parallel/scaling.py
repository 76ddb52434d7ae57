"""Scaling benchmark harness: residues/s/chip across mesh sizes.

The BASELINE north star asks for >=0.8 linear scaling from 1 chip to N
hosts. Per-protein codec work has no cross-device communication, so scaling
is gated on the input pipeline; this harness measures the pure device path
(sharded roundtrip step from parallel/pipeline.py) across mesh sizes and
reports linearity vs the 1-device throughput.

Run: python -m foldcomp_tpu.parallel.scaling [--devices 1,2,4,8]
On a CPU host, XLA_FLAGS=--xla_force_host_platform_device_count=8 gives a
virtual 8-device mesh.
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np


def synthetic_batch(b: int, l: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    ca = np.cumsum(rng.normal(0, 1.5, (b, l, 3)), axis=1).astype(np.float32)
    atom14 = np.tile(ca[:, :, None, :], (1, 1, 14, 1))
    atom14 += rng.normal(0, 0.5, atom14.shape).astype(np.float32)
    res_code = rng.integers(0, 20, (b, l)).astype(np.int32)
    tf_ca = rng.uniform(0, 100, (b, l)).astype(np.float32)
    res_mask = np.ones((b, l), bool)
    return atom14, res_code, tf_ca, res_mask


def measure_scaling(device_counts, b_per_device: int = 64, l: int = 128,
                    s_max: int = 8, seg_width: int = 20, threshold: int = 25,
                    iters: int = 5):
    """Returns [(n_devices, residues_per_s, linearity)]."""
    import jax

    from .pipeline import make_mesh, make_roundtrip_step, shard_batch

    results = []
    base = None
    for n in device_counts:
        if n > len(jax.devices()):
            continue
        mesh = make_mesh(n)
        step = make_roundtrip_step(mesh, s_max=s_max, seg_width=seg_width,
                                   threshold=threshold)
        b = b_per_device * n
        arrays = shard_batch(mesh, synthetic_batch(b, l))
        out = step(*arrays)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = step(*arrays)
            jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        thr = b * l / dt
        if base is None:
            base = thr / n
        results.append((n, thr, thr / (n * base)))
    return results


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--devices", default="1,2,4,8")
    p.add_argument("--batch-per-device", type=int, default=64)
    p.add_argument("--length", type=int, default=128)
    args = p.parse_args(argv)
    counts = [int(x) for x in args.devices.split(",")]
    results = measure_scaling(counts, b_per_device=args.batch_per_device,
                              l=args.length)
    for n, thr, lin in results:
        print(json.dumps({"devices": n, "residues_per_s": round(thr, 1),
                          "linearity": round(lin, 3)}))


if __name__ == "__main__":
    main()
