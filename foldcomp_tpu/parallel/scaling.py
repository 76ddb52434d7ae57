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


def build_synthetic_db(path: str, n_entries: int,
                       src_db: str = "/root/reference/test/example_db"):
    """Replicate a source FCZ database out to n_entries (fresh keys).

    Returns total residues across the db (for residues/s accounting)."""
    from ..codec import fcz
    from ..io.db import DatabaseReader, DatabaseWriter

    src = DatabaseReader(src_db, use_lookup=True)
    blobs = []
    for pos in range(len(src)):
        data = src.get_data(pos)
        blobs.append(bytes(data))
    src.close()
    w = DatabaseWriter(path)
    total_res = 0
    for i in range(n_entries):
        blob = blobs[i % len(blobs)]
        w.append(blob, i, f"entry{i}")
        body = blob[:-1] if blob.endswith(b"\x00") else blob
        total_res += fcz.parse(body).n_residue
    w.close()
    return total_res


_MP_WORKER = r'''
import sys, time
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address={coord!r},
                           num_processes={nproc}, process_id={pid})
from foldcomp_tpu.parallel.dist import decompress_db_shard
t0 = time.perf_counter()
n = decompress_db_shard({db!r}, {out!r}, jax.process_index(),
                        jax.process_count(), batch_size=64, fast={fast})
dt = time.perf_counter() - t0
print("SHARD", n, f"{{dt:.6f}}")
jax.distributed.shutdown()
'''


def measure_multiprocess_scaling(proc_counts, n_entries: int = 2000,
                                 fast: bool = False, workdir: str = None,
                                 trials: int = 2):
    """End-to-end sharded decompress wall time across REAL process counts.

    Each measurement launches P python processes; every process joins the
    jax.distributed runtime (localhost coordinator), decompresses its
    entry range of a synthetic FCZ database (parse -> decode -> PDB format
    -> shard db write — the full host pipeline SURVEY.md §5 says gates
    scaling), and reports its shard wall. Throughput uses the slowest
    shard (the completion wall). Returns
    [(P, residues_per_s, linearity_vs_P1)].
    """
    import os
    import socket
    import subprocess
    import sys
    import tempfile

    workdir = workdir or tempfile.mkdtemp(prefix="fc_scale_")
    db = os.path.join(workdir, "syn_db")
    total_res = build_synthetic_db(db, n_entries)
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    def free_port():
        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
        s.close()
        return port

    def run_once(p_count):
        out = os.path.join(workdir, f"out_p{p_count}")
        coord = f"127.0.0.1:{free_port()}"
        env = dict(os.environ)
        env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
        # cpu-forced workers: the accelerator plugin's sitecustomize
        # would initialize the (single-client) tunnel in every process
        # and serialize startup
        env.pop("PALLAS_AXON_POOL_IPS", None)
        procs = []
        for pid in range(p_count):
            code = _MP_WORKER.format(repo=repo, coord=coord, nproc=p_count,
                                     pid=pid, db=db, out=out, fast=fast)
            procs.append(subprocess.Popen(
                [sys.executable, "-c", code], stdout=subprocess.PIPE,
                stderr=subprocess.PIPE, text=True, env=env))
        walls = []
        for pr in procs:
            out_s, err_s = pr.communicate(timeout=900)
            if pr.returncode != 0:
                raise RuntimeError(f"worker failed: {err_s[-2000:]}")
            line = [ln for ln in out_s.splitlines()
                    if ln.startswith("SHARD")][0]
            walls.append(float(line.split()[2]))
        return max(walls)

    results = []
    base = None
    for p_count in proc_counts:
        # best-of-N: shared-VM noise (steal time, turbo transitions) can
        # hide real scaling on small boxes
        wall = min(run_once(p_count) for _ in range(trials))
        thr = total_res / wall
        if base is None:
            base = thr / p_count
        results.append((p_count, thr, thr / (p_count * base)))
    return results


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--devices", default="1,2,4,8")
    p.add_argument("--batch-per-device", type=int, default=64)
    p.add_argument("--length", type=int, default=128)
    p.add_argument("--multiprocess", action="store_true",
                   help="real multi-process end-to-end sharded decompress")
    p.add_argument("--procs", default="1,2,4")
    p.add_argument("--entries", type=int, default=2000)
    p.add_argument("--fast", action="store_true")
    args = p.parse_args(argv)
    if args.multiprocess:
        counts = [int(x) for x in args.procs.split(",")]
        results = measure_multiprocess_scaling(counts,
                                               n_entries=args.entries,
                                               fast=args.fast)
        for n, thr, lin in results:
            print(json.dumps({"mode": "multiprocess_decompress",
                              "processes": n,
                              "residues_per_s": round(thr, 1),
                              "linearity": round(lin, 3)}))
        return
    counts = [int(x) for x in args.devices.split(",")]
    results = measure_scaling(counts, b_per_device=args.batch_per_device,
                              l=args.length)
    for n, thr, lin in results:
        print(json.dumps({"devices": n, "residues_per_s": round(thr, 1),
                          "linearity": round(lin, 3)}))


if __name__ == "__main__":
    main()
