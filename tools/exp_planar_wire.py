"""A/B the plane-major native encode wire (round 5).

Measures, on the live backend:
- host pack: numpy fill + _compact_coord_batch vs the one-pass C
  fcz_pack_encode_wire (same outputs, plane-major) — the planar win
  lives here (the host pack is the e2e encode bottleneck on any link);
- device encode: fused kernel fed the [B,L] wire (device transpose
  prologue) vs fed the plane-major wire, interleaved K=8 in-jit
  applications (distinct parameters, floor amortized, drift cancelled
  by alternating the two variants in one loop). Measured equal within
  noise: XLA overlaps the prologue transpose across in-flight
  applications, so removing it does not change the amortized device
  wall — the submit-path win is purely the 4x host pack.

Usage: python tools/exp_planar_wire.py [--batch 2048] [--iters 10]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, iters):
    fn()
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import numpy as np
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/foldcomp_tpu_jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    from foldcomp_tpu.backend import ensure_backend
    out = {"backend": ensure_backend(), "batch": args.batch}

    from bench import _load_fcz
    from foldcomp_tpu.codec.batch import (_compact_coord_batch,
                                          _pack_encode_wire_native,
                                          _round_up, decode_fcz_batch,
                                          fragment_to_tensors)
    from foldcomp_tpu.kernels.encode import _parts_eps
    from foldcomp_tpu.kernels.pallas_encode import (_fused_parity_jit,
                                                    fused_pb)

    frag = decode_fcz_batch([_load_fcz()])[0]
    a14, rc, tf, meta = fragment_to_tensors(frag)
    a14 = (np.rint(a14 * np.float32(1000.0)).astype(np.int32)
           .astype(np.float32) / np.float32(1000.0)).astype(np.float32)
    a14 = np.ascontiguousarray(a14)
    m = len(rc)
    l = _round_up(m, 32)
    b = args.batch
    out["n_res_total"] = m * b
    live = [(i, (a14, rc, tf)) for i in range(b)]

    # ---- host pack walls ----
    def np_pack():
        atom14 = np.zeros((b, l, 14, 3), np.float32)
        for k in range(b):
            atom14[k, :m] = a14
        return _compact_coord_batch(atom14)

    scratch = np.empty((b, l, 14, 3), np.float32)

    def c_pack():
        return _pack_encode_wire_native(live, scratch)

    t_np = timeit(lambda: np_pack(), max(2, args.iters // 3))
    t_c = timeit(lambda: c_pack(), args.iters)
    out["host_pack_numpy_ms"] = round(t_np * 1e3, 2)
    out["host_pack_native_ms"] = round(t_c * 1e3, 2)
    out["host_pack_native_mres_s"] = round(m * b / t_c / 1e6, 1)
    out["host_pack_speedup"] = round(t_np / t_c, 2)

    # ---- device walls: interleaved K=8 in-jit ----
    atom14 = np.zeros((b, l, 14, 3), np.float32)
    for k in range(b):
        atom14[k, :m] = a14
    base, delta, present = _compact_coord_batch(atom14)
    wire = c_pack()
    assert isinstance(wire, tuple)
    baseT, deltaT, presT = wire
    pb = fused_pb(l)
    bp = presT.shape[0]
    rc_b = np.zeros((b, l), np.int32)
    rc_b[:, :m] = rc
    nr_b = np.full(b, m, np.int32)
    rc_p = np.zeros((bp, l), np.int32)
    rc_p[:b, :m] = rc
    nr_p = np.zeros(bp, np.int32)
    nr_p[:b] = m
    eps = _parts_eps()
    dev = jax.device_put
    A_c = [dev(np.asarray(base)), dev(np.asarray(delta)),
           dev(np.asarray(present)), dev(rc_b), dev(nr_b)]
    A_p = [dev(np.asarray(baseT)), dev(np.asarray(deltaT)),
           dev(np.asarray(presT)), dev(rc_p), dev(nr_p)]
    K = 8

    def make(planar, A):
        @jax.jit
        def f(*flat):
            n = len(flat) // K
            return [_fused_parity_jit(
                *flat[i * n:(i + 1) * n], pb=pb, parts_eps=eps,
                planar=planar)["records"] for i in range(K)]
        return f, [x for _ in range(K) for x in A]

    fc, flat_c = make(False, A_c)
    fp, flat_p = make(True, A_p)
    jax.block_until_ready(fc(*flat_c))
    jax.block_until_ready(fp(*flat_p))
    tc, tp = [], []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fc(*flat_c))
        tc.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        jax.block_until_ready(fp(*flat_p))
        tp.append(time.perf_counter() - t0)
    out["fused_compact_injit_ms"] = round(min(tc) / K * 1e3, 3)
    out["fused_planar_injit_ms"] = round(min(tp) / K * 1e3, 3)
    out["fused_planar_injit_res_s_M"] = round(
        m * b / (min(tp) / K) / 1e6, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
