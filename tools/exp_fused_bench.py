"""Interleaved A/B: fused Pallas decode vs the assoc XLA core, on-device.

Interleaves the two implementations within each batch size so tunnel
phase drift cannot favor either side. Prints sustained + sync walls and
memory analysis for the fused executable.

Usage: python tools/exp_fused_bench.py [--sizes 512,2048,4096] [--iters 8]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="512,2048,4096")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--groups", type=int, default=3)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/foldcomp_tpu_jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from foldcomp_tpu.backend import ensure_backend
    print(json.dumps({"backend": ensure_backend()}), flush=True)

    from bench import _force, _load_fcz
    from foldcomp_tpu.codec.batch import (pack_decode_batch_lanes,
                                          pack_decode_batch_seg)
    from foldcomp_tpu.kernels.decode import decode_seg_core
    from foldcomp_tpu.kernels.pallas_decode import decode_seg_fused

    f = _load_fcz()

    for b in [int(x) for x in args.sizes.split(",")]:
        al, ml = pack_decode_batch_lanes([f] * b)
        arrays, metas = pack_decode_batch_seg([f] * b)
        n_res = sum(m.n_residue for m in metas)
        devl = {k: jax.device_put(v) for k, v in al.items()}
        dev = {k: jax.device_put(v) for k, v in arrays.items()}
        a = (dev["seg_records"], dev["mins_lane"], dev["cont_lane"],
             dev["sc_codes_seg"], dev["anchor_xyz"], dev["seg_m"],
             dev["res_index"])

        def run_fused():
            return decode_seg_fused(
                devl["seg_records"], devl["mins_lane"], devl["cont_lane"],
                devl["sc_codes_seg"], devl["fwd9"], devl["rev9"],
                devl["is_first"], devl["seg_m"])

        def run_assoc():
            return decode_seg_core(
                a[0], a[1], a[2], a[3], a[4], a[5], res_index=a[6],
                refine_iters=2, nerf_impl="assoc", gather_free=True,
                compact=True, sc_impl="onehot")

        t0 = time.perf_counter()
        _force(run_fused())
        compile_f = time.perf_counter() - t0
        t0 = time.perf_counter()
        _force(run_assoc())
        compile_a = time.perf_counter() - t0

        res = {}
        for name, fn in (("fused", run_fused), ("assoc", run_assoc)):
            best_sus, best_sync = float("inf"), float("inf")
            _force(fn())
            for _ in range(args.groups):
                t0 = time.perf_counter()
                outs = [fn() for _ in range(args.iters)]
                _force(outs[-1])
                best_sus = min(best_sus,
                               (time.perf_counter() - t0) / args.iters)
                t0 = time.perf_counter()
                _force(fn())
                best_sync = min(best_sync, time.perf_counter() - t0)
            res[name] = (best_sus, best_sync)

        lowered = jax.jit(decode_seg_fused).lower(
            devl["seg_records"], devl["mins_lane"], devl["cont_lane"],
            devl["sc_codes_seg"], devl["fwd9"], devl["rev9"],
            devl["is_first"], devl["seg_m"])
        mem = lowered.compile().memory_analysis()
        print(json.dumps({
            "B": b, "n_res": n_res,
            "fused_sus_ms": round(res["fused"][0] * 1e3, 2),
            "assoc_sus_ms": round(res["assoc"][0] * 1e3, 2),
            "fused_sync_ms": round(res["fused"][1] * 1e3, 2),
            "assoc_sync_ms": round(res["assoc"][1] * 1e3, 2),
            "fused_sus_mres_s": round(n_res / res["fused"][0] / 1e6, 2),
            "assoc_sus_mres_s": round(n_res / res["assoc"][0] / 1e6, 2),
            "compile_s": [round(compile_f, 1), round(compile_a, 1)],
            "fused_temp_mb": round(mem.temp_size_in_bytes / 1e6, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
