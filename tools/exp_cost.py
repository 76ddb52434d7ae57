"""Cost-analysis + profiler diagnostic for the decode dispatch (VERDICT r4 #1).

Prints XLA's cost analysis (flops, bytes accessed = modeled HBM traffic) for
the production decode executable at each batch size, plus the roofline times
those numbers imply at the measured stream bandwidth, so the gap between
modeled-traffic time and observed wall can be attributed (latency-bound
serial fusions vs genuine traffic). Optionally captures a profiler trace.

Usage: python tools/exp_cost.py [--sizes 512,2048] [--trace /tmp/tracedir]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="512,2048")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--trace", default="")
    ap.add_argument("--impl", default="assoc")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/foldcomp_tpu_jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from foldcomp_tpu.backend import ensure_backend
    print(json.dumps({"backend": ensure_backend()}), flush=True)

    from bench import _load_fcz
    from foldcomp_tpu.codec.batch import pack_decode_batch_seg
    from foldcomp_tpu.kernels.decode import decode_seg_core

    f = _load_fcz()

    for b in [int(x) for x in args.sizes.split(",")]:
        arrays, metas = pack_decode_batch_seg([f] * b)
        n_res = sum(m.n_residue for m in metas)
        dev = {k: jax.device_put(v) for k, v in arrays.items()}

        kwargs = dict(refine_iters=2, nerf_impl=args.impl, gather_free=True,
                      compact=True, sc_impl="onehot")

        fn = jax.jit(lambda sr, ml, cl, sc, ax, sm, ri: decode_seg_core(
            sr, ml, cl, sc, ax, sm, res_index=ri, **kwargs))
        lowered = fn.lower(dev["seg_records"], dev["mins_lane"],
                           dev["cont_lane"], dev["sc_codes_seg"],
                           dev["anchor_xyz"], dev["seg_m"],
                           dev.get("res_index"))
        compiled = lowered.compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        keys = {k: v for k, v in sorted(ca.items())
                if not k.startswith("utilization")
                and (isinstance(v, (int, float)) and abs(v) > 0)}
        # fusion count from the optimized HLO
        txt = compiled.as_text()
        n_fusion = txt.count(" fusion(")
        n_while = txt.count(" while(")
        n_allops = txt.count("\n")

        def run():
            return fn(dev["seg_records"], dev["mins_lane"], dev["cont_lane"],
                      dev["sc_codes_seg"], dev["anchor_xyz"], dev["seg_m"],
                      dev.get("res_index"))

        out = run()
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        outs = [run() for _ in range(args.iters)]
        jax.block_until_ready(outs[-1])
        sus_ms = (time.perf_counter() - t0) / args.iters * 1e3

        bytes_acc = ca.get("bytes accessed", 0.0)
        flops = ca.get("flops", 0.0)
        print(json.dumps({
            "B": b, "n_res": n_res, "sus_ms": round(sus_ms, 2),
            "sus_mres_s": round(n_res / sus_ms / 1e3, 2),
            "bytes_accessed_mb": round(bytes_acc / 1e6, 1),
            "flops_g": round(flops / 1e9, 3),
            "traffic_ms_at_564gbs": round(bytes_acc / 564e9 * 1e3, 3),
            "bytes_per_res": round(bytes_acc / max(n_res, 1), 1),
            "n_fusion": n_fusion, "n_while": n_while,
            "hlo_lines": n_allops,
        }), flush=True)
        if args.trace and b == int(args.sizes.split(",")[-1]):
            with jax.profiler.trace(args.trace):
                outs = [run() for _ in range(4)]
                jax.block_until_ready(outs[-1])
            print(json.dumps({"trace_dir": args.trace}), flush=True)


if __name__ == "__main__":
    main()
