"""B-sweep diagnostic for the decode collapse at B>=2048 (VERDICT r3 #1).

For each batch size: time the PRODUCTION decode dispatch (compact planar
output, assoc NeRF, one-hot side chains, res_index stitch) sync and
sustained, and dump the compiled executable's memory analysis
(temp/argument/output bytes) so the superlinear degradation can be
attributed to a specific buffer class (spills, rematerialized temps).

Usage: python tools/exp_bsweep.py [--sizes 512,1024,2048,4096] [--iters 8]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="512,1024,2048,4096")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--impl", default="assoc")
    ap.add_argument("--chunk-lanes", type=int, default=0,
                    help="if >0, decode in lane-chunks of this size")
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
        seg, n, _ = arrays["seg_records"].shape

        kwargs = dict(refine_iters=2, nerf_impl=args.impl, gather_free=True,
                      compact=True, sc_impl="onehot")

        def run():
            return decode_seg_core(
                dev["seg_records"], dev["mins_lane"], dev["cont_lane"],
                dev["sc_codes_seg"], dev["anchor_xyz"], dev["seg_m"],
                res_index=dev.get("res_index"), **kwargs)

        # memory analysis of the exact executable
        lowered = jax.jit(
            lambda sr, ml, cl, sc, ax, sm, ri: decode_seg_core(
                sr, ml, cl, sc, ax, sm, res_index=ri, **kwargs)
        ).lower(dev["seg_records"], dev["mins_lane"], dev["cont_lane"],
                dev["sc_codes_seg"], dev["anchor_xyz"], dev["seg_m"],
                dev.get("res_index"))
        compiled = lowered.compile()
        mem = {}
        try:
            ma = compiled.memory_analysis()
            for k in ("temp_size_in_bytes", "argument_size_in_bytes",
                      "output_size_in_bytes", "alias_size_in_bytes",
                      "generated_code_size_in_bytes",
                      "host_temp_size_in_bytes"):
                v = getattr(ma, k, None)
                if v is not None:
                    mem[k] = int(v)
        except Exception as e:  # pragma: no cover
            mem["error"] = str(e)

        # block_until_ready can NO-OP on the axon backend (observed: a
        # 33 ms matmul chain "blocks" in 0.14 ms). Barrier by fetching one
        # scalar from the last output: the device executes its stream
        # in-order, so the 4-byte D2H completes only after the decode.
        def barrier(o):
            leaf = jax.tree_util.tree_leaves(o)[-1]
            return float(leaf.reshape(-1)[0])

        out = run()
        barrier(out)
        out = run()
        barrier(out)

        # warm barrier RTT (already-ready buffer -> pure fetch cost)
        t0 = time.perf_counter()
        for _ in range(4):
            barrier(out)
        rtt_ms = (time.perf_counter() - t0) / 4 * 1e3

        t0 = time.perf_counter()
        for _ in range(args.iters):
            barrier(run())
        sync_ms = (time.perf_counter() - t0) / args.iters * 1e3

        t0 = time.perf_counter()
        outs = [run() for _ in range(args.iters)]
        barrier(outs[-1])
        sus_ms = (time.perf_counter() - t0) / args.iters * 1e3

        print(json.dumps({
            "B": b, "seg": seg, "lanes": n, "n_res": n_res,
            "rtt_ms": round(rtt_ms, 2),
            "sync_ms": round(sync_ms, 2), "sus_ms": round(sus_ms, 2),
            "sync_mres_s": round(n_res / sync_ms / 1e3, 2),
            "sus_mres_s": round(n_res / sus_ms / 1e3, 2),
            "mem": mem}), flush=True)


if __name__ == "__main__":
    main()
