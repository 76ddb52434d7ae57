"""Cost-analysis diagnostic for the device ENCODE dispatch (round 4).

Decode's round-4 treatment started from exactly this artifact: XLA's
modeled "bytes accessed" per residue against the true I/O signature, and
the modeled-traffic time vs the observed wall at the measured stream
bandwidth. Run it for the full-parity compact-wire encode executable at
each batch size to decide whether a VMEM-fused (Pallas) encode is worth
building or the XLA pipeline is already at its bandwidth bound.

Usage: python tools/exp_enc_cost.py [--sizes 512,2048,4096]
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
    args = ap.parse_args()

    import jax
    import numpy as np
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/foldcomp_tpu_jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from foldcomp_tpu.backend import ensure_backend
    print(json.dumps({"backend": ensure_backend()}), flush=True)

    from bench import _load_fcz
    from foldcomp_tpu.codec.batch import (_compact_coord_batch, _round_up,
                                          decode_fcz_batch,
                                          fragment_to_tensors)
    from foldcomp_tpu.kernels.encode import _parity_jit_compact

    frag = decode_fcz_batch([_load_fcz()])[0]
    a14, rc, tf, meta = fragment_to_tensors(frag)
    # decoded coords aren't milli-exact; snap to the 3-decimal PDB grid
    # (the CLI encode path always starts from parsed PDB text, which is)
    a14 = (np.rint(a14 * np.float32(1000.0)).astype(np.int32)
           .astype(np.float32) / np.float32(1000.0)).astype(np.float32)
    l_pad = _round_up(len(rc), 32)

    for b in [int(x) for x in args.sizes.split(",")]:
        atom14 = np.zeros((b, l_pad, 14, 3), np.float32)
        res_code = np.zeros((b, l_pad), np.int32)
        n_res = np.full(b, len(rc), np.int32)
        atom14[:, :len(rc)] = a14
        res_code[:, :len(rc)] = rc
        n_res_total = len(rc) * b
        base, delta, present = (jax.device_put(x)
                                for x in _compact_coord_batch(atom14))
        rc_d = jax.device_put(res_code)
        nr_d = jax.device_put(n_res)

        fn = jax.jit(lambda ba, de, pr, rcj, nrj: _parity_jit_compact(
            ba, de, pr, rcj, nrj, parts_eps=0.0))
        lowered = fn.lower(base, delta, present, rc_d, nr_d)
        compiled = lowered.compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        mem = compiled.memory_analysis()
        bytes_acc = ca.get("bytes accessed", 0.0)
        flops = ca.get("flops", 0.0)

        def run():
            return fn(base, delta, present, rc_d, nr_d)

        out = run()
        jax.tree_util.tree_map(
            lambda x: x.block_until_ready(), out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = run()
        jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
        wall = (time.perf_counter() - t0) / args.iters
        # true I/O: compact wire in (base 3*i32 + delta 14*3*i16 + present
        # u16 + code i32 per residue) + records/flags/sc out
        true_in = n_res_total * (12 + 84 + 2 + 4)
        true_out = n_res_total * (8 + 1 + 2 + 11 + 2)
        print(json.dumps({
            "batch": b,
            "n_res": n_res_total,
            "wall_ms": round(wall * 1e3, 2),
            "res_per_s": round(n_res_total / wall / 1e6, 1),
            "modeled_GB": round(bytes_acc / 1e9, 3),
            "modeled_bytes_per_res": round(bytes_acc / n_res_total, 1),
            "true_io_bytes_per_res": round((true_in + true_out)
                                           / n_res_total, 1),
            "gflops_per_dispatch": round(flops / 1e9, 2),
            "temp_mb": round(getattr(mem, "temp_size_in_bytes", 0)
                             / 1e6, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
