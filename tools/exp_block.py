"""One-process experiment: pallas lane-block sweep + stage split.

Times the segment-space decode core (B=512) under: XLA sweep, pallas
fused at several LANE_BLOCK widths, and a no-side-chain variant to split
backbone vs side-chain cost. One TPU process, all compiles in-process.

    python tools/exp_block.py [--batch 512] [--iters 20]
"""
import argparse
import json
import pathlib
import sys
import time
from functools import partial

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/foldcomp_tpu_jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from foldcomp_tpu.backend import ensure_backend
    print(json.dumps({"backend": ensure_backend()}), flush=True)

    from bench import _load_fcz
    from foldcomp_tpu.codec.batch import pack_decode_batch_seg
    from foldcomp_tpu.kernels import nerf_pallas
    from foldcomp_tpu.kernels.decode import decode_seg_core

    f = _load_fcz()
    arrays, metas = pack_decode_batch_seg([f] * args.batch)
    n_res = sum(m.n_residue for m in metas)
    dev = {k: jax.device_put(v) for k, v in arrays.items()}
    a = (dev["seg_records"], dev["mins_lane"], dev["cont_lane"],
         dev["sc_codes_seg"], dev["anchor_xyz"], dev["seg_m"])

    def timeit(name, fn):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*a))
        compile_s = time.perf_counter() - t0
        jax.block_until_ready(fn(*a))
        t0 = time.perf_counter()
        outs = [fn(*a) for _ in range(args.iters)]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / args.iters
        print(json.dumps({"name": name, "ms": round(dt * 1e3, 2),
                          "mres_s": round(n_res / dt / 1e6, 2),
                          "compile_s": round(compile_s, 1)}), flush=True)

    base = dict(refine_iters=2, gather_free=True, compact=True)
    timeit("xla", jax.jit(partial(decode_seg_core, **base)))
    for blk in (512, 1024, 2048):
        nerf_pallas.LANE_BLOCK = blk
        timeit(f"pallas_b{blk}",
               jax.jit(partial(decode_seg_core, nerf_impl="pallas", **base)))

    # backbone-only variants (skip side chains): stage split
    from foldcomp_tpu.kernels.bitpack import unpack_records
    import jax.numpy as jnp
    from foldcomp_tpu.kernels.decode import PRO_CODE
    from foldcomp_tpu.kernels.nerf import decode_backbone_segments_c
    from foldcomp_tpu.kernels.nerf_pallas import \
        decode_backbone_segments_fused

    F32 = jnp.float32

    def backbone_only(impl, seg_records, mins_lane, cont_lane, sc_codes_seg,
                      anchor_xyz, seg_m):
        res_code, phi_q, psi_q, omega_q, ncac_q, cacn_q, cnca_q = \
            unpack_records(seg_records)

        def cont(q, idx):
            return q.astype(F32) * cont_lane[None, :, idx] \
                + mins_lane[None, :, idx]

        seg_ang = jnp.stack(
            [cont(psi_q, 1), cont(omega_q, 2), cont(phi_q, 0),
             cont(ncac_q, 3), cont(cacn_q, 4), cont(cnca_q, 5)], axis=1)
        seg_is_pro = res_code == PRO_CODE
        if impl == "pallas":
            return decode_backbone_segments_fused(seg_ang, seg_is_pro,
                                                  anchor_xyz, seg_m)
        return decode_backbone_segments_c(seg_ang, seg_is_pro, anchor_xyz,
                                          seg_m, refine_iters=2,
                                          gather_free=True)

    timeit("bb_only_xla", jax.jit(partial(backbone_only, "xla")))
    nerf_pallas.LANE_BLOCK = 512
    timeit("bb_only_pallas_b512", jax.jit(partial(backbone_only, "pallas")))
    nerf_pallas.LANE_BLOCK = 2048
    timeit("bb_only_pallas_b2048", jax.jit(partial(backbone_only, "pallas")))


if __name__ == "__main__":
    main()
