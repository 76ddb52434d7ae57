"""Stage timing for the fused Pallas decode: prologue / k1 / k2 / k3 /
epilogue as separate dispatches (each pays the tunnel floor ~1.5-3 ms, so
only multi-ms stages are attributable).

Usage: python tools/exp_fused_stages.py [--b 2048] [--iters 8]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/foldcomp_tpu_jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from foldcomp_tpu.backend import ensure_backend
    print(json.dumps({"backend": ensure_backend()}), flush=True)

    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from bench import _force, _load_fcz
    from foldcomp_tpu.codec.batch import pack_decode_batch_seg
    from foldcomp_tpu.kernels import pallas_decode as pd
    from foldcomp_tpu.kernels.bitpack import unpack_records
    from foldcomp_tpu.kernels.nerf import _comp9

    F32 = jnp.float32
    I32 = jnp.int32

    f = _load_fcz()
    arrays, metas = pack_decode_batch_seg([f] * args.b)
    n_res = sum(m.n_residue for m in metas)
    dev = {k: jax.device_put(v) for k, v in arrays.items()}

    seg, n, _ = arrays["seg_records"].shape
    t = 3 * seg
    np_ = -(-n // pd._LANE_PAD) * pd._LANE_PAD

    @jax.jit
    def prologue(seg_records, mins_lane, cont_lane, sc_codes_seg,
                 anchor_xyz, seg_m):
        res_code, phi_q, psi_q, omega_q, ncac_q, cacn_q, cnca_q = \
            unpack_records(seg_records)

        def cont(q, idx):
            return q.astype(F32) * cont_lane[None, :, idx] \
                + mins_lane[None, :, idx]

        ang6 = jnp.stack([cont(psi_q, 1), cont(omega_q, 2), cont(phi_q, 0),
                          cont(ncac_q, 3), cont(cacn_q, 4), cont(cnca_q, 5)],
                         axis=1).reshape(seg * 6, n)
        bl_ca = jnp.where(res_code == pd.PRO_CODE, pd._PRO_N_TO_CA,
                          pd._N_TO_CA)
        sct = (sc_codes_seg.astype(F32) * pd._SC_CONT_F + pd._SC_MIN) \
            .reshape(11 * seg, n)
        fwd9 = jnp.stack(_comp9(anchor_xyz[:, :-1]), axis=0)
        rev9 = jnp.stack(_comp9(anchor_xyz[:, 1:]), axis=0)
        tat = (3 * seg_m).astype(I32)[None, :]
        pad = np_ - n

        def padl(x, val=0):
            return jnp.pad(x, ((0, 0), (0, pad)), constant_values=val) \
                if pad else x

        return (pd._blocked(padl(ang6), seg * 6, np_),
                pd._blocked(padl(bl_ca), seg, np_),
                pd._blocked(padl(sct), 11 * seg, np_),
                pd._blocked(padl(res_code), seg, np_),
                pd._blocked(padl(fwd9), 9, np_),
                pd._blocked(padl(rev9), 9, np_),
                pd._blocked(padl(tat, val=3), 1, np_))

    pro = prologue(dev["seg_records"], dev["mins_lane"], dev["cont_lane"],
                   dev["sc_codes_seg"], dev["anchor_xyz"], dev["seg_m"])
    pro = [jax.device_put(np_ar) for np_ar in pro]
    ang6_p, blca_p, sct_p, code_p, fwd9_p, rev9_p, tat_p = pro

    grid_bb = (np_ // (128 * pd._G_BB),)

    @jax.jit
    def k1(ang6_p, blca_p, fwd9_p, rev9_p, tat_p):
        return pl.pallas_call(
            pd._make_tails_kernel(seg),
            grid=grid_bb,
            in_specs=[pd._spec(seg * 6, pd._G_BB), pd._spec(seg, pd._G_BB),
                      pd._spec(9, pd._G_BB), pd._spec(9, pd._G_BB),
                      pd._spec(1, pd._G_BB)],
            out_specs=pd._spec(9, pd._G_BB),
            out_shape=jax.ShapeDtypeStruct((9, np_ // 128, 128), F32),
            scratch_shapes=[pltpu.VMEM((t, pd._G_BB, 128), F32)
                            for _ in range(3)],
        )(ang6_p, blca_p, fwd9_p, rev9_p, tat_p)

    @jax.jit
    def k2(ang6_p, blca_p, seeds_p, rev9_p, tat_p):
        bb_shape = jax.ShapeDtypeStruct((t, np_ // 128, 128), F32)
        return pl.pallas_call(
            pd._make_backbone_kernel(seg),
            grid=grid_bb,
            in_specs=[pd._spec(seg * 6, pd._G_BB), pd._spec(seg, pd._G_BB),
                      pd._spec(9, pd._G_BB), pd._spec(9, pd._G_BB),
                      pd._spec(1, pd._G_BB)],
            out_specs=(pd._spec(t, pd._G_BB),) * 3,
            out_shape=(bb_shape,) * 3,
            scratch_shapes=[pltpu.VMEM((t, pd._G_BB, 128), F32)
                            for _ in range(6)],
        )(ang6_p, blca_p, seeds_p, rev9_p, tat_p)

    @jax.jit
    def k3(bbx, bby, bbz, code_p, sct_p):
        return pl.pallas_call(
            pd._make_sidechain_kernel(seg),
            grid=(np_ // (128 * pd._G_SC),),
            in_specs=[pd._spec(t, pd._G_SC)] * 3
            + [pd._spec(seg, pd._G_SC), pd._spec(11 * seg, pd._G_SC)],
            out_specs=(pd._spec(3 * 14 * seg, pd._G_SC),
                       pd._spec(3 * seg, pd._G_SC)),
            out_shape=(
                jax.ShapeDtypeStruct((3 * 14 * seg, np_ // 128, 128),
                                     jnp.int16),
                jax.ShapeDtypeStruct((3 * seg, np_ // 128, 128), F32),
            ),
        )(bbx, bby, bbz, code_p, sct_p)

    tails = jax.device_put(k1(ang6_p, blca_p, fwd9_p, rev9_p, tat_p))
    bb = [jax.device_put(x)
          for x in k2(ang6_p, blca_p, fwd9_p, rev9_p, tat_p)]
    offca = [jax.device_put(x) for x in k3(bb[0], bb[1], bb[2],
                                           code_p, sct_p)]
    res_index = jax.device_put(arrays["res_index"])

    @jax.jit
    def epi(off, ca, res_index):
        off = off.reshape(3, 14, seg * np_)
        ca = ca.reshape(3, seg * np_)
        planar_idx = (res_index % seg) * np_ + res_index // seg
        return (jnp.take(off, planar_idx, axis=2),
                jnp.take(ca, planar_idx, axis=1))

    stages = {
        "prologue": lambda: prologue(
            dev["seg_records"], dev["mins_lane"], dev["cont_lane"],
            dev["sc_codes_seg"], dev["anchor_xyz"], dev["seg_m"]),
        "k1_tails": lambda: k1(ang6_p, blca_p, fwd9_p, rev9_p, tat_p),
        "k2_backbone": lambda: k2(ang6_p, blca_p, fwd9_p, rev9_p, tat_p),
        "k3_sidechain": lambda: k3(bb[0], bb[1], bb[2], code_p, sct_p),
        "epilogue": lambda: epi(offca[0], offca[1], res_index),
    }
    out = {"B": args.b, "n_res": n_res}
    for name, fn in stages.items():
        _force(fn())
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [fn() for _ in range(args.iters)]
            _force(outs[-1])
            best = min(best, (time.perf_counter() - t0) / args.iters)
        out[name + "_ms"] = round(best * 1e3, 2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
