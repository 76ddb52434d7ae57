"""Experiment 4: promoted one-hot side-chain kernel vs current, on TPU.

    python tools/exp_sc3.py [--batch 512] [--iters 20]
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
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/foldcomp_tpu_jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from foldcomp_tpu.backend import ensure_backend
    print(json.dumps({"backend": ensure_backend()}), flush=True)

    from bench import _load_fcz
    from foldcomp_tpu.codec.batch import pack_decode_batch_seg
    from foldcomp_tpu.kernels.bitpack import unpack_records
    from foldcomp_tpu.kernels.decode import PRO_CODE, _SC_CONT_F, _SC_MIN
    from foldcomp_tpu.kernels.nerf_pallas import \
        decode_backbone_segments_fused
    from foldcomp_tpu.kernels.sidechain import (place_sidechains_c,
                                                place_sidechains_onehot_c)

    F32 = jnp.float32
    f = _load_fcz()
    arrays, metas = pack_decode_batch_seg([f] * args.batch)
    n_res = sum(m.n_residue for m in metas)
    dev = {k: jax.device_put(v) for k, v in arrays.items()}
    a = (dev["seg_records"], dev["mins_lane"], dev["cont_lane"],
         dev["sc_codes_seg"], dev["anchor_xyz"], dev["seg_m"])

    def timeit(name, fn):
        t0 = time.perf_counter()
        r0 = fn(*a)
        jax.block_until_ready(r0)
        compile_s = time.perf_counter() - t0
        jax.block_until_ready(fn(*a))
        t0 = time.perf_counter()
        outs = [fn(*a) for _ in range(args.iters)]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / args.iters
        print(json.dumps({"name": name, "ms": round(dt * 1e3, 2),
                          "mres_s": round(n_res / dt / 1e6, 2),
                          "compile_s": round(compile_s, 1)}), flush=True)
        return r0

    def core(mode, compact, seg_records, mins_lane, cont_lane, sc_codes_seg,
             anchor_xyz, seg_m):
        seg, n, _ = seg_records.shape
        res_code, phi_q, psi_q, omega_q, ncac_q, cacn_q, cnca_q = \
            unpack_records(seg_records)

        def cont(q, idx):
            return q.astype(F32) * cont_lane[None, :, idx] \
                + mins_lane[None, :, idx]

        seg_ang = jnp.stack(
            [cont(psi_q, 1), cont(omega_q, 2), cont(phi_q, 0),
             cont(ncac_q, 3), cont(cacn_q, 4), cont(cnca_q, 5)], axis=1)
        bx, by, bz = decode_backbone_segments_fused(
            seg_ang, res_code == PRO_CODE, anchor_xyz, seg_m)
        rx = jnp.transpose(bx.reshape(seg, 3, n), (1, 0, 2))
        ry = jnp.transpose(by.reshape(seg, 3, n), (1, 0, 2))
        rz = jnp.transpose(bz.reshape(seg, 3, n), (1, 0, 2))
        sc_t = sc_codes_seg.astype(F32) * _SC_CONT_F + _SC_MIN
        if mode == "cur":
            sx, sy, sz = place_sidechains_c(rx, ry, rz, res_code, sc_t,
                                            gather_free=True)
        else:
            sx, sy, sz = place_sidechains_onehot_c(rx, ry, rz, res_code,
                                                   sc_t)
        if not compact:
            return sx, sy, sz
        atom14 = jnp.stack([sx, sy, sz], axis=-1)
        atom14 = jnp.transpose(atom14, (2, 1, 0, 3))
        ca = atom14[:, :, 1]
        off = (atom14 - ca[:, :, None, :]) * F32(1000.0)
        off = jnp.clip(jnp.round(off), -32767.0, 32767.0).astype(jnp.int16)
        return off, ca

    ref = timeit("cur_raw", jax.jit(partial(core, "cur", False)))
    got = timeit("onehot_raw", jax.jit(partial(core, "onehot", False)))
    bits = all(bool((r == g).all()) for r, g in zip(ref, got))
    close = all(bool(jnp.allclose(r, g, atol=2e-4))
                for r, g in zip(ref, got))
    print(json.dumps({"check": "onehot_raw", "bitexact": bits,
                      "allclose": close}), flush=True)
    timeit("cur_compact", jax.jit(partial(core, "cur", True)))
    timeit("onehot_compact", jax.jit(partial(core, "onehot", True)))


if __name__ == "__main__":
    main()
