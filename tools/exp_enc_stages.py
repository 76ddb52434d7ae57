"""Staged timing of the device ENCODE dispatch (round 4).

Times prefix-jits of the parity encode pipeline (compact wire) so the
per-stage increments locate the fixed ~18 ms dispatch cost that
exp_enc_cost.py exposed (wall nearly flat 512->4096 while modeled bytes
grow 8x). Deltas are indicative only through the drifting tunnel floor;
compare within one run.

Usage: python tools/exp_enc_stages.py [--batch 2048] [--iters 8]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
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
    from foldcomp_tpu.kernels import encode as E

    frag = decode_fcz_batch([_load_fcz()])[0]
    a14, rc, tf, meta = fragment_to_tensors(frag)
    a14 = (np.rint(a14 * np.float32(1000.0)).astype(np.int32)
           .astype(np.float32) / np.float32(1000.0)).astype(np.float32)
    l_pad = _round_up(len(rc), 32)
    b = args.batch
    atom14 = np.zeros((b, l_pad, 14, 3), np.float32)
    res_code = np.zeros((b, l_pad), np.int32)
    n_res = np.full(b, len(rc), np.int32)
    atom14[:, :len(rc)] = a14
    res_code[:, :len(rc)] = rc
    n_total = len(rc) * b
    base, delta, present = (jax.device_put(np.ascontiguousarray(x))
                            for x in _compact_coord_batch(atom14))
    rc_d = jax.device_put(res_code)
    nr_d = jax.device_put(n_res)

    F32 = jnp.float32
    I32 = jnp.int32

    def coords(base, delta, present):
        xi = base[:, :, None, :].astype(I32) + delta.astype(I32)
        bit = (present[:, :, None].astype(I32) >>
               jnp.arange(14, dtype=I32)[None, None, :]) & 1
        xi = jnp.where(bit[..., None] == 1, xi, 0)
        return E._div1000_cr(xi)

    @jax.jit
    def s0_unpack(base, delta, present):
        return coords(base, delta, present)

    @jax.jit
    def s1_bb(base, delta, present, res_code, n_res):
        a = coords(base, delta, present)
        return E._backbone_q_flags(a, res_code, n_res, 0.0)

    @jax.jit
    def s1a_bb_ang(base, delta, present, res_code):
        """Backbone window math only: dihedral/bond parts + Dekker cos +
        acos — everything before the per-stream quantization."""
        atom14 = coords(base, delta, present)
        b, l = res_code.shape
        bb = atom14[:, :, :3]
        flat = jnp.transpose(bb.reshape(b, 3 * l, 3), (1, 2, 0))
        fx, fy, fz = flat[:, 0], flat[:, 1], flat[:, 2]
        dx, dy, dz = fx[1:] - fx[:-1], fy[1:] - fy[:-1], fz[1:] - fz[:-1]
        d1x, d1y, d1z = dx[:-2], dy[:-2], dz[:-2]
        d2x, d2y, d2z = dx[1:-1], dy[1:-1], dz[1:-1]
        d3x, d3y, d3z = dx[2:], dy[2:], dz[2:]
        u1x = d1y * d2z - d2y * d1z
        u1y = d1z * d2x - d2z * d1x
        u1z = d1x * d2y - d2x * d1y
        u2x = d2y * d3z - d3y * d2z
        u2y = d2z * d3x - d3z * d2x
        u2z = d2x * d3y - d3x * d2y
        inner = u1x * u2x + u1y * u2y + u1z * u2z
        denom2 = (u1x * u1x + u1y * u1y + u1z * u1z) * \
            (u2x * u2x + u2y * u2y + u2z * u2z)
        pbx = u2y * d2z - d2y * u2z
        pby = u2z * d2x - d2z * u2x
        pbz = u2x * d2y - d2x * u2y
        det = u1x * pbx + u1y * pby + u1z * pbz
        bad = denom2 <= 0.0
        cos_t, tie = E._cos_f64_emul(inner,
                                     jnp.where(bad, F32(1.0), denom2))
        t_ang = jnp.arccos(jnp.clip(cos_t, -1.0, 1.0)) * E._DEG
        t_ang = jnp.where(det < 0, -t_ang, t_ang)
        e1x, e1y, e1z = -dx[:-1], -dy[:-1], -dz[:-1]
        e2x, e2y, e2z = dx[1:], dy[1:], dz[1:]
        b_inner = e1x * e2x + e1y * e2y + e1z * e2z
        b_denom2 = (e1x * e1x + e1y * e1y + e1z * e1z) * \
            (e2x * e2x + e2y * e2y + e2z * e2z)
        b_bad = b_denom2 <= 0.0
        b_cos, b_tie = E._cos_f64_emul(b_inner,
                                       jnp.where(b_bad, F32(1.0), b_denom2))
        b_ang = jnp.arccos(jnp.clip(b_cos, -1.0, 1.0)) * E._DEG
        return t_ang, tie | bad, b_ang, b_tie | b_bad

    @jax.jit
    def s2_sc(base, delta, present, res_code):
        a = coords(base, delta, present)
        return E._sc_q_flags(a, res_code)

    @jax.jit
    def s3_full(base, delta, present, res_code, n_res):
        return E._parity_jit_compact(base, delta, present, res_code, n_res,
                                     parts_eps=0.0)

    stages = [
        ("unpack+div1000", lambda: s0_unpack(base, delta, present)),
        ("..+bb_angles", lambda: s1a_bb_ang(base, delta, present, rc_d)),
        ("..+backbone_q", lambda: s1_bb(base, delta, present, rc_d, nr_d)),
        ("..+sidechain_q", lambda: s2_sc(base, delta, present, rc_d)),
        ("full", lambda: s3_full(base, delta, present, rc_d, nr_d)),
    ]
    for name, fn in stages:
        out = fn()
        jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = fn()
            jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
            best = min(best, (time.perf_counter() - t0) / args.iters)
        print(json.dumps({
            "stage": name, "batch": b,
            "wall_ms": round(best * 1e3, 2),
            "mres_s": round(n_total / best / 1e6, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
