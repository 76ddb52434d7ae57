"""Per-stage decode profiling on the attached accelerator.

jax.profiler traces do not survive the axon remote-compile tunnel, so this
tool times staged jits instead: each stage is the prefix of the decode
pipeline up to a cut point, and stage cost is the delta between successive
prefixes (XLA may fuse differently per prefix — treat deltas as
indicative, not exact). Output: JSON lines, final summary goes to
PROFILE.md.

Run (ONE process at a time on the tunnel!):
    python tools/profile_decode.py [--batch 512] [--iters 10]
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
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--skip-stages", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/foldcomp_tpu_jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from foldcomp_tpu.backend import ensure_backend
    print(json.dumps({"backend": ensure_backend()}), flush=True)

    from bench import _load_fcz
    from foldcomp_tpu.codec.batch import pack_decode_batch
    from foldcomp_tpu.kernels.bitpack import unpack_records
    from foldcomp_tpu.kernels.decode import _decode_core_lanes, PRO_CODE
    from foldcomp_tpu.kernels.nerf import decode_backbone_segments_c
    from foldcomp_tpu.kernels.sidechain import place_sidechains_c

    F32 = jnp.float32
    I32 = jnp.int32

    f = _load_fcz()
    arrays, metas, seg_pad = pack_decode_batch([f] * args.batch)
    n_res = sum(m.n_residue for m in metas)
    dev = {k: jax.device_put(v) for k, v in arrays.items()}
    b, l, _ = arrays["records"].shape
    s = arrays["seg_start"].shape[1]
    seg_w = seg_pad
    n = b * s

    def timeit(name, fn, *a):
        out = fn(*a)
        jax.block_until_ready(out)
        out = fn(*a)
        jax.block_until_ready(out)
        # sync: block every call (includes per-dispatch overhead)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*a)
            jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.iters
        # sustained: dispatch back-to-back, block once — per-dispatch
        # overhead overlaps device compute, like the streaming pipeline
        t0 = time.perf_counter()
        outs = [fn(*a) for _ in range(args.iters)]
        jax.block_until_ready(outs)
        dt_s = (time.perf_counter() - t0) / args.iters
        print(json.dumps({"stage": name, "ms": round(dt * 1e3, 3),
                          "mres_per_s": round(n_res / dt / 1e6, 3),
                          "sustained_ms": round(dt_s * 1e3, 3),
                          "sustained_mres_per_s":
                              round(n_res / dt_s / 1e6, 3)}),
              flush=True)
        return dt

    # ---- dispatch overhead (trivial op round trip) ----------------------
    tiny = jax.device_put(jnp.zeros((8, 128), F32))
    add1 = jax.jit(lambda x: x + 1.0)
    jax.block_until_ready(add1(tiny))
    t0 = time.perf_counter()
    for _ in range(args.iters):
        jax.block_until_ready(add1(tiny))
    print(json.dumps({"stage": "trivial_dispatch",
                      "ms": round((time.perf_counter() - t0) / args.iters
                                  * 1e3, 3)}), flush=True)

    # ---- full cores ------------------------------------------------------
    def full(nerf_impl="xla", gather_free=True, refine_iters=2):
        return _decode_core_lanes(
            dev["records"], dev["mins"], dev["cont_fs"], dev["sc_codes"],
            dev["tf_codes"], dev["tf_min"], dev["tf_cont"],
            dev["anchor_xyz"], dev["seg_start"], dev["seg_m"],
            seg_width=seg_w, refine_iters=refine_iters,
            nerf_impl=nerf_impl, gather_free=gather_free)

    timeit("full_xla_gatherfree", lambda: full())
    timeit("full_assoc", lambda: full(nerf_impl="assoc"))

    # ---- segment-space core (zero device gathers) -----------------------
    from foldcomp_tpu.codec.batch import pack_decode_batch_seg
    from foldcomp_tpu.kernels.decode import decode_seg_core
    seg_arrays, seg_metas = pack_decode_batch_seg([f] * args.batch)
    seg_dev = {k: jax.device_put(v) for k, v in seg_arrays.items()}

    def seg_full(nerf_impl="xla"):
        return decode_seg_core(
            seg_dev["seg_records"], seg_dev["mins_lane"],
            seg_dev["cont_lane"], seg_dev["sc_codes_seg"],
            seg_dev["anchor_xyz"], seg_dev["seg_m"], refine_iters=2,
            nerf_impl=nerf_impl, gather_free=True)

    timeit("seg_full_xla", lambda: seg_full())
    timeit("seg_full_assoc", lambda: seg_full("assoc"))

    if args.skip_stages:
        return

    # ---- staged prefixes -------------------------------------------------
    @partial(jax.jit, static_argnames=("seg_width",))
    def prep(records, mins, cont_fs, seg_start, seg_m, seg_width):
        res_code, phi_q, psi_q, omega_q, ncac_q, cacn_q, cnca_q = \
            unpack_records(records)

        def cont(q, idx):
            return q.astype(F32) * cont_fs[:, idx, None] + mins[:, idx, None]

        angle6 = jnp.stack([cont(psi_q, 1), cont(omega_q, 2),
                            cont(phi_q, 0), cont(ncac_q, 3),
                            cont(cacn_q, 4), cont(cnca_q, 5)], axis=0)
        angle6 = jnp.swapaxes(angle6, 1, 2)
        seg_start_t = seg_start.T
        j = jnp.arange(seg_width, dtype=I32)
        rec_idx = jnp.clip(
            seg_start_t[:, None, :] + j[None, :, None], 0, l - 1
        ).reshape(s * seg_width, b)
        seg_ang = jnp.take_along_axis(
            angle6, jnp.broadcast_to(rec_idx[None], (6, s * seg_width, b)),
            axis=1)
        seg_ang = seg_ang.reshape(6, s, seg_width, b)
        seg_ang = jnp.transpose(seg_ang, (2, 0, 3, 1)).reshape(
            seg_width, 6, n)
        rc_t = res_code.T
        seg_codes = jnp.take_along_axis(rc_t, rec_idx, axis=0)
        seg_is_pro = jnp.transpose(
            (seg_codes == PRO_CODE).reshape(s, seg_width, b),
            (1, 2, 0)).reshape(seg_width, n)
        return seg_ang, seg_is_pro, rc_t

    t_prep = timeit("prep(unpack+continuize+gather)",
                    lambda: prep(dev["records"], dev["mins"],
                                 dev["cont_fs"], dev["seg_start"],
                                 dev["seg_m"], seg_width=seg_w))

    seg_ang, seg_is_pro, rc_t = prep(dev["records"], dev["mins"],
                                     dev["cont_fs"], dev["seg_start"],
                                     dev["seg_m"], seg_width=seg_w)
    seg_m_flat = dev["seg_m"].reshape(n)

    bb_jit = jax.jit(partial(decode_backbone_segments_c, refine_iters=2,
                             gather_free=True))
    t_bb = timeit("backbone(scans+sweep+blend)",
                  lambda: bb_jit(seg_ang, seg_is_pro, dev["anchor_xyz"],
                                 seg_m_flat))
    bx, by, bz = bb_jit(seg_ang, seg_is_pro, dev["anchor_xyz"], seg_m_flat)

    t_w = 3 * seg_w

    @jax.jit
    def stitch3(bx, by, bz, seg_start):
        seg_start_t = seg_start.T
        r = jnp.arange(l, dtype=I32)
        s_of_r = jnp.sum(seg_start_t[None, :, :] <= r[:, None, None],
                         axis=1).astype(I32) - 1
        s_of_r = jnp.clip(s_of_r, 0, s - 1)
        offset = r[:, None] - jnp.take_along_axis(seg_start_t, s_of_r,
                                                  axis=0)
        base = s_of_r * t_w + 3 * jnp.clip(offset, 0, seg_w - 1)
        atom_k = jnp.arange(3, dtype=I32)
        gidx = (base[:, None, :] + atom_k[None, :, None]).reshape(3 * l, b)
        gidx = jnp.clip(gidx, 0, s * t_w - 1)

        def stitch(comp):
            flat = jnp.transpose(comp.reshape(t_w, b, s),
                                 (2, 0, 1)).reshape(s * t_w, b)
            return jnp.take_along_axis(flat, gidx, axis=0)

        return stitch(bx), stitch(by), stitch(bz)

    t_st = timeit("stitch", lambda: stitch3(bx, by, bz, dev["seg_start"]))
    bbx, bby, bbz = stitch3(bx, by, bz, dev["seg_start"])

    @jax.jit
    def sidech(bbx, bby, bbz, rc_t, sc_codes):
        def to_res_lanes(comp):
            return jnp.transpose(comp.reshape(l, 3, b), (1, 0, 2))
        rx, ry, rz = to_res_lanes(bbx), to_res_lanes(bby), to_res_lanes(bbz)
        sc_t = jnp.transpose(sc_codes, (2, 1, 0))
        sc_torsions = sc_t.astype(F32) * F32(360.0 / 255.0) + F32(-180.0)
        sx, sy, sz = place_sidechains_c(rx, ry, rz, rc_t, sc_torsions,
                                        gather_free=True)
        atom14 = jnp.stack([sx, sy, sz], axis=-1)
        return jnp.transpose(atom14, (2, 1, 0, 3))

    t_sc = timeit("sidechains+assemble",
                  lambda: sidech(bbx, bby, bbz, rc_t, dev["sc_codes"]))

    print(json.dumps({
        "summary_ms": {
            "prep": round(t_prep * 1e3, 3),
            "backbone": round(t_bb * 1e3, 3),
            "stitch": round(t_st * 1e3, 3),
            "sidechains": round(t_sc * 1e3, 3),
            "sum": round((t_prep + t_bb + t_st + t_sc) * 1e3, 3),
        },
        "batch": args.batch, "n_res": n_res, "seg_width": seg_w,
        "lanes": n}), flush=True)


if __name__ == "__main__":
    main()
