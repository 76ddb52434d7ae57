"""Experiment 3: side-chain placement variants (pallas backbone fixed).

  cur       place_sidechains_c gather_free (per-lane [SEG,N,14,3] preds
            gather + strided slices + where-select chains)   [baseline]
  smalltab  per-slot [24]-entry table lookups by code (no big gather)
  onehot    all per-slot lookups via one f32 one-hot [24,lanes] contraction
            (MXU matmul), then the same select chains

    python tools/exp_sc2.py [--batch 512] [--iters 20]
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
    import numpy as np
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/foldcomp_tpu_jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from foldcomp_tpu.backend import ensure_backend
    print(json.dumps({"backend": ensure_backend()}), flush=True)

    from bench import _load_fcz
    from foldcomp_tpu.codec.batch import pack_decode_batch_seg
    from foldcomp_tpu.kernels.bitpack import unpack_records
    from foldcomp_tpu.kernels.decode import PRO_CODE, _SC_CONT_F, _SC_MIN
    from foldcomp_tpu.kernels.geometry import place_atom_c
    from foldcomp_tpu.kernels.nerf_pallas import \
        decode_backbone_segments_fused
    from foldcomp_tpu.kernels.sidechain import (_BOND_ANG, _BOND_LEN,
                                                _PRED_IDX, MAX_ATOM,
                                                place_sidechains_c)

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

    def sc_smalltab(rx, ry, rz, code, sc_t):
        rows_x = [rx[0], rx[1], rx[2]]
        rows_y = [ry[0], ry[1], ry[2]]
        rows_z = [rz[0], rz[1], rz[2]]

        def sel(rows, idx):
            acc = rows[0]
            for kk in range(1, len(rows)):
                acc = jnp.where(idx == kk, rows[kk], acc)
            return acc

        for k in range(3, MAX_ATOM):
            p0 = jnp.take(jnp.asarray(_PRED_IDX[:, k, 0]), code, axis=0)
            p1 = jnp.take(jnp.asarray(_PRED_IDX[:, k, 1]), code, axis=0)
            p2 = jnp.take(jnp.asarray(_PRED_IDX[:, k, 2]), code, axis=0)
            bl = jnp.take(jnp.asarray(_BOND_LEN[:, k]), code, axis=0)
            ba = jnp.take(jnp.asarray(_BOND_ANG[:, k]), code, axis=0)
            ox, oy, oz = place_atom_c(
                sel(rows_x, p0), sel(rows_y, p0), sel(rows_z, p0),
                sel(rows_x, p1), sel(rows_y, p1), sel(rows_z, p1),
                sel(rows_x, p2), sel(rows_y, p2), sel(rows_z, p2),
                bl, ba, sc_t[k - 3])
            rows_x.append(ox)
            rows_y.append(oy)
            rows_z.append(oz)
        return (jnp.stack(rows_x), jnp.stack(rows_y), jnp.stack(rows_z))

    def sc_onehot(rx, ry, rz, code, sc_t):
        seg, n = code.shape
        onehot = (code[None] == jnp.arange(24, dtype=code.dtype)
                  [:, None, None]).astype(F32)        # [24, SEG, N]
        # all per-slot constants in ONE [24, M] table -> MXU contraction
        cols = []
        for k in range(3, MAX_ATOM):
            cols += [_PRED_IDX[:, k, 0], _PRED_IDX[:, k, 1],
                     _PRED_IDX[:, k, 2], _BOND_LEN[:, k], _BOND_ANG[:, k]]
        tab = jnp.asarray(np.stack(cols, axis=1), jnp.float32)  # [24, M]
        vals = jnp.einsum("cm,csn->msn", tab, onehot,
                          preferred_element_type=jnp.float32)   # [M,SEG,N]

        rows_x = [rx[0], rx[1], rx[2]]
        rows_y = [ry[0], ry[1], ry[2]]
        rows_z = [rz[0], rz[1], rz[2]]

        def sel(rows, idxf):
            acc = rows[0]
            for kk in range(1, len(rows)):
                acc = jnp.where(idxf == float(kk), rows[kk], acc)
            return acc

        for k in range(3, MAX_ATOM):
            m = 5 * (k - 3)
            p0, p1, p2 = vals[m], vals[m + 1], vals[m + 2]
            bl, ba = vals[m + 3], vals[m + 4]
            ox, oy, oz = place_atom_c(
                sel(rows_x, p0), sel(rows_y, p0), sel(rows_z, p0),
                sel(rows_x, p1), sel(rows_y, p1), sel(rows_z, p1),
                sel(rows_x, p2), sel(rows_y, p2), sel(rows_z, p2),
                bl, ba, sc_t[k - 3])
            rows_x.append(ox)
            rows_y.append(oy)
            rows_z.append(oz)
        return (jnp.stack(rows_x), jnp.stack(rows_y), jnp.stack(rows_z))

    def core(mode, seg_records, mins_lane, cont_lane, sc_codes_seg,
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
        code = jnp.clip(res_code, 0, 23)
        if mode == "cur":
            return place_sidechains_c(rx, ry, rz, res_code, sc_t,
                                      gather_free=True)
        if mode == "smalltab":
            return sc_smalltab(rx, ry, rz, code, sc_t)
        return sc_onehot(rx, ry, rz, code, sc_t)

    ref = timeit("cur", jax.jit(partial(core, "cur")))
    for mode in ("smalltab", "onehot"):
        got = timeit(mode, jax.jit(partial(core, mode)))
        same = all(bool(jnp.allclose(r, g, atol=2e-4))
                   for r, g in zip(ref, got))
        print(json.dumps({"check": mode, "match": same}), flush=True)


if __name__ == "__main__":
    main()
