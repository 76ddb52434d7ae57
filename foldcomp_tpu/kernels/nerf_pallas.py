"""Pallas TPU kernels for the NeRF scan hot loops.

The XLA `lax.scan` forms pay per-step layout/loop overhead that dominates
the decode time on a v5e (~0.4 ms per scan step against microseconds of
arithmetic). These kernels fuse an entire segment reconstruction into one
VMEM-resident program per lane block: the carry lives in registers, angle
rows stream from VMEM, and each step writes one [BLOCK]-wide atom row.

Layouts match kernels/nerf.py's component form: lane axis (protein x
segment) trailing, atoms/steps on the leading axis. The surrounding
gathers (reverse stream construction, stitching) remain XLA ops.

Enable with FOLDCOMP_TPU_PALLAS=1 (see kernels/decode.py dispatch).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ..core.aatable import (C_TO_N_DIST, CA_TO_C_DIST, N_TO_CA_DIST,
                            PRO_N_TO_CA_DIST)

F32 = jnp.float32

# plain Python floats: jnp scalars would be captured as pallas constants
import numpy as _np

_C_TO_N = float(_np.float32(C_TO_N_DIST))
_N_TO_CA = float(_np.float32(N_TO_CA_DIST))
_PRO_N_TO_CA = float(_np.float32(PRO_N_TO_CA_DIST))
_CA_TO_C = float(_np.float32(CA_TO_C_DIST))

LANE_BLOCK = 512


def _place(ax, ay, az, bx, by, bz, cx, cy, cz, bl, ba_deg, ta_deg):
    """place_atom on [BLOCK] rows (same math as geometry.place_atom_c)."""
    abx, aby, abz = bx - ax, by - ay, bz - az
    bcx, bcy, bcz = cx - bx, cy - by, cz - bz
    inv_bc = jax.lax.rsqrt(jnp.maximum(bcx * bcx + bcy * bcy + bcz * bcz,
                                       1e-30))
    bcnx, bcny, bcnz = bcx * inv_bc, bcy * inv_bc, bcz * inv_bc
    rad = float(_np.float32(_np.pi / 180.0))
    ba = ba_deg * rad
    ta = ta_deg * rad
    dx = -bl * jnp.cos(ba)
    dy = bl * jnp.cos(ta) * jnp.sin(ba)
    dz = bl * jnp.sin(ta) * jnp.sin(ba)
    nx = aby * bcnz - bcny * abz
    ny = abz * bcnx - bcnz * abx
    nz = abx * bcny - bcnx * aby
    inv_n = jax.lax.rsqrt(jnp.maximum(nx * nx + ny * ny + nz * nz,
                                      1e-30))
    nx, ny, nz = nx * inv_n, ny * inv_n, nz * inv_n
    mx = ny * bcnz - bcny * nz
    my = nz * bcnx - bcnz * nx
    mz = nx * bcny - bcnx * ny
    ox = bcnx * dx + mx * dy + nx * dz + cx
    oy = bcny * dx + my * dy + ny * dz + cy
    oz = bcnz * dx + mz * dy + nz * dz + cz
    return ox, oy, oz


def _forward_kernel(seed_ref, ang_ref, pro_ref, fx_ref, fy_ref, fz_ref):
    seg = ang_ref.shape[0]
    ax, ay, az = seed_ref[0], seed_ref[1], seed_ref[2]
    bx, by, bz = seed_ref[3], seed_ref[4], seed_ref[5]
    cx, cy, cz = seed_ref[6], seed_ref[7], seed_ref[8]
    fx_ref[0], fy_ref[0], fz_ref[0] = ax, ay, az
    fx_ref[1], fy_ref[1], fz_ref[1] = bx, by, bz
    fx_ref[2], fy_ref[2], fz_ref[2] = cx, cy, cz
    for i in range(seg - 1):
        psi = ang_ref[i, 0]
        omg = ang_ref[i, 1]
        phi = ang_ref[i, 2]
        ncac = ang_ref[i, 3]
        cacn = ang_ref[i, 4]
        cnca = ang_ref[i, 5]
        pro = pro_ref[i]
        nx, ny, nz = _place(ax, ay, az, bx, by, bz, cx, cy, cz,
                            _C_TO_N, cacn, psi)
        ca_len = jnp.where(pro > 0, _PRO_N_TO_CA, _N_TO_CA)
        cax, cay, caz = _place(bx, by, bz, cx, cy, cz, nx, ny, nz,
                               ca_len, cnca, omg)
        ccx, ccy, ccz = _place(cx, cy, cz, nx, ny, nz, cax, cay, caz,
                               _CA_TO_C, ncac, phi)
        fx_ref[3 * i + 3], fy_ref[3 * i + 3], fz_ref[3 * i + 3] = nx, ny, nz
        fx_ref[3 * i + 4], fy_ref[3 * i + 4], fz_ref[3 * i + 4] = \
            cax, cay, caz
        fx_ref[3 * i + 5], fy_ref[3 * i + 5], fz_ref[3 * i + 5] = \
            ccx, ccy, ccz
        # carry = the three atoms just placed (reconstructBackboneAtoms
        # walks triple-by-triple)
        ax, ay, az = nx, ny, nz
        bx, by, bz = cax, cay, caz
        cx, cy, cz = ccx, ccy, ccz
    return


def forward_scan_pallas(seed9, ang, pro):
    """seed9 [9, N], ang [SEG, 6, N], pro [SEG, N] -> (fx, fy, fz) [T, N]."""
    seg, _, n = ang.shape
    t = 3 * seg
    block = min(LANE_BLOCK, n)
    grid = (pl.cdiv(n, block),)
    out_shape = [jax.ShapeDtypeStruct((t, n), F32)] * 3
    fx, fy, fz = pl.pallas_call(
        _forward_kernel,
        grid=grid,
        interpret=jax.default_backend() != "tpu",
        in_specs=[
            pl.BlockSpec((9, block), lambda i: (0, i)),
            pl.BlockSpec((seg, 6, block), lambda i: (0, 0, i)),
            pl.BlockSpec((seg, block), lambda i: (0, i)),
        ],
        out_specs=[pl.BlockSpec((t, block), lambda i: (0, i))] * 3,
        out_shape=out_shape,
    )(seed9, ang, pro)
    return fx, fy, fz


def _reverse_kernel(seed_ref, tor_ref, angr_ref, rx_ref, ry_ref, rz_ref):
    steps = tor_ref.shape[0]
    ax, ay, az = seed_ref[0], seed_ref[1], seed_ref[2]
    bx, by, bz = seed_ref[3], seed_ref[4], seed_ref[5]
    cx, cy, cz = seed_ref[6], seed_ref[7], seed_ref[8]
    rx_ref[0], ry_ref[0], rz_ref[0] = ax, ay, az
    rx_ref[1], ry_ref[1], rz_ref[1] = bx, by, bz
    rx_ref[2], ry_ref[2], rz_ref[2] = cx, cy, cz
    bls = (_C_TO_N, _CA_TO_C, _N_TO_CA)
    for i in range(steps):
        ox, oy, oz = _place(ax, ay, az, bx, by, bz, cx, cy, cz,
                            bls[i % 3], angr_ref[i], tor_ref[i])
        rx_ref[i + 3], ry_ref[i + 3], rz_ref[i + 3] = ox, oy, oz
        ax, ay, az = bx, by, bz
        bx, by, bz = cx, cy, cz
        cx, cy, cz = ox, oy, oz
    return


def reverse_scan_pallas(seed9, rev_tors, rev_angles):
    """seed9 [9, N], rev_tors/rev_angles [STEPS, N] -> (rx, ry, rz)
    [3+STEPS, N] in reversed orientation."""
    steps, n = rev_tors.shape
    t = steps + 3
    block = min(LANE_BLOCK, n)
    grid = (pl.cdiv(n, block),)
    out_shape = [jax.ShapeDtypeStruct((t, n), F32)] * 3
    rx, ry, rz = pl.pallas_call(
        _reverse_kernel,
        grid=grid,
        interpret=jax.default_backend() != "tpu",
        in_specs=[
            pl.BlockSpec((9, block), lambda i: (0, i)),
            pl.BlockSpec((steps, block), lambda i: (0, i)),
            pl.BlockSpec((steps, block), lambda i: (0, i)),
        ],
        out_specs=[pl.BlockSpec((t, block), lambda i: (0, i))] * 3,
        out_shape=out_shape,
    )(seed9, rev_tors, rev_angles)
    return rx, ry, rz


def _bond_angle_cs(ax, ay, az, bx, by, bz, cx, cy, cz):
    """(cos, sin) of the 3-point angle — no arccos (unsupported in Mosaic);
    place_atom only ever consumes cos/sin of the bond angle and
    sin(acos(x)) = sqrt(1 - x^2) on [0, pi]."""
    d1x, d1y, d1z = ax - bx, ay - by, az - bz
    d2x, d2y, d2z = cx - bx, cy - by, cz - bz
    inner = d1x * d2x + d1y * d2y + d1z * d2z
    s1 = d1x * d1x + d1y * d1y + d1z * d1z
    s2 = d2x * d2x + d2y * d2y + d2z * d2z
    cos_t = jnp.clip(inner / jnp.sqrt(jnp.maximum(s1 * s2, 1e-30)),
                     -1.0, 1.0)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    return cos_t, sin_t


def _place_cs(ax, ay, az, bx, by, bz, cx, cy, cz, bl, cos_ba, sin_ba,
              ta_deg):
    """place_atom with the bond angle given as (cos, sin)."""
    abx, aby, abz = bx - ax, by - ay, bz - az
    bcx, bcy, bcz = cx - bx, cy - by, cz - bz
    inv_bc = jax.lax.rsqrt(jnp.maximum(bcx * bcx + bcy * bcy + bcz * bcz,
                                       1e-30))
    bcnx, bcny, bcnz = bcx * inv_bc, bcy * inv_bc, bcz * inv_bc
    rad = float(_np.float32(_np.pi / 180.0))
    ta = ta_deg * rad
    dx = -bl * cos_ba
    dy = bl * jnp.cos(ta) * sin_ba
    dz = bl * jnp.sin(ta) * sin_ba
    nx = aby * bcnz - bcny * abz
    ny = abz * bcnx - bcnz * abx
    nz = abx * bcny - bcnx * aby
    inv_n = jax.lax.rsqrt(jnp.maximum(nx * nx + ny * ny + nz * nz,
                                      1e-30))
    nx, ny, nz = nx * inv_n, ny * inv_n, nz * inv_n
    mx = ny * bcnz - bcny * nz
    my = nz * bcnx - bcnz * nx
    mz = nx * bcny - bcnx * ny
    ox = bcnx * dx + mx * dy + nx * dz + cx
    oy = bcny * dx + my * dy + ny * dz + cy
    oz = bcnz * dx + mz * dy + nz * dz + cz
    return ox, oy, oz


def _segment_kernel(seed_ref, ang_ref, pro_ref, ranchor_ref, t_ref,
                    bx_ref, by_ref, bz_ref, fx_ref, fy_ref, fz_ref):
    """One fused segment reconstruction per lane block.

    Phase 1 (ascending): forward NeRF into the f*_ref scratch outputs.
    Phase 2 (descending rows): gather-free reverse sweep — bond angles
    recomputed from the forward rows, anchor seed rows injected by masking
    — blended against the forward coords and written to b*_ref.
    """
    seg = ang_ref.shape[0]
    t_max = 3 * seg
    # ---- phase 1: forward --------------------------------------------
    ax, ay, az = seed_ref[0], seed_ref[1], seed_ref[2]
    bx, by, bz = seed_ref[3], seed_ref[4], seed_ref[5]
    cx, cy, cz = seed_ref[6], seed_ref[7], seed_ref[8]
    fx_ref[0], fy_ref[0], fz_ref[0] = ax, ay, az
    fx_ref[1], fy_ref[1], fz_ref[1] = bx, by, bz
    fx_ref[2], fy_ref[2], fz_ref[2] = cx, cy, cz
    for i in range(seg - 1):
        nx, ny, nz = _place(ax, ay, az, bx, by, bz, cx, cy, cz,
                            _C_TO_N, ang_ref[i, 4], ang_ref[i, 0])
        ca_len = jnp.where(pro_ref[i] > 0, _PRO_N_TO_CA, _N_TO_CA)
        cax, cay, caz = _place(bx, by, bz, cx, cy, cz, nx, ny, nz,
                               ca_len, ang_ref[i, 5], ang_ref[i, 1])
        ccx, ccy, ccz = _place(cx, cy, cz, nx, ny, nz, cax, cay, caz,
                               _CA_TO_C, ang_ref[i, 3], ang_ref[i, 2])
        fx_ref[3 * i + 3], fy_ref[3 * i + 3], fz_ref[3 * i + 3] = nx, ny, nz
        fx_ref[3 * i + 4], fy_ref[3 * i + 4], fz_ref[3 * i + 4] = \
            cax, cay, caz
        fx_ref[3 * i + 5], fy_ref[3 * i + 5], fz_ref[3 * i + 5] = \
            ccx, ccy, ccz
        ax, ay, az = nx, ny, nz
        bx, by, bz = cax, cay, caz
        cx, cy, cz = ccx, ccy, ccz

    # ---- phase 2: descending sweep + blend ---------------------------
    t = t_ref[0].astype(jnp.float32)
    ti = t_ref[0]
    n_x, n_y, n_z = ranchor_ref[0], ranchor_ref[1], ranchor_ref[2]
    ca_x, ca_y, ca_z = ranchor_ref[3], ranchor_ref[4], ranchor_ref[5]
    c_x, c_y, c_z = ranchor_ref[6], ranchor_ref[7], ranchor_ref[8]
    bls = (_C_TO_N, _CA_TO_C, _N_TO_CA)
    zero = jnp.zeros_like(n_x)
    v1x = v1y = v1z = v2x = v2y = v2z = v3x = v3y = v3z = zero
    for r in range(t_max - 1, -1, -1):
        # torsion row r comes from the interleaved (psi, omega, phi)
        # stream = ang rows [r//3, r%3]
        tor = ang_ref[r // 3, r % 3]
        # bond angle centered at forward row min(r+1, t_max-2) as (cos, sin)
        rc = min(r + 1, t_max - 2)
        cos_a, sin_a = _bond_angle_cs(
            fx_ref[rc - 1], fy_ref[rc - 1], fz_ref[rc - 1],
            fx_ref[rc], fy_ref[rc], fz_ref[rc],
            fx_ref[rc + 1], fy_ref[rc + 1], fz_ref[rc + 1])
        px, py, pz = _place_cs(v3x, v3y, v3z, v2x, v2y, v2z, v1x, v1y, v1z,
                               bls[(2 - r) % 3], cos_a, sin_a, tor)
        is_c = ti == (r + 1)
        is_ca = ti == (r + 2)
        is_n = ti == (r + 3)
        sx = jnp.where(is_c, c_x, jnp.where(is_ca, ca_x,
                                            jnp.where(is_n, n_x, 0.0)))
        sy = jnp.where(is_c, c_y, jnp.where(is_ca, ca_y,
                                            jnp.where(is_n, n_y, 0.0)))
        sz = jnp.where(is_c, c_z, jnp.where(is_ca, ca_z,
                                            jnp.where(is_n, n_z, 0.0)))
        active = r <= ti - 4
        ox = jnp.where(active, px, sx)
        oy = jnp.where(active, py, sy)
        oz = jnp.where(active, pz, sz)
        w_r = float(r)
        w_f = t - w_r
        inv_t = 1.0 / jnp.maximum(t, 1.0)
        bx_ref[r] = (fx_ref[r] * w_f + ox * w_r) * inv_t
        by_ref[r] = (fy_ref[r] * w_f + oy * w_r) * inv_t
        bz_ref[r] = (fz_ref[r] * w_f + oz * w_r) * inv_t
        v3x, v3y, v3z = v2x, v2y, v2z
        v2x, v2y, v2z = v1x, v1y, v1z
        v1x, v1y, v1z = ox, oy, oz
    return


def _sweep_blend_kernel(fx_ref, fy_ref, fz_ref, ang_ref, ranchor_ref,
                        t_ref, bx_ref, by_ref, bz_ref):
    """Phase-2-only kernel: gather-free descending reverse sweep + blend
    over pre-computed forward coords (see _segment_kernel phase 2)."""
    seg = ang_ref.shape[0]
    t_max = 3 * seg
    t = t_ref[0].astype(jnp.float32)
    ti = t_ref[0]
    n_x, n_y, n_z = ranchor_ref[0], ranchor_ref[1], ranchor_ref[2]
    ca_x, ca_y, ca_z = ranchor_ref[3], ranchor_ref[4], ranchor_ref[5]
    c_x, c_y, c_z = ranchor_ref[6], ranchor_ref[7], ranchor_ref[8]
    bls = (_C_TO_N, _CA_TO_C, _N_TO_CA)
    zero = jnp.zeros_like(n_x)
    v1x = v1y = v1z = v2x = v2y = v2z = v3x = v3y = v3z = zero
    for r in range(t_max - 1, -1, -1):
        tor = ang_ref[r // 3, r % 3]
        rc = min(r + 1, t_max - 2)
        cos_a, sin_a = _bond_angle_cs(
            fx_ref[rc - 1], fy_ref[rc - 1], fz_ref[rc - 1],
            fx_ref[rc], fy_ref[rc], fz_ref[rc],
            fx_ref[rc + 1], fy_ref[rc + 1], fz_ref[rc + 1])
        px, py, pz = _place_cs(v3x, v3y, v3z, v2x, v2y, v2z, v1x, v1y, v1z,
                               bls[(2 - r) % 3], cos_a, sin_a, tor)
        is_c = ti == (r + 1)
        is_ca = ti == (r + 2)
        is_n = ti == (r + 3)
        sx = jnp.where(is_c, c_x, jnp.where(is_ca, ca_x,
                                            jnp.where(is_n, n_x, 0.0)))
        sy = jnp.where(is_c, c_y, jnp.where(is_ca, ca_y,
                                            jnp.where(is_n, n_y, 0.0)))
        sz = jnp.where(is_c, c_z, jnp.where(is_ca, ca_z,
                                            jnp.where(is_n, n_z, 0.0)))
        active = r <= ti - 4
        ox = jnp.where(active, px, sx)
        oy = jnp.where(active, py, sy)
        oz = jnp.where(active, pz, sz)
        w_r = float(r)
        w_f = t - w_r
        inv_t = 1.0 / jnp.maximum(t, 1.0)
        bx_ref[r] = (fx_ref[r] * w_f + ox * w_r) * inv_t
        by_ref[r] = (fy_ref[r] * w_f + oy * w_r) * inv_t
        bz_ref[r] = (fz_ref[r] * w_f + oz * w_r) * inv_t
        v3x, v3y, v3z = v2x, v2y, v2z
        v2x, v2y, v2z = v1x, v1y, v1z
        v1x, v1y, v1z = ox, oy, oz
    return


def sweep_blend_pallas(fx, fy, fz, seg_angles, rev_anchor, t_atoms):
    """fx/fy/fz [T, N] forward coords + [SEG, 6, N] angles + [9, N] next
    anchor + [N] atom counts -> blended (bx, by, bz) [T, N]."""
    seg, _, n = seg_angles.shape
    t_max = 3 * seg
    block = min(LANE_BLOCK, n)
    grid = (pl.cdiv(n, block),)
    return pl.pallas_call(
        _sweep_blend_kernel,
        grid=grid,
        interpret=jax.default_backend() != "tpu",
        in_specs=[
            pl.BlockSpec((t_max, block), lambda i: (0, i)),
            pl.BlockSpec((t_max, block), lambda i: (0, i)),
            pl.BlockSpec((t_max, block), lambda i: (0, i)),
            pl.BlockSpec((seg, 6, block), lambda i: (0, 0, i)),
            pl.BlockSpec((9, block), lambda i: (0, i)),
            pl.BlockSpec((1, block), lambda i: (0, i)),
        ],
        out_specs=[pl.BlockSpec((t_max, block), lambda i: (0, i))] * 3,
        out_shape=[jax.ShapeDtypeStruct((t_max, n), F32)] * 3,
    )(fx, fy, fz, seg_angles, rev_anchor, t_atoms[None, :])


def decode_backbone_segments_fused(seg_angles, seg_is_pro, anchor_xyz,
                                   seg_m, refine_iters: int = 2):
    """Pallas segment reconstruction with the rigid-reseed refinement.

    Round-1 ran the full fused kernel (forward + sweep) once per refine
    iteration — 2x the work. Like the XLA form (nerf.py
    decode_backbone_segments_c), iteration 2's forward chain is a rigid
    transform of iteration 1's (the NeRF recurrence is rigid in its seed
    frame), and its seed comes from blending iteration 1's forward tail
    against the stored anchor directly — so the total device work is ONE
    forward kernel + one cheap elementwise rigid map + ONE sweep/blend
    kernel. Contract matches decode_backbone_segments_c."""
    from .nerf import _comp9, _rigid_reseed

    I32 = jnp.int32
    seg, _, n = seg_angles.shape
    t_max = 3 * seg
    t_atoms = (3 * seg_m).astype(I32)
    pro_f = seg_is_pro.astype(F32)
    b, s = anchor_xyz.shape[0], anchor_xyz.shape[1] - 1

    fwd_anchor9 = _comp9(anchor_xyz[:, :-1])
    rev_anchor9 = _comp9(anchor_xyz[:, 1:])
    fwd_seed = jnp.stack(fwd_anchor9, axis=0)                    # [9, N]
    rev_anchor = jnp.stack(rev_anchor9, axis=0)                  # [9, N]

    fx, fy, fz = forward_scan_pallas(fwd_seed, seg_angles, pro_f)

    if refine_iters >= 2:
        # blended tail rows {t-3, t-2, t-1} mix the forward tail with the
        # stored anchor (the sweep's seed rows ARE the anchor), so the
        # next seed needs no sweep; see nerf.py for the derivation
        k = jnp.arange(3, dtype=I32)[:, None]
        tail_idx = jnp.clip(t_atoms[None, :] - 3 + k, 0, t_max - 1)
        tf = jnp.maximum(t_atoms[None, :].astype(F32), F32(1.0))
        w_r = (t_atoms[None, :] - 3 + k).astype(F32)
        w_f = tf - w_r
        anchor_rows = (
            jnp.stack([rev_anchor9[0], rev_anchor9[3], rev_anchor9[6]]),
            jnp.stack([rev_anchor9[1], rev_anchor9[4], rev_anchor9[7]]),
            jnp.stack([rev_anchor9[2], rev_anchor9[5], rev_anchor9[8]]))
        tails = []
        for comp, f_ in ((0, fx), (1, fy), (2, fz)):
            f_tail = jnp.take_along_axis(f_, tail_idx, axis=0)   # [3, N]
            tails.append((f_tail * w_f + anchor_rows[comp] * w_r) / tf)

        new_seeds = []
        for comp in range(3):
            t3 = tails[comp].reshape(3, b, s)
            anchor_col = anchor_xyz[:, 0, :, comp].T             # [3, B]
            prev = jnp.concatenate([anchor_col[:, :, None], t3[:, :, :-1]],
                                   axis=2)
            new_seeds.append(prev.reshape(3, b * s))
        seeds2 = tuple(new_seeds[comp][atom]
                       for atom in range(3) for comp in range(3))
        fx, fy, fz = _rigid_reseed(fx, fy, fz, fwd_anchor9, seeds2)
        fx = fx.at[0].set(seeds2[0]).at[1].set(seeds2[3]).at[2].set(seeds2[6])
        fy = fy.at[0].set(seeds2[1]).at[1].set(seeds2[4]).at[2].set(seeds2[7])
        fz = fz.at[0].set(seeds2[2]).at[1].set(seeds2[5]).at[2].set(seeds2[8])

    return sweep_blend_pallas(fx, fy, fz, seg_angles, rev_anchor, t_atoms)


def decode_backbone_segments_pallas(seg_angles, seg_is_pro, anchor_xyz,
                                    seg_m, refine_iters: int = 2):
    """decode_backbone_segments_c with the scans as Pallas kernels.

    Same contract: seg_angles [SEG, 6, N], seg_is_pro [SEG, N],
    anchor_xyz [B, S+1, 3, 3], seg_m [N] -> (bx, by, bz) each [T, N].
    """
    from .geometry import bond_angle_c
    from .nerf import _comp9

    I32 = jnp.int32
    seg = seg_angles.shape[0]
    n = seg_angles.shape[2]
    t_max = 3 * seg
    t_atoms = 3 * seg_m
    tor_stream = seg_angles[:, :3, :].reshape(t_max, n)
    pro_f = seg_is_pro.astype(F32)

    fwd_seed = jnp.stack(_comp9(anchor_xyz[:, :-1]), axis=0)     # [9, N]
    # reversed (C, CA, N) seed = flip the atom axis of the next anchor
    rev_seed = jnp.stack(_comp9(anchor_xyz[:, 1:][:, :, ::-1]), axis=0)

    b, s = anchor_xyz.shape[0], anchor_xyz.shape[1] - 1
    steps = t_max - 3
    i = jnp.arange(steps, dtype=I32)[:, None]
    j = jnp.arange(t_max, dtype=I32)[:, None]

    seeds = fwd_seed
    blended = None
    for it in range(max(1, refine_iters)):
        fx, fy, fz = forward_scan_pallas(seeds, seg_angles, pro_f)

        ang = bond_angle_c(fx[:-2], fy[:-2], fz[:-2],
                           fx[1:-1], fy[1:-1], fz[1:-1],
                           fx[2:], fy[2:], fz[2:])
        ang = jnp.pad(ang, ((1, 1), (0, 0)))
        src = t_atoms[None, :] - 4 - i
        src_c = jnp.clip(src, 0, t_max - 1)
        rev_tors = jnp.take_along_axis(tor_stream, src_c, axis=0)
        rev_angles = jnp.take_along_axis(
            ang, jnp.clip(src + 1, 0, t_max - 1), axis=0)

        rx, ry, rz = reverse_scan_pallas(rev_seed, rev_tors, rev_angles)

        back = jnp.clip(t_atoms[None, :] - 1 - j, 0, t_max - 1)
        rx = jnp.take_along_axis(rx, back, axis=0)
        ry = jnp.take_along_axis(ry, back, axis=0)
        rz = jnp.take_along_axis(rz, back, axis=0)

        tf = jnp.maximum(t_atoms[None, :].astype(F32), F32(1.0))
        w_r = j.astype(F32)
        w_f = t_atoms[None, :].astype(F32) - w_r
        blended = ((fx * w_f + rx * w_r) / tf,
                   (fy * w_f + ry * w_r) / tf,
                   (fz * w_f + rz * w_r) / tf)

        if it + 1 < refine_iters:
            k = jnp.arange(3, dtype=I32)[:, None]
            tail_idx = jnp.clip(t_atoms[None, :] - 3 + k, 0, t_max - 1)
            new_seeds = []
            for comp in range(3):
                tails = jnp.take_along_axis(blended[comp], tail_idx,
                                            axis=0).reshape(3, b, s)
                anchor_col = anchor_xyz[:, 0, :, comp].T
                prev = jnp.concatenate(
                    [anchor_col[:, :, None], tails[:, :, :-1]], axis=2)
                new_seeds.append(prev.reshape(3, b * s))
            seeds = jnp.stack(
                [new_seeds[comp][atom] for atom in range(3)
                 for comp in range(3)], axis=0)

    return blended
