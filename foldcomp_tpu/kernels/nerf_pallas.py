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
