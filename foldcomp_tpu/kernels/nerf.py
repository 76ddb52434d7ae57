"""Segmented batched NeRF reconstruction (the decode hot path, TPU-first).

The reference reconstructs each protein sequentially: a forward NeRF
recurrence per anchor segment, a reverse recurrence seeded by the stored
next-anchor coordinates, and a position-weighted blend
(foldcomp.cpp:779-902, nerf.cpp:223-400). Its only parallelism is one OpenMP
thread per protein.

Here the recurrence is restructured for the TPU: every (protein, segment)
pair is an independent lane, so the sequential chain is a `lax.scan` of
length ~anchor_threshold (~25 residues -> 75 atoms) batched over B x S
lanes on the VPU, instead of a 3L-step chain per protein.

Layout: the component form keeps each coordinate component as a separate
array whose trailing axis is the (protein x segment) lane axis N, with
atom positions on the sublane axis — a [..., 3]-vector layout tiles as
(8, 128) over the trailing (3,) axis and wastes ~98% of every tile. On
TPU the remaining cost after the layout fix was per-lane gathers, removed
by `_blend_pass_sweep` (see its docstring); `_blend_pass_c` keeps the
gather form, which CPU prefers. The vec3 variants at the bottom of this
file are the legacy comparison path.

One true cross-segment dependency exists in the reference: segment s's
forward pass is seeded by segment s-1's *blended* tail, not by the stored
anchor (foldcomp.cpp:849-857). The blended tail equals the stored anchor
plus a (3,2,1)/t-weighted forward-drift correction, so we run the forward
scan `refine_iters` times: iteration 1 seeds every segment with its anchor,
iteration k>=2 re-seeds with the blend-tail computed from iteration k-1.
Two iterations leave a residual of order (3/t)^2 * drift (micro-angstrom),
far below the quantization floor; `refine_iters=2` is the default and keeps
the decoded RMSD inside the reference CI gate (build.sh:34-38).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.aatable import (C_TO_N_DIST, CA_TO_C_DIST, N_TO_CA_DIST,
                            PRO_N_TO_CA_DIST)
from .geometry import bond_angle_c, place_atom_c

F32 = jnp.float32
I32 = jnp.int32

_C_TO_N = np.float32(C_TO_N_DIST)
_N_TO_CA = np.float32(N_TO_CA_DIST)
_PRO_N_TO_CA = np.float32(PRO_N_TO_CA_DIST)
_CA_TO_C = np.float32(CA_TO_C_DIST)


def _forward_scan_c(seed9, ang, is_pro):
    """Forward backbone reconstruction over all lanes (component form).

    seed9:  tuple of 9 arrays [N] — previous N/CA/C atom components in
            (ax, ay, az, bx, by, bz, cx, cy, cz) order
    ang:    f32 [SEG, 6, N] continuized (psi, omega, phi, n_ca_c, ca_c_n,
            c_n_ca) per segment-local record
    is_pro: bool [SEG, N]
    Returns 9 component arrays, each [T=3*SEG, N] — x/y/z of every atom.

    Parity: reconstructBackboneAtoms (foldcomp.cpp:167-246) — step i places
    residue i+1's N (psi_i, ca_c_n_i), CA (omega_i, c_n_ca_i; proline bond
    length from residue i), C (phi_i, n_ca_c_i).
    """
    seg = ang.shape[0]
    xs = (ang[:seg - 1], is_pro[:seg - 1])

    def step(carry, x):
        a6, pro = x
        ax, ay, az, bx, by, bz, cx, cy, cz = carry
        nx, ny, nz = place_atom_c(ax, ay, az, bx, by, bz, cx, cy, cz,
                                  _C_TO_N, a6[4], a6[0])
        ca_len = jnp.where(pro, _PRO_N_TO_CA, _N_TO_CA)
        cax, cay, caz = place_atom_c(bx, by, bz, cx, cy, cz, nx, ny, nz,
                                     ca_len, a6[5], a6[1])
        ccx, ccy, ccz = place_atom_c(cx, cy, cz, nx, ny, nz, cax, cay, caz,
                                     _CA_TO_C, a6[3], a6[2])
        new = (nx, ny, nz, cax, cay, caz, ccx, ccy, ccz)
        return new, new

    _, ys = jax.lax.scan(step, seed9, xs)
    # ys: 9 arrays [SEG-1, N]; interleave (N, CA, C) atoms per residue and
    # prepend the seed triple -> [T, N] per component
    out = []
    n_lanes = seed9[0].shape[0]
    for comp in range(3):  # x, y, z
        rows = jnp.stack([ys[comp], ys[3 + comp], ys[6 + comp]],
                         axis=1).reshape(3 * (seg - 1), n_lanes)
        seed_rows = jnp.stack([seed9[comp], seed9[3 + comp],
                               seed9[6 + comp]], axis=0)
        out.append(jnp.concatenate([seed_rows, rows], axis=0))
    return out[0], out[1], out[2]


def _reverse_scan_c(seed9, rev_tors, rev_angles):
    """Reverse (C->N) reconstruction (nerf.cpp:342-400), component form.

    seed9:      9 arrays [N] — the next anchor's (C, CA, N) components
    rev_tors:   [STEPS, N] reversed torsion stream
    rev_angles: [STEPS, N] reversed bond angles from the forward coords
    Returns 3 arrays [3 + STEPS, N] (reversed orientation).

    Bond lengths cycle (C_TO_N, CA_TO_C, N_TO_CA) with the step index.
    """
    n_steps = rev_tors.shape[0]
    bl_cycle = jnp.asarray([_C_TO_N, _CA_TO_C, _N_TO_CA], F32)
    bls = bl_cycle[jnp.arange(n_steps, dtype=I32) % 3]
    xs = (rev_tors, rev_angles, bls)

    def step(carry, x):
        tor, a, bl = x
        ax, ay, az, bx, by, bz, cx, cy, cz = carry
        ox, oy, oz = place_atom_c(ax, ay, az, bx, by, bz, cx, cy, cz,
                                  bl, a, tor)
        new = (bx, by, bz, cx, cy, cz, ox, oy, oz)
        return new, (ox, oy, oz)

    _, ys = jax.lax.scan(step, seed9, xs)
    out = []
    for comp in range(3):
        seed_rows = jnp.stack([seed9[comp], seed9[3 + comp],
                               seed9[6 + comp]], axis=0)
        out.append(jnp.concatenate([seed_rows, ys[comp]], axis=0))
    return out[0], out[1], out[2]


def _blend_pass_c(fx, fy, fz, rev_seed9, tor_stream, t_atoms):
    """Reverse reconstruction + positional blend (component form).

    fx/fy/fz:   [T, N] forward coords
    rev_seed9:  9 arrays [N] — stored next-anchor (C, CA, N) components
    tor_stream: [T, N] interleaved (psi, omega, phi) stream
    t_atoms:    [N] valid atom count per lane (3 * m_records)
    Returns blended components, each [T, N].

    Parity: reconstructBackboneReverse (foldcomp.cpp:248-273) +
    weightedAverage (atom_coordinate.cpp:145-163). Reverse bond angles are
    measured on the forward-reconstructed coords, like the reference.
    """
    t_max = fx.shape[0]
    steps = t_max - 3

    ang = bond_angle_c(fx[:-2], fy[:-2], fz[:-2],
                       fx[1:-1], fy[1:-1], fz[1:-1],
                       fx[2:], fy[2:], fz[2:])          # [T-2, N]
    ang = jnp.pad(ang, ((1, 1), (0, 0)))                # center-aligned

    i = jnp.arange(steps, dtype=I32)[:, None]           # [STEPS, 1]
    src = t_atoms[None, :] - 4 - i                      # t-4-i
    src_c = jnp.clip(src, 0, t_max - 1)
    rev_tors = jnp.take_along_axis(tor_stream, src_c, axis=0)
    rev_angles = jnp.take_along_axis(ang, jnp.clip(src + 1, 0, t_max - 1),
                                     axis=0)

    rx, ry, rz = _reverse_scan_c(rev_seed9, rev_tors, rev_angles)

    # map reversed orientation back: out[j] = out_rev[t-1-j]
    j = jnp.arange(t_max, dtype=I32)[:, None]
    back = jnp.clip(t_atoms[None, :] - 1 - j, 0, t_max - 1)
    rx = jnp.take_along_axis(rx, back, axis=0)
    ry = jnp.take_along_axis(ry, back, axis=0)
    rz = jnp.take_along_axis(rz, back, axis=0)

    tf = jnp.maximum(t_atoms[None, :].astype(F32), F32(1.0))
    w_r = j.astype(F32)
    w_f = t_atoms[None, :].astype(F32) - w_r
    bx = (fx * w_f + rx * w_r) / tf
    by = (fy * w_f + ry * w_r) / tf
    bz = (fz * w_f + rz * w_r) / tf
    return bx, by, bz


def _blend_pass_sweep(fx, fy, fz, rev_anchor9, tor_stream, t_atoms):
    """Gather-free reverse reconstruction + blend (component form).

    Key identity: every segment's atom count t is a multiple of 3, so the
    reverse recurrence re-indexed by ABSOLUTE forward row r = t-4-i has a
    lane-independent structure: bond length blc[(2-r) % 3], torsion row r,
    bond-angle row r+1, and the carry is simply the three rows above r.
    The per-lane part reduces to masking: rows {t-3, t-2, t-1} hold the
    stored anchor (N, CA, C) and rows > t-1 are inactive. One descending
    `lax.scan` over rows then reconstructs every lane with NO
    take_along_axis — the per-lane gathers were the dominant TPU cost of
    the component form.

    fx/fy/fz:    [T, N] forward coords
    rev_anchor9: 9 arrays [N] — next anchor (N, CA, N... (ax..cz)) in
                 natural (N, CA, C) order
    tor_stream:  [T, N]; t_atoms: [N]
    Returns blended components [T, N].
    """
    t_max = fx.shape[0]

    ang = bond_angle_c(fx[:-2], fy[:-2], fz[:-2],
                       fx[1:-1], fy[1:-1], fz[1:-1],
                       fx[2:], fy[2:], fz[2:])          # [T-2, N]
    ang = jnp.pad(ang, ((1, 1), (0, 0)))                # center-aligned

    nx_, ny_, nz_ = rev_anchor9[0], rev_anchor9[1], rev_anchor9[2]
    cax_, cay_, caz_ = rev_anchor9[3], rev_anchor9[4], rev_anchor9[5]
    ccx_, ccy_, ccz_ = rev_anchor9[6], rev_anchor9[7], rev_anchor9[8]

    rows = jnp.arange(t_max - 1, -1, -1, dtype=I32)     # descending r
    bl_cycle = jnp.asarray([_C_TO_N, _CA_TO_C, _N_TO_CA], F32)
    # step index i = t-4-r and t % 3 == 0 -> i % 3 == (2 - r) % 3
    bls = bl_cycle[(2 - rows) % 3]
    # row r's inputs in descending order, via static flips (no gathers):
    # torsion row r; bond-angle row min(r+1, T-1)
    tor_rows = jnp.flip(tor_stream, axis=0)
    ang_rows = jnp.concatenate([ang[t_max - 1:],
                                jnp.flip(ang[1:], axis=0)], axis=0)

    def seed_row(r):
        """Anchor value for row r: t-1 -> C, t-2 -> CA, t-3 -> N, else 0."""
        is_c = (r == t_atoms - 1)
        is_ca = (r == t_atoms - 2)
        is_n = (r == t_atoms - 3)
        sx = jnp.where(is_c, ccx_, jnp.where(is_ca, cax_,
                                             jnp.where(is_n, nx_, 0.0)))
        sy = jnp.where(is_c, ccy_, jnp.where(is_ca, cay_,
                                             jnp.where(is_n, ny_, 0.0)))
        sz = jnp.where(is_c, ccz_, jnp.where(is_ca, caz_,
                                             jnp.where(is_n, nz_, 0.0)))
        return sx, sy, sz

    def step(carry, x):
        r, bl, a, tor = x
        # carry: rows r+1, r+2, r+3 (v1 closest)
        v1x, v1y, v1z, v2x, v2y, v2z, v3x, v3y, v3z = carry
        px, py, pz = place_atom_c(v3x, v3y, v3z, v2x, v2y, v2z,
                                  v1x, v1y, v1z, bl, a, tor)
        sx, sy, sz = seed_row(r)
        active = r <= t_atoms - 4
        ox = jnp.where(active, px, sx)
        oy = jnp.where(active, py, sy)
        oz = jnp.where(active, pz, sz)
        new = (ox, oy, oz, v1x, v1y, v1z, v2x, v2y, v2z)
        return new, (ox, oy, oz)

    zero = jnp.zeros_like(nx_)
    carry0 = (zero,) * 9
    _, ys = jax.lax.scan(step, carry0, (rows, bls, ang_rows, tor_rows))
    rx = jnp.flip(ys[0], axis=0)
    ry = jnp.flip(ys[1], axis=0)
    rz = jnp.flip(ys[2], axis=0)

    # weightedAverage blend (atom_coordinate.cpp:145-163)
    j = jnp.arange(t_max, dtype=I32)[:, None]
    tf = jnp.maximum(t_atoms[None, :].astype(F32), F32(1.0))
    w_r = j.astype(F32)
    w_f = t_atoms[None, :].astype(F32) - w_r
    bx = (fx * w_f + rx * w_r) / tf
    by = (fy * w_f + ry * w_r) / tf
    bz = (fz * w_f + rz * w_r) / tf
    return bx, by, bz


def _comp9(arr):
    """[B, S(+1 slice), 3, 3] anchor block -> tuple of 9 [N] arrays."""
    b, s = arr.shape[0], arr.shape[1]
    flat = arr.reshape(b * s, 9)
    return tuple(flat[:, k] for k in range(9))


def _seed_frame(seed9):
    """Orthonormal frame of a seed triple, as place_atom builds it:
    origin = c, axes (bc_hat, n_hat x bc_hat, n_hat) with
    n_hat = normalize(ab x bc_hat). Returns (cx, cy, cz, 9 axis comps)."""
    ax, ay, az, bx, by, bz, cx, cy, cz = seed9
    abx, aby, abz = bx - ax, by - ay, bz - az
    bcx, bcy, bcz = cx - bx, cy - by, cz - bz
    inv = jax.lax.rsqrt(jnp.maximum(bcx * bcx + bcy * bcy + bcz * bcz,
                                    F32(1e-30)))
    ux, uy, uz = bcx * inv, bcy * inv, bcz * inv
    nx = aby * uz - uy * abz
    ny = abz * ux - uz * abx
    nz = abx * uy - ux * aby
    invn = jax.lax.rsqrt(jnp.maximum(nx * nx + ny * ny + nz * nz,
                                     F32(1e-30)))
    nx, ny, nz = nx * invn, ny * invn, nz * invn
    vx = ny * uz - uy * nz
    vy = nz * ux - uz * nx
    vz = nx * uy - ux * ny
    return (cx, cy, cz, ux, uy, uz, vx, vy, vz, nx, ny, nz)


def _rigid_reseed(fx, fy, fz, old9, new9):
    """Map forward coords built from seed `old9` to the coords a re-run
    from seed `new9` would produce.

    The NeRF recurrence places every atom rigidly in the frame of its seed
    triple (place_atom uses only the (bc_hat, n x bc_hat, n) frame and c's
    position, nerf.cpp:39-104), so re-running the forward scan from a new
    seed is exactly a per-lane rigid transform of the old chain — one
    elementwise pass instead of a second 3(SEG-1)-step scan."""
    of = _seed_frame(old9)
    nf = _seed_frame(new9)
    ocx, ocy, ocz = of[0], of[1], of[2]
    ncx, ncy, ncz = nf[0], nf[1], nf[2]
    # local coords: l = U_old^T (p - c_old); out = U_new l + c_new
    dx = fx - ocx[None, :]
    dy = fy - ocy[None, :]
    dz = fz - ocz[None, :]
    lu = dx * of[3] + dy * of[4] + dz * of[5]
    lv = dx * of[6] + dy * of[7] + dz * of[8]
    ln = dx * of[9] + dy * of[10] + dz * of[11]
    gx = lu * nf[3] + lv * nf[6] + ln * nf[9] + ncx[None, :]
    gy = lu * nf[4] + lv * nf[7] + ln * nf[10] + ncy[None, :]
    gz = lu * nf[5] + lv * nf[8] + ln * nf[11] + ncz[None, :]
    return gx, gy, gz


def decode_backbone_segments_c(seg_angles, seg_is_pro, anchor_xyz, seg_m,
                               refine_iters: int = 2,
                               gather_free: bool = False):
    """Segment-parallel backbone decode, lanes-last component form.

    seg_angles: f32 [SEG, 6, N]
    seg_is_pro: bool [SEG, N]
    anchor_xyz: f32 [B, S+1, 3, 3] (lane n = b * S + s)
    seg_m:      i32 [N] record count per segment
    gather_free: reverse pass as the static descending-row sweep
                 (_blend_pass_sweep) instead of the take_along_axis form —
                 faster on TPU, slower on CPU (decode dispatches)
    Returns (bx, by, bz), each [T=3*SEG, N].
    """
    seg = seg_angles.shape[0]
    t_atoms = 3 * seg_m
    tor_stream = seg_angles[:, :3, :].reshape(3 * seg, -1)

    fwd_anchor9 = _comp9(anchor_xyz[:, :-1])
    # next-anchor (N, CA, C) components (natural order for the sweep,
    # atom-flipped for the gather form's reverse seed)
    rev_anchor9 = _comp9(anchor_xyz[:, 1:])
    rev_seed9 = _comp9(anchor_xyz[:, 1:][:, :, ::-1])

    b, s = anchor_xyz.shape[0], anchor_xyz.shape[1] - 1

    def reseed_from(blended_or_fwd_tails):
        """Blended-tail rows -> next iteration's seed triples
        (foldcomp.cpp:849-857: prevAtoms = last 3 blended atoms)."""
        new_seeds = []
        for comp in range(3):
            tails = blended_or_fwd_tails[comp].reshape(3, b, s)
            anchor_col = anchor_xyz[:, 0, :, comp].T         # [3, B]
            prev = jnp.concatenate(
                [anchor_col[:, :, None], tails[:, :, :-1]], axis=2)
            new_seeds.append(prev.reshape(3, b * s))
        return tuple(new_seeds[comp][atom]
                     for atom in range(3) for comp in range(3))

    def blend(fx, fy, fz):
        if gather_free:
            return _blend_pass_sweep(fx, fy, fz, rev_anchor9, tor_stream,
                                     t_atoms)
        return _blend_pass_c(fx, fy, fz, rev_seed9, tor_stream, t_atoms)

    fx, fy, fz = _forward_scan_c(fwd_anchor9, seg_angles, seg_is_pro)
    if refine_iters >= 2:
        # The forward chain is a rigid function of its seed frame, so the
        # second iteration's forward pass is a rigid transform of the
        # first — and its blended tail rows {t-3, t-2, t-1} blend the
        # forward tail against the stored anchor (N, CA, C) directly, so
        # no full first blend pass is needed either.
        k = jnp.arange(3, dtype=I32)[:, None]
        tail_idx = jnp.clip(t_atoms[None, :] - 3 + k, 0, 3 * seg - 1)
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
        seeds2 = reseed_from(tails)
        fx, fy, fz = _rigid_reseed(fx, fy, fz, fwd_anchor9, seeds2)
        # rows 0-2 are the literal seed atoms, not frame-determined —
        # the rigid map is only exact for placed atoms (rows >= 3)
        fx = fx.at[0].set(seeds2[0]).at[1].set(seeds2[3]).at[2].set(seeds2[6])
        fy = fy.at[0].set(seeds2[1]).at[1].set(seeds2[4]).at[2].set(seeds2[7])
        fz = fz.at[0].set(seeds2[2]).at[1].set(seeds2[5]).at[2].set(seeds2[8])
    return blend(fx, fy, fz)


@partial(jax.jit, static_argnames=("refine_iters",))
def decode_backbone_segments(seg_angles, seg_is_pro, anchor_xyz, seg_m,
                             refine_iters: int = 2):
    """Compatibility wrapper over the component-form kernel.

    seg_angles: f32 [B, S, SEG, 6]; seg_is_pro: bool [B, S, SEG];
    anchor_xyz: f32 [B, S+1, 3, 3]; seg_m: i32 [B, S].
    Returns blended segment coords f32 [B, S, 3*SEG, 3].
    """
    b, s, seg, _ = seg_angles.shape
    n = b * s
    ang = jnp.moveaxis(seg_angles.reshape(n, seg, 6), 0, -1)   # [SEG, 6, N]
    pro = jnp.moveaxis(seg_is_pro.reshape(n, seg), 0, -1)      # [SEG, N]
    bx, by, bz = decode_backbone_segments_c(
        ang, pro, anchor_xyz, seg_m.reshape(n), refine_iters=refine_iters)
    out = jnp.stack([bx, by, bz], axis=-1)                     # [T, N, 3]
    return jnp.moveaxis(out, 0, 1).reshape(b, s, 3 * seg, 3)


# ---------------------------------------------------------------------------
# vec3-layout variant ([..., 3] vectors, scan over stacked atom triples).
# XLA's TPU backend currently compiles and runs this form faster than the
# lanes-last component form (fewer axis-0 gathers); CPU strongly prefers the
# component form. kernels/decode.py dispatches on the backend.
# ---------------------------------------------------------------------------

from .geometry import bond_angle, place_atom  # noqa: E402

def _forward_scan(seed3, seg_angles, seg_is_pro):
    """Forward backbone reconstruction over all lanes.

    seed3:      [N, 3, 3] previous N/CA/C atoms
    seg_angles: [N, SEG, 6] continuized (psi, omega, phi, n_ca_c, ca_c_n,
                c_n_ca) per segment-local record
    seg_is_pro: [N, SEG] bool, residue at record j is proline
    Returns coords [N, 3*SEG, 3] (record 0's atoms are the seed).

    Parity: reconstructBackboneAtoms (foldcomp.cpp:167-246) — step i places
    residue i+1's N (psi_i, ca_c_n_i), CA (omega_i, c_n_ca_i; proline bond
    length from residue i), C (phi_i, n_ca_c_i).
    """
    n, seg = seg_angles.shape[0], seg_angles.shape[1]
    # step i consumes record i's angles AND record i's residue identity for
    # the proline N-CA bond length (foldcomp.cpp:204-212)
    xs = (jnp.moveaxis(seg_angles[:, :seg - 1], 0, 1),
          jnp.moveaxis(seg_is_pro[:, :seg - 1], 0, 1))

    def step(carry, x):
        ang, is_pro = x  # [N, 6], [N]
        a, b, c = carry[:, 0], carry[:, 1], carry[:, 2]
        n_xyz = place_atom(a, b, c, _C_TO_N, ang[:, 4], ang[:, 0])
        ca_len = jnp.where(is_pro, _PRO_N_TO_CA, _N_TO_CA)
        ca_xyz = place_atom(b, c, n_xyz, ca_len, ang[:, 5], ang[:, 1])
        c_xyz = place_atom(c, n_xyz, ca_xyz, _CA_TO_C, ang[:, 3], ang[:, 2])
        new = jnp.stack([n_xyz, ca_xyz, c_xyz], axis=1)
        return new, new

    _, ys = jax.lax.scan(step, seed3, xs, unroll=4)
    coords = jnp.concatenate([seed3[None], ys], axis=0)  # [SEG, N, 3, 3]
    return jnp.moveaxis(coords, 0, 1).reshape(n, 3 * seg, 3)


def _reverse_scan(rev_seed3, rev_tors, rev_angles, n_steps):
    """Reverse (C->N) reconstruction (nerf.cpp:342-400) over all lanes.

    rev_seed3:  [N, 3, 3] the next anchor's (C, CA, N)
    rev_tors:   [N, STEPS] reversed torsion stream (one per placed atom)
    rev_angles: [N, STEPS] reversed bond angles measured on the forward coords
    Returns reversed-orientation coords [N, 3 + STEPS, 3].

    Bond lengths cycle (C_TO_N, CA_TO_C, N_TO_CA) with step index — the
    (current, prev2) atom-name pairs of the reversed (N,CA,C)* pattern.
    """
    bl_cycle = jnp.asarray([_C_TO_N, _CA_TO_C, _N_TO_CA], F32)
    bls = bl_cycle[jnp.arange(n_steps, dtype=I32) % 3]
    xs = (jnp.moveaxis(rev_tors, 0, 1), jnp.moveaxis(rev_angles, 0, 1), bls)

    def step(carry, x):
        tor, ang, bl = x
        xyz = place_atom(carry[:, 0], carry[:, 1], carry[:, 2], bl, ang, tor)
        new = jnp.concatenate([carry[:, 1:], xyz[:, None]], axis=1)
        return new, xyz

    _, ys = jax.lax.scan(step, rev_seed3, xs, unroll=4)
    return jnp.concatenate([rev_seed3, jnp.moveaxis(ys, 0, 1)], axis=1)


def _blend_pass(fwd, rev_anchor, tor_stream, t_atoms):
    """Reverse reconstruction + positional blend for every lane.

    fwd:        [N, T, 3] forward coords (T = 3*SEG)
    rev_anchor: [N, 3, 3] stored next-anchor N/CA/C
    tor_stream: [N, T] interleaved (psi, omega, phi) stream
    t_atoms:    [N] valid atom count per lane (3 * m_records)
    Returns blended coords [N, T, 3].

    Parity: reconstructBackboneReverse (foldcomp.cpp:248-273) +
    weightedAverage (atom_coordinate.cpp:145-163): blended[j] =
    (fwd[j]*(t-j) + rev[j]*j) / t. Reverse bond angles are measured on the
    forward-reconstructed coords, exactly like the reference.
    """
    n, t_max = fwd.shape[0], fwd.shape[1]
    steps = t_max - 3

    # bond angle at every interior forward atom; index = center position j
    ang = bond_angle(fwd[:, :-2], fwd[:, 1:-1], fwd[:, 2:])  # [N, T-2]
    ang = jnp.pad(ang, ((0, 0), (1, 1)))                     # center-aligned

    i = jnp.arange(steps, dtype=I32)[None, :]                # [1, STEPS]
    src = t_atoms[:, None] - 4 - i                           # t-4-i
    src_c = jnp.clip(src, 0, t_max - 1)
    rev_tors = jnp.take_along_axis(tor_stream, src_c, axis=1)
    # rev angle for step i has center coord t-3-i = src+1
    rev_angles = jnp.take_along_axis(ang, jnp.clip(src + 1, 0, t_max - 1),
                                     axis=1)

    rev_seed = jnp.flip(rev_anchor, 1)  # (C, CA, N)
    out_rev = _reverse_scan(rev_seed, rev_tors, rev_angles, steps)  # [N, T, 3]

    # map reversed orientation back: out[j] = out_rev[t-1-j]
    j = jnp.arange(t_max, dtype=I32)[None, :]
    back = jnp.clip(t_atoms[:, None] - 1 - j, 0, t_max - 1)
    rev = jnp.take_along_axis(out_rev, back[..., None], axis=1)

    tf = t_atoms[:, None, None].astype(F32)
    w_r = j[..., None].astype(F32)
    w_f = tf - w_r
    return (fwd * w_f + rev * w_r) / jnp.maximum(tf, F32(1.0))


def decode_backbone_segments_vec3(seg_angles, seg_is_pro, anchor_xyz, seg_m,
                             refine_iters: int = 2):
    """Batched segment-parallel backbone decode.

    seg_angles: f32 [B, S, SEG, 6] continuized angles per segment record
    seg_is_pro: bool [B, S, SEG]
    anchor_xyz: f32 [B, S+1, 3, 3] stored anchor N/CA/C (segment s spans
                anchors s..s+1)
    seg_m:      i32 [B, S] record count per segment (valid atoms = 3*m)
    Returns blended segment coords f32 [B, S, 3*SEG, 3].
    """
    b, s, seg, _ = seg_angles.shape
    n = b * s
    t_max = 3 * seg
    angles = seg_angles.reshape(n, seg, 6)
    is_pro = seg_is_pro.reshape(n, seg)
    tor_stream = angles[:, :, :3].reshape(n, t_max)
    t_atoms = 3 * seg_m.reshape(n)
    fwd_anchor = anchor_xyz[:, :-1].reshape(n, 3, 3)
    rev_anchor = anchor_xyz[:, 1:].reshape(n, 3, 3)

    seeds = fwd_anchor
    blended = None
    for it in range(max(1, refine_iters)):
        fwd = _forward_scan(seeds, angles, is_pro)
        blended = _blend_pass(fwd, rev_anchor, tor_stream, t_atoms)
        if it + 1 < refine_iters:
            # re-seed segment s with segment s-1's blended tail
            # (foldcomp.cpp:849-857: prevAtoms = last 3 blended atoms)
            j = jnp.arange(3, dtype=I32)[None, :]
            tail_idx = jnp.clip(t_atoms[:, None] - 3 + j, 0, t_max - 1)
            tails = jnp.take_along_axis(blended, tail_idx[..., None], axis=1)
            tails = tails.reshape(b, s, 3, 3)
            prev_tails = jnp.concatenate(
                [anchor_xyz[:, :1], tails[:, :-1]], axis=1)
            seeds = prev_tails.reshape(n, 3, 3)

    return blended.reshape(b, s, t_max, 3)
