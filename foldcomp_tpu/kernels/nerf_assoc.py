"""Associative-scan NeRF decode: log-depth rigid-frame composition.

The reference reconstructs backbones with a strictly sequential recurrence
(Nerf::place_atom chains, nerf.cpp:39-104, foldcomp.cpp:185-243): each atom
is placed in the frame of the previous three. kernels/nerf.py batches that
recurrence over (protein x segment) lanes but keeps the 3*SEG-step
sequential `lax.scan` critical path.

This module removes the sequential chain entirely. Key identity: the local
frame built from a placed triple (place_atom's `[bc_hat, n x bc_hat, n]`
construction) always sees its own triple at *canonical* local coordinates
(c at the origin, b on the -x axis, a in the xy-plane), so the rigid map
from frame k to frame k+1 is a closed-form rotation+translation of the
step's placement parameters alone:

    A = bond angle (rad), T = torsion (rad), bl = bond length
    R = [ -cosA        -sinA         0    ]      t = bl * R[:, 0]
        [ cosT*sinA    -cosT*cosA   -sinT ]
        [ sinT*sinA    -sinT*cosA    cosT ]

and the placed atom is exactly the translation component of the running
frame product F_0 . M_0 . ... . M_k. Rigid composition is associative, so
`jax.lax.associative_scan` computes every prefix in O(log T) depth - ~10
combine levels instead of 72-144 dependent place_atom steps per segment.

The reverse (C->N) pass seeds each lane at a lane-dependent row (the stored
next anchor, foldcomp.cpp:248-273). That is expressed with a *reset monoid*:
each element is (R, t, reset); combining x.y yields y when y is a reset,
else the rigid composition. The reset element at row t-3 carries the
absolute anchor frame, so prefixes downstream of it are absolute frames and
the scan stays a single gather-free associative_scan over static rows.

Numerics: the analytic R is orthonormal to 1 ulp (the sequential path's
normalize() of nearly-unit vectors has the same error); composing ~72 f32
rotations drifts coordinates O(1e-4 A), far below the format's ~0.08 A
quantization floor (gates: build.sh:34-38).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .geometry import bond_angle_c
from .nerf import (_C_TO_N, _CA_TO_C, _N_TO_CA, _PRO_N_TO_CA, _comp9,
                   _rigid_reseed, _seed_frame)

F32 = jnp.float32
I32 = jnp.int32
_RAD = np.float32(jnp.pi / 180.0)


def _elem_from_params(bl, ang_deg, tor_deg):
    """Per-step rigid element (r00..r22, tx, ty, tz) from placement params.

    Parity: the frame place_atom (nerf.cpp:39-104) builds from the new
    triple, expressed in the previous triple's frame.
    """
    a = ang_deg * _RAD
    t = tor_deg * _RAD
    ca, sa = jnp.cos(a), jnp.sin(a)
    ct, st = jnp.cos(t), jnp.sin(t)
    zero = jnp.zeros_like(ca)
    r00, r01, r02 = -ca, -sa, zero
    r10, r11, r12 = ct * sa, -ct * ca, -st
    r20, r21, r22 = st * sa, -st * ca, ct
    return (r00, r01, r02, r10, r11, r12, r20, r21, r22,
            bl * r00, bl * r10, bl * r20)


def _compose(x, y):
    """Rigid composition (x then y): R = Rx Ry, t = tx + Rx ty."""
    (x00, x01, x02, x10, x11, x12, x20, x21, x22, xtx, xty, xtz) = x
    (y00, y01, y02, y10, y11, y12, y20, y21, y22, ytx, yty, ytz) = y
    r00 = x00 * y00 + x01 * y10 + x02 * y20
    r01 = x00 * y01 + x01 * y11 + x02 * y21
    r02 = x00 * y02 + x01 * y12 + x02 * y22
    r10 = x10 * y00 + x11 * y10 + x12 * y20
    r11 = x10 * y01 + x11 * y11 + x12 * y21
    r12 = x10 * y02 + x11 * y12 + x12 * y22
    r20 = x20 * y00 + x21 * y10 + x22 * y20
    r21 = x20 * y01 + x21 * y11 + x22 * y21
    r22 = x20 * y02 + x21 * y12 + x22 * y22
    tx = xtx + x00 * ytx + x01 * yty + x02 * ytz
    ty = xty + x10 * ytx + x11 * yty + x12 * ytz
    tz = xtz + x20 * ytx + x21 * yty + x22 * ytz
    return (r00, r01, r02, r10, r11, r12, r20, r21, r22, tx, ty, tz)


def _compose_reset(x, y):
    """Reset-monoid combine: y wins outright when y is a reset element.

    Element = 13 arrays (rigid 12 + reset flag). Associativity holds for
    every flag combination because a reset is a left zero: once the scan
    passes a reset, everything to its left is discarded.
    """
    comp = _compose(x[:12], y[:12])
    f = y[12]
    out = tuple(jnp.where(f > 0, y[i], comp[i]) for i in range(12))
    return out + (jnp.maximum(x[12], f),)


def _frame_elem(frame):
    """_seed_frame tuple -> rigid element (columns u, v, n; origin t)."""
    cx, cy, cz, ux, uy, uz, vx, vy, vz, nx, ny, nz = frame
    return (ux, vx, nx, uy, vy, ny, uz, vz, nz, cx, cy, cz)


# pad value per component for identity padding: R=I diagonal 1, else 0
# (t=0, reset flag=0). Scalar pad constants keep the padding inside the
# HLO `pad` op — materialized identity arrays became hoisted executable
# constants, which trips a jax-0.9 pjit fastpath cache bug ("supplied 6
# buffers but compiled program expected 17") on the second same-shape call.
_IDENT_PAD = (1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0,
              0.0, 0.0, 0.0, 0.0)


def _scan_chunked(compose, elems, chunk: int = 8):
    """Inclusive prefix scan via recursive chunking.

    `jax.lax.associative_scan` lowers to ~2*log2(T) separate slice+combine
    kernels whose launch latency dominates at these sizes (T~72, N~6k):
    TPU B=512 decode is 36 ms chunked vs 47 ms with the builtin scan, and
    compiles 19 s vs 177 s. Each level runs an UNROLLED within-chunk
    prefix pass (XLA fuses the chain into one kernel), recurses on the
    T/chunk chunk totals, and applies the carries in one broadcasted
    pass — ~3 fused kernels per level, depth log_chunk(T) (one level for
    the typical T<=200). Same combine monoid, same results up to the
    grouping of the identical compose ops (which the monoid makes free).

    elems: tuple of arrays [T, N]; returns tuple of arrays [T, N].
    """
    t = elems[0].shape[0]
    n_comp = len(elems)
    if t <= chunk:
        acc = tuple(x[0] for x in elems)
        prefixes = [acc]
        for j in range(1, t):
            acc = compose(acc, tuple(x[j] for x in elems))
            prefixes.append(acc)
        return tuple(jnp.stack([p[i] for p in prefixes], axis=0)
                     for i in range(n_comp))

    c = -(-t // chunk)
    pad = c * chunk - t
    if pad:
        widths = ((0, pad),) + ((0, 0),) * (elems[0].ndim - 1)
        elems = tuple(jnp.pad(e, widths, constant_values=v)
                      for e, v in zip(elems, _IDENT_PAD[:n_comp]))
    e = tuple(x.reshape((c, chunk) + x.shape[1:]) for x in elems)

    acc = tuple(x[:, 0] for x in e)
    prefixes = [acc]
    for j in range(1, chunk):
        acc = compose(acc, tuple(x[:, j] for x in e))
        prefixes.append(acc)
    # stack within-chunk prefixes back to [C, chunk, ...]
    pref = tuple(jnp.stack([p[i] for p in prefixes], axis=1)
                 for i in range(n_comp))

    tot = _scan_chunked(compose, acc, chunk)                 # [C, ...]
    carry = tuple(x[:-1] for x in tot)                       # [C-1, ...]
    head = tuple(x[:1] for x in pref)
    tail = compose(tuple(x[:, None] for x in carry),
                   tuple(x[1:] for x in pref))
    pref = tuple(jnp.concatenate([h, x], axis=0)
                 for h, x in zip(head, tail))
    out = tuple(x.reshape((c * chunk,) + x.shape[2:]) for x in pref)
    if pad:
        out = tuple(x[:t] for x in out)
    return out


def _forward_assoc_c(seed9, seg_angles, seg_is_pro):
    """Forward backbone reconstruction via associative frame composition.

    Drop-in for nerf._forward_scan_c (same contract): seed9 = 9 arrays [N]
    (prev N/CA/C components), seg_angles f32 [SEG, 6, N], seg_is_pro
    [SEG, N]. Returns (fx, fy, fz) each [T=3*SEG, N].

    Step k (0-based, placing atom row k+3) uses torsion stream row k
    (psi, omega, phi interleaved), placement-angle stream row k
    (ca_c_n, c_n_ca, n_ca_c interleaved) and the bond-length cycle
    (C_TO_N, N_TO_CA|PRO, CA_TO_C) - foldcomp.cpp:185-243.
    """
    seg = seg_angles.shape[0]
    n = seg_angles.shape[2]
    k = 3 * (seg - 1)

    rec = seg_angles[:seg - 1]                       # [SEG-1, 6, N]
    tor = rec[:, :3, :].reshape(k, n)                # psi, omega, phi
    ang = jnp.stack([rec[:, 4], rec[:, 5], rec[:, 3]],
                    axis=1).reshape(k, n)            # ca_c_n, c_n_ca, n_ca_c
    ca_len = jnp.where(seg_is_pro[:seg - 1], _PRO_N_TO_CA, _N_TO_CA)
    bl = jnp.stack([jnp.full((seg - 1, n), _C_TO_N, F32), ca_len,
                    jnp.full((seg - 1, n), _CA_TO_C, F32)],
                   axis=1).reshape(k, n)

    elems = _elem_from_params(bl, ang, tor)
    pref = _scan_chunked(_compose, elems)

    f0 = _seed_frame(seed9)
    cx, cy, cz = f0[0], f0[1], f0[2]
    ux, uy, uz = f0[3], f0[4], f0[5]
    vx, vy, vz = f0[6], f0[7], f0[8]
    nx, ny, nz = f0[9], f0[10], f0[11]
    tx, ty, tz = pref[9], pref[10], pref[11]
    px = ux * tx + vx * ty + nx * tz + cx
    py = uy * tx + vy * ty + ny * tz + cy
    pz = uz * tx + vz * ty + nz * tz + cz

    seed_rows = [jnp.stack([seed9[c], seed9[3 + c], seed9[6 + c]], axis=0)
                 for c in range(3)]
    fx = jnp.concatenate([seed_rows[0], px], axis=0)
    fy = jnp.concatenate([seed_rows[1], py], axis=0)
    fz = jnp.concatenate([seed_rows[2], pz], axis=0)
    return fx, fy, fz


def _blend_pass_assoc(fx, fy, fz, rev_anchor9, tor_stream, t_atoms):
    """Reverse reconstruction + blend via a reset-monoid associative scan.

    Same contract as nerf._blend_pass_sweep: fx/fy/fz [T, N] forward
    coords, rev_anchor9 = 9 arrays [N] (next anchor N/CA/C components,
    natural order), tor_stream [T, N], t_atoms [N]. Returns blended
    components [T, N].

    Descending row r is placed from rows r+1..r+3 with bond length
    bl[(2-r) % 3], torsion row r, bond angle row r+1 (angles measured on
    the forward coords, reconstructBackboneReverse foldcomp.cpp:248-273);
    row t-3 is a reset element carrying the anchor frame of the triple
    (C, CA, N).
    """
    t_max = fx.shape[0]
    n = fx.shape[1]

    ang = bond_angle_c(fx[:-2], fy[:-2], fz[:-2],
                       fx[1:-1], fy[1:-1], fz[1:-1],
                       fx[2:], fy[2:], fz[2:])       # [T-2, N]
    ang = jnp.pad(ang, ((1, 1), (0, 0)))             # center-aligned

    rows = jnp.arange(t_max - 1, -1, -1, dtype=I32)  # descending r
    bl_cycle = jnp.asarray([_C_TO_N, _CA_TO_C, _N_TO_CA], F32)
    bls = bl_cycle[(2 - rows) % 3][:, None]          # [T, 1]
    tor_rows = jnp.flip(tor_stream, axis=0)          # row r's torsion
    ang_rows = jnp.concatenate([ang[t_max - 1:],
                                jnp.flip(ang[1:], axis=0)], axis=0)

    elems = _elem_from_params(jnp.broadcast_to(bls, (t_max, n)),
                              ang_rows, tor_rows)

    # anchor frame of triple (a=C, b=CA, c=N): origin = N
    nx_, ny_, nz_ = rev_anchor9[0], rev_anchor9[1], rev_anchor9[2]
    cax, cay, caz = rev_anchor9[3], rev_anchor9[4], rev_anchor9[5]
    ccx, ccy, ccz = rev_anchor9[6], rev_anchor9[7], rev_anchor9[8]
    fa = _frame_elem(_seed_frame((ccx, ccy, ccz, cax, cay, caz,
                                  nx_, ny_, nz_)))

    is_reset = (rows[:, None] == (t_atoms - 3)[None, :])   # [T, N]
    resetf = is_reset.astype(F32)
    elems = tuple(jnp.where(is_reset, fa[i][None, :], elems[i])
                  for i in range(12)) + (resetf,)

    pref = _scan_chunked(_compose_reset, elems)
    rx_d, ry_d, rz_d = pref[9], pref[10], pref[11]

    # rows t-1 / t-2 hold the stored anchor C / CA verbatim
    is_c = rows[:, None] == (t_atoms - 1)[None, :]
    is_ca = rows[:, None] == (t_atoms - 2)[None, :]
    rx_d = jnp.where(is_c, ccx, jnp.where(is_ca, cax, rx_d))
    ry_d = jnp.where(is_c, ccy, jnp.where(is_ca, cay, ry_d))
    rz_d = jnp.where(is_c, ccz, jnp.where(is_ca, caz, rz_d))

    rx = jnp.flip(rx_d, axis=0)
    ry = jnp.flip(ry_d, axis=0)
    rz = jnp.flip(rz_d, axis=0)

    # weightedAverage blend (atom_coordinate.cpp:145-163)
    j = jnp.arange(t_max, dtype=I32)[:, None]
    tf = jnp.maximum(t_atoms[None, :].astype(F32), F32(1.0))
    w_r = j.astype(F32)
    w_f = t_atoms[None, :].astype(F32) - w_r
    bx = (fx * w_f + rx * w_r) / tf
    by = (fy * w_f + ry * w_r) / tf
    bz = (fz * w_f + rz * w_r) / tf
    return bx, by, bz


def decode_backbone_segments_assoc(seg_angles, seg_is_pro, anchor_xyz,
                                   seg_m, refine_iters: int = 2):
    """Segment-parallel backbone decode, associative-scan core.

    Same contract as nerf.decode_backbone_segments_c: seg_angles
    [SEG, 6, N], seg_is_pro [SEG, N], anchor_xyz [B, S+1, 3, 3], seg_m [N].
    Returns (bx, by, bz) each [T=3*SEG, N]. The refine/reseed logic is the
    rigid-transform shortcut of nerf.decode_backbone_segments_c (the
    forward chain is a rigid function of its seed frame).
    """
    seg = seg_angles.shape[0]
    t_atoms = 3 * seg_m
    tor_stream = seg_angles[:, :3, :].reshape(3 * seg, -1)

    fwd_anchor9 = _comp9(anchor_xyz[:, :-1])
    rev_anchor9 = _comp9(anchor_xyz[:, 1:])
    b, s = anchor_xyz.shape[0], anchor_xyz.shape[1] - 1

    fx, fy, fz = _forward_assoc_c(fwd_anchor9, seg_angles, seg_is_pro)
    if refine_iters >= 2:
        # identical reseed shortcut to nerf.decode_backbone_segments_c
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
        new_seeds = []
        for comp in range(3):
            tails_c = tails[comp].reshape(3, b, s)
            anchor_col = anchor_xyz[:, 0, :, comp].T             # [3, B]
            prev = jnp.concatenate(
                [anchor_col[:, :, None], tails_c[:, :, :-1]], axis=2)
            new_seeds.append(prev.reshape(3, b * s))
        seeds2 = tuple(new_seeds[comp][atom]
                       for atom in range(3) for comp in range(3))
        fx, fy, fz = _rigid_reseed(fx, fy, fz, fwd_anchor9, seeds2)
        fx = fx.at[0].set(seeds2[0]).at[1].set(seeds2[3]).at[2].set(seeds2[6])
        fy = fy.at[0].set(seeds2[1]).at[1].set(seeds2[4]).at[2].set(seeds2[7])
        fz = fz.at[0].set(seeds2[2]).at[1].set(seeds2[5]).at[2].set(seeds2[8])
    return _blend_pass_assoc(fx, fy, fz, rev_anchor9, tor_stream, t_atoms)
