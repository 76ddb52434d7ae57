"""Fused Pallas decode: the whole per-lane pipeline in VMEM.

Round-3 profiling concluded the B=512 decode was "kernel-efficiency
bound"; round-4 cost analysis (tools/exp_cost.py) showed it is actually
BANDWIDTH-bound on its own intermediates: XLA's compiled executable
models 4.4-49 GB of HBM "bytes accessed" per dispatch (30-43 KB per
residue vs the ~125 B minimal I/O), and the modeled traffic time matches
the observed walls almost exactly. The ~286 fusions of the XLA pipeline
each round-trip [T, N] arrays through HBM.

This module keeps everything between the dequantized angle streams and
the compact int16 output in VMEM, so the only HBM traffic is the true
input/output of the decode (~0.7 KB/residue):

- kernel 1 `tails`  — forward NeRF scan from the anchor seeds, emitting
  only the blended 3-atom tail per lane ([9, N]); the refine reseed
  (foldcomp.cpp:849-857: segment s is re-seeded by segment s-1's blended
  tail) needs a cross-lane shift, done in XLA between the kernels.
- kernel 2 `backbone` — forward scan from the refined seeds + the
  reverse (C->N) sweep + positional blend (reconstructBackboneReverse,
  foldcomp.cpp:248-273 / weightedAverage, atom_coordinate.cpp:145-163),
  emitting blended backbone rows [T, N].
- kernel 3 `sidechain` — per-residue side-chain placement over the AA
  dependency graph (reconstructAminoAcid, nerf.cpp:106-160) with the
  chemistry tables baked in as static where-chains, plus the compact
  int16 milli-angstrom conversion.

All three run inside ONE jit (one dispatch); XLA keeps only the record
unpack/dequant prologue, the tiny seeds2 middle, and a free transpose
epilogue to per-lane output rows (a per-residue gather is index-rate
bound at ~17 ns/index on this chip — ~10 ms at B=2048 — so the residue
stitch moved to a host row-gather over the ragged-lane wire;
codec/batch.py pack_decode_batch_lanes). Lanes are blocked
[rows, G, 128] so each sequential step operates on full (G, 128) tiles.

The math is operation-for-operation the gather-free XLA core
(kernels/nerf.py `_forward_scan_c` / `_blend_pass_sweep`,
kernels/sidechain.py `place_sidechains_c`), so the result stays inside
the reference RMSD gates (build.sh:34-38).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.aatable import BOND_ANG, BOND_LEN, MAX_ATOM, PRED_IDX
from .bitpack import unpack_records
from .geometry import place_atom_c
from .nerf import _C_TO_N, _CA_TO_C, _N_TO_CA, _PRO_N_TO_CA

F32 = jnp.float32
I32 = jnp.int32

_PRED = np.asarray(PRED_IDX, np.int32)    # [24, 14, 3]
_BLEN = np.asarray(BOND_LEN, np.float32)  # [24, 14]
_BANG = np.asarray(BOND_ANG, np.float32)  # [24, 14]

_SC_CONT_F = np.float32(360.0 / 255.0)
_SC_MIN = np.float32(-180.0)
PRO_CODE = 14

# lane-group sizes: G sublane-groups x 128 lanes per grid step (the
# Mosaic block constraint requires sublane dims divisible by 8)
_G_BB = 8
_G_SC = 8
_LANE_PAD = 128 * max(_G_BB, _G_SC)


def _bond_angle_cs(ax, ay, az, bx, by, bz, cx, cy, cz):
    """(cos, sin) of the 3-point angle at b.

    Mosaic has no acos lowering; the only consumer of the reverse pass's
    bond angle is place_atom's cos/sin of it, so the acos -> cos round
    trip (a ~1 ulp identity) is skipped entirely. The angle is in
    [0, 180] so sin >= 0."""
    d1x, d1y, d1z = ax - bx, ay - by, az - bz
    d2x, d2y, d2z = cx - bx, cy - by, cz - bz
    inner = d1x * d2x + d1y * d2y + d1z * d2z
    s1 = d1x * d1x + d1y * d1y + d1z * d1z
    s2 = d2x * d2x + d2y * d2y + d2z * d2z
    cos_t = inner / jnp.sqrt(jnp.maximum(s1 * s2, F32(1e-30)))
    cos_t = jnp.clip(cos_t, -1.0, 1.0)
    sin_t = jnp.sqrt(jnp.maximum(F32(1.0) - cos_t * cos_t, F32(0.0)))
    return cos_t, sin_t


_RADK = np.float32(np.pi / 180.0)


def _place_atom_cs(ax, ay, az, bx, by, bz, cx, cy, cz,
                   bond_length, cos_ba, sin_ba, torsion_deg):
    """place_atom_c with the bond angle given as (cos, sin)."""
    abx, aby, abz = bx - ax, by - ay, bz - az
    bcx, bcy, bcz = cx - bx, cy - by, cz - bz
    inv_bc = jax.lax.rsqrt(jnp.maximum(bcx * bcx + bcy * bcy + bcz * bcz,
                                       F32(1e-30)))
    bcnx, bcny, bcnz = bcx * inv_bc, bcy * inv_bc, bcz * inv_bc
    ta = torsion_deg * _RADK
    dx = -bond_length * cos_ba
    dy = bond_length * jnp.cos(ta) * sin_ba
    dz = bond_length * jnp.sin(ta) * sin_ba
    nx = aby * bcnz - bcny * abz
    ny = abz * bcnx - bcnz * abx
    nz = abx * bcny - bcnx * aby
    inv_n = jax.lax.rsqrt(jnp.maximum(nx * nx + ny * ny + nz * nz,
                                      F32(1e-30)))
    nx, ny, nz = nx * inv_n, ny * inv_n, nz * inv_n
    mx = ny * bcnz - bcny * nz
    my = nz * bcnx - bcnz * nx
    mz = nx * bcny - bcnx * ny
    ox = bcnx * dx + mx * dy + nx * dz + cx
    oy = bcny * dx + my * dy + ny * dz + cy
    oz = bcnz * dx + mz * dy + nz * dz + cz
    return ox, oy, oz


def _spec(rows, g):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    return pl.BlockSpec((rows, g, 128), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)


def _unpack_ang6_into(recs_ref, mins6_ref, cont6_ref, ang_ref, seg):
    """Vectorized in-VMEM record unpack + per-lane dequant into the
    FIELD-major angle scratch (row f*seg + k = stream f of residue k;
    field order psi, omega, phi, n_ca_c, ca_c_n, c_n_ca).

    recs_ref: [8*seg, G, 128] u8 byte planes (row b*seg + k = byte b of
    residue k's record, convertBytesToBackboneChain bit layout,
    foldcomp.cpp:60-77); mins6/cont6: [6, G, 128] per-lane quantizer
    rows in the SAME field order. Runs once per grid step as whole-slab
    vector ops — the angles never round-trip through HBM (round 5: the
    XLA-prologue ang6 cost 24 B/res to write and 24 B/res to read in
    EACH of the two backbone kernels)."""
    recs = recs_ref[...].astype(I32)          # (8*seg, G, 128)
    b = [recs[i * seg:(i + 1) * seg] for i in range(8)]
    qs = (
        (b[2] << 4) | (b[3] >> 4),            # psi (12 bit)
        ((b[0] & 0x7) << 8) | b[1],           # omega (11 bit)
        ((b[3] & 0xF) << 8) | b[4],           # phi (12 bit)
        b[7],                                  # n_ca_c
        b[5],                                  # ca_c_n
        b[6],                                  # c_n_ca
    )
    for f, q in enumerate(qs):
        ang_ref[f * seg:(f + 1) * seg] = \
            q.astype(F32) * cont6_ref[f][None] + mins6_ref[f][None]


def _fwd_scan_into(ang6_ref, blca_ref, seed, fx_ref, fy_ref, fz_ref, seg):
    """Forward NeRF recurrence (nerf.py _forward_scan_c parity) writing
    atom rows into the [T, G, 128] scratch refs. seed = 9 (G, 128) tiles
    in (ax..az, bx..bz, cx..cz) order. ang6_ref is the FIELD-major
    angle scratch filled by _unpack_ang6_into."""
    fx_ref[0], fx_ref[1], fx_ref[2] = seed[0], seed[3], seed[6]
    fy_ref[0], fy_ref[1], fy_ref[2] = seed[1], seed[4], seed[7]
    fz_ref[0], fz_ref[1], fz_ref[2] = seed[2], seed[5], seed[8]

    def body(k, carry):
        ax, ay, az, bx, by, bz, cx, cy, cz = carry
        psi = ang6_ref[k]
        omega = ang6_ref[seg + k]
        phi = ang6_ref[2 * seg + k]
        ncac = ang6_ref[3 * seg + k]
        cacn = ang6_ref[4 * seg + k]
        cnca = ang6_ref[5 * seg + k]
        nx, ny, nz = place_atom_c(ax, ay, az, bx, by, bz, cx, cy, cz,
                                  _C_TO_N, cacn, psi)
        cax, cay, caz = place_atom_c(bx, by, bz, cx, cy, cz, nx, ny, nz,
                                     blca_ref[k], cnca, omega)
        ccx, ccy, ccz = place_atom_c(cx, cy, cz, nx, ny, nz, cax, cay, caz,
                                     _CA_TO_C, ncac, phi)
        row = 3 * k + 3
        fx_ref[row], fx_ref[row + 1], fx_ref[row + 2] = nx, cax, ccx
        fy_ref[row], fy_ref[row + 1], fy_ref[row + 2] = ny, cay, ccy
        fz_ref[row], fz_ref[row + 1], fz_ref[row + 2] = nz, caz, ccz
        return (nx, ny, nz, cax, cay, caz, ccx, ccy, ccz)

    jax.lax.fori_loop(0, seg - 1, body, seed)


def _make_tails_kernel(seg):
    """Forward scan + blended-tail extraction: out [9, G, 128] rows
    comp*3 + kk = blended row (t-3+kk) component comp."""
    t = 3 * seg

    def kernel(recs_ref, blca_ref, seed_ref, ranc_ref, tat_ref,
               mins6_ref, cont6_ref, out_ref,
               fx_ref, fy_ref, fz_ref, ang_ref):
        _unpack_ang6_into(recs_ref, mins6_ref, cont6_ref, ang_ref, seg)
        seed = tuple(seed_ref[i] for i in range(9))
        _fwd_scan_into(ang_ref, blca_ref, seed, fx_ref, fy_ref, fz_ref, seg)

        tat = tat_ref[0]
        tf = jnp.maximum(tat.astype(F32), F32(1.0))
        zero = jnp.minimum(tf, F32(0.0)) * F32(0.0)

        def acc_body(r, acc):
            fxr, fyr, fzr = fx_ref[r], fy_ref[r], fz_ref[r]
            out = list(acc)
            for kk in range(3):
                m = r == (tat - 3 + kk)
                out[0 * 3 + kk] = jnp.where(m, fxr, acc[0 * 3 + kk])
                out[1 * 3 + kk] = jnp.where(m, fyr, acc[1 * 3 + kk])
                out[2 * 3 + kk] = jnp.where(m, fzr, acc[2 * 3 + kk])
            return tuple(out)

        acc = jax.lax.fori_loop(0, t, acc_body, (zero,) * 9)
        # blend tail rows against the stored next-anchor (N, CA, C):
        # row t-3+kk has reverse weight w_r = t-3+kk (the reverse pass
        # holds the anchor verbatim there)
        for kk in range(3):
            w_r = (tat - 3 + kk).astype(F32)
            w_f = tf - w_r
            for comp in range(3):
                anc = ranc_ref[kk * 3 + comp]
                out_ref[comp * 3 + kk] = \
                    (acc[comp * 3 + kk] * w_f + anc * w_r) / tf

    return kernel


def _make_backbone_kernel(seg):
    """Forward scan from refined seeds + reverse sweep + blend
    (_blend_pass_sweep parity). Outputs blended rows [T, G, 128] x3."""
    t = 3 * seg

    def kernel(recs_ref, blca_ref, seed_ref, ranc_ref, tat_ref,
               mins6_ref, cont6_ref,
               ox_ref, oy_ref, oz_ref, fx_ref, fy_ref, fz_ref,
               rx_ref, ry_ref, rz_ref, ang6_ref):
        _unpack_ang6_into(recs_ref, mins6_ref, cont6_ref, ang6_ref, seg)
        seed = tuple(seed_ref[i] for i in range(9))
        _fwd_scan_into(ang6_ref, blca_ref, seed, fx_ref, fy_ref, fz_ref, seg)

        tat = tat_ref[0]
        nxa, nya, nza = ranc_ref[0], ranc_ref[1], ranc_ref[2]
        cxa, cya, cza = ranc_ref[3], ranc_ref[4], ranc_ref[5]
        ccx, ccy, ccz = ranc_ref[6], ranc_ref[7], ranc_ref[8]
        # derive the zero from loaded data: a splat-constant init gives the
        # fori_loop carry a replicated Mosaic layout that conflicts with
        # the body's computed (non-replicated) vectors
        zero = jnp.minimum(nxa, F32(0.0)) * F32(0.0)

        def rev_body(i, carry):
            r = t - 1 - i
            v1x, v1y, v1z, v2x, v2y, v2z, v3x, v3y, v3z = carry
            # bond length cycle: descending step i -> (C_TO_N, CA_TO_C,
            # N_TO_CA)[i % 3] (t % 3 == 0, see nerf._blend_pass_sweep)
            im3 = i % 3
            bl = jnp.where(im3 == 0, _C_TO_N,
                           jnp.where(im3 == 1, _CA_TO_C, _N_TO_CA))
            tor = ang6_ref[(r % 3) * seg + r // 3]
            rc = jnp.minimum(r, t - 3)
            cos_a, sin_a = _bond_angle_cs(
                fx_ref[rc], fy_ref[rc], fz_ref[rc],
                fx_ref[rc + 1], fy_ref[rc + 1], fz_ref[rc + 1],
                fx_ref[rc + 2], fy_ref[rc + 2], fz_ref[rc + 2])
            px, py, pz = _place_atom_cs(v3x, v3y, v3z, v2x, v2y, v2z,
                                        v1x, v1y, v1z, bl, cos_a, sin_a,
                                        tor)
            is_c = r == tat - 1
            is_ca = r == tat - 2
            is_n = r == tat - 3
            sx = jnp.where(is_c, ccx, jnp.where(is_ca, cxa,
                                                jnp.where(is_n, nxa, zero)))
            sy = jnp.where(is_c, ccy, jnp.where(is_ca, cya,
                                                jnp.where(is_n, nya, zero)))
            sz = jnp.where(is_c, ccz, jnp.where(is_ca, cza,
                                                jnp.where(is_n, nza, zero)))
            active = r <= tat - 4
            wx = jnp.where(active, px, sx)
            wy = jnp.where(active, py, sy)
            wz = jnp.where(active, pz, sz)
            rx_ref[r], ry_ref[r], rz_ref[r] = wx, wy, wz
            return (wx, wy, wz, v1x, v1y, v1z, v2x, v2y, v2z)

        jax.lax.fori_loop(0, t, rev_body, (zero,) * 9)

        tf = jnp.maximum(tat.astype(F32), F32(1.0))

        def blend_body(j, _):
            w_r = j.astype(F32)
            w_f = tat.astype(F32) - w_r
            ox_ref[j] = (fx_ref[j] * w_f + rx_ref[j] * w_r) / tf
            oy_ref[j] = (fy_ref[j] * w_f + ry_ref[j] * w_r) / tf
            oz_ref[j] = (fz_ref[j] * w_f + rz_ref[j] * w_r) / tf
            return 0

        jax.lax.fori_loop(0, t, blend_body, 0)

    return kernel


def _chain_const(code, col):
    """Per-lane table value via a static where-chain grouped by value.

    code: i32 (G, 128) residue codes; col: np [24] table column.
    Replicates table[code] without a per-lane gather."""
    groups: dict[float, list[int]] = {}
    for c in range(col.shape[0]):
        groups.setdefault(float(col[c]), []).append(c)
    items = sorted(groups.items(), key=lambda kv: -len(kv[1]))
    acc = jnp.full(code.shape, F32(items[0][0]))
    for v, cs in items[1:]:
        m = code == cs[0]
        for c in cs[1:]:
            m = m | (code == c)
        acc = jnp.where(m, F32(v), acc)
    return acc


def _sel_pred(code, rows_x, rows_y, rows_z, col):
    """Predecessor-atom lookup: rows[col[code]] per lane, as static
    where-chains grouped by predecessor slot (gather-free)."""
    groups: dict[int, list[int]] = {}
    for c in range(col.shape[0]):
        groups.setdefault(int(col[c]), []).append(c)
    items = sorted(groups.items(), key=lambda kv: -len(kv[1]))
    ax, ay, az = rows_x[items[0][0]], rows_y[items[0][0]], rows_z[items[0][0]]
    for slot, cs in items[1:]:
        m = code == cs[0]
        for c in cs[1:]:
            m = m | (code == c)
        ax = jnp.where(m, rows_x[slot], ax)
        ay = jnp.where(m, rows_y[slot], ay)
        az = jnp.where(m, rows_z[slot], az)
    return ax, ay, az


_SB_SC = 8   # residues per sidechain grid step (seg_pad is 8-bucketed)


def _make_sidechain_kernel():
    """Per-residue side-chain placement + compact int16 conversion.

    Blocked over BOTH lanes and residues (2D grid) so VMEM use is
    independent of the segment width — at SEG=48 (long-segment corpora)
    a whole-SEG block OOM'd the 16 MB scoped vmem. Row layouts are
    s-major so each s-block's rows are contiguous:

    inputs:  backbone rows [3*SB, G, 128] x3 (rows 3*s+atom),
             residue codes [SB, G, 128] i32,
             side-chain torsion CODES u8 [11*SB, G, 128] (rows s*11+j;
             dequantized here — FixedAngleDiscretizer continuize,
             foldcomp.cpp:350,361 — in the same cast*cont+min op order
             as the XLA core, so torsions are bit-identical)
    outputs: off i16 [42*SB, G, 128] (rows s*42 + k*3 + c),
             ca f32 [3*SB, G, 128] (rows s*3 + c)."""

    def kernel(bx_ref, by_ref, bz_ref, code_ref, sct_ref, off_ref, ca_ref):
        def body(s, _):
            rows_x = [bx_ref[3 * s], bx_ref[3 * s + 1], bx_ref[3 * s + 2]]
            rows_y = [by_ref[3 * s], by_ref[3 * s + 1], by_ref[3 * s + 2]]
            rows_z = [bz_ref[3 * s], bz_ref[3 * s + 1], bz_ref[3 * s + 2]]
            code = code_ref[s]
            for k in range(3, MAX_ATOM):
                a = _sel_pred(code, rows_x, rows_y, rows_z, _PRED[:, k, 0])
                b = _sel_pred(code, rows_x, rows_y, rows_z, _PRED[:, k, 1])
                c = _sel_pred(code, rows_x, rows_y, rows_z, _PRED[:, k, 2])
                bl = _chain_const(code, _BLEN[:, k])
                ba = _chain_const(code, _BANG[:, k])
                # u8 -> i32 -> f32 (Mosaic has no u8->f32 cast; exact
                # for 0..255, same value chain as the XLA core's cast)
                tor = sct_ref[s * 11 + (k - 3)].astype(I32).astype(F32) \
                    * _SC_CONT_F + _SC_MIN
                ox, oy, oz = place_atom_c(a[0], a[1], a[2], b[0], b[1], b[2],
                                          c[0], c[1], c[2], bl, ba, tor)
                rows_x.append(ox)
                rows_y.append(oy)
                rows_z.append(oz)
            cax, cay, caz = rows_x[1], rows_y[1], rows_z[1]
            ca_ref[s * 3] = cax
            ca_ref[s * 3 + 1] = cay
            ca_ref[s * 3 + 2] = caz
            # off rows in (k, c)-major order so the epilogue transpose
            # yields per-lane [SEG, 42] rows whose [42] reshape directly
            # to the host's [14, 3] atom block (no host transpose)
            for ci, (rows, cav) in enumerate(((rows_x, cax), (rows_y, cay),
                                              (rows_z, caz))):
                for k in range(MAX_ATOM):
                    off = jnp.clip(jnp.round((rows[k] - cav) * F32(1000.0)),
                                   -32767.0, 32767.0).astype(jnp.int16)
                    off_ref[s * 42 + k * 3 + ci] = off
            return 0

        jax.lax.fori_loop(0, _SB_SC, body, 0)

    return kernel


def _blocked(x, rows, np_):
    return x.reshape(rows, np_ // 128, 128)


# field order (psi, omega, phi, n_ca_c, ca_c_n, c_n_ca) — header
# column order is (phi, psi, omega, ...) (foldcomp.h:131)
_FIELD_COLS = np.asarray([1, 2, 0, 3, 4, 5])


def _class_prep(seg_records, mins_lane, cont_lane, sc_codes_seg,
                fwd9, rev9, seg_m, g: int = _G_BB):
    """XLA prologue for one lane class -> blocked kernel inputs.

    The records stay PACKED (byte-plane-major [8, SEG, N] u8 from the
    pack); the backbone kernels unpack + dequant in VMEM
    (_unpack_ang6_into). Here: just the residue-code plane (k3's
    chemistry selects + proline bond length) and the per-lane quantizer
    rows reordered to the kernel field order. Side-chain torsions ride
    as s-major u8 rows (s*11 + j) straight from the pack's [SEG, 11, NL]
    layout; the sidechain kernel dequantizes in VMEM (round 5: the f32
    dequant+transpose here cost 44 B/res of HBM round-trip — 4x the u8
    codes — in a kernel set that is not bandwidth-bound but pays every
    avoidable pass)."""
    _, seg, np_ = seg_records.shape
    assert np_ % (128 * g) == 0, "pack_decode_batch_lanes pads lanes"
    res_code = (seg_records[0].astype(I32) >> 3)           # [SEG, N]
    bl_ca = jnp.where(res_code == PRO_CODE, _PRO_N_TO_CA, _N_TO_CA)
    mins6 = mins_lane.T[_FIELD_COLS]                       # [6, N]
    cont6 = cont_lane.T[_FIELD_COLS]
    sct = sc_codes_seg.reshape(11 * seg, np_)
    tat = (3 * seg_m).astype(I32)[None, :]                 # [1, N]
    return dict(
        seg=seg, np=np_, g=g,
        recs_p=_blocked(seg_records.reshape(8 * seg, np_), 8 * seg, np_),
        blca_p=_blocked(bl_ca, seg, np_),
        sct_p=_blocked(sct, 11 * seg, np_),
        code_p=_blocked(res_code, seg, np_),
        fwd9_p=_blocked(fwd9, 9, np_),
        rev9_p=_blocked(rev9, 9, np_),
        tat_p=_blocked(tat, 1, np_),
        mins6_p=_blocked(mins6, 6, np_),
        cont6_p=_blocked(cont6, 6, np_))


def _bb_in_specs(seg, g):
    return [_spec(8 * seg, g), _spec(seg, g),
            _spec(9, g), _spec(9, g), _spec(1, g),
            _spec(6, g), _spec(6, g)]


def _run_tails(pr, interpret):
    """kernel 1: forward tails from anchor seeds -> [9, NP]."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    seg, np_, g = pr["seg"], pr["np"], pr["g"]
    t = 3 * seg
    vmem = pltpu.VMEM
    tails = pl.pallas_call(
        _make_tails_kernel(seg),
        grid=(np_ // (128 * g),),
        in_specs=_bb_in_specs(seg, g),
        out_specs=_spec(9, g),
        out_shape=jax.ShapeDtypeStruct((9, np_ // 128, 128), F32),
        scratch_shapes=[vmem((t, g, 128), F32) for _ in range(3)]
        + [vmem((6 * seg, g, 128), F32)],
        interpret=interpret,
    )(pr["recs_p"], pr["blca_p"], pr["fwd9_p"], pr["rev9_p"],
      pr["tat_p"], pr["mins6_p"], pr["cont6_p"])
    return tails.reshape(9, np_)


def _run_backbone_sc(pr, seeds_p, interpret, nl_out):
    """kernels 2+3 + epilogue for one class -> (off_t, ca_t) rows."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    seg, np_, g = pr["seg"], pr["np"], pr["g"]
    t = 3 * seg
    vmem = pltpu.VMEM
    # ---- kernel 2: backbone (forward + reverse sweep + blend) ----
    bb_shape = jax.ShapeDtypeStruct((t, np_ // 128, 128), F32)
    bbx, bby, bbz = pl.pallas_call(
        _make_backbone_kernel(seg),
        grid=(np_ // (128 * g),),
        in_specs=_bb_in_specs(seg, g),
        out_specs=(_spec(t, g),) * 3,
        out_shape=(bb_shape,) * 3,
        scratch_shapes=[vmem((t, g, 128), F32) for _ in range(6)]
        + [vmem((6 * seg, g, 128), F32)],
        interpret=interpret,
    )(pr["recs_p"], pr["blca_p"], seeds_p, pr["rev9_p"], pr["tat_p"],
      pr["mins6_p"], pr["cont6_p"])

    # ---- kernel 3: side chains + compact int16 (2D grid: lanes x
    # residue blocks, so VMEM is independent of the segment width) ----
    sb = _SB_SC

    def _spec2(rows_per_s, g):
        return pl.BlockSpec((rows_per_s * sb, g, 128),
                            lambda i, j: (j, i, 0),
                            memory_space=pltpu.VMEM)

    gsc = min(g, _G_SC)
    grid_sc = (np_ // (128 * gsc), seg // sb)
    off, ca = pl.pallas_call(
        _make_sidechain_kernel(),
        grid=grid_sc,
        in_specs=[_spec2(3, gsc), _spec2(3, gsc), _spec2(3, gsc),
                  _spec2(1, gsc), _spec2(11, gsc)],
        out_specs=(_spec2(42, gsc), _spec2(3, gsc)),
        out_shape=(
            jax.ShapeDtypeStruct((42 * seg, np_ // 128, 128), jnp.int16),
            jax.ShapeDtypeStruct((3 * seg, np_ // 128, 128), F32),
        ),
        interpret=interpret,
    )(bbx, bby, bbz, pr["code_p"], pr["sct_p"])

    # ---- XLA epilogue: transpose to per-lane rows (measured free — the
    # relayout hides in the fusion; a per-residue gather here would cost
    # ~10 ms at B=2048 regardless of formulation) ----
    off_t = jnp.transpose(off.reshape(seg, 3 * MAX_ATOM, np_),
                          (2, 0, 1))                       # [NL, SEG, 42]
    ca_t = jnp.transpose(ca.reshape(seg, 3, np_), (2, 0, 1))
    if nl_out is not None and nl_out < np_:
        # D2H slice to a finer lane quantum than the kernel's 1024-lane
        # block (the wire pads 33% on 128-entry uniform batches
        # otherwise; the host<->device link is the e2e bound)
        off_t = off_t[:nl_out]
        ca_t = ca_t[:nl_out]
    return off_t, ca_t


def _run_backbone_only(pr, seeds_p, interpret, nl_out):
    """kernel 2 only + compact bb epilogue — the bb-only D2H wire.

    Returns (off i16 [NL, SEG, 6], ca f32 [NL, SEG, 3]): N and C as
    0.1 milli-angstrom offsets from CA — 24 B/residue vs 96 for
    full-atom rows. The finer-than-full-wire quantum matters: side
    chains are placed FROM this backbone on the host, and a 1 mA frame
    perturbation amplifies ~5x through the NeRF chain to distal atoms
    (measured 5.1 mA vs exact at 1 mA; ~0.5 mA at 0.1 mA — below the
    full wire's own output quantum). N/C sit within 1.6 A of CA, so
    the i16 range (+-3.2767 A at this quantum) has 2x margin. The host
    dequantizes and places O + side chains with the native C codec
    (fcz_place_sc_from_bb)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    seg, np_, g = pr["seg"], pr["np"], pr["g"]
    t = 3 * seg
    vmem = pltpu.VMEM
    bb_shape = jax.ShapeDtypeStruct((t, np_ // 128, 128), F32)
    bbx, bby, bbz = pl.pallas_call(
        _make_backbone_kernel(seg),
        grid=(np_ // (128 * g),),
        in_specs=_bb_in_specs(seg, g),
        out_specs=(_spec(t, g),) * 3,
        out_shape=(bb_shape,) * 3,
        scratch_shapes=[vmem((t, g, 128), F32) for _ in range(6)]
        + [vmem((6 * seg, g, 128), F32)],
        interpret=interpret,
    )(pr["recs_p"], pr["blca_p"], seeds_p, pr["rev9_p"], pr["tat_p"],
      pr["mins6_p"], pr["cont6_p"])
    bb = jnp.stack([bbx.reshape(seg, 3, np_), bby.reshape(seg, 3, np_),
                    bbz.reshape(seg, 3, np_)], axis=2)  # [seg,atom,comp,N]
    bb_t = jnp.transpose(bb, (3, 0, 1, 2))             # [N, seg, 3, 3]
    ca_t = bb_t[:, :, 1]                               # [N, seg, 3]
    off = jnp.concatenate([bb_t[:, :, 0], bb_t[:, :, 2]], axis=2) \
        - jnp.concatenate([ca_t, ca_t], axis=2)
    off_t = jnp.clip(jnp.round(off * F32(10000.0)),
                     -32767.0, 32767.0).astype(jnp.int16)
    if nl_out is not None and nl_out < np_:
        off_t = off_t[:nl_out]
        ca_t = ca_t[:nl_out]
    return off_t, ca_t


@partial(jax.jit, static_argnames=("refine_iters", "interpret", "nl_out",
                                   "wire"))
def decode_seg_fused(seg_records, mins_lane, cont_lane, sc_codes_seg,
                     fwd9, rev9, is_first, seg_m, refine_iters: int = 2,
                     interpret: bool = False, nl_out: int | None = None,
                     wire: str = "full"):
    """Fused-kernel ragged-lane decode (pack_decode_batch_lanes arrays).

    Returns per-lane compact rows: (off i16 [NL, SEG, 42], ca f32
    [NL, SEG, 3]) — row [42] = the residue's [14, 3] milli-angstrom
    offsets from its CA. The host row-gathers each protein's residues
    ((lane_of, rec_of) index); no residue gather runs on device — the
    XLA gather is index-rate-bound (~17 ns/index: ~10 ms at B=2048,
    round-4 measurement), while the lane transpose here is free.

    wire="bb": skip the side-chain kernel and return f32 backbone rows
    [NL, SEG, 9] instead — the degraded-link wire (see
    _run_backbone_only)."""
    pr = _class_prep(seg_records, mins_lane, cont_lane, sc_codes_seg,
                     fwd9, rev9, seg_m)
    np_ = pr["np"]

    if refine_iters >= 2:
        tails = _run_tails(pr, interpret)
        # ---- XLA middle: segment s re-seeded by segment s-1's tail ----
        # Ragged lanes are protein-contiguous, so the shift is a roll by
        # ONE lane; each protein's first segment keeps its own anchor
        # seed (foldcomp.cpp:849-857: prevAtoms = last 3 blended atoms).
        rolled = jnp.roll(tails, 1, axis=1)
        seeds2 = []
        for atom in range(3):
            for comp in range(3):
                seeds2.append(jnp.where(is_first, fwd9[atom * 3 + comp],
                                        rolled[comp * 3 + atom]))
        seeds_p = _blocked(jnp.stack(seeds2, axis=0), 9, np_)
    else:
        seeds_p = pr["fwd9_p"]

    if wire == "bb":
        return _run_backbone_only(pr, seeds_p, interpret, nl_out)
    return _run_backbone_sc(pr, seeds_p, interpret, nl_out)


@partial(jax.jit, static_argnames=("refine_iters", "interpret",
                                   "nl_outs"))
def decode_seg_fused_classes(recs_t, mins_t, cont_t, sct_t, fwd_t,
                             rev_t, isf_t, segm_t, prev_idx,
                             refine_iters: int = 2,
                             interpret: bool = False,
                             nl_outs: tuple = ()):
    """Width-classed fused decode: one jit, one kernel set per class.

    On mixed corpora the reference's floored anchor interval gives each
    protein ONE tail segment up to 2x wider than its others
    (_setAnchor, foldcomp.cpp:745-761), and a single rectangular lane
    array pads EVERY lane to the widest — measured 1.7x lane-residue
    padding at production scale even with width-bucket batching,
    because the tail drags the protein's normal-width lanes into the
    wide bucket. Here lanes are grouped into width CLASSES (arrays
    tuples, one entry per class, lanes permuted by the pack so classes
    are contiguous); each class runs the standard three-kernel pipeline
    at its own SEG. The only cross-lane coupling — segment s re-seeded
    by segment s-1's blended tail — becomes an explicit gather over the
    concatenated tails (`prev_idx` [NL_total] i32, built by the pack;
    a protein's lanes may now live in different classes). Per-lane math
    is IDENTICAL to decode_seg_fused, so outputs are bit-equal lane for
    lane.

    Returns a tuple of per-class (off_t, ca_t) row arrays; the pack
    emits flat row indices (lane_of = global row, rec_of = 0) so the
    host stitch concatenates classes and gathers exactly as before."""
    n_cls = len(recs_t)
    # lane-group size per class from the pack's padding quantum: small
    # classes are padded to 512 lanes and run g=4 grids
    prs = [_class_prep(recs_t[i], mins_t[i], cont_t[i], sct_t[i],
                       fwd_t[i], rev_t[i], segm_t[i],
                       g=(_G_BB if recs_t[i].shape[2] % _LANE_PAD == 0
                          else 4))
           for i in range(n_cls)]

    if refine_iters >= 2:
        tails_g = jnp.concatenate(
            [_run_tails(p, interpret) for p in prs], axis=1)
        fwd_g = jnp.concatenate(fwd_t, axis=1)
        isf_g = jnp.concatenate(isf_t)
        prev = tails_g[:, prev_idx]                        # [9, NLtot]
        seeds_rows = []
        for atom in range(3):
            for comp in range(3):
                seeds_rows.append(jnp.where(
                    isf_g, fwd_g[atom * 3 + comp],
                    prev[comp * 3 + atom]))
        seeds_g = jnp.stack(seeds_rows, axis=0)
        bases = np.cumsum([0] + [p["np"] for p in prs])
        seeds_list = [
            _blocked(seeds_g[:, bases[i]:bases[i + 1]], 9, prs[i]["np"])
            for i in range(n_cls)]
    else:
        seeds_list = [p["fwd9_p"] for p in prs]

    outs = []
    for i, p in enumerate(prs):
        nl = nl_outs[i] if i < len(nl_outs) else None
        outs.append(_run_backbone_sc(p, seeds_list[i], interpret, nl))
    return tuple(outs)
