"""Fused Pallas encode: the window/dihedral math in VMEM.

Round-4 cost analysis (tools/exp_enc_cost.py) gave the device encode the
same diagnosis the decode had: XLA models 4.5-4.7 KB of HBM "bytes
accessed" per residue against a ~126 B true I/O signature, and the wall
is nearly flat from B=512 to B=4096 (~18-24 ms) — a fixed dispatch cost
of many small fusions, the big [B,L,14,3]->[14,3,L,B] relayout
transposes, and full-array round-trips between stages
(tools/exp_enc_stages.py: the angle math alone costs as much as the
whole backbone stage).

This module keeps the expensive middle in VMEM with two Pallas kernels:

- kernel `backbone` — sliding 4-atom window over the N/CA/C rows
  (dihedral + bond-angle parts, torsion_angle.cpp:46-96 / float3d.h
  op order, then the Dekker double-f32 cos emulation of the reference's
  f64 promotion) with the 3-atom carry held in VMEM scratch across
  residue blocks. Emits one dihedral cosine, one bond cosine, and a
  guard/tie bitfield per atom row.
- kernel `sidechain` — per-residue side-chain dihedral cosines over the
  AA dependency graph (sidechain.cpp:170), chemistry tables baked in as
  static where-chains (same gather-free pattern as
  pallas_decode._sel_pred). Emits 11 cosines + a bitfield per residue.

Everything numerically delicate AFTER the cosine — acos, the error
budget, per-protein min/max candidates, quantization, rescue flags,
record packing — stays in XLA and is shared VERBATIM with the XLA path
(kernels/encode.py `_records_from_streams` / `_sc_quant_tail`), so the
fused outputs are identical by construction wherever the cosines are
bit-equal; where they are not, the Dekker tie detection is
self-certifying (a value only escapes the rescue flag when its own
exact residual proves it correctly rounded).

Wire: the compact integer millicoordinate form (codec/batch.py
_compact_coord_batch); the correctly-rounded /1000 uses only IEEE-exact
mul/add (kernels/encode._div1000_cr), identical on every backend.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.aatable import MAX_ATOM, PRED_IDX
from .encode import (_BIGERR, _DEG, _ang_err_deg, _cos_f64_emul,
                     _div1000_cr, _records_from_streams, _sc_quant_tail)
from .pallas_decode import _sel_pred

F32 = jnp.float32
I32 = jnp.int32

_PRED = np.asarray(PRED_IDX, np.int32)   # [24, 14, 3]

_G = 8                    # sublane groups per grid step (f32 tile = (8, 128))
LANE_PAD = 128 * _G       # lane quantum of the fused encode
_LB = 8                   # residues per backbone grid step
_SB = 8                   # residues per sidechain grid step


def _spec(rows, g):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    return pl.BlockSpec((rows, g, 128), lambda i, j: (j, i, 0),
                        memory_space=pltpu.VMEM)


def _make_backbone_kernel(lb):
    """Sliding-window backbone cosines.

    in:  bbf [9*LB, G, 128] f32 rows 3*a + c (a = local atom, c = comp)
    out: tcos/bcos [3*LB, G, 128] f32, bits [3*LB, G, 128] i32.

    Out row a holds the dihedral over atoms (a-3..a) and the bond angle
    over (a-2..a); rows whose window starts before the chain (the first
    3 rows of the whole array, fed from stale carry scratch) are sliced
    off by the epilogue. bits: 1 dihedral-tie, 2 dihedral-guard,
    4 det<0, 8 bond-tie, 16 bond-guard."""

    def kernel(bbf_ref, tcos_ref, bcos_ref, bits_ref, carry_ref):
        init = tuple(carry_ref[i] for i in range(9))

        def body(ra, carry):
            ax, ay, az, bx, by, bz, cx, cy, cz = carry
            px = bbf_ref[3 * ra]
            py = bbf_ref[3 * ra + 1]
            pz = bbf_ref[3 * ra + 2]
            # dihedral over (A,B,C,P): dihedral_parts_c op order
            d1x, d1y, d1z = bx - ax, by - ay, bz - az
            d2x, d2y, d2z = cx - bx, cy - by, cz - bz
            d3x, d3y, d3z = px - cx, py - cy, pz - cz
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
            cos_t, tie = _cos_f64_emul(inner,
                                       jnp.where(bad, F32(1.0), denom2))
            guard_neg = bad & (denom2 == 0.0) & (inner < 0)
            cos_t = jnp.where(bad, jnp.where(guard_neg, F32(-2.0),
                                             F32(2.0)), cos_t)
            # bond over (B,C,P): e1 = B - C, e2 = P - C (the XLA path's
            # -d[:-1] / d[1:]; negation of an f32 subtraction is exact)
            e1x, e1y, e1z = bx - cx, by - cy, bz - cz
            e2x, e2y, e2z = px - cx, py - cy, pz - cz
            b_inner = e1x * e2x + e1y * e2y + e1z * e2z
            b_denom2 = (e1x * e1x + e1y * e1y + e1z * e1z) * \
                (e2x * e2x + e2y * e2y + e2z * e2z)
            b_bad = b_denom2 <= 0.0
            b_cos, b_tie = _cos_f64_emul(b_inner,
                                         jnp.where(b_bad, F32(1.0),
                                                   b_denom2))
            tcos_ref[ra] = cos_t
            bcos_ref[ra] = b_cos
            bits_ref[ra] = (tie.astype(I32)
                            | (bad.astype(I32) << 1)
                            | ((det < 0).astype(I32) << 2)
                            | (b_tie.astype(I32) << 3)
                            | (b_bad.astype(I32) << 4))
            return (bx, by, bz, cx, cy, cz, px, py, pz)

        fin = jax.lax.fori_loop(0, 3 * lb, body, init)
        for i in range(9):
            carry_ref[i] = fin[i]

    return kernel


def _make_sidechain_kernel(sb):
    """Per-residue side-chain dihedral cosines.

    in:  a14f [42*SB, G, 128] f32 rows s*42 + k*3 + c,
         code [SB, G, 128] i32
    out: scc [11*SB, G, 128] f32 (rows s*11 + j),
         scb [SB, G, 128] i32 (bit j = guard, bit 11+j = det<0)."""

    def kernel(a14f_ref, code_ref, scc_ref, scb_ref):
        def body(s, _):
            xs = [a14f_ref[s * 42 + k * 3] for k in range(MAX_ATOM)]
            ys = [a14f_ref[s * 42 + k * 3 + 1] for k in range(MAX_ATOM)]
            zs = [a14f_ref[s * 42 + k * 3 + 2] for k in range(MAX_ATOM)]
            code = code_ref[s]
            bits = jnp.zeros(code.shape, I32)
            for k in range(3, MAX_ATOM):
                p0x, p0y, p0z = _sel_pred(code, xs, ys, zs, _PRED[:, k, 0])
                p1x, p1y, p1z = _sel_pred(code, xs, ys, zs, _PRED[:, k, 1])
                p2x, p2y, p2z = _sel_pred(code, xs, ys, zs, _PRED[:, k, 2])
                # dihedral_parts_c op order over (p0, p1, p2, slot k)
                d1x, d1y, d1z = p1x - p0x, p1y - p0y, p1z - p0z
                d2x, d2y, d2z = p2x - p1x, p2y - p1y, p2z - p1z
                d3x, d3y, d3z = xs[k] - p2x, ys[k] - p2y, zs[k] - p2z
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
                cos_t = inner / jnp.sqrt(jnp.where(bad, F32(1.0), denom2))
                scc_ref[s * 11 + (k - 3)] = cos_t
                j = k - 3
                bits = bits | (bad.astype(I32) << j) \
                    | ((det < 0).astype(I32) << (11 + j))
            scb_ref[s] = bits
            return 0

        jax.lax.fori_loop(0, sb, body, 0)

    return kernel


def _blocked(x, rows, np_):
    return x.reshape(rows, np_ // 128, 128)


@partial(jax.jit, static_argnames=("interpret",))
def _fused_parity_jit(base, delta, present, res_code, n_res,
                      interpret: bool = False):
    """Prologue + two Pallas kernels + shared XLA tail, one dispatch.

    Inputs are lane-padded (B % LANE_PAD == 0, L % 8 == 0); see
    encode_parity_fused_compact. Output contract == _parity_jit_compact:
    records u8 [B,L,8], bb_flags u8 [B,L], cand_bits u16 [B,L],
    sc_q u8 [B,L,11], sc_flag_bits u16 [B,L]."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, l = res_code.shape
    assert b % LANE_PAD == 0 and l % _LB == 0 and l % _SB == 0

    # ---- XLA prologue: transpose the NARROW integer wire first (2D,
    # lane-efficient on both sides), then unpack in [rows, B] layout.
    # Doing the arithmetic in [B, L, 14, 3] costs 12.5 ms of a 20 ms
    # dispatch at B=4096: every elementwise op on a (...,14,3)-minor
    # shape runs at 3/128 lane utilization. ----
    d42 = delta.reshape(b, l * 42).T.astype(I32)        # [42L, B]
    b3 = base.reshape(b, l * 3).T                       # [3L, B] i32
    pr = present.T.astype(I32)                          # [L, B]
    code_r = jnp.clip(res_code, 0, 23).T                # [L, B]
    xi = d42.reshape(l, 14, 3, b) + b3.reshape(l, 1, 3, b)
    bitz = (pr[:, None, :] >> jnp.arange(14, dtype=I32)[None, :, None]) & 1
    xi = jnp.where(bitz[:, :, None, :] == 1, xi, 0)
    a14f = _div1000_cr(xi.reshape(42 * l, b))           # [42L, B] f32
    bbf = a14f.reshape(l, 42, b)[:, :9].reshape(9 * l, b)   # [9L, B]

    nlg = b // LANE_PAD
    vmem = pltpu.VMEM

    # ---- backbone kernel ----
    tcos, bcos, tbits = pl.pallas_call(
        _make_backbone_kernel(_LB),
        grid=(nlg, l // _LB),
        in_specs=[_spec(9 * _LB, _G)],
        out_specs=(_spec(3 * _LB, _G),) * 3,
        out_shape=(
            jax.ShapeDtypeStruct((3 * l, b // 128, 128), F32),
            jax.ShapeDtypeStruct((3 * l, b // 128, 128), F32),
            jax.ShapeDtypeStruct((3 * l, b // 128, 128), I32),
        ),
        scratch_shapes=[vmem((9, _G, 128), F32)],
        interpret=interpret,
    )(_blocked(bbf, 9 * l, b))

    # ---- sidechain kernel ----
    scc, scb = pl.pallas_call(
        _make_sidechain_kernel(_SB),
        grid=(nlg, l // _SB),
        in_specs=[_spec(42 * _SB, _G), _spec(_SB, _G)],
        out_specs=(_spec(11 * _SB, _G), _spec(_SB, _G)),
        out_shape=(
            jax.ShapeDtypeStruct((11 * l, b // 128, 128), F32),
            jax.ShapeDtypeStruct((l, b // 128, 128), I32),
        ),
        interpret=interpret,
    )(_blocked(a14f, 42 * l, b), _blocked(code_r, l, b))

    # ---- XLA epilogue: shared tails (kernels/encode.py) ----
    tcos = tcos.reshape(3 * l, b)
    bcos = bcos.reshape(3 * l, b)
    tbits = tbits.reshape(3 * l, b)

    tc = tcos[3:]                                       # [3L-3, B]
    tb = tbits[3:]
    tie = (tb & 1) > 0
    bad = (tb & 2) > 0
    detneg = (tb & 4) > 0
    cos_c = jnp.clip(tc, -1.0, 1.0)
    t_ang = jnp.arccos(cos_c) * _DEG
    nan_like = jnp.abs(tc) > 1.0
    t_ang = jnp.where(nan_like,
                      jnp.where(tc < 0, F32(180.0), F32(0.0)), t_ang)
    t_ang = jnp.where(detneg, -t_ang, t_ang)
    amp = jax.lax.rsqrt(jnp.maximum(F32(1.0) - cos_c * cos_c, F32(1e-12)))
    t_err = jnp.where(tie | bad, _BIGERR, _ang_err_deg(None, amp, t_ang))

    bc = bcos[2:]                                       # [3L-2, B]
    bb_ = tbits[2:]
    b_tie = (bb_ & 8) > 0
    b_bad = (bb_ & 16) > 0
    b_cosc = jnp.clip(bc, -1.0, 1.0)
    b_ang = jnp.arccos(b_cosc) * _DEG
    b_amp = jax.lax.rsqrt(jnp.maximum(F32(1.0) - b_cosc * b_cosc,
                                      F32(1e-12)))
    b_big = b_tie | b_bad | (jnp.abs(bc) > 1.0)
    b_err = jnp.where(b_big, _BIGERR, _ang_err_deg(None, b_amp, b_ang))

    records, bb_flags, cand_bits = _records_from_streams(
        t_ang, t_err, b_ang, b_err, res_code, n_res, l)

    scc3 = scc.reshape(l, 11, b)
    scb = scb.reshape(l, b)
    qs, flags = [], []
    for j in range(11):
        sc_bad = ((scb >> j) & 1) > 0
        sc_detneg = ((scb >> (11 + j)) & 1) > 0
        q, fl = _sc_quant_tail(scc3[:, j], sc_detneg, sc_bad)
        qs.append(q)
        flags.append(fl)
    flag_bits = flags[0].astype(jnp.uint16)
    for j, fl in enumerate(flags[1:], start=1):
        flag_bits = flag_bits | (fl.astype(jnp.uint16) << j)
    sc_q = jnp.transpose(jnp.stack(qs), (2, 1, 0))      # [B, L, 11]

    return dict(records=records, bb_flags=bb_flags, cand_bits=cand_bits,
                sc_q=sc_q, sc_flag_bits=flag_bits.T)


def encode_parity_fused_compact(base, delta, present, res_code, n_res,
                                interpret: bool = False):
    """Fused-kernel full-device parity encode from the compact wire.

    Same contract as kernels/encode.encode_parity_core_compact; pads the
    protein lanes to LANE_PAD (zero lanes produce all-zero outputs and
    are sliced off) and the residue axis to the kernel block quantum."""
    b, l = np.shape(res_code)
    bp = -(-b // LANE_PAD) * LANE_PAD
    lp = -(-l // max(_LB, _SB)) * max(_LB, _SB)

    def padb(x, dtype):
        x = np.asarray(x, dtype)
        if bp == b and lp == l:
            return x
        pad = [(0, bp - b), (0, lp - l)] + \
            [(0, 0)] * (x.ndim - 2) if x.ndim >= 2 else [(0, bp - b)]
        return np.pad(x, pad[:x.ndim])

    out = _fused_parity_jit(padb(base, np.int32), padb(delta, np.int16),
                            padb(present, np.uint16),
                            padb(res_code, np.int32),
                            np.pad(np.asarray(n_res, np.int32),
                                   (0, bp - b)),
                            interpret=interpret)
    if bp == b and lp == l:
        return out
    return {k: v[:b, :l] for k, v in out.items()}
