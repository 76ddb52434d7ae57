"""Fused Pallas encode: one merged kernel, residues on lanes.

Round-4 cost analysis (tools/exp_enc_cost.py) gave the device encode the
same diagnosis the decode had: XLA models 4.5-4.7 KB of HBM "bytes
accessed" per residue against a ~126 B true I/O signature. Round 5
measured where it actually goes (in-jit repeated timing, dispatch floor
amortized): the [B, L*42] -> [rows, B] mega-transpose of the integer
wire alone is ~3 ms at B=2048 — more than half the whole XLA encode —
because an i16 lane<->sublane relayout of ~50 MB runs at ~16 GB/s.

This version never performs that transpose. Layout choice: PROTEINS on
sublanes, RESIDUES on lanes, (atom-slot x component) plane-major:

- XLA mini-prologue: [B, L, 42] -> [42, B, L] batched minor-dims
  transpose of the i16 wire (~1.3 ms true, vs ~3 ms for the mega
  transpose) + [B, L] present/code passthrough.
- ONE Pallas kernel, grid over protein blocks, FULL protein on lanes
  (no cross-block carry): unpack + correctly-rounded /1000
  (kernels/encode._div1000_cr), backbone dihedral/bond cosines as
  whole-plane vector ops (the sliding 4-atom window becomes one
  lane-roll: atoms of residue r+1 are the same rows shifted one lane),
  Dekker double-f32 cos emulation (torsion_angle.cpp:46-96 op order,
  float3d.h bond order), side-chain dihedral cosines over the AA
  dependency graph (sidechain.cpp:170) via gather-free where-chains
  (pallas_decode._sel_pred). Everything stays in VMEM; outputs are
  cosine/guard planes [3|11, B, L].
- XLA epilogue in the SAME lanes-layout: acos (no Mosaic lowering for
  acos), per-protein masked min/max over lanes, quantization + rescue
  flags + record packing — no transposes anywhere; outputs land
  directly in the host-consumed [B, L, ...] layout.

Everything numerically delicate after the cosine — acos, the error
budget, per-protein min/max candidates, quantization, rescue flags,
record packing — mirrors kernels/encode.py `_backbone_q_flags` /
`_stream_q_flags` / `_sc_quant_tail` operation-for-operation (the
side-chain tail is shared verbatim), so the fused outputs are identical
by construction wherever the cosines are bit-equal; where they are not,
the Dekker tie detection is self-certifying and the parts_eps widening
(per-backend, 0 on TPU) flags the rest for host rescue. Byte parity is
gated in interpret mode (tests/test_pallas_encode.py) and compiled
on-hardware (foldcomp_tpu/verify.py, bench device_parity_ok).

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
from .bitpack import pack_records
from .encode import (_BIGERR, _DEG, _ang_err_deg, _cos_f64_emul,
                     _div1000_cr, _sc_quant_tail, NBIN_BOND, NBIN_OMEGA,
                     NBIN_PHI_PSI)
from .pallas_decode import _sel_pred

F32 = jnp.float32
I32 = jnp.int32

_PRED = np.asarray(PRED_IDX, np.int32)   # [24, 14, 3]

LANE_PAD = 128            # residue-lane quantum
_PB = 16                  # proteins (sublanes) per grid step
_BIGF = np.float32(3.4e38)

# beyond this padded length the block VMEM footprint gets tight; the
# caller falls back to the XLA core (encode_parity_core_compact)
MAX_L_FUSED = 1536


def _roll1(v):
    """v[:, r] -> v[:, r+1] (next residue's value at this lane); the
    wrap row lands in masked padding (full protein per block)."""
    return jnp.concatenate([v[:, 1:], v[:, :1]], axis=1)


def _dihedral_cos(d1, d2, d3, eps):
    """Dihedral cosine planes from three (x, y, z) difference tuples.

    Exact op order of the XLA core (kernels/encode._backbone_q_flags,
    mirroring torsion_angle.cpp:46-96): cross products, inner/denom2,
    det sign, NaN-guard sentinels (+-2.0), Dekker f64-emulated division.
    Returns (cos, bits, rel) — bits: 1 tie, 2 guard, 4 det<0,
    32 det-within-noise (eps>0); rel = abs_inner*rsqrt(denom2) or None.
    """
    d1x, d1y, d1z = d1
    d2x, d2y, d2z = d2
    d3x, d3y, d3z = d3
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
    cos_t, tie = _cos_f64_emul(inner, jnp.where(bad, F32(1.0), denom2))
    guard_neg = bad & (denom2 == 0.0) & (inner < 0)
    cos_t = jnp.where(bad, jnp.where(guard_neg, F32(-2.0), F32(2.0)),
                      cos_t)
    bits = (tie.astype(I32)
            | (bad.astype(I32) << 1)
            | ((det < 0).astype(I32) << 2))
    rel = None
    if eps > 0.0:
        abs_inner = (jnp.abs(u1x * u2x) + jnp.abs(u1y * u2y)
                     + jnp.abs(u1z * u2z))
        abs_det = (jnp.abs(u1x * pbx) + jnp.abs(u1y * pby)
                   + jnp.abs(u1z * pbz))
        rel = abs_inner * jax.lax.rsqrt(jnp.maximum(denom2, F32(1e-30)))
        bits = bits | ((jnp.abs(det) <= F32(eps) * abs_det)
                       .astype(I32) << 5)
    return cos_t, bits, rel


def _bond_cos(e1, e2, eps):
    """Bond-angle cosine planes (float3d angle order, NO NaN guard —
    matching the XLA core). bits: 8 tie, 16 guard; rel as above."""
    e1x, e1y, e1z = e1
    e2x, e2y, e2z = e2
    b_inner = e1x * e2x + e1y * e2y + e1z * e2z
    b_denom2 = (e1x * e1x + e1y * e1y + e1z * e1z) * \
        (e2x * e2x + e2y * e2y + e2z * e2z)
    b_bad = b_denom2 <= 0.0
    b_cos, b_tie = _cos_f64_emul(b_inner, jnp.where(b_bad, F32(1.0),
                                                    b_denom2))
    bits = (b_tie.astype(I32) << 3) | (b_bad.astype(I32) << 4)
    rel = None
    if eps > 0.0:
        abs_b = (jnp.abs(e1x * e2x) + jnp.abs(e1y * e2y)
                 + jnp.abs(e1z * e2z))
        rel = abs_b * jax.lax.rsqrt(jnp.maximum(b_denom2, F32(1e-30)))
    return b_cos, bits, rel


def _make_merged_kernel(eps: float):
    """Whole encode math for a block of _PB proteins, full length.

    in:  dT [42, PB, L] i16, bT [3, PB, L] i32, pres/code [PB, L] i32
    out: tcos/bcos [3, PB, L] f32 (planes: idx p at residue r =
         torsion/bond window starting at backbone atom 3r+p),
         tbits [3, PB, L] i32, scc [11, PB, L] f32, scb [PB, L] i32,
         (eps>0) relt/relb [3, PB, L] f32."""

    def kernel(dT_ref, bT_ref, pres_ref, code_ref,
               tcos_ref, bcos_ref, tbits_ref, scc_ref, scb_ref, *rest):
        if eps > 0.0:
            relt_ref, relb_ref = rest
        pres = pres_ref[...]
        code = code_ref[...]
        bx = [bT_ref[c] for c in range(3)]
        # unpack + correctly-rounded /1000 per (slot, comp) plane
        xs, ys, zs = [], [], []
        for k in range(MAX_ATOM):
            bit = (pres >> k) & 1
            cols = []
            for c in range(3):
                xi = dT_ref[k * 3 + c].astype(I32) + bx[c]
                xi = jnp.where(bit == 1, xi, 0)
                cols.append(_div1000_cr(xi))
            xs.append(cols[0])
            ys.append(cols[1])
            zs.append(cols[2])

        # backbone chain differences d[a] = x[a+1] - x[a]; the three
        # per-residue d-vectors, each computed ONCE (host parity)
        dN = (xs[1] - xs[0], ys[1] - ys[0], zs[1] - zs[0])   # N->CA
        dCA = (xs[2] - xs[1], ys[2] - ys[1], zs[2] - zs[1])  # CA->C
        dC = (_roll1(xs[0]) - xs[2], _roll1(ys[0]) - ys[2],
              _roll1(zs[0]) - zs[2])                         # C->N'
        rdN = tuple(_roll1(v) for v in dN)
        rdCA = tuple(_roll1(v) for v in dCA)

        # torsion planes: window at atom 3r+p over (d[a], d[a+1], d[a+2])
        planes_t = ((dN, dCA, dC), (dCA, dC, rdN), (dC, rdN, rdCA))
        # bond planes: center atom 3r+p+1, e1 = -d[a], e2 = d[a+1]
        planes_b = ((dN, dCA), (dCA, dC), (dC, rdN))
        for p in range(3):
            cos_t, bits_t, rel_t = _dihedral_cos(*planes_t[p], eps)
            e1 = tuple(-v for v in planes_b[p][0])
            cos_b, bits_b, rel_b = _bond_cos(e1, planes_b[p][1], eps)
            tcos_ref[p] = cos_t
            bcos_ref[p] = cos_b
            tbits_ref[p] = bits_t | bits_b
            if eps > 0.0:
                relt_ref[p] = rel_t
                relb_ref[p] = rel_b

        # side chains: slots 3..13 over the AA dependency graph
        scb = jnp.zeros(code.shape, I32)
        for k in range(3, MAX_ATOM):
            p0 = _sel_pred(code, xs, ys, zs, _PRED[:, k, 0])
            p1 = _sel_pred(code, xs, ys, zs, _PRED[:, k, 1])
            p2 = _sel_pred(code, xs, ys, zs, _PRED[:, k, 2])
            d1 = (p1[0] - p0[0], p1[1] - p0[1], p1[2] - p0[2])
            d2 = (p2[0] - p1[0], p2[1] - p1[1], p2[2] - p1[2])
            d3 = (xs[k] - p2[0], ys[k] - p2[1], zs[k] - p2[2])
            u1x = d1[1] * d2[2] - d2[1] * d1[2]
            u1y = d1[2] * d2[0] - d2[2] * d1[0]
            u1z = d1[0] * d2[1] - d2[0] * d1[1]
            u2x = d2[1] * d3[2] - d3[1] * d2[2]
            u2y = d2[2] * d3[0] - d3[2] * d2[0]
            u2z = d2[0] * d3[1] - d3[0] * d2[1]
            inner = u1x * u2x + u1y * u2y + u1z * u2z
            denom2 = (u1x * u1x + u1y * u1y + u1z * u1z) * \
                (u2x * u2x + u2y * u2y + u2z * u2z)
            pbx = u2y * d2[2] - d2[1] * u2z
            pby = u2z * d2[0] - d2[2] * u2x
            pbz = u2x * d2[1] - d2[0] * u2y
            det = u1x * pbx + u1y * pby + u1z * pbz
            bad = denom2 <= 0.0
            cos_t = inner / jnp.sqrt(jnp.where(bad, F32(1.0), denom2))
            j = k - 3
            scc_ref[j] = cos_t
            scb = scb | (bad.astype(I32) << j) \
                | ((det < 0).astype(I32) << (11 + j))
        scb_ref[...] = scb

    return kernel


def _stream_q_flags_lanes(ang, err, amask, nbin):
    """kernels/encode._stream_q_flags with residues on LANES.

    ang/err/amask: [B, L]. Identical arithmetic (min/max are
    order-independent; everything else elementwise), reductions over
    axis -1 instead of 0. Returns (q i32, flag, cand_min, cand_max)."""
    lo = jnp.where(amask, ang - err, _BIGF)
    hi = jnp.where(amask, ang + err, _BIGF)
    c_min = jnp.min(hi, axis=-1, keepdims=True)
    cand_min = amask & (lo <= c_min)
    lo2 = jnp.where(amask, ang - err, -_BIGF)
    hi2 = jnp.where(amask, ang + err, -_BIGF)
    c_max = jnp.max(lo2, axis=-1, keepdims=True)
    cand_max = amask & (hi2 >= c_max)

    vmin = jnp.min(jnp.where(amask, ang, _BIGF), axis=-1, keepdims=True)
    vmax = jnp.max(jnp.where(amask, ang, -_BIGF), axis=-1, keepdims=True)
    disc_f = nbin / (vmax - vmin)
    t = (ang - vmin) * disc_f
    q = jnp.floor(t + F32(0.5)).astype(I32)
    q = jnp.where(jnp.isnan(t) | (t < 0), 0, q)

    err_min = jnp.max(jnp.where(cand_min, err, F32(0.0)), axis=-1,
                      keepdims=True)
    err_max = jnp.max(jnp.where(cand_max, err, F32(0.0)), axis=-1,
                      keepdims=True)
    tol = disc_f * (err + err_min) \
        + (jnp.abs(t) / nbin) * (disc_f * (err_min + err_max)) \
        + jnp.abs(t) * F32(5e-7) + F32(1e-4)
    half = t + F32(0.5)
    dist = jnp.abs(half - jnp.round(half))
    flag = (dist <= tol) | ~jnp.isfinite(t) | ~jnp.isfinite(tol)
    return q, flag & amask, cand_min, cand_max


def _tors_tail(tc, tb, rel, parts_eps):
    """Cosine plane -> (angle, err) [B, L], mirroring the XLA core."""
    tie = (tb & 1) > 0
    bad = (tb & 2) > 0
    detneg = (tb & 4) > 0
    cos_c = jnp.clip(tc, -1.0, 1.0)
    ang = jnp.arccos(cos_c) * _DEG
    nan_like = jnp.abs(tc) > 1.0
    ang = jnp.where(nan_like, jnp.where(tc < 0, F32(180.0), F32(0.0)),
                    ang)
    ang = jnp.where(detneg, -ang, ang)
    amp = jax.lax.rsqrt(jnp.maximum(F32(1.0) - cos_c * cos_c, F32(1e-12)))
    if parts_eps > 0.0:
        delta = F32(parts_eps) * (rel + jnp.abs(cos_c))
        big = tie | bad | ((tb & 32) > 0) \
            | (jnp.abs(tc) >= F32(1.0) - delta)
    else:
        delta = None
        big = tie | bad
    err = jnp.where(big, _BIGERR, _ang_err_deg(delta, amp, ang))
    return ang, err


def _bond_tail(bc, tb, rel, parts_eps):
    b_tie = (tb & 8) > 0
    b_bad = (tb & 16) > 0
    b_cosc = jnp.clip(bc, -1.0, 1.0)
    ang = jnp.arccos(b_cosc) * _DEG
    amp = jax.lax.rsqrt(jnp.maximum(F32(1.0) - b_cosc * b_cosc,
                                    F32(1e-12)))
    if parts_eps > 0.0:
        delta = F32(parts_eps) * (rel + jnp.abs(b_cosc))
        big = b_tie | b_bad | (jnp.abs(bc) >= F32(1.0) - delta)
    else:
        delta = None
        big = b_tie | b_bad | (jnp.abs(bc) > 1.0)
    err = jnp.where(big, _BIGERR, _ang_err_deg(delta, amp, ang))
    return ang, err


@partial(jax.jit, static_argnames=("pb", "parts_eps", "interpret",
                                   "planar"))
def _fused_parity_jit(base, delta, present, res_code, n_res,
                      pb: int = _PB, parts_eps: float = 0.0,
                      interpret: bool = False, planar: bool = False):
    """Mini-prologue + ONE Pallas kernel + lanes-layout XLA tail.

    Inputs padded (B % pb == 0, L % LANE_PAD == 0); see
    encode_parity_fused_compact. With planar=True, base/delta arrive
    already in the plane-major device layout ([3|42, B, L] — the native
    host pack fcz_pack_encode_wire emits it directly) and the
    mini-prologue transposes disappear. Output contract ==
    _parity_jit_compact: records u8 [B,L,8], bb_flags u8 [B,L],
    cand_bits u16 [B,L], sc_q u8 [B,L,11], sc_flag_bits u16 [B,L]."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, l = res_code.shape
    assert b % pb == 0

    # ---- XLA mini-prologue: batched minor-dims transposes of the
    # narrow integer wire into plane-major [42|3, B, L] (skipped when
    # the host pack shipped the wire plane-major already) ----
    if planar:
        dT, bT = delta, base
    else:
        dT = jnp.transpose(delta.reshape(b, l, 42), (2, 0, 1))
        bT = jnp.transpose(base, (2, 0, 1))
    pr = present.astype(I32)
    code = jnp.clip(res_code, 0, 23)

    vmem = pltpu.VMEM
    n_extra = 2 if parts_eps > 0.0 else 0

    def spec3(rows):
        return pl.BlockSpec((rows, pb, l), lambda i: (0, i, 0),
                            memory_space=vmem)

    def spec2():
        return pl.BlockSpec((pb, l), lambda i: (i, 0), memory_space=vmem)

    out_specs = [spec3(3), spec3(3), spec3(3), spec3(11), spec2()] + \
        [spec3(3)] * n_extra
    out_shape = [
        jax.ShapeDtypeStruct((3, b, l), F32),
        jax.ShapeDtypeStruct((3, b, l), F32),
        jax.ShapeDtypeStruct((3, b, l), I32),
        jax.ShapeDtypeStruct((11, b, l), F32),
        jax.ShapeDtypeStruct((b, l), I32),
    ] + [jax.ShapeDtypeStruct((3, b, l), F32)] * n_extra

    outs = pl.pallas_call(
        _make_merged_kernel(parts_eps),
        grid=(b // pb,),
        in_specs=[spec3(42), spec3(3), spec2(), spec2()],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=interpret,
    )(dT, bT, pr, code)
    tcos, bcos, tbits, scc, scb = outs[:5]
    relt, relb = (outs[5], outs[6]) if parts_eps > 0.0 else (None, None)

    # ---- XLA epilogue, residues on lanes throughout ----
    def shift1(v):
        return jnp.concatenate([v[:, 1:], v[:, :1]], axis=1)

    def rel_of(r, p):
        return r[p] if r is not None else None

    # stream s value at residue-lane i (kernels/encode stream order):
    # phi_i = torsion plane 2 @ i, psi = plane 0, omega = plane 1;
    # n_ca_c_i = bond plane 0 @ i+1, ca_c_n = plane 1, c_n_ca = plane 2
    t_angs, t_errs = {}, {}
    for p in range(3):
        t_angs[p], t_errs[p] = _tors_tail(tcos[p], tbits[p],
                                          rel_of(relt, p), parts_eps)
    b_angs, b_errs = {}, {}
    for p in range(3):
        b_angs[p], b_errs[p] = _bond_tail(bcos[p], tbits[p],
                                          rel_of(relb, p), parts_eps)

    iota_l = jax.lax.iota(I32, l)[None, :]
    amask = iota_l < (n_res[:, None] - 1)            # [B, L]
    streams = [
        (t_angs[2], t_errs[2], NBIN_PHI_PSI),                  # phi
        (t_angs[0], t_errs[0], NBIN_PHI_PSI),                  # psi
        (t_angs[1], t_errs[1], NBIN_OMEGA),                    # omega
        (shift1(b_angs[0]), shift1(b_errs[0]), NBIN_BOND),     # n_ca_c
        (b_angs[1], b_errs[1], NBIN_BOND),                     # ca_c_n
        (b_angs[2], b_errs[2], NBIN_BOND),                     # c_n_ca
    ]
    qs, flags, cmins, cmaxs = [], [], [], []
    for ang_s, err_s, nbin in streams:
        q, fl, cmn, cmx = _stream_q_flags_lanes(ang_s, err_s, amask, nbin)
        qs.append(jnp.where(amask, q, 0))
        flags.append(fl)
        cmins.append(cmn)
        cmaxs.append(cmx)

    res_mask = iota_l < n_res[:, None]
    records = pack_records(jnp.where(res_mask, res_code, 0), *qs)

    def to_bits(planes, dtype, shift=0):
        acc = None
        for s, p in enumerate(planes):
            bit = p.astype(dtype) << (s + shift)
            acc = bit if acc is None else acc | bit
        return acc
    bb_flags = to_bits(flags, jnp.uint8)
    cand_bits = to_bits(cmins, jnp.uint16) | to_bits(cmaxs, jnp.uint16, 8)

    sc_qs, sc_flags = [], []
    for j in range(11):
        sc_bad = ((scb >> j) & 1) > 0
        sc_detneg = ((scb >> (11 + j)) & 1) > 0
        q, fl = _sc_quant_tail(scc[j], sc_detneg, sc_bad)
        sc_qs.append(q)
        sc_flags.append(fl)
    flag_bits = sc_flags[0].astype(jnp.uint16)
    for j, fl in enumerate(sc_flags[1:], start=1):
        flag_bits = flag_bits | (fl.astype(jnp.uint16) << j)
    sc_q = jnp.stack(sc_qs, axis=-1)                 # [B, L, 11]

    return dict(records=records, bb_flags=bb_flags, cand_bits=cand_bits,
                sc_q=sc_q, sc_flag_bits=flag_bits)


def encode_parity_fused_compact(base, delta, present, res_code, n_res,
                                interpret: bool = False):
    """Fused-kernel full-device parity encode from the compact wire.

    Same contract as kernels/encode.encode_parity_core_compact; pads
    only the protein axis to the sublane block (residue lanes pass
    through at their natural length — Pallas full-dimension blocks
    accept any lane count, and padding the wire to a 128 quantum cost
    the host a full np.pad copy plus ~33% extra H2D on the pipelined
    path). Returns None when the length exceeds MAX_L_FUSED (VMEM
    budget) — callers fall back to the XLA core."""
    from .encode import _parts_eps

    b, l = np.shape(res_code)
    if l > MAX_L_FUSED:
        return None
    pb = fused_pb(l)
    bp = -(-b // pb) * pb

    def padb(x, dtype):
        x = np.asarray(x, dtype)
        if bp == b:
            return x
        return np.pad(x, [(0, bp - b)] + [(0, 0)] * (x.ndim - 1))

    out = _fused_parity_jit(padb(base, np.int32), padb(delta, np.int16),
                            padb(present, np.uint16),
                            padb(res_code, np.int32),
                            np.pad(np.asarray(n_res, np.int32),
                                   (0, bp - b)),
                            pb=pb, parts_eps=_parts_eps(),
                            interpret=interpret)
    if bp == b:
        return out
    return {k: v[:b] for k, v in out.items()}


def fused_pb(l: int) -> int:
    """Protein-sublane block size for a padded length l (VMEM budget:
    halve the block once the per-protein lane footprint doubles)."""
    return _PB if l <= 768 else 8


def encode_parity_fused_planar(baseT, deltaT, present, res_code, n_res,
                               n_out: int, interpret: bool = False):
    """Fused parity encode from the PLANE-MAJOR wire.

    baseT i32 [3, bp, l] / deltaT i16 [42, bp, l] / present u16 [bp, l]
    arrive already transposed and protein-padded (bp a multiple of
    fused_pb(l)) — the native host pack (native/fccodec.c
    fcz_pack_encode_wire) emits this layout in one pass, so neither the
    host nor the device pays a transpose. res_code/n_res are padded to
    bp by the caller; outputs are sliced back to the live batch n_out.
    Same output contract as encode_parity_fused_compact; returns None
    when l exceeds the fused VMEM budget (callers fall back to the XLA
    core on the [B, L] wire)."""
    from .encode import _parts_eps

    bp, l = np.shape(res_code)
    if l > MAX_L_FUSED:
        return None
    pb = fused_pb(l)
    assert bp % pb == 0 and np.shape(deltaT) == (42, bp, l)
    eps = _parts_eps()
    out = None
    if not interpret:
        # AOT artifact for this signature: skip the jit trace on fresh
        # processes (kernels/aot.py), same treatment as the decode
        from . import aot
        call = aot.try_encode_call(baseT, deltaT, present, res_code,
                                   n_res, pb, eps)
        if call is not None:
            out = call(baseT, deltaT, present, res_code, n_res)
    if out is None:
        out = _fused_parity_jit(baseT, deltaT, present, res_code, n_res,
                                pb=pb, parts_eps=eps,
                                interpret=interpret, planar=True)
        if not interpret:
            from . import aot
            aot.save_encode_aot(baseT, deltaT, present, res_code, n_res,
                                pb, eps)
    if bp == n_out:
        return out
    return {k: v[:n_out] for k, v in out.items()}
