"""Batched FCZ encode core (device side).

One jitted function turns padded batches of structures (backbone + atom14
coordinates, residue codes, CA temp factors, residue masks) into quantized
FCZ streams: packed 8-byte records, side-chain codes, tempFactor codes, and
the per-protein quantizer headers. Pipeline parity: Foldcomp::preprocess +
compress (foldcomp.cpp:450-606), restructured from per-residue scalar loops
into masked array ops.

Internals use lanes-last layouts (see kernels/nerf.py): coordinates are
per-component arrays with atoms on sublanes and proteins/residues on lanes,
giving full (8, 128) tile occupancy on the VPU.

Quantization here is plain float32 (the exact path in codec/encoder.py and
native/fccodec.c reproduces the reference's f32/f64 promotion mix
bit-for-bit); bins can differ from the reference only when a value lands
within ~1 ulp of a bin boundary.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .bitpack import pack_records
from .geometry import (bond_angle_c, bond_angle_parts_c, dihedral_c,
                       dihedral_parts_c)
from .sidechain import MAX_ATOM, _PRED_IDX

F32 = jnp.float32
I32 = jnp.int32

NBIN_PHI_PSI = np.float32(2 ** 12 - 1)
NBIN_OMEGA = np.float32(2 ** 11 - 1)
NBIN_BOND = np.float32(2 ** 8 - 1)
NBIN_TEMP = np.float32(2 ** 8 - 1)

# FixedAngleDiscretizer(255) (discretizer.h:89-106), truncating scalar path
_SC_DISC_F = np.float32(255.0 / 360.0)

_BIG = np.float32(3.4e38)


def _masked_min_max(v, mask):
    """Min/max over axis 0 (sublanes) of [K, B] under mask [K, B]."""
    vmin = jnp.min(jnp.where(mask, v, _BIG), axis=0)
    vmax = jnp.max(jnp.where(mask, v, -_BIG), axis=0)
    return vmin, vmax


def _div1000_cr(xi):
    """Correctly-rounded f32 division by 1000 for integer |xi| < 2^24.

    TPU f32 divide is reciprocal-multiply (NOT correctly rounded: 59% of
    the int24 millicoordinate domain differs from IEEE in the last ulp),
    so this builds the quotient from exact primitives only: f32 mul/add
    are IEEE-correct on TPU, int->f32 is exact below 2^24, and a Dekker
    12+12 split makes the residual r = xf - q*1000 exact (both partial
    products fit 24 bits). Two refinement passes reach the correctly
    rounded quotient; verified EXHAUSTIVELY over the full +/- int24
    domain against numpy on both the TPU and CPU backends
    (tests/test_fast_codec.py::test_div1000_cr_exhaustive_sample)."""
    xf = xi.astype(F32)
    c = F32(0.001)

    def refine(q):
        s = q * F32(4097.0)          # Dekker split at 12 bits
        hi = s - (s - q)
        lo = q - hi
        r = (xf - hi * F32(1000.0)) - lo * F32(1000.0)
        return q + r * c

    return refine(refine(xf * c))


def _sc_quant_tail(cos_t, det_neg, bad):
    """Side-chain quantization tail from the raw dihedral cosine.

    cos_t [K, B] f32 = inner / sqrt(denom2-or-1), det_neg/bad bool masks.
    Shared verbatim between the XLA path (_sc_q_flags) and the fused
    Pallas path (pallas_encode) so the quantized code + rescue flag are
    identical by construction. Returns (q u8, flag u8)."""
    deg = F32(57.29577951308232)
    ang = jnp.arccos(jnp.clip(cos_t, -1.0, 1.0)) * deg
    nan_like = bad | (jnp.abs(cos_t) > 1.0)
    ang = jnp.where(nan_like,
                    jnp.where(cos_t < 0, F32(180.0), F32(0.0)), ang)
    ang = jnp.where(det_neg, -ang, ang)
    t = (ang + F32(180.0)) * _SC_DISC_F
    t = jnp.where(jnp.isnan(t) | (t < 0), F32(0.0), t)
    q = jnp.clip(t.astype(I32), 0, 255).astype(jnp.uint8)
    amp = jax.lax.rsqrt(jnp.maximum(F32(1.0) - cos_t * cos_t,
                                    F32(1e-12)))
    tol = _SC_DISC_F * deg * F32(1e-6) * (F32(1.0) + amp) + F32(2e-4)
    dist = jnp.abs(t - jnp.round(t))
    flag = ((dist < tol) | nan_like).astype(jnp.uint8)
    return q, flag


def _sc_q_flags(atom14, res_code):
    """Shared body: side-chain quantization + packed rescue flags.

    Returns (sc_q u8 [B, L, 11], flag_bits u16 [B, L]) — bit k of
    flag_bits marks slot k of that residue as near-boundary. sc_q is the
    fixed 255-bin truncating quantization computed in device f32; a flag
    marks values whose scaled angle lies within an ulp-derived tolerance
    of a truncation boundary (tolerance amplified by 1/sqrt(1-cos^2), the
    acos input sensitivity), plus every NaN-guard output. The host keeps
    unflagged codes as-is (device f32 cannot flip those bins vs the exact
    path) and recomputes flagged ones exactly from atom14
    (codec/batch.py finish_encode_host) — bit-parity at ~1.1 bytes/slot
    of D2H transfer instead of 12 for the raw parts (the parts form was
    transfer-bound on the axon tunnel)."""
    a14 = jnp.transpose(atom14, (2, 3, 1, 0))        # [14, 3, L, B]
    sxa, sya, sza = a14[:, 0], a14[:, 1], a14[:, 2]  # [14, L, B]
    codes_lb = jnp.clip(res_code.T, 0, 23)           # [L, B]

    # Per-lane predecessor slots via ONE one-hot MXU contraction against
    # the [24, 33] index table + distinct-value select chains — same
    # pattern as decode's place_sidechains_onehot_c (bit-identical:
    # Precision.HIGHEST bf16x3 reconstructs exact f32 for one-hot
    # operands). Replaces the [L, B, 14, 3] gathered table + 33 strided
    # slices, the op shape measured pathological on TPU (PROFILE.md).
    onehot = (codes_lb[None] == jnp.arange(24, dtype=codes_lb.dtype)
              .reshape(24, 1, 1)).astype(F32)        # [24, L, B]
    cols = [np.asarray(_PRED_IDX)[:, k, j]
            for k in range(3, MAX_ATOM) for j in range(3)]
    tab = jnp.asarray(np.stack(cols, axis=1).astype(np.float32))
    vals = jnp.einsum("cm,clb->mlb", tab, onehot,
                      precision=jax.lax.Precision.HIGHEST)

    def sel(arr, idxf, col):
        dv = np.unique(col)
        acc = arr[int(dv[0])]
        for v in dv[1:]:
            acc = jnp.where(idxf == F32(v), arr[int(v)], acc)
        return acc

    qs, flags = [], []
    for k in range(3, MAX_ATOM):
        m = 3 * (k - 3)
        p0, p1, p2 = vals[m], vals[m + 1], vals[m + 2]
        c0 = np.asarray(_PRED_IDX)[:, k, 0]
        c1 = np.asarray(_PRED_IDX)[:, k, 1]
        c2 = np.asarray(_PRED_IDX)[:, k, 2]
        inner, denom2, det = dihedral_parts_c(
            sel(sxa, p0, c0), sel(sya, p0, c0), sel(sza, p0, c0),
            sel(sxa, p1, c1), sel(sya, p1, c1), sel(sza, p1, c1),
            sel(sxa, p2, c2), sel(sya, p2, c2), sel(sza, p2, c2),
            sxa[k], sya[k], sza[k])
        bad = denom2 <= 0.0
        cos_t = inner / jnp.sqrt(jnp.where(bad, F32(1.0), denom2))
        q, fl = _sc_quant_tail(cos_t, det < 0, bad)
        flags.append(fl)
        qs.append(q)
    # pack the 11 flag planes into one u16 bitfield per residue (the
    # flags are ~1e-3 sparse: 11 bytes -> 2 bytes of D2H per residue);
    # transpose to [B, L, ...] on device: that is the layout the host
    # serializer consumes, and converting an [11, L, B]-major jax array
    # to numpy costs a 45 ms host-side relayout per batch otherwise
    flag_bits = flags[0].astype(jnp.uint16)
    for k, fl in enumerate(flags[1:], start=1):
        flag_bits = flag_bits | (fl.astype(jnp.uint16) << k)
    return (jnp.transpose(jnp.stack(qs), (2, 1, 0)),
            flag_bits.T)


@jax.jit
def encode_sc_q_core(atom14, res_code):
    """Device sc quantization from f32 coords (see _sc_q_flags)."""
    return _sc_q_flags(atom14, res_code)


@jax.jit
def encode_sc_q_core_compact(base, delta, present, res_code):
    """Device sc quantization from compact integer millicoordinates.

    base:    i32 [B, L, 3]     first present atom's coords, milli-angstrom
    delta:   i16 [B, L, 14, 3] per-slot offsets from base (0 if absent)
    present: u16 [B, L]        bit k set iff atom slot k exists
    res_code: i32 [B, L]

    Reconstructs the EXACT f32 coordinates the f32 path sees:
    xi = base + delta in int32 (|xi| < 2^24, host-checked), absent slots
    forced to the 0 fill of fragment_to_tensors, then the correctly
    rounded /1000 (_div1000_cr) — bit-identical to the host's
    np.float32 division, so the quantized codes and rescue flags are
    bit-identical to encode_sc_q_core on the f32 input. The integer form
    exists purely for the wire: millicoordinate deltas are low-entropy
    and compress ~2x better through the axon tunnel than f32 bit
    patterns (the H2D transfer bounds device encode there)."""
    xi = base[:, :, None, :].astype(I32) + delta.astype(I32)
    bit = (present[:, :, None].astype(I32) >>
           jnp.arange(14, dtype=I32)[None, None, :]) & 1
    xi = jnp.where(bit[..., None] == 1, xi, 0)
    return _sc_q_flags(_div1000_cr(xi), res_code)


# error marker: rows whose device value cannot be trusted at all (NaN
# guard neighborhoods, division-rounding ties, near-zero dihedral
# determinants). Forces the row into every candidate set and the rescue
# flag on (via the tol term).
_BIGERR = np.float32(1e4)
_BIGF = np.float32(1e30)
_DEG = np.float32(180.0 / np.pi)
# relative parts-noise budget per backend. The f32 dot/cross "parts" are
# BIT-IDENTICAL to the C op ordering on TPU (measured 0 ulps across all
# streams; gated by the fuzz byte-parity in tests/test_encode_device.py),
# so the only device-vs-reference divergence left after the double-f32
# cos emulation is the acos tail (~ulps of the angle). XLA:CPU contracts
# fma and reassociates, so there the budget must cover the dot products
# (cancellation-amplified; 32 product-ulps observed well above the real
# worst case).
_PARTS_EPS_TPU = 0.0
_PARTS_EPS_CPU = float(64 * 2.0 ** -24)


def _two_prod(a, b):
    """Dekker product: a*b = p + e exactly in f32 (no fma required)."""
    p = a * b
    s = a * F32(4097.0)
    ah = s - (s - a)
    al = a - ah
    t = b * F32(4097.0)
    bh = t - (t - b)
    bl = b - bh
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def _cos_f64_emul(inner, denom2):
    """f32 round of (double)inner / sqrt((double)denom2), in double-f32.

    The reference promotes the f32 parts to double for the sqrt/division
    (float3d.h:36-44, torsion_angle.cpp:63) and rounds the cos back to
    f32 once. Emulating that chain on device — Newton-corrected sqrt and
    division with exact Dekker residuals, ~2^-45 relative — makes the
    device cos BIT-EQUAL to the host's wherever the f32 parts agree,
    except when the true quotient lies within ~2^-44 of an f32 rounding
    boundary; those ties are returned for BIG-err flagging. denom2 must
    be > 0 (caller substitutes 1.0 for guarded rows)."""
    s = jnp.sqrt(denom2)
    p, pe = _two_prod(s, s)
    r = (denom2 - p) - pe                  # denom2 - s*s, exact
    e = r / (s + s)                        # sqrt(denom2) ~= s + e
    q0 = inner / s
    qp, qpe = _two_prod(q0, s)
    rr = ((inner - qp) - qpe) - q0 * e     # inner - q0*(s+e)
    corr = rr / s
    c = q0 + corr
    resid = (q0 - c) + corr                # distance to the true quotient
    ulp = jnp.abs(c) * F32(2.0 ** -23) + F32(1e-38)
    tie = jnp.abs(resid) > F32(0.499) * ulp
    return c, tie


def _ang_err_deg(delta, amp, ang):
    """Angle error bound (degrees) for a +-delta cos perturbation.

    First-order |d acos| = delta*amp blows up at |cos|->1, but acos is
    Holder-1/2 there: |acos(c+e)-acos(c)| <= sqrt(2e). Plus the residual
    acos-implementation slack (device f32 acos vs the host's f64 acos
    rounded once): relative ulps of the angle + an absolute floor.
    delta is a per-row array, or None when the parts are bit-identical
    (parts_eps == 0) and the dd-division leaves no cos uncertainty."""
    base = jnp.abs(ang) * F32(5e-7) + F32(2e-5)
    if delta is None:
        return base
    return _DEG * jnp.minimum(delta * amp,
                              jnp.sqrt(F32(2.0) * delta)) + base


def _stream_q_flags(ang, err, amask, nbin):
    """Per-stream device quantization + rescue/candidate flags.

    ang/err/amask: [K, B] (value, abs error bound in degrees, validity).
    Returns (q i32 [K, B], flag bool [K, B], cand_min bool, cand_max bool).

    The quantizer params are data-dependent (per-protein min/max,
    discretizer.cpp:36-41), so bit parity needs the EXACT extremes: any
    row whose error interval reaches below min(ang + err) can be the true
    minimum — those rows are min-candidates the host recomputes exactly
    (symmetrically for max). Bin parity then needs every row whose scaled
    value sits within the total error budget (own value error + extreme
    errors scaled into the bin domain) of a truncation boundary — those
    are the rescue flags. Unflagged bins cannot differ from the exact
    path under ANY params within the error bounds."""
    lo = jnp.where(amask, ang - err, _BIGF)
    hi = jnp.where(amask, ang + err, _BIGF)
    c_min = jnp.min(hi, axis=0)                      # >= true min
    cand_min = amask & (lo <= c_min[None, :])
    lo2 = jnp.where(amask, ang - err, -_BIGF)
    hi2 = jnp.where(amask, ang + err, -_BIGF)
    c_max = jnp.max(lo2, axis=0)                     # <= true max
    cand_max = amask & (hi2 >= c_max[None, :])

    vmin = jnp.min(jnp.where(amask, ang, _BIGF), axis=0)
    vmax = jnp.max(jnp.where(amask, ang, -_BIGF), axis=0)
    disc_f = nbin / (vmax - vmin)
    t = (ang - vmin[None, :]) * disc_f[None, :]
    q = jnp.floor(t + F32(0.5)).astype(I32)
    q = jnp.where(jnp.isnan(t) | (t < 0), 0, q)

    err_min = jnp.max(jnp.where(cand_min, err, F32(0.0)), axis=0)
    err_max = jnp.max(jnp.where(cand_max, err, F32(0.0)), axis=0)
    # |t_dev - t_exact| <= disc_f*(err + err_min) + (t/nbin)*disc_f*
    # (err_min + err_max) [range shift] + f32 rounding slack of the
    # quantization ops themselves
    tol = disc_f[None, :] * (err + err_min[None, :]) \
        + (jnp.abs(t) / nbin) * (disc_f * (err_min + err_max))[None, :] \
        + jnp.abs(t) * F32(5e-7) + F32(1e-4)
    # distance of t+0.5 to the nearest integer = distance to the
    # uint32(t_f64 + 0.5) truncation boundary (discretizer.cpp:49)
    half = t + F32(0.5)
    dist = jnp.abs(half - jnp.round(half))
    flag = (dist <= tol) | ~jnp.isfinite(t) | ~jnp.isfinite(tol)
    return q, flag & amask, cand_min, cand_max


def _backbone_q_flags(atom14, res_code, n_res, parts_eps: float):
    """Device backbone streams: records + rescue/candidate bitmaps.

    atom14 f32 [B, L, 14, 3], res_code i32 [B, L], n_res i32 [B].
    Returns (records u8 [B, L, 8], bb_flags u8 [B, L] with bit s set for
    header-stream s = (phi, psi, omega, n_ca_c, ca_c_n, c_n_ca), cand_bits
    u16 [B, L] with bit s = min-candidate, bit 8+s = max-candidate).

    Stream extraction parity: torsions (psi, omega, phi interleaved,
    foldcomp.cpp:484-492) and bond angles (ca_c_n, c_n_ca, n_ca_c from
    offset 1, foldcomp.cpp:497-505); quantization Discretizer fit +
    rounding discretize (discretizer.cpp:36-53); last residue zeroed
    (foldcomp.cpp:595-601). parts_eps is the static per-backend relative
    noise budget of the f32 parts vs the C op ordering (0 on TPU)."""
    b, l = res_code.shape
    bb = atom14[:, :, :3]                            # [B, L, 3, 3]
    flat = jnp.transpose(bb.reshape(b, 3 * l, 3), (1, 2, 0))   # [3L, 3, B]
    fx, fy, fz = flat[:, 0], flat[:, 1], flat[:, 2]
    dx, dy, dz = fx[1:] - fx[:-1], fy[1:] - fy[:-1], fz[1:] - fz[:-1]

    # dihedral rows [3L-3, B] (getTorsionFromXYZ, torsion_angle.cpp:46-96)
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
    cos_t, tie = _cos_f64_emul(inner, jnp.where(bad, F32(1.0), denom2))
    # host semantics for bad rows: the f64 cos is NaN (-> guard value 0)
    # except denom2 == 0 with inner < 0, where inner/0 = -inf (-> 180)
    guard_neg = bad & (denom2 == 0.0) & (inner < 0)
    cos_t = jnp.where(bad, jnp.where(guard_neg, F32(-2.0), F32(2.0)),
                      cos_t)
    cos_c = jnp.clip(cos_t, -1.0, 1.0)
    t_ang = jnp.arccos(cos_c) * _DEG
    nan_like = jnp.abs(cos_t) > 1.0
    t_ang = jnp.where(nan_like,
                      jnp.where(cos_t < 0, F32(180.0), F32(0.0)), t_ang)
    t_ang = jnp.where(det < 0, -t_ang, t_ang)
    amp = jax.lax.rsqrt(jnp.maximum(F32(1.0) - cos_c * cos_c, F32(1e-12)))
    if parts_eps > 0.0:
        abs_inner = (jnp.abs(u1x * u2x) + jnp.abs(u1y * u2y)
                     + jnp.abs(u1z * u2z))
        delta = F32(parts_eps) * (
            abs_inner * jax.lax.rsqrt(jnp.maximum(denom2, F32(1e-30)))
            + jnp.abs(cos_c))
        abs_det = (jnp.abs(u1x * pbx) + jnp.abs(u1y * pby)
                   + jnp.abs(u1z * pbz))
        # sign flips when |det| is within fma noise of 0; NaN-guard
        # behavior flips when the noisy cos crosses +-1
        big = tie | bad | (jnp.abs(det) <= F32(parts_eps) * abs_det) \
            | (jnp.abs(cos_t) >= F32(1.0) - delta)
    else:
        # parts bit-identical: det sign and guard branch are identical on
        # both sides; only division ties need rescue
        delta = None
        big = tie | bad
    t_err = jnp.where(big, _BIGERR, _ang_err_deg(delta, amp, t_ang))

    # bond rows [3L-2, B] (float3d angle — NO NaN guard: a degenerate
    # row propagates NaN through the host stream, and the BIG flag makes
    # the host rescue reproduce exactly that)
    e1x, e1y, e1z = -dx[:-1], -dy[:-1], -dz[:-1]     # a - b
    e2x, e2y, e2z = dx[1:], dy[1:], dz[1:]           # c - b
    b_inner = e1x * e2x + e1y * e2y + e1z * e2z
    b_denom2 = (e1x * e1x + e1y * e1y + e1z * e1z) * \
        (e2x * e2x + e2y * e2y + e2z * e2z)
    b_bad = b_denom2 <= 0.0
    b_cos, b_tie = _cos_f64_emul(b_inner, jnp.where(b_bad, F32(1.0),
                                                    b_denom2))
    b_cosc = jnp.clip(b_cos, -1.0, 1.0)
    b_ang = jnp.arccos(b_cosc) * _DEG
    b_amp = jax.lax.rsqrt(jnp.maximum(F32(1.0) - b_cosc * b_cosc,
                                      F32(1e-12)))
    if parts_eps > 0.0:
        abs_b = (jnp.abs(e1x * e2x) + jnp.abs(e1y * e2y)
                 + jnp.abs(e1z * e2z))
        b_delta = F32(parts_eps) * (
            abs_b * jax.lax.rsqrt(jnp.maximum(b_denom2, F32(1e-30)))
            + jnp.abs(b_cosc))
        b_big = b_tie | b_bad | (jnp.abs(b_cos) >= F32(1.0) - b_delta)
    else:
        b_delta = None
        b_big = b_tie | b_bad | (jnp.abs(b_cos) > 1.0)
    b_err = jnp.where(b_big, _BIGERR, _ang_err_deg(b_delta, b_amp, b_ang))
    return _records_from_streams(t_ang, t_err, b_ang, b_err, res_code,
                                 n_res, l)


def _records_from_streams(t_ang, t_err, b_ang, b_err, res_code, n_res, l):
    """Backbone tail: stream split + quantization + flags + packing.

    t_ang/t_err [3L-3, B], b_ang/b_err [3L-2, B]. Shared verbatim between
    the XLA path (_backbone_q_flags) and the fused Pallas path
    (pallas_encode) so records/flags/candidates are identical by
    construction."""
    i = jnp.arange(l - 1, dtype=I32)
    amask = i[:, None] < (n_res[None, :] - 1)        # [L-1, B]

    def srows(v, off, k):
        return v[off::3][:k]

    k = l - 1
    streams = [
        (srows(t_ang, 2, k), srows(t_err, 2, k), NBIN_PHI_PSI),   # phi
        (srows(t_ang, 0, k), srows(t_err, 0, k), NBIN_PHI_PSI),   # psi
        (srows(t_ang, 1, k), srows(t_err, 1, k), NBIN_OMEGA),     # omega
        (srows(b_ang, 3, k), srows(b_err, 3, k), NBIN_BOND),      # n_ca_c
        (srows(b_ang, 1, k), srows(b_err, 1, k), NBIN_BOND),      # ca_c_n
        (srows(b_ang, 2, k), srows(b_err, 2, k), NBIN_BOND),      # c_n_ca
    ]
    qs, flags, cmins, cmaxs = [], [], [], []
    for ang_s, err_s, nbin in streams:
        ks = ang_s.shape[0]
        q, fl, cmn, cmx = _stream_q_flags(ang_s, err_s, amask[:ks], nbin)
        qs.append(q)
        flags.append(fl)
        cmins.append(cmn)
        cmaxs.append(cmx)

    amask_l = jnp.arange(l, dtype=I32)[:, None] < (n_res[None, :] - 1)

    def to_l(q):
        q = jnp.pad(q, ((0, l - q.shape[0]), (0, 0)))
        return jnp.where(amask_l, q, 0).T            # [B, L]

    res_mask_l = jnp.arange(l, dtype=I32)[:, None] < n_res[None, :]
    records = pack_records(
        jnp.where(res_mask_l.T, res_code, 0),
        to_l(qs[0]), to_l(qs[1]), to_l(qs[2]),
        to_l(qs[3]), to_l(qs[4]), to_l(qs[5]))

    def to_bits(planes, dtype, shift=0):
        acc = None
        for s, p in enumerate(planes):
            p = jnp.pad(p, ((0, l - p.shape[0]), (0, 0)))
            bit = p.astype(dtype) << (s + shift)
            acc = bit if acc is None else acc | bit
        return acc.T                                 # [B, L]

    bb_flags = to_bits(flags, jnp.uint8)
    cand_bits = to_bits(cmins, jnp.uint16) | to_bits(cmaxs, jnp.uint16, 8)
    return records, bb_flags, cand_bits


@partial(jax.jit, static_argnames=("parts_eps",))
def _parity_jit(atom14, res_code, n_res, parts_eps):
    records, bb_flags, cand_bits = _backbone_q_flags(atom14, res_code,
                                                     n_res, parts_eps)
    sc_q, sc_flag_bits = _sc_q_flags(atom14, res_code)
    return dict(records=records, bb_flags=bb_flags, cand_bits=cand_bits,
                sc_q=sc_q, sc_flag_bits=sc_flag_bits)


@partial(jax.jit, static_argnames=("parts_eps",))
def _parity_jit_compact(base, delta, present, res_code, n_res, parts_eps):
    xi = base[:, :, None, :].astype(I32) + delta.astype(I32)
    bit = (present[:, :, None].astype(I32) >>
           jnp.arange(14, dtype=I32)[None, None, :]) & 1
    xi = jnp.where(bit[..., None] == 1, xi, 0)
    atom14 = _div1000_cr(xi)
    records, bb_flags, cand_bits = _backbone_q_flags(atom14, res_code,
                                                     n_res, parts_eps)
    sc_q, sc_flag_bits = _sc_q_flags(atom14, res_code)
    return dict(records=records, bb_flags=bb_flags, cand_bits=cand_bits,
                sc_q=sc_q, sc_flag_bits=sc_flag_bits)


def _parts_eps():
    return _PARTS_EPS_CPU if jax.default_backend() == "cpu" \
        else _PARTS_EPS_TPU


def encode_parity_core(atom14, res_code, n_res):
    """Full-device byte-parity encode: backbone records + side chains.

    Device computes every quantized stream in f32 (the cos via the
    double-f32 emulation of the reference's f64 chain) and flags the
    sparse set of values the host must recompute exactly (near-boundary
    bins, quantizer-extreme candidates, NaN-guard neighborhoods) — the
    same rescue pattern the side-chain path shipped in round 2, extended
    to the 6 per-protein-quantized backbone streams. Host finishing
    drops from full numpy stream recomputation to a sparse gather
    (codec/batch.py finish_encode_device)."""
    return _parity_jit(atom14, res_code, n_res, parts_eps=_parts_eps())


def encode_parity_core_compact(base, delta, present, res_code, n_res):
    """encode_parity_core from compact integer millicoordinates (see
    encode_sc_q_core_compact for the wire-format rationale)."""
    return _parity_jit_compact(base, delta, present, res_code, n_res,
                               parts_eps=_parts_eps())


@jax.jit
def encode_batch_core(bb, atom14, res_code, tf_ca, res_mask):
    """Encode a padded batch of structures into FCZ streams.

    bb:       f32 [B, L, 3, 3]  backbone N/CA/C per residue
    atom14:   f32 [B, L, 14, 3] all atoms in table slots (missing -> 0)
    res_code: i32 [B, L]        5-bit residue codes
    tf_ca:    f32 [B, L]        CA temp factors
    res_mask: bool [B, L]       residue exists

    Returns dict with records u8 [B,L,8], sc_q u8 [B,L,11], tf_q u8 [B,L],
    mins/cont_fs f32 [B,6] (phi,psi,omega,n_ca_c,ca_c_n,c_n_ca order),
    tf_min/tf_cont f32 [B].
    """
    b, l = res_code.shape

    # backbone components [3L, B]: atom rows, protein lanes
    flat = jnp.transpose(bb.reshape(b, 3 * l, 3), (1, 2, 0))   # [3L, 3, B]
    fx, fy, fz = flat[:, 0], flat[:, 1], flat[:, 2]

    # torsions (foldcomp.cpp:484-492): stream order (psi, omega, phi)
    tors = dihedral_c(fx[:-3], fy[:-3], fz[:-3],
                      fx[1:-2], fy[1:-2], fz[1:-2],
                      fx[2:-1], fy[2:-1], fz[2:-1],
                      fx[3:], fy[3:], fz[3:])                  # [3L-3, B]
    psi = tors[0::3]
    omega = tors[1::3]
    phi = tors[2::3]

    # bond angles (nerf.cpp:495-508; stream split foldcomp.cpp:497-505)
    angs = bond_angle_c(fx[:-2], fy[:-2], fz[:-2],
                        fx[1:-1], fy[1:-1], fz[1:-1],
                        fx[2:], fy[2:], fz[2:])                # [3L-2, B]
    ca_c_n = angs[1::3]
    c_n_ca = angs[2::3]
    n_ca_c = angs[3::3]

    n_res = jnp.sum(res_mask.astype(I32), axis=-1)             # [B]
    i = jnp.arange(l - 1, dtype=I32)
    amask = i[:, None] < (n_res[None, :] - 1)                  # [L-1, B]

    def quant_stream(v, nbin):
        vmin, vmax = _masked_min_max(v, amask[:v.shape[0]])
        rng = vmax - vmin
        disc_f = nbin / rng
        cont_f = rng / nbin
        q = jnp.floor((v - vmin[None, :]) * disc_f[None, :]
                      + F32(0.5)).astype(I32)
        return q, vmin, cont_f

    phi_q, phi_min, phi_cf = quant_stream(phi, NBIN_PHI_PSI)
    psi_q, psi_min, psi_cf = quant_stream(psi, NBIN_PHI_PSI)
    om_q, om_min, om_cf = quant_stream(omega, NBIN_OMEGA)
    ncac_q, ncac_min, ncac_cf = quant_stream(n_ca_c, NBIN_BOND)
    cacn_q, cacn_min, cacn_cf = quant_stream(ca_c_n, NBIN_BOND)
    cnca_q, cnca_min, cnca_cf = quant_stream(c_n_ca, NBIN_BOND)

    # Per-residue records; the last residue stores zeros for all 6 fields
    # (foldcomp.cpp:595-601). Angle stream i belongs to residue i.
    amask_l = jnp.arange(l, dtype=I32)[:, None] < (n_res[None, :] - 1)

    def to_l(q):
        q = jnp.pad(q, ((0, l - q.shape[0]), (0, 0)))
        return jnp.where(amask_l, q, 0).T                      # [B, L]

    records = pack_records(
        jnp.where(res_mask, res_code, 0),
        to_l(phi_q), to_l(psi_q), to_l(om_q),
        to_l(ncac_q), to_l(cacn_q), to_l(cnca_q))

    # Side chains on [slot, L, B] layouts: fixed [-180, 180] truncating
    # quantizer (foldcomp.cpp:532-538 -> discretizer.cpp:55-57)
    a14 = jnp.transpose(atom14, (2, 3, 1, 0))        # [14, 3, L, B]
    sxa, sya, sza = a14[:, 0], a14[:, 1], a14[:, 2]  # [14, L, B]
    codes_lb = jnp.clip(res_code.T, 0, 23)           # [L, B]

    # one-hot MXU predecessor lookup + distinct-value select chains (see
    # encode_sc_q_core; bit-identical to the gathered-table form)
    onehot = (codes_lb[None] == jnp.arange(24, dtype=codes_lb.dtype)
              .reshape(24, 1, 1)).astype(F32)        # [24, L, B]
    cols = [np.asarray(_PRED_IDX)[:, k, j]
            for k in range(3, MAX_ATOM) for j in range(3)]
    tab = jnp.asarray(np.stack(cols, axis=1).astype(np.float32))
    vals = jnp.einsum("cm,clb->mlb", tab, onehot,
                      precision=jax.lax.Precision.HIGHEST)

    def sel(arr, idxf, col):
        dv = np.unique(col)
        acc = arr[int(dv[0])]
        for v in dv[1:]:
            acc = jnp.where(idxf == F32(v), arr[int(v)], acc)
        return acc

    sc_rows = []
    for k in range(3, MAX_ATOM):
        m = 3 * (k - 3)
        p0, p1, p2 = vals[m], vals[m + 1], vals[m + 2]
        c0 = np.asarray(_PRED_IDX)[:, k, 0]
        c1 = np.asarray(_PRED_IDX)[:, k, 1]
        c2 = np.asarray(_PRED_IDX)[:, k, 2]
        ang = dihedral_c(
            sel(sxa, p0, c0), sel(sya, p0, c0), sel(sza, p0, c0),
            sel(sxa, p1, c1), sel(sya, p1, c1), sel(sza, p1, c1),
            sel(sxa, p2, c2), sel(sya, p2, c2), sel(sza, p2, c2),
            sxa[k], sya[k], sza[k])
        sc_rows.append(ang)
    sc_ang = jnp.stack(sc_rows, axis=0)              # [11, L, B]
    sc_q = jnp.clip(((sc_ang + F32(180.0)) * _SC_DISC_F).astype(I32),
                    0, 255).astype(jnp.uint8)
    sc_q = jnp.transpose(sc_q, (2, 1, 0))            # [B, L, 11]

    # tempFactors: per-protein rounding quantizer (foldcomp.cpp:543-550)
    tf_t = tf_ca.T                                             # [L, B]
    tf_min, tf_max = _masked_min_max(tf_t, res_mask.T)
    tf_rng = tf_max - tf_min
    tf_q = jnp.floor((tf_t - tf_min[None, :]) * (NBIN_TEMP / tf_rng)[None, :]
                     + F32(0.5)).astype(I32)
    tf_q = jnp.where(res_mask.T, tf_q, 0).astype(jnp.uint8).T  # [B, L]

    mins = jnp.stack([phi_min, psi_min, om_min, ncac_min, cacn_min,
                      cnca_min], axis=-1)
    cont_fs = jnp.stack([phi_cf, psi_cf, om_cf, ncac_cf, cacn_cf, cnca_cf],
                        axis=-1)
    return dict(records=records, sc_q=sc_q, tf_q=tf_q, mins=mins,
                cont_fs=cont_fs, tf_min=tf_min, tf_cont=tf_rng / NBIN_TEMP)
