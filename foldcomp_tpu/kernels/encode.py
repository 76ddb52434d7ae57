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
    deg = F32(57.29577951308232)
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
        ang = jnp.arccos(jnp.clip(cos_t, -1.0, 1.0)) * deg
        nan_like = bad | (jnp.abs(cos_t) > 1.0)
        ang = jnp.where(nan_like,
                        jnp.where(cos_t < 0, F32(180.0), F32(0.0)), ang)
        ang = jnp.where(det < 0, -ang, ang)
        t = (ang + F32(180.0)) * _SC_DISC_F
        t = jnp.where(jnp.isnan(t) | (t < 0), F32(0.0), t)
        q = jnp.clip(t.astype(I32), 0, 255).astype(jnp.uint8)
        amp = jax.lax.rsqrt(jnp.maximum(F32(1.0) - cos_t * cos_t,
                                        F32(1e-12)))
        tol = _SC_DISC_F * deg * F32(1e-6) * (F32(1.0) + amp) + F32(2e-4)
        dist = jnp.abs(t - jnp.round(t))
        flags.append(((dist < tol) | nan_like).astype(jnp.uint8))
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
