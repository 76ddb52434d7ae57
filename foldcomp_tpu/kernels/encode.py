"""Batched FCZ encode core (device side).

One jitted function turns padded batches of structures (backbone + atom14
coordinates, residue codes, CA temp factors, residue masks) into quantized
FCZ streams: packed 8-byte records, side-chain codes, tempFactor codes, and
the per-protein quantizer headers. Pipeline parity: Foldcomp::preprocess +
compress (foldcomp.cpp:450-606), restructured from per-residue scalar loops
into masked array ops over [B, L] lanes.

Quantization here is plain float32 (the exact path in codec/encoder.py
reproduces the reference's f32/f64 promotion mix bit-for-bit); bins can
differ from the reference only when a value lands within ~1 ulp of a bin
boundary.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .bitpack import pack_records
from .geometry import bond_angle, dihedral
from .sidechain import extract_sidechain_torsions

F32 = jnp.float32
I32 = jnp.int32

NBIN_PHI_PSI = F32(2 ** 12 - 1)
NBIN_OMEGA = F32(2 ** 11 - 1)
NBIN_BOND = F32(2 ** 8 - 1)
NBIN_TEMP = F32(2 ** 8 - 1)

# FixedAngleDiscretizer(255) (discretizer.h:89-106), truncating scalar path
_SC_DISC_F = F32(255.0 / 360.0)

_BIG = F32(3.4e38)


def _masked_min_max(v, mask):
    vmin = jnp.min(jnp.where(mask, v, _BIG), axis=-1)
    vmax = jnp.max(jnp.where(mask, v, -_BIG), axis=-1)
    return vmin, vmax


def _quantize_round(v, vmin, disc_f):
    """Vector discretize parity (discretizer.cpp:43-53): floor(x + 0.5)."""
    t = (v - vmin[:, None]) * disc_f[:, None]
    return jnp.floor(t + F32(0.5)).astype(I32)


@partial(jax.jit, static_argnames=())
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
    flat = bb.reshape(b, 3 * l, 3)

    # Backbone torsions (foldcomp.cpp:484-492): dihedral over every
    # consecutive 4-tuple; stream order (psi, omega, phi)
    tors = dihedral(flat[:, :-3], flat[:, 1:-2], flat[:, 2:-1], flat[:, 3:])
    psi = tors[:, 0::3]
    omega = tors[:, 1::3]
    phi = tors[:, 2::3]

    # Bond angles (nerf.cpp:495-508; stream split foldcomp.cpp:497-505)
    angs = bond_angle(flat[:, :-2], flat[:, 1:-1], flat[:, 2:])
    ca_c_n = angs[:, 1::3]
    c_n_ca = angs[:, 2::3]
    n_ca_c = angs[:, 3::3]

    n_res = jnp.sum(res_mask.astype(I32), axis=-1)          # [B]
    i = jnp.arange(l - 1, dtype=I32)
    amask = i[None, :] < (n_res[:, None] - 1)               # angle stream mask

    def quant_stream(v, nbin):
        vmin, vmax = _masked_min_max(v, amask[:, :v.shape[1]])
        rng = vmax - vmin
        disc_f = nbin / rng
        cont_f = rng / nbin
        q = _quantize_round(v, vmin, disc_f)
        return q, vmin, cont_f

    phi_q, phi_min, phi_cf = quant_stream(phi, NBIN_PHI_PSI)
    psi_q, psi_min, psi_cf = quant_stream(psi, NBIN_PHI_PSI)
    om_q, om_min, om_cf = quant_stream(omega, NBIN_OMEGA)
    ncac_q, ncac_min, ncac_cf = quant_stream(n_ca_c, NBIN_BOND)
    cacn_q, cacn_min, cacn_cf = quant_stream(ca_c_n, NBIN_BOND)
    cnca_q, cnca_min, cnca_cf = quant_stream(c_n_ca, NBIN_BOND)

    # Per-residue records; the last residue stores zeros for all 6 fields
    # (foldcomp.cpp:595-601). Angle stream i belongs to residue i.
    def to_l(q, width):
        q = jnp.pad(q, ((0, 0), (0, l - q.shape[1])))
        return jnp.where(amask_l, q, 0)

    amask_l = jnp.arange(l, dtype=I32)[None, :] < (n_res[:, None] - 1)
    records = pack_records(
        jnp.where(res_mask, res_code, 0),
        to_l(phi_q, 12), to_l(psi_q, 12), to_l(om_q, 11),
        to_l(ncac_q, 8), to_l(cacn_q, 8), to_l(cnca_q, 8))

    # Side chains: fixed [-180, 180] truncating quantizer
    # (foldcomp.cpp:532-538 -> discretizer.cpp:55-57)
    sc_ang = extract_sidechain_torsions(atom14, res_code)   # [B, L, 11]
    sc_q = ((sc_ang + F32(180.0)) * _SC_DISC_F).astype(I32)
    sc_q = jnp.clip(sc_q, 0, 255).astype(jnp.uint8)

    # tempFactors: per-protein rounding quantizer (foldcomp.cpp:543-550)
    tf_min, tf_max = _masked_min_max(tf_ca, res_mask)
    tf_rng = tf_max - tf_min
    tf_q = _quantize_round(tf_ca, tf_min, NBIN_TEMP / tf_rng)
    tf_q = jnp.where(res_mask, tf_q, 0).astype(jnp.uint8)

    mins = jnp.stack([phi_min, psi_min, om_min, ncac_min, cacn_min,
                      cnca_min], axis=-1)
    cont_fs = jnp.stack([phi_cf, psi_cf, om_cf, ncac_cf, cacn_cf, cnca_cf],
                        axis=-1)
    return dict(records=records, sc_q=sc_q, tf_q=tf_q, mins=mins,
                cont_fs=cont_fs, tf_min=tf_min, tf_cont=tf_rng / NBIN_TEMP)
