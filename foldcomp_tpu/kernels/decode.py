"""Batched FCZ decode core (device side).

One jitted function takes padded per-protein streams (packed records, header
quantizer params, side-chain codes, anchors, segment metadata) and returns
all-atom coordinates for the whole batch. Everything between the byte
streams and the atom14 coordinate tensor runs on device; host code only does
FCZ parsing and PDB text (codec/batch.py).

Reference pipeline parity: Foldcomp::decompress (foldcomp.cpp:779-902).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .bitpack import unpack_records
from .nerf import decode_backbone_segments
from .sidechain import place_sidechains

F32 = jnp.float32
I32 = jnp.int32

# FixedAngleDiscretizer(255) continuize constants (discretizer.h:89-106)
_SC_CONT_F = F32(360.0 / 255.0)
_SC_MIN = F32(-180.0)

PRO_CODE = 14


@partial(jax.jit, static_argnames=("seg_width", "refine_iters"))
def decode_batch_core(records, mins, cont_fs, sc_codes, tf_codes, tf_min,
                      tf_cont, anchor_xyz, seg_start, seg_m,
                      seg_width: int, refine_iters: int = 2):
    """Decode a padded batch of FCZ payloads to atom14 coordinates.

    records:    u8  [B, L, 8]   packed BackboneChain records
    mins:       f32 [B, 6]      header quantizer mins (phi, psi, omega,
                                n_ca_c, ca_c_n, c_n_ca)
    cont_fs:    f32 [B, 6]      header quantizer continuize factors
    sc_codes:   u8  [B, L, 11]  side-chain torsion codes laid out per residue
    tf_codes:   u8  [B, L]      tempFactor codes
    tf_min:     f32 [B]         tempFactor quantizer min
    tf_cont:    f32 [B]         tempFactor quantizer factor
    anchor_xyz: f32 [B, S+1, 3, 3] stored anchor N/CA/C coords
    seg_start:  i32 [B, S]      first residue of each segment (pad: >= L)
    seg_m:      i32 [B, S]      record count per segment (pad: 1)
    seg_width:  static; max records per segment (SEG)

    Returns (atom14 f32 [B, L, 14, 3], res_code i32 [B, L],
             temp_factor f32 [B, L]).
    """
    b, l, _ = records.shape
    s = seg_start.shape[1]
    seg_w = seg_width

    res_code, phi_q, psi_q, omega_q, ncac_q, cacn_q, cnca_q = \
        unpack_records(records)

    def cont(q, idx):
        return q.astype(F32) * cont_fs[:, idx, None] + mins[:, idx, None]

    # angle6 layout the NeRF kernel consumes: psi, omega, phi, n_ca_c,
    # ca_c_n, c_n_ca (continuize order foldcomp.cpp:784-805)
    angle6 = jnp.stack([cont(psi_q, 1), cont(omega_q, 2), cont(phi_q, 0),
                        cont(ncac_q, 3), cont(cacn_q, 4), cont(cnca_q, 5)],
                       axis=-1)

    # Per-segment record windows
    j = jnp.arange(seg_w, dtype=I32)
    rec_idx = jnp.clip(seg_start[..., None] + j, 0, l - 1)      # [B, S, SEG]
    flat_idx = rec_idx.reshape(b, s * seg_w)
    seg_angles = jnp.take_along_axis(
        angle6, flat_idx[..., None], axis=1).reshape(b, s, seg_w, 6)
    seg_codes = jnp.take_along_axis(res_code, flat_idx, axis=1)
    seg_is_pro = (seg_codes == PRO_CODE).reshape(b, s, seg_w)

    blended = decode_backbone_segments(seg_angles, seg_is_pro, anchor_xyz,
                                       seg_m, refine_iters=refine_iters)

    # Stitch segments into the [B, L, 3, 3] backbone: residue r belongs to
    # the last segment starting at or before r; non-final segments therefore
    # contribute exactly their first 3*(m-1) atoms (foldcomp.cpp:849-857).
    r = jnp.arange(l, dtype=I32)
    s_of_r = jnp.sum(seg_start[:, None, :] <= r[None, :, None],
                     axis=-1).astype(I32) - 1
    s_of_r = jnp.clip(s_of_r, 0, s - 1)
    offset = r[None, :] - jnp.take_along_axis(seg_start, s_of_r, axis=1)
    base = s_of_r * (3 * seg_w) + 3 * jnp.clip(offset, 0, seg_w - 1)
    atom_k = jnp.arange(3, dtype=I32)
    gidx = (base[..., None] + atom_k).reshape(b, 3 * l)
    flat_blend = blended.reshape(b, s * 3 * seg_w, 3)
    bb = jnp.take_along_axis(
        flat_blend, jnp.clip(gidx, 0, s * 3 * seg_w - 1)[..., None],
        axis=1).reshape(b, l, 3, 3)

    # Side chains (foldcomp.cpp:861-879); fixed [-180, 180] 255-bin
    # continuize (foldcomp.cpp:350-369)
    sc_torsions = sc_codes.astype(F32) * _SC_CONT_F + _SC_MIN
    atom14 = place_sidechains(bb, res_code, sc_torsions)

    # tempFactors (foldcomp.cpp:884-891)
    temp = tf_codes.astype(F32) * tf_cont[:, None] + tf_min[:, None]

    return atom14, res_code, temp
