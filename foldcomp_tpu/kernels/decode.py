"""Batched FCZ decode core (device side).

One jitted function takes padded per-protein streams (packed records, header
quantizer params, side-chain codes, anchors, segment metadata) and returns
all-atom coordinates for the whole batch. Everything between the byte
streams and the atom14 coordinate tensor runs on device; host code only does
FCZ parsing and PDB text (codec/batch.py).

NeRF core selection (`nerf_impl`, default `assoc` everywhere):

- `assoc` — log-depth rigid-frame `associative_scan` composition
  (kernels/nerf_assoc.py). Wins on both backends: TPU B=512 sync decode
  30.3 ms vs 48.5 ms for the sequential sweep and 32.8 ms for the retired
  Pallas kernel; CPU 73 ms vs 80 ms. Override with FOLDCOMP_TPU_NERF=xla
  for comparison runs.
- `xla` — the 3*SEG-step sequential `lax.scan` sweep (kernels/nerf.py),
  kept as the parity oracle for tests.

Layout cores (residue-space `_decode_core_lanes`/`_decode_core_vec3` are
legacy; the production path is segment-space `decode_seg_core` — zero
device gathers, host window-expansion).

Reference pipeline parity: Foldcomp::decompress (foldcomp.cpp:779-902).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .bitpack import unpack_records
from .nerf import decode_backbone_segments_c, decode_backbone_segments_vec3
from .sidechain import place_sidechains, place_sidechains_c

F32 = jnp.float32
I32 = jnp.int32

# FixedAngleDiscretizer(255) continuize constants (discretizer.h:89-106)
_SC_CONT_F = np.float32(360.0 / 255.0)
_SC_MIN = np.float32(-180.0)

PRO_CODE = 14


@partial(jax.jit, static_argnames=("seg_width", "refine_iters", "nerf_impl",
                                   "gather_free"))
def _decode_core_lanes(records, mins, cont_fs, sc_codes, tf_codes, tf_min,
                      tf_cont, anchor_xyz, seg_start, seg_m,
                      seg_width: int, refine_iters: int = 2,
                      nerf_impl: str = "xla", gather_free: bool = False):
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
    n = b * s

    res_code, phi_q, psi_q, omega_q, ncac_q, cacn_q, cnca_q = \
        unpack_records(records)

    def cont(q, idx):
        return q.astype(F32) * cont_fs[:, idx, None] + mins[:, idx, None]

    # angle6 in the NeRF consumption order (psi, omega, phi, n_ca_c,
    # ca_c_n, c_n_ca), laid out [6, L, B] so the segment-window gather
    # runs along sublanes (L) with proteins on lanes
    angle6 = jnp.stack([cont(psi_q, 1), cont(omega_q, 2), cont(phi_q, 0),
                        cont(ncac_q, 3), cont(cacn_q, 4), cont(cnca_q, 5)],
                       axis=0)                       # [6, B, L]
    angle6 = jnp.swapaxes(angle6, 1, 2)              # [6, L, B]

    # segment record windows: idx[s*SEG+j, b] = seg_start[b, s] + j
    seg_start_t = seg_start.T                        # [S, B]
    j = jnp.arange(seg_w, dtype=I32)
    rec_idx = jnp.clip(
        seg_start_t[:, None, :] + j[None, :, None], 0, l - 1
    ).reshape(s * seg_w, b)                          # [S*SEG, B]
    seg_ang = jnp.take_along_axis(
        angle6, jnp.broadcast_to(rec_idx[None], (6, s * seg_w, b)),
        axis=1)                                      # [6, S*SEG, B]
    # -> [SEG, 6, N] with lane n = b * S + s
    seg_ang = seg_ang.reshape(6, s, seg_w, b)
    seg_ang = jnp.transpose(seg_ang, (2, 0, 3, 1)).reshape(seg_w, 6, n)

    rc_t = res_code.T                                # [L, B]
    seg_codes = jnp.take_along_axis(rc_t, rec_idx, axis=0)  # [S*SEG, B]
    seg_is_pro = jnp.transpose(
        (seg_codes == PRO_CODE).reshape(s, seg_w, b),
        (1, 2, 0)).reshape(seg_w, n)

    if nerf_impl == "assoc":
        from .nerf_assoc import decode_backbone_segments_assoc
        bx, by, bz = decode_backbone_segments_assoc(
            seg_ang, seg_is_pro, anchor_xyz, seg_m.reshape(n),
            refine_iters=refine_iters)               # each [T, N]
    else:
        bx, by, bz = decode_backbone_segments_c(
            seg_ang, seg_is_pro, anchor_xyz, seg_m.reshape(n),
            refine_iters=refine_iters,
            gather_free=gather_free)                 # each [T, N]

    # Stitch segments into the backbone: residue r belongs to the last
    # segment starting at or before r (foldcomp.cpp:849-857). Work in a
    # [S*T, B] flat layout so the gather runs along sublanes.
    t_w = 3 * seg_w
    r = jnp.arange(l, dtype=I32)
    s_of_r = jnp.sum(seg_start_t[None, :, :] <= r[:, None, None],
                     axis=1).astype(I32) - 1         # [L, B]
    s_of_r = jnp.clip(s_of_r, 0, s - 1)
    offset = r[:, None] - jnp.take_along_axis(seg_start_t, s_of_r, axis=0)
    base = s_of_r * t_w + 3 * jnp.clip(offset, 0, seg_w - 1)   # [L, B]
    atom_k = jnp.arange(3, dtype=I32)
    gidx = (base[:, None, :] + atom_k[None, :, None]).reshape(3 * l, b)
    gidx = jnp.clip(gidx, 0, s * t_w - 1)

    def stitch(comp):
        # [T, N] -> [S*T, B]: row s*T + t, lane b
        flat = jnp.transpose(comp.reshape(t_w, b, s),
                             (2, 0, 1)).reshape(s * t_w, b)
        return jnp.take_along_axis(flat, gidx, axis=0)      # [3L, B]

    bbx, bby, bbz = stitch(bx), stitch(by), stitch(bz)

    # Side chains (foldcomp.cpp:861-879) on [slot, L, B] 3-D layouts —
    # residues on sublanes (L) and proteins on lanes (B), so XLA tiles the
    # fused per-slot work instead of holding whole flat-lane temporaries
    # in VMEM
    def to_res_lanes(comp):
        # [3L, B] -> [3, L, B]
        return jnp.transpose(comp.reshape(l, 3, b), (1, 0, 2))

    rx, ry, rz = to_res_lanes(bbx), to_res_lanes(bby), to_res_lanes(bbz)
    codes_lb = rc_t                                  # [L, B]
    sc_t = jnp.transpose(sc_codes, (2, 1, 0))        # [11, L, B]
    sc_torsions = sc_t.astype(F32) * _SC_CONT_F + _SC_MIN

    sx, sy, sz = place_sidechains_c(rx, ry, rz, codes_lb, sc_torsions,
                                    gather_free=gather_free)

    # assemble [B, L, 14, 3] with one transpose
    atom14 = jnp.stack([sx, sy, sz], axis=-1)        # [14, L, B, 3]
    atom14 = jnp.transpose(atom14, (2, 1, 0, 3))

    # tempFactors (foldcomp.cpp:884-891)
    temp = tf_codes.astype(F32) * tf_cont[:, None] + tf_min[:, None]

    return atom14, res_code, temp


@partial(jax.jit, static_argnames=("seg_width", "refine_iters"))
def _decode_core_vec3(records, mins, cont_fs, sc_codes, tf_codes, tf_min,
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

    blended = decode_backbone_segments_vec3(seg_angles, seg_is_pro, anchor_xyz,
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


@partial(jax.jit, static_argnames=("refine_iters", "nerf_impl",
                                   "gather_free", "compact", "sc_impl"))
def decode_seg_core(seg_records, mins_lane, cont_lane, sc_codes_seg,
                    anchor_xyz, seg_m, refine_iters: int = 2,
                    nerf_impl: str = "xla", gather_free: bool = True,
                    compact: bool = False, sc_impl: str | None = None,
                    res_index=None):
    """Segment-space decode: ZERO device gathers.

    The round-2 TPU profile showed the device time of the residue-space
    core was dominated by two take_along_axis passes — the segment-window
    gather in prep (15.6 ms sustained at B=512) and the stitch
    (17.8 ms) — while the NeRF scans cost 4.9 ms and side chains 7.2 ms.
    Here the host packer window-expands the byte records into segment
    space (a cheap numpy fancy-index; the windows overlap by one record),
    the entire device pipeline stays in segment space, and the residue
    re-index ("stitch") happens on host while formatting. Everything on
    device is elementwise + the scans.

    seg_records: u8  [SEG, N, 8]  window-expanded records (lane n = b*S+s)
    mins_lane:   f32 [N, 6]; cont_lane: f32 [N, 6] (per-lane broadcast)
    sc_codes_seg:u8  [11, SEG, N] side-chain codes in segment space
    anchor_xyz:  f32 [B, S+1, 3, 3]
    seg_m:       i32 [N] record count per segment
    Returns atom14_seg f32 [N, SEG, 14, 3].
    """
    seg, n, _ = seg_records.shape
    res_code, phi_q, psi_q, omega_q, ncac_q, cacn_q, cnca_q = \
        unpack_records(seg_records)                  # each [SEG, N]

    def cont(q, idx):
        return q.astype(F32) * cont_lane[None, :, idx] \
            + mins_lane[None, :, idx]

    seg_ang = jnp.stack(
        [cont(psi_q, 1), cont(omega_q, 2), cont(phi_q, 0),
         cont(ncac_q, 3), cont(cacn_q, 4), cont(cnca_q, 5)],
        axis=1)                                      # [SEG, 6, N]
    seg_is_pro = res_code == PRO_CODE

    if nerf_impl == "assoc":
        from .nerf_assoc import decode_backbone_segments_assoc
        bx, by, bz = decode_backbone_segments_assoc(
            seg_ang, seg_is_pro, anchor_xyz, seg_m,
            refine_iters=refine_iters)
    else:
        bx, by, bz = decode_backbone_segments_c(
            seg_ang, seg_is_pro, anchor_xyz, seg_m,
            refine_iters=refine_iters, gather_free=gather_free)

    # [T=3*SEG, N] atom rows -> [3, SEG, N] residue-major backbone
    rx = jnp.transpose(bx.reshape(seg, 3, n), (1, 0, 2))
    ry = jnp.transpose(by.reshape(seg, 3, n), (1, 0, 2))
    rz = jnp.transpose(bz.reshape(seg, 3, n), (1, 0, 2))

    sc_torsions = sc_codes_seg.astype(F32) * _SC_CONT_F + _SC_MIN
    if sc_impl is None:
        sc_impl = "select" if gather_free else "gather"
    if sc_impl == "onehot":
        # TPU: one-hot MXU table lookups + distinct-value select chains —
        # bit-identical to the select form and 2.4x faster (the gathered
        # per-lane tables + stride-42 slices were ~5 of the 6.5 ms decode;
        # PROFILE.md, tools/exp_sc3.py)
        from .sidechain import place_sidechains_onehot_c
        sx, sy, sz = place_sidechains_onehot_c(rx, ry, rz, res_code,
                                               sc_torsions)
    else:
        sx, sy, sz = place_sidechains_c(rx, ry, rz, res_code, sc_torsions,
                                        gather_free=sc_impl == "select")

    if res_index is not None and compact:
        # Residue-space stitch ON DEVICE, PLANAR form: gather each
        # component plane [14, SEG*N] along its LANE axis and keep the
        # [3, 14, R] layout on the wire. The earlier [R, 14, 3] form paid
        # ~1.8 ms/dispatch at B=512 for the stack(axis=-1)+transpose that
        # put a 3-wide axis in the 128-lane minor dimension; planar keeps
        # R in lanes end-to-end (6.4 -> 5.7 ms measured, bit-identical).
        # D2H ships ONLY real residues either way; the host reconstruct
        # transposes once per protein while materializing f32 coords
        # (codec/batch.py _gather_a14).
        seg_pad = seg
        planar_idx = (res_index % seg_pad) * n + res_index // seg_pad
        sel = [jnp.take(s.reshape(14, seg_pad * n), planar_idx, axis=1)
               for s in (sx, sy, sz)]                # 3 x [14, R]
        ca = jnp.stack([s[1] for s in sel], axis=0)  # [3, R]
        off = jnp.stack(sel, axis=0) - ca[:, None, :]
        off = jnp.clip(jnp.round(off * F32(1000.0)), -32767.0,
                       32767.0).astype(jnp.int16)
        return off, ca                               # [3,14,R], [3,R]

    atom14 = jnp.stack([sx, sy, sz], axis=-1)        # [14, SEG, N, 3]
    atom14 = jnp.transpose(atom14, (2, 1, 0, 3))     # [N, SEG, 14, 3]
    if res_index is not None:
        # non-compact residue-space debug form (FOLDCOMP_TPU_COMPACT=0)
        return jnp.take(atom14.reshape(-1, 14, 3), res_index, axis=0)
    if not compact:
        return atom14
    # Compact D2H form: CA in f32 + per-atom int16 millangstrom offsets
    # from CA (every placed atom is within ~8 A of its CA; int16 mm spans
    # +-32.7 A). 96 B/record instead of 168 — the axon tunnel's host<->
    # device bandwidth bounds e2e throughput, not device compute. The
    # +-0.5 mm quantization is 160x below the format's own ~0.08 A
    # reconstruction error.
    ca = atom14[:, :, 1]                             # [N, SEG, 3]
    off = (atom14 - ca[:, :, None, :]) * F32(1000.0)
    off = jnp.clip(jnp.round(off), -32767.0, 32767.0).astype(jnp.int16)
    return off, ca


def decode_seg_batch_core(seg_records, mins_lane, cont_lane, sc_codes_seg,
                          anchor_xyz, seg_m, refine_iters: int = 2,
                          res_index=None):
    """Backend-dispatched segment-space decode (see decode_seg_core).

    Returns atom14_seg f32 [N, SEG, 14, 3], or on accelerator backends
    the compact (off_i16, ca_f32) pair (codec/batch.py reconstructs the
    coordinates on host; FOLDCOMP_TPU_COMPACT=0 disables). When
    `res_index` is given the accelerator output is residue-space
    ([R, ...] — stitched on device, only real residues transferred)."""
    import os

    import jax

    backend = jax.default_backend()
    nerf_impl = os.environ.get("FOLDCOMP_TPU_NERF", "assoc")
    if backend == "cpu":
        return decode_seg_core(seg_records, mins_lane, cont_lane,
                               sc_codes_seg, anchor_xyz, seg_m,
                               refine_iters=refine_iters,
                               nerf_impl=nerf_impl,
                               gather_free=False)
    # NOTE: the fused Pallas pipeline (kernels/pallas_decode.py) consumes
    # the RAGGED-lane pack (codec/batch.py pack_decode_batch_lanes) and is
    # dispatched by codec/batch._seg_decode_arrays; this function serves
    # the [B, S]-grid pack for the XLA cores.
    compact = os.environ.get("FOLDCOMP_TPU_COMPACT", "1") != "0"
    return decode_seg_core(seg_records, mins_lane, cont_lane, sc_codes_seg,
                           anchor_xyz, seg_m, refine_iters=refine_iters,
                           nerf_impl=nerf_impl, gather_free=True,
                           compact=compact, sc_impl="onehot",
                           res_index=res_index)


def decode_batch_core(records, mins, cont_fs, sc_codes, tf_codes, tf_min,
                      tf_cont, anchor_xyz, seg_start, seg_m,
                      seg_width: int, refine_iters: int = 2):
    """Backend-dispatched batched decode (same contract as the cores).

    The lanes-last component form is ~3x faster on CPU; XLA's TPU backend
    currently compiles and runs the vec3 form ~2.4x faster (axis-0 gathers
    dominate the component form there). Both produce quantization-level
    identical output.
    """
    import os

    import jax

    backend = jax.default_backend()
    nerf_impl = os.environ.get("FOLDCOMP_TPU_NERF", "assoc")
    if backend == "cpu":
        # CPU: component layout with real gathers (take_along_axis is
        # cheap there; the select-chain/sweep forms cost ~2x)
        return _decode_core_lanes(records, mins, cont_fs, sc_codes,
                                  tf_codes, tf_min, tf_cont, anchor_xyz,
                                  seg_start, seg_m, seg_width=seg_width,
                                  refine_iters=refine_iters,
                                  nerf_impl=nerf_impl)
    if os.environ.get("FOLDCOMP_TPU_VEC3"):
        # legacy [..., 3]-vector core (1.40M res/s on v5e), kept for
        # comparison runs
        return _decode_core_vec3(records, mins, cont_fs, sc_codes,
                                 tf_codes, tf_min, tf_cont, anchor_xyz,
                                 seg_start, seg_m, seg_width=seg_width,
                                 refine_iters=refine_iters)
    # TPU default: gather-free component form — the reverse pass as a
    # static descending-row sweep and side-chain predecessors as select
    # chains (2.26M res/s on v5e vs 1.40M vec3 / 0.50M gather form)
    return _decode_core_lanes(records, mins, cont_fs, sc_codes, tf_codes,
                              tf_min, tf_cont, anchor_xyz, seg_start, seg_m,
                              seg_width=seg_width, nerf_impl=nerf_impl,
                              refine_iters=refine_iters, gather_free=True)
