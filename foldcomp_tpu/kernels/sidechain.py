"""Batched side-chain torsion extraction and reconstruction.

The reference walks a string-keyed per-AA dependency graph atom by atom
(sidechain.cpp:149-180, nerf.cpp:106-160). Here the chemistry lives in dense
[NUM_CODES, 14] tensors (core/aatable.py) and every residue of every protein
is an independent lane: atom slot k >= 3 is placed from predecessor slots
PRED_IDX[code, k] with ideal geometry and the decoded torsion, in a static
11-step loop (TRP depth) over the slot axis — gathers + masking instead of
per-residue control flow.

Atom14 layout: slot order is the reference table order (N, CA, C, O, CB, ...),
so side-chain torsion j maps to slot 3 + j.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.aatable import (BOND_ANG, BOND_LEN, MAX_ATOM, N_ATOMS, PRED_IDX)
from .geometry import dihedral, place_atom

F32 = jnp.float32
I32 = jnp.int32

# kept as host numpy so importing this module never initializes a backend;
# they become compile-time constants inside jit
_PRED_IDX = np.asarray(PRED_IDX, np.int32)      # [24, 14, 3]
_BOND_LEN = np.asarray(BOND_LEN, np.float32)    # [24, 14]
_BOND_ANG = np.asarray(BOND_ANG, np.float32)    # [24, 14]
_N_ATOMS = np.asarray(N_ATOMS, np.int32)        # [24]


def _gather_slot(atom14, slot_idx):
    """atom14 [..., 14, 3] gathered at per-lane slot indices [...] -> [..., 3]."""
    return jnp.take_along_axis(atom14, slot_idx[..., None, None], axis=-2)[..., 0, :]


def place_sidechains(bb, res_code, sc_torsions):
    """Reconstruct all non-backbone atoms (reconstructAminoAcid, nerf.cpp:106).

    bb:          f32 [..., 3, 3] decoded backbone N/CA/C per residue
    res_code:    i32 [...] 5-bit residue codes
    sc_torsions: f32 [..., 11] continuized side-chain torsions (slot 3+j)
    Returns atom14 coords f32 [..., 14, 3] (invalid slots hold garbage; mask
    with slot < N_ATOMS[res_code]).
    """
    code = jnp.clip(res_code, 0, 23)
    batch_shape = code.shape
    atom14 = jnp.zeros(batch_shape + (MAX_ATOM, 3), F32)
    atom14 = atom14.at[..., :3, :].set(bb)

    preds = jnp.asarray(_PRED_IDX)[code]     # [..., 14, 3]
    bls = jnp.asarray(_BOND_LEN)[code]       # [..., 14]
    bas = jnp.asarray(_BOND_ANG)[code]       # [..., 14]

    for k in range(3, MAX_ATOM):
        p = preds[..., k, :]
        a = _gather_slot(atom14, p[..., 0])
        b = _gather_slot(atom14, p[..., 1])
        c = _gather_slot(atom14, p[..., 2])
        xyz = place_atom(a, b, c, bls[..., k], bas[..., k],
                         sc_torsions[..., k - 3])
        atom14 = atom14.at[..., k, :].set(xyz)
    return atom14


def place_sidechains_c(bbx, bby, bbz, res_code, sc_torsions,
                       gather_free: bool = False):
    """Lanes-last side-chain reconstruction.

    bbx/bby/bbz: f32 [3, *batch] backbone N/CA/C components; *batch is any
                 residue-lane shape (e.g. [L, B] — keep it 2-D so XLA can
                 tile the fused elementwise work instead of stack-allocating
                 the whole flat lane axis in VMEM)
    res_code:    i32 [*batch]
    sc_torsions: f32 [11, *batch]
    gather_free: predecessor lookups as where-select chains instead of
                 take_along_axis — per-lane gathers are the dominant TPU
                 cost, while CPU prefers real gathers (decode dispatches)
    Returns (sx, sy, sz), each f32 [14, *batch] — all atom slots.
    """
    from .geometry import place_atom_c

    code = jnp.clip(res_code, 0, 23)
    preds = jnp.asarray(_PRED_IDX)[code]     # [*batch, 14, 3]
    bls = jnp.asarray(_BOND_LEN)[code]       # [*batch, 14]
    bas = jnp.asarray(_BOND_ANG)[code]       # [*batch, 14]

    # slot rows as Python lists; predecessor slots are always LOWER than
    # the placed slot
    rows_x = [bbx[0], bbx[1], bbx[2]]
    rows_y = [bby[0], bby[1], bby[2]]
    rows_z = [bbz[0], bbz[1], bbz[2]]

    if gather_free:
        def sel(rows, idx):
            acc = rows[0]
            for kk in range(1, len(rows)):
                acc = jnp.where(idx == kk, rows[kk], acc)
            return acc
    else:
        def sel(rows, idx):
            arr = jnp.stack(rows, axis=0)
            return jnp.take_along_axis(arr, idx[None], axis=0)[0]

    for k in range(3, MAX_ATOM):
        p0 = preds[..., k, 0]
        p1 = preds[..., k, 1]
        p2 = preds[..., k, 2]
        ox, oy, oz = place_atom_c(
            sel(rows_x, p0), sel(rows_y, p0), sel(rows_z, p0),
            sel(rows_x, p1), sel(rows_y, p1), sel(rows_z, p1),
            sel(rows_x, p2), sel(rows_y, p2), sel(rows_z, p2),
            bls[..., k], bas[..., k], sc_torsions[k - 3])
        rows_x.append(ox)
        rows_y.append(oy)
        rows_z.append(oz)
    return (jnp.stack(rows_x, axis=0), jnp.stack(rows_y, axis=0),
            jnp.stack(rows_z, axis=0))


def place_sidechains_onehot_c(bbx, bby, bbz, res_code, sc_torsions):
    """TPU-native side-chain reconstruction: one-hot MXU table lookups +
    distinct-value select chains.

    The gather_free form of place_sidechains_c materializes per-lane
    gathered tables ([*batch, 14, 3] preds + [*batch, 14] lens/angles)
    and slices them 55 times along a stride-42 minor axis — measured at
    ~5-6.5 ms of the ~7 ms B=512 decode on a v5e (PROFILE.md). Here:

    - ALL per-slot constants (3 predecessor slots + bond length + bond
      angle per slot) come from ONE [24, 55] table contracted against the
      residue one-hot [24, *batch] on the MXU (Precision.HIGHEST: the
      bf16x3 passes reconstruct exact f32 for one-hot operands, and the
      parity tests pin it).
    - Predecessor row selection iterates only the DISTINCT slot values in
      each table column (numpy constants at trace time): the chemistry
      tables are sparse — 150 where-ops total instead of 693.

    Same contract as place_sidechains_c: bb components [3, *batch],
    res_code [*batch], sc_torsions [11, *batch] -> 3x [14, *batch].
    """
    import jax

    from .geometry import place_atom_c

    code = jnp.clip(res_code, 0, 23)
    onehot = (code[None] == jnp.arange(24, dtype=code.dtype)
              .reshape((24,) + (1,) * code.ndim)).astype(F32)

    cols = []
    for k in range(3, MAX_ATOM):
        cols += [_PRED_IDX[:, k, 0], _PRED_IDX[:, k, 1],
                 _PRED_IDX[:, k, 2], _BOND_LEN[:, k], _BOND_ANG[:, k]]
    tab = jnp.asarray(np.stack(cols, axis=1).astype(np.float32))
    vals = jnp.einsum("cm,c...->m...", tab, onehot,
                      precision=jax.lax.Precision.HIGHEST)

    rows_x = [bbx[0], bbx[1], bbx[2]]
    rows_y = [bby[0], bby[1], bby[2]]
    rows_z = [bbz[0], bbz[1], bbz[2]]

    def sel(rows, idxf, col):
        dv = np.unique(col)
        acc = rows[int(dv[0])]
        for v in dv[1:]:
            acc = jnp.where(idxf == F32(v), rows[int(v)], acc)
        return acc

    for k in range(3, MAX_ATOM):
        m = 5 * (k - 3)
        p0f, p1f, p2f = vals[m], vals[m + 1], vals[m + 2]
        bl, ba = vals[m + 3], vals[m + 4]
        c0 = _PRED_IDX[:, k, 0]
        c1 = _PRED_IDX[:, k, 1]
        c2 = _PRED_IDX[:, k, 2]
        ox, oy, oz = place_atom_c(
            sel(rows_x, p0f, c0), sel(rows_y, p0f, c0),
            sel(rows_z, p0f, c0),
            sel(rows_x, p1f, c1), sel(rows_y, p1f, c1),
            sel(rows_z, p1f, c1),
            sel(rows_x, p2f, c2), sel(rows_y, p2f, c2),
            sel(rows_z, p2f, c2),
            bl, ba, sc_torsions[k - 3])
        rows_x.append(ox)
        rows_y.append(oy)
        rows_z.append(oz)
    return (jnp.stack(rows_x, axis=0), jnp.stack(rows_y, axis=0),
            jnp.stack(rows_z, axis=0))


def extract_sidechain_torsions(atom14, res_code):
    """Per-residue side-chain dihedrals over the AA dependency graph.

    atom14:   f32 [..., 14, 3] input atoms in table slots (missing atoms must
              be zeroed — findFirstAtomCoords parity, sidechain.cpp:140-147)
    res_code: i32 [...]
    Returns f32 [..., 11] dihedrals for slots 3..13 (mask with N_SC_TORSION).

    Parity: calculateSideChainTorsionAnglesPerResidue (sidechain.cpp:149-180).
    """
    code = jnp.clip(res_code, 0, 23)
    preds = jnp.asarray(_PRED_IDX)[code]             # [..., 14, 3]
    sc = []
    for k in range(3, MAX_ATOM):
        p = preds[..., k, :]
        p0 = _gather_slot(atom14, p[..., 0])
        p1 = _gather_slot(atom14, p[..., 1])
        p2 = _gather_slot(atom14, p[..., 2])
        p3 = atom14[..., k, :]
        sc.append(dihedral(p0, p1, p2, p3))
    return jnp.stack(sc, axis=-1)


def atom_mask(res_code):
    """bool [..., 14]: slot exists for this residue code."""
    code = jnp.clip(res_code, 0, 23)
    n = jnp.asarray(_N_ATOMS)[code]
    slots = jnp.arange(MAX_ATOM, dtype=I32)
    return slots < n[..., None]
