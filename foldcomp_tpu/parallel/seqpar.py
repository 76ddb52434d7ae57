"""Sequence-parallel backbone feature extraction (halo-exchange SP).

The codec's per-protein work normally fits one chip, but extraction of
backbone internal coordinates is a sliding-window computation over the
atom sequence (4-atom dihedral windows, 3-atom angle windows), which for
very long chains (titin ~35k residues -> 105k atoms) or fused
many-protein streams can be sharded across devices along the SEQUENCE
axis: each shard computes the windows that start in its slice and fetches
a 3-atom halo from its right neighbor with one `jax.lax.ppermute` over the
ICI ring — the sequence-parallel analog of the reference's anchor
segmentation (SURVEY.md section 2, SP row).

Used by __graft_entry__.dryrun_multichip's 2-D (data x seq) mesh step and
testable on a virtual CPU mesh.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..kernels.geometry import bond_angle_c, dihedral_c

F32 = jnp.float32


def _halo_right(x, axis_name: str, n: int = 3):
    """First n rows of the RIGHT neighbor's shard (wraps at the end; the
    wrapped values feed windows that are masked off by the caller)."""
    size = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    del idx
    perm = [(int((i + 1) % size), int(i)) for i in range(int(size))]
    return jax.lax.ppermute(x[:n], axis_name, perm)


def sharded_backbone_features(mesh: Mesh, flat_x, flat_y, flat_z,
                              axis_name: str = "seq"):
    """Dihedrals + bond angles of a [T]-atom backbone sharded over `seq`.

    flat_*: f32 [T] coordinate components, T divisible by the mesh axis
    size. Returns (torsions [T], angles [T]) where entry i is the window
    starting/centered at atom i (the final 3 / first+last entries are
    zero-masked, matching the unsharded stream lengths T-3 and T-2).
    """
    def shard_fn(x, y, z):
        hx = _halo_right(x, axis_name)
        hy = _halo_right(y, axis_name)
        hz = _halo_right(z, axis_name)
        ex = jnp.concatenate([x, hx])
        ey = jnp.concatenate([y, hy])
        ez = jnp.concatenate([z, hz])
        k = x.shape[0]
        tors = dihedral_c(ex[:k], ey[:k], ez[:k],
                          ex[1:k + 1], ey[1:k + 1], ez[1:k + 1],
                          ex[2:k + 2], ey[2:k + 2], ez[2:k + 2],
                          ex[3:k + 3], ey[3:k + 3], ez[3:k + 3])
        angs = bond_angle_c(ex[:k], ey[:k], ez[:k],
                            ex[1:k + 1], ey[1:k + 1], ez[1:k + 1],
                            ex[2:k + 2], ey[2:k + 2], ez[2:k + 2])
        return tors, angs

    mapped = jax.shard_map(shard_fn, mesh=mesh,
                           in_specs=(P(axis_name),) * 3,
                           out_specs=(P(axis_name), P(axis_name)))
    tors, angs = jax.jit(mapped)(flat_x, flat_y, flat_z)
    t = flat_x.shape[0]
    i = jnp.arange(t)
    tors = jnp.where(i < t - 3, tors, 0.0)
    angs = jnp.where(i < t - 2, angs, 0.0)
    return tors, angs


def reference_backbone_features(flat_x, flat_y, flat_z):
    """Unsharded twin of sharded_backbone_features for validation."""
    t = flat_x.shape[0]
    tors = dihedral_c(flat_x[:-3], flat_y[:-3], flat_z[:-3],
                      flat_x[1:-2], flat_y[1:-2], flat_z[1:-2],
                      flat_x[2:-1], flat_y[2:-1], flat_z[2:-1],
                      flat_x[3:], flat_y[3:], flat_z[3:])
    angs = bond_angle_c(flat_x[:-2], flat_y[:-2], flat_z[:-2],
                        flat_x[1:-1], flat_y[1:-1], flat_z[1:-1],
                        flat_x[2:], flat_y[2:], flat_z[2:])
    return (jnp.pad(tors, (0, 3)), jnp.pad(angs, (0, 2)))
