"""Batched float32 geometry kernels (JAX, TPU-first).

These are the device twins of foldcomp_tpu.core.exact: the same math as the
reference's float3d.h / torsion_angle.cpp / nerf.cpp primitives, but expressed
as pure float32 array ops over arbitrary leading batch dimensions so XLA can
tile them onto the VPU. They trade the exact path's mixed f32/f64 promotion
games for plain f32 — deviations are ~1 ulp, far below the quantization step
of every FCZ stream (12-bit angles over a per-protein range).

Reference parity targets:
  dihedral       <- getTorsionFromXYZ (torsion_angle.cpp:46-96)
  bond_angle     <- float3d angle (float3d.h:55-65)
  place_atom     <- Nerf::place_atom (nerf.cpp:39-104)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

F32 = jnp.float32
_DEG = 180.0 / jnp.pi
_RAD = jnp.pi / 180.0
_EPS = 1e-30


def cross(a, b):
    """3-vector cross product over the last axis (float3d.h:19-24)."""
    ax, ay, az = a[..., 0], a[..., 1], a[..., 2]
    bx, by, bz = b[..., 0], b[..., 1], b[..., 2]
    return jnp.stack([ay * bz - by * az,
                      az * bx - bz * ax,
                      ax * by - bx * ay], axis=-1)


def dot3(a, b):
    return (a[..., 0] * b[..., 0] + a[..., 1] * b[..., 1]
            + a[..., 2] * b[..., 2])


def dihedral(p0, p1, p2, p3):
    """Batched dihedral in degrees (getTorsionFromXYZ, torsion_angle.cpp:46-96).

    Degenerate inputs (zero-length normals) map to 0 / 180 like the reference
    NaN guard (torsion_angle.cpp:74-79).
    """
    d1 = p1 - p0
    d2 = p2 - p1
    d3 = p3 - p2
    u1 = cross(d1, d2)
    u2 = cross(d2, d3)
    inner = dot3(u1, u2)
    denom2 = dot3(u1, u1) * dot3(u2, u2)
    bad = denom2 <= 0.0
    cos_t = inner * jax.lax.rsqrt(jnp.where(bad, F32(1.0), denom2))
    cos_c = jnp.clip(cos_t, -1.0, 1.0)
    ang = jnp.arccos(cos_c) * F32(_DEG)
    # |cos|>1 (pre-clip) or degenerate -> reference NaN guard values
    nan_like = bad | (jnp.abs(cos_t) > 1.0)
    ang = jnp.where(nan_like, jnp.where(cos_t < 0, F32(180.0), F32(0.0)), ang)
    det = dot3(u1, cross(u2, d2))
    return jnp.where(det < 0, -ang, ang).astype(F32)


def bond_angle(a, b, c):
    """Batched 3-point angle at b, degrees (float3d.h:55-65)."""
    d1 = a - b
    d2 = c - b
    inner = dot3(d1, d2)
    denom2 = dot3(d1, d1) * dot3(d2, d2)
    cos_t = inner * jax.lax.rsqrt(jnp.maximum(denom2, F32(_EPS)))
    return (jnp.arccos(jnp.clip(cos_t, -1.0, 1.0)) * F32(_DEG)).astype(F32)


def normalize(v):
    return v * jax.lax.rsqrt(jnp.maximum(dot3(v, v), F32(_EPS)))[..., None]


def place_atom(a, b, c, bond_length, bond_angle_deg, torsion_deg):
    """Batched NeRF atom placement (Nerf::place_atom, nerf.cpp:39-104).

    a, b, c: [..., 3] previous three atoms; scalars broadcast over the batch.
    Builds the local frame [bc_hat, n_hat x bc_hat, n_hat] from ab x bc and
    rotates the spherical displacement (bond_length, bond_angle, torsion).
    """
    ab = b - a
    bc = c - b
    bc_hat = normalize(bc)

    ba = bond_angle_deg * F32(_RAD)
    ta = torsion_deg * F32(_RAD)
    d = jnp.stack([
        -bond_length * jnp.cos(ba),
        bond_length * jnp.cos(ta) * jnp.sin(ba),
        bond_length * jnp.sin(ta) * jnp.sin(ba),
    ], axis=-1)

    n_hat = normalize(cross(ab, bc_hat))
    nbc = cross(n_hat, bc_hat)
    # m = [bc_hat, nbc, n_hat] columns; out = m @ d + c
    out = (bc_hat * d[..., 0:1] + nbc * d[..., 1:2] + n_hat * d[..., 2:3])
    return out + c
