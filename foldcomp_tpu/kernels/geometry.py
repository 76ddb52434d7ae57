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


def place_atom_c(ax, ay, az, bx, by, bz, cx, cy, cz,
                 bond_length, bond_angle_deg, torsion_deg):
    """place_atom over separate coordinate-component arrays.

    TPU-friendly form: every argument is a full-lane array (or scalar), so
    the math vectorizes over the trailing lane axis with zero tile padding —
    the [..., 3]-vector form wastes ~98% of each (8, 128) tile.
    """
    abx, aby, abz = bx - ax, by - ay, bz - az
    bcx, bcy, bcz = cx - bx, cy - by, cz - bz
    inv_bc = jax.lax.rsqrt(jnp.maximum(bcx * bcx + bcy * bcy + bcz * bcz,
                                       F32(_EPS)))
    bcnx, bcny, bcnz = bcx * inv_bc, bcy * inv_bc, bcz * inv_bc

    ba = bond_angle_deg * F32(_RAD)
    ta = torsion_deg * F32(_RAD)
    dx = -bond_length * jnp.cos(ba)
    dy = bond_length * jnp.cos(ta) * jnp.sin(ba)
    dz = bond_length * jnp.sin(ta) * jnp.sin(ba)

    nx = aby * bcnz - bcny * abz
    ny = abz * bcnx - bcnz * abx
    nz = abx * bcny - bcnx * aby
    inv_n = jax.lax.rsqrt(jnp.maximum(nx * nx + ny * ny + nz * nz,
                                      F32(_EPS)))
    nx, ny, nz = nx * inv_n, ny * inv_n, nz * inv_n

    mx = ny * bcnz - bcny * nz
    my = nz * bcnx - bcnz * nx
    mz = nx * bcny - bcnx * ny

    ox = bcnx * dx + mx * dy + nx * dz + cx
    oy = bcny * dx + my * dy + ny * dz + cy
    oz = bcnz * dx + mz * dy + nz * dz + cz
    return ox, oy, oz


def bond_angle_parts_c(ax, ay, az, bx, by, bz, cx, cy, cz):
    """3-point angle split into (inner, s1*s2) f32 parts.

    The parts are everything the reference computes in float
    (float3d.h:36-44); the remaining double-promoted sqrt/division/acos
    (getCosineTheta -> angle) can then be finished either on device in f32
    (bond_angle_c) or on host in f64 for bit parity with the reference
    (codec/batch.py finish_encode_host)."""
    d1x, d1y, d1z = ax - bx, ay - by, az - bz
    d2x, d2y, d2z = cx - bx, cy - by, cz - bz
    inner = d1x * d2x + d1y * d2y + d1z * d2z
    s1 = d1x * d1x + d1y * d1y + d1z * d1z
    s2 = d2x * d2x + d2y * d2y + d2z * d2z
    return inner, s1 * s2


def bond_angle_c(ax, ay, az, bx, by, bz, cx, cy, cz):
    """Component-form 3-point angle at b, degrees."""
    inner, denom2 = bond_angle_parts_c(ax, ay, az, bx, by, bz, cx, cy, cz)
    # exact sqrt+divide (not rsqrt): quantizer min/max parity near +-180
    # depends on correctly-rounded cosines
    cos_t = inner / jnp.sqrt(jnp.maximum(denom2, F32(_EPS)))
    return (jnp.arccos(jnp.clip(cos_t, -1.0, 1.0)) * F32(_DEG)).astype(F32)


def dihedral_parts_c(p0x, p0y, p0z, p1x, p1y, p1z, p2x, p2y, p2z,
                     p3x, p3y, p3z):
    """Dihedral split into (inner, denom2, det) f32 parts.

    All the float work of getTorsionFromXYZ (torsion_angle.cpp:46-96:
    cross products, dot products, squared norms, the sign determinant);
    the double-promoted sqrt/division/acos tail can be finished on device
    (dihedral_c) or on host in f64 for bit parity."""
    d1x, d1y, d1z = p1x - p0x, p1y - p0y, p1z - p0z
    d2x, d2y, d2z = p2x - p1x, p2y - p1y, p2z - p1z
    d3x, d3y, d3z = p3x - p2x, p3y - p2y, p3z - p2z
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
    return inner, denom2, det


def dihedral_c(p0x, p0y, p0z, p1x, p1y, p1z, p2x, p2y, p2z,
               p3x, p3y, p3z):
    """Component-form dihedral in degrees (getTorsionFromXYZ parity)."""
    inner, denom2, det = dihedral_parts_c(p0x, p0y, p0z, p1x, p1y, p1z,
                                          p2x, p2y, p2z, p3x, p3y, p3z)
    bad = denom2 <= 0.0
    # sqrt+divide, not rsqrt: a 1-ulp cosine error near +-180 flips the
    # NaN guard and shifts the per-protein quantizer min/max
    cos_t = inner / jnp.sqrt(jnp.where(bad, F32(1.0), denom2))
    ang = jnp.arccos(jnp.clip(cos_t, -1.0, 1.0)) * F32(_DEG)
    nan_like = bad | (jnp.abs(cos_t) > 1.0)
    ang = jnp.where(nan_like, jnp.where(cos_t < 0, F32(180.0), F32(0.0)),
                    ang)
    return jnp.where(det < 0, -ang, ang).astype(F32)


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
