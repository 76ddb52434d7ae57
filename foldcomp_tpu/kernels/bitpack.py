"""Device-side FCZ record (un)packing.

The 8-byte BackboneChain bitfield (foldcomp.cpp:33-77) as int32 lane math on
[..., 8] uint8 views. Packing/unpacking stays fused with quantization in the
encode/decode kernels, so records never round-trip through host numpy on the
hot path.
"""
from __future__ import annotations

import jax.numpy as jnp

U8 = jnp.uint8
I32 = jnp.int32


def unpack_records(rec_u8):
    """[..., 8] uint8 -> (residue, phi, psi, omega, n_ca_c, ca_c_n, c_n_ca).

    Bit layout parity: convertBytesToBackboneChain (foldcomp.cpp:60-77).
    Returns int32 arrays.
    """
    r = rec_u8.astype(I32)
    residue = r[..., 0] >> 3
    omega = ((r[..., 0] & 0x7) << 8) | r[..., 1]
    psi = (r[..., 2] << 4) | (r[..., 3] >> 4)
    phi = ((r[..., 3] & 0xF) << 8) | r[..., 4]
    ca_c_n = r[..., 5]
    c_n_ca = r[..., 6]
    n_ca_c = r[..., 7]
    return residue, phi, psi, omega, n_ca_c, ca_c_n, c_n_ca


def pack_records(residue, phi, psi, omega, n_ca_c, ca_c_n, c_n_ca):
    """int32 field arrays [...] -> uint8 records [..., 8].

    Bit layout parity: convertBackboneChainToBytes (foldcomp.cpp:33-52);
    values wrap to their bitfield widths like C++ bitfield assignment.
    """
    residue = residue.astype(I32) & 0x1F
    omega = omega.astype(I32) & 0x7FF
    psi = psi.astype(I32) & 0xFFF
    phi = phi.astype(I32) & 0xFFF
    return jnp.stack([
        (residue << 3) | (omega >> 8),
        omega & 0xFF,
        psi >> 4,
        ((psi & 0xF) << 4) | (phi >> 8),
        phi & 0xFF,
        ca_c_n.astype(I32) & 0xFF,
        c_n_ca.astype(I32) & 0xFF,
        n_ca_c.astype(I32) & 0xFF,
    ], axis=-1).astype(U8)
