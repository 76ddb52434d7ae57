"""Batched device kernels (JAX/XLA) for the FCZ codec.

- geometry: f32 dihedral / bond angle / NeRF atom placement (vector and
  component forms)
- nerf:     segment-parallel backbone reconstruction (scan lanes over
  protein x anchor-segment; gather-free reverse sweep) — parity oracle
- nerf_assoc: log-depth rigid-frame associative-scan backbone decode
  (production default; a fused Pallas variant was benchmarked on a real
  chip and retired — it lost to this form, see kernels/decode.py)
- sidechain: dense-table side-chain extraction / placement
- encode / decode: full batched codec cores (backend-dispatched)
- bitpack:  FCZ 8-byte record (un)packing as integer lane math
"""
