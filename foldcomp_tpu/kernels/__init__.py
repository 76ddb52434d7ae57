"""Batched device kernels (JAX/XLA + Pallas) for the FCZ codec.

- geometry: f32 dihedral / bond angle / NeRF atom placement (vector and
  component forms)
- nerf:     segment-parallel backbone reconstruction (scan lanes over
  protein x anchor-segment; gather-free reverse sweep)
- nerf_pallas: fused Pallas segment kernel (FOLDCOMP_TPU_PALLAS=1)
- sidechain: dense-table side-chain extraction / placement
- encode / decode: full batched codec cores (backend-dispatched)
- bitpack:  FCZ 8-byte record (un)packing as integer lane math
"""
