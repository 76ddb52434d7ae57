"""Multi-chip / multi-host parallel layers.

- pipeline: shard_map data-parallel roundtrip over a jax.sharding.Mesh
- dist:     host-sharded database processing + index-rebasing merge
- seqpar:   sequence-parallel feature extraction (ppermute halo exchange)
- scaling:  residues/s/chip linearity harness
"""
from .pipeline import (make_mesh, make_roundtrip_step, roundtrip_core,  # noqa: F401
                       shard_batch)
