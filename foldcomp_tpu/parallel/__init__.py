"""Multi-chip / multi-host parallel layers.

- pipeline: shard_map data-parallel roundtrip over a jax.sharding.Mesh
- dist:     host-sharded database processing + index-rebasing merge
- seqpar:   sequence-parallel feature extraction (ppermute halo exchange)
- scaling:  residues/s/chip linearity harness

pipeline's symbols are re-exported lazily: importing `parallel.dist` (the
host-only sharding used by CLI worker processes) must not drag jax in —
worker startup would pay the multi-second jax/axon import for pure C work.
"""


def __getattr__(name):
    if name in ("make_mesh", "make_roundtrip_step", "roundtrip_core",
                "shard_batch"):
        from . import pipeline
        return getattr(pipeline, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
