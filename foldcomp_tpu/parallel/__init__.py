"""Multi-chip / multi-host parallel layers.

- pipeline: shard_map data-parallel roundtrip over a jax.sharding.Mesh
- dist:     host-sharded database processing + index-rebasing merge
- seqpar:   sequence-parallel long-chain encode (ppermute halo exchange,
            pmin/pmax quantizer reduction, per-shard record packing)
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
    if name in ("encode_long_chain", "sharded_encode_features",
                "sharded_backbone_features"):
        from . import seqpar
        return getattr(seqpar, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
