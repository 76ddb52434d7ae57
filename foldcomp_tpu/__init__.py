"""foldcomp_tpu: TPU-native protein structure compression (FCZ-compatible).

A from-scratch JAX/XLA framework with the capabilities of the reference
Foldcomp (steineggerlab/foldcomp): FCZ compress/decompress/extract/check/rmsd
over files, directories, tars and MMseqs2-style databases, plus a
foldcomp-compatible Python API, with batched TPU kernels for the compute path.

The heavy JAX modules are imported lazily; `import foldcomp_tpu` stays cheap and
works on CPU-only hosts.
"""

__version__ = "0.1.0"


def __getattr__(name):
    # foldcomp-compatible API surface, loaded lazily.
    if name in ("compress", "decompress", "open", "get_data", "setup",
                "setup_async", "FoldcompDatabase"):
        from . import api
        return getattr(api, name)
    if name == "split_pdb_by_chain":
        from .api import split_pdb_by_chain
        return split_pdb_by_chain
    raise AttributeError(f"module 'foldcomp_tpu' has no attribute {name!r}")
