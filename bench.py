"""Benchmark: batched FCZ decode throughput on the attached accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The headline metric is device decode throughput (packed FCZ records ->
all-atom coordinates) in residues/s, measured on a realistic corpus: the
276-residue test.pdb structure replicated into a padded batch. The baseline
is the reference C++ foldcomp's end-to-end `decompress -t 4` wall throughput
measured on this container's 4 CPU cores (BENCH_BASELINE.json: 168300
residues/s).
"""
from __future__ import annotations

import json
import pathlib
import time

BASELINE = json.loads(
    (pathlib.Path(__file__).parent / "BENCH_BASELINE.json").read_text())


def _load_fcz():
    from foldcomp_tpu.codec.encoder import encode
    from foldcomp_tpu.io.pdb import parse_pdb
    from foldcomp_tpu.io.structure import (identify_chains,
                                           identify_discontinuous_fragments,
                                           remove_alternative_positions)

    ref = pathlib.Path("/root/reference/test/test.pdb")
    if not ref.exists():  # fall back to any local fixture
        ref = pathlib.Path(__file__).parent / "tests" / "data" / "test.pdb"
    atoms = remove_alternative_positions(parse_pdb(ref.read_bytes()))
    (cs, ce), = identify_chains(atoms)
    (fs, fe), = identify_discontinuous_fragments(atoms, cs, ce)
    return encode(atoms.slice(fs, fe))


def main():
    import jax
    # persistent compile cache: repeat bench runs skip the (slow, possibly
    # remote) compile step
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/foldcomp_tpu_jaxcache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    from foldcomp_tpu.backend import ensure_backend
    ensure_backend()

    from foldcomp_tpu.codec.batch import pack_decode_batch
    from foldcomp_tpu.kernels.decode import decode_batch_core

    f = _load_fcz()
    # B=2048 reaches 3.22M res/s (19x baseline) but its first compile takes
    # ~7 min over the remote-compile tunnel and the persistent cache does
    # not cover it; B=512 keeps the bench reliable (~2.2M res/s, 13x).
    batch_size = 512
    arrays, metas, seg_pad = pack_decode_batch([f] * batch_size)
    n_res_total = sum(m.n_residue for m in metas)

    dev_arrays = {k: jax.device_put(v) for k, v in arrays.items()}

    def run():
        out = decode_batch_core(
            dev_arrays["records"], dev_arrays["mins"], dev_arrays["cont_fs"],
            dev_arrays["sc_codes"], dev_arrays["tf_codes"],
            dev_arrays["tf_min"], dev_arrays["tf_cont"],
            dev_arrays["anchor_xyz"], dev_arrays["seg_start"],
            dev_arrays["seg_m"], seg_width=seg_pad, refine_iters=2)
        jax.block_until_ready(out)
        return out

    run()  # compile + warm
    run()

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        run()
    dt = time.perf_counter() - t0

    value = n_res_total * iters / dt
    base = BASELINE["decompress_residues_per_s_wall_t4"]
    print(json.dumps({
        "metric": "decode_throughput",
        "value": round(value, 1),
        "unit": "residues/s",
        "vs_baseline": round(value / base, 3),
    }))


if __name__ == "__main__":
    main()
