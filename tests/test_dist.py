"""Sharded multi-host database processing (simulated shards on one host)."""
import os
import pathlib

import numpy as np
import pytest

from conftest import require_fixture

from foldcomp_tpu.io.db import DatabaseReader
from foldcomp_tpu.parallel.dist import (decompress_db_shard, merge_shard_dbs,
                                        shard_range)


def test_shard_range_partition():
    for n in (0, 1, 7, 24, 100):
        for k in (1, 2, 3, 8):
            ranges = [shard_range(n, s, k) for s in range(k)]
            # contiguous, non-overlapping, covering [0, n)
            assert ranges[0][0] == 0
            assert ranges[-1][1] == n
            for (s0, e0), (s1, e1) in zip(ranges, ranges[1:]):
                assert e0 == s1
            sizes = [e - s for s, e in ranges]
            assert max(sizes) - min(sizes) <= 1


@pytest.mark.parametrize("n_shards", [1, 3])
def test_sharded_decompress_merge(tmp_path, n_shards, ref_test_dir):
    db = str(ref_test_dir / "example_db")
    require_fixture("example_db.dbtype")
    out = str(tmp_path / "merged")

    total = 0
    for s in range(n_shards):
        total += decompress_db_shard(db, out, s, n_shards, batch_size=8,
                                     fast=False)
    merged = merge_shard_dbs(out, n_shards)
    assert merged == total == 24

    # merged db equals a direct full decompress
    ref = DatabaseReader(db, use_lookup=True)
    got = DatabaseReader(out, use_lookup=True)
    assert len(got) == len(ref)
    from foldcomp_tpu.codec import fcz
    from foldcomp_tpu.codec.decoder import decode
    from foldcomp_tpu.io.pdb import format_pdb
    for pos in range(len(ref)):
        key = ref.get_key(pos)
        blob = ref.get_data(pos)
        if blob.endswith(b"\x00"):
            blob = blob[:-1]
        f = fcz.parse(blob)
        want = format_pdb(decode(f), f.title).encode() + b"\x00"
        gpos = got.position_of_key(key)
        assert gpos >= 0
        assert got.get_data(gpos) == want, key
    ref.close()
    got.close()
    # shard files cleaned up
    assert not (tmp_path / "merged.0").exists()


def test_sharded_compress(tmp_path, ref_test_dir):
    """compress_db_shard over a PDB-payload database -> valid FCZ db."""
    from foldcomp_tpu.io.db import DatabaseWriter
    from foldcomp_tpu.parallel.dist import compress_db_shard
    from foldcomp_tpu.codec import fcz as fcz_mod

    pdb_db = str(tmp_path / "pdbdb")
    w = DatabaseWriter(pdb_db)
    for i, name in enumerate(("test.pdb", "test_af.pdb")):
        w.append((ref_test_dir / name).read_bytes() + b"\x00", i, name)
    w.close()

    out = str(tmp_path / "fczdb")
    total = 0
    for s in range(2):
        total += compress_db_shard(pdb_db, out, s, 2, fast=False)
    merge_shard_dbs(out, 2)
    r = DatabaseReader(out, use_lookup=True)
    assert len(r) == total == 2
    for pos in range(len(r)):
        f = fcz_mod.parse(r.get_data(pos))
        assert f.n_residue > 20
    r.close()


def test_sharded_fast_path_matches_exact(tmp_path, ref_test_dir):
    """Fast (batched device) shard decode produces valid, gate-passing PDBs."""
    db = str(ref_test_dir / "example_db")
    out_fast = str(tmp_path / "fast")
    out_exact = str(tmp_path / "exact")
    for s in range(2):
        decompress_db_shard(db, out_fast, s, 2, batch_size=16, fast=True)
        decompress_db_shard(db, out_exact, s, 2, batch_size=16, fast=False)
    merge_shard_dbs(out_fast, 2)
    merge_shard_dbs(out_exact, 2)

    fa = DatabaseReader(out_fast)
    ex = DatabaseReader(out_exact)
    assert len(fa) == len(ex) == 24
    from foldcomp_tpu.io.pdb import parse_pdb
    from foldcomp_tpu.core.exact import rmsd
    for pos in range(len(fa)):
        a = parse_pdb(fa.get_data(pos).rstrip(b"\x00"))
        b = parse_pdb(ex.get_data(pos).rstrip(b"\x00"))
        assert a.atom_name == b.atom_name
        assert rmsd(a.coords, b.coords) < 2e-3
    fa.close()
    ex.close()


def test_sharded_compress_device_path(tmp_path, ref_test_dir):
    """The batched device encoder is the default sharded compress path;
    its output is byte-identical to the exact path (the host finishing
    reproduces the reference's f64-promoted acos + quantization)."""
    from foldcomp_tpu.io.db import DatabaseWriter
    from foldcomp_tpu.parallel.dist import compress_db_shard
    from foldcomp_tpu.codec import fcz as fcz_mod
    from foldcomp_tpu.codec.decoder import decode
    from foldcomp_tpu.core.exact import rmsd

    pdb_db = str(tmp_path / "pdbdb")
    w = DatabaseWriter(pdb_db)
    for i, name in enumerate(("test.pdb", "test_af.pdb")):
        w.append((ref_test_dir / name).read_bytes() + b"\x00", i, name)
    w.close()

    out_fast = str(tmp_path / "fast")
    out_exact = str(tmp_path / "exact")
    nf = ne = 0
    for s in range(2):
        nf += compress_db_shard(pdb_db, out_fast, s, 2, fast=True)
        ne += compress_db_shard(pdb_db, out_exact, s, 2, fast=False)
    merge_shard_dbs(out_fast, 2)
    merge_shard_dbs(out_exact, 2)
    assert nf == ne == 2

    fa = DatabaseReader(out_fast, use_lookup=True)
    ex = DatabaseReader(out_exact, use_lookup=True)
    assert len(fa) == len(ex)
    for pos in range(len(fa)):
        key = fa.get_key(pos)
        # byte-identical: the fast path's host finishing reproduces the
        # exact encoder bit-for-bit
        assert fa.get_data(pos) == ex.get_data(ex.position_of_key(key))
    fa.close()
    ex.close()


def test_mesh_byte_parity_8dev():
    """Sharded encode records byte-identical + sharded decode coords
    bit-identical to the single-device core (VERDICT r3 #4); the psum'd
    RMSD gate stays the secondary check (__graft_entry__.dryrun_multichip
    asserts both on every driver run)."""
    import sys
    from importlib import util

    spec = util.spec_from_file_location(
        "graft_entry", str(pathlib.Path(__file__).parent.parent
                           / "__graft_entry__.py"))
    m = util.module_from_spec(spec)
    spec.loader.exec_module(m)
    m.dryrun_multichip(8)    # raises on any parity break


def test_mesh_byte_parity_16dev_subprocess():
    """Same parity on a 16-virtual-device mesh (fresh process: the
    device count is fixed at backend init)."""
    import subprocess
    import sys

    repo = pathlib.Path(__file__).parent.parent
    env = dict(os.environ,
               XLA_FLAGS="--xla_force_host_platform_device_count=16",
               PYTHONPATH=str(repo))
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "from importlib import util\n"
        "spec = util.spec_from_file_location('g', %r)\n"
        "m = util.module_from_spec(spec); spec.loader.exec_module(m)\n"
        "m.dryrun_multichip(16)\n"
        "print('OK16')\n" % (str(repo), str(repo / '__graft_entry__.py')))
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "OK16" in r.stdout
