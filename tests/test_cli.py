"""End-to-end CLI tests following the reference harness (build.sh:46-177)."""
import os
import subprocess
import sys

import pytest

from conftest import require_fixture

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(*args, cwd=None):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run([sys.executable, "-m", "foldcomp_tpu", *args],
                          capture_output=True, text=True, cwd=cwd, env=env)


def test_compress_decompress_rmsd_gate(tmp_path):
    pdb = require_fixture("test.pdb")
    fczf = tmp_path / "compressed.fcz"
    out = tmp_path / "decompressed.pdb"
    assert run_cli("compress", "-y", str(pdb), str(fczf)).returncode == 0
    assert fczf.exists()
    assert run_cli("decompress", "-y", str(fczf), str(out)).returncode == 0
    r = run_cli("rmsd", str(pdb), str(out))
    assert r.returncode == 0
    cols = r.stdout.strip().split("\t")
    assert abs(float(cols[5]) - 0.0826751) < 0.001
    assert cols[2] == "276" and cols[3] == "2208"


def test_cif_roundtrip_gate(tmp_path):
    cif = require_fixture("test.cif.gz")
    fczf = tmp_path / "c.fcz"
    out = tmp_path / "c.pdb"
    assert run_cli("compress", "-y", str(cif), str(fczf)).returncode == 0
    assert run_cli("decompress", "-y", "-a", str(fczf), str(out)).returncode == 0
    r = run_cli("rmsd", str(cif), str(out))
    cols = r.stdout.strip().split("\t")
    assert abs(float(cols[5]) - 0.130284) < 0.001


def test_dir_tar_db_matrix(tmp_path):
    din = require_fixture("dir_test_input")
    # dir -> dir
    out_dir = tmp_path / "dir_out"
    assert run_cli("compress", "-y", str(din), str(out_dir)).returncode == 0
    names = sorted(os.listdir(out_dir))
    assert names == ["multichainA.fcz", "multichainB_0.fcz",
                     "multichainB_1.fcz", "test.cif.fcz", "test.fcz",
                     "test_af.fcz"]
    # dir -> tar
    out_tar = tmp_path / "out.fcz.tar"
    assert run_cli("compress", "-y", "--tar", str(din),
                   str(out_tar)).returncode == 0
    import tarfile
    with tarfile.open(out_tar) as tf:
        assert len([m for m in tf if m.isfile()]) == 6
    # dir -> db, then db -> dir decompress
    out_db = tmp_path / "out_db"
    assert run_cli("compress", "-y", "--db", str(din),
                   str(out_db)).returncode == 0
    assert (tmp_path / "out_db.dbtype").exists()
    assert (tmp_path / "out_db.index").exists()
    assert (tmp_path / "out_db.lookup").exists()
    dec_dir = tmp_path / "dec"
    assert run_cli("decompress", "-y", str(out_db), str(dec_dir)).returncode == 0
    # db entries are keyed without chain/fragment suffixes, so the three
    # multichain fragments and test/test.cif collide to 3 distinct pdb names,
    # exactly like the reference (main.cpp:648-653)
    assert sorted(os.listdir(dec_dir)) == ["multichain.pdb", "test.pdb",
                                           "test_af.pdb"]


def test_example_db_decompress_and_subset(tmp_path):
    db = require_fixture("example_db")
    require_fixture("example_db.dbtype")
    out = tmp_path / "dec"
    assert run_cli("decompress", "-y", str(db), str(out)).returncode == 0
    assert len(os.listdir(out)) == 24
    subset = require_fixture("example_db.subset")
    out2 = tmp_path / "dec_sub"
    assert run_cli("decompress", "-y", "-l", str(subset), str(db),
                   str(out2)).returncode == 0
    assert len(os.listdir(out2)) == 7


def test_extract_modes(tmp_path):
    fczf = require_fixture("test_af.fcz")
    golden1 = require_fixture("test_af.plddt").read_text()
    golden4 = require_fixture("test_af.plddt.tsv").read_text()
    out1 = tmp_path / "x.plddt"
    r = run_cli("extract", "--plddt", str(fczf), str(out1))
    assert r.returncode == 0
    mine = out1.read_text()
    # golden title embeds the original invocation path; compare payload lines
    assert mine.splitlines()[1] == golden1.splitlines()[1]
    out4 = tmp_path / "x.tsv"
    assert run_cli("extract", "--plddt", "-p", "4", str(fczf),
                   str(out4)).returncode == 0
    assert out4.read_text().split("\t", 1)[1] == golden4.split("\t", 1)[1]
    outf = tmp_path / "x.fasta"
    assert run_cli("extract", "--fasta", str(fczf), str(outf)).returncode == 0
    assert outf.read_text().splitlines()[1] == "MIRQKIFVFIVKSRRNSICPAIRRKEDY"


def test_check_mode():
    fczf = require_fixture("test_af.fcz")
    r = run_cli("check", str(fczf))
    assert r.returncode == 0
    assert "[Error]" not in r.stderr


def test_warmup_subcommand(tmp_path, monkeypatch, ref_test_dir):
    """`warmup <dir>` pre-compiles one decode + one encode batch and
    reports timings (FAST_BATCH shrunk so the CPU compile stays small;
    the real batch size only changes shapes, not code paths)."""
    import foldcomp_tpu.cli as cli

    d = tmp_path / "mix"
    d.mkdir()
    (d / "test.pdb").write_bytes((ref_test_dir / "test.pdb").read_bytes())
    (d / "test_af.fcz").write_bytes(
        (ref_test_dir / "test_af.fcz").read_bytes())
    monkeypatch.setattr(cli, "FAST_BATCH", 4)
    rc = cli.main(["warmup", str(d)])
    assert rc == 0
