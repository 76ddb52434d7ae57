"""Extended input/output matrix + A/B parity vs the reference binary.

Mirrors the rest of the reference e2e harness (build.sh:46-177): tar and
tar.gz inputs, file-list mode, id-mode 0, tar outputs, and — when a locally
built reference binary is available (FOLDCOMP_REF_BIN, default
/tmp/refbuild/foldcomp) — full byte-level A/B comparison of compress and
decompress outputs.
"""
import os
import subprocess
import sys
import tarfile

import pytest

from conftest import require_fixture

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_BIN = os.environ.get("FOLDCOMP_REF_BIN", "/tmp/refbuild/foldcomp")


def run_cli(*args, cwd=None):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run([sys.executable, "-m", "foldcomp_tpu", *args],
                          capture_output=True, text=True, cwd=cwd, env=env)


def test_tar_input(tmp_path):
    tar = require_fixture("tar_test_input.tar")
    out = tmp_path / "out"
    assert run_cli("compress", "-y", str(tar), str(out)).returncode == 0
    assert len(list(out.iterdir())) >= 2


def test_targz_input(tmp_path):
    targz = require_fixture("gz_test_input.tar.gz")
    out = tmp_path / "out"
    assert run_cli("compress", "-y", str(targz), str(out)).returncode == 0
    assert len(list(out.iterdir())) >= 2


def test_tar_to_tar(tmp_path):
    tar = require_fixture("tar_test_input.tar")
    out = tmp_path / "out.tar"
    assert run_cli("compress", "-y", "--tar", str(tar),
                   str(out)).returncode == 0
    with tarfile.open(out) as tf:
        members = [m for m in tf if m.isfile()]
        assert len(members) >= 2
        assert all(m.name.endswith(".fcz") for m in members)


def test_file_list_input(tmp_path, ref_test_dir):
    lst = tmp_path / "list.txt"
    lst.write_text(f"{ref_test_dir}/test.pdb\n{ref_test_dir}/test_af.pdb\n")
    out = tmp_path / "out"
    assert run_cli("compress", "-y", "-f", str(lst), str(out)).returncode == 0
    assert sorted(p.name for p in out.iterdir()) == ["test.fcz",
                                                     "test_af.fcz"]


def test_db_id_mode_0(tmp_path):
    db = require_fixture("example_db")
    require_fixture("example_db.dbtype")
    # grab two numeric keys from the index
    keys = []
    for line in (db.parent / "example_db.index").read_text().splitlines()[:2]:
        keys.append(line.split("\t")[0])
    idf = tmp_path / "ids.txt"
    idf.write_text("\n".join(keys) + "\n")
    out = tmp_path / "out"
    assert run_cli("decompress", "-y", "-l", str(idf), "-m", "0", str(db),
                   str(out)).returncode == 0
    assert len(list(out.iterdir())) == 2


def test_db_to_tar_decompress(tmp_path):
    db = require_fixture("example_db")
    out = tmp_path / "out.tar"
    assert run_cli("decompress", "-y", "--tar", str(db),
                   str(out)).returncode == 0
    with tarfile.open(out) as tf:
        assert len([m for m in tf if m.isfile()]) == 24


needs_ref = pytest.mark.skipif(not os.path.exists(REF_BIN),
                               reason="reference binary not built")


@needs_ref
def test_ab_compress_parity(tmp_path, ref_test_dir):
    """Byte parity (padding-masked) with the reference binary over the full
    fixture directory."""
    from foldcomp_tpu.codec.fcz import equal_with_padding_mask

    din = ref_test_dir / "dir_test_input"
    ours = tmp_path / "ours"
    theirs = tmp_path / "theirs"
    assert run_cli("compress", "-y", str(din), str(ours)).returncode == 0
    subprocess.run([REF_BIN, "compress", "-y", str(din), str(theirs)],
                   capture_output=True, check=True)
    names_o = sorted(p.name for p in ours.iterdir())
    names_t = sorted(p.name for p in theirs.iterdir())
    assert names_o == names_t
    for name in names_o:
        a = (ours / name).read_bytes()
        b = (theirs / name).read_bytes()
        assert equal_with_padding_mask(a, b), name


@needs_ref
def test_ab_decompress_parity(tmp_path, ref_test_dir):
    """Decompressed PDB text is byte-identical to the reference binary."""
    db = ref_test_dir / "example_db"
    ours = tmp_path / "ours"
    theirs = tmp_path / "theirs"
    assert run_cli("decompress", "-y", str(db), str(ours)).returncode == 0
    subprocess.run([REF_BIN, "decompress", "-y", str(db), str(theirs)],
                   capture_output=True, check=True)
    names = sorted(p.name for p in theirs.iterdir())
    assert sorted(p.name for p in ours.iterdir()) == names
    for name in names:
        assert (ours / name).read_bytes() == (theirs / name).read_bytes(), \
            name


@needs_ref
def test_ab_extract_parity(tmp_path, ref_test_dir):
    fczf = ref_test_dir / "test_af.fcz"
    a = tmp_path / "a.plddt"
    b = tmp_path / "b.plddt"
    assert run_cli("extract", "--plddt", str(fczf), str(a)).returncode == 0
    subprocess.run([REF_BIN, "extract", "--plddt", str(fczf), str(b)],
                   capture_output=True, check=True)
    assert a.read_bytes() == b.read_bytes()


def test_subdb_extension(tmp_path, ref_test_dir):
    """subdb (mmseqs createsubdb equivalent) subsets by name or key."""
    subset = (ref_test_dir / "example_db.subset").read_text().split()[:3]
    idf = tmp_path / "ids.txt"
    idf.write_text("\n".join(subset) + "\n")
    out = tmp_path / "sub"
    r = run_cli("subdb", str(idf), str(ref_test_dir / "example_db"),
                str(out))
    assert r.returncode == 0, r.stderr
    from foldcomp_tpu.io.db import DatabaseReader
    with DatabaseReader(str(out), use_lookup=True) as db:
        assert len(db) == 3
        for name in subset:
            key = db.lookup_key(name)
            assert db.position_of_key(key) >= 0


@needs_ref
def test_stdout_banner_parity(tmp_path, ref_test_dir):
    """Mode banners match the reference binary line for line."""
    fcz_file = ref_test_dir / "test_af.fcz"
    pdb_file = ref_test_dir / "test_af.pdb"
    cases = [
        ("check", str(fcz_file)),
        ("compress", "-y", str(pdb_file), str(tmp_path / "x.fcz")),
        ("decompress", "-y", str(fcz_file), str(tmp_path / "x.pdb")),
        ("extract", "--plddt", str(fcz_file), str(tmp_path / "x.plddt")),
    ]
    for args in cases:
        ours = run_cli(*args).stdout
        theirs = subprocess.run([REF_BIN, *args], capture_output=True,
                                text=True).stdout
        assert ours == theirs, (args, ours, theirs)
