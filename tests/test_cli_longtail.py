"""A/B tests for the long-tail CLI flags (VERDICT r2 weak #5).

Each flag is compared against the locally built reference binary
(FOLDCOMP_REF_BIN, default /tmp/refbuild/foldcomp): --use-title,
--no-merge, -p/--plddt-digits 2-4 including the 0-1 vs 0-100 pLDDT
auto-scale (foldcomp.cpp:1285-1326), decompress --check skip-on-corrupt
(main.cpp:630-636), --time (execution_timer.h TimerGuard — the reference
binary aborts with std::bad_alloc when --time is set in this build, so
only the repo's output format is asserted), and --skip-discontinuous
(main.cpp:475-479).
"""
import os
import re
import subprocess
import sys

import pytest

from conftest import require_fixture

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_BIN = os.environ.get("FOLDCOMP_REF_BIN", "/tmp/refbuild/foldcomp")

needs_ref = pytest.mark.skipif(not os.path.exists(REF_BIN),
                               reason="reference binary not built")


def run_cli(*args, cwd=None):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run([sys.executable, "-m", "foldcomp_tpu", *args],
                          capture_output=True, text=True, cwd=cwd, env=env)


def run_ref(*args, cwd=None):
    return subprocess.run([REF_BIN, *args], capture_output=True, text=True,
                          cwd=cwd)


@pytest.fixture(scope="module")
def fcz_dir(tmp_path_factory, ref_test_dir):
    """Directory with two reference-compressed entries (0-100 pLDDT)."""
    d = tmp_path_factory.mktemp("fczdir")
    for name in ("test.pdb", "test_af.pdb"):
        require_fixture(name)
        r = run_ref("compress", str(ref_test_dir / name),
                    str(d / (name[:-4] + ".fcz")))
        assert r.returncode == 0, r.stderr
    return d


@needs_ref
@pytest.mark.parametrize("digits", [2, 3, 4])
def test_plddt_digits_merged_ab(tmp_path, fcz_dir, digits):
    """extract --plddt -p N merged TSV matches the reference line-for-line
    (order-independent: both walk the directory in listing order)."""
    ref_out = tmp_path / "ref.txt"
    our_out = tmp_path / "ours.txt"
    assert run_ref("extract", "--plddt", "-p", str(digits), str(fcz_dir),
                   str(ref_out)).returncode == 0
    assert run_cli("extract", "--plddt", "-p", str(digits), str(fcz_dir),
                   str(our_out)).returncode == 0
    assert sorted(our_out.read_text().splitlines()) == \
        sorted(ref_out.read_text().splitlines())


@needs_ref
def test_plddt_autoscale_0_1_ab(tmp_path, ref_test_dir):
    """pLDDT stored as 0-1 is auto-scaled to 0-100 on extraction exactly
    like the reference (foldcomp.cpp:1285-1326)."""
    src = (ref_test_dir / "test_af.pdb").read_text().splitlines(keepends=True)
    scaled = []
    for ln in src:
        if ln.startswith(("ATOM", "HETATM")):
            tf = float(ln[60:66])
            ln = ln[:60] + f"{tf / 100:6.2f}" + ln[66:]
        scaled.append(ln)
    pdb01 = tmp_path / "af01.pdb"
    pdb01.write_text("".join(scaled))

    d = tmp_path / "fcz01"
    d.mkdir()
    assert run_ref("compress", str(pdb01),
                   str(d / "af01.fcz")).returncode == 0
    for digits in (1, 2, 3):
        ref_out = tmp_path / f"ref{digits}.txt"
        our_out = tmp_path / f"ours{digits}.txt"
        assert run_ref("extract", "--plddt", "-p", str(digits), str(d),
                       str(ref_out)).returncode == 0
        assert run_cli("extract", "--plddt", "-p", str(digits), str(d),
                       str(our_out)).returncode == 0
        assert our_out.read_text() == ref_out.read_text()


@needs_ref
def test_no_merge_ab(tmp_path, fcz_dir):
    """--no-merge writes one {base}.plddt.tsv per entry, byte-identical."""
    ref_out = tmp_path / "refdir"
    our_out = tmp_path / "oursdir"
    assert run_ref("extract", "--plddt", "-p", "2", "--no-merge",
                   str(fcz_dir), str(ref_out)).returncode == 0
    assert run_cli("extract", "--plddt", "-p", "2", "--no-merge",
                   str(fcz_dir), str(our_out)).returncode == 0
    ref_files = sorted(p.name for p in ref_out.iterdir())
    assert ref_files == sorted(p.name for p in our_out.iterdir())
    assert ref_files  # at least one per entry
    for name in ref_files:
        assert (our_out / name).read_bytes() == (ref_out / name).read_bytes()


@needs_ref
@pytest.mark.parametrize("mode", ["--plddt", "--fasta"])
def test_use_title_ab(tmp_path, fcz_dir, mode):
    """--use-title keys merged output by the embedded TITLE, not the
    filename, in both pLDDT and FASTA extraction modes."""
    ref_out = tmp_path / "ref.txt"
    our_out = tmp_path / "ours.txt"
    assert run_ref("extract", mode, "--use-title", str(fcz_dir),
                   str(ref_out)).returncode == 0
    assert run_cli("extract", mode, "--use-title", str(fcz_dir),
                   str(our_out)).returncode == 0
    assert sorted(our_out.read_text().splitlines()) == \
        sorted(ref_out.read_text().splitlines())
    # the titles (not file names) must appear in the headers
    assert any(ln.startswith(">") or "\t" in ln
               for ln in our_out.read_text().splitlines())


def _zero_backbone(blob: bytes) -> bytes:
    """Zero the backbone record stream — the corruption class both codecs
    detect via checkValidity (all backbone angles empty)."""
    sys.path.insert(0, REPO)
    from foldcomp_tpu.codec import fcz
    f = fcz.parse(blob)
    start = (4 + 72 + 4 * f.n_anchor + len(f.title) + 36 * f.n_anchor
             + 1 + 12)
    bad = bytearray(blob)
    bad[start:start + 8 * f.n_residue] = bytes(8 * f.n_residue)
    return bytes(bad)


@needs_ref
def test_decompress_check_skips_corrupt_ab(tmp_path, fcz_dir):
    """decompress --check skips entries failing validity with the
    reference's error message and still decompresses the valid ones
    byte-identically (main.cpp:630-636)."""
    d = tmp_path / "mixdir"
    d.mkdir()
    good = (fcz_dir / "test.fcz").read_bytes()
    (d / "good.fcz").write_bytes(good)
    (d / "bad.fcz").write_bytes(_zero_backbone(good))

    ref_out = tmp_path / "refout"
    our_out = tmp_path / "oursout"
    ref = run_ref("decompress", "--check", "-y", str(d), str(ref_out))
    ours = run_cli("decompress", "--check", "-y", str(d), str(our_out))
    assert ref.returncode == 0 and ours.returncode == 0

    def errors(text):
        return sorted(ln for ln in text.splitlines()
                      if ln.startswith("[Error]"))

    assert errors(ours.stderr) == errors(ref.stderr)
    assert any("backbone" in e.lower() for e in errors(ours.stderr))
    assert sorted(p.name for p in our_out.iterdir()) == \
        sorted(p.name for p in ref_out.iterdir())
    for p in ref_out.iterdir():
        assert (our_out / p.name).read_bytes() == p.read_bytes()


def test_time_flag_emits_per_entry_lines(tmp_path, ref_test_dir):
    """--time prints one 'name<TAB>seconds' line per entry to stdout —
    the reference TimerGuard's format (execution_timer.h:75-85; the
    reference binary itself std::bad_allocs when --time is set in this
    build, so this asserts our implementation of the documented format)."""
    d = tmp_path / "pdbs"
    d.mkdir()
    for name in ("test.pdb", "test_af.pdb"):
        (d / name).write_bytes(require_fixture(name).read_bytes())
    out = tmp_path / "out"
    r = run_cli("compress", "--time", "-y", str(d), str(out))
    assert r.returncode == 0
    timed = [ln for ln in r.stdout.splitlines()
             if re.fullmatch(r"\S+\t\d+\.\d{6}", ln)]
    assert len(timed) == 2, r.stdout

    # decompress direction too
    out2 = tmp_path / "out2"
    r = run_cli("decompress", "--time", "-y", str(out), str(out2))
    assert r.returncode == 0
    timed = [ln for ln in r.stdout.splitlines()
             if re.fullmatch(r"\S+\t\d+\.\d{6}", ln)]
    assert len(timed) == 2, r.stdout


@pytest.fixture()
def gap_dir(tmp_path, ref_test_dir):
    """Directory holding a PDB with a residue-numbering gap (two
    fragments per identifyDiscontinousResInd, atom_coordinate.cpp:506)."""
    src = require_fixture("test.pdb").read_text().splitlines(keepends=True)
    keep = [ln for ln in src
            if not (ln.startswith(("ATOM", "HETATM"))
                    and 500 <= int(ln[22:26]) <= 510)]
    d = tmp_path / "gapdir"
    d.mkdir()
    (d / "gap.pdb").write_text("".join(keep))
    return d


@needs_ref
def test_skip_discontinuous_ab(tmp_path, gap_dir):
    """--skip-discontinuous: both tools skip the chain with the same
    stderr message; without the flag both write per-fragment outputs
    byte-identically (main.cpp:475-479)."""
    ref_skip = tmp_path / "refskip"
    our_skip = tmp_path / "ourskip"
    ref = run_ref("compress", "--skip-discontinuous", "-y", str(gap_dir),
                  str(ref_skip))
    ours = run_cli("compress", "--skip-discontinuous", "-y", str(gap_dir),
                   str(our_skip))
    assert ref.returncode == 0 and ours.returncode == 0
    assert "Skipping discontinuous chain: gap.pdb" in ref.stderr
    assert "Skipping discontinuous chain: gap.pdb" in ours.stderr
    assert not any(ref_skip.iterdir())
    assert not any(our_skip.iterdir())

    ref_out = tmp_path / "refout"
    our_out = tmp_path / "oursout"
    assert run_ref("compress", "-y", str(gap_dir),
                   str(ref_out)).returncode == 0
    assert run_cli("compress", "-y", str(gap_dir),
                   str(our_out)).returncode == 0
    names = sorted(p.name for p in ref_out.iterdir())
    assert names == sorted(p.name for p in our_out.iterdir())
    assert len(names) == 2  # one fcz per fragment
    for name in names:
        assert (our_out / name).read_bytes() == (ref_out / name).read_bytes()
