"""ASan+UBSan gate for the native C layer.

Reference CI builds {gcc,clang} x {ASan,UBSan,TSan} and reruns its golden
e2e assertions under them (.github/workflows/build-static.yml). ctypes
cannot load an instrumented .so into an uninstrumented interpreter, so
native/fctest.c links fcio.c+fccodec.c into an instrumented executable and
drives the same code paths: full decode, mutation/truncation fuzz, PDB
parse->encode->decode roundtrip, db iteration, and corrupt-index rejection.
"""
import os
import pathlib
import shutil
import subprocess

import pytest

from conftest import REF_TEST_DIR, require_fixture

REPO = pathlib.Path(__file__).resolve().parent.parent
NATIVE = REPO / "native"


@pytest.fixture(scope="session")
def fctest_bin(tmp_path_factory):
    cc = os.environ.get("CC", "cc")
    if shutil.which(cc) is None:
        pytest.skip("no C compiler")
    exe = tmp_path_factory.mktemp("san") / "fctest"
    cmd = [cc, "-g", "-O1", "-fsanitize=address,undefined",
           "-fno-sanitize-recover=all", "-o", str(exe),
           str(NATIVE / "fctest.c"), str(NATIVE / "fcio.c"),
           str(NATIVE / "fccodec.c"), "-lm"]
    res = subprocess.run(cmd, capture_output=True, text=True, timeout=180)
    if res.returncode != 0:
        pytest.skip(f"sanitizer build unavailable: {res.stderr[:500]}")
    return exe


def run(exe, *args, timeout=300):
    env = dict(os.environ,
               ASAN_OPTIONS="detect_leaks=1:halt_on_error=1",
               UBSAN_OPTIONS="halt_on_error=1")
    return subprocess.run([str(exe), *args], capture_output=True, text=True,
                          timeout=timeout, env=env)


def test_asan_decode_golden(fctest_bin):
    fcz = require_fixture("test_af.fcz")
    r = run(fctest_bin, "decode", str(fcz))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "ATOM" in r.stdout


def test_asan_fuzz(fctest_bin):
    fcz = require_fixture("test_af.fcz")
    r = run(fctest_bin, "fuzz", str(fcz), "800")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "fuzz ok" in r.stdout


def test_asan_roundtrip(fctest_bin):
    pdb = require_fixture("test.pdb")
    r = run(fctest_bin, "roundtrip", str(pdb))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "roundtrip ok" in r.stdout


def test_asan_db(fctest_bin):
    db = require_fixture("example_db")
    r = run(fctest_bin, "db", str(db), str(db) + ".index")
    assert r.returncode == 0, r.stderr[-2000:]
    # every entry of the 24-entry example db must decode
    assert "db ok 24/24" in r.stdout


def test_asan_corrupt_index_rejected(fctest_bin):
    db = require_fixture("example_db")
    r = run(fctest_bin, "badindex", str(db))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "badindex ok" in r.stdout


def test_asan_chunk_range_loops(fctest_bin):
    """The GIL-free db chunk loops (fcz_db_{decode,encode,extract}_range)
    under ASan+UBSan: decode a whole db to a shard, re-encode the result,
    extract every mode x digits form."""
    data = require_fixture("example_db")
    index = require_fixture("example_db.index")
    r = run(fctest_bin, "ranges", str(data), str(index))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "ranges ok" in r.stdout
