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


@pytest.fixture(scope="session")
def fctest_tsan_bin(tmp_path_factory):
    """fctest built with -fsanitize=thread — the TSan leg of the reference
    CI's {ASan,UBSan,TSan} matrix (.github/workflows/build-static.yml,
    cmake/FindTSan.cmake). The repo has strictly MORE concurrency than
    the reference (thread chunk workers, flock'd claims), so the gate
    matters more here; r2 shipped a real chunk-claim race (fixed in
    0d97e83) that this build class would have caught."""
    cc = os.environ.get("CC", "cc")
    if shutil.which(cc) is None:
        pytest.skip("no C compiler")
    exe = tmp_path_factory.mktemp("tsan") / "fctest"
    cmd = [cc, "-g", "-O1", "-fsanitize=thread",
           "-fno-sanitize-recover=all", "-pthread", "-o", str(exe),
           str(NATIVE / "fctest.c"), str(NATIVE / "fcio.c"),
           str(NATIVE / "fccodec.c"), "-lm"]
    res = subprocess.run(cmd, capture_output=True, text=True, timeout=180)
    if res.returncode != 0:
        pytest.skip(f"tsan build unavailable: {res.stderr[:500]}")
    return exe


def run_tsan(exe, *args, timeout=600):
    env = dict(os.environ, TSAN_OPTIONS="halt_on_error=1")
    return subprocess.run([str(exe), *args], capture_output=True, text=True,
                          timeout=timeout, env=env)


def test_tsan_threaded_chunk_claims(fctest_tsan_bin):
    """4 threads x 3 rounds of the hybrid scheduler's worker pattern —
    per-thread reader/writer handles over one mmap, chunks claimed
    front+back from the flock'd two-pointer control file, full decode
    chunk loops — under TSan, asserting every entry decodes exactly
    once (double-claims and lost chunks both break the count)."""
    data = require_fixture("example_db")
    index = require_fixture("example_db.index")
    r = run_tsan(fctest_tsan_bin, "tchunks", str(data), str(index), "4",
                 "3")
    assert r.returncode == 0, (r.stdout + r.stderr)[-2000:]
    assert "tchunks ok" in r.stdout


def test_chunk_controller_thread_process_mix(tmp_path):
    """ChunkController claims under a simultaneous thread+process mix:
    every chunk claimed exactly once across 3 in-process threads and 2
    child processes hammering the same control file."""
    import struct as _struct
    import subprocess as _sp
    import sys as _sys
    import threading

    from foldcomp_tpu.parallel.hybrid import ChunkController

    n_chunks = 600
    ctrl_path = str(tmp_path / "ctrl")
    ChunkController.create(ctrl_path, n_chunks)

    claimed = []
    lock = threading.Lock()

    def tmain(front):
        ctrl = ChunkController(ctrl_path)
        take = ctrl.take_front if front else ctrl.take_back
        while (c := take()) is not None:
            with lock:
                claimed.append(c)

    child_code = (
        "import sys\n"
        f"sys.path.insert(0, {REPO.as_posix()!r})\n"
        "from foldcomp_tpu.parallel.hybrid import ChunkController\n"
        f"ctrl = ChunkController({ctrl_path!r})\n"
        "got = []\n"
        "while (c := ctrl.take_front()) is not None:\n"
        "    got.append(c)\n"
        "print(' '.join(map(str, got)))\n")
    procs = [_sp.Popen([_sys.executable, "-c", child_code],
                       stdout=_sp.PIPE, text=True) for _ in range(2)]
    threads = [threading.Thread(target=tmain, args=(i % 2 == 0,))
               for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for p in procs:
        out, _ = p.communicate(timeout=120)
        assert p.returncode == 0
        claimed.extend(int(x) for x in out.split())

    assert sorted(claimed) == list(range(n_chunks))
    # control file drained: both pointers met
    lo, hi = _struct.unpack("<qq", open(ctrl_path, "rb").read())
    assert lo == hi
