"""Native IO runtime (native/fcio.c) vs pure-Python fallbacks."""
import os

import numpy as np
import pytest

from conftest import require_fixture

from foldcomp_tpu import native

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native library unavailable")
    return lib


def _python_format(atoms, title):
    os.environ["FOLDCOMP_TPU_NO_NATIVE"] = "1"
    try:
        # force the pure-python path by calling the module internals
        from foldcomp_tpu.io import pdb

        saved_lib, saved_tried = native._LIB, native._TRIED
        native._LIB, native._TRIED = None, True
        try:
            return pdb.format_pdb(atoms, title)
        finally:
            native._LIB, native._TRIED = saved_lib, saved_tried
    finally:
        del os.environ["FOLDCOMP_TPU_NO_NATIVE"]


def test_format_parity(lib):
    from foldcomp_tpu.io.pdb import parse_pdb

    data = require_fixture("test.pdb").read_bytes()
    atoms = parse_pdb(data)
    py = _python_format(atoms, "SOME TITLE " * 10)
    nat = native.format_pdb_native(atoms, "SOME TITLE " * 10)
    assert py == nat


def test_parse_parity(lib):
    data = require_fixture("test_af.pdb").read_bytes()
    d = native.parse_pdb_native(data)
    # python reference parse
    saved_lib, saved_tried = native._LIB, native._TRIED
    native._LIB, native._TRIED = None, True
    try:
        from foldcomp_tpu.io.pdb import parse_pdb
        atoms = parse_pdb(data)
    finally:
        native._LIB, native._TRIED = saved_lib, saved_tried
    assert d["atom_name"] == atoms.atom_name
    assert d["residue_name"] == atoms.residue_name
    assert d["chain"] == atoms.chain
    assert np.array_equal(d["coords"], atoms.coords)
    assert np.array_equal(d["temp_factor"], atoms.temp_factor)
    assert d["title"] == atoms.title


def test_negative_coords_and_bfactors(lib):
    """fast_ftoa edge: negative values round toward zero then negate."""
    from foldcomp_tpu.io.structure import AtomArray

    coords = np.asarray([[-0.0005, -123.9999, 0.0004],
                         [9999.1234, -0.001, 1.0]], np.float32)
    atoms = AtomArray(["N", "CA"], ["ALA", "ALA"], ["A", "A"],
                      np.asarray([1, 2], np.int32),
                      np.asarray([1, 1], np.int32), coords,
                      np.ones(2, np.float32),
                      np.asarray([-3.21, 99.999], np.float32), "")
    py = _python_format(atoms, "")
    nat = native.format_pdb_native(atoms, "")
    assert py == nat


def test_db_reader_native(lib, ref_test_dir):
    from foldcomp_tpu.io.db import DatabaseReader

    db = str(ref_test_dir / "example_db")
    r = DatabaseReader(db)
    assert r._h is not None, "native reader should be active"
    n = len(r)
    assert n > 0
    # parity with the pure-python reader
    saved_lib, saved_tried = native._LIB, native._TRIED
    native._LIB, native._TRIED = None, True
    try:
        rp = DatabaseReader(db)
    finally:
        native._LIB, native._TRIED = saved_lib, saved_tried
    assert rp._h is None
    assert len(rp) == n
    for pos in range(n):
        assert r.get_key(pos) == rp.get_key(pos)
        assert r.get_data(pos) == rp.get_data(pos)
    key = r.get_key(n // 2)
    assert r.position_of_key(key) == rp.position_of_key(key)
    assert r.position_of_key(10 ** 9) == -1
    r.close()
    rp.close()


def test_native_exact_decode_parity(lib):
    """Native fcz_decode_pdb is byte-identical to the Python exact path."""
    from foldcomp_tpu.codec import fcz
    from foldcomp_tpu.codec.decoder import decode
    from foldcomp_tpu.io.pdb import format_pdb

    blob = require_fixture("test_af.fcz").read_bytes()
    f = fcz.parse(blob)
    for use_alt in (False, True):
        py = format_pdb(decode(f, use_alt_order=use_alt), f.title)
        nat = native.decode_fcz_pdb_native(blob, use_alt=use_alt)
        assert py == nat, f"use_alt={use_alt}"


def test_native_exact_decode_bad_magic(lib):
    with pytest.raises(ValueError):
        native.decode_fcz_pdb_native(b"NOTFCZ_________________")


def test_db_writer_native_roundtrip(lib, tmp_path):
    import ctypes

    from foldcomp_tpu.io.db import DatabaseReader

    db = str(tmp_path / "natdb")
    h = lib.fcdb_writer_open(db.encode())
    assert h
    # append out of order: close() must stable-sort by key
    for key, name, payload in ((2, "b", b"BBBB\x00"), (1, "a", b"AA\x00"),
                               (3, "c", b"CCCCCC\x00")):
        assert lib.fcdb_writer_append(h, payload, len(payload), key,
                                      name.encode()) == 0
    assert lib.fcdb_writer_close(h) == 0

    r = DatabaseReader(db)
    assert [r.get_key(i) for i in range(len(r))] == [1, 2, 3]
    assert r.get_data(r.position_of_key(2)) == b"BBBB\x00"
    assert r.lookup_key("c") == 3
    r.close()


def test_decoder_fuzz_robustness(lib):
    """Mutated/truncated FCZ streams must never crash the native decoder
    (run in a subprocess so a crash fails the test instead of pytest)."""
    import subprocess
    import sys

    code = r'''
import sys
sys.path.insert(0, %r)
import numpy as np
from foldcomp_tpu.native import decode_fcz_pdb_native
blob = open(%r, "rb").read()
rng = np.random.default_rng(123)
for trial in range(800):
    b = bytearray(blob)
    kind = trial %% 4
    if kind == 0:
        for _ in range(rng.integers(1, 16)):
            b[rng.integers(0, len(b))] = rng.integers(0, 256)
    elif kind == 1:
        b = b[:rng.integers(4, len(b))]
    elif kind == 2:
        for off in rng.integers(4, 76, size=6):
            b[off] = rng.integers(0, 256)
    else:
        for off in rng.integers(76, 88, size=4):
            b[off] = rng.integers(0, 256)
    try:
        decode_fcz_pdb_native(bytes(b))
    except ValueError:
        pass
print("ok")
''' % (REPO_ROOT, str(require_fixture("test_af.fcz")))
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-1000:]
    assert "ok" in r.stdout


def test_database_writer_backends_identical(tmp_path):
    """The native-backed DatabaseWriter and the pure-Python fallback
    produce byte-identical data/index/lookup/dbtype files (out-of-order
    keys included: both stable-sort on close)."""
    from foldcomp_tpu.io import db as db_mod

    entries = [(5, b"five\x00", "e5"), (1, b"one\x00", "e1"),
               (3, b"three\x00", "e3"), (1, b"one2\x00", "dup")]

    def build(path, force_python):
        w = db_mod.DatabaseWriter(str(path))
        if force_python and w._h is not None:
            # release the native handle and rebuild as pure Python
            w._lib.fcdb_writer_close(w._h)
            w._h = None
            w._data = open(str(path), "wb")
            w._entries = []
            w._sorted = True
        for key, data, name in entries:
            w.append(data, key, name)
        w.close()

    build(tmp_path / "nat", force_python=False)
    build(tmp_path / "py", force_python=True)
    for suffix in ("", ".index", ".lookup", ".dbtype"):
        a = (tmp_path / ("nat" + suffix)).read_bytes()
        b = (tmp_path / ("py" + suffix)).read_bytes()
        assert a == b, suffix
