"""Index cache, GCS processor (fake client), and misc IO behaviors."""
import os

import pytest

from conftest import require_fixture

from foldcomp_tpu.io.db import DatabaseReader


def test_index_cache_roundtrip(tmp_path, ref_test_dir):
    import shutil

    db = tmp_path / "db"
    for suffix in ("", ".index", ".lookup", ".dbtype"):
        shutil.copy(ref_test_dir / ("example_db" + suffix),
                    str(db) + suffix)
    r1 = DatabaseReader(str(db), use_lookup=True, use_cache=True)
    n = len(r1)
    keys = [r1.get_key(i) for i in range(n)]
    data0 = r1.get_data(0)
    r1.close()
    assert os.path.exists(str(db) + ".index.cache")

    # second open loads from cache (no native handle)
    r2 = DatabaseReader(str(db), use_lookup=True, use_cache=True)
    assert r2._h is None, "cache hit should use the python array path"
    assert len(r2) == n
    assert [r2.get_key(i) for i in range(n)] == keys
    assert r2.get_data(0) == data0
    assert r2.position_of_key(keys[3]) == 3
    r2.close()

    # stale cache (older than index) is ignored and rewritten
    os.utime(str(db) + ".index.cache", (1, 1))
    r3 = DatabaseReader(str(db), use_lookup=True, use_cache=True)
    assert len(r3) == n
    r3.close()
    assert os.path.getmtime(str(db) + ".index.cache") > 1


class _FakeBlob:
    def __init__(self, name, payload):
        self.name = name
        self._payload = payload

    def download_as_bytes(self):
        return self._payload


class _FakeGcsClient:
    def __init__(self, blobs):
        self._blobs = blobs

    def bucket(self, name):
        return name

    def list_blobs(self, bucket, prefix=""):
        return [b for b in self._blobs if b.name.startswith(prefix)]


def test_iter_gcs_with_fake_client():
    from foldcomp_tpu.cli import iter_gcs

    pdb = require_fixture("test_af.pdb").read_bytes()
    client = _FakeGcsClient([
        _FakeBlob("proteomes/a.pdb", pdb),
        _FakeBlob("proteomes/sub/", b""),
        _FakeBlob("other/b.pdb", b"x"),
    ])
    got = list(iter_gcs("gcs://bucket/proteomes", client=client))
    assert got == [("proteomes/a.pdb", pdb)]


def test_iter_gcs_bucket_only_uri():
    from foldcomp_tpu.cli import iter_gcs

    client = _FakeGcsClient([_FakeBlob("x.pdb", b"data")])
    assert list(iter_gcs("gcs://bucket", client=client)) == [("x.pdb",
                                                              b"data")]
