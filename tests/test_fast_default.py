"""TPU-default decode path selection (VERDICT round-1 item 10).

Batch decompress defaults to the batched device decode when an accelerator
backend is present and the job is large enough to amortize startup;
--exact forces the native path; small jobs and single files stay exact.
"""
import os
import sys

import numpy as np
import pytest

from conftest import require_fixture

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from foldcomp_tpu import cli  # noqa: E402


@pytest.fixture
def fcz_dir(tmp_path):
    """Directory of fcz files decompressable both ways."""
    src = require_fixture("test_af.fcz").read_bytes()
    d = tmp_path / "fczs"
    d.mkdir()
    for i in range(8):
        (d / f"p{i}.fcz").write_bytes(src)
    return d


def _decompress(argv):
    rc = cli.main(argv)
    assert rc == 0


def test_fast_default_engages(monkeypatch, tmp_path, fcz_dir):
    monkeypatch.setattr(cli, "FAST_DEFAULT_MIN", 4)
    monkeypatch.setattr(cli, "_accelerator_present", lambda: True)
    out_auto = tmp_path / "auto"
    out_exact = tmp_path / "exact"
    _decompress(["decompress", "-y", str(fcz_dir), str(out_auto)])
    _decompress(["decompress", "-y", "--exact", str(fcz_dir),
                 str(out_exact)])
    names = sorted(os.listdir(out_auto))
    assert names == sorted(os.listdir(out_exact)) and len(names) == 8
    # fast output holds the decode gate vs the exact path
    from foldcomp_tpu.core.exact import rmsd
    from foldcomp_tpu.io.pdb import parse_pdb
    for n in names:
        a = parse_pdb((out_auto / n).read_bytes())
        b = parse_pdb((out_exact / n).read_bytes())
        assert a.atom_name == b.atom_name
        assert rmsd(a.coords, b.coords) < 1e-3


def test_fast_default_skips_small_jobs(monkeypatch, tmp_path, fcz_dir):
    """Below the threshold the probe must not even run (no jax import cost
    for small jobs)."""
    probed = []
    monkeypatch.setattr(cli, "_accelerator_present",
                        lambda: probed.append(1) or True)
    out = tmp_path / "out"
    _decompress(["decompress", "-y", str(fcz_dir), str(out)])
    assert not probed  # 8 entries < FAST_DEFAULT_MIN
    assert len(os.listdir(out)) == 8


def test_exact_flag_forces_native(monkeypatch, tmp_path, fcz_dir):
    monkeypatch.setattr(cli, "FAST_DEFAULT_MIN", 4)
    called = []
    monkeypatch.setattr(cli, "_accelerator_present",
                        lambda: called.append(1) or True)
    out = tmp_path / "out"
    _decompress(["decompress", "-y", "--exact", str(fcz_dir), str(out)])
    assert not called  # --exact short-circuits the probe
    # byte-identical to the reference decode of the golden file
    from foldcomp_tpu.codec import fcz as fcz_mod
    from foldcomp_tpu.codec.decoder import decode
    from foldcomp_tpu.io.pdb import format_pdb
    f = fcz_mod.parse(require_fixture("test_af.fcz").read_bytes())
    want = format_pdb(decode(f), f.title)
    got = (out / "p0.pdb").read_text()
    assert got == want


def test_slow_link_keeps_native(monkeypatch, tmp_path, fcz_dir, capsys):
    """A TPU behind a slow host<->device link must NOT auto-engage the
    coordinate-streaming fast path (the D2H ship would bound e2e below
    the native codec)."""
    monkeypatch.setattr(cli, "FAST_DEFAULT_MIN", 4)
    monkeypatch.setattr(cli, "_accelerator_present", lambda: True)
    monkeypatch.setattr(cli, "_device_link_ok", lambda: False)
    out = tmp_path / "out"
    _decompress(["decompress", "-y", str(fcz_dir), str(out)])
    assert "link is too slow" in capsys.readouterr().err
    # output is the byte-exact native decode
    from foldcomp_tpu.codec import fcz as fcz_mod
    from foldcomp_tpu.codec.decoder import decode
    from foldcomp_tpu.io.pdb import format_pdb
    f = fcz_mod.parse(require_fixture("test_af.fcz").read_bytes())
    assert (out / "p0.pdb").read_text() == format_pdb(decode(f), f.title)


def test_device_link_probe_override_and_mapping(monkeypatch):
    """FOLDCOMP_TPU_LINK pins the subprocess probe, and the two CLI
    seams map its three states correctly."""
    for forced, present, ok in (("ok", True, True),
                                ("slow", True, False),
                                ("none", False, False)):
        monkeypatch.setenv("FOLDCOMP_TPU_LINK", forced)
        assert cli._probe_device() == forced
        assert cli._accelerator_present() is present
        assert cli._device_link_ok() is ok


def test_device_link_probe_cache(monkeypatch, tmp_path):
    """Without the override the probe consults the on-disk cache before
    spawning a probe subprocess."""
    import json
    import os as _os
    import time as _time

    monkeypatch.delenv("FOLDCOMP_TPU_LINK", raising=False)
    monkeypatch.setenv("TMPDIR", str(tmp_path))
    import tempfile
    tempfile.tempdir = None  # re-read TMPDIR
    try:
        cache = tmp_path / f"foldcomp_tpu_probe_{_os.getuid()}.json"
        cache.write_text(json.dumps(dict(ts=_time.time(), result="slow")))
        assert cli._probe_device() == "slow"
        cache.write_text(json.dumps(dict(ts=0, result="ok")))  # expired
        # expired cache -> real subprocess probe; accept any valid state
        assert cli._probe_device() in ("ok", "slow", "none")
    finally:
        tempfile.tempdir = None
