"""Validity checking with real teeth (reference checkValidity,
foldcomp.cpp:1492-1532 + error enum foldcomp.h:59-67).

fcz.parse(strict=False) clips tail arrays to the bytes actually present,
so truncation maps onto the reference's E_*_COUNT_MISMATCH codes; strict
parse (decode paths) raises FczFormatError so a bad entry is skipped.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

from conftest import require_fixture

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from foldcomp_tpu.codec import fcz  # noqa: E402
from foldcomp_tpu.codec.extract import (  # noqa: E402
    E_BACKBONE_COUNT_MISMATCH, E_EMPTY_BACKBONE_ANGLE,
    E_SIDECHAIN_COUNT_MISMATCH, E_TEMP_FACTOR_COUNT_MISMATCH, SUCCESS,
    check_validity)

REF_BIN = os.environ.get("FOLDCOMP_REF_BIN", "/tmp/refbuild/foldcomp")
needs_ref = pytest.mark.skipif(not os.path.exists(REF_BIN),
                               reason="reference binary not built")


def _golden():
    return require_fixture("test_af.fcz").read_bytes()


def _section_offsets(blob):
    f = fcz.parse(blob)
    off = 4 + 72 + 4 * f.n_anchor + len(f.title) + 36 * f.n_anchor + 1 + 12
    return f, {
        "records": off,
        "sc": off + 8 * f.n_residue,
        "tf_disc": off + 8 * f.n_residue + f.n_sc_torsion,
        "tf": off + 8 * f.n_residue + f.n_sc_torsion + 8,
    }


def test_strict_parse_raises_on_truncation():
    blob = _golden()
    for cut in (len(blob) - 1, len(blob) // 2, 100, 77):
        with pytest.raises(fcz.FczFormatError):
            fcz.parse(blob[:cut])
    # and never leaks a raw IndexError/ValueError/struct.error
    for cut in range(4, min(len(blob), 300), 7):
        try:
            fcz.parse(blob[:cut])
        except fcz.FczFormatError:
            pass


def test_truncation_maps_to_reference_error_codes():
    blob = _golden()
    f, offs = _section_offsets(blob)
    # cut inside the record array -> backbone count mismatch
    cut = offs["records"] + 8 * (f.n_residue // 2)
    assert check_validity(fcz.parse(blob[:cut], strict=False)) \
        == E_BACKBONE_COUNT_MISMATCH
    # cut inside the side-chain codes -> side-chain count mismatch
    cut = offs["sc"] + f.n_sc_torsion // 2
    assert check_validity(fcz.parse(blob[:cut], strict=False)) \
        == E_SIDECHAIN_COUNT_MISMATCH
    # cut inside the tempFactor codes -> tempFactor count mismatch
    cut = offs["tf"] + f.n_residue // 2
    assert check_validity(fcz.parse(blob[:cut], strict=False)) \
        == E_TEMP_FACTOR_COUNT_MISMATCH
    # intact stream -> SUCCESS
    assert check_validity(fcz.parse(blob, strict=False)) == SUCCESS


def test_zeroed_backbone_flags_empty():
    blob = bytearray(_golden())
    f, offs = _section_offsets(bytes(blob))
    blob[offs["records"]:offs["sc"]] = bytes(8 * f.n_residue)
    parsed = fcz.parse(bytes(blob), strict=False)
    assert check_validity(parsed) == E_EMPTY_BACKBONE_ANGLE


@needs_ref
def test_check_cli_ab_on_corrupt_input(tmp_path):
    """A/B the `check` subcommand stderr against the reference binary on a
    zeroed-backbone stream (the corruption class both sides can detect)."""
    blob = bytearray(_golden())
    f, offs = _section_offsets(bytes(blob))
    blob[offs["records"]:offs["sc"]] = bytes(8 * f.n_residue)
    bad = tmp_path / "bad.fcz"
    bad.write_bytes(bytes(blob))

    ref = subprocess.run([REF_BIN, "check", str(bad)], capture_output=True,
                         text=True)
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    ours = subprocess.run([sys.executable, "-m", "foldcomp_tpu", "check",
                           str(bad)], capture_output=True, text=True, env=env)

    def messages(text):
        return sorted(line for line in text.splitlines()
                      if line.startswith("[Error]"))

    assert messages(ours.stderr) == messages(ref.stderr)
    assert any("All backbone angles are empty" in m
               for m in messages(ours.stderr))


def test_threshold_validation():
    from foldcomp_tpu import api
    pdb = require_fixture("test.pdb").read_text()
    with pytest.raises(api.FoldcompError):
        api.compress("x", pdb, anchor_residue_threshold=0)
    # native layer: -b 0 must not SIGFPE; chain/threshold combos that would
    # overflow the uint8 anchor count must error, not truncate
    from foldcomp_tpu.codec.encoder import EncodeError, encode
    from foldcomp_tpu.io.pdb import parse_pdb
    atoms = parse_pdb(pdb, "test")
    with pytest.raises(EncodeError):
        encode(atoms, anchor_threshold=0)
    with pytest.raises(EncodeError, match="255"):
        encode(atoms, anchor_threshold=1)  # 276 residues -> 278 anchors


def test_cli_rejects_bad_threshold():
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run([sys.executable, "-m", "foldcomp_tpu", "compress",
                       "-b", "0", "in.pdb", "out.fcz"],
                       capture_output=True, text=True, env=env)
    assert r.returncode == 1
    assert "Anchor threshold" in r.stderr
