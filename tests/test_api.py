"""foldcomp-compatible Python API tests.

Modeled on the reference pytest suite (test/test_foldcomp.py:5-27):
compress->decompress roundtrip, full-db iteration, id-subset iteration, and
str-path open — plus get_data key/shape checks.
"""
import numpy as np
import pytest

import foldcomp_tpu as foldcomp
from foldcomp_tpu.api import FoldcompError
from conftest import require_fixture


@pytest.fixture(scope="module")
def test_pdb_text():
    return require_fixture("test.pdb").read_text()


def test_roundtrip(test_pdb_text):
    fcz_bytes = foldcomp.compress("test", test_pdb_text)
    assert fcz_bytes[:4] == b"FCMP"
    name, pdb = foldcomp.decompress(fcz_bytes)
    assert name == "test"
    atoms_in = [l for l in test_pdb_text.splitlines() if l.startswith("ATOM")]
    atoms_out = [l for l in pdb.splitlines() if l.startswith("ATOM")]
    assert len(atoms_out) == len(atoms_in)


def test_compress_multichain_rejected():
    multichain = require_fixture("multichain.pdb").read_text()
    with pytest.raises(FoldcompError, match="Multiple chains"):
        foldcomp.compress("mc", multichain)
    chains = foldcomp.split_pdb_by_chain(multichain)
    assert len(chains) > 1
    for chain_str in chains:
        assert foldcomp.compress("mc", chain_str)[:4] == b"FCMP"


def test_open_full_db(ref_test_dir):
    db_path = ref_test_dir / "example_db"
    with foldcomp.open(str(db_path)) as db:
        assert len(db) > 0
        n = 0
        for name, pdb in db:
            assert "ATOM" in pdb
            n += 1
        assert n == len(db)


def test_open_ids_subset(ref_test_dir):
    db_path = ref_test_dir / "example_db"
    subset = (ref_test_dir / "example_db.subset").read_text().split()
    ids = subset[:2]
    with foldcomp.open(str(db_path), ids=ids) as db:
        assert len(db) == len(ids)
        names = [name for name, _ in db]
        assert names == ids


def test_open_raw_bytes(ref_test_dir):
    with foldcomp.open(str(ref_test_dir / "example_db"),
                       decompress=False) as db:
        entry = db[0]
        assert isinstance(entry, bytes)
        assert entry[:4] == b"FCMP"


def test_open_missing_id_err(ref_test_dir):
    with pytest.raises(KeyError):
        foldcomp.open(str(ref_test_dir / "example_db"),
                      ids=["nonexistent-id"], err_on_missing=True)


def test_get_data_from_fcz():
    blob = require_fixture("test_af.fcz").read_bytes()
    d = foldcomp.get_data(blob)
    for key in ("phi", "psi", "omega", "torsion_angles", "bond_angles",
                "residues", "b_factors", "coordinates"):
        assert key in d, key
    n = len(d["residues"])
    assert len(d["phi"]) == n
    assert len(d["b_factors"]) == n
    assert len(d["torsion_angles"]) == 3 * (n - 1)
    assert len(d["coordinates"][0]) == 3


def test_get_data_from_pdb(test_pdb_text):
    d = foldcomp.get_data(test_pdb_text)
    n = len(d["residues"])
    assert n > 100
    assert len(d["phi"]) == n - 1
    assert len(d["b_factors"]) == n
    # raw angle streams: 3n-3 torsions, 3n-2 bond angles
    assert len(d["torsion_angles"]) == 3 * n - 3
    assert len(d["bond_angles"]) == 3 * n - 2
