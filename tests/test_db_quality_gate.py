"""Database-level quality gate: every example_db entry roundtrips cleanly.

Extends the reference's single-structure RMSD gates to the whole fixture
database, through both the exact and the batched (fast) decoders.
"""
import numpy as np
import pytest

from conftest import require_fixture

from foldcomp_tpu.codec import fcz
from foldcomp_tpu.codec.batch import decode_fcz_batch
from foldcomp_tpu.codec.decoder import decode
from foldcomp_tpu.core.exact import rmsd
from foldcomp_tpu.io.db import DatabaseReader


@pytest.fixture(scope="module")
def db_payloads(ref_test_dir):
    require_fixture("example_db.dbtype")
    with DatabaseReader(str(ref_test_dir / "example_db")) as r:
        out = []
        for pos in range(len(r)):
            blob = r.get_data(pos)
            out.append(fcz.parse(blob.rstrip(b"\x00")))
        return out


def test_all_entries_decode_exact(db_payloads):
    assert len(db_payloads) == 24
    for f in db_payloads:
        atoms = decode(f)
        # decoded count can undershoot header nAtom when residues decode as
        # UNK (backbone-only) — the reference behaves identically
        # (e.g. d1b0ba_: 1035 atoms vs nAtom=1037)
        assert 0 < len(atoms) <= f.n_atom
        assert np.isfinite(atoms.coords).all()


def test_fast_decode_matches_exact_on_whole_db(db_payloads):
    fast = decode_fcz_batch(db_payloads, refine_iters=2)
    for f, fa in zip(db_payloads, fast):
        ex = decode(f)
        assert ex.atom_name == fa.atom_name
        r = rmsd(ex.coords, fa.coords)
        assert r < 2e-3, (f.title, r)
