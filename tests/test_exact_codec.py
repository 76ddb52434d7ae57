"""Golden tests for the exact (byte-compatible) FCZ codec.

Mirrors the reference e2e harness (build.sh:26-44 minimal_test): compress /
decompress roundtrips with the published RMSD gates, plus byte-level FCZ
equality against the checked-in golden test_af.fcz.
"""
import numpy as np
import pytest

from foldcomp_tpu.codec import fcz
from foldcomp_tpu.codec.decoder import decode
from foldcomp_tpu.codec.encoder import encode
from foldcomp_tpu.core import exact
from foldcomp_tpu.io.cif import parse_cif
from foldcomp_tpu.io.pdb import format_pdb, parse_pdb
from foldcomp_tpu.io.structure import (identify_chains,
                                       identify_discontinuous_fragments,
                                       remove_alternative_positions)

from conftest import require_fixture


def _compress_pdb(path, base):
    atoms = parse_pdb(open(path).read(), default_title=base + ".pdb")
    title = base if atoms.title == base + ".pdb" else atoms.title
    atoms = remove_alternative_positions(atoms)
    return atoms, encode(atoms, title=title)


def _ulp_close(a, b, ulps=1):
    av = np.asarray(a, np.float32).view(np.int32).astype(np.int64)
    bv = np.asarray(b, np.float32).view(np.int32).astype(np.int64)
    return np.all(np.abs(av - bv) <= ulps)


def test_encode_golden_bytes_af():
    """FCZ encode equality vs the checked-in golden (padding masked; header
    floats tolerate the 1-ulp compiler-vintage drift of the golden file —
    fresh builds of the reference produce our bytes exactly)."""
    path = require_fixture("test_af.pdb")
    golden = require_fixture("test_af.fcz").read_bytes()
    _, f = _compress_pdb(path, "test_af")
    blob = fcz.serialize(f)
    assert len(blob) == len(golden)
    g = fcz.parse(golden)
    m = fcz.parse(blob)
    assert np.array_equal(m.records, g.records)
    assert np.array_equal(m.sc_codes, g.sc_codes)
    assert np.array_equal(m.tf_codes, g.tf_codes)
    assert np.array_equal(m.anchor_indices, g.anchor_indices)
    assert np.array_equal(m.anchor_coords, g.anchor_coords)
    assert m.title == g.title
    assert _ulp_close(m.mins, g.mins, ulps=2)
    # a 1-ulp min/max difference in the golden cascades into cont_f = range/255
    assert np.allclose(m.cont_fs, g.cont_fs, rtol=1e-5)
    assert m.tf_min == g.tf_min and m.tf_cont == g.tf_cont
    # strict mode: everything outside header floats must be byte-equal
    assert blob[76:] == golden[76:]
    assert blob[:14] == golden[:14]


def test_roundtrip_rmsd_test_pdb():
    path = require_fixture("test.pdb")
    atoms, f = _compress_pdb(path, "test")
    blob = fcz.serialize(f)
    out = decode(fcz.parse(blob))
    # the reference CI gate: all-atom RMSD 0.0826751 +- 0.001 (build.sh:35-36)
    text = format_pdb(out, out.title)
    reparsed = parse_pdb(text)
    r = exact.rmsd(atoms.coords, reparsed.coords)
    assert abs(r - 0.0826751) < 0.001, r


def test_roundtrip_rmsd_cif():
    path = require_fixture("test.cif.gz")
    atoms = parse_cif(path.read_bytes(), default_title="test.cif")
    atoms = remove_alternative_positions(atoms)
    f = encode(atoms, title=atoms.title)
    out = decode(fcz.parse(fcz.serialize(f)), use_alt_order=True)
    text = format_pdb(out, out.title)
    reparsed = parse_pdb(text)
    # build.sh:37-38 gate with -a decompression
    r = exact.rmsd(atoms.coords, reparsed.coords)
    assert abs(r - 0.130284) < 0.001, r


def test_decode_checked_in_golden_fcz():
    golden = require_fixture("test_af.fcz").read_bytes()
    orig = parse_pdb(require_fixture("test_af.pdb").read_text())
    out = decode(fcz.parse(golden), use_alt_order=True)
    assert len(out) == len(orig)
    r = exact.rmsd(orig.coords, out.coords)
    assert r < 0.14, r
    # sequence restored
    assert out.residue_name[:3] == orig.residue_name[:3]


def test_multichain_fragmentation():
    path = require_fixture("multichain.pdb")
    atoms = parse_pdb(path.read_text(), default_title="multichain.pdb")
    atoms = remove_alternative_positions(atoms)
    chains = identify_chains(atoms)
    assert len(chains) == 2
    frag_counts = [len(identify_discontinuous_fragments(atoms, s, e))
                   for s, e in chains]
    assert frag_counts == [1, 2]
    # every fragment encodes and roundtrips
    for (cs, ce) in chains:
        for (fs, fe) in identify_discontinuous_fragments(atoms, cs, ce):
            frag = atoms.slice(fs, fe)
            f = encode(frag, title="6PP9")
            out = decode(fcz.parse(fcz.serialize(f)))
            bb = [i for i in range(len(frag))
                  if frag.atom_name[i] in ("N", "CA", "C")]
            assert f.n_residue == len(bb) // 3
            assert len(out) > 0


def test_fcz_parse_serialize_identity():
    golden = require_fixture("test_af.fcz").read_bytes()
    f = fcz.parse(golden)
    blob = fcz.serialize(f)
    assert fcz.equal_with_padding_mask(blob, golden)


def test_bitpack_roundtrip():
    rng = np.random.RandomState(0)
    n = 257
    fields = dict(
        residue=rng.randint(0, 32, n), phi=rng.randint(0, 4096, n),
        psi=rng.randint(0, 4096, n), omega=rng.randint(0, 2048, n),
        n_ca_c=rng.randint(0, 256, n), ca_c_n=rng.randint(0, 256, n),
        c_n_ca=rng.randint(0, 256, n))
    rec = fcz.pack_records(fields["residue"], fields["phi"], fields["psi"],
                           fields["omega"], fields["n_ca_c"],
                           fields["ca_c_n"], fields["c_n_ca"])
    res, phi, psi, omega, ncac, cacn, cnca = fcz.unpack_records(rec)
    assert np.array_equal(res, fields["residue"])
    assert np.array_equal(phi, fields["phi"])
    assert np.array_equal(psi, fields["psi"])
    assert np.array_equal(omega, fields["omega"])
    assert np.array_equal(ncac, fields["n_ca_c"])
    assert np.array_equal(cacn, fields["ca_c_n"])
    assert np.array_equal(cnca, fields["c_n_ca"])


def test_discretizer_reference_semantics():
    # round-half-up vector path vs truncating scalar path (discretizer.cpp:43-57)
    vals = np.asarray([0.0, 0.4999, 0.5001, 179.9, -179.9], np.float32)
    d = exact.Discretizer(vals, 255)
    codes = d.discretize(vals)
    rest = d.continuize(codes)
    assert np.max(np.abs(rest - vals)) <= d.cont_f * 0.5 + 1e-4
    fixed = exact.FixedAngleDiscretizer(255)
    t = fixed.discretize_trunc(np.asarray([-180.0, 0.0, 179.9], np.float32))
    assert t[0] == 0
    assert t[1] == 127  # (0+180)*255/360 = 127.5 -> trunc 127
