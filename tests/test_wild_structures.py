"""Wild-structure robustness: differential fuzz vs the reference binary.

The reference parses anything gemmi parses (structure_reader.cpp:74-126);
this suite feeds synthesized PDBs/mmCIFs with real-world pathologies —
hydrogens, HETATM/MSE, insertion codes, MODEL/ENDMDL, negative and
overflowing resSeq, missing side-chain atoms, garbage records, extreme
lengths — through BOTH tools and asserts byte parity of the FCZ (or
pinned, strictly-better behavior where the reference crashes or reads
uninitialized memory; each such case cites the reference defect).

Generation is seeded, so the corpus is reproducible; every case that the
reference handles must match byte-for-byte (padding-masked, same-name
outputs so embedded titles agree).
"""
import os
import subprocess

import numpy as np
import pytest

from test_property_roundtrip import synthesize

from foldcomp_tpu.codec import fcz
from foldcomp_tpu.codec.fcz import equal_with_padding_mask
from foldcomp_tpu.io.pdb import format_pdb

REF_BIN = os.environ.get("FOLDCOMP_REF_BIN", "/tmp/refbuild/foldcomp")
needs_ref = pytest.mark.skipif(not os.path.exists(REF_BIN),
                               reason="reference binary not built")

import pathlib
import sys

_REPO = pathlib.Path(__file__).resolve().parent.parent


def run_cli(*args):
    env = dict(os.environ, PYTHONPATH=str(_REPO))
    return subprocess.run([sys.executable, "-m", "foldcomp_tpu", *args],
                          capture_output=True, env=env)


def run_ref(*args, timeout=60):
    return subprocess.run([REF_BIN, *args], capture_output=True,
                          timeout=timeout)


def _base_text(n_res=30, seed=0):
    return format_pdb(synthesize(n_res, seed), "wild")


def _with_hydrogens(text):
    out = []
    for line in text.splitlines():
        out.append(line)
        if line.startswith("ATOM") and line[12:16].strip() == "N":
            out.append(line[:12] + "  H " + line[16:])
    return "\n".join(out) + "\n"


def _with_inscode(text, res="5"):
    out = []
    for line in text.splitlines():
        if line.startswith("ATOM") and line[22:26].strip() == res:
            line = line[:26] + "A" + line[27:]
        out.append(line)
    return "\n".join(out) + "\n"


def _with_model_wrapper(text):
    return "MODEL        1\n" + text + "ENDMDL\nEND\n"


def _with_shifted_resseq(text, shift):
    out = []
    for line in text.splitlines():
        if line.startswith(("ATOM", "HETATM")):
            rs = int(line[22:26]) + shift
            line = line[:22] + f"{rs:4d}" + line[26:]
        out.append(line)
    return "\n".join(out) + "\n"


def _without_atom(text, name):
    return "\n".join(
        line for line in text.splitlines()
        if not (line.startswith("ATOM")
                and line[12:16].strip() == name)) + "\n"


def _with_garbage(text):
    out = []
    for i, line in enumerate(text.splitlines()):
        out.append(line)
        if i == 5:
            out.append("REMARK   1 interleaved garbage")
        if i == 9:
            out.append("SIGATM bogus record type")
    return "\n".join(out) + "\n"


def _as_mmcif(text, block="WILD"):
    """Minimal atom_site mmCIF of the same structure."""
    rows = []
    serial = 0
    for line in text.splitlines():
        if not line.startswith("ATOM"):
            continue
        serial += 1
        name = line[12:16].strip()
        res = line[17:20].strip()
        chain = line[21]
        seq = int(line[22:26])
        x, y, z = line[30:38], line[38:46], line[46:54]
        occ, tf = line[54:60], line[60:66]
        elem = name[0]
        rows.append(f"ATOM {serial} {elem} {name} . {res} {chain} 1 {seq} "
                    f"? {x.strip()} {y.strip()} {z.strip()} {occ.strip()} "
                    f"{tf.strip()} {seq} {res} {chain} {name} 1")
    head = (f"data_{block}\n#\nloop_\n"
            "_atom_site.group_PDB\n_atom_site.id\n"
            "_atom_site.type_symbol\n_atom_site.label_atom_id\n"
            "_atom_site.label_alt_id\n_atom_site.label_comp_id\n"
            "_atom_site.label_asym_id\n_atom_site.label_entity_id\n"
            "_atom_site.label_seq_id\n_atom_site.pdbx_PDB_ins_code\n"
            "_atom_site.Cartn_x\n_atom_site.Cartn_y\n_atom_site.Cartn_z\n"
            "_atom_site.occupancy\n_atom_site.B_iso_or_equiv\n"
            "_atom_site.auth_seq_id\n_atom_site.auth_comp_id\n"
            "_atom_site.auth_asym_id\n_atom_site.auth_atom_id\n"
            "_atom_site.pdbx_PDB_model_num\n")
    return head + "\n".join(rows) + "\n#\n"


# ---- cases the reference handles: byte parity required -----------------

PARITY_CASES = {
    "plain": lambda: _base_text(30, 0),
    "hydrogens": lambda: _with_hydrogens(_base_text(30, 1)),
    "inscode": lambda: _with_inscode(_base_text(30, 2)),
    "model_wrapper": lambda: _with_model_wrapper(_base_text(30, 3)),
    "negative_resseq": lambda: _with_shifted_resseq(_base_text(30, 4), -10),
    "missing_sidechain": lambda: _without_atom(_base_text(30, 5), "CG"),
    "garbage_records": lambda: _with_garbage(_base_text(30, 6)),
    "proline_rich": lambda: _base_text(64, 7),
    "long_1200": lambda: _base_text(1200, 8),
    "tiny_2res": lambda: _base_text(2, 9),
}


@needs_ref
@pytest.mark.parametrize("case", sorted(PARITY_CASES))
def test_ab_parity_wild_pdb(case, tmp_path):
    (tmp_path / f"{case}.pdb").write_text(PARITY_CASES[case]())
    ours = tmp_path / "O"
    theirs = tmp_path / "R"
    ours.mkdir()
    theirs.mkdir()
    r = run_ref("compress", "-y", str(tmp_path / f"{case}.pdb"),
                str(theirs / f"{case}.fcz"))
    assert r.returncode == 0, r.stderr[-500:]
    o = run_cli("compress", "-y", str(tmp_path / f"{case}.pdb"),
                str(ours / f"{case}.fcz"))
    assert o.returncode == 0, o.stderr[-500:]
    assert equal_with_padding_mask(
        (ours / f"{case}.fcz").read_bytes(),
        (theirs / f"{case}.fcz").read_bytes()), case
    # and the decompressed text must be byte-identical too
    r = run_ref("decompress", "-y", str(theirs / f"{case}.fcz"),
                str(theirs / "out.pdb"))
    assert r.returncode == 0
    o = run_cli("decompress", "-y", str(ours / f"{case}.fcz"),
                str(ours / "out.pdb"))
    assert o.returncode == 0
    assert (ours / "out.pdb").read_bytes() == \
        (theirs / "out.pdb").read_bytes(), case


@needs_ref
def test_ab_parity_wild_mmcif(tmp_path):
    """Same structure through the mmCIF route on both tools."""
    text = _base_text(40, 10)
    (tmp_path / "w.cif").write_text(_as_mmcif(text))
    # a CIF without _entry.id/_struct.title falls back to a title derived
    # from the output path — run each tool from its own cwd with the SAME
    # relative output name so the embedded titles agree
    (tmp_path / "O").mkdir()
    (tmp_path / "R").mkdir()
    env = dict(os.environ, PYTHONPATH=str(_REPO))
    r = subprocess.run([REF_BIN, "compress", "-y", "../w.cif", "r.fcz"],
                       capture_output=True, cwd=tmp_path / "R")
    assert r.returncode == 0, r.stderr[-500:]
    o = subprocess.run([sys.executable, "-m", "foldcomp_tpu", "compress",
                        "-y", "../w.cif", "r.fcz"],
                       capture_output=True, env=env, cwd=tmp_path / "O")
    assert o.returncode == 0, o.stderr[-500:]
    assert equal_with_padding_mask((tmp_path / "O" / "r.fcz").read_bytes(),
                                   (tmp_path / "R" / "r.fcz").read_bytes())


# ---- cases where the reference is broken: pin OUR behavior -------------

@needs_ref
def test_reference_crashes_multimodel_we_handle(tmp_path):
    """Two MODELs: the reference segfaults (gemmi multi-model list vs
    single-model assumptions in structure_reader.cpp); we compress the
    first model deterministically."""
    text = ("MODEL        1\n" + _base_text(20, 11) + "ENDMDL\n"
            "MODEL        2\n" + _base_text(20, 12) + "ENDMDL\nEND\n")
    (tmp_path / "m.pdb").write_text(text)
    r = run_ref("compress", "-y", str(tmp_path / "m.pdb"),
                str(tmp_path / "r.fcz"))
    assert r.returncode != 0          # segfault/abort — pinned defect
    o = run_cli("compress", "-y", str(tmp_path / "m.pdb"),
                str(tmp_path / "o.fcz"))
    assert o.returncode == 0, o.stderr[-500:]
    f = fcz.parse((tmp_path / "o.fcz").read_bytes())
    assert f.n_residue == 20


@needs_ref
def test_reference_aborts_mse_we_skip(tmp_path):
    """HETATM/MSE: the reference aborts (std::out_of_range in the AA
    table map); we log the unknown residue and skip the entry."""
    text = _base_text(30, 13)
    out = []
    for line in text.splitlines():
        if line.startswith("ATOM") and line[17:20] == "MET":
            line = "HETATM" + line[6:17] + "MSE" + line[20:]
        out.append(line)
    (tmp_path / "m.pdb").write_text("\n".join(out) + "\n")
    r = run_ref("compress", "-y", str(tmp_path / "m.pdb"),
                str(tmp_path / "r.fcz"))
    assert r.returncode != 0          # abort — pinned defect
    o = run_cli("compress", "-y", str(tmp_path / "m.pdb"),
                str(tmp_path / "o.fcz"))
    assert b"unknown residue" in o.stderr or b"unknown residue" in o.stdout


@needs_ref
def test_reference_segfaults_resseq_wrap_we_handle(tmp_path):
    """resSeq crossing 9999 (wraps in fixed columns): reference
    segfaults; we compress the continuous fragment."""
    (tmp_path / "b.pdb").write_text(
        _with_shifted_resseq(_base_text(30, 14), 9979))
    r = run_ref("compress", "-y", str(tmp_path / "b.pdb"),
                str(tmp_path / "r.fcz"))
    assert r.returncode != 0
    o = run_cli("compress", "-y", str(tmp_path / "b.pdb"),
                str(tmp_path / "o.fcz"))
    assert o.returncode == 0, o.stderr[-500:]


@needs_ref
def test_reference_writes_garbage_one_residue_we_error(tmp_path):
    """1-residue input: the reference writes an FCZ its own decompress
    segfaults on; we reject with a clear error."""
    (tmp_path / "o.pdb").write_text(_base_text(1, 15))
    r = run_ref("compress", "-y", str(tmp_path / "o.pdb"),
                str(tmp_path / "r.fcz"))
    if r.returncode == 0:
        rd = run_ref("decompress", "-y", str(tmp_path / "r.fcz"),
                     str(tmp_path / "r_out.pdb"))
        assert rd.returncode != 0     # pinned defect
    o = run_cli("compress", "-y", str(tmp_path / "o.pdb"),
                str(tmp_path / "x.fcz"))
    assert b"at least 2 residues" in o.stderr + o.stdout


@needs_ref
def test_missing_backbone_atom_streams_match(tmp_path):
    """A residue missing its CA: the reference serializes anchor atoms
    from a 2-element vector read out of bounds (uninitialized memory in
    the FCZ, atom_coordinate.cpp:396-410 + foldcomp.cpp:1051). The
    quantized streams still match byte-for-byte; we pin OUR anchor
    behavior (zero-filled missing slots) as the deterministic variant."""
    text = _base_text(30, 16)
    out = [line for line in text.splitlines()
           if not (line.startswith("ATOM")
                   and line[12:16].strip() == "CA"
                   and line[22:26].strip() == "15")]
    (tmp_path / "n.pdb").write_text("\n".join(out) + "\n")
    theirs = tmp_path / "R"
    ours = tmp_path / "O"
    theirs.mkdir()
    ours.mkdir()
    r = run_ref("compress", "-y", str(tmp_path / "n.pdb"),
                str(theirs / "n.fcz"))
    assert r.returncode == 0
    o = run_cli("compress", "-y", str(tmp_path / "n.pdb"),
                str(ours / "n.fcz"))
    assert o.returncode == 0, o.stderr[-500:]
    a = fcz.parse((ours / "n.fcz").read_bytes())
    b = fcz.parse((theirs / "n.fcz").read_bytes())
    assert np.array_equal(a.records, b.records)
    assert np.array_equal(np.asarray(a.sc_codes), np.asarray(b.sc_codes))
    assert np.array_equal(a.mins, b.mins)
    # anchor coords: reference bytes are UB garbage — ours are the
    # zero-filled missing slot
    assert a.anchor_coords[1, 1].tolist() == [0.0, 0.0, 0.0]


def test_wild_roundtrip_no_reference(tmp_path):
    """Fast-path (device) roundtrip over the wild corpus — independent
    of the reference binary, so it always runs."""
    from foldcomp_tpu.codec.batch import decode_fcz_batch
    from foldcomp_tpu.codec.decoder import decode as decode_exact
    from foldcomp_tpu.codec.encoder import encode as encode_exact
    from foldcomp_tpu.io.pdb import parse_pdb
    from foldcomp_tpu.io.structure import (
        identify_chains, identify_discontinuous_fragments,
        remove_alternative_positions)

    for case in ("hydrogens", "inscode", "missing_sidechain",
                 "proline_rich"):
        atoms = parse_pdb(PARITY_CASES[case]().encode())
        atoms = remove_alternative_positions(atoms)
        (cs, ce), = identify_chains(atoms)
        frags = identify_discontinuous_fragments(atoms, cs, ce)
        for fs, fe in frags:
            f = encode_exact(atoms.slice(fs, fe))
            de = decode_exact(f)
            df = decode_fcz_batch([f])[0]
            assert de.atom_name == df.atom_name, case
            d = np.abs(np.asarray(de.coords) - np.asarray(df.coords))
            assert d.max() < 0.02, (case, d.max())


# ---- bulk differential corpus: hundreds of cases, two CLI calls --------

_MUTATORS = [
    lambda t, rng: t,
    _with_hydrogens,
    lambda t, rng: _with_inscode(t, str(int(rng.integers(2, 9)))),
    lambda t, rng: _with_model_wrapper(t),
    lambda t, rng: _with_shifted_resseq(t, int(rng.integers(-300, 300))),
    lambda t, rng: _without_atom(t, rng.choice(["CG", "CB", "OG", "CD"])),
    lambda t, rng: _with_garbage(t),
]


def _bulk_case(seed):
    rng = np.random.default_rng(seed)
    n_res = int(rng.choice([2, 3, 5, 9, 17, 33, 64, 120, 260]))
    text = format_pdb(synthesize(n_res, seed), "wild")
    mut = _MUTATORS[seed % len(_MUTATORS)]
    try:
        return mut(text, rng)
    except TypeError:
        return mut(text)


@needs_ref
def test_bulk_differential_pdb_corpus(tmp_path):
    """A few hundred seeded wild PDBs through BOTH tools in one batch
    compress + one batch decompress each (VERDICT r2 #4 scale ask):
    the tools must produce the same SET of outputs (same skips) and
    byte-identical bytes for every produced entry."""
    src = tmp_path / "src"
    src.mkdir()
    n_cases = 210
    for seed in range(n_cases):
        (src / f"c{seed:03d}.pdb").write_text(_bulk_case(seed))

    ours_fcz = tmp_path / "O_fcz"
    ref_fcz = tmp_path / "R_fcz"
    r = run_ref("compress", "-y", str(src), str(ref_fcz))
    assert r.returncode == 0, r.stderr[-500:]
    o = run_cli("compress", "-y", str(src), str(ours_fcz))
    assert o.returncode == 0, o.stderr[-500:]

    ref_names = sorted(p.name for p in ref_fcz.iterdir())
    our_names = sorted(p.name for p in ours_fcz.iterdir())
    assert our_names == ref_names
    assert len(ref_names) >= n_cases * 0.9  # the corpus mostly parses
    mismatched = [name for name in ref_names
                  if not equal_with_padding_mask(
                      (ours_fcz / name).read_bytes(),
                      (ref_fcz / name).read_bytes())]
    assert not mismatched, mismatched[:10]

    ours_pdb = tmp_path / "O_pdb"
    ref_pdb = tmp_path / "R_pdb"
    r = run_ref("decompress", "-y", str(ref_fcz), str(ref_pdb))
    assert r.returncode == 0, r.stderr[-500:]
    o = run_cli("decompress", "-y", str(ours_fcz), str(ours_pdb))
    assert o.returncode == 0, o.stderr[-500:]
    ref_names = sorted(p.name for p in ref_pdb.iterdir())
    assert sorted(p.name for p in ours_pdb.iterdir()) == ref_names
    diff = [name for name in ref_names
            if (ours_pdb / name).read_bytes() !=
            (ref_pdb / name).read_bytes()]
    assert not diff, diff[:10]


@needs_ref
def test_bulk_differential_mmcif_corpus(tmp_path):
    """~50 seeded wild mmCIFs (same generator, CIF route) through both
    tools in one batch compress each; same-set + byte-parity gates."""
    src = tmp_path / "src"
    src.mkdir()
    for seed in range(300, 350):
        (src / f"m{seed}.cif").write_text(
            _as_mmcif(_bulk_case(seed), block=f"W{seed}"))

    ours_fcz = tmp_path / "O_fcz"
    ref_fcz = tmp_path / "R_fcz"
    r = run_ref("compress", "-y", str(src), str(ref_fcz))
    assert r.returncode == 0, r.stderr[-500:]
    o = run_cli("compress", "-y", str(src), str(ours_fcz))
    assert o.returncode == 0, o.stderr[-500:]
    ref_names = sorted(p.name for p in ref_fcz.iterdir())
    assert sorted(p.name for p in ours_fcz.iterdir()) == ref_names
    assert len(ref_names) >= 45
    mismatched = [name for name in ref_names
                  if not equal_with_padding_mask(
                      (ours_fcz / name).read_bytes(),
                      (ref_fcz / name).read_bytes())]
    assert not mismatched, mismatched[:10]
