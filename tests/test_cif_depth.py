"""mmCIF depth: altloc, multi-model, insertion codes, malformed loops.

The reference parses cif through gemmi and flattens every model
(structure_reader.cpp:47 `for model : models`); altloc atoms survive the
parse and are dropped later by removeAlternativePosition; res.seqid.num
ignores insertion codes. These tests A/B crafted cif fixtures against the
locally built reference binary. Multi-model input segfaults the reference
binary (a reference bug) — there we pin our defined behavior instead: the
flattening the reference's own code intends.
"""
import os
import subprocess
import sys

import pytest

from conftest import require_fixture

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from foldcomp_tpu.codec import fcz  # noqa: E402
from foldcomp_tpu.io.cif import parse_cif  # noqa: E402
from foldcomp_tpu.io.pdb import parse_pdb  # noqa: E402

REF_BIN = os.environ.get("FOLDCOMP_REF_BIN", "/tmp/refbuild/foldcomp")
needs_ref = pytest.mark.skipif(not os.path.exists(REF_BIN),
                               reason="reference binary not built")

TAGS = ["group_PDB", "id", "type_symbol", "label_atom_id", "label_alt_id",
        "label_comp_id", "label_asym_id", "label_entity_id", "label_seq_id",
        "pdbx_PDB_ins_code", "Cartn_x", "Cartn_y", "Cartn_z", "occupancy",
        "B_iso_or_equiv", "pdbx_formal_charge", "auth_seq_id",
        "auth_comp_id", "auth_asym_id", "auth_atom_id", "pdbx_PDB_model_num"]


def _rows(n_res=35):
    pdb = require_fixture("test.pdb").read_text()
    atoms = parse_pdb(pdb, "test")
    rmin = int(atoms.residue_index.min())
    keep = [i for i in range(len(atoms))
            if atoms.residue_index[i] < rmin + n_res]
    return rmin, [
        (atoms.atom_name[i], atoms.residue_name[i],
         int(atoms.residue_index[i]), float(atoms.coords[i, 0]),
         float(atoms.coords[i, 1]), float(atoms.coords[i, 2]),
         float(atoms.temp_factor[i])) for i in keep]


def make_cif(rows, rmin, altloc_every=0, models=1, inscode_at=None,
             name="fix"):
    L = [f"data_{name}", "#", f"_entry.id {name.upper()}", "#", "loop_"]
    L += ["_atom_site." + t for t in TAGS]
    serial = 1
    for m in range(1, models + 1):
        for j, (an, rn, ri, x, y, z, b) in enumerate(rows):
            ins = "A" if (inscode_at and ri == inscode_at) else "?"
            reps = 2 if (altloc_every and j % altloc_every == 3) else 1
            for r in range(reps):
                alt = ("A" if r == 0 else "B") if reps > 1 else "."
                occ = 0.5 if reps > 1 else 1.0
                L.append(
                    f"ATOM {serial} {an[0]} {an} {alt} {rn} A 1 "
                    f"{ri - rmin + 1} {ins} {x:.3f} {y:.3f} {z:.3f} "
                    f"{occ:.2f} {b:.2f} ? {ri} {rn} A {an} {m}")
                serial += 1
    L.append("#")
    return "\n".join(L) + "\n"


def _compress_ours(path, out):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run(
        [sys.executable, "-m", "foldcomp_tpu", "compress", "-y", str(path),
         str(out)], capture_output=True, text=True, env=env)


def _compress_ref(path, out):
    return subprocess.run([REF_BIN, "compress", "-y", str(path), str(out)],
                          capture_output=True, text=True)


@needs_ref
@pytest.mark.parametrize("variant", ["plain", "altloc", "inscode"])
def test_cif_ab_byte_parity(tmp_path, variant):
    rmin, rows = _rows()
    kw = {"altloc": {"altloc_every": 7},
          "inscode": {"inscode_at": rmin + 10},
          "plain": {}}[variant]
    src = tmp_path / f"{variant}.cif"
    src.write_text(make_cif(rows, rmin, name=variant, **kw))
    ours, ref = tmp_path / "ours.fcz", tmp_path / "ref.fcz"
    assert _compress_ours(src, ours).returncode == 0
    assert _compress_ref(src, ref).returncode == 0
    assert fcz.equal_with_padding_mask(ours.read_bytes(), ref.read_bytes())


def test_cif_multimodel_flattens(tmp_path):
    """All models concatenate (structure_reader.cpp:47 semantics). The
    reference binary itself segfaults on this input; we pin the behavior
    its parser code intends."""
    rmin, rows = _rows()
    src = tmp_path / "mm.cif"
    src.write_text(make_cif(rows, rmin, models=2, name="mm"))
    atoms = parse_cif(src.read_bytes(), "mm")
    assert len(atoms) == 2 * len(rows)
    out = tmp_path / "mm.fcz"
    r = _compress_ours(src, out)
    assert r.returncode == 0
    assert out.exists() and out.stat().st_size > 0


def test_cif_ragged_loop_rejected(tmp_path):
    """A loop whose token count mismatches its tags is rejected whole,
    like gemmi (reference prints 'No atoms found')."""
    rmin, rows = _rows()
    lines = make_cif(rows, rmin, name="rag").splitlines()
    for i, ln in enumerate(lines):
        if ln.startswith("ATOM ") and i > 30:
            lines[i] = " ".join(ln.split()[:-3])
            break
    src = tmp_path / "ragged.cif"
    src.write_text("\n".join(lines) + "\n")
    atoms = parse_cif(src.read_bytes(), "rag")
    assert len(atoms) == 0
    r = _compress_ours(src, tmp_path / "out.fcz")
    assert "No atoms found" in r.stderr


def test_cif_wrapped_rows_parse(tmp_path):
    """CIF values may wrap across physical lines; the token-stream parser
    must reassemble full rows."""
    rmin, rows = _rows(10)
    text = make_cif(rows, rmin, name="wrap")
    out_lines = []
    for ln in text.splitlines():
        if ln.startswith("ATOM ") and len(out_lines) % 2 == 0:
            toks = ln.split()
            out_lines.append(" ".join(toks[:10]))
            out_lines.append(" ".join(toks[10:]))
        else:
            out_lines.append(ln)
    atoms = parse_cif("\n".join(out_lines) + "\n", "wrap")
    ref_atoms = parse_cif(text, "wrap")
    assert len(atoms) == len(ref_atoms) > 0
    assert atoms.atom_name == ref_atoms.atom_name
    import numpy as np
    assert np.allclose(atoms.coords, ref_atoms.coords)


def test_cif_multiline_title():
    text = ("data_x\n_struct.title\n;a long\n title text\n;\n"
            "loop_\n_atom_site.id\n_atom_site.Cartn_x\n"
            "_atom_site.Cartn_y\n_atom_site.Cartn_z\n1 1.0 2.0 3.0\n#\n")
    atoms = parse_cif(text, "x")
    assert atoms.title == "a long title text"
    assert len(atoms) == 1


def test_cif_gz_golden_rmsd_gate(tmp_path):
    """The reference harness's SECOND golden gate (build.sh:35-38):
    compress test.cif.gz, decompress -a, all-atom RMSD vs the cif must
    be 0.130284±0.001. (The test.pdb 0.0826751 twin lives in
    test_cli.py.)"""
    import subprocess

    src = require_fixture("test.cif.gz")

    def run_cli(*args):
        env = dict(os.environ)
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        return subprocess.run([sys.executable, "-m", "foldcomp_tpu",
                               *args], capture_output=True, text=True,
                              env=env)
    fcz_p = tmp_path / "compressed_cif.fcz"
    pdb_p = tmp_path / "decompressed_cif.pdb"
    assert run_cli("compress", "-y", str(src), str(fcz_p)).returncode == 0
    assert run_cli("decompress", "-y", "-a", str(fcz_p),
                   str(pdb_p)).returncode == 0
    r = run_cli("rmsd", str(src), str(pdb_p))
    assert r.returncode == 0, r.stderr
    rmsd_all = float(r.stdout.split("\t")[5])
    assert abs(rmsd_all - 0.130284) < 0.001, r.stdout
