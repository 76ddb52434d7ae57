"""Tour of the foldcomp-compatible Python API.

Runnable equivalent of the reference's foldcomp-py-examples.ipynb
(executed in CI by test-notebook.yml): compress/decompress roundtrip,
database iteration and subsetting, get_data feature extraction, and the
batched TPU decode path.

Usage: python examples/python_api_tour.py [test_dir]
(test_dir defaults to /root/reference/test)
"""
import sys
import pathlib

import foldcomp_tpu as foldcomp

test_dir = pathlib.Path(sys.argv[1] if len(sys.argv) > 1
                        else "/root/reference/test")

# --- 1. compress a single-chain PDB string -------------------------------
pdb_str = (test_dir / "test_af.pdb").read_text()
fcz = foldcomp.compress("AF-example", pdb_str, anchor_residue_threshold=25)
n_atoms = sum(1 for l in pdb_str.splitlines() if l.startswith("ATOM"))
print(f"compressed {n_atoms} atoms -> {len(fcz)} bytes "
      f"({len(fcz) / n_atoms:.1f} B/atom)")

# --- 2. decompress back to PDB text --------------------------------------
name, pdb_out = foldcomp.decompress(fcz)
print(f"decompressed '{name[:40]}...' -> "
      f"{sum(1 for l in pdb_out.splitlines() if l.startswith('ATOM'))} atoms")

# --- 3. multi-chain input must be split ----------------------------------
multichain = (test_dir / "multichain.pdb").read_text()
chains = foldcomp.split_pdb_by_chain(multichain)
print(f"split multichain.pdb into {len(chains)} chains")
per_chain = [foldcomp.compress(f"chain{i}", c) for i, c in enumerate(chains)]
print("per-chain fcz sizes:", [len(b) for b in per_chain])

# --- 4. open an MMseqs2-style database -----------------------------------
with foldcomp.open(str(test_dir / "example_db")) as db:
    print(f"database has {len(db)} entries")
    name0, pdb0 = db[0]
    print(f"first entry: {name0}")

# subset by id; raw bytes without decompression
subset_ids = (test_dir / "example_db.subset").read_text().split()[:3]
with foldcomp.open(str(test_dir / "example_db"), ids=subset_ids) as db:
    for entry_name, entry_pdb in db:
        print(f"  subset entry {entry_name}: "
              f"{len(entry_pdb.splitlines())} lines")

# --- 5. get_data: angles / sequence / pLDDT / coordinates ----------------
data = foldcomp.get_data(fcz)
print(f"sequence ({len(data['residues'])} aa): {data['residues']}")
print(f"phi[0:3] = {[round(x, 1) for x in data['phi'][:3]]}")
print(f"mean pLDDT = {sum(data['b_factors']) / len(data['b_factors']):.1f}")

# --- 6. batched decode (the TPU fast path) -------------------------------
from foldcomp_tpu.codec import fcz as fcz_mod
from foldcomp_tpu.codec.batch import decode_fcz_to_pdb_batch

payloads = [fcz_mod.parse(fcz)] * 8
texts = decode_fcz_to_pdb_batch(payloads)
print(f"batch-decoded {len(texts)} proteins on "
      f"{__import__('jax').default_backend()}")
print("done")
