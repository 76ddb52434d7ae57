"""Property-style roundtrip tests on synthetic proteins.

Structures are generated with the NeRF recurrence itself from random (but
realistic) torsions/bond angles, so they exercise arbitrary geometry rather
than just the repo fixtures. Gates: encode->decode reconstruction error
stays near the quantization floor for both the exact and batched paths.
"""
import numpy as np
import pytest

from foldcomp_tpu.codec.batch import decode_fcz_batch, encode_fragment_batch
from foldcomp_tpu.codec.decoder import decode, place_atom
from foldcomp_tpu.codec.encoder import encode
from foldcomp_tpu.core.aatable import (AA_DATA, C_TO_N_DIST, CA_TO_C_DIST,
                                       N_TO_CA_DIST, PRO_N_TO_CA_DIST)
from foldcomp_tpu.core.codes import THREE_LETTER
from foldcomp_tpu.core.exact import rmsd
from foldcomp_tpu.io.structure import AtomArray


def synthesize(n_res: int, seed: int) -> AtomArray:
    """Random single-chain all-atom protein with realistic geometry."""
    rng = np.random.default_rng(seed)
    codes = rng.integers(0, 20, n_res)   # all 20, proline included
    phi = rng.uniform(-160, -40, n_res)
    psi = rng.uniform(-60, 170, n_res)
    omega = rng.normal(179.0, 2.0, n_res)
    n_ca_c = rng.normal(111.0, 2.0, n_res)
    ca_c_n = rng.normal(116.5, 1.5, n_res)
    c_n_ca = rng.normal(121.5, 1.5, n_res)

    bb = [(0.0, 0.0, 0.0), (N_TO_CA_DIST, 0.0, 0.0)]
    # place first C with an arbitrary reasonable angle
    bb.append(place_atom((-1.0, 1.0, 0.0), bb[0], bb[1], CA_TO_C_DIST,
                         111.0, -60.0))
    for i in range(n_res - 1):
        a, b, c = bb[-3], bb[-2], bb[-1]
        # residue i+1's N-CA bond: proline is shorter (nerf.h:37-43)
        n_ca = PRO_N_TO_CA_DIST if codes[i + 1] == 14 else N_TO_CA_DIST
        n_xyz = place_atom(a, b, c, C_TO_N_DIST, ca_c_n[i], psi[i])
        ca_xyz = place_atom(b, c, n_xyz, n_ca, c_n_ca[i], omega[i])
        c_xyz = place_atom(c, n_xyz, ca_xyz, CA_TO_C_DIST, n_ca_c[i],
                           phi[i])
        bb.extend([n_xyz, ca_xyz, c_xyz])

    names, rnames, chains, ridx, coords, temps = [], [], [], [], [], []
    for r in range(n_res):
        three = THREE_LETTER[int(codes[r])]
        atoms_tbl, graph, lengths, angles, _ = AA_DATA[three]
        slot = {"N": bb[3 * r], "CA": bb[3 * r + 1], "C": bb[3 * r + 2]}
        for k, nm in enumerate(atoms_tbl):
            if k >= 3:
                p0, p1, p2 = graph[nm]
                slot[nm] = place_atom(
                    slot[p0], slot[p1], slot[p2],
                    lengths[f"{p2}_{nm}"], angles[f"{p1}_{p2}_{nm}"],
                    float(rng.uniform(-180, 180)))
            names.append(nm)
            rnames.append(three)
            chains.append("A")
            ridx.append(r + 1)
            coords.append(slot[nm])
            temps.append(float(rng.uniform(20, 95)))
    n_total = len(names)
    return AtomArray(names, rnames, chains,
                     np.arange(1, n_total + 1, dtype=np.int32),
                     np.asarray(ridx, np.int32),
                     np.asarray(coords, np.float32),
                     np.ones(n_total, np.float32),
                     np.asarray(temps, np.float32), "synthetic")


@pytest.mark.parametrize("n_res,seed", [(24, 0), (60, 1), (130, 2)])
def test_exact_roundtrip_synthetic(n_res, seed):
    atoms = synthesize(n_res, seed)
    f = encode(atoms)
    dec = decode(f)
    assert len(dec) == len(atoms)
    assert dec.atom_name == atoms.atom_name
    r = rmsd(atoms.coords, dec.coords)
    # quantization floor: reference achieves ~0.1 A on real proteins;
    # random torsions are harsher but must stay well-behaved
    assert r < 0.5, r
    # only the CA tempFactor survives (foldcomp.cpp:543-550); decode
    # broadcasts it across the residue — compare at the CA atoms
    ca = [i for i, nm in enumerate(atoms.atom_name) if nm == "CA"]
    assert np.abs(np.asarray(dec.temp_factor)[ca]
                  - np.asarray(atoms.temp_factor)[ca]).max() < 0.5


@pytest.mark.parametrize("seed", [3, 4])
def test_fast_matches_exact_synthetic(seed):
    atoms = synthesize(80, seed)
    f_exact = encode(atoms)
    dec_exact = decode(f_exact)
    dec_fast = decode_fcz_batch([f_exact], refine_iters=2)[0]
    assert dec_exact.atom_name == dec_fast.atom_name
    assert rmsd(dec_exact.coords, dec_fast.coords) < 5e-3

    f_fast = encode_fragment_batch([atoms])[0]
    assert f_fast.n_sc_torsion == f_exact.n_sc_torsion
    # the device encode is BYTE-parity since the full-device rescue
    # scheme (kernels/encode.py encode_parity_core)
    assert np.array_equal(f_fast.records, f_exact.records)
    assert np.array_equal(f_fast.sc_codes, f_exact.sc_codes)
