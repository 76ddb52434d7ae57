"""Multi-device data-parallel pipeline tests (8 virtual CPU devices)."""
import jax
import numpy as np
import pytest

from foldcomp_tpu.parallel.pipeline import (device_segments, make_mesh,
                                            make_roundtrip_step, shard_batch)


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(8)


def test_device_segments_match_host():
    """Device anchor segmentation equals the host/_setAnchor-derived layout."""
    from foldcomp_tpu.codec.batch import segments_of
    from foldcomp_tpu.codec.fcz import FczData

    for n in (2, 24, 25, 26, 49, 50, 51, 276, 737):
        thr = 25
        n_inner = n // thr
        n_all = n_inner + 2
        interval = n // (n_all - 1)
        anchors = np.asarray(
            [i * interval for i in range(n_all - 1)] + [n - 1], np.int32)
        f = FczData(
            n_residue=n, n_atom=0, idx_residue=0, idx_atom=0, n_anchor=n_all,
            chain="A", n_sc_torsion=0, first_residue="A", last_residue="A",
            title="", mins=np.zeros(6, np.float32),
            cont_fs=np.zeros(6, np.float32), anchor_indices=anchors,
            anchor_coords=np.zeros((n_all, 3, 3), np.float32), has_oxt=False,
            oxt_coords=np.zeros(3, np.float32),
            records=np.zeros((n, 8), np.uint8), sc_codes=np.zeros(0, np.uint8),
            tf_min=np.float32(0), tf_cont=np.float32(0),
            tf_codes=np.zeros(n, np.uint8))
        host_starts, host_counts = segments_of(f)

        s_max = len(host_starts)
        anchor_idx, seg_start, seg_m = device_segments(
            np.asarray([n], np.int32), n, s_max, thr)
        assert list(np.asarray(seg_start)[0]) == host_starts, n
        assert list(np.asarray(seg_m)[0]) == host_counts, n
        assert list(np.asarray(anchor_idx)[0]) == list(anchors), n


def test_sharded_roundtrip(mesh):
    b, l = 16, 32
    rng = np.random.default_rng(7)
    ca = np.cumsum(rng.normal(0, 1.5, (b, l, 3)), axis=1).astype(np.float32)
    atom14 = np.tile(ca[:, :, None, :], (1, 1, 14, 1))
    atom14 += rng.normal(0, 0.5, atom14.shape).astype(np.float32)
    res_code = rng.integers(0, 20, (b, l)).astype(np.int32)
    tf_ca = rng.uniform(0, 100, (b, l)).astype(np.float32)
    res_mask = np.ones((b, l), bool)

    step = make_roundtrip_step(mesh, s_max=4, seg_width=12, threshold=10)
    arrays = shard_batch(mesh, (atom14, res_code, tf_ca, res_mask))
    records, atom14_dec, global_rmsd = step(*arrays)
    assert records.shape == (b, l, 8)
    assert np.isfinite(float(global_rmsd))

    # sharded result must equal the single-device pipeline bit-for-bit
    from foldcomp_tpu.parallel.pipeline import roundtrip_core
    rec1, dec1, ss, na = jax.jit(
        lambda *a: roundtrip_core(*a, s_max=4, seg_width=12, threshold=10)
    )(atom14, res_code, tf_ca, res_mask)
    assert np.array_equal(np.asarray(records), np.asarray(rec1))
    # sharded vs single-device compiles may fuse differently; deviations are
    # float-reassociation noise far below the quantization floor
    np.testing.assert_allclose(np.asarray(atom14_dec), np.asarray(dec1),
                               atol=1e-3)
    single_rmsd = float(np.sqrt(np.asarray(ss) / np.asarray(na)))
    assert abs(single_rmsd - float(global_rmsd)) < 1e-4


def test_sequence_parallel_features(mesh):
    """Halo-exchange SP extraction matches the unsharded computation."""
    from foldcomp_tpu.parallel.pipeline import make_mesh
    from foldcomp_tpu.parallel.seqpar import (reference_backbone_features,
                                              sharded_backbone_features)

    seq_mesh = make_mesh(8, axis_name="seq")
    rng = np.random.default_rng(0)
    t = 8 * 96
    ca = np.cumsum(rng.normal(0, 1.2, (t, 3)), axis=0).astype(np.float32)
    ts, an = sharded_backbone_features(seq_mesh, ca[:, 0], ca[:, 1],
                                       ca[:, 2])
    rt, ra = reference_backbone_features(ca[:, 0], ca[:, 1], ca[:, 2])
    assert np.abs(np.asarray(ts) - np.asarray(rt)).max() < 0.01
    assert np.abs(np.asarray(an) - np.asarray(ra)).max() < 0.01


def _load_seq_fragment():
    from conftest import require_fixture
    from foldcomp_tpu.io.pdb import parse_pdb
    from foldcomp_tpu.io.structure import (
        identify_chains, identify_discontinuous_fragments,
        remove_alternative_positions)

    atoms = remove_alternative_positions(
        parse_pdb(require_fixture("test.pdb").read_bytes()))
    (cs, ce), = identify_chains(atoms)
    (fs, fe), = identify_discontinuous_fragments(atoms, cs, ce)
    return atoms.slice(fs, fe)


def test_sharded_encode_matches_single_device(mesh):
    """sharded_encode_features == encode_batch_core(B=1) on a real
    fragment padded to 8 shards: records, side chains, headers."""
    from foldcomp_tpu.codec.batch import fragment_to_tensors
    from foldcomp_tpu.kernels.encode import encode_batch_core
    from foldcomp_tpu.parallel.pipeline import make_mesh
    from foldcomp_tpu.parallel.seqpar import sharded_encode_features

    a14, rc, tf, _ = fragment_to_tensors(_load_seq_fragment())
    n = a14.shape[0]
    l = -(-n // 8) * 8
    a14p = np.zeros((l, 14, 3), np.float32)
    rcp = np.zeros(l, np.int32)
    tfp = np.zeros(l, np.float32)
    a14p[:n], rcp[:n], tfp[:n] = a14, rc, tf

    seq_mesh = make_mesh(8, axis_name="seq")
    out = sharded_encode_features(seq_mesh, a14p, rcp, tfp, n)

    ref = encode_batch_core(a14p[None, :, :3], a14p[None], rcp[None],
                            tfp[None], (np.arange(l) < n)[None])
    np.testing.assert_array_equal(np.asarray(out["records"])[:n],
                                  np.asarray(ref["records"])[0, :n])
    np.testing.assert_array_equal(np.asarray(out["sc_q"])[:n],
                                  np.asarray(ref["sc_q"])[0, :n])
    np.testing.assert_array_equal(np.asarray(out["tf_q"])[:n],
                                  np.asarray(ref["tf_q"])[0, :n])
    np.testing.assert_array_equal(np.asarray(out["mins"]),
                                  np.asarray(ref["mins"])[0])
    np.testing.assert_array_equal(np.asarray(out["cont_fs"]),
                                  np.asarray(ref["cont_fs"])[0])


def test_encode_long_chain_roundtrip(mesh):
    """Sequence-parallel encode serializes to a decodable FCZ stream that
    reconstructs the input within the codec error budget (the reference
    CI gate for test.pdb is 0.0827 +/- 0.001 A all-atom RMSD)."""
    from foldcomp_tpu.codec.decoder import decode
    from foldcomp_tpu.codec.fcz import parse
    from foldcomp_tpu.core.exact import rmsd
    from foldcomp_tpu.parallel.pipeline import make_mesh
    from foldcomp_tpu.parallel.seqpar import encode_long_chain

    frag = _load_seq_fragment()
    seq_mesh = make_mesh(8, axis_name="seq")
    blob = encode_long_chain(frag, seq_mesh)
    f = parse(blob)
    assert f.n_residue == len(np.unique(frag.residue_index))
    atoms = decode(f)
    ref = {(int(r), nm): c for r, nm, c in
           zip(frag.residue_index, frag.atom_name, frag.coords)}
    pairs = [(c, ref[(int(r), nm)]) for r, nm, c in
             zip(atoms.residue_index, atoms.atom_name, atoms.coords)
             if (int(r), nm) in ref]
    assert len(pairs) > 0.9 * len(frag)
    got = np.asarray([p[0] for p in pairs], np.float32)
    want = np.asarray([p[1] for p in pairs], np.float32)
    assert rmsd(got, want) < 0.2
