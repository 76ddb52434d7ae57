"""Associative-scan NeRF core vs the sequential-sweep oracle.

The production decode path (nerf_impl="assoc", kernels/nerf_assoc.py)
composes rigid frames with a log-depth associative scan instead of the
3*SEG-step sequential `lax.scan` of kernels/nerf.py. Both implement the
reference recurrence (Nerf::place_atom nerf.cpp:39-104; segment loop
foldcomp.cpp:812-858); the composition reassociates f32 products, so
coordinates drift O(1e-4 A) — far below the format's ~0.08 A
quantization floor. These tests pin that drift bound on real fixtures
and on adversarial synthetic streams.
"""
import numpy as np
import pytest

from conftest import require_fixture

from foldcomp_tpu.codec import fcz
from foldcomp_tpu.codec.batch import pack_decode_batch, pack_decode_batch_seg
from foldcomp_tpu.codec.encoder import encode as encode_exact
from foldcomp_tpu.io.pdb import parse_pdb
from foldcomp_tpu.io.structure import (identify_chains,
                                       identify_discontinuous_fragments,
                                       remove_alternative_positions)
from foldcomp_tpu.kernels.decode import _decode_core_lanes, decode_seg_core


def _payloads():
    out = [fcz.parse(require_fixture("test_af.fcz").read_bytes())]
    atoms = parse_pdb(require_fixture("test.pdb").read_bytes())
    atoms = remove_alternative_positions(atoms)
    (cs, ce), = identify_chains(atoms)
    (fs, fe), = identify_discontinuous_fragments(atoms, cs, ce)
    out.append(encode_exact(atoms.slice(fs, fe)))
    return out


@pytest.mark.parametrize("refine_iters", [1, 2])
def test_assoc_matches_sweep_fixtures(refine_iters):
    arrays, metas, seg_pad = pack_decode_batch(_payloads())

    def run(impl):
        return _decode_core_lanes(
            arrays["records"], arrays["mins"], arrays["cont_fs"],
            arrays["sc_codes"], arrays["tf_codes"], arrays["tf_min"],
            arrays["tf_cont"], arrays["anchor_xyz"], arrays["seg_start"],
            arrays["seg_m"], seg_width=seg_pad,
            refine_iters=refine_iters, nerf_impl=impl, gather_free=True)

    a14_x, rc_x, tf_x = (np.asarray(o) for o in run("xla"))
    a14_a, rc_a, tf_a = (np.asarray(o) for o in run("assoc"))
    assert np.array_equal(rc_x, rc_a)
    assert np.array_equal(tf_x, tf_a)
    for i, m in enumerate(metas):
        n = m.n_residue
        d = np.abs(a14_x[i, :n] - a14_a[i, :n]).max()
        assert d < 1e-3, (i, d)


def test_assoc_matches_sweep_synthetic_segspace():
    """Random streams, ragged seg_m (incl. the 1- and 2-record edge
    cases), proline flags: the segment-space cores must agree on every
    real record."""
    rng = np.random.default_rng(7)
    seg_w, b, s = 26, 8, 4
    n = b * s
    seg_records = rng.integers(0, 256, (seg_w, n, 8), dtype=np.uint8)
    mins_lane = np.tile(
        np.float32([-180, -180, -180, 100, 100, 100]), (n, 1))
    cont_lane = np.tile(
        np.float32([360 / 4095, 360 / 4095, 360 / 2047,
                    40 / 255, 40 / 255, 40 / 255]), (n, 1))
    sc_codes = rng.integers(0, 256, (11, seg_w, n), dtype=np.uint8)
    anchor_xyz = rng.normal(0, 5, (b, s + 1, 3, 3)).astype(np.float32)
    seg_m = rng.integers(1, seg_w + 1, (n,)).astype(np.int32)
    seg_m[:4] = [1, 2, 3, seg_w]          # pin the edge cases

    def run(impl):
        return np.asarray(decode_seg_core(
            seg_records, mins_lane, cont_lane, sc_codes, anchor_xyz,
            seg_m, refine_iters=2, nerf_impl=impl, gather_free=False))

    a, x = run("assoc"), run("xla")
    mask = np.zeros(a.shape[:2], bool)
    for i in range(n):
        mask[i, :seg_m[i]] = True
    d = np.abs(a - x)[mask].max()
    assert d < 1e-3, d


def test_reset_monoid_associativity():
    """The reverse pass relies on (rigid, reset-flag) being a monoid:
    (x.y).z == x.(y.z) for every flag combination."""
    import jax.numpy as jnp
    from foldcomp_tpu.kernels.nerf_assoc import (_compose_reset,
                                                 _elem_from_params)
    rng = np.random.default_rng(3)

    def elem(flag):
        e = _elem_from_params(jnp.float32(rng.uniform(1.0, 2.0)),
                              jnp.float32(rng.uniform(-180, 180)),
                              jnp.float32(rng.uniform(-180, 180)))
        return tuple(jnp.asarray(v, jnp.float32) for v in e) + (
            jnp.float32(flag),)

    for fx in (0, 1):
        for fy in (0, 1):
            for fz in (0, 1):
                x, y, z = elem(fx), elem(fy), elem(fz)
                lhs = _compose_reset(_compose_reset(x, y), z)
                rhs = _compose_reset(x, _compose_reset(y, z))
                for a_, b_ in zip(lhs, rhs):
                    assert abs(float(a_) - float(b_)) < 1e-5


def test_compact_output_precision():
    """Compact (CA f32 + int16 mm offsets) D2H form reconstructs within
    0.5 mm of the full-f32 output — 160x below the format's own ~0.08 A
    reconstruction error."""
    from foldcomp_tpu.codec.batch import _gather_a14, _outs_to_host

    arrays, metas = pack_decode_batch_seg(_payloads())

    def run(compact):
        return decode_seg_core(
            arrays["seg_records"], arrays["mins_lane"],
            arrays["cont_lane"], arrays["sc_codes_seg"],
            arrays["anchor_xyz"], arrays["seg_m"], refine_iters=2,
            gather_free=False, compact=compact)

    full = _outs_to_host(run(False))
    comp = _outs_to_host(run(True))
    assert isinstance(comp, tuple)
    for m in metas:
        a = _gather_a14(full, m)
        b = _gather_a14(comp, m)
        assert np.abs(a - b).max() < 6e-4, np.abs(a - b).max()
