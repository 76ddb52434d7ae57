"""Pallas decode kernels vs the XLA form (interpret mode on CPU).

The fused pallas path (FOLDCOMP_TPU_PALLAS=1 on TPU) must produce the
same coordinates as the default XLA core — including the rigid-reseed
refinement restructure (one forward kernel + one sweep kernel).
"""
import numpy as np
import pytest

from conftest import require_fixture

from foldcomp_tpu.codec import fcz
from foldcomp_tpu.codec.batch import pack_decode_batch
from foldcomp_tpu.codec.encoder import encode as encode_exact
from foldcomp_tpu.io.pdb import parse_pdb
from foldcomp_tpu.io.structure import (identify_chains,
                                       identify_discontinuous_fragments,
                                       remove_alternative_positions)
from foldcomp_tpu.kernels.decode import _decode_core_lanes


def _payloads():
    out = [fcz.parse(require_fixture("test_af.fcz").read_bytes())]
    atoms = parse_pdb(require_fixture("test.pdb").read_bytes())
    atoms = remove_alternative_positions(atoms)
    (cs, ce), = identify_chains(atoms)
    (fs, fe), = identify_discontinuous_fragments(atoms, cs, ce)
    out.append(encode_exact(atoms.slice(fs, fe)))
    return out


@pytest.mark.parametrize("refine_iters", [1, 2])
def test_pallas_matches_xla(refine_iters):
    arrays, metas, seg_pad = pack_decode_batch(_payloads())

    def run(impl):
        return _decode_core_lanes(
            arrays["records"], arrays["mins"], arrays["cont_fs"],
            arrays["sc_codes"], arrays["tf_codes"], arrays["tf_min"],
            arrays["tf_cont"], arrays["anchor_xyz"], arrays["seg_start"],
            arrays["seg_m"], seg_width=seg_pad,
            refine_iters=refine_iters, nerf_impl=impl, gather_free=True)

    a14_x, rc_x, tf_x = (np.asarray(o) for o in run("xla"))
    a14_p, rc_p, tf_p = (np.asarray(o) for o in run("pallas"))
    assert np.array_equal(rc_x, rc_p)
    assert np.array_equal(tf_x, tf_p)
    for i, m in enumerate(metas):
        n = m.n_residue
        d = np.abs(a14_x[i, :n] - a14_p[i, :n]).max()
        assert d < 1e-3, (i, d)


def test_compact_output_precision():
    """Compact (CA f32 + int16 mm offsets) D2H form reconstructs within
    0.5 mm of the full-f32 output — 160x below the format's own ~0.08 A
    reconstruction error."""
    import jax.numpy as jnp  # noqa: F401
    from foldcomp_tpu.codec.batch import (_gather_a14, _outs_to_host,
                                          pack_decode_batch_seg)
    from foldcomp_tpu.kernels.decode import decode_seg_core

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
