"""Width-classed fused decode (split_lanes_classes +
decode_seg_fused_classes) vs the single-class fused path.

Per-lane math is identical — the split only permutes lanes into
width classes and replaces the re-seed roll with an explicit prev-lane
gather — so reconstructed coordinates must be BIT-EQUAL protein for
protein (interpret mode on CPU; the production-scale throughput A/B
runs on hardware in bench_device_decode_mixed)."""
import numpy as np
import pytest

from test_property_roundtrip import synthesize

from foldcomp_tpu.codec.batch import (_gather_a14, _outs_to_host,
                                      pack_decode_batch_lanes,
                                      split_lanes_classes)
from foldcomp_tpu.codec.encoder import encode
from foldcomp_tpu.kernels.pallas_decode import (decode_seg_fused,
                                                decode_seg_fused_classes)


def _mixed_fczs():
    # lengths spanning several anchor-tail widths (interval floors at
    # 25, tails absorb the remainder) + a repeat for lane-reuse
    lengths = (26, 60, 151, 240, 60)
    return [encode(synthesize(n, seed=i))
            for i, (n) in enumerate(lengths)]


def _decode_plain(arrays, metas):
    nl = arrays.get("nl_out")
    out = decode_seg_fused(
        arrays["seg_records"], arrays["mins_lane"], arrays["cont_lane"],
        arrays["sc_codes_seg"], arrays["fwd9"], arrays["rev9"],
        arrays["is_first"], arrays["seg_m"], refine_iters=2,
        interpret=True, nl_out=int(nl) if nl is not None else None)
    host = _outs_to_host(out)
    return [_gather_a14(host, m) for m in metas]


def _decode_classes(split):
    arrays, metas = split
    c = arrays["classes"]
    out = decode_seg_fused_classes(
        c["recs"], c["mins"], c["cont"], c["sct"], c["fwd"], c["rev"],
        c["isf"], c["segm"], arrays["prev_idx"], refine_iters=2,
        interpret=True, nl_outs=arrays["nl_outs"])
    host = _outs_to_host(out)
    return [_gather_a14(host, m) for m in metas]


def test_classes_bit_equal_to_plain():
    fczs = _mixed_fczs()
    arrays, metas = pack_decode_batch_lanes(fczs)
    split = split_lanes_classes(
        dict(arrays), metas, min_save=-100.0)
    assert split is not None, "expected >1 width class on this corpus"
    assert len(split[0]["classes"]["recs"]) >= 2
    plain = _decode_plain(arrays, metas)
    classed = _decode_classes(split)
    for i, (a, b) in enumerate(zip(plain, classed)):
        assert a.shape == b.shape, i
        assert np.array_equal(a, b), i


def test_classes_savings_gate_declines_uniform():
    # a uniform corpus has one width class -> no split
    fczs = [encode(synthesize(60, seed=i)) for i in range(4)]
    arrays, metas = pack_decode_batch_lanes(fczs)
    assert split_lanes_classes(dict(arrays), metas) is None


def test_classes_refine0_path():
    fczs = _mixed_fczs()
    arrays, metas = pack_decode_batch_lanes(fczs)
    split = split_lanes_classes(dict(arrays), metas, min_save=-100.0)
    assert split is not None
    nl = arrays.get("nl_out")
    out = decode_seg_fused(
        arrays["seg_records"], arrays["mins_lane"], arrays["cont_lane"],
        arrays["sc_codes_seg"], arrays["fwd9"], arrays["rev9"],
        arrays["is_first"], arrays["seg_m"], refine_iters=1,
        interpret=True, nl_out=int(nl) if nl is not None else None)
    plain = [_gather_a14(_outs_to_host(out), m) for m in metas]
    c = split[0]["classes"]
    out2 = decode_seg_fused_classes(
        c["recs"], c["mins"], c["cont"], c["sct"], c["fwd"], c["rev"],
        c["isf"], c["segm"], split[0]["prev_idx"], refine_iters=1,
        interpret=True, nl_outs=split[0]["nl_outs"])
    classed = [_gather_a14(_outs_to_host(out2), m) for m in split[1]]
    for i, (a, b) in enumerate(zip(plain, classed)):
        assert np.array_equal(a, b), i
