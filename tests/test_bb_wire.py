"""bb-only decode wire: device backbone rows + native side-chain
placement (fcz_place_sc_from_bb) vs the full-atom fused path.

The backbone slots must be BIT-EQUAL to the full device path (same k2
output, different epilogue); O + side chains are placed on host with
the reference float op order, so they sit at least as close to the
exact decoder as the device f32 kernel's placements."""
import numpy as np
import pytest

from test_property_roundtrip import synthesize

from foldcomp_tpu.codec.batch import (_gather_a14, _outs_to_host,
                                      pack_decode_batch_lanes)
from foldcomp_tpu.codec.decoder import decode as decode_exact
from foldcomp_tpu.codec.encoder import encode
from foldcomp_tpu.kernels.pallas_decode import decode_seg_fused
from foldcomp_tpu.native import get_lib


def _run(arrays, metas, wire):
    import dataclasses
    nl = arrays.get("nl_out")
    out = decode_seg_fused(
        arrays["seg_records"], arrays["mins_lane"], arrays["cont_lane"],
        arrays["sc_codes_seg"], arrays["fwd9"], arrays["rev9"],
        arrays["is_first"], arrays["seg_m"], refine_iters=2,
        interpret=True, nl_out=int(nl) if nl is not None else None,
        wire=wire)
    host = _outs_to_host((("bb",) + tuple(out)) if wire == "bb"
                         else out)
    return [_gather_a14(host, m) for m in metas]


def test_bb_wire_matches_full_path():
    if get_lib() is None:
        pytest.skip("native library unavailable")
    import dataclasses
    fczs = [encode(synthesize(n, seed=i))
            for i, n in enumerate((26, 60, 151, 60))]
    arrays, metas = pack_decode_batch_lanes(fczs)
    full = _run(arrays, metas, "full")
    bb_metas = [dataclasses.replace(
        m, sc_codes=np.asarray(f.sc_codes, np.uint8))
        for m, f in zip(metas, fczs)]
    bb = _run(arrays, bb_metas, "bb")
    exact = [np.asarray(decode_exact(f).coords) for f in fczs]

    from foldcomp_tpu.core.aatable import N_ATOMS
    for i, (a, b, f) in enumerate(zip(full, bb, fczs)):
        assert a.shape == b.shape, i
        # the bb wire's 0.1 mA backbone quantum is finer than the full
        # wire's 1 mA, so slots agree within the full wire's grid
        assert np.abs(a[:, :3] - b[:, :3]).max() <= 1.2e-3, i
        # side chains vs the exact decoder: the native placement must be
        # no farther than the device kernel's (same backbone input)
        e = exact[i]
        codes = np.asarray(bb_metas[i].res_code)
        pos = 0
        dev_a = []
        dev_b = []
        for r, c in enumerate(codes):
            cnt = int(N_ATOMS[c]) if c < 20 else 3
            dev_a.append(np.abs(a[r, :cnt] - e[pos:pos + cnt]).max())
            dev_b.append(np.abs(b[r, :cnt] - e[pos:pos + cnt]).max())
            pos += cnt
        assert max(dev_b) <= max(dev_a) + 1e-3, (i, max(dev_a), max(dev_b))


def test_use_bb_wire_env_and_probe(monkeypatch):
    from foldcomp_tpu.codec import batch as B

    # env pins
    monkeypatch.setenv("FOLDCOMP_TPU_WIRE", "full")
    assert B.use_bb_wire() is False
    monkeypatch.setenv("FOLDCOMP_TPU_WIRE", "bb")
    assert B.use_bb_wire() is (get_lib() is not None)
    # auto: probe drives the decision
    monkeypatch.delenv("FOLDCOMP_TPU_WIRE", raising=False)
    import foldcomp_tpu.cli as cli
    for result, mbs, want in (("slow", 9.9, True), ("ok", 150.0, True),
                              ("ok", 800.0, False), ("slow", 0.0, False),
                              ("none", 0.0, False)):
        monkeypatch.setattr(cli, "_probe_info", lambda r=result, m=mbs:
                            (r, m))
        got = B.use_bb_wire()
        if get_lib() is None:
            assert got is False
        else:
            assert got is want, (result, mbs)
