"""On-backend output verification for the compiled device codec paths.

The interpret-mode suites (tests/test_pallas_fused.py,
tests/test_pallas_encode.py) gate the fused kernels' SEMANTICS on CPU;
this module gates the COMPILED artifacts on whatever backend JAX
resolves — on TPU that means the Mosaic-lowered kernels whose failure
modes (layout bugs, fori_loop replication, fma contraction) are
invisible to interpret mode. The driver bench calls device_parity_check
first and fails loudly when it does not hold (VERDICT r4 #2; reference
acceptance gates: build.sh:34-38).

Checks, each against the byte-exact host codec:
- fused Pallas decode (when active): reconstructed atoms within 5 mA of
  the exact decoder, all-atom RMSD vs the original PDB inside the
  reference gate 0.0826751 +- 1.5e-3 (test.pdb);
- XLA core decode (always): same bounds through the [B, S]-grid pack;
- device encode, fused and XLA core: serialized FCZ bytes IDENTICAL to
  codec/encoder.encode.
"""
from __future__ import annotations

import os
import pathlib

import numpy as np

_REF_TEST = pathlib.Path(
    os.environ.get("FOLDCOMP_REF_TEST", "/root/reference/test"))

# build.sh:35-36 golden: all-atom RMSD of the test.pdb roundtrip
_RMSD_GOLD = 0.0826751
_RMSD_TOL = 1.5e-3
_DEV_TOL_A = 5e-3        # vs exact decoder: compact wire quantum + ulps


def _load_fragments():
    from .io.pdb import parse_pdb
    from .io.structure import (identify_chains,
                               identify_discontinuous_fragments,
                               remove_alternative_positions)
    frags = []
    for name in ("test.pdb", "test_af.pdb"):
        p = _REF_TEST / name
        if not p.exists():
            continue
        atoms = remove_alternative_positions(parse_pdb(p.read_bytes()))
        (cs, ce), = identify_chains(atoms)
        (fs, fe), = identify_discontinuous_fragments(atoms, cs, ce)
        frags.append((name, atoms.slice(fs, fe)))
    return frags


def _decode_atoms(outs, metas):
    from .codec.batch import _gather_a14
    from .kernels.sidechain import atom_mask
    per = []
    for m in metas:
        a14 = _gather_a14(outs, m)
        mask = np.asarray(atom_mask(m.res_code))
        per.append(a14[mask])
    return per


def _check_decode(fczs, exact_coords, orig_for_rmsd, packer, runner):
    from .core.exact import rmsd
    arrays, metas = packer(fczs)
    outs = runner(arrays)
    got = _decode_atoms(outs, metas)
    max_dev = 0.0
    rmsd_val = None
    for i, (g, e) in enumerate(zip(got, exact_coords)):
        n = min(len(g), e.shape[0])
        max_dev = max(max_dev, float(np.abs(g[:n] - e[:n]).max()))
        if i == 0 and orig_for_rmsd is not None:
            rmsd_val = float(rmsd(g[:n], orig_for_rmsd[:n]))
    ok = max_dev < _DEV_TOL_A and (
        rmsd_val is None or abs(rmsd_val - _RMSD_GOLD) < _RMSD_TOL)
    return ok, max_dev, rmsd_val


def device_parity_check() -> dict:
    """Verify every compiled device path's OUTPUT on the live backend.

    Returns a dict with device_parity_ok plus per-path detail keys;
    device_parity_ok is True only if every checked path holds its gate.
    Cheap (~seconds warm): two small fixture proteins, all paths."""
    import jax

    from .codec import fcz as fczmod
    from .codec.batch import (encode_fragment_batch,
                              pack_decode_batch_lanes,
                              pack_decode_batch_seg, use_fused_decode,
                              use_fused_encode)
    from .codec.decoder import decode as decode_exact
    from .codec.encoder import encode as encode_exact
    from .kernels.decode import decode_seg_core

    out = {"backend": jax.default_backend(), "checked": [], "failures": []}
    frags = _load_fragments()
    if not frags:
        out["device_parity_ok"] = False
        out["failures"].append("no fixtures available")
        return out

    fczs = [encode_exact(f) for _, f in frags]
    exact_coords = [np.asarray(decode_exact(f).coords) for f in fczs]
    orig0 = np.asarray(frags[0][1].coords) if frags[0][0] == "test.pdb" \
        else None
    # ragged-lane batch: both proteins + a repeat (exercises lane reuse)
    batch = fczs + [fczs[0]]
    batch_coords = exact_coords + [exact_coords[0]]

    # -- decode: fused Pallas kernels (compiled on accelerator) --
    if use_fused_decode():
        from .kernels.pallas_decode import decode_seg_fused

        def run_fused(arrays):
            off, ca = decode_seg_fused(
                arrays["seg_records"], arrays["mins_lane"],
                arrays["cont_lane"], arrays["sc_codes_seg"],
                arrays["fwd9"], arrays["rev9"], arrays["is_first"],
                arrays["seg_m"])
            return np.asarray(off), np.asarray(ca)

        ok, dev, r = _check_decode(batch, batch_coords, orig0,
                                   pack_decode_batch_lanes, run_fused)
        out["checked"].append("decode_fused")
        out["decode_fused_max_dev_A"] = round(dev, 6)
        if r is not None:
            out["decode_fused_rmsd"] = round(r, 6)
        if not ok:
            out["failures"].append(
                f"decode_fused: dev={dev:.2e} rmsd={r}")

        # -- decode: the PRODUCTION resolution (_seg_decode_arrays),
        # which may pick a deserialized AOT artifact (kernels/aot.py)
        # over the jit — whatever actually serves the next job must
        # hold the same gate --
        from .codec.batch import _seg_decode_arrays
        from .kernels.aot import _aot_dir, _decode_key

        def run_default(arrays):
            nl = arrays.pop("nl_out", None)
            off, ca = _seg_decode_arrays(
                dict(arrays, nl_out=nl), refine_iters=2)
            return np.asarray(off), np.asarray(ca)

        ok, dev, r = _check_decode(batch, batch_coords, orig0,
                                   pack_decode_batch_lanes, run_default)
        try:
            d = _aot_dir()
            arrays, _ = pack_decode_batch_lanes(batch)
            nl = arrays.pop("nl_out", None)
            key = _decode_key(arrays, 2, int(nl) if nl is not None
                              else None)
            aot_hit = d is not None and os.path.exists(
                os.path.join(d, f"decode_{key}.jaxexp"))
        except Exception:  # noqa: BLE001
            aot_hit = False
        label = "decode_aot" if aot_hit else "decode_default"
        out["checked"].append(label)
        out[label + "_max_dev_A"] = round(dev, 6)
        if not ok:
            out["failures"].append(f"{label}: dev={dev:.2e} rmsd={r}")

        # -- decode: the bb-only wire (device backbone + native host
        # side-chain placement; auto-selected in the [5, 200) MB/s
        # link band) --
        from .native import get_lib
        if get_lib() is not None:
            import dataclasses

            def pack_bb(fs):
                arrays, metas = pack_decode_batch_lanes(fs)
                metas = [dataclasses.replace(
                    m, sc_codes=np.asarray(f.sc_codes, np.uint8))
                    for m, f in zip(metas, fs)]
                return arrays, metas

            def run_bb(arrays):
                off_bb, ca_bb = decode_seg_fused(
                    arrays["seg_records"], arrays["mins_lane"],
                    arrays["cont_lane"], arrays["sc_codes_seg"],
                    arrays["fwd9"], arrays["rev9"], arrays["is_first"],
                    arrays["seg_m"], wire="bb")
                return ("bb", np.asarray(off_bb), np.asarray(ca_bb))

            ok, dev, r = _check_decode(batch, batch_coords, orig0,
                                       pack_bb, run_bb)
            out["checked"].append("decode_bb")
            out["decode_bb_max_dev_A"] = round(dev, 6)
            if r is not None:
                out["decode_bb_rmsd"] = round(r, 6)
            if not ok:
                out["failures"].append(
                    f"decode_bb: dev={dev:.2e} rmsd={r}")

    # -- decode: XLA core (compiled on the live backend) --
    def run_xla(arrays):
        off, ca = decode_seg_core(
            arrays["seg_records"], arrays["mins_lane"],
            arrays["cont_lane"], arrays["sc_codes_seg"],
            arrays["anchor_xyz"], arrays["seg_m"],
            res_index=arrays["res_index"], refine_iters=2,
            nerf_impl="xla", gather_free=True, compact=True,
            sc_impl="select")
        return np.asarray(off), np.asarray(ca)

    ok, dev, r = _check_decode(batch, batch_coords, orig0,
                               pack_decode_batch_seg, run_xla)
    out["checked"].append("decode_xla")
    out["decode_xla_max_dev_A"] = round(dev, 6)
    if r is not None:
        out["decode_xla_rmsd"] = round(r, 6)
    if not ok:
        out["failures"].append(f"decode_xla: dev={dev:.2e} rmsd={r}")

    # -- encode: the active device path (fused on accelerator), then the
    # XLA core forced — both must serialize byte-identical --
    golden = [fczmod.serialize(f) for f in fczs]
    modes = [("encode_" + ("fused" if use_fused_encode() else "xla"),
              {})]
    if use_fused_encode():
        from .native import get_lib

        # the default fused run rides the native plane-major wire when
        # the library is present; force the numpy wire (+ its device
        # transpose prologue) as a separate checked path
        if get_lib() is not None:
            modes.append(("encode_fused_npwire",
                          {"FOLDCOMP_TPU_PLANAR_WIRE": "0"}))
        modes.append(("encode_xla", {"FOLDCOMP_TPU_FUSED_ENC": "0"}))
    for label, forced in modes:
        prev = {k: os.environ.get(k) for k in forced}
        try:
            os.environ.update(forced)
            got = encode_fragment_batch([f for _, f in frags])
        finally:
            for k, v in prev.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v
        out["checked"].append(label)
        bad = [i for i, (g, want) in enumerate(zip(got, golden))
               if g is None or fczmod.serialize(g) != want]
        if bad:
            out["failures"].append(f"{label}: byte mismatch on {bad}")

    out["device_parity_ok"] = not out["failures"]
    return out
