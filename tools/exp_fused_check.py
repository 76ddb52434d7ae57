"""Quick parity check: fused Pallas decode vs the production XLA core.

CPU: interpret mode. TPU: compiled kernels. Compares reconstructed
coordinates (off/1000 + ca) between decode_seg_fused and decode_seg_core
(compact planar path) on real test fixtures.

Usage: [JAX_PLATFORMS=cpu] python tools/exp_fused_check.py [--b 4]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=4)
    args = ap.parse_args()

    import jax
    import numpy as np

    from bench import _load_fcz
    from foldcomp_tpu.codec.batch import pack_decode_batch_seg
    from foldcomp_tpu.kernels.decode import decode_seg_core
    from foldcomp_tpu.kernels.pallas_decode import decode_seg_fused

    backend = jax.default_backend()
    interpret = backend == "cpu"
    print(f"backend={backend} interpret={interpret}")

    f = _load_fcz()
    arrays, metas = pack_decode_batch_seg([f] * args.b)
    dev = {k: jax.device_put(v) for k, v in arrays.items()}

    t0 = time.perf_counter()
    off_f, ca_f = decode_seg_fused(
        dev["seg_records"], dev["mins_lane"], dev["cont_lane"],
        dev["sc_codes_seg"], dev["anchor_xyz"], dev["seg_m"],
        dev["res_index"], interpret=interpret)
    jax.block_until_ready(off_f)
    print(f"fused ok in {time.perf_counter() - t0:.1f}s")

    off_x, ca_x = decode_seg_core(
        dev["seg_records"], dev["mins_lane"], dev["cont_lane"],
        dev["sc_codes_seg"], dev["anchor_xyz"], dev["seg_m"],
        res_index=dev["res_index"], refine_iters=2, nerf_impl="xla",
        gather_free=True, compact=True, sc_impl="select")

    n_res = sum(m.n_residue for m in metas)
    r = n_res  # real rows only
    off_f, ca_f = np.asarray(off_f)[:, :, :r], np.asarray(ca_f)[:, :r]
    off_x, ca_x = np.asarray(off_x)[:, :, :r], np.asarray(ca_x)[:, :r]

    co_f = off_f.astype(np.float32) / 1000.0 + ca_f[:, None, :]
    co_x = off_x.astype(np.float32) / 1000.0 + ca_x[:, None, :]
    d_ca = np.abs(ca_f - ca_x).max()
    d_co = np.abs(co_f - co_x).max()
    d_off = np.abs(off_f.astype(np.int32) - off_x.astype(np.int32)).max()
    print(f"max |d ca| = {d_ca:.2e} A, max |d coord| = {d_co:.2e} A, "
          f"max |d off| = {d_off} mA")
    assert d_ca < 1e-3 and d_co < 5e-3, "fused decode diverges"
    print("PARITY OK")


if __name__ == "__main__":
    main()
