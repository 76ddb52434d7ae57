"""Full decode timing: pallas vs xla backbone under one-hot side chains."""
import json, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax

from bench import _load_fcz
from foldcomp_tpu.codec.batch import pack_decode_batch_seg
from foldcomp_tpu.kernels.decode import decode_seg_core

f = _load_fcz()
arrays, metas = pack_decode_batch_seg([f] * 512)
n_res = sum(m.n_residue for m in metas)
dev = {k: jax.device_put(v) for k, v in arrays.items()}

def run(nerf_impl):
    return decode_seg_core(dev["seg_records"], dev["mins_lane"],
                           dev["cont_lane"], dev["sc_codes_seg"],
                           dev["anchor_xyz"], dev["seg_m"], refine_iters=2,
                           nerf_impl=nerf_impl, gather_free=True,
                           compact=True, sc_impl="onehot")

for impl in ("xla", "pallas"):
    t0 = time.perf_counter()
    jax.block_until_ready(run(impl))
    comp = time.perf_counter() - t0
    t0 = time.perf_counter()
    outs = [run(impl) for _ in range(10)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / 10
    print(json.dumps({"impl": impl, "ms": round(dt*1e3, 2),
                      "mres_s": round(n_res/dt/1e6, 2),
                      "compile_s": round(comp, 1)}))
    if impl == "xla":
        ref = [np.asarray(x) for x in outs[0]]
    else:
        got = [np.asarray(x) for x in outs[0]]
        same = all(np.array_equal(a, b) for a, b in zip(ref, got))
        close = all(np.allclose(a.astype(np.float64), b.astype(np.float64),
                                atol=2) for a, b in zip(ref, got))
        print(json.dumps({"check": "pallas_vs_xla", "bitexact": same,
                          "close": close}))
