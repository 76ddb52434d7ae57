"""Device-only timing of encode_sc_q_core (one-hot MXU predecessor form)."""
import json, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax

B, L = 512, 288
rng = np.random.default_rng(0)
atom14 = rng.normal(0, 10, (B, L, 14, 3)).astype(np.float32)
res_code = rng.integers(0, 20, (B, L)).astype(np.int32)
from foldcomp_tpu.kernels.encode import encode_sc_q_core
d_a = jax.device_put(atom14); d_c = jax.device_put(res_code)
t0 = time.perf_counter()
out = encode_sc_q_core(d_a, d_c); jax.block_until_ready(out)
compile_s = time.perf_counter() - t0
t0 = time.perf_counter()
outs = [encode_sc_q_core(d_a, d_c) for _ in range(10)]
jax.block_until_ready(outs)
dt = (time.perf_counter() - t0) / 10
print(json.dumps({"backend": jax.default_backend(), "ms": round(dt*1e3, 2),
                  "mres_s": round(B*L/dt/1e6, 2), "compile_s": round(compile_s, 1)}))
