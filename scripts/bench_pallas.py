"""A/B: Pallas bilateral kernel vs the XLA formulation (TPU dev tool)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".cache", "jax"))

from semantic_suma_tpu.ops.filters import bilateral_filter
from semantic_suma_tpu.ops.pallas_kernels import bilateral_filter_pallas

h, w = 64, 900
rng = np.random.default_rng(0)
vm = jnp.asarray(rng.normal(size=(h, w, 3)).astype(np.float32) * 5 + 20)
vv = jnp.asarray(rng.uniform(size=(h, w)) < 0.9)

def timeit(name, f):
    out = f(vm, vv)
    np.asarray(out)
    t0 = time.perf_counter()
    k = 50
    for i in range(k):
        out = f(vm + i * 1e-9, vv)
    np.asarray(out)
    print(f"{name:28s} {(time.perf_counter()-t0)/k*1e3:7.3f} ms", flush=True)
    return np.asarray(out)

a = timeit("bilateral XLA", lambda x, v: bilateral_filter(x, v))
b = timeit("bilateral Pallas", lambda x, v: bilateral_filter_pallas(x, v))
print("max abs diff:", float(np.max(np.abs(a - b))))
