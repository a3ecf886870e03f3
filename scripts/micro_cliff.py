"""Micro: locate the N-size perf cliff in sort/gather ops; validate the
chunked z-buffer (split candidates into <=CHUNK pieces, merge winners)."""
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

from semantic_suma_tpu.ops.zbuffer import zbuffer_argmin

HW = 64 * 900


def timeit(name, fn, *args, n=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:48s} {(time.perf_counter()-t0)/n*1e3:8.3f} ms")
    return out


def chunked_zb(ids, depth, num_cells, chunk):
    """zbuffer_argmin over <=chunk-sized slices, merged elementwise."""
    n = ids.shape[0]
    best_w = jnp.full((num_cells,), -1, jnp.int32)
    best_d = jnp.full((num_cells,), jnp.inf, jnp.float32)
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        w, d = zbuffer_argmin(ids[lo:hi], depth[lo:hi], num_cells)
        w = jnp.where(w >= 0, w + lo, -1)
        take = d < best_d
        best_w = jnp.where(take, w, best_w)
        best_d = jnp.where(take, d, best_d)
    return best_w, best_d


def main():
    key = jax.random.PRNGKey(0)
    for N in (1 << 17, (1 << 17) + (1 << 16), 1 << 18):
        k1, k2 = jax.random.split(jax.random.fold_in(key, N))
        ids = jax.random.randint(k1, (N,), -1000, HW).astype(jnp.int32)
        depth = jax.random.uniform(k2, (N,), minval=1.0, maxval=80.0)
        pay = jnp.arange(N, dtype=jnp.int32)

        timeit(f"lax.sort 1key N={N}",
               jax.jit(lambda i, p: jax.lax.sort((i, p), num_keys=1)),
               ids, pay)
        timeit(f"zbuffer_argmin N={N}",
               jax.jit(lambda i, d: zbuffer_argmin(i, d, HW)), ids, depth)

    N = 1 << 18
    k1, k2 = jax.random.split(jax.random.fold_in(key, N))
    ids = jax.random.randint(k1, (N,), -1000, HW).astype(jnp.int32)
    depth = jax.random.uniform(k2, (N,), minval=1.0, maxval=80.0)
    for chunk in (1 << 16, 1 << 17):
        f = jax.jit(lambda i, d, c=chunk: chunked_zb(i, d, HW, c))
        w2, d2 = timeit(f"chunked_zb N={N} chunk={chunk}", f, ids, depth)
    w1, d1 = jax.jit(lambda i, d: zbuffer_argmin(i, d, HW))(ids, depth)
    # depths must agree exactly; winners may differ on quantized-depth ties
    print("  depth agreement:",
          float(jnp.mean((jnp.asarray(d1) == jnp.asarray(d2)) |
                         (jnp.isinf(d1) & jnp.isinf(d2)))))
    print("  winner agreement:", float(jnp.mean(w1 == w2)))

    # is the cliff also in plain gathers / elementwise?
    for N in (1 << 17, 1 << 18):
        k1, _ = jax.random.split(jax.random.fold_in(key, N + 7))
        rows = jax.random.normal(k1, (N, 16), jnp.float32)
        idx = jax.random.randint(k1, (N,), 0, N).astype(jnp.int32)
        timeit(f"row gather [N,16] N={N}",
               jax.jit(lambda r, i: r[i]), rows, idx)
        timeit(f"elementwise x*2+1 [N,16] N={N}",
               jax.jit(lambda r: r * 2 + 1), rows)


if __name__ == "__main__":
    main()
