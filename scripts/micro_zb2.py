"""Micro: sort-based z-buffer vs scatter-min z-buffer at bench operating point."""
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
from scripts.legacy_kernels import zbuffer_argmin_flagged

HW = 64 * 900


def timeit(name, fn, *args, n=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:45s} {(time.perf_counter()-t0)/n*1e3:8.3f} ms")
    return out


def scatter_min_zb(ids, depth, num_cells, depth_bound=100.0):
    """winner via .at[].min of packed (quantized depth | candidate idx)."""
    n = ids.shape[0]
    idx_bits = max(1, (n - 1)).bit_length()
    depth_bits = 31 - idx_bits
    qmax = (1 << depth_bits) - 1
    scale = (1 << depth_bits) / depth_bound
    q = jnp.clip((depth * scale).astype(jnp.int32), 0, qmax)
    packed = (q << idx_bits) | jnp.arange(n, dtype=jnp.int32)
    valid = (ids >= 0) & (ids < num_cells)
    tgt = jnp.where(valid, ids, num_cells)
    acc = jnp.full((num_cells + 1,), jnp.iinfo(jnp.int32).max, jnp.int32)
    acc = acc.at[tgt].min(packed, mode="drop")
    acc = acc[:num_cells]
    winner = jnp.where(acc == jnp.iinfo(jnp.int32).max, -1,
                       acc & ((1 << idx_bits) - 1))
    wd = jnp.where(winner >= 0, depth[jnp.maximum(winner, 0)], jnp.inf)
    return winner, wd


def main():
    for N in (1 << 17, 1 << 18):
        key = jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(key)
        ids = jax.random.randint(k1, (N,), -1000, HW).astype(jnp.int32)
        depth = jax.random.uniform(k2, (N,), minval=1.0, maxval=80.0)
        flags = jax.random.bernoulli(k1, 0.7, (N,))

        f_sort = jax.jit(lambda i, d: zbuffer_argmin(i, d, HW))
        f_scat = jax.jit(lambda i, d: scatter_min_zb(i, d, HW))
        f_flag = jax.jit(lambda i, d, fl: zbuffer_argmin_flagged(i, d, fl, HW))

        w1, d1 = timeit(f"sort zbuffer N={N}", f_sort, ids, depth)
        w2, d2 = timeit(f"scatter-min zbuffer N={N}", f_scat, ids, depth)
        timeit(f"flagged sort zbuffer N={N}", f_flag, ids, depth, flags)

        # agreement check (ties can differ only when quantized depths equal;
        # scatter picks lowest idx among equal-depth, sort also lowest idx)
        w1n, w2n = np.asarray(w1), np.asarray(w2)
        agree = (w1n == w2n).mean()
        print(f"  winner agreement: {agree:.4f}")

        def f_two_scat(i, d, fl):
            wa, _ = scatter_min_zb(i, d, HW)
            wf, wd = scatter_min_zb(jnp.where(fl, i, -1), d, HW)
            return wa, wf, wd
        timeit(f"2x scatter-min (all+flagged) N={N}",
               jax.jit(f_two_scat), ids, depth, flags)


if __name__ == "__main__":
    main()
