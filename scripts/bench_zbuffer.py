"""Microbenchmark: z-buffer argmin variants on TPU (dev tool)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")

from semantic_suma_tpu.ops.zbuffer import zbuffer_argmin

N = 1 << 18
HW = 64 * 900
rng = np.random.default_rng(0)
ids = jnp.asarray(rng.integers(-1, HW, size=N), jnp.int32)
depth = jnp.asarray(rng.uniform(2.0, 75.0, size=N), jnp.float32)


def packed_sort(ids, depth, num_cells, depth_bound=80.0, depth_bits=15):
    n = ids.shape[0]
    valid = (ids >= 0) & (ids < num_cells)
    scale = (1 << depth_bits) / depth_bound
    q = jnp.clip((depth * scale).astype(jnp.int32), 0, (1 << depth_bits) - 1)
    key = jnp.where(valid, ids << depth_bits, num_cells << depth_bits) | \
        jnp.where(valid, q, (1 << depth_bits) - 1)
    payload = jnp.arange(n, dtype=jnp.int32)
    skey, spay = jax.lax.sort((key, payload), num_keys=1)
    sid = skey >> depth_bits
    prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), sid[:-1]])
    is_first = (sid != prev) & (sid < num_cells)
    scatter_ids = jnp.where(is_first, sid, num_cells)
    winner = jnp.full((num_cells,), -1, jnp.int32).at[scatter_ids].set(
        spay, mode="drop", unique_indices=True)
    wd = jnp.where(winner >= 0, depth[jnp.maximum(winner, 0)], jnp.inf)
    return winner, wd


def scatter_min_packed(ids, depth, num_cells, depth_bound=80.0):
    n = ids.shape[0]
    valid = (ids >= 0) & (ids < num_cells)
    pay_bits = max(1, (n - 1).bit_length())
    depth_bits = 31 - pay_bits
    scale = (1 << depth_bits) / depth_bound
    q = jnp.clip((depth * scale).astype(jnp.int32), 0, (1 << depth_bits) - 1)
    val = (q << pay_bits) | jnp.arange(n, dtype=jnp.int32)
    sid = jnp.where(valid, ids, num_cells)
    out = jnp.full((num_cells,), jnp.iinfo(jnp.int32).max, jnp.int32)
    out = out.at[sid].min(val, mode="drop")
    has = out != jnp.iinfo(jnp.int32).max
    winner = jnp.where(has, out & ((1 << pay_bits) - 1), -1)
    wd = jnp.where(has, depth[jnp.maximum(winner, 0)], jnp.inf)
    return winner, wd


def run(name, fn):
    f = jax.jit(lambda i, d: fn(i, d, HW))
    w, wd = f(ids, depth)
    jax.block_until_ready(w)
    t0 = time.perf_counter()
    for _ in range(50):
        w, wd = f(ids, depth)
    jax.block_until_ready(w)
    print(f"{name:25s} {(time.perf_counter()-t0)/50*1e3:7.3f} ms")
    return np.asarray(w), np.asarray(wd)


w0, d0 = run("sort 2-key (current)", zbuffer_argmin)
w1, d1 = run("sort packed 1-key", packed_sort)
w2, d2 = run("scatter-min packed", scatter_min_packed)
print("agree packed vs current:", np.mean(w0 == w1))
print("agree scatter vs current:", np.mean(w0 == w2))
print("depth close:", np.allclose(np.where(np.isfinite(d0), d0, 0),
                                  np.where(np.isfinite(d1), d1, 0), atol=1e-5))

# --- re-measure with realistic ids (mostly invalid/duplicated) ---
frac_valid = 0.3
ids2 = jnp.asarray(np.where(rng.uniform(size=N) < frac_valid,
                            rng.integers(0, HW, size=N), -1), jnp.int32)
clustered = np.sort(rng.integers(0, HW, size=N)).astype(np.int32)
ids3 = jnp.asarray(np.where(rng.uniform(size=N) < 0.9, clustered, -1),
                   jnp.int32)
print("-- 30% valid uniform --")
ids = ids2
run("sort 2-key (current)", zbuffer_argmin)
run("sort packed 1-key", packed_sort)
print("-- 90% valid clustered --")
ids = ids3
run("sort 2-key (current)", zbuffer_argmin)
run("sort packed 1-key", packed_sort)
