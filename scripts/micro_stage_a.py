"""Bisect _update_stage_a + zbuffer_flagged internals (dev tool)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")

from semantic_suma_tpu.config import MapConfig, SumaConfig
from semantic_suma_tpu.core import surfel_map as sm
from semantic_suma_tpu.models.labels import is_movable


def timeit(name, fn, *args, n=50, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:42s} {dt*1e3:8.3f} ms", flush=True)
    return out


def main():
    cfg = SumaConfig(map=MapConfig(surfel_capacity=1 << 21,
                                   active_capacity=1 << 18,
                                   max_poses=8192))
    dc, mc = cfg.data, cfg.map
    act_n = mc.active_capacity
    hw = dc.height * dc.width
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)

    labels = jax.random.randint(k1, (act_n,), 0, 260, jnp.int32)
    v0 = jax.random.normal(k2, (act_n, 3))
    v1 = jax.random.normal(k3, (act_n, 3))
    v0 = v0 / jnp.linalg.norm(v0, axis=-1, keepdims=True)
    v1 = v1 / jnp.linalg.norm(v1, axis=-1, keepdims=True)
    w = jnp.full((act_n,), 0.7, jnp.float32)
    depth = jnp.abs(jax.random.normal(k1, (act_n,))) * 30
    ids = jax.random.randint(k2, (act_n,), -1, hw, jnp.int32)
    flags = jax.random.bernoulli(k3, 0.5, (act_n,))

    timeit("is_movable LUT gather [262k]",
           jax.jit(lambda l: is_movable(l)), labels)
    timeit("slerp [262k]",
           jax.jit(lambda a, b, ww: sm._slerp(a, b, ww)), v0, v1, w)

    from semantic_suma_tpu.ops.zbuffer import zbuffer_argmin
    from scripts.legacy_kernels import zbuffer_argmin_flagged
    timeit("zbuffer_argmin [262k]",
           jax.jit(lambda i_, d_: zbuffer_argmin(i_, d_, hw)), ids, depth)
    timeit("zbuffer_flagged [262k]",
           jax.jit(lambda i_, d_, f_: zbuffer_argmin_flagged(i_, d_, f_, hw)),
           ids, depth, flags)

    # flagged internals
    payload = jnp.arange(act_n, dtype=jnp.int32)
    timeit("  sort single-key",
           jax.jit(lambda k_, p_: jax.lax.sort((k_, p_), num_keys=1)),
           ids, payload)
    timeit("  flags[payload] gather",
           jax.jit(lambda f_, p_: f_[p_]), flags, payload)
    timeit("  cummax x2",
           jax.jit(lambda p_: (jax.lax.cummax(p_), jax.lax.cummax(p_ + 1))),
           payload)
    timeit("  scatter unique [262k->57600]",
           jax.jit(lambda i_, p_: jnp.full((hw,), -1, jnp.int32)
                   .at[jnp.where(i_ >= 0, i_ % hw, hw)]
                   .set(p_, mode="drop", unique_indices=True)), ids, payload)


if __name__ == "__main__":
    main()
