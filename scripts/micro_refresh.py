"""Micro: (a) cost of arena pass-through w/o donation, (b) refresh cadence
and amortized cost in the bench loop, (c) donation retry (dev tool)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(_REPO, ".cache", "jax"))

from semantic_suma_tpu.config import MapConfig, SumaConfig
from semantic_suma_tpu.core.pipeline import init_state, odometry_step
from semantic_suma_tpu.io.simulation import (circular_trajectory,
                                             default_world, render_scan)


def timeit(name, fn, *args, n=30, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:46s} {dt*1e3:8.3f} ms", flush=True)
    return out


def main():
    # (a) pure pass-through of a big array through jit + lax.cond
    big = jnp.zeros((1 << 21, 16), jnp.float32)  # 134 MB
    small = jnp.zeros((8,), jnp.float32)

    @jax.jit
    def passthrough(b, s):
        return b, s + 1

    @jax.jit
    def cond_passthrough(b, s):
        b2, s2 = jax.lax.cond(s[0] > 100,
                              lambda: (b + 1, s + 1),
                              lambda: (b, s + 1))
        return b2, s2

    timeit("jit passthrough 134MB", passthrough, big, small)
    timeit("lax.cond passthrough 134MB (false br)", cond_passthrough,
           big, small)

    # (b) donated variant — thread the aliased output back as the next
    # input so each timed call consumes a live buffer (a donated input is
    # deleted after the call on backends where donation is real)
    don = jax.jit(lambda b, s: (b, s + 1), donate_argnums=(0,))
    try:
        b, s = don(big.copy(), small)
        jax.block_until_ready(b)
        t0 = time.perf_counter()
        n = 30
        for _ in range(n):
            b, s = don(b, s)
        jax.block_until_ready(b)
        print(f"{'jit passthrough 134MB DONATED':46s} "
              f"{(time.perf_counter()-t0)/n*1e3:8.3f} ms", flush=True)
    except Exception as e:  # noqa
        print("donation failed:", repr(e))

    # (c) step cadence: count refreshes over the bench trajectory
    cfg = SumaConfig(map=MapConfig(surfel_capacity=1 << 21,
                                   active_capacity=1 << 18,
                                   max_poses=8192))
    world = default_world(seed=0, extent=45.0)
    gt = circular_trajectory(40, radius=18.0, step=1.5)
    gen = jax.jit(lambda pose: render_scan(world, pose, cfg.data))
    scans = [jax.tree.map(lambda a: a.copy(), gen(gt[i])) for i in range(40)]
    step = jax.jit(odometry_step, static_argnames=("cfg",))
    state = init_state(cfg)
    ct = jnp.asarray(-2.0, jnp.float32)
    prev_anchor = None
    n_ref = 0
    times = []
    for i in range(40):
        s = scans[i]
        t0 = time.perf_counter()
        state, info = step(state, s.points, s.labels, s.probs, s.valid,
                           ct, cfg)
        jax.block_until_ready(info.pose)
        dt = time.perf_counter() - t0
        a = tuple(jax.device_get(state.map.anchor).tolist())
        refreshed = a != prev_anchor
        prev_anchor = a
        n_ref += bool(refreshed)
        if i >= 5:
            times.append((dt, refreshed))
    r = [t for t, f in times if f]
    nr = [t for t, f in times if not f]
    print(f"refreshes in 40 scans: {n_ref}")
    print(f"step w/ refresh   : n={len(r)}  mean={1e3*sum(r)/max(len(r),1):.2f} ms")
    print(f"step w/o refresh  : n={len(nr)} mean={1e3*sum(nr)/max(len(nr),1):.2f} ms")


if __name__ == "__main__":
    main()
