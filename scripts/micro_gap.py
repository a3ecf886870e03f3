"""Close the per-scan budget gap: composite timings of odometry_step and its
stage groups with the same fori-differencing as micro_fr (per-op table).

Stage groups: preprocess | gauss_newton | fuse_and_render | whole step.
Whatever the whole step costs beyond the sum of groups is glue/refresh.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(_REPO, ".cache", "jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from semantic_suma_tpu.config import MapConfig, SumaConfig
from semantic_suma_tpu.core import pipeline
from semantic_suma_tpu.core import surfel_map as sm
from scripts.micro_fr import steady_state, timed


def main():
    cfg = SumaConfig(map=MapConfig(surfel_capacity=1 << 21,
                                   active_capacity=1 << 18,
                                   max_poses=8192))
    dcfg, mcfg = cfg.data, cfg.map
    state, scan, info = steady_state(cfg)
    ct = jnp.asarray(-2.0, jnp.float32)

    # ---- whole odometry_step, carried state ----
    def make_step_body():
        def body(carry_t):
            st, t = carry_t
            st2, _ = pipeline.odometry_step(
                st, scan.points + t * 1e-9, scan.labels, scan.probs,
                scan.valid, ct, cfg)
            return (st2, t)
        return body

    for k_lo, k_hi in ((4, 24),):
        times = {}
        for k in (k_lo, k_hi):
            f = jax.jit(lambda st, t0, k=k: jax.lax.fori_loop(
                0, k, lambda i, c: make_step_body()(
                    (c[0], t0 + 1e-6 * i)), (st, t0))[0].pose)
            jax.block_until_ready(f(state, jnp.float32(0.0)))
            reps = 3
            t0c = time.perf_counter()
            for r in range(reps):
                out = f(state, jnp.float32(r * 0.1))
            jax.block_until_ready(out)
            times[k] = (time.perf_counter() - t0c) / reps
        per = (times[k_hi] - times[k_lo]) / (k_hi - k_lo)
        print(f"{'odometry_step whole (carried)':34s} {per*1e3:8.3f} ms/op"
              f"   (K{k_lo}={times[k_lo]*1e3:.1f}ms"
              f" K{k_hi}={times[k_hi]*1e3:.1f}ms)", flush=True)

    # ---- fuse_and_render composite, carried state ----
    maps = pipeline.preprocess_scan(scan.points, scan.labels, scan.probs,
                                    scan.valid, False, cfg)
    frame = sm.data_surfel_init(maps, dcfg, mcfg)
    pose = state.pose
    ts = state.timestamp

    def far_body(carry, t):
        st = carry
        new_map, mm, _, _ = sm.fuse_and_render(
            st, frame._replace(radius=frame.radius + t * 1e-9), pose, ts,
            dcfg, mcfg, ct, ts + 1, True)
        return new_map

    times = {}
    for k in (4, 24):
        f = jax.jit(lambda mstate, t0, k=k: jax.lax.fori_loop(
            0, k, lambda i, c: far_body(c, t0 + 1e-6 * i), mstate).count)
        jax.block_until_ready(f(state.map, jnp.float32(0.0)))
        reps = 3
        t0c = time.perf_counter()
        for r in range(reps):
            out = f(state.map, jnp.float32(r * 0.1))
        jax.block_until_ready(out)
        times[k] = (time.perf_counter() - t0c) / reps
    per = (times[24] - times[4]) / 20
    print(f"{'fuse_and_render composite':34s} {per*1e3:8.3f} ms/op"
          f"   (K4={times[4]*1e3:.1f}ms K24={times[24]*1e3:.1f}ms)",
          flush=True)

    # ---- maybe_refresh with no movement (the common case) ----
    def mr_body(t):
        st = sm.maybe_refresh(state.map, state.pose[:3, 3] + t * 1e-9,
                              mcfg, 57600)
        return jnp.sum(st.active_blocks).astype(jnp.float32) * 1e-20 + t
    timed("maybe_refresh (no-move branch)", mr_body, k_lo=4, k_hi=24)

    # ---- forced incremental refresh (upper bound of the rare branch) ----
    def rf_body(t):
        st = sm.refresh_active_incremental(
            state.map, state.pose[:3, 3] + t * 1e-3, mcfg)
        return jnp.sum(st.active_blocks).astype(jnp.float32) * 1e-20 + t
    timed("refresh_incremental (forced)", rf_body, k_lo=2, k_hi=10)


if __name__ == "__main__":
    main()
