"""Round-5 perf probes: carried-fori composites with REAL fetch syncs
(np.asarray — jax.block_until_ready is lazy on the axon tunnel and reports
enqueue rate; see PERF.md pitfalls).

Measures: whole odometry_step, zbuffer_runs (current + gather-merge
variant), _disk_resolve R=1 vs R=2.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(_REPO, ".cache", "jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from semantic_suma_tpu.config import MapConfig, SumaConfig
from semantic_suma_tpu.core import pipeline
from semantic_suma_tpu.core import surfel_map as sm
from semantic_suma_tpu.ops import zbuffer as zb
from semantic_suma_tpu.io.simulation import (circular_trajectory,
                                             default_world, render_scan)


def steady(cfg, n=24):
    world = default_world(seed=0, extent=45.0)
    gt = circular_trajectory(n, radius=18.0, step=1.5)
    gen = jax.jit(lambda pose: render_scan(world, pose, cfg.data))
    state = pipeline.init_state(cfg)
    ct = jnp.asarray(-2.0, jnp.float32)
    scan = None
    for i in range(n):
        scan = gen(gt[i])
        state, info = pipeline.odometry_step(
            state, scan.points, scan.labels, scan.probs, scan.valid, ct, cfg)
    np.asarray(info.pose)
    return state, scan


def diff_time(label, make_f, k_lo=4, k_hi=24, reps=3):
    times = {}
    for k in (k_lo, k_hi):
        f = make_f(k)
        np.asarray(f(jnp.float32(0.0)))  # compile + run
        t0 = time.perf_counter()
        for r in range(reps):
            out = f(jnp.float32(r * 0.1))
        np.asarray(out)  # REAL sync
        times[k] = (time.perf_counter() - t0) / reps
    per = (times[k_hi] - times[k_lo]) / (k_hi - k_lo)
    print(f"{label:42s} {per*1e3:8.3f} ms/op  (K{k_lo}={times[k_lo]*1e3:.1f} "
          f"K{k_hi}={times[k_hi]*1e3:.1f})", flush=True)
    return per


def main():
    cfg = SumaConfig(map=MapConfig(surfel_capacity=1 << 21,
                                   active_capacity=1 << 18,
                                   min_fresh_rows=2 * 64 * 900,
                                   max_poses=8192))
    dcfg, mcfg = cfg.data, cfg.map
    hw = dcfg.height * dcfg.width
    state, scan = steady(cfg)
    ct = jnp.asarray(-2.0, jnp.float32)

    # ---- whole step (carried) ----
    def mk_step(k):
        def body(i, c):
            st, t = c
            st2, _ = pipeline.odometry_step(
                st, scan.points + t * 1e-9, scan.labels, scan.probs,
                scan.valid, ct, cfg)
            return (st2, t)
        return jax.jit(lambda t0: jax.lax.fori_loop(
            0, k, body, (state, t0))[0].pose)
    diff_time("odometry_step whole (carried)", mk_step)

    # ---- realistic zbuffer inputs from the steady state ----
    from semantic_suma_tpu.utils import lie
    act = state.map.active
    pose_inv = lie.se3_inverse(state.pose)
    proj = sm._project_surfels(act, pose_inv, dcfg, facing_eps=0.0)
    vis01 = proj.cosv > 0.01
    idx_sel = act.valid & vis01 & proj.inside
    ids0 = np.asarray(jnp.where(idx_sel, proj.py * dcfg.width + proj.px, -1))
    dep0 = np.asarray(proj.depth)
    rsel0 = np.asarray(idx_sel)  # stand-in flags with realistic density
    comp0 = np.asarray(idx_sel & (act.confidence > -1.0))
    print(f"# candidates: {int((ids0 >= 0).sum())} / {ids0.shape[0]}",
          flush=True)
    ids_j, dep_j = jnp.asarray(ids0), jnp.asarray(dep0)
    rs_j, cp_j = jnp.asarray(rsel0), jnp.asarray(comp0)

    def mk_zb(k):
        def body(i, c):
            acc, t = c
            wa, (wr, wc), (wdr, _) = zb.zbuffer_runs(
                ids_j, dep_j + t * 1e-9, (rs_j, cp_j), hw,
                depth_bound=100.0, flag_payloads=(True, False))
            acc = acc + wa.sum() + wr.sum() + wc.sum() + \
                jnp.where(jnp.isfinite(wdr), wdr, 0.0).sum()
            return (acc, t + 1e-6)
        return jax.jit(lambda t0: jax.lax.fori_loop(
            0, k, body, (jnp.float32(0.0), t0))[0])
    diff_time("zbuffer_runs (current)", mk_zb)

    # ---- disk resolve R=1 vs R=2 ----
    img = jnp.asarray(np.random.default_rng(0).normal(
        size=(dcfg.height, dcfg.width, 9)).astype(np.float32))
    hasg = jnp.asarray(np.random.default_rng(1).uniform(
        size=(dcfg.height, dcfg.width)) < 0.8)

    for rr in (1, 2):
        def mk_dr(k, rr=rr):
            def body(i, c):
                acc, t = c
                m = sm._disk_resolve(img + t * 1e-9, hasg, dcfg, rr)
                acc = acc + m.vertex.sum() + m.normal.sum() + \
                    m.sem_prob.sum() + m.vertex_valid.sum()
                return (acc, t + 1e-6)
            return jax.jit(lambda t0: jax.lax.fori_loop(
                0, k, body, (jnp.float32(0.0), t0))[0])
        diff_time(f"_disk_resolve R={rr}", mk_dr)


if __name__ == "__main__":
    main()
