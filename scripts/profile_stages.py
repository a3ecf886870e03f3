"""Per-stage timing of the SLAM step on the current backend (dev tool)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")

from semantic_suma_tpu.config import MapConfig, SumaConfig
from semantic_suma_tpu.core import surfel_map as sm
from semantic_suma_tpu.core.pipeline import init_state, odometry_step
from semantic_suma_tpu.core.preprocessing import preprocess_scan
from semantic_suma_tpu.io.simulation import (circular_trajectory,
                                             default_world, render_scan)
from semantic_suma_tpu.ops import icp as icp_ops
from semantic_suma_tpu.ops.zbuffer import zbuffer_argmin


def _sync(out):
    """Value fetch — block_until_ready returns early on the remote tunnel."""
    leaf = jax.tree.leaves(out)[0]
    np_leaf = jax.device_get(leaf)
    return np_leaf


def timeit(name, fn, *args, n=30, **kw):
    out = fn(*args, **kw)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    _sync(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:35s} {dt*1e3:8.3f} ms")
    return out


def main():
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
    for i in range(30):
        s = scans[i]
        state, info = step(state, s.points, s.labels, s.probs, s.valid, ct, cfg)
    jax.block_until_ready(state.pose)
    print("map count:", int(state.map.count))

    s = scans[30]
    timeit("full odometry_step", step, state, s.points, s.labels, s.probs,
           s.valid, ct, cfg)

    pre = jax.jit(lambda p, l, pr, v: preprocess_scan(
        p, l, pr, v, jnp.asarray(False), cfg))
    data_maps = timeit("preprocess_scan", pre, s.points, s.labels, s.probs,
                       s.valid)

    gn = jax.jit(lambda d, m, t0: icp_ops.gauss_newton(
        d, m, t0, cfg.icp, cfg.model, semantic=True))
    timeit("gauss_newton (steady ~4 iter)", gn, data_maps, state.model_maps,
           state.last_increment)

    frame = jax.jit(lambda m: sm.data_surfel_init(m, cfg.data, cfg.map))(
        data_maps)
    fuse = jax.jit(lambda st, fr, pose, ts: sm.fuse_and_render(
        st, fr, pose, ts, cfg.data, cfg.map, ct, ts + 1 - 100,
        semantic=True))
    timeit("fuse_and_render", fuse, state.map, frame, state.pose,
           state.timestamp)

    # inner pieces of fuse_and_render
    pose_inv = jax.jit(lambda p: jnp.linalg.inv(p))(state.pose)
    act = state.map.active
    proj = jax.jit(lambda d, pi: sm._project_surfels(d, pi, cfg.data))(
        act, pose_inv)
    timeit("  _project_surfels [262k]",
           jax.jit(lambda d, pi: sm._project_surfels(d, pi, cfg.data)),
           act, pose_inv)
    hw = cfg.data.height * cfg.data.width
    ids = jnp.where(act.valid & proj.visible & proj.inside,
                    proj.py * cfg.data.width + proj.px, -1)
    timeit("  zbuffer_argmin [262k]",
           jax.jit(lambda i, d: zbuffer_argmin(i, d, hw)), ids, proj.depth)
    sel = act.valid & proj.visible & proj.inside
    timeit("  _resolve_maps",
           jax.jit(lambda d, p, s_: sm._resolve_maps(
               [sm.RenderEntries(d, p, s_)], cfg.data)), act, proj, sel)
    frame_img = jax.jit(sm._pack_frame_image)(frame)
    timeit("  _update_view",
           jax.jit(lambda a, fi, fr, po, pi, ps, ts: sm._update_view(
               a, fi, fr, po, pi, ps, ts, cfg.data, cfg.map, ct, True)),
           act, frame_img, frame, state.pose, pose_inv, state.map.poses,
           state.timestamp)
    refresh = jax.jit(lambda st, c: sm.refresh_active(st, c, cfg.map))
    timeit("  refresh_active (paging)", refresh, state.map,
           state.pose[:3, 3])


if __name__ == "__main__" and len(sys.argv) == 1:
    main()


def gn_cost():
    import functools
    cfg = SumaConfig(map=MapConfig(surfel_capacity=1 << 21,
                                   active_capacity=1 << 18,
                                   max_poses=8192))
    world = default_world(seed=0, extent=45.0)
    gt = circular_trajectory(4, radius=18.0, step=1.5)
    gen = jax.jit(lambda pose: render_scan(world, pose, cfg.data))
    s0 = gen(gt[0]); s1 = gen(gt[1])
    pre = jax.jit(lambda s: preprocess_scan(
        s.points, s.labels, s.probs, s.valid, jnp.asarray(False), cfg))
    m0, m1 = pre(s0), pre(s1)
    for bilinear in (True, False):
        for n_it in (1, 8):
            gn = jax.jit(functools.partial(
                icp_ops.gauss_newton, icp=cfg.icp, model_cfg=cfg.model,
                semantic=True, bilinear=bilinear, max_iterations=n_it))
            r = gn(m1, m0, jnp.eye(4)); jax.block_until_ready(r.pose)
            t0 = time.perf_counter()
            for _ in range(50):
                r = gn(m1, m0, jnp.eye(4))
            jax.block_until_ready(r.pose)
            dt = (time.perf_counter() - t0) / 50
            print(f"gn bilinear={bilinear} iters={n_it}: {dt*1e3:7.3f} ms "
                  f"(ran {int(r.iterations)})")


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "gn":
    gn_cost()
