"""Micro-benchmarks of fuse_and_render sub-pieces (dev tool)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")

from semantic_suma_tpu.config import MapConfig, SumaConfig
from semantic_suma_tpu.core import surfel_map as sm
from scripts.legacy_kernels import zbuffer_argmin_flagged
from semantic_suma_tpu.utils import lie


def timeit(name, fn, *args, n=50, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:42s} {dt*1e3:8.3f} ms")
    return out


def main():
    cfg = SumaConfig(map=MapConfig(surfel_capacity=1 << 21,
                                   active_capacity=1 << 18,
                                   max_poses=8192))
    dc, mc = cfg.data, cfg.map
    act_n = mc.active_capacity
    hw = dc.height * dc.width
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)

    # fake active view
    pos = jax.random.uniform(k1, (act_n, 3), jnp.float32, -40, 40)
    nrm = jax.random.normal(k2, (act_n, 3))
    nrm = nrm / jnp.linalg.norm(nrm, axis=-1, keepdims=True)
    f = jnp.zeros((act_n, sm.NUM_F), jnp.float32)
    f = f.at[:, sm._WPOS].set(pos).at[:, sm._WNRM].set(nrm)
    f = f.at[:, sm._RADIUS].set(0.1).at[:, sm._CONF].set(1.0)
    i = jnp.zeros((act_n, sm.NUM_I), jnp.int32).at[:, sm._VALID].set(1)
    act = sm.PackedSurfels(f=f, i=i)

    frame_img = jax.random.normal(k3, (hw, 10), jnp.float32)
    pose = jnp.eye(4, dtype=jnp.float32)
    pose_inv = pose
    ts = jnp.asarray(10, jnp.int32)

    proj = timeit("project_surfels",
                  jax.jit(lambda a, pi: sm._project_surfels(a, pi, dc,
                                                            facing_eps=0.0)),
                  act, pose_inv)

    pid = proj.py * dc.width + proj.px
    timeit("frame_img[pid] gather [262k,10]",
           jax.jit(lambda fi, p: fi[p]), frame_img, pid)

    stage_a = jax.jit(lambda a_, fi, p_: sm._update_stage_a(
        a_, fi, pose, p_, ts, dc, mc, True))
    a = timeit("stage_a (incl gather)", stage_a, act, frame_img, proj)

    idx_sel = act.valid & (proj.cosv > 0.01) & proj.inside
    ids = jnp.where(idx_sel, pid, -1)
    rsel = idx_sel & (a.new_conf_nc > -1.0)
    timeit("zbuffer_argmin_flagged",
           jax.jit(lambda i_, d_, r_: zbuffer_argmin_flagged(i_, d_, r_, hw)),
           ids, proj.depth, rsel)

    winner_all, winner_render, wdep = zbuffer_argmin_flagged(
        ids, proj.depth, rsel, hw)
    closest = winner_all[jnp.minimum(pid, hw - 1)] == jnp.arange(act_n)
    timeit("update_finish",
           jax.jit(lambda a2, st, cl: sm._update_finish(a2, st, cl, ts, mc,
                                                        -1.0)),
           act, a, closest)

    timeit("render row gather [57600,16]",
           jax.jit(lambda f_, w_: f_[jnp.maximum(w_, 0)]), act.f,
           winner_render)

    # fused whole: stage_a+finish only (elementwise bound?)
    def fused(a_, fi):
        p_ = sm._project_surfels(a_, pose_inv, dc, facing_eps=0.0)
        st = sm._update_stage_a(a_, fi, pose, p_, ts, dc, mc, True)
        cl = jnp.zeros((act_n,), bool)
        return sm._update_finish(a_, st, cl, ts, mc, -1.0)
    timeit("proj+stageA+finish fused", jax.jit(fused), act, frame_img)


if __name__ == "__main__":
    main()
