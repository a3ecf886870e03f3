"""Decompose fuse_and_render's device time into per-op costs.

Method: each sub-op runs K times inside ONE jitted lax.fori_loop with a
loop-carried perturbation (prevents loop-invariant hoisting and DCE); the
per-op time is (T(K_hi) - T(K_lo)) / (K_hi - K_lo), which cancels dispatch
and data-transfer overhead — the only reliable isolation on the remote-TPU
tunnel. Inputs are a REAL steady-state active view (30 warmup scans), so
gather/scatter locality matches production.
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
from semantic_suma_tpu.io.simulation import (circular_trajectory,
                                             default_world, render_scan)
from semantic_suma_tpu.ops.zbuffer import zbuffer_runs
from semantic_suma_tpu.utils import lie


def steady_state(cfg, n_warm=30):
    world = default_world(seed=0, extent=45.0)
    gt = circular_trajectory(n_warm + 1, radius=18.0, step=1.5)
    gen = jax.jit(lambda pose: render_scan(world, pose, cfg.data))
    state = pipeline.init_state(cfg)
    ct = jnp.asarray(-2.0, jnp.float32)
    for i in range(n_warm):
        s = gen(gt[i])
        state, info = pipeline.odometry_step(
            state, s.points, s.labels, s.probs, s.valid, ct, cfg)
    float(info.pose[0, 3])
    scan = jax.tree.map(lambda a: a.copy(), gen(gt[n_warm]))
    return state, scan, info


def timed(name, body, k_lo=8, k_hi=72):
    """body(t: f32 scalar) -> f32 scalar; must depend on t and feed carry."""
    times = {}
    for k in (k_lo, k_hi):
        f = jax.jit(lambda t0, k=k: jax.lax.fori_loop(
            0, k, lambda i, t: body(t + 1e-6 * i), t0))
        float(f(jnp.float32(0.0)))         # compile + warm
        float(f(jnp.float32(1.0)))
        reps = 3
        t0 = time.perf_counter()
        for r in range(reps):
            out = f(jnp.float32(r * 0.1))
        float(out)
        times[k] = (time.perf_counter() - t0) / reps
    per = (times[k_hi] - times[k_lo]) / (k_hi - k_lo)
    print(f"{name:34s} {per*1e3:8.3f} ms/op   (K{k_lo}={times[k_lo]*1e3:.1f}ms"
          f" K{k_hi}={times[k_hi]*1e3:.1f}ms)", flush=True)
    return per


def main():
    which = set(sys.argv[1:]) if len(sys.argv) > 1 else None

    def want(k):
        return which is None or k in which

    cfg = SumaConfig(map=MapConfig(surfel_capacity=1 << 21,
                                   active_capacity=1 << 18,
                                   max_poses=8192))
    dcfg, mcfg = cfg.data, cfg.map
    hw = dcfg.height * dcfg.width
    state, scan, info = steady_state(cfg)
    slam_map = state.map
    act = slam_map.active
    pose = state.pose
    pose_inv = lie.se3_inverse(pose)
    ts = state.timestamp

    maps = pipeline.preprocess_scan(scan.points, scan.labels, scan.probs,
                                    scan.valid, False, cfg)
    frame = sm.data_surfel_init(maps, dcfg, mcfg)
    frame_img = sm._pack_frame_image(frame)
    proj = sm._project_surfels(act, pose_inv, dcfg, facing_eps=0.0)
    a = sm._update_stage_a(act, frame_img, pose, proj, ts, dcfg, mcfg, True)
    idx_sel = act.valid & (proj.cosv > 0.01) & proj.inside
    ids = jnp.where(idx_sel, a.pid, -1)
    rsel = idx_sel & (a.new_conf_nc > -2.0)
    winner_all, (winner_render, winner_compat), (wdepth_render, _) = \
        zbuffer_runs(ids, proj.depth, (rsel, a.compatible), hw)
    jax.block_until_ready(winner_all)

    n_act = act.capacity

    if want("project"):
        def body(t):
            pi = pose_inv.at[0, 3].add(t)
            p = sm._project_surfels(act, pi, dcfg, facing_eps=0.0)
            return jnp.sum(p.depth) * 1e-20 + t
        timed("project_surfels [262k]", body)

    if want("stage_a"):
        def body(t):
            fi = frame_img.at[0, 0].add(t)
            s = sm._update_stage_a(act, fi, pose, proj, ts, dcfg, mcfg, True)
            return jnp.sum(s.avg_pos_w) * 1e-20 + t
        timed("update_stage_a [262k]", body)

    if want("frame_gather"):
        def body(t):
            fi = frame_img.at[0, 0].add(t)
            g = fi[a.pid]
            return jnp.sum(g) * 1e-20 + t
        timed("frame_img row gather [262k,10]", body)

    if want("zb_runs"):
        def body(t):
            d = proj.depth + t
            w, (wr, wc), (wd, _) = zbuffer_runs(ids, d, (rsel, a.compatible),
                                                hw)
            return (jnp.sum(wd) + jnp.sum(w)) * 1e-20 + t
        timed("zbuffer_runs total [262k]", body)

    if want("sort"):
        payload = jax.lax.broadcasted_iota(jnp.int32, (n_act,), 0)

        def body(t):
            d = proj.depth + t
            q = jnp.clip((d * 20.0).astype(jnp.int32), 0, (1 << 14) - 1)
            key = (jnp.where(idx_sel, ids, hw) << 14) | q
            sk, sp = jax.lax.sort((key, payload), num_keys=1)
            return (jnp.sum(sk) + jnp.sum(sp)).astype(jnp.float32) * 1e-20 + t
        timed("bare 1-key sort+payload [262k]", body)

    if want("finish"):
        pid_safe = jnp.minimum(a.pid, hw - 1)
        closest = winner_all[pid_safe] == jnp.arange(n_act)

        def body(t):
            a2 = a._replace(new_conf_nc=a.new_conf_nc + t * 1e-9)
            u = sm._update_finish(act, a2, closest, ts, mcfg, -2.0)
            return jnp.sum(u.f[:, 7]) * 1e-20 + t
        timed("update_finish [262k]", body)

    if want("render"):
        upd = sm._update_finish(
            act, a, winner_all[jnp.minimum(a.pid, hw - 1)]
            == jnp.arange(n_act), ts, mcfg, -2.0)
        jax.block_until_ready(upd.f)

        def body(t):
            f2 = upd.f.at[0, 0].add(t)
            has = winner_render >= 0
            g = f2[jnp.maximum(winner_render, 0)]
            gl = upd.i[jnp.maximum(winner_render, 0), 2]
            p_c = g[:, 10:13] @ pose_inv[:3, :3].T + pose_inv[:3, 3]
            n_c = g[:, 13:16] @ pose_inv[:3, :3].T
            img = jnp.concatenate([
                p_c, n_c, g[:, 6][:, None], gl[:, None].astype(jnp.float32),
                g[:, 9][:, None]], axis=-1)
            img = jnp.where(has[:, None], img, 0.0)
            mm = sm._disk_resolve(img.reshape(dcfg.height, dcfg.width, 9),
                                  has.reshape(dcfg.height, dcfg.width), dcfg)
            return jnp.sum(mm.vertex) * 1e-20 + t
        timed("render gather+disk [57.6k]", body)

    if want("create"):
        integrated = winner_compat >= 0

        def body(t):
            fr = frame._replace(radius=frame.radius + t * 1e-9)
            nd, create = sm._make_new_surfels(fr, pose, ts, integrated,
                                              mcfg, True)
            ckey = (~create).astype(jnp.int32)
            _, perm = jax.lax.sort(
                (ckey, jnp.arange(hw, dtype=jnp.int32)), num_keys=1)
            rows = nd.take(perm)
            return jnp.sum(rows.f[:, 0]) * 1e-20 + t
        timed("creation make+sort+take [57.6k]", body)

    if want("append"):
        nd, create = sm._make_new_surfels(frame, pose, ts,
                                          winner_compat >= 0, mcfg, True)
        jax.block_until_ready(nd.f)

        def body(t):
            av = act.f.at[0, 0].add(t)
            av = jax.lax.dynamic_update_slice(
                av, nd.f[:hw // 4], (state.map.active_count, 0))
            ai = jax.lax.dynamic_update_slice(
                act.i, nd.i[:hw // 4], (state.map.active_count, 0))
            return (jnp.sum(av[0]) + jnp.sum(ai[0])) * 1e-20 + t
        timed("append 1 chunk DUS [14.4k]", body)

    if want("gathers"):
        nd, create = sm._make_new_surfels(frame, pose, ts,
                                          winner_compat >= 0, mcfg, True)
        ckey = (~create).astype(jnp.int32)
        _, perm = jax.lax.sort((ckey, jnp.arange(hw, dtype=jnp.int32)),
                               num_keys=1)
        jax.block_until_ready(perm)

        def g16(t):
            f2 = nd.f.at[0, 0].add(t)
            return jnp.sum(f2[perm]) * 1e-20 + t
        timed("row gather [57.6k,16] f32", g16)

        def g4(t):
            i2 = nd.i.at[0, 0].add(t.astype(jnp.int32))
            return jnp.sum(i2[perm]).astype(jnp.float32) * 1e-20 + t
        timed("row gather [57.6k,4] i32", g4)

        def gmk(t):
            fr = frame._replace(radius=frame.radius + t * 1e-9)
            nd2, _ = sm._make_new_surfels(fr, pose, ts, winner_compat >= 0,
                                          mcfg, True)
            return jnp.sum(nd2.f[:, 0]) * 1e-20 + t
        timed("make_new_surfels alone", gmk)

        def gsort(t):
            ck = ckey + (t * 0).astype(jnp.int32)
            _, p2 = jax.lax.sort((ck, jnp.arange(hw, dtype=jnp.int32)),
                                 num_keys=1)
            return jnp.sum(p2).astype(jnp.float32) * 1e-20 + t
        timed("creation-flag sort [57.6k]", gsort)

        def gscat(t):
            pos = jnp.arange(n_act, dtype=jnp.int32)
            sa = jnp.where(idx_sel, jnp.minimum(a.pid, hw - 1), hw)
            p0 = jnp.full((hw + 1,), n_act, jnp.int32).at[sa].set(
                pos + (t * 0).astype(jnp.int32), mode="drop",
                unique_indices=True)
            return jnp.sum(p0).astype(jnp.float32) * 1e-20 + t
        timed("the one [262k]->[57.6k] scatter", gscat)

        def gss(t):
            key = jnp.where(idx_sel, ids, hw) + (t * 0).astype(jnp.int32)
            sk = jax.lax.sort(key)
            q = jnp.searchsorted(sk, jnp.arange(hw, dtype=jnp.int32))
            return jnp.sum(q).astype(jnp.float32) * 1e-20 + t
        timed("sort+searchsorted [262k]->[57.6k]", gss)

        def gcum(t):
            pos = jnp.arange(n_act, dtype=jnp.int32)
            nxt = jax.lax.cummin(
                jnp.where(rsel, pos, n_act) + (t * 0).astype(jnp.int32),
                reverse=True)
            return jnp.sum(nxt).astype(jnp.float32) * 1e-20 + t
        timed("one cummin [262k]", gcum)

    if want("preprocess"):
        def body(t):
            m = pipeline.preprocess_scan(scan.points + t * 1e-9, scan.labels,
                                         scan.probs, scan.valid, False, cfg)
            return jnp.sum(m.vertex) * 1e-20 + t
        timed("preprocess_scan [64x900]", body)

    if want("gn"):
        from semantic_suma_tpu.ops import icp as icp_ops

        def body(t):
            m2 = maps._replace(vertex=maps.vertex + t * 1e-9)
            r = icp_ops.gauss_newton(m2, state.model_maps,
                                     jnp.eye(4, dtype=jnp.float32),
                                     cfg.icp, cfg.model, semantic=True)
            return jnp.sum(r.pose) * 1e-20 + t
        timed("gauss_newton full", body, k_lo=4, k_hi=24)


if __name__ == "__main__":
    main()
