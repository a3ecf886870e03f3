"""In-jit ablation of odometry_step: monkeypatch one stage out, recompile the
WHOLE step, and measure steady-state step time. This is the only reliable
attribution on the remote-TPU tunnel (standalone sub-jit timings are polluted
by per-dispatch overhead and lost fusion)."""
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

from semantic_suma_tpu.config import IcpConfig, MapConfig, SumaConfig
from semantic_suma_tpu.core import pipeline
from semantic_suma_tpu.core import surfel_map as sm
from semantic_suma_tpu.io.simulation import (circular_trajectory,
                                             default_world, render_scan)
from semantic_suma_tpu.ops.icp import Maps


_BASE = {}  # (id(cfg-like key)) -> steady-state SlamState after real warmup


def base_state(cfg, scans, n_warm=30):
    """Run the REAL pipeline for n_warm scans once; variants start from a
    copy of this steady-state map so ablation timings aren't polluted by
    map-size side effects (a patched step that breaks association would
    otherwise freeze map growth and look artificially fast)."""
    key = (cfg.map.surfel_capacity, cfg.map.active_capacity, n_warm)
    if key in _BASE:
        return _BASE[key]
    state = pipeline.init_state(cfg)
    ct = jnp.asarray(-2.0, jnp.float32)
    for i in range(n_warm):
        s = scans[i]
        state, info = pipeline.odometry_step(
            state, s.points, s.labels, s.probs, s.valid, ct, cfg)
    float(info.pose[0, 3])
    _BASE[key] = (state, n_warm)
    return _BASE[key]


def run_variant(name, cfg, scans, n_warm=30, n_timed=20):
    base, start = base_state(cfg, scans, n_warm=n_warm)
    state = jax.tree.map(lambda a: a.copy(), base)
    pipeline.odometry_step.clear_cache()
    ct = jnp.asarray(-2.0, jnp.float32)
    t_c0 = time.perf_counter()
    # re-trace + light re-warm of the PATCHED step on the realistic state
    for i in range(start, start + 4):
        s = scans[i]
        state, info = pipeline.odometry_step(
            state, s.points, s.labels, s.probs, s.valid, ct, cfg)
    # NOTE: a value fetch, NOT block_until_ready — the axon remote platform
    # returns from block_until_ready before execution finishes
    float(info.pose[0, 3])
    compile_s = time.perf_counter() - t_c0
    t0 = time.perf_counter()
    for i in range(start + 4, start + 4 + n_timed):
        s = scans[i]
        state, info = pipeline.odometry_step(
            state, s.points, s.labels, s.probs, s.valid, ct, cfg)
    float(info.pose[0, 3])
    dt = (time.perf_counter() - t0) / n_timed
    print(f"{name:28s} {dt*1e3:8.3f} ms/scan   (warm+compile {compile_s:.0f}s,"
          f" map={int(info.map_count)})", flush=True)
    return dt


def main():
    which = set(sys.argv[1:]) if len(sys.argv) > 1 else None
    cfg = SumaConfig(map=MapConfig(surfel_capacity=1 << 21,
                                   active_capacity=1 << 18,
                                   max_poses=8192))
    world = default_world(seed=0, extent=45.0)
    n = 55
    gt = circular_trajectory(n, radius=18.0, step=1.5)
    gen = jax.jit(lambda pose: render_scan(world, pose, cfg.data))
    scans = [jax.tree.map(lambda a: a.copy(), gen(gt[i])) for i in range(n)]
    jax.block_until_ready(scans[-1].points)

    orig = dict(
        disk=sm._disk_resolve, finish=sm._update_finish, stage_a=sm._update_stage_a,
        slerp=sm._slerp, make_new=sm._make_new_surfels,
        runs=sm.zbuffer_runs, refresh=sm.maybe_refresh,
        project=sm._project_surfels)

    def restore():
        sm._disk_resolve = orig["disk"]
        sm._update_finish = orig["finish"]
        sm._update_stage_a = orig["stage_a"]
        sm._slerp = orig["slerp"]
        sm._make_new_surfels = orig["make_new"]
        sm.zbuffer_runs = orig["runs"]
        sm.maybe_refresh = orig["refresh"]
        sm._project_surfels = orig["project"]

    def want(k):
        return which is None or k in which

    if want("baseline"):
        run_variant("baseline", cfg, scans)

    if want("gn1"):
        cfg1 = cfg.replace(icp=IcpConfig(max_iterations=1))
        run_variant("gn max_iter=1", cfg1, scans)

    if want("no_resolve"):
        def no_resolve(img, hasg, dcfg):
            return Maps(vertex=img[..., 0:3], normal=img[..., 3:6],
                        vertex_valid=hasg, normal_valid=hasg,
                        sem_label=img[..., 7].astype(jnp.int32),
                        sem_prob=img[..., 8])
        sm._disk_resolve = no_resolve
        run_variant("no disk_resolve", cfg, scans)
        restore()

    if want("no_runs"):
        def fake_runs(ids, depth, flags, num_cells, depth_bound=100.0):
            nn = ids.shape[0]
            w = (jnp.arange(num_cells, dtype=jnp.int32) * 31) % nn
            wd = depth[w]
            return w, tuple(w for _ in flags), tuple(wd for _ in flags)
        sm.zbuffer_runs = fake_runs
        run_variant("no zbuffer_runs sort", cfg, scans)
        restore()

    if want("no_refresh"):
        def no_refresh(state, center, cfg_, pending_creates, margin=25.0,
                       refresh_distance=None):
            return state
        sm.maybe_refresh = no_refresh
        run_variant("no view refresh", cfg, scans)
        restore()

    if want("no_project"):
        def fake_project(data, pose_inv, dcfg, facing_eps=0.01):
            # cheap-math stand-in: linear ops only (no norm/arctan2/arcsin)
            p_c = data.wpos @ pose_inv[:3, :3].T + pose_inv[:3, 3]
            n_c = data.wnormal @ pose_inv[:3, :3].T
            depth = jnp.abs(p_c[:, 0]) + jnp.abs(p_c[:, 1]) + jnp.abs(p_c[:, 2])
            cosv = -jnp.sum(n_c * p_c, axis=-1) * 0.01
            nn = data.capacity
            px = (jnp.arange(nn, dtype=jnp.int32) * 7) % dcfg.width
            py = (jnp.arange(nn, dtype=jnp.int32) * 3) % dcfg.height
            inside = (depth > dcfg.min_depth) & (depth < dcfg.max_depth)
            return sm._Projected(p_c, n_c, depth, px, py, cosv > facing_eps,
                                 inside, cosv)
        sm._project_surfels = fake_project
        run_variant("no project (cheap)", cfg, scans)
        restore()

    if want("no_finish"):
        def no_finish(data, a, closest, ts, map_cfg, confidence_threshold):
            return data
        sm._update_finish = no_finish
        run_variant("no update_finish", cfg, scans)
        restore()

    if want("nlerp"):
        def nlerp(v0, v1, w):
            out = w[..., None] * v0 + (1.0 - w)[..., None] * v1
            return out / jnp.maximum(
                jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-12)
        sm._slerp = nlerp
        run_variant("slerp -> nlerp", cfg, scans)
        restore()

    if want("no_create"):
        def no_create(frame, pose, ts, integrated, map_cfg, semantic):
            hw = integrated.shape[0]
            return sm.make_packed(hw), jnp.zeros((hw,), bool)
        sm._make_new_surfels = no_create
        run_variant("no creations", cfg, scans)
        restore()

    if want("no_stage_a"):
        def fake_stage_a(data, frame_img, pose, proj, ts, data_cfg, map_cfg,
                         semantic):
            act = data.capacity
            f0 = jnp.zeros((act,), jnp.float32)
            b0 = jnp.zeros((act,), bool)
            return sm._UpdateStage(
                proj=proj, pid=proj.py * data_cfg.width + proj.px,
                observed=b0, compatible=b0, penalty=f0, log_odds_up=f0,
                integrate=b0, new_conf_nc=data.confidence,
                avg_pos_w=data.wpos, avg_nrm_w=data.wnormal,
                avg_prob=data.sem_prob, upd_radius=data.radius,
                new_weight=data.weight, new_ts=data.timestamp)
        sm._update_stage_a = fake_stage_a
        run_variant("no stage_a", cfg, scans)
        restore()

    if want("no_preprocess"):
        const_maps = [None]

        real_pre = pipeline.preprocess_scan

        def fake_pre(points, labels, probs, point_valid, is_first, cfg_):
            if const_maps[0] is None:
                const_maps[0] = jax.tree.map(
                    lambda a: a.copy(), real_pre(points, labels, probs,
                                                 point_valid, is_first, cfg_))
            return const_maps[0]
        pipeline.preprocess_scan = fake_pre
        run_variant("no preprocess (const maps)", cfg, scans)
        pipeline.preprocess_scan = real_pre

    if want("no_put"):
        orig_put = sm.PackedSurfels.put
        sm.PackedSurfels.put = lambda self, slots, rows: rows
        run_variant("no creation-compact put", cfg, scans)
        sm.PackedSurfels.put = orig_put

    if want("act17"):
        cfg17 = SumaConfig(map=MapConfig(surfel_capacity=1 << 21,
                                         active_capacity=1 << 17,
                                         max_poses=8192))
        run_variant("active 2^17", cfg17, scans)

    if want("act16"):
        cfg16 = SumaConfig(map=MapConfig(surfel_capacity=1 << 21,
                                         active_capacity=1 << 16,
                                         max_poses=8192))
        run_variant("active 2^16", cfg16, scans)


if __name__ == "__main__":
    main()
