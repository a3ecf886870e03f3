"""Semantic surfel map: fixed-capacity SoA state + fusion/render kernels.

TPU-native redesign of the reference's GPU surfel pipeline
(``/root/reference/src/core/SurfelMap.{h,cpp}`` and the shader passes
``gen_indexmap`` / ``init_radiusConf`` / ``update_surfels`` / ``gen_surfels``
/ ``copy_surfels`` / ``render_surfels`` / ``render_compose``):

* The reference keeps one big GPU vertex buffer (cap 2048^2 surfels) mutated
  by transform-feedback stream compaction. JAX needs static shapes, so the
  map is a fixed-capacity structure-of-arrays pytree with a validity mask; a
  **periodic cumsum compaction** replaces transform feedback, and creation is
  an **append via prefix-sum offsets + unique-index scatter**.

* Per-scan work runs on an **active view** — a gathered, fixed-size subset
  of surfels near the vehicle (the TPU analogue of the reference's submap
  window, ``SurfelMap.cpp:744-824``, which pages far tiles off the GPU).
  The view is built with one cheap full-capacity mask+cumsum pass; update
  results scatter back with unique indices.

* Surfels store their geometry in the frame of their *creation pose* plus
  the index of that pose (reference ``Surfel.h`` count field), so loop
  closures only rewrite the pose table — plus a cached world-frame copy
  (refreshed on pose updates) so the hot path never gathers 4x4 poses.

* Splat rendering (surfel disks under spherical projection, z-buffered) is
  center-scatter into a per-pixel z-buffer (deterministic sort-based
  reduction, ``ops/zbuffer.py``) followed by a 3x3 neighborhood gather with
  a per-pixel ray/disk intersection test — one z-buffer entry per surfel
  instead of rasterizing a quad, with the disk footprint resolved on the
  gather side.

* The per-surfel update (data association, odds-based stability with
  semantic penalty, recursive semantic probability, slerp normal averaging)
  is a branch-free vectorized kernel over the active view, mirroring the
  math of ``update_surfels.vert:140-334``.

All functions are pure; the whole per-scan map update + render is fused into
a single jitted device program by the pipeline.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import DataConfig, MapConfig
from ..models.labels import is_movable
from ..ops.icp import Maps
from ..ops.projection import INV_PI, pixel_rays
from ..ops.zbuffer import zbuffer_argmin, gather_or
from ..utils import lie


class SurfelData(NamedTuple):
    """SoA surfel attributes (reference ``Surfel.h:5-15``)."""

    position: jnp.ndarray     # [N, 3] in creation-pose frame
    normal: jnp.ndarray       # [N, 3] in creation-pose frame
    radius: jnp.ndarray       # [N]
    confidence: jnp.ndarray   # [N] log-odds stability
    timestamp: jnp.ndarray    # [N] int32 last-update scan index
    creation_ts: jnp.ndarray  # [N] int32 creation scan index (pose index)
    weight: jnp.ndarray       # [N] accumulation weight
    sem_label: jnp.ndarray    # [N] int32
    sem_prob: jnp.ndarray     # [N] float32
    valid: jnp.ndarray        # [N] bool
    wpos: jnp.ndarray         # [N, 3] cached world-frame position
    wnormal: jnp.ndarray      # [N, 3] cached world-frame normal

    def take(self, idx: jnp.ndarray) -> "SurfelData":
        """Gather rows (out-of-range indices yield invalid rows)."""
        n = self.position.shape[0]
        safe = jnp.minimum(idx, n - 1)
        ok = idx < n
        sub = jax.tree.map(lambda a: a[safe], self)
        return sub._replace(valid=sub.valid & ok)


class MapState(NamedTuple):
    data: SurfelData          # capacity CAP
    count: jnp.ndarray        # int32 high-water mark of allocated slots
    poses: jnp.ndarray        # [MAX_POSES, 4, 4] per-timestamp poses


class ActiveView(NamedTuple):
    """Gathered working set of surfels near the vehicle."""

    idx: jnp.ndarray          # [ACT] int32 row in the global store (CAP = none)
    data: SurfelData          # [ACT] gathered rows


class FrameInputs(NamedTuple):
    """Per-scan inputs to the map update: data maps + per-pixel surfel init."""

    maps: Maps
    radius: jnp.ndarray        # [H, W] creation radius per pixel
    radius_valid: jnp.ndarray  # [H, W] bool


def _zeros_data(n: int) -> SurfelData:
    z3 = jnp.zeros((n, 3), jnp.float32)
    z1 = jnp.zeros((n,), jnp.float32)
    zi = jnp.zeros((n,), jnp.int32)
    return SurfelData(position=z3, normal=z3, radius=z1, confidence=z1,
                      timestamp=zi, creation_ts=zi, weight=z1,
                      sem_label=zi, sem_prob=z1,
                      valid=jnp.zeros((n,), bool), wpos=z3, wnormal=z3)


def empty_map(cfg: MapConfig) -> MapState:
    poses = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32),
                             (cfg.max_poses, 4, 4))
    return MapState(data=_zeros_data(cfg.surfel_capacity),
                    count=jnp.zeros((), jnp.int32), poses=poses)


# ---------------------------------------------------------------------------
# active view (submap-window analogue)
# ---------------------------------------------------------------------------

def build_active(state: MapState, center: jnp.ndarray,
                 cfg: MapConfig, margin: float = 25.0) -> ActiveView:
    """Gather surfels within the active radius of ``center`` into a
    fixed-size view (one mask+cumsum pass over the full store)."""
    cap = state.data.position.shape[0]
    act = cfg.active_capacity
    near = jnp.linalg.norm(state.data.wpos - center[None, :], axis=-1) \
        < (cfg.active_radius + margin)
    sel = state.data.valid & near
    order = jnp.cumsum(sel.astype(jnp.int32)) - 1
    slots = jnp.where(sel & (order < act), order, act)
    idx = jnp.full((act,), cap, jnp.int32).at[slots].set(
        jnp.arange(cap, dtype=jnp.int32), mode="drop", unique_indices=True)
    return ActiveView(idx=idx, data=state.data.take(idx))


def scatter_back(state: MapState, view: ActiveView) -> MapState:
    """Write updated view rows back into the global store."""
    cap = state.data.position.shape[0]
    slots = jnp.where(view.idx < cap, view.idx, cap)

    def put(dst, src):
        return dst.at[slots].set(src, mode="drop", unique_indices=True)

    data = jax.tree.map(put, state.data, view.data)
    return state._replace(data=data)


# ---------------------------------------------------------------------------
# per-pixel data-surfel initialization (init_radiusConf.vert:41-68)
# ---------------------------------------------------------------------------

def data_surfel_init(maps: Maps, data_cfg: DataConfig,
                     map_cfg: MapConfig) -> FrameInputs:
    """Per-pixel surfel radius r = 1.41*d*pixel_size/clamp(cos angle,0.5,1),
    clamped to [min_radius, max_radius]; valid when vertex+normal valid and
    the surface faces the sensor."""
    v = maps.vertex
    n = maps.normal
    d = jnp.linalg.norm(v, axis=-1)
    view = -v / jnp.maximum(d, 1e-12)[..., None]
    cos_ang = jnp.sum(n * view, axis=-1)
    angle_thresh = math.cos(math.radians(map_cfg.max_angle))
    valid = maps.vertex_valid & maps.normal_valid & (cos_ang > angle_thresh)
    radius = 1.41 * d * data_cfg.pixel_size / jnp.clip(cos_ang, 0.5, 1.0)
    radius = jnp.clip(radius, map_cfg.min_radius, map_cfg.max_radius)
    return FrameInputs(maps=maps, radius=jnp.where(valid, radius, 0.0),
                       radius_valid=valid)


# ---------------------------------------------------------------------------
# projection helpers
# ---------------------------------------------------------------------------

def _project_px(pts: jnp.ndarray, cfg: DataConfig):
    """Integer pixel + depth + inside for sensor-frame points (same math as
    update_surfels.vert projectSpherical)."""
    x, y, z = pts[..., 0], pts[..., 1], pts[..., 2]
    depth = jnp.sqrt(x * x + y * y + z * z)
    yaw = jnp.arctan2(y, x)
    pitch = -jnp.arcsin(jnp.clip(z / jnp.maximum(depth, 1e-12), -1.0, 1.0))
    xf = 0.5 * (-yaw * INV_PI + 1.0) * cfg.width
    yf = (1.0 - (jnp.degrees(pitch) + cfg.fov_up) / cfg.fov) * cfg.height
    px = jnp.clip(jnp.floor(xf), 0, cfg.width - 1).astype(jnp.int32)
    py_f = jnp.floor(yf)
    py = jnp.clip(py_f, 0, cfg.height - 1).astype(jnp.int32)
    inside = ((depth >= cfg.min_depth) & (depth <= cfg.max_depth)
              & (py_f >= 0) & (py_f < cfg.height))
    return px, py, depth, inside


def _to_sensor(pose_inv: jnp.ndarray, wpos: jnp.ndarray, wnormal: jnp.ndarray):
    r = pose_inv[:3, :3]
    t = pose_inv[:3, 3]
    return wpos @ r.T + t, wnormal @ r.T


class _Projected(NamedTuple):
    p_c: jnp.ndarray      # [N,3] sensor-frame position
    n_c: jnp.ndarray      # [N,3] sensor-frame normal
    depth: jnp.ndarray    # [N]
    px: jnp.ndarray       # [N]
    py: jnp.ndarray       # [N]
    visible: jnp.ndarray  # [N] front-facing
    inside: jnp.ndarray   # [N] in image + depth range


def _project_surfels(data: SurfelData, pose_inv: jnp.ndarray,
                     cfg: DataConfig, facing_eps: float = 0.01) -> _Projected:
    p_c, n_c = _to_sensor(pose_inv, data.wpos, data.wnormal)
    depth = jnp.linalg.norm(p_c, axis=-1)
    visible = jnp.sum(n_c * (-p_c), axis=-1) / jnp.maximum(depth, 1e-12) \
        > facing_eps
    px, py, depth, inside = _project_px(p_c, cfg)
    return _Projected(p_c, n_c, depth, px, py, visible, inside)


# ---------------------------------------------------------------------------
# rendering: center-scatter z-buffer + neighborhood disk-gather
# (render_surfels.* + gen_indexmap + render_compose.frag)
# ---------------------------------------------------------------------------

class RenderEntries(NamedTuple):
    """One z-buffer candidate per selected surfel."""

    data: SurfelData          # [N] source attributes
    proj: _Projected          # [N]
    sel: jnp.ndarray          # [N] selected for rendering


def _selection(data: SurfelData, proj: _Projected, map_cfg: MapConfig,
               conf_threshold, ts_threshold, which: str) -> jnp.ndarray:
    sel = data.valid & proj.visible & proj.inside
    if map_cfg.use_stability:
        sel = sel & (data.confidence > conf_threshold)
    if which == "old":  # render_surfels.geom:90
        sel = sel & (data.creation_ts < ts_threshold)
    elif which == "new":  # render_surfels.geom:91
        sel = sel & ((data.creation_ts >= ts_threshold)
                     | (data.timestamp >= ts_threshold))
    return sel


def _resolve_maps(entries_list, cfg: DataConfig) -> Maps:
    """Resolve candidate streams to model maps.

    Phase 1: per-pixel nearest candidate via the sorted z-buffer (surfel
    centers only). Phase 2: each pixel gathers its 3x3 neighborhood winners,
    ray/disk-intersects their tangent disks, and keeps the nearest hit —
    recovering the disk footprint of the reference's quad rasterization
    without multiplying the z-buffer load by 9.
    """
    h, w = cfg.height, cfg.width
    hw = h * w

    ids = []
    deps = []
    for e in entries_list:
        pid = jnp.where(e.sel, e.proj.py * w + e.proj.px, -1)
        ids.append(pid)
        deps.append(jnp.where(e.sel, e.proj.depth, jnp.inf))
    offsets = [0]
    for e in entries_list[:-1]:
        offsets.append(offsets[-1] + e.sel.shape[0])
    winner, _ = zbuffer_argmin(jnp.concatenate(ids) if len(ids) > 1 else ids[0],
                               jnp.concatenate(deps) if len(deps) > 1 else deps[0],
                               hw)

    # flatten candidate attributes across streams
    def cat(get):
        parts = [get(e) for e in entries_list]
        return jnp.concatenate(parts) if len(parts) > 1 else parts[0]

    cand_p = cat(lambda e: e.proj.p_c)
    cand_n = cat(lambda e: e.proj.n_c)
    cand_r = cat(lambda e: e.data.radius)
    cand_lab = cat(lambda e: e.data.sem_label)
    cand_prob = cat(lambda e: e.data.sem_prob)

    rays = pixel_rays(cfg).reshape(hw, 3)
    win_grid = winner.reshape(h, w)

    # neighborhood gather: for each pixel, test the 9 surrounding cells'
    # winning surfels against this pixel's ray
    best_t = jnp.full((hw,), jnp.inf, jnp.float32)
    best_i = jnp.full((hw,), -1, jnp.int32)
    for dy in (-1, 0, 1):
        rolled = jnp.roll(win_grid, -dy, axis=0)
        if dy == 1:
            rolled = rolled.at[h - 1].set(-1)
        elif dy == -1:
            rolled = rolled.at[0].set(-1)
        for dx in (-1, 0, 1):
            cand = jnp.roll(rolled, -dx, axis=1).reshape(hw)
            safe = jnp.maximum(cand, 0)
            p = cand_p[safe]
            n = cand_n[safe]
            r = cand_r[safe]
            denom = jnp.sum(n * rays, axis=-1)
            t = jnp.sum(n * p, axis=-1) / jnp.where(
                jnp.abs(denom) < 1e-9, 1e-9, denom)
            hit = jnp.linalg.norm(rays * t[:, None] - p, axis=-1) <= r
            ok = (cand >= 0) & hit & (t > cfg.min_depth) & (t < cfg.max_depth)
            closer = ok & (t < best_t)
            best_t = jnp.where(closer, t, best_t)
            best_i = jnp.where(closer, cand, best_i)

    got = best_i >= 0
    safe = jnp.maximum(best_i, 0)
    vert = jnp.where(got[:, None], cand_p[safe], 0.0).reshape(h, w, 3)
    norm = jnp.where(got[:, None], cand_n[safe], 0.0).reshape(h, w, 3)
    lab = jnp.where(got, cand_lab[safe], 0).reshape(h, w)
    prob = jnp.where(got, cand_prob[safe], 0.0).reshape(h, w)
    okg = got.reshape(h, w)
    return Maps(vertex=vert, normal=norm, vertex_valid=okg, normal_valid=okg,
                sem_label=lab, sem_prob=prob)


def render_view(data: SurfelData, pose: jnp.ndarray, cfg: DataConfig,
                map_cfg: MapConfig, conf_threshold, ts_threshold,
                which: str = "new") -> Maps:
    """Render model maps from a set of surfels at the given view pose."""
    pose_inv = lie.se3_inverse(pose.astype(jnp.float32))
    proj = _project_surfels(data, pose_inv, cfg)
    sel = _selection(data, proj, map_cfg, conf_threshold, ts_threshold, which)
    return _resolve_maps([RenderEntries(data, proj, sel)], cfg)


def render_maps(state: MapState, pose: jnp.ndarray, cfg: DataConfig,
                map_cfg: MapConfig, conf_threshold, ts_threshold,
                render_old: bool = False) -> Maps:
    """Full-map render (builds an active view around the pose internally)."""
    view = build_active(state, pose[:3, 3].astype(jnp.float32), map_cfg)
    return render_view(view.data, pose, cfg, map_cfg, conf_threshold,
                       ts_threshold, "old" if render_old else "new")


def render_composed(state: MapState, pose_old: jnp.ndarray,
                    pose_new: jnp.ndarray, cfg: DataConfig,
                    map_cfg: MapConfig, conf_threshold, ts_threshold) -> Maps:
    """Depth-merged render: old surfels from pose_old + new surfels from
    pose_new into one z-buffer (SurfelMap.cpp:896-909 composed pass)."""
    view = build_active(state, pose_new[:3, 3].astype(jnp.float32), map_cfg)
    inv_old = lie.se3_inverse(pose_old.astype(jnp.float32))
    inv_new = lie.se3_inverse(pose_new.astype(jnp.float32))
    proj_o = _project_surfels(view.data, inv_old, cfg)
    proj_n = _project_surfels(view.data, inv_new, cfg)
    sel_o = _selection(view.data, proj_o, map_cfg, conf_threshold,
                       ts_threshold, "old")
    sel_n = _selection(view.data, proj_n, map_cfg, conf_threshold,
                       ts_threshold, "new")
    return _resolve_maps([RenderEntries(view.data, proj_o, sel_o),
                          RenderEntries(view.data, proj_n, sel_n)], cfg)


def compose_views(old: Maps, new: Maps, max_distance: float) -> Maps:
    """Merge old/new model views (render_compose.frag:26-48): prefer the new
    view; fall back to the old where new is invalid and the old vertex is
    within max_distance."""
    new_ok = new.vertex_valid & new.normal_valid
    old_ok = old.vertex_valid & old.normal_valid
    dist = jnp.linalg.norm(new.vertex - old.vertex, axis=-1)
    take_old = ~new_ok & old_ok & (~new.vertex_valid | (dist < max_distance))
    return Maps(
        vertex=jnp.where(take_old[..., None], old.vertex, new.vertex),
        normal=jnp.where(take_old[..., None], old.normal, new.normal),
        vertex_valid=jnp.where(take_old, old.vertex_valid, new.vertex_valid),
        normal_valid=jnp.where(take_old, old.normal_valid, new.normal_valid),
        sem_label=jnp.where(take_old, old.sem_label, new.sem_label),
        sem_prob=jnp.where(take_old, old.sem_prob, new.sem_prob))


def render_index_map(state: MapState, pose_inv: jnp.ndarray,
                     cfg: DataConfig) -> jnp.ndarray:
    """[H, W] int32 nearest visible surfel (global row) per pixel, -1 none
    (gen_indexmap.vert: point-based depth-buffered id render). The hot path
    uses :func:`_index_winner` on the active view instead."""
    return _index_winner(state.data, pose_inv, cfg).reshape(
        cfg.height, cfg.width)


def _index_winner(data: SurfelData, pose_inv: jnp.ndarray,
                  cfg: DataConfig) -> jnp.ndarray:
    """Winner row (into `data`) per pixel for data association (-1 = none)."""
    proj = _project_surfels(data, pose_inv, cfg)
    ok = data.valid & proj.visible & proj.inside
    ids = jnp.where(ok, proj.py * cfg.width + proj.px, -1)
    winner, _ = zbuffer_argmin(ids, proj.depth, cfg.height * cfg.width)
    return winner


# ---------------------------------------------------------------------------
# map update: association + fusion + creation
# ---------------------------------------------------------------------------

def _slerp(v0: jnp.ndarray, v1: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Spherical interpolation of unit normals (update_surfels.vert:113-124;
    the reference's 'weight' is the weight of v0)."""
    d = jnp.clip(jnp.sum(v0 * v1, axis=-1), -1.0, 1.0)
    omega = jnp.arccos(d)
    so = jnp.sin(omega)
    safe = jnp.abs(so) > 1e-5
    w0 = jnp.where(safe, jnp.sin(w * omega) / jnp.where(safe, so, 1.0), w)
    w1 = jnp.where(safe, jnp.sin((1.0 - w) * omega) / jnp.where(safe, so, 1.0),
                   1.0 - w)
    out = w0[..., None] * v0 + w1[..., None] * v1
    return out / jnp.maximum(jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-12)


def _update_view(view: ActiveView, frame: FrameInputs, pose: jnp.ndarray,
                 pose_inv: jnp.ndarray, poses: jnp.ndarray, ts,
                 data_cfg: DataConfig, map_cfg: MapConfig,
                 confidence_threshold, semantic: bool,
                 index_winner_override=None):
    """Branch-free per-surfel update over the active view
    (update_surfels.vert math). Returns (updated SurfelData, compatible)."""
    d = view.data
    h, w = data_cfg.height, data_cfg.width
    maps = frame.maps
    vmap_flat = maps.vertex.reshape(-1, 3)
    nmap_flat = maps.normal.reshape(-1, 3)
    vvalid_flat = (maps.vertex_valid & maps.normal_valid).reshape(-1)
    sem_label_flat = maps.sem_label.reshape(-1)
    sem_prob_flat = maps.sem_prob.reshape(-1)
    radius_flat = frame.radius.reshape(-1)

    proj = _project_surfels(d, pose_inv, data_cfg, facing_eps=0.0)
    pid = proj.py * w + proj.px

    observed = d.valid & proj.visible & proj.inside & vvalid_flat[pid]

    v_meas = vmap_flat[pid]
    n_meas = nmap_flat[pid]
    v_g = v_meas @ pose[:3, :3].T + pose[:3, 3]
    n_g = n_meas @ pose[:3, :3].T
    n_g = n_g / jnp.maximum(jnp.linalg.norm(n_g, axis=-1, keepdims=True), 1e-12)

    dist = jnp.abs(jnp.sum(d.wnormal * (v_g - d.wpos), axis=-1))
    angle = jnp.linalg.norm(jnp.cross(n_g, d.wnormal), axis=-1)
    angle_thresh = math.sin(math.radians(map_cfg.map_max_angle))
    compatible = observed & (dist < map_cfg.max_distance) & (angle < angle_thresh)

    # semantic penalty (update_surfels.vert:183-195,324)
    d_label = sem_label_flat[pid]
    d_prob = sem_prob_flat[pid]
    mismatch = d_label != d.sem_label
    penalty = jnp.where(
        observed & mismatch & is_movable(d.sem_label) & jnp.asarray(semantic),
        1.0, 0.0)

    # odds update (static-state Bayes filter, update_surfels.vert:326-333)
    p_up = jnp.full(dist.shape, map_cfg.p_stable, jnp.float32)
    if map_cfg.confidence_mode in (1, 3):
        p_up = p_up * jnp.exp(-angle * angle / (map_cfg.sigma_angle ** 2))
    if map_cfg.confidence_mode in (2, 3):
        p_up = p_up * jnp.exp(-dist * dist / (map_cfg.sigma_distance ** 2))
    p_up = jnp.clip(p_up, map_cfg.p_unstable, 1.0)
    log_odds_up = jnp.log(p_up / (1.0 - p_up))

    # the nearest visible surfel at a non-matching pixel loses odds
    act = d.position.shape[0]
    pid_safe = jnp.minimum(pid, h * w - 1)
    if index_winner_override is None:
        winner = _index_winner(d, pose_inv, data_cfg)
        closest = winner[pid_safe] == jnp.arange(act)
    else:  # sharded: (local winner per pixel, this-shard-wins-globally mask)
        local_winner, i_am_winner = index_winner_override
        closest = i_am_winner[pid_safe] & (
            local_winner[pid_safe] == jnp.arange(act))
    update_conf = jnp.where(
        compatible, log_odds_up,
        jnp.where(observed & closest, map_cfg.log_unstable, map_cfg.log_prior))
    update_conf = update_conf - penalty

    new_conf = jnp.where(
        map_cfg.use_stability,
        jnp.minimum(d.confidence + update_conf - map_cfg.log_prior,
                    map_cfg.stability_upper_bound),
        d.confidence)

    new_radius_meas = radius_flat[pid]
    young = (ts - d.creation_ts) < 100  # active_timestamps (SurfelMap.cpp:357)
    integrate = compatible & (((new_radius_meas < d.radius) & young)
                              | jnp.asarray(map_cfg.update_always))

    if map_cfg.weighting_scheme == 0:
        w1 = jnp.full((act,), 0.9, jnp.float32)
        w2 = jnp.full((act,), 0.1, jnp.float32)
        new_weight = d.weight
    else:
        w1 = d.weight
        view_dir = -v_meas / jnp.maximum(
            jnp.linalg.norm(v_meas, axis=-1, keepdims=True), 1e-12)
        w2 = jnp.where(map_cfg.weighting_scheme == 2,
                       jnp.sum(n_meas * view_dir, axis=-1), 1.0)
        new_weight = jnp.where(integrate,
                               jnp.minimum(map_cfg.max_weight, w1 + w2),
                               d.weight)
        s = w1 + w2
        w1, w2 = w1 / s, w2 / s

    avg_pos_w = w1[:, None] * d.wpos + w2[:, None] * v_g
    if map_cfg.averaging_scheme == 1:
        signed = jnp.sum(d.wnormal * (v_g - d.wpos), axis=-1)
        avg_pos_w = d.wpos + (w2 * signed)[:, None] * d.wnormal
    avg_nrm_w = _slerp(d.wnormal, n_g, w1)

    avg_prob = jnp.where(mismatch,
                         w1 * d.sem_prob + w2 * (1.0 - d_prob),
                         w1 * d.sem_prob + w2 * d_prob)

    # back into the creation frame (rare gather: only active rows)
    creation_pose = poses[jnp.clip(d.creation_ts, 0, poses.shape[0] - 1)]
    cp_r = creation_pose[:, :3, :3]
    cp_t = creation_pose[:, :3, 3]
    local_pos = jnp.einsum("nji,nj->ni", cp_r, avg_pos_w - cp_t)
    local_nrm = jnp.einsum("nji,nj->ni", cp_r, avg_nrm_w)

    upd_radius = jnp.maximum(jnp.minimum(new_radius_meas, d.radius),
                             map_cfg.min_radius)

    data2 = d._replace(
        position=jnp.where(integrate[:, None], local_pos, d.position),
        normal=jnp.where(integrate[:, None], local_nrm, d.normal),
        wpos=jnp.where(integrate[:, None], avg_pos_w, d.wpos),
        wnormal=jnp.where(integrate[:, None], avg_nrm_w, d.wnormal),
        radius=jnp.where(compatible, upd_radius, d.radius),
        timestamp=jnp.where(compatible, ts, d.timestamp),
        confidence=new_conf,
        weight=new_weight if map_cfg.weighting_scheme else d.weight,
        sem_prob=jnp.where(integrate, avg_prob, d.sem_prob),
    )

    # cull (update_surfels.vert:156-157,332): checked on the *old*
    # confidence/timestamp; a compatible match always revalidates; updated
    # odds below log_unstable always kill
    alive = data2.valid
    if map_cfg.use_stability:
        unstable_old = (d.confidence < confidence_threshold) & (
            (ts - d.timestamp) >= map_cfg.unstable_age)
        alive = alive & (~unstable_old | compatible)
        alive = alive & (data2.confidence >= map_cfg.log_unstable)
    data2 = data2._replace(valid=alive)

    return data2, compatible, pid


def _make_new_surfels(frame: FrameInputs, pose: jnp.ndarray, ts,
                      integrated: jnp.ndarray, map_cfg: MapConfig,
                      semantic: bool):
    """Per-pixel new-surfel records (gen_surfels.vert/geom)."""
    maps = frame.maps
    hw = integrated.shape[0]
    vflat = maps.vertex.reshape(-1, 3)
    nflat = maps.normal.reshape(-1, 3)
    create = (maps.vertex_valid & maps.normal_valid).reshape(-1) \
        & frame.radius_valid.reshape(-1) & ~integrated
    labels = maps.sem_label.reshape(-1)
    conf = jnp.where(jnp.asarray(semantic) & is_movable(labels),
                     map_cfg.log_prior - 0.5, map_cfg.log_prior)
    ts_arr = jnp.full((hw,), ts, jnp.int32)
    data = SurfelData(
        position=vflat, normal=nflat,
        radius=frame.radius.reshape(-1),
        confidence=conf, timestamp=ts_arr, creation_ts=ts_arr,
        weight=jnp.ones((hw,), jnp.float32),
        sem_label=labels, sem_prob=maps.sem_prob.reshape(-1),
        valid=create,
        wpos=vflat @ pose[:3, :3].T + pose[:3, 3],
        wnormal=nflat @ pose[:3, :3].T)
    return data, create


def _append(state: MapState, new_data: SurfelData, create: jnp.ndarray):
    cap = state.data.position.shape[0]
    slots = state.count + jnp.cumsum(create.astype(jnp.int32)) - 1
    slots = jnp.where(create & (slots < cap), slots, cap)

    def put(dst, src):
        return dst.at[slots].set(src, mode="drop", unique_indices=True)

    data = jax.tree.map(put, state.data, new_data)
    n_created = jnp.sum(create & (slots < cap))
    new_count = jnp.minimum(state.count + jnp.sum(create),
                            cap).astype(jnp.int32)
    return state._replace(data=data, count=new_count), n_created


def fuse_and_render(state: MapState, frame: FrameInputs, pose: jnp.ndarray,
                    timestamp, data_cfg: DataConfig, map_cfg: MapConfig,
                    confidence_threshold, render_ts_threshold,
                    semantic: bool = True):
    """Full per-scan map update + post-update model render, sharing the
    active view (the fused updateMap + next-scan render of the reference).

    Returns (new_state, model_maps, n_created).
    """
    pose = pose.astype(jnp.float32)
    pose_inv = lie.se3_inverse(pose)
    ts = jnp.asarray(timestamp, jnp.int32)

    view = build_active(state, pose[:3, 3], map_cfg)
    data2, compatible, pid = _update_view(
        view, frame, pose, pose_inv, state.poses, ts, data_cfg, map_cfg,
        confidence_threshold, semantic)
    view2 = ActiveView(idx=view.idx, data=data2)

    # integrated-pixel flags: any compatible surfel marks its pixel
    hw = data_cfg.height * data_cfg.width
    flag_ids = jnp.where(compatible, pid, hw)
    integrated = jnp.zeros((hw,), jnp.int32).at[flag_ids].max(
        1, mode="drop").astype(bool)

    new_data, create = _make_new_surfels(frame, pose, ts, integrated,
                                         map_cfg, semantic)

    state2 = scatter_back(state, view2)
    state2, n_created = _append(state2, new_data, create)
    new_poses = state2.poses.at[
        jnp.clip(ts, 0, state2.poses.shape[0] - 1)].set(pose)
    state2 = state2._replace(poses=new_poses)

    # post-update render at the same pose: updated active view + the scan's
    # new surfels as a second candidate stream (no second active-view pass)
    proj_a = _project_surfels(data2, pose_inv, data_cfg)
    sel_a = _selection(data2, proj_a, map_cfg, confidence_threshold,
                       render_ts_threshold, "new")
    proj_n = _project_surfels(new_data, pose_inv, data_cfg)
    sel_n = _selection(new_data, proj_n, map_cfg, confidence_threshold,
                       render_ts_threshold, "new")
    model_maps = _resolve_maps([RenderEntries(data2, proj_a, sel_a),
                                RenderEntries(new_data, proj_n, sel_n)],
                               data_cfg)
    return state2, model_maps, n_created


def update_map(state: MapState, frame: FrameInputs, pose: jnp.ndarray,
               timestamp, data_cfg: DataConfig, map_cfg: MapConfig,
               confidence_threshold, semantic: bool = True):
    """Map update without the fused render (compatibility/test entry)."""
    state2, _, n_created = fuse_and_render(
        state, frame, pose, timestamp, data_cfg, map_cfg,
        confidence_threshold, jnp.asarray(timestamp, jnp.int32) + 1,
        semantic)
    return state2, n_created


def compact(state: MapState) -> MapState:
    """Stream-compact valid surfels to the front (the reference's
    copy_surfels transform-feedback compaction, run when the high-water mark
    nears capacity)."""
    d = state.data
    cap = d.position.shape[0]
    order = jnp.cumsum(d.valid.astype(jnp.int32)) - 1
    slots = jnp.where(d.valid, order, cap)

    def move(arr):
        fill = jnp.zeros((), arr.dtype)
        out = jnp.full(arr.shape, fill, arr.dtype)
        return out.at[slots].set(arr, mode="drop", unique_indices=True)

    data = jax.tree.map(move, d)
    return MapState(data=data, count=jnp.sum(d.valid).astype(jnp.int32),
                    poses=state.poses)


def update_poses(state: MapState, new_poses: jnp.ndarray) -> MapState:
    """Rewrite the pose table (after loop-closure optimization) and refresh
    the cached world-frame geometry — the TPU analogue of
    ``SurfelMap::updatePoses`` (SurfelMap.cpp:485-490): surfels themselves
    are never touched, only their poses."""
    d = state.data
    cp = new_poses[jnp.clip(d.creation_ts, 0, new_poses.shape[0] - 1)]
    wpos = jnp.einsum("nij,nj->ni", cp[:, :3, :3], d.position) + cp[:, :3, 3]
    wnormal = jnp.einsum("nij,nj->ni", cp[:, :3, :3], d.normal)
    return MapState(data=d._replace(wpos=wpos, wnormal=wnormal),
                    count=state.count, poses=new_poses.astype(jnp.float32))
