"""Multi-chip sharding for the SLAM engine and segmenter.

The reference is a single-GPU, single-process application (SURVEY §2.7);
scale-out here is a *new* TPU-native design (SURVEY §7, configs 4-5):

* **Surfel-map block sharding** (``map`` mesh axis): the fixed-capacity SoA
  store is split into per-device blocks (the submap grid's natural shard
  unit). Each device fuses the (replicated) scan into its own block;
  new surfels are assigned round-robin by pixel id so blocks stay balanced.

* **ICP reduction**: each device builds Jacobian rows for its slice of the
  range image rows and the 6x6+6 products are combined with one ``psum`` —
  the collective analogue of the reference's additive-blend reduction
  (``Frame2Model.cpp:189-197``). The whole Gauss-Newton loop stays inside
  ``shard_map`` (collectives inside ``lax.while_loop``), so a multi-chip
  alignment is still a single program launch.

* **Rendering**: each device z-buffers its own block into candidate maps +
  a depth image; an ``all_gather`` over the ``map`` axis followed by a
  per-pixel argmin merges them — a depth-min all-reduce over ICI.

* **Segmenter**: standard data-parallel training (batch over ``data`` axis)
  with optional tensor-parallel channel sharding of the widest conv layers
  (``model`` axis), expressed with NamedSharding on params/batch.

Everything works on any ``jax.sharding.Mesh`` — real TPU pods or the
virtual CPU mesh used in tests.
"""

from __future__ import annotations

from functools import partial


import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import SumaConfig
from ..core import surfel_map as sm
from ..core.preprocessing import preprocess_scan
from ..ops import icp as icp_ops
from ..ops.icp import Maps
from ..utils import lie

try:  # JAX >= 0.6 exposes shard_map at the top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore


def make_mesh(n_devices: int | None = None, axis: str = "map") -> Mesh:
    devs = jax.devices()[:n_devices] if n_devices else jax.devices()
    return Mesh(np.array(devs), (axis,))


def make_2d_mesh(n_data: int, n_model: int) -> Mesh:
    devs = np.array(jax.devices()[:n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devs, ("data", "model"))


# ---------------------------------------------------------------------------
# sharded SLAM step (unified with the single-chip block-paged architecture)
# ---------------------------------------------------------------------------

def shard_map_config(cfg: SumaConfig, ndev: int):
    """Per-device MapConfig: the arena, active view and fresh region divide
    over devices (each device runs the FULL block-paged machinery — paging,
    eager fresh blocks, compaction — on its own shard)."""
    from dataclasses import replace
    hw = cfg.data.height * cfg.data.width
    return replace(cfg.map,
                   surfel_capacity=max(cfg.map.surfel_capacity // ndev,
                                       4096),
                   active_capacity=max(cfg.map.active_capacity // ndev,
                                       4096),
                   min_fresh_rows=sm.creation_region_rows(hw, -(-hw // ndev)))


def _stack_tree(tree, ndev: int):
    """Host: replicate a pytree with a leading device axis."""
    return jax.tree.map(
        lambda a: jnp.broadcast_to(a[None], (ndev,) + a.shape), tree)


def _local(tree):
    """Inside shard_map: strip the per-device leading axis ([1, ...])."""
    return jax.tree.map(lambda a: a[0], tree)


def _delocal(tree):
    return jax.tree.map(lambda a: a[None], tree)


def make_sharded_step(cfg: SumaConfig, mesh: Mesh, axis: str = "map"):
    """Build the jitted multi-chip odometry step — the same program as
    ``pipeline.odometry_step`` (preprocess -> psum'd frame-to-model GN ->
    track-loss fallback -> block-paged fuse + render), with the surfel map
    sharded over ``axis``:

    * each device owns a full :class:`MapState` shard (block arena + active
      view + eager fresh blocks) — paging and compaction never cross ICI;
    * ICP slices range-image rows per device and psums (JᵀWJ, JᵀWf);
    * the index-map winner, integrated flags and render candidates merge
      with all_gather/psum inside :func:`surfel_map.fuse_and_render`.

    Call signature (all host-visible leaves): ``step(map_sh, pose, last_inc,
    last_maps, model_maps, ts, points, labels, probs, valid, conf_thr)`` ->
    ``(map_sh, pose, increment, data_maps, model_maps, info)`` where
    ``map_sh`` leaves carry a leading [D] axis sharded over the mesh.
    """
    ndev = mesh.devices.size
    h = cfg.data.height
    assert h % ndev == 0, "image height must divide device count"
    rows = h // ndev
    hw = h * cfg.data.width
    mcfg = shard_map_config(cfg, ndev)
    semantic = cfg.semantic.enabled
    max_creates = -(-hw // ndev)

    def step(map_sh, pose, last_inc, last_maps, model_maps, ts,
             points, labels, probs, point_valid, conf_threshold):
        me = jax.lax.axis_index(axis)
        local = _local(map_sh)

        data_maps = preprocess_scan(points, labels, probs, point_valid,
                                    ts < cfg.semantic.init_scans, cfg)

        def row_slice(maps: Maps) -> Maps:
            return jax.tree.map(
                lambda a: jax.lax.dynamic_slice_in_dim(a, me * rows, rows, 0),
                maps)

        my_data = row_slice(data_maps)
        t0 = (jnp.eye(4, dtype=jnp.float32) if cfg.icp.initialize_identity
              else last_inc)
        result = icp_ops.gauss_newton(my_data, model_maps, t0, cfg.icp,
                                      cfg.model, semantic=semantic, axis=axis)
        increment = result.pose

        # track-loss fallback (same logic as pipeline.odometry_step; the
        # jump predicate is replicated so every device takes the same
        # branch and the psum inside matches up)
        delta = lie.se3_inverse(last_inc) @ increment
        t_err = jnp.linalg.norm(delta[:3, 3])
        r_err = lie.rotation_angle(delta)
        jumped = ((ts > 1) & ((t_err > cfg.icp.fallback_translation_jump)
                              | (r_err > cfg.icp.fallback_rotation_jump))
                  & jnp.asarray(cfg.icp.fallback_mode))
        if cfg.icp.fallback_mode:
            from dataclasses import replace as _rp
            recovery_cfg = _rp(cfg.icp,
                               max_distance=cfg.icp.fallback_max_distance,
                               max_angle=cfg.icp.fallback_max_angle)
            rec_pose = jax.lax.cond(
                jumped,
                lambda: icp_ops.gauss_newton(
                    my_data, last_maps, t0, recovery_cfg, cfg.data,
                    semantic=semantic, axis=axis).pose,
                lambda: increment)
            increment = jnp.where(jumped, rec_pose, increment)

        increment = jnp.where(ts == 0, jnp.eye(4, dtype=increment.dtype),
                              increment)
        new_pose = lie.orthonormalize(pose @ increment)

        # block-paged fusion + render with cross-device merges
        frame = sm.data_surfel_init(data_maps, cfg.data, mcfg)
        create_mask = (jnp.arange(hw, dtype=jnp.int32) % ndev) == me
        new_local, new_model, n_created, n_dropped = sm.fuse_and_render(
            local, frame, new_pose, ts, cfg.data, mcfg, conf_threshold,
            (ts + 1) - cfg.loop.delta_timestamp, semantic=semantic,
            axis=axis, create_mask=create_mask, max_creates=max_creates)

        # worst-shard free rows, REPLICATED: every process derives the
        # same pressure decision from it, so the collective compaction
        # below is entered (or skipped) in lockstep across hosts — no
        # host fetch of the P(axis)-sharded block_count is ever needed
        # (a global fetch raises in multi-process runs)
        free_rows = (mcfg.surfel_capacity
                     - new_local.block_count * mcfg.effective_block_size)
        info = {
            "iterations": result.iterations,
            "track_loss": jumped,
            "n_created": jax.lax.psum(n_created, axis),
            "n_dropped": jax.lax.psum(n_dropped, axis),
            "map_count": jax.lax.psum(new_local.count, axis),
            "min_free_rows": jax.lax.pmin(free_rows, axis),
            "error": result.stats.error,
            "inlier": result.stats.inlier,
            "outlier": result.stats.outlier,
            "valid": result.stats.valid,
            "invalid": result.stats.invalid,
            "inlier_residual": result.stats.inlier_residual,
        }
        return (_delocal(new_local), new_pose, increment, data_maps,
                new_model, info)

    map_spec = jax.tree.map(lambda _: P(axis), sm.empty_map(mcfg))
    maps_spec = jax.tree.map(lambda _: P(), _maps_struct(cfg))
    info_spec = {k: P() for k in
                 ("iterations", "track_loss", "n_created", "n_dropped",
                  "map_count", "min_free_rows", "error", "inlier",
                  "outlier", "valid", "invalid", "inlier_residual")}
    sharded = shard_map(
        step, mesh=mesh,
        in_specs=(map_spec, P(), P(), maps_spec, maps_spec,
                  P(), P(), P(), P(), P(), P()),
        out_specs=(map_spec, P(), P(), maps_spec, maps_spec, info_spec),
        check_vma=False)
    return jax.jit(sharded)


def _maps_struct(cfg: SumaConfig) -> Maps:
    h, w = cfg.data.height, cfg.data.width
    z = jnp.zeros((h, w))
    return Maps(vertex=z[..., None], normal=z[..., None],
                vertex_valid=z > 0, normal_valid=z > 0,
                sem_label=z.astype(jnp.int32), sem_prob=z)


def make_sharded_compact(mcfg, mesh: Mesh, axis: str = "map"):
    """Per-device stream compaction (no collectives — each shard compacts
    its own arena, exactly the single-chip ``surfel_map.compact``)."""
    map_spec = jax.tree.map(lambda _: P(axis), sm.empty_map(mcfg))

    def go(map_sh):
        return _delocal(sm.compact(_local(map_sh), mcfg))

    return jax.jit(shard_map(go, mesh=mesh, in_specs=(map_spec,),
                             out_specs=map_spec, check_vma=False))


def make_sharded_update_poses(mcfg, mesh: Mesh, axis: str = "map"):
    """Pose-table rewrite after pose-graph optimization (SurfelMap::
    updatePoses semantics), per shard."""
    map_spec = jax.tree.map(lambda _: P(axis), sm.empty_map(mcfg))

    def go(map_sh, new_poses):
        return _delocal(sm.update_poses(_local(map_sh), new_poses, mcfg))

    return jax.jit(shard_map(go, mesh=mesh, in_specs=(map_spec, P()),
                             out_specs=map_spec, check_vma=False))


def _depth_min_merge(maps: Maps, axis: str) -> Maps:
    """Merge per-device rendered Maps by nearest depth (inside shard_map):
    the ICI analogue of the reference's single-GPU depth test."""
    depth = jnp.where(maps.vertex_valid,
                      jnp.linalg.norm(maps.vertex, axis=-1), jnp.inf)
    d_all = jax.lax.all_gather(depth.reshape(-1), axis)     # [D, HW]
    win = jnp.argmin(d_all, axis=0)

    def pick(a):
        flat = a.reshape((a.shape[0] * a.shape[1],) + a.shape[2:])
        ga = jax.lax.all_gather(flat, axis)
        if ga.ndim == 3:
            out = jnp.take_along_axis(ga, win[None, :, None], axis=0)[0]
        else:
            out = jnp.take_along_axis(ga, win[None, :], axis=0)[0]
        return out.reshape(a.shape)

    return jax.tree.map(pick, maps)


def make_sharded_render(cfg: SumaConfig, mcfg, mesh: Mesh,
                        axis: str = "map"):
    """Out-of-band sharded render (loop closure / rebase): each device
    refreshes its own view around the pose and renders; candidates merge
    with a depth-min all_gather."""
    map_spec = jax.tree.map(lambda _: P(axis), sm.empty_map(mcfg))
    maps_spec = jax.tree.map(lambda _: P(), _maps_struct(cfg))

    def go(map_sh, pose, conf_threshold, ts_threshold):
        local = _local(map_sh)
        synced = sm.refresh_active(local, pose[:3, 3].astype(jnp.float32),
                                   mcfg)
        maps = sm.render_view(synced.active, pose, cfg.model, mcfg,
                              conf_threshold, ts_threshold, "new")
        return _depth_min_merge(maps, axis)

    return jax.jit(shard_map(go, mesh=mesh,
                             in_specs=(map_spec, P(), P(), P()),
                             out_specs=maps_spec, check_vma=False))


def make_sharded_old_view(mcfg, mesh: Mesh, axis: str = "map"):
    """Page each shard's INACTIVE (old) map blocks into a view around
    ``center`` (the sharded analogue of ``refresh_active(priority='old')``,
    reference SurfelMap::render_inactive paging). Returns the per-shard
    active PackedSurfels with a leading [D] axis, for use with
    :func:`make_sharded_view_render`."""
    map_spec = jax.tree.map(lambda _: P(axis), sm.empty_map(mcfg))
    view_spec = jax.tree.map(lambda _: P(axis), sm.empty_map(mcfg).active)

    def go(map_sh, center, ts_threshold):
        local = _local(map_sh)
        synced = sm.refresh_active(local, center, mcfg, priority="old",
                                   ts_threshold=ts_threshold)
        return _delocal(synced.active)

    return jax.jit(shard_map(go, mesh=mesh,
                             in_specs=(map_spec, P(), P()),
                             out_specs=view_spec, check_vma=False))


def make_sharded_view_render(cfg: SumaConfig, mcfg, mesh: Mesh,
                             which: str = "old", axis: str = "map"):
    """Render a sharded active VIEW (as returned by
    :func:`make_sharded_old_view`) at an arbitrary pose with an
    old/new-selection and a depth-min merge — the sharded
    ``SurfelMap::render_inactive`` used by loop-closure verification."""
    view_spec = jax.tree.map(lambda _: P(axis), sm.empty_map(mcfg).active)
    maps_spec = jax.tree.map(lambda _: P(), _maps_struct(cfg))

    def go(view_sh, pose, conf_threshold, ts_threshold):
        act = _local(view_sh)
        maps = sm.render_view(act, pose, cfg.model, mcfg, conf_threshold,
                              ts_threshold, which)
        return _depth_min_merge(maps, axis)

    return jax.jit(shard_map(go, mesh=mesh,
                             in_specs=(view_spec, P(), P(), P()),
                             out_specs=maps_spec, check_vma=False))


class ShardedSurfelSLAM:
    """Host driver for the multi-chip pipeline — the sharded counterpart of
    ``pipeline.SurfelSLAM`` with the same process_scan interface, statistics,
    near-capacity compaction and pose-graph rebase support."""

    def __init__(self, cfg: SumaConfig, mesh: Mesh, axis: str = "map",
                 enable_loop_closure: bool | None = None,
                 pipeline_depth: int = 4):
        from collections import deque

        from ..core.preprocessing import empty_maps

        self.pipeline_depth = max(0, pipeline_depth)
        self._pending = deque()
        self._dispatched = 0
        self.cfg = cfg
        self.mesh = mesh
        self.axis = axis
        self.ndev = mesh.devices.size
        self._single_process = jax.process_count() == 1
        self.mcfg = shard_map_config(cfg, self.ndev)
        self._step = make_sharded_step(cfg, mesh, axis)
        self._compact = None
        self._update_poses = None
        self._render = None
        self._old_view_fn = None
        self._old_render_fn = None
        self._old_cache = None
        self._loop = None
        do_loops = cfg.loop.enabled if enable_loop_closure is None \
            else enable_loop_closure
        if do_loops and cfg.approach == "frame-to-model":
            from ..core.loop_closure import LoopCloser
            self._loop = LoopCloser(cfg)

        self.spill = None
        if cfg.map.spill_enabled:
            # one host-RAM spill manager per shard: each device's arena
            # pages its own far blocks out/in (the single-chip
            # core.spill machinery applied shard-wise; shard slices move
            # host<->device only on the rare pressure/revisit paths)
            from ..core.spill import SpillManager
            self.spill = [
                SpillManager(self.mcfg,
                             chunk_blocks=cfg.map.spill_chunk_blocks,
                             spill_margin=cfg.map.spill_margin,
                             unspill_margin=cfg.map.unspill_margin)
                for _ in range(self.ndev)]

        base = sm.empty_map(self.mcfg)
        stacked = _stack_tree(base, self.ndev)
        map_shardings = jax.tree.map(
            lambda _: NamedSharding(mesh, P(axis)), stacked)
        self.map_sh = jax.device_put(stacked, map_shardings)
        self.pose = jnp.eye(4, dtype=jnp.float32)
        self.last_increment = jnp.eye(4, dtype=jnp.float32)
        self.last_maps = empty_maps(cfg)
        self.model_maps = empty_maps(cfg)
        self.poses: list[np.ndarray] = []
        self.statistics: list[dict] = []
        self.trajectory_distances: list[float] = [0.0]
        self.map_version = 0
        # device->output frame correction (below-gate async-optimize
        # integrations; see pipeline.SurfelSLAM.frame_correction)
        self.frame_correction = np.eye(4, dtype=np.float32)
        # per-finished-scan stats stream (parity with pipeline.SurfelSLAM;
        # pipelined draining completes several scans per call)
        self.stats_callback = None

    @property
    def timestamp(self) -> int:
        return len(self.poses)

    @property
    def spilled_rows(self) -> int:
        return sum(m.spilled_rows for m in self.spill) if self.spill else 0

    # -- process-local shard access (multi-host safe) ----------------------
    # In a multi-process run each process addresses only its own devices, so
    # host paging must never touch the global [D]-sharded arrays directly
    # (``a[d]`` / ``np.asarray`` on them raises "spans non-addressable
    # devices" — the round-3 regression). All reads go through
    # ``addressable_shards`` and writes rebuild the global array from
    # per-device pieces; each process pages only the shards it owns.

    def _my_shards(self) -> "list[int]":
        """Global leading-axis indices of the shards this process owns."""
        out = []
        for shd in self.map_sh.block_count.addressable_shards:
            s = shd.index[0]
            out.append(0 if s.start is None else int(s.start))
        return sorted(out)

    def _local_shard(self, d: int) -> sm.MapState:
        """Shard d's MapState as single-device arrays (rare-path host
        paging). ``d`` must be addressable by this process."""
        def get(a):
            for shd in a.addressable_shards:
                s = shd.index[0]
                if (0 if s.start is None else int(s.start)) == d:
                    return jnp.asarray(shd.data)[0]
            raise IndexError(f"shard {d} is not addressable by this process")
        return jax.tree.map(get, self.map_sh)

    def _write_shard(self, d: int, st: sm.MapState) -> None:
        def put(a, l):
            arrs = []
            for shd in a.addressable_shards:
                s = shd.index[0]
                if (0 if s.start is None else int(s.start)) == d:
                    arrs.append(jax.device_put(jnp.asarray(l)[None],
                                               shd.device))
                else:
                    arrs.append(shd.data)
            return jax.make_array_from_single_device_arrays(
                a.shape, a.sharding, arrs)
        self.map_sh = jax.tree.map(put, self.map_sh, st)

    def _conf_at(self, t: int) -> float:
        c = self.cfg.map
        if t < c.time_init:
            a = t / c.time_init
            return (1.0 - a) * c.log_unstable + a * c.confidence_threshold
        return c.confidence_threshold

    def confidence_threshold(self) -> float:
        return self._conf_at(self._dispatched)

    # -- dispatch / drain split (mirrors pipeline.SurfelSLAM) -------------

    def _dispatch(self, points, labels, probs, point_valid) -> None:
        n = points.shape[0]
        if labels is None:
            labels = jnp.zeros((n,), jnp.int32)
        if probs is None:
            probs = jnp.ones((n,), jnp.float32)
        if point_valid is None:
            point_valid = jnp.ones((n,), bool)
        ts = jnp.asarray(self._dispatched, jnp.int32)
        ct = jnp.asarray(self._conf_at(self._dispatched), jnp.float32)
        self._dispatched += 1
        with self.mesh:
            (self.map_sh, self.pose, self.last_increment, self.last_maps,
             self.model_maps, info) = self._step(
                self.map_sh, self.pose, self.last_increment, self.last_maps,
                self.model_maps, ts, jnp.asarray(points),
                jnp.asarray(labels), jnp.asarray(probs),
                jnp.asarray(point_valid), ct)
            # pack everything the host loop reads into ONE vector (pose,
            # increment+its log for the loop closer, all scalars); the
            # fetch is deferred so scans can pipeline
            vals = (info["error"], info["valid"], info["inlier"],
                    info["outlier"], info["inlier_residual"],
                    info["invalid"], info["iterations"],
                    info["track_loss"], info["n_created"],
                    info["n_dropped"], info["map_count"],
                    info["min_free_rows"])
            packed = jnp.concatenate(
                [self.pose.astype(jnp.float32).reshape(-1),
                 self.last_increment.astype(jnp.float32).reshape(-1),
                 lie.se3_log(self.last_increment.astype(jnp.float32)
                             ).reshape(-1),
                 jnp.stack([jnp.asarray(v).astype(jnp.float32).reshape(())
                            for v in vals])])
        try:
            packed.copy_to_host_async()
        except AttributeError:  # pragma: no cover
            pass
        self._pending.append(packed)

    def process_scan(self, points, labels=None, probs=None,
                     point_valid=None) -> dict:
        """Feed one scan synchronously (result belongs to THIS scan)."""
        self._dispatch(points, labels, probs, point_valid)
        out = self._drain_one()
        if self._loop is not None and self._loop._opt_future is not None:
            # sync mode integrates an optimization before the next scan
            # (mirrors pipeline.SurfelSLAM.process_scan)
            self._loop._opt_future.result()
            self._loop.integrate(self)
        return out

    def process_scan_async(self, points, labels=None, probs=None,
                           point_valid=None):
        """Pipelined multi-chip driving: up to ``pipeline_depth`` scans in
        flight; loop-closure runs drain to synchronous execution whenever
        the state machine is active (hybrid protocol; this driver renders
        through collectives, so it does not use the single-chip
        device-carried verification chain). Graph optimization still runs
        on the background thread with deferred integration. Call
        :meth:`flush` after the last scan."""
        if self._loop is not None and self._loop.needs_integration:
            self._loop.integrate(self)
        self._dispatch(points, labels, probs, point_valid)
        if self._loop is not None and self._loop.sync_needed:
            return self.flush()
        if len(self._pending) > self.pipeline_depth:
            return self._drain_one()
        return None

    def flush(self):
        out = None
        while self._pending:
            out = self._drain_one()
        if self._loop is not None and self._loop._opt_future is not None:
            self._loop._opt_future.result()
            self._loop.integrate(self)
        return out

    def _drain_one(self) -> dict:
        vec = np.asarray(self._pending.popleft())
        pose = self.frame_correction @ vec[:16].reshape(4, 4)
        increment_np = vec[16:32].reshape(4, 4).copy()
        inc_log_np = vec[32:38].copy()
        t = vec[38:]
        min_free_rows = int(t[11])
        self.poses.append(pose)
        if len(self.poses) > 1:
            self.trajectory_distances.append(
                self.trajectory_distances[-1]
                + float(np.linalg.norm(self.poses[-2][:3, 3] - pose[:3, 3])))

        stats = {
            "icp-iterations": int(t[6]),
            "icp-error": float(t[0]),
            "track-loss": bool(t[7] > 0),
            "map-count": int(t[10]),
            "surfels-created": int(t[8]),
            "creations-dropped": int(t[9]),
        }
        # near-capacity / drops: page far blocks to host RAM per shard,
        # then compact every shard (reclaims dead rows). Revisits page
        # spilled chunks back in whenever any LOCAL manager holds chunks
        # near the vehicle (host-side centroid check — free until spill).
        # Spill paging is strictly process-local (each process pages only
        # its addressable shards, no collectives), so processes may page at
        # different times; map_version — which gates the COLLECTIVE old-map
        # re-render — is only bumped on replicated events (pressure
        # compaction below, rebase) so every process enters collectives in
        # lockstep. In single-process runs paging bumps it too (fresher
        # old-map renders, no lockstep concern).
        pos3 = pose[:3, 3]
        if self.spill is not None:
            changed = False
            for d in self._my_shards():
                if self.spill[d].chunks:
                    st = self.spill[d].ensure_resident(
                        self._local_shard(d), pos3)
                    if st is not None:
                        self._write_shard(d, st)
                        changed = True
            if changed and self._single_process:
                self.map_version += 1
        # worst-shard pressure comes REPLICATED out of the jitted step
        # (lax.pmin) — no host fetch of sharded state, and every process
        # takes the same branch; widened by the per-shard worst-case
        # growth of scans still in flight (pipelined mode)
        lag = len(self._pending)
        headroom = (2 + lag) * self.mcfg.min_fresh_rows
        pressure = min_free_rows < headroom \
            or bool(stats["creations-dropped"])
        if pressure:
            if self.spill is not None:
                for d in self._my_shards():
                    # synchronous scoring path (default): no remote-tunnel
                    # fetch to hide here, and no futile-retry threshold to
                    # interact with an async probe
                    st = self.spill[d].maybe_spill(
                        self._local_shard(d), pos3, headroom_rows=headroom)
                    if st is not None:
                        self._write_shard(d, st)
            if self._compact is None:
                self._compact = make_sharded_compact(self.mcfg, self.mesh,
                                                     self.axis)
            with self.mesh:
                self.map_sh = self._compact(self.map_sh)
            self.map_version += 1

        if self._loop is not None:
            from ..core.pipeline import HostStepInfo
            from ..ops.icp import IcpStats
            shim = HostStepInfo(
                pose=pose, increment=increment_np, inc_log=inc_log_np,
                stats=IcpStats(
                    error=float(t[0]), valid=float(t[1]),
                    inlier=float(t[2]), outlier=float(t[3]),
                    inlier_residual=float(t[4]), invalid=float(t[5])),
                iterations=int(t[6]), track_loss=bool(t[7] > 0),
                n_created=int(t[8]), n_dropped=int(t[9]),
                map_count=int(t[10]), block_count=0)
            stats.update(self._loop.on_scan(self, shim,
                                            lag=len(self._pending)))

        self.statistics.append(stats)
        if self.stats_callback is not None:
            self.stats_callback(stats)
        return stats

    # ---- backend accessors for the driver-agnostic LoopCloser ----------
    def set_model_maps(self, maps) -> None:
        self.model_maps = maps

    def render_old_maps(self, view_pose):
        """Cached old-(inactive-)map render: per-shard priority='old' view
        paging + old-selection render + depth-min ICI merge."""
        from ..core.loop_closure import OldMapRenderCache
        if self.spill is not None:
            # the old map a revisit needs may be paged out on some LOCAL
            # shard (process-local paging; see process_scan for why the
            # version bump is single-process only)
            vp = np.asarray(view_pose)[:3, 3]
            changed = False
            for d in self._my_shards():
                if self.spill[d].chunks:
                    st = self.spill[d].ensure_resident(self._local_shard(d),
                                                       vp)
                    if st is not None:
                        self._write_shard(d, st)
                        changed = True
            if changed and self._single_process:
                self.map_version += 1
        if self._old_view_fn is None:
            self._old_view_fn = make_sharded_old_view(self.mcfg, self.mesh,
                                                      self.axis)
            self._old_render_fn = make_sharded_view_render(
                self.cfg, self.mcfg, self.mesh, "old", self.axis)

        def build_view(center, thr):
            with self.mesh:
                return self._old_view_fn(self.map_sh, center, thr)

        def render_view(view, pose, conf, thr):
            with self.mesh:
                return self._old_render_fn(view, pose, conf, thr)

        if self._old_cache is None:
            self._old_cache = OldMapRenderCache(
                build_view, render_view,
                delta_timestamp=self.cfg.loop.delta_timestamp)
        return self._old_cache.render(view_pose, self.timestamp,
                                      self.confidence_threshold(),
                                      self.map_version)

    def rebase(self, new_poses: np.ndarray, new_current: np.ndarray) -> None:
        """Push optimized pose-graph poses into every shard's pose table
        (integrateLoopClosures semantics: only poses are rewritten) and
        re-render the model view at the corrected pose."""
        if self._update_poses is None:
            self._update_poses = make_sharded_update_poses(
                self.mcfg, self.mesh, self.axis)
            self._render = make_sharded_render(self.cfg, self.mcfg,
                                               self.mesh, self.axis)
        arr = np.tile(np.eye(4, dtype=np.float32),
                      (self.mcfg.max_poses, 1, 1))
        arr[:min(len(new_poses), self.mcfg.max_poses)] = \
            new_poses[:self.mcfg.max_poses]
        with self.mesh:
            self.map_sh = self._update_poses(self.map_sh, jnp.asarray(arr))
            self.model_maps = self._render(
                self.map_sh, jnp.asarray(new_current, jnp.float32),
                jnp.asarray(self.confidence_threshold(), jnp.float32),
                jnp.asarray(self.timestamp - self.cfg.loop.delta_timestamp,
                            jnp.int32))
        self.pose = jnp.asarray(new_current, jnp.float32)
        for i in range(min(len(new_poses), len(self.poses))):
            self.poses[i] = np.asarray(new_poses[i])
        if self.spill is not None:
            for mgr in self.spill:
                mgr.on_rebase(arr)
        self.map_version += 1

    def trajectory(self) -> np.ndarray:
        return np.stack(self.poses) if self.poses else np.zeros((0, 4, 4))


# ---------------------------------------------------------------------------
# sharded segmenter training
# ---------------------------------------------------------------------------

def shard_train_state(tx_state, mesh: Mesh):
    """Replicate a segmenter TrainState over the mesh (DP); the widest conv
    kernels' output channels shard over the 'model' axis when present."""
    has_model = "model" in mesh.axis_names

    def spec_for(path, leaf):
        if has_model and hasattr(leaf, "ndim") and leaf.ndim == 4 \
                and leaf.shape[-1] >= 128:
            return NamedSharding(mesh, P(None, None, None, "model"))
        return NamedSharding(mesh, P())

    flat, treedef = jax.tree_util.tree_flatten_with_path(tx_state)
    shardings = jax.tree_util.tree_unflatten(
        treedef, [spec_for(p, l) for p, l in flat])
    return jax.device_put(tx_state, shardings)


def make_sharded_train_step(model, tx, mesh: Mesh, class_weights=None):
    """Data-parallel (+ optional channel-parallel) segmenter train step."""
    from ..models.segmenter import make_train_step

    base = make_train_step(model, tx, class_weights)
    batch_sharding = NamedSharding(mesh, P("data"))

    @partial(jax.jit, in_shardings=(None, batch_sharding, batch_sharding,
                                    batch_sharding), donate_argnums=(0,))
    def step(state, images, labels, valid):
        return base(state, images, labels, valid)

    return step
