"""Loop-closure detection, verification, and pose-graph integration.

Host-side state machine mirroring ``SurfelMapping::checkLoopClosure`` /
``integrateLoopClosures`` (``/root/reference/src/core/SurfelMapping.cpp:
212-253,527-795``), driving jitted device subroutines (inactive-map render,
ICP against the old map, composed-view residual evaluation):

* Phase A — verify a pending candidate every scan: ICP against the old
  (inactive) map rendered at the tracked old-frame pose; gates
  valid_ratio > 0.2, outlier_ratio < 0.85, |log(inc_new)-log(inc_old)| < 0.1;
  then compare composed-view residual against the odometry result. On
  drivers that support it, verification runs as a speculative per-scan
  device program chained off the odometry step with the pose_old anchor
  carried ON DEVICE (``dispatch_verify``) so live chains never drain the
  scan pipeline.
* Promotion — `min_verifications + 1` consecutive successes make the chain
  verified; verified candidates become pose-graph BetweenFactor edges
  (robust DCS-weighted, Posegraph.cpp:49-60 semantics).
* Optimization — Gauss-Newton+PCG pose graph solve on a background host
  thread over a graph clone (the reference's std::async protocol,
  SurfelMapping.cpp:655-660); ``integrate`` applies the result on a later
  scan via difference-rebase, skipping the device rebase below the
  configured gates (only the pose table is rewritten on rebase,
  SurfelMap::updatePoses semantics).
* Phase C — search a new candidate when idle: nearest old pose within
  search_distance with trajectory distance > min_trajectory_distance; three
  initializations {O, R(O), half-translation O} (SurfelMapping.cpp:679-691).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SumaConfig
from ..ops import icp as icp_ops
from ..utils import lie
from . import surfel_map as sm
from .posegraph import Posegraph


@jax.jit
def _pack_gn(pose: jnp.ndarray, stats: icp_ops.IcpStats) -> jnp.ndarray:
    """(pose, stats) -> one f32 [28] vector: pose [0:16], se3_log(pose)
    [16:22], error/valid/inlier/outlier/inlier_residual/invalid [22:28].
    One fetch instead of ~8 scalar round trips per verification step."""
    return jnp.concatenate([
        pose.astype(jnp.float32).reshape(-1),
        lie.se3_log(pose.astype(jnp.float32)).reshape(-1),
        jnp.stack([jnp.asarray(s).astype(jnp.float32).reshape(())
                   for s in (stats.error, stats.valid, stats.inlier,
                             stats.outlier, stats.inlier_residual,
                             stats.invalid)])])


_compose_jit = jax.jit(sm.compose_views)


def _fetch_gn(pose, stats):
    """Fetch a GN/evaluate result with ONE transfer; returns
    (pose np[4,4], log np[6], IcpStats of floats)."""
    v = np.asarray(_pack_gn(pose, stats))
    st = icp_ops.IcpStats(error=float(v[22]), valid=float(v[23]),
                          inlier=float(v[24]), outlier=float(v[25]),
                          inlier_residual=float(v[26]), invalid=float(v[27]))
    return v[:16].reshape(4, 4).copy(), v[16:22].copy(), st


@dataclass
class LoopClosureCandidate:
    frm: int
    to: int
    rel_pose: np.ndarray  # pose_old^-1 @ posegraph.pose(to)


class OldMapRenderCache:
    """Staleness-managed old-(inactive-)map renderer shared by the
    single-chip and sharded drivers (each injects its own view build /
    render callables; the sharded ones run under ``shard_map`` with a
    depth-min merge).

    Staleness tolerance (deliberate): between rebuilds, surfels
    integrated/culled since cache-build time and blocks whose old/new
    membership flipped are not reflected in verification renders. The
    bounds below (8 m of query motion, ~2 verification windows of split
    drift at 10 Hz) keep that divergence well inside the verification
    gates' slack — the *old* map changes slowly by construction (only a
    pose rebase touches it, which bumps ``map_version`` and invalidates
    here). A full rebuild also happens on every rebase/compaction.
    """

    def __init__(self, build_view, render_view, delta_timestamp: int,
                 motion_bound: float = 8.0, thr_bound: int = 12):
        self._build_view = build_view    # (center f32[3], thr) -> view
        self._render = render_view       # (view, pose, conf, thr) -> Maps
        self.delta_timestamp = delta_timestamp
        self.motion_bound = motion_bound
        self.thr_bound = thr_bound
        self._view = None
        self._center: Optional[np.ndarray] = None
        self._version = -1
        self._thr = -1
        self._last_render: Optional[tuple] = None

    def view_for(self, view_pose, timestamp: int, map_version: int):
        """Device view (active subset) covering ``view_pose``, rebuilt on
        staleness; returns (view, ts_threshold). Lets fused verification
        programs render from the cached view without a host round trip.

        (A predictive variant — dispatch the successor view at 3/4 of the
        motion bound so the rebuild overlaps in-flight work — measured
        NEUTRAL on the continuous-revisit lap, 66.9 vs 68.6 scans/s
        run-to-run variance: the periodic verify stalls are not
        rebuild-bound at the 12 m bound. Kept out for simplicity.)"""
        pose = np.asarray(view_pose, np.float32)
        thr = timestamp - self.delta_timestamp
        stale = (self._view is None
                 or self._version != map_version
                 or self._thr + self.thr_bound < thr
                 or np.linalg.norm(pose[:3, 3] - self._center)
                 > self.motion_bound)
        if stale:
            self._view = self._build_view(
                jnp.asarray(pose[:3, 3], jnp.float32),
                jnp.asarray(thr, jnp.int32))
            self._center = pose[:3, 3].copy()
            self._version = map_version
            self._thr = thr
            self._last_render = None
        return self._view, self._thr

    def render(self, view_pose, timestamp: int, conf_threshold: float,
               map_version: int):
        pose = np.asarray(view_pose, np.float32)
        view, thr = self.view_for(view_pose, timestamp, map_version)
        if self._last_render is not None and \
                np.array_equal(self._last_render[0], pose):
            return self._last_render[1]
        maps = self._render(view, jnp.asarray(pose),
                            jnp.asarray(conf_threshold, jnp.float32),
                            jnp.asarray(thr, jnp.int32))
        self._last_render = (pose.copy(), maps)
        return maps


@dataclass
class LoopCloser:
    cfg: SumaConfig
    posegraph: Posegraph = field(default_factory=Posegraph)
    unverified: List[LoopClosureCandidate] = field(default_factory=list)
    verified: List[LoopClosureCandidate] = field(default_factory=list)
    already_verified: bool = False
    time_without_loop: int = 0
    loop_count: int = 0
    pose_old: Optional[np.ndarray] = None       # current old-frame pose
    last_pose_old: Optional[np.ndarray] = None
    num_optimizations: int = 0
    num_loop_closures: int = 0
    num_rebases: int = 0          # above-gate integrations (device rebase)
    num_soft_integrations: int = 0  # below-gate (host-only, no drain)
    # set when a device-dependent phase was deferred because scans were in
    # flight; the driver must drain the pipeline and run synchronously
    sync_request: bool = False
    # set by drivers that support the device-carried verification chain
    # (dispatch_verify); leaves the pipeline running through live
    # candidate chains instead of draining per scan
    pipelined_ok: bool = False

    @property
    def chain_live(self) -> bool:
        return bool(self.unverified or self.already_verified)

    @property
    def sync_needed(self) -> bool:
        """True when the next scan's on_scan may touch device state that
        must be exactly current — the pipelined driver drains all
        in-flight scans first and runs synchronously. With the pipelined
        verification chain (pipelined_ok) a live candidate chain no
        longer forces draining (verification is a speculative per-scan
        device program chained off the odometry step), and with
        async_optimize the graph solve runs on a background thread — only
        an explicitly deferred phase (candidate search, sync-mode
        optimization) drains."""
        if self.sync_request:
            return True
        if self.chain_live and not self.pipelined_ok:
            return True
        if self.loop_count > 0 and not self.cfg.loop.async_optimize:
            return True
        return False

    @property
    def needs_integration(self) -> bool:
        """A background graph optimization finished and awaits integration
        (drivers poll this at dispatch boundaries, the way the reference
        polls its std::async future at the top of processScan,
        SurfelMapping.cpp:176-179)."""
        return self._opt_future is not None and self._opt_future.done()

    def __post_init__(self):
        self.posegraph.set_initial(0, np.eye(4))
        # diagonal information in [v, omega] residual order
        # (SurfelMapping.cpp:462-467 builds the same from the config's
        # odometry information entries)
        info = np.ones(6, np.float32)
        if self.cfg.odometry_info_translation:
            info[:3] *= self.cfg.odometry_info_translation ** -2
        if self.cfg.odometry_info_rotation:
            info[3:] *= self.cfg.odometry_info_rotation ** -2
        self._info = info
        self._fused = None
        self._pre = None
        # pipelined verification chain state: FIFO of (dispatch index,
        # packed device vec) + the device-resident pose_old carry
        from collections import deque
        self._verify_queue: "deque" = deque()
        self._pose_old_dev = None
        # async graph optimization (reference SurfelMapping.cpp:655-660)
        self._opt_future = None
        self._opt_ts = -1
        self._opt_before = None
        self._executor = None

    # ------------------------------------------------------------------
    def pre_dispatch(self, slam) -> None:
        """Speculatively dispatch the fused phase-A verification right
        after the odometry step's dispatch (before its fetch), so the
        verify result's device->host transfer overlaps the step's own —
        one link round trip per verifying scan instead of two. All inputs
        are device references of the just-dispatched scan (identical to
        what phase A would use at drain time); the host gates are applied
        in on_scan when both results have arrived."""
        self._pre = None
        if not (self.unverified or self.already_verified):
            return
        if not getattr(slam, "supports_fused_verify", False):
            return
        if self._fused is None:
            self._build_fused()
        # the scan's explicit dispatch count (== len(poses)+1 == the
        # timestamp the drain-time fallback path would read), so the
        # speculative and fallback verifications use identical inputs
        # (advisor r4)
        view, thr = slam.old_view(self.pose_old,
                                  timestamp=getattr(slam, "_dispatched",
                                                    slam.timestamp))
        vec, comp = self._fused[0](
            view, jnp.asarray(thr, jnp.int32),
            jnp.asarray(self.pose_old, jnp.float32),
            slam.last_maps, slam.model_maps,
            jnp.asarray(slam.last_increment),
            jnp.asarray(slam.confidence_threshold(), jnp.float32))
        try:
            vec.copy_to_host_async()
        except AttributeError:  # pragma: no cover
            pass
        self._pre = (vec, comp)

    # ------------------------------------------------------------------
    def warmup(self, slam) -> None:
        """Trace + compile (or cache-load) every loop-phase device program
        at DRIVER INIT instead of mid-drive: the fused search program
        (~4.7 s first-use even cache-warm), the verify chain (~1.1 s) and
        the pose-graph tier (~1.3 s) otherwise hit in the middle of the
        first verification window — measured as the difference between the
        ledger loop row's 16 scans/s and its true 38 scans/s steady
        verification-window rate. The reference pays its analogous startup
        cost building the TensorRT engine (KITTIReader.cpp:18-29)."""
        if not getattr(slam, "supports_fused_verify", False):
            return
        import time as _t
        t0 = _t.perf_counter()
        if self._fused is None:
            self._build_fused()
        eye = np.eye(4, dtype=np.float32)
        eyej = jnp.asarray(eye)
        conf = jnp.asarray(0.0, jnp.float32)
        maps = slam.last_maps
        # full view (candidate search) + reduced view (chained verify)
        view_f, thr_f = slam.old_view(eye, timestamp=0)
        inits = jnp.stack([eyej, eyej, eyej])
        self._fused[1](view_f, jnp.asarray(thr_f, jnp.int32), eyej, inits,
                       maps, maps, conf)
        self._fused[0](view_f, jnp.asarray(thr_f, jnp.int32), eyej, maps,
                       maps, eyej, conf)
        if hasattr(slam, "verify_view"):
            view_v, thr_v = slam.verify_view(eye, timestamp=0)
            self._fused[2](view_v, jnp.asarray(thr_v, jnp.int32), eyej,
                           maps, maps, eyej, eyej, conf)
        # pose-graph first tier (256 poses / 1024 edges) on the CPU backend
        g = Posegraph()
        g.set_initial(0, eye)
        g.set_initial(1, eye)
        g.add_edge(0, 1, eye, robust=True)
        g.optimize(robust_kernel=self.cfg.loop.robust_kernel,
                   robust_delta=self.cfg.loop.robust_delta)
        # rebase + compaction programs: the rebase program otherwise
        # compiles on the first ABOVE-gate integration, mid-drive
        # (measured 11.3 s at the flagship arena). Warming uses the
        # session's own poses (or identity on a fresh session), so the
        # rewrite is value-identical and harmless
        if hasattr(slam, "rebase"):
            cur = slam.poses[-1] if slam.poses else eye
            arr = np.stack(slam.poses) if slam.poses else eye[None]
            slam.rebase(arr, cur)
        if hasattr(slam, "_jit_compact"):
            slam.state = slam.state._replace(
                map=slam._jit_compact(slam.state.map))
            slam.map_version += 1
        # spill futile-probe program: its ~1.4 s compile is UNDER the 2 s
        # persistent-cache threshold, so it recompiles per process — warm
        # it here or it lands mid-lap on the first arena-pressure scan
        if getattr(slam, "spill", None) is not None:
            from .spill import _score_blocks
            np.asarray(_score_blocks(slam.state.map,
                                     jnp.zeros(3, jnp.float32),
                                     slam.spill.cfg))
        # composed-tracking fallback path (lag-0 sync re-entry): the
        # standalone old render + compose programs otherwise cache-load
        # (~0.3 s) at the first mid-lap sync event — measured as a single
        # ~300 ms scan in an otherwise ~12 ms/scan verification window
        if hasattr(slam, "render_old_maps"):
            old_maps = slam.render_old_maps(eye)
            _compose_jit(old_maps, maps,
                         self.cfg.loop.max_loop_closure_distance)
        # the identity-centered view caches are stale the moment the
        # vehicle is >8 m from the origin; drop them so the first real
        # verification builds fresh ones
        for cache in (getattr(slam, "_old_cache", None),
                      getattr(slam, "_verify_cache", None)):
            if cache is not None:
                cache._view = None
        sw = getattr(slam, "stopwatch", None)
        if sw is not None:
            sw.record("loop-warmup", _t.perf_counter() - t0)

    # ------------------------------------------------------------------
    def dispatch_verify(self, slam, idx: int) -> None:
        """Pipelined phase-A verification for scan ``idx``: dispatched
        right after the scan's odometry step, with the pose_old anchor
        CARRIED ON DEVICE between consecutive dispatches (the host gates
        are folded into the device program), so a live candidate chain no
        longer drains the pipeline — the redesign of the r4 sync-drain
        protocol that cost 88% loop-closure overhead. The packed result
        vec is consumed by on_scan when the scan drains; the composed
        old+new model render replaces the model maps immediately (device
        reference, zero host work), giving composed tracking for the next
        scan exactly like the hybrid path did."""
        import time as _t
        _t0 = _t.perf_counter()
        if self._fused is None:
            self._build_fused()
        if self._pose_old_dev is None:
            # seed the carry from the host anchor (chain start; host poses
            # are device-frame @ frame_correction)
            corr = getattr(slam, "frame_correction", None)
            anchor = self.pose_old
            if corr is not None:
                anchor = np.linalg.inv(corr) @ anchor
            self._pose_old_dev = jnp.asarray(anchor, jnp.float32)
        if hasattr(slam, "verify_view"):
            view, thr = slam.verify_view(self.pose_old, timestamp=idx + 1)
        else:
            view, thr = slam.old_view(self.pose_old, timestamp=idx + 1)
        vec, comp_out, pose_old_next = self._fused[2](
            view, jnp.asarray(thr, jnp.int32), self._pose_old_dev,
            slam.last_maps, slam.model_maps,
            jnp.asarray(slam.last_increment), jnp.asarray(slam.pose),
            jnp.asarray(slam._conf_at(idx), jnp.float32))
        try:
            vec.copy_to_host_async()
        except AttributeError:  # pragma: no cover
            pass
        self._pose_old_dev = pose_old_next
        self._verify_queue.append((idx, vec))
        if self.cfg.loop.compose_rendering:
            slam.set_model_maps(comp_out)
        sw = getattr(slam, "stopwatch", None)
        if sw is not None:
            sw.record("verify-dispatch", _t.perf_counter() - _t0)

    # ------------------------------------------------------------------
    def _build_fused(self):
        """One-dispatch/one-fetch jitted programs for verification (phase
        A) and candidate search (phase C). The unfused path issues ~3-6
        separate device syncs per verifying/searching scan (~33 ms each on
        a remote backend); these fuse the old-map render, the (pyramid)
        GN alignment, the composed-view re-render and its residual
        evaluation into ONE program returning one packed vector."""
        cfg = self.cfg
        icp_cfg, model_cfg, mcfg = cfg.icp, cfg.model, cfg.map
        sem = cfg.semantic.enabled
        maxd = cfg.loop.max_loop_closure_distance
        levels = cfg.loop.search_levels
        eye = jnp.eye(4, dtype=jnp.float32)

        def stats_vec(st):
            return jnp.stack([jnp.asarray(x).astype(jnp.float32).reshape(())
                              for x in (st.error, st.valid, st.inlier,
                                        st.outlier, st.inlier_residual,
                                        st.invalid)])

        def render_old(view, pose, conf, thr):
            return sm.render_view(view, pose, model_cfg, mcfg, conf, thr,
                                  "old")

        def align(data_maps, old_maps, init):
            if levels > 1:
                from ..ops.pyramid import gauss_newton_pyramid
                return gauss_newton_pyramid(
                    data_maps, old_maps, init, icp_cfg, model_cfg,
                    levels=levels, semantic=sem)
            return icp_ops.gauss_newton(data_maps, old_maps, init, icp_cfg,
                                        model_cfg, semantic=sem)

        @jax.jit
        def verify(view, thr, last_pose_old, data_maps, model_maps, t0,
                   conf):
            old_maps = render_old(view, last_pose_old, conf, thr)
            res = icp_ops.gauss_newton(data_maps, old_maps, t0, icp_cfg,
                                       model_cfg, semantic=sem)
            inc_old = res.pose.astype(jnp.float32)
            pose_old_new = last_pose_old @ inc_old
            old2 = render_old(view, pose_old_new, conf, thr)
            comp = sm.compose_views(old2, model_maps, maxd)
            cstats = icp_ops.evaluate(eye, data_maps, comp, icp_cfg,
                                      model_cfg, semantic=sem)
            vec = jnp.concatenate([
                inc_old.reshape(-1),                      # 0:16
                lie.se3_log(inc_old).reshape(-1),         # 16:22
                stats_vec(res.stats),                     # 22:28
                stats_vec(cstats),                        # 28:34
                pose_old_new.reshape(-1)])                # 34:50
            return vec, comp

        lcfg = cfg.loop

        @jax.jit
        def verify_chain(view, thr, pose_old_prev, data_maps, model_maps,
                         inc, odo_pose, conf):
            """Device-carried phase-A verification: like ``verify`` but the
            host gates (SurfelMapping.cpp:567) are evaluated ON DEVICE and
            select the next pose_old carry, so consecutive verifications
            chain dispatch-to-dispatch with zero host round trips — the
            pipelined driver keeps scans in flight through a live candidate
            chain instead of draining per scan. Returns
            (vec[51], composed-model maps, pose_old_next)."""
            old_maps = render_old(view, pose_old_prev, conf, thr)
            res = icp_ops.gauss_newton(data_maps, old_maps, inc, icp_cfg,
                                       model_cfg, semantic=sem)
            inc_old = res.pose.astype(jnp.float32)
            pose_old_new = pose_old_prev @ inc_old
            st = res.stats
            orr = st.outlier / jnp.maximum(st.outlier + st.inlier, 1.0)
            vr = st.valid / jnp.maximum(st.valid + st.invalid, 1.0)
            inc_diff = jnp.linalg.norm(
                lie.se3_log(inc.astype(jnp.float32)) - lie.se3_log(inc_old))
            gates = (vr > lcfg.min_valid_ratio) \
                & (orr < lcfg.max_outlier_ratio) \
                & (inc_diff < lcfg.max_increment_difference)
            old2 = render_old(view, pose_old_new, conf, thr)
            comp = sm.compose_views(old2, model_maps, maxd)
            cstats = icp_ops.evaluate(eye, data_maps, comp, icp_cfg,
                                      model_cfg, semantic=sem)
            pose_old_next = jnp.where(gates, pose_old_new, odo_pose)
            # composed tracking output (SurfelMapping.cpp:351): compose at
            # the verified anchor on success; at the previous anchor's
            # render on gate failure (the reference composes whenever a
            # candidate is live — one-scan anchor staleness is within the
            # old-map cache's documented tolerance)
            comp_fail = sm.compose_views(old_maps, model_maps, maxd)
            comp_out = jax.tree.map(lambda a, b: jnp.where(gates, a, b),
                                    comp, comp_fail)
            vec = jnp.concatenate([
                inc_old.reshape(-1),                      # 0:16
                lie.se3_log(inc_old).reshape(-1),         # 16:22
                stats_vec(res.stats),                     # 22:28
                stats_vec(cstats),                        # 28:34
                pose_old_new.reshape(-1),                 # 34:50
                gates.astype(jnp.float32).reshape(1)])    # 50
            return vec, comp_out, pose_old_next

        @jax.jit
        def search(view, thr, pose_prior, inits, data_maps, model_maps,
                   conf):
            old_maps = render_old(view, pose_prior, conf, thr)
            rows = []
            for k in range(3):
                res = align(data_maps, old_maps, inits[k])
                cand_pose = pose_prior @ res.pose.astype(jnp.float32)
                old2 = render_old(view, cand_pose, conf, thr)
                comp = sm.compose_views(old2, model_maps, maxd)
                cstats = icp_ops.evaluate(eye, data_maps, comp, icp_cfg,
                                          model_cfg, semantic=sem)
                rows.append(jnp.concatenate([
                    cand_pose.reshape(-1),                # 0:16
                    stats_vec(res.stats),                 # 16:22
                    stats_vec(cstats)]))                  # 22:28
            return jnp.stack(rows)                        # [3, 28]

        self._fused = (verify, search, verify_chain)

    # ------------------------------------------------------------------
    def _ratios(self, stats: icp_ops.IcpStats):
        inl = float(stats.inlier)
        out = float(stats.outlier)
        val = float(stats.valid)
        inv = float(stats.invalid)
        outlier_ratio = out / max(out + inl, 1.0)
        valid_ratio = val / max(val + inv, 1.0)
        residual = float(stats.error) / max(val, 1.0)
        return valid_ratio, outlier_ratio, residual

    def _render_old(self, slam, view_pose):
        """Inactive-map render at ``view_pose`` via the driver's cached
        old-view renderer (single-chip: refresh_active(priority='old') +
        render_view; sharded: per-shard refresh + depth-min merge)."""
        return slam.render_old_maps(view_pose)

    def _align_candidate(self, data, model, init):
        """Candidate-search ICP. Initializations here can be meters off
        after drift, so a coarse-to-fine pyramid (search_levels > 1) widens
        the projective-association basin; level 0 = the odometry solver."""
        levels = self.cfg.loop.search_levels
        if levels > 1:
            from ..ops.pyramid import gauss_newton_pyramid
            return gauss_newton_pyramid(
                data, model, jnp.asarray(init, jnp.float32), self.cfg.icp,
                self.cfg.model, levels=levels,
                semantic=self.cfg.semantic.enabled)
        return icp_ops.gauss_newton(
            data, model, jnp.asarray(init, jnp.float32), self.cfg.icp,
            self.cfg.model, semantic=self.cfg.semantic.enabled)

    def _composed_residual(self, slam, pose_old, pose_new):
        """Residual of the current scan against the composed old+new model:
        old map rendered at ``pose_old``, new map = the hot path's own model
        render at ``pose_new`` (the step's model_maps), merged in image
        space exactly like render_compose.frag:26-48. ``pose_new`` is the
        current pose by construction (SurfelMapping.cpp:597-607)."""
        old_maps = self._render_old(slam, pose_old)
        comp = _compose_jit(old_maps, slam.model_maps,
                            self.cfg.loop.max_loop_closure_distance)
        stats = icp_ops.evaluate(jnp.eye(4, dtype=jnp.float32),
                                 slam.last_maps, comp, self.cfg.icp,
                                 self.cfg.model,
                                 semantic=self.cfg.semantic.enabled)
        _, _, host_stats = _fetch_gn(jnp.eye(4, dtype=jnp.float32), stats)
        return host_stats

    def _closest_index(self, slam, query_pose) -> int:
        """Nearest old pose within search radius with sufficient trajectory
        separation (SurfelMapping::getClosestIndex) — vectorized over the
        whole pose history (the reference walks it in a scalar loop)."""
        ts = slam.timestamp - 1
        lim = ts - self.cfg.loop.delta_timestamp
        if lim < 0:
            return -1
        q = np.asarray(query_pose)[:3, 3]
        cand = self.posegraph.translations(lim + 1)     # [lim+1, 3]
        tdist = np.asarray(slam.trajectory_distances[:lim + 1])
        d = np.linalg.norm(cand - q[None, :], axis=-1)
        sep_ok = (slam.trajectory_distances[ts] - tdist) \
            > self.cfg.loop.min_trajectory_distance
        d = np.where(sep_ok, d, np.inf)
        j = int(np.argmin(d))
        return j if d[j] < self.cfg.loop.search_distance else -1

    # ------------------------------------------------------------------
    def on_scan(self, slam, info, lag: int = 0) -> dict:
        """Called after each odometry step with the step's StepInfo.

        ``lag`` is the number of scans dispatched AFTER this one that are
        still in flight (pipelined drivers). Host-only bookkeeping (graph
        edges, counters) always runs; the device-dependent phases
        (verification ICP, candidate search, graph rebase) require the
        device state to be exactly this scan's, so with ``lag > 0`` they
        are deferred and ``sync_request`` is raised — the driver drains
        the pipeline and re-enters synchronously on the next scan.
        Deferring a candidate search is harmless (search repeats every
        idle scan); verification chains never run with lag because
        ``sync_needed`` keeps the driver synchronous while they are live.
        """
        import time as _time
        t_loop0 = _time.perf_counter()
        sw = getattr(slam, "stopwatch", None)
        _mark = [t_loop0]

        def _lap(label):
            if sw is not None:
                t = _time.perf_counter()
                sw.record(label, t - _mark[0])
                _mark[0] = t

        cfg = self.cfg.loop
        ts = slam.timestamp - 1  # index of the scan just processed
        stats: dict = {}
        deferred = False

        increment = np.asarray(info.increment)
        pose = np.asarray(info.pose)

        # odometry factor (SurfelMapping.cpp:462-467)
        if ts == 0:
            self.posegraph.set_initial(0, pose)
            self.pose_old = pose.copy()
            self.last_pose_old = pose.copy()
            return {"loop-count": 0}
        self.posegraph.set_initial(
            ts, self.posegraph.pose(ts - 1) @ increment)
        self.posegraph.add_edge(ts - 1, ts, increment, self._info)

        # old-frame pose track: by default follows odometry
        self.last_pose_old = self.pose_old
        self.pose_old = pose.copy()

        self.time_without_loop += 1

        vr_new, or_new, res_new = self._ratios(info.stats)

        _lap("loop/bookkeep")
        # ---- phase A: verify pending candidates --------------------------
        self._last_comp = None
        qvec = None
        while self._verify_queue and self._verify_queue[0][0] < ts:
            self._verify_queue.popleft()  # stale entries (chain restarted)
        if self._verify_queue and self._verify_queue[0][0] == ts:
            qvec = np.asarray(self._verify_queue.popleft()[1])
        if self.chain_live and qvec is not None:
            # pipelined path: the verification ran on device when this scan
            # was dispatched (dispatch_verify); only host bookkeeping here.
            # Works at ANY lag — the device carry kept the chain exact.
            corr = getattr(slam, "frame_correction", None)
            pose_old_new = qvec[34:50].reshape(4, 4).copy()
            if corr is not None:
                pose_old_new = corr @ pose_old_new
            gates_ok = qvec[50] > 0
            verified_this_scan = False
            if gates_ok:
                cstats = icp_ops.IcpStats(*[float(x) for x in qvec[28:34]])
                _, _, res_old = self._ratios(cstats)
                rel_error = res_old / max(res_new, 1e-12)
                self.pose_old = pose_old_new
                if rel_error < cfg.residual_threshold or \
                        (res_old - res_new) < cfg.residual_margin:
                    self.time_without_loop = 0
                    to = self._closest_index(slam, pose_old_new)
                    if to > -1:
                        cand = LoopClosureCandidate(
                            frm=ts, to=to,
                            rel_pose=np.linalg.inv(pose_old_new)
                            @ self.posegraph.pose(to))
                        (self.verified if self.already_verified
                         else self.unverified).append(cand)
                        verified_this_scan = True
            stats["loop-verifying"] = verified_this_scan
        elif self.chain_live and lag > 0:
            deferred = True  # driver recovers via sync_needed next scan
        elif self.unverified or self.already_verified:
            inc_log = getattr(info, "inc_log", None)
            if inc_log is None:  # plain StepInfo (tests/legacy callers)
                inc_log = np.asarray(
                    lie.se3_log(jnp.asarray(increment, jnp.float32)))
            if getattr(slam, "supports_fused_verify", False):
                # fused path: old-map render + GN + composed re-render +
                # residual evaluation in one program, ONE fetch — already
                # in flight when the driver speculatively pre-dispatched
                pre, self._pre = self._pre, None
                if pre is not None:
                    vec, comp = pre
                else:
                    if self._fused is None:
                        self._build_fused()
                    view, thr = slam.old_view(self.last_pose_old)
                    vec, comp = self._fused[0](
                        view, jnp.asarray(thr, jnp.int32),
                        jnp.asarray(self.last_pose_old, jnp.float32),
                        slam.last_maps, slam.model_maps,
                        jnp.asarray(slam.last_increment),
                        jnp.asarray(slam.confidence_threshold(),
                                    jnp.float32))
                v = np.asarray(vec)
                inc_old = v[:16].reshape(4, 4)
                log_old = v[16:22]
                rstats = icp_ops.IcpStats(*[float(x) for x in v[22:28]])
                cstats = icp_ops.IcpStats(*[float(x) for x in v[28:34]])
                pose_old_new = v[34:50].reshape(4, 4)
            else:
                old_maps = self._render_old(slam, self.last_pose_old)
                res = icp_ops.gauss_newton(
                    slam.last_maps, old_maps,
                    jnp.asarray(slam.last_increment), self.cfg.icp,
                    self.cfg.model, semantic=self.cfg.semantic.enabled)
                inc_old, log_old, rstats = _fetch_gn(res.pose, res.stats)
                pose_old_new = cstats = comp = None
            vr, orr, _ = self._ratios(rstats)
            inc_diff = float(np.linalg.norm(inc_log - log_old))
            verified_this_scan = False
            if vr > cfg.min_valid_ratio and orr < cfg.max_outlier_ratio \
                    and inc_diff < cfg.max_increment_difference:
                if pose_old_new is None:
                    pose_old_new = self.last_pose_old @ inc_old
                    cstats = self._composed_residual(slam, pose_old_new,
                                                     pose)
                else:
                    # composed view already rendered at pose_old_new by
                    # the fused program — reusable for composed tracking
                    self._last_comp = comp
                    self._last_comp_pose = pose_old_new
                _, _, res_old = self._ratios(cstats)
                rel_error = res_old / max(res_new, 1e-12)
                self.pose_old = pose_old_new
                if rel_error < cfg.residual_threshold or \
                        (res_old - res_new) < cfg.residual_margin:
                    self.time_without_loop = 0
                    to = self._closest_index(slam, pose_old_new)
                    if to > -1:
                        cand = LoopClosureCandidate(
                            frm=ts, to=to,
                            rel_pose=np.linalg.inv(pose_old_new)
                            @ self.posegraph.pose(to))
                        (self.verified if self.already_verified
                         else self.unverified).append(cand)
                        verified_this_scan = True
            stats["loop-verifying"] = verified_this_scan

        # ---- promotion ---------------------------------------------------
        if not self.already_verified and \
                len(self.unverified) >= cfg.min_verifications + 1:
            self.verified.extend(self.unverified)
            self.unverified.clear()
            self.already_verified = True

        _lap("loop/verify")
        # ---- add verified edges ------------------------------------------
        last_from = -1
        for cand in self.verified:
            if cand.frm != last_from:
                last_from = cand.frm
                self.loop_count += 1
                self.num_loop_closures += 1
            self.posegraph.add_edge(cand.frm, cand.to, cand.rel_pose,
                                    self._info, robust=True)
        self.verified.clear()

        _lap("loop/edges")
        # ---- optimize ----------------------------------------------------
        # async (default): clone the graph and solve on a background host
        # thread, integrating the result on a later scan — the reference's
        # std::async protocol (SurfelMapping.cpp:655-660 + 212-253). The
        # launch itself is host-only, so it works at any pipeline lag.
        if (self.loop_count > 6) or \
                (self.loop_count > 0 and self.time_without_loop > 3):
            if self.cfg.loop.async_optimize:
                self._launch_optimize()
            elif lag > 0:
                deferred = True
            else:
                self._optimize_and_rebase(slam)

        _lap("loop/opt")
        # ---- phase C: search a new candidate -----------------------------
        if self.time_without_loop > 3:
            self.unverified.clear()
            self.already_verified = False
            self._pose_old_dev = None  # next chain re-seeds the carry
            if lag > 0:
                # the search ICP needs THIS scan's data maps on device;
                # with scans in flight, only check the (host-side) trigger
                # and ask the driver to drain + re-enter synchronously —
                # the search repeats next scan at lag 0
                if self._closest_index(slam, info.pose) >= 0:
                    deferred = True
            else:
                found = self._search_candidate(slam, info, vr_new, or_new,
                                               res_new)
                stats["loop-candidate-found"] = found

        _lap("loop/search")
        # ---- composed old/new tracking while a candidate is live ---------
        # The reference renders the model view for the NEXT scan's ICP as
        # the composed old+new map whenever a loop candidate is active
        # (SurfelMapping.cpp:351 -> SurfelMap::render(pose_old, pose_new)
        # + render_compose.frag:26-48), so odometry keeps tracking against
        # the old map through the verification window.
        if cfg.compose_rendering and qvec is None and lag == 0 \
                and (self.unverified or self.already_verified):
            if self._last_comp is not None and np.array_equal(
                    self.pose_old, self._last_comp_pose):
                # the fused verify already composed old@pose_old with this
                # scan's model render — reuse, zero extra device work
                slam.set_model_maps(self._last_comp)
            else:
                old_maps = self._render_old(slam, self.pose_old)
                slam.set_model_maps(_compose_jit(
                    old_maps, slam.model_maps,
                    cfg.max_loop_closure_distance))

        _lap("loop/compose")
        self.sync_request = deferred
        stats["loop-count"] = self.loop_count
        stats["loop-closures"] = self.num_loop_closures
        stats["loop-time"] = _time.perf_counter() - t_loop0
        return stats

    # ------------------------------------------------------------------
    def _search_candidate(self, slam, info, vr_new, or_new, res_new) -> bool:
        cfg = self.cfg.loop
        ts = slam.timestamp - 1
        pose = np.asarray(info.pose)
        to = self._closest_index(slam, pose)
        if to < 0:
            return False

        pose_prior = self.posegraph.pose(to)
        old_maps = None
        if not getattr(slam, "supports_fused_verify", False):
            old_maps = self._render_old(slam, pose_prior)

        # three initializations (SurfelMapping.cpp:679-691)
        O = np.linalg.inv(pose_prior) @ pose
        O[2, 3] = 0.0
        rot_only = O.copy()
        rot_only[:3, 3] = 0.0
        half = O.copy()
        half[0, 3] *= 0.5
        half[1, 3] *= 0.5

        # mirror SurfelMapping.cpp:697-779: a candidate is pushed whenever
        # the valid/outlier-ratio gates pass for the best initialization;
        # the residual test only decides whether the old-frame pose anchor
        # jumps to the ICP estimate (else it stays at the odometry pose)
        fused_rows = None
        if getattr(slam, "supports_fused_verify", False):
            # all three initializations aligned + composed-evaluated in
            # ONE device program with ONE fetch (the unfused path costs
            # ~6 separate syncs per searching scan)
            if self._fused is None:
                self._build_fused()
            view, thr = slam.old_view(pose_prior)
            fused_rows = np.asarray(self._fused[1](
                view, jnp.asarray(thr, jnp.int32),
                jnp.asarray(pose_prior, jnp.float32),
                jnp.asarray(np.stack([O, rot_only, half]), jnp.float32),
                slam.last_maps, slam.model_maps,
                jnp.asarray(slam.confidence_threshold(), jnp.float32)))
        best = None
        for k, init in enumerate((O, rot_only, half)):
            if fused_rows is not None:
                row = fused_rows[k]
                cand_pose = row[:16].reshape(4, 4)
                rstats = icp_ops.IcpStats(*[float(x) for x in row[16:22]])
                cstats = icp_ops.IcpStats(*[float(x) for x in row[22:28]])
                vr, orr, _ = self._ratios(rstats)
                if not (vr > cfg.min_valid_ratio
                        and orr < cfg.max_outlier_ratio):
                    continue
            else:
                res = self._align_candidate(slam.last_maps, old_maps, init)
                rel, _, rstats = _fetch_gn(res.pose, res.stats)
                vr, orr, _ = self._ratios(rstats)
                if not (vr > cfg.min_valid_ratio
                        and orr < cfg.max_outlier_ratio):
                    continue
                cand_pose = pose_prior @ rel
                cstats = self._composed_residual(slam, cand_pose, pose)
            vr_old, or_old, res_old = self._ratios(cstats)
            rel_valid = vr_old / max(vr_new, 1e-12)
            rel_outlier = or_old / max(or_new, 1e-12)
            rel_error = res_old / max(res_new, 1e-12)
            if rel_valid >= cfg.valid_threshold and \
                    rel_outlier < cfg.outlier_threshold:
                if best is None or (res_old < best[0] and or_old < best[1]):
                    accept = rel_error < cfg.residual_threshold or \
                        (res_old - res_new) < cfg.residual_margin
                    best = (res_old, or_old, cand_pose, accept)

        if best is None:
            return False
        _, _, cand_pose, accept = best
        anchor = cand_pose if accept else pose
        self.pose_old = anchor
        self.unverified.append(LoopClosureCandidate(
            frm=ts, to=to,
            rel_pose=np.linalg.inv(anchor) @ self.posegraph.pose(to)))
        return True

    # ------------------------------------------------------------------
    def _launch_optimize(self) -> None:
        """Launch the pose-graph solve on a background thread over a CLONE
        of the graph (reference: Posegraph::clone + std::async,
        SurfelMapping.cpp:655-660). One optimization in flight at a time;
        the scan loop keeps adding odometry/loop edges to the LIVE graph,
        which the next optimization picks up."""
        if self._opt_future is not None:
            return
        snap = self.posegraph.clone()
        self._opt_ts = len(snap._poses) - 1
        self._opt_before = snap.pose(self._opt_ts).copy()
        self.loop_count = 0
        kern = self.cfg.loop.robust_kernel
        delta = self.cfg.loop.robust_delta
        if self._executor is None:
            from concurrent.futures import ThreadPoolExecutor
            self._executor = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="posegraph-opt")

        def work():
            snap.optimize(robust_kernel=kern, robust_delta=delta)
            return snap

        self._opt_future = self._executor.submit(work)

    def integrate(self, slam) -> bool:
        """Integrate a finished background optimization: merge the
        optimized clone into the live graph (poses tracked since the
        snapshot are rebased by ``difference = opt[snap] @ before^-1`` —
        integrateLoopClosures, SurfelMapping.cpp:212-253), then either
        (a) correction below the rebase gates: update host poses only and
        fold the correction into ``slam.frame_correction`` (applied to
        every subsequently fetched device pose; the device map stays in
        its old frame within the gate bound), or (b) drain the pipeline
        and run the full device rebase (pose-table rewrite + model
        re-render). Drivers call this at dispatch boundaries when
        ``needs_integration``. Returns True if anything was integrated."""
        if self._opt_future is None or not self._opt_future.done():
            return False
        import time as _t
        _t0 = _t.perf_counter()
        snap = self._opt_future.result()
        self._opt_future = None
        self.num_optimizations += 1
        ts_snap = self._opt_ts
        difference = (snap.pose(ts_snap)
                      @ np.linalg.inv(self._opt_before)).astype(np.float32)
        # merge into the live graph
        live = self.posegraph._poses
        for i in range(len(live)):
            if i <= ts_snap:
                live[i] = snap.pose(i)
            else:
                live[i] = difference @ live[i]
        corr_old = getattr(slam, "frame_correction", np.eye(4, dtype=np.float32))
        corr_new = (difference @ corr_old).astype(np.float32)

        # accumulated device<->output divergence AT the current pose
        cur_out = slam.poses[-1]
        cur_dev = np.linalg.inv(corr_old) @ cur_out
        moved = corr_new @ cur_dev
        t_acc = float(np.linalg.norm(moved[:3, 3] - cur_dev[:3, 3]))
        r_acc = float(np.arccos(np.clip(
            (np.trace(corr_new[:3, :3]) - 1.0) / 2.0, -1.0, 1.0)))
        lcfg = self.cfg.loop
        sw = getattr(slam, "stopwatch", None)
        if t_acc < lcfg.rebase_gate_translation \
                and r_acc < lcfg.rebase_gate_rotation:
            # (a) below-gate: host-only integration
            self.num_soft_integrations += 1
            slam.frame_correction = corr_new
            for i in range(min(len(live), len(slam.poses))):
                slam.poses[i] = live[i]
            self._rewrite_trajectory_distances(slam)
            if self.pose_old is not None:
                self.pose_old = difference @ self.pose_old
            if sw is not None:
                sw.record("integrate-soft", _t.perf_counter() - _t0)
            return True
        # (b) full device rebase: needs an empty pipeline
        self.num_rebases += 1
        slam.flush()
        opt = np.stack(self.posegraph.poses())
        new_current = difference @ np.asarray(slam.poses[-1])
        slam.rebase(opt, new_current)
        slam.frame_correction = np.eye(4, dtype=np.float32)
        self._pose_old_dev = None
        self.pose_old = new_current.copy()
        for i in range(min(len(opt), len(slam.poses))):
            slam.poses[i] = opt[i]
        self._rewrite_trajectory_distances(slam)
        if sw is not None:
            sw.record("integrate-rebase", _t.perf_counter() - _t0)
        return True

    def _rewrite_trajectory_distances(self, slam) -> None:
        dist = 0.0
        slam.trajectory_distances[0] = 0.0
        for i in range(1, len(slam.poses)):
            dist += float(np.linalg.norm(slam.poses[i][:3, 3]
                                         - slam.poses[i - 1][:3, 3]))
            if i < len(slam.trajectory_distances):
                slam.trajectory_distances[i] = dist
            else:  # pragma: no cover - defensive
                slam.trajectory_distances.append(dist)

    # ------------------------------------------------------------------
    def _optimize_and_rebase(self, slam) -> None:
        """Optimize the graph and rebase the live state (the synchronous
        version of integrateLoopClosures, SurfelMapping.cpp:212-253). The
        device-side rewrite (pose table + world cache + model re-render) is
        the driver's ``rebase`` — sharded drivers run it per shard."""
        ts = slam.timestamp - 1
        before_pose = self.posegraph.pose(ts).copy()
        self.posegraph.optimize(robust_kernel=self.cfg.loop.robust_kernel,
                                robust_delta=self.cfg.loop.robust_delta)
        self.num_optimizations += 1
        self.loop_count = 0

        difference = self.posegraph.pose(ts) @ np.linalg.inv(before_pose)
        new_current = difference @ np.asarray(slam.pose)

        opt = np.stack(self.posegraph.poses())
        slam.rebase(opt, new_current)
        if hasattr(slam, "frame_correction"):
            slam.frame_correction = np.eye(4, dtype=np.float32)
        self._pose_old_dev = None

        # rewrite host pose log + trajectory distances
        for i in range(min(len(opt), len(slam.poses))):
            slam.poses[i] = self.posegraph.pose(i)
        self._rewrite_trajectory_distances(slam)
        self.pose_old = new_current.copy()
