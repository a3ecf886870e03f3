"""Surfel map tests: creation, rendering, association/fusion, stability,
dynamic removal, compaction, pose updates."""
import pytest
import numpy as np
import jax.numpy as jnp

from semantic_suma_tpu.config import DataConfig, MapConfig
from semantic_suma_tpu.core import surfel_map as sm
from semantic_suma_tpu.io.simulation import default_world, render_scan
from semantic_suma_tpu.ops.filters import compute_normals
from semantic_suma_tpu.ops.icp import Maps
from semantic_suma_tpu.ops.projection import project_scan
from semantic_suma_tpu.utils import lie

CFG = DataConfig(width=180, height=32)
MCFG = MapConfig(surfel_capacity=1 << 16, active_capacity=1 << 15, max_poses=64)


def make_maps(scan):
    res = project_scan(scan.points, scan.labels, scan.probs, cfg=CFG,
                       point_valid=scan.valid)
    normal, nvalid = compute_normals(res.vertex_map, res.vertex_valid)
    return Maps(res.vertex_map, normal, res.vertex_valid, nvalid,
                res.sem_label, res.sem_prob)


def ingest(state, scan, pose, ts, semantic=True, conf_thresh=0.0):
    maps = make_maps(scan)
    frame = sm.data_surfel_init(maps, CFG, MCFG)
    state, n_created = sm.update_map(state, frame, pose, ts, CFG, MCFG,
                                     conf_thresh, semantic=semantic)
    return state, n_created


def test_creation_from_first_scan():
    world = default_world(seed=0)
    scan = render_scan(world, jnp.eye(4), CFG)
    state = sm.empty_map(MCFG)
    state, n_created = ingest(state, scan, jnp.eye(4), 0)
    cnt = int(state.count)
    assert cnt > 500
    assert int(jnp.sum(state.data.valid)) == cnt
    # created surfels carry the prior confidence and current timestamp
    valid = np.asarray(state.data.valid)
    conf = np.asarray(state.data.confidence)[valid]
    assert np.allclose(conf, MCFG.log_prior, atol=0.51)  # movable get -0.5
    assert np.all(np.asarray(state.data.creation_ts)[valid] == 0)


def test_render_matches_observed_geometry():
    world = default_world(seed=0)
    scan = render_scan(world, jnp.eye(4), CFG)
    state = sm.empty_map(MCFG)
    state, _ = ingest(state, scan, jnp.eye(4), 0)
    # render from the same pose with warmup threshold (low confidence OK)
    maps = sm.render_maps(state, jnp.eye(4), CFG, MCFG,
                          conf_threshold=MCFG.log_unstable - 1.0,
                          ts_threshold=0, render_old=False)
    data = make_maps(scan)
    both = np.asarray(maps.vertex_valid & data.vertex_valid
                      & data.normal_valid)
    assert both.sum() > 0.5 * np.asarray(data.valid).sum()
    dv = np.asarray(data.vertex)[both]
    mv = np.asarray(maps.vertex)[both]
    # rendered model vertices are surfel centers: must be close to the data
    # (bounded by the angular pixel size at the observed depth)
    err = np.linalg.norm(dv - mv, axis=-1)
    depth = np.linalg.norm(dv, axis=-1)
    px_size = max(CFG.pixel_size, 2 * np.pi / CFG.width)  # anisotropic pixels
    rel = err / np.maximum(depth * px_size, 1e-6)
    assert np.median(rel) < 2.0, np.median(rel)


def test_association_updates_instead_of_creating():
    world = default_world(seed=0)
    scan = render_scan(world, jnp.eye(4), CFG)
    state = sm.empty_map(MCFG)
    state, _ = ingest(state, scan, jnp.eye(4), 0)
    n0 = int(state.count)
    conf0 = np.asarray(state.data.confidence).copy()
    # same scan again from same pose: almost everything should associate
    state, n_created = ingest(state, scan, jnp.eye(4), 1)
    n1 = int(state.count)
    assert (n1 - n0) < 0.2 * n0, (n0, n1)
    # confidence must have increased for matched surfels
    conf1 = np.asarray(state.data.confidence)
    valid0 = np.asarray(state.data.valid)[:n0]
    increased = conf1[:n0][valid0] > conf0[:n0][valid0] + 0.1
    assert increased.mean() > 0.8


@pytest.mark.slow
def test_confidence_rises_and_culls():
    """Repeated observation stabilizes; surfels never re-observed die."""
    world = default_world(seed=0)
    state = sm.empty_map(MCFG)
    pose = jnp.eye(4)
    scan = render_scan(world, pose, CFG)
    for t in range(4):
        state, _ = ingest(state, scan, pose, t)
    valid = np.asarray(state.data.valid)
    conf = np.asarray(state.data.confidence)[valid]
    assert np.mean(conf > MCFG.log_prior + 1.0) > 0.7

    # now feed empty scans from the same pose (no measurements): surfels in
    # the active window below the confidence threshold and older than
    # unstable_age are culled (update_surfels.vert:156-157)
    empty = scan._replace(valid=jnp.zeros_like(scan.valid))
    n_before = int(jnp.sum(state.data.valid))
    for t in range(4, 10):
        state, _ = ingest(state, empty, pose, t, conf_thresh=25.0)
    n_after = int(jnp.sum(state.data.valid))
    # with an impossibly high confidence threshold everything decays away
    assert n_after < 0.1 * n_before, (n_before, n_after)


def test_movable_penalty_removes_dynamic_surfels():
    """A 'car' surfel contradicted by later labels must lose confidence
    faster than a static surfel (dynamic removal)."""
    world = default_world(seed=0)
    scan = render_scan(world, jnp.eye(4), CFG)
    state = sm.empty_map(MCFG)

    # first ingest with all points labeled 'car' (movable)
    car_scan = scan._replace(labels=jnp.where(scan.valid, 10, 0))
    state, _ = ingest(state, car_scan, jnp.eye(4), 0)
    n0 = int(state.count)
    conf_car = np.asarray(state.data.confidence)[:n0].copy()

    # now observe same geometry labeled 'building': mismatch on movable
    bld_scan = scan._replace(labels=jnp.where(scan.valid, 50, 0))
    state, _ = ingest(state, bld_scan, jnp.eye(4), 1)
    conf_after = np.asarray(state.data.confidence)[:n0]
    valid = np.asarray(state.data.valid)[:n0]
    # movable-mismatch surfels get stability update - 1.0 penalty
    drop = conf_after - conf_car
    matched = drop != 0
    assert np.median(drop[matched]) < 0.5  # penalty offsets the gain

    # control: static map observed with static mismatch loses nothing extra
    state2 = sm.empty_map(MCFG)
    state2, _ = ingest(state2, bld_scan, jnp.eye(4), 0)
    road_scan = scan._replace(labels=jnp.where(scan.valid, 40, 0))
    conf_b = np.asarray(state2.data.confidence)[:n0].copy()
    state2, _ = ingest(state2, road_scan, jnp.eye(4), 1)
    drop2 = np.asarray(state2.data.confidence)[:n0] - conf_b
    assert np.median(drop2[drop2 != 0]) > np.median(drop[matched])


def test_compact():
    world = default_world(seed=0)
    scan = render_scan(world, jnp.eye(4), CFG)
    state = sm.empty_map(MCFG)
    state, _ = ingest(state, scan, jnp.eye(4), 0)
    # kill every other surfel (packed int validity column); drop the active
    # view so the edited global store is authoritative
    v = np.asarray(state.data.valid).copy()
    v[::2] = False
    i_arr = np.asarray(state.data.i).copy()
    i_arr[:, 3] = v.astype(np.int32)
    state = sm._reset_view(
        state._replace(data=state.data._replace(i=jnp.asarray(i_arr))), MCFG)
    n_valid = int(v.sum())
    compacted = sm.compact(state, MCFG)
    assert int(compacted.count) == n_valid
    cv = np.asarray(compacted.data.valid)
    assert cv[:n_valid].all() and not cv[n_valid:].any()
    # attribute multiset preserved
    r_old = np.sort(np.asarray(state.data.radius)[v])
    r_new = np.sort(np.asarray(compacted.data.radius)[:n_valid])
    np.testing.assert_allclose(r_old, r_new)


def test_update_poses_moves_world_cache():
    world = default_world(seed=0)
    scan = render_scan(world, jnp.eye(4), CFG)
    state = sm.empty_map(MCFG)
    state, _ = ingest(state, scan, jnp.eye(4), 0)
    shift = lie.se3_exp(jnp.asarray([1.0, 2.0, 0.0, 0, 0, 0.1]))
    new_poses = state.poses.at[0].set(shift)
    moved = sm.update_poses(state, new_poses, MCFG)
    valid = np.asarray(state.data.valid)
    want = lie.transform_points(shift, state.data.position)
    np.testing.assert_allclose(np.asarray(moved.data.wpos)[valid],
                               np.asarray(want)[valid], atol=1e-5)


def test_index_map_identifies_nearest():
    world = default_world(seed=0)
    scan = render_scan(world, jnp.eye(4), CFG)
    state = sm.empty_map(MCFG)
    state, _ = ingest(state, scan, jnp.eye(4), 0)
    idx = sm.render_index_map(state, jnp.eye(4), CFG, MCFG)
    idx = np.asarray(idx)
    covered = idx >= 0
    assert covered.sum() > 500
    # the indexed surfel must project back to (approximately) that pixel
    ids = idx[covered]
    wpos = np.asarray(state.data.wpos)[ids]
    px, py, _, _ = (np.asarray(a) for a in sm._project_px(
        jnp.asarray(wpos), CFG))
    rows, cols = np.nonzero(covered)
    assert (np.abs(px - cols) <= 1).mean() > 0.99
    assert (np.abs(py - rows) <= 1).mean() > 0.99


@pytest.mark.slow
def test_fused_render_selection_vs_exact_two_pass():
    """The fused per-scan render selects winners on PRE-update geometry
    and winner-decrease-free confidence (surfel_map.fuse_and_render's
    documented approximation of the reference's two full rasterizations,
    gen_indexmap + render_surfels). Oracle: a true SECOND render over the
    post-update state (render_maps). The view must hold the whole local
    map — with an undersized view the two paths page different blocks and
    the comparison measures view overflow, not selection (measured 70%
    agreement undersized vs 99.2% full-map at 48x360).

    Measured at this class of operating point: ~99% valid-mask agreement;
    disagreeing pixels sit at depth discontinuities where either
    candidate is a legitimate surface (median |dv| = 0)."""
    import numpy as np
    from semantic_suma_tpu.config import (DataConfig, IcpConfig, MapConfig,
                                          SumaConfig)
    from semantic_suma_tpu.core.pipeline import SurfelSLAM, preprocess_scan
    from semantic_suma_tpu.io.simulation import SimulationReader

    d = DataConfig(width=240, height=32)
    mc = MapConfig(surfel_capacity=1 << 16, active_capacity=1 << 16,
                   max_poses=128)
    cfg = SumaConfig(data=d, model=d, icp=IcpConfig(max_iterations=8),
                     map=mc)
    n = 12
    reader = SimulationReader(cfg.data, n_scans=n + 1, radius=16.0,
                              step=1.2, noise_sigma=0.02, seed=6)
    slam = SurfelSLAM(cfg, enable_loop_closure=False)
    for i in range(n):
        s = reader.read(i)
        slam.process_scan(s.points, s.labels, s.probs, s.valid)

    s = reader.read(n)
    maps = preprocess_scan(jnp.asarray(s.points), jnp.asarray(s.labels),
                           jnp.asarray(s.probs), jnp.asarray(s.valid),
                           jnp.asarray(False), cfg)
    frame = sm.data_surfel_init(maps, cfg.data, cfg.map)
    pose = jnp.asarray(np.asarray(reader.poses)[n], jnp.float32)
    ts = slam.state.timestamp
    conf = jnp.asarray(slam.confidence_threshold(), jnp.float32)
    thr = jnp.asarray(int(ts) + 1 - cfg.loop.delta_timestamp, jnp.int32)
    state2, fused, _, _ = sm.fuse_and_render(
        slam.state.map, frame, pose, ts, cfg.data, cfg.map, conf, thr, True)
    exact = sm.render_maps(state2, pose, cfg.model, cfg.map, conf, thr,
                           render_old=False)

    fv = np.asarray(fused.vertex_valid)
    ev = np.asarray(exact.vertex_valid)
    agree = float((fv == ev).mean())
    assert agree > 0.97, agree
    # the one-extra-scan direction: fused may render winner-losers once
    # more; the exact pass must not see much the fused pass missed
    assert (ev & ~fv).sum() <= 0.01 * fv.size, (ev & ~fv).sum()
    both = fv & ev
    dd = np.linalg.norm(np.asarray(fused.vertex)
                        - np.asarray(exact.vertex), axis=-1)[both]
    assert float(np.median(dd)) < 1e-3
    # disagreeing pixels are depth-discontinuity candidate flips, bounded
    # in frequency
    assert float((dd > 0.05).mean()) < 0.15, float((dd > 0.05).mean())
