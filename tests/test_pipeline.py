"""End-to-end SLAM pipeline tests on the synthetic world."""
import numpy as np
import jax.numpy as jnp

from semantic_suma_tpu.config import (DataConfig, IcpConfig, MapConfig,
                                      SumaConfig)
from semantic_suma_tpu.core.pipeline import SurfelSLAM
from semantic_suma_tpu.io.simulation import SimulationReader


def small_cfg(**kw):
    d = DataConfig(width=180, height=32)
    return SumaConfig(
        data=d, model=d,
        icp=IcpConfig(max_iterations=15),
        map=MapConfig(surfel_capacity=1 << 17, active_capacity=1 << 15,
                      max_poses=256),
        **kw)


def ate_rmse(est, gt):
    """Translation ATE after aligning first poses."""
    rel = np.linalg.inv(gt[0]) @ gt
    est_rel = np.linalg.inv(est[0]) @ est
    d = est_rel[:, :3, 3] - rel[:, :3, 3]
    return float(np.sqrt((d ** 2).sum(-1).mean()))


def run_slam(cfg, n_scans=25, enable_loops=False, radius=18.0):
    reader = SimulationReader(cfg.data, n_scans=max(n_scans, 60),
                              radius=radius)
    slam = SurfelSLAM(cfg, enable_loop_closure=enable_loops)
    gt = []
    for i in range(n_scans):
        scan = reader.read(i)
        slam.process_scan(scan.points, scan.labels, scan.probs, scan.valid)
        gt.append(np.asarray(reader.gt_pose(i)))
    return slam, np.stack(gt)


def test_frame_to_model_odometry():
    slam, gt = run_slam(small_cfg(approach="frame-to-model"), n_scans=25)
    est = slam.trajectory()
    err = ate_rmse(est, gt)
    assert err < 0.35, err
    assert slam.track_loss_count <= 2
    # map grows but stays bounded by association
    assert 500 < slam.statistics[-1]["map-count"] < (1 << 17)


def test_frame_to_frame_odometry():
    slam, gt = run_slam(small_cfg(approach="frame-to-frame"), n_scans=15)
    err = ate_rmse(slam.trajectory(), gt)
    assert err < 0.35, err


def test_geometric_only():
    cfg = small_cfg(approach="frame-to-model")
    cfg = cfg.replace(semantic=cfg.semantic.__class__(enabled=False))
    slam, gt = run_slam(cfg, n_scans=15)
    err = ate_rmse(slam.trajectory(), gt)
    assert err < 0.35, err


def test_statistics_exported():
    slam, _ = run_slam(small_cfg(), n_scans=3)
    s = slam.statistics[-1]
    for key in ("icp-iterations", "icp-error", "icp-inlier", "map-count",
                "complete-time"):
        assert key in s
    assert s["icp-iterations"] >= 1


def test_odometry_run_matches_per_step():
    """The lax.scan chunk entry (odometry_run) must reproduce the per-step
    dispatch path exactly."""
    import jax.numpy as jnp
    from semantic_suma_tpu.core.pipeline import (init_state, odometry_run,
                                                 odometry_step)
    cfg = small_cfg()
    reader = SimulationReader(cfg.data, n_scans=4, radius=18.0)
    scans = [reader.read(i) for i in range(4)]

    st_a = init_state(cfg)
    ct = jnp.asarray(0.0, jnp.float32)
    poses = []
    for s in scans:
        st_a, info = odometry_step(st_a, s.points, s.labels, s.probs,
                                   s.valid, ct, cfg)
        poses.append(np.asarray(info.pose))

    st_b = init_state(cfg)
    stk = lambda f: jnp.stack([f(s) for s in scans])
    st_b, infos = odometry_run(
        st_b, stk(lambda s: s.points), stk(lambda s: s.labels),
        stk(lambda s: s.probs), stk(lambda s: s.valid),
        jnp.zeros((4,), jnp.float32), cfg)
    np.testing.assert_allclose(np.asarray(infos.pose), np.stack(poses),
                               atol=1e-6)
    assert int(st_b.map.count) == int(st_a.map.count)


def test_async_chunked_matches_sync():
    """The pipelined + chunked driver (process_scan_async, chunk_size>1)
    must produce the same trajectory and per-scan statistics as the fully
    synchronous driver — chunking/pipelining changes WHEN the host learns
    results, never the results."""
    cfg = small_cfg()
    reader = SimulationReader(cfg.data, n_scans=14, radius=18.0)
    scans = [reader.read(i) for i in range(14)]

    sync = SurfelSLAM(cfg, enable_loop_closure=False)
    for s in scans:
        sync.process_scan(s.points, s.labels, s.probs, s.valid)

    for chunk in (1, 4):
        slam = SurfelSLAM(cfg, enable_loop_closure=False,
                          pipeline_depth=3, chunk_size=chunk)
        for s in scans:
            slam.process_scan_async(s.points, s.labels, s.probs, s.valid)
        slam.flush()
        assert len(slam.poses) == 14
        np.testing.assert_allclose(np.stack(slam.poses),
                                   np.stack(sync.poses), atol=1e-5)
        assert [st["map-count"] for st in slam.statistics] == \
            [st["map-count"] for st in sync.statistics]


def test_variable_size_scans_bucketed():
    """Variable point counts (real KITTI) pad to the bucket granule with a
    validity mask; results must match feeding the unpadded scan."""
    import jax.numpy as jnp
    cfg = small_cfg()
    reader = SimulationReader(cfg.data, n_scans=6, radius=18.0)
    slam_a = SurfelSLAM(cfg, enable_loop_closure=False)
    slam_b = SurfelSLAM(cfg, enable_loop_closure=False)
    for i in range(6):
        s = reader.read(i)
        # drop a different number of trailing points each scan
        n = s.points.shape[0] - 17 * (i + 1)
        slam_a.process_scan(np.asarray(s.points)[:n],
                            np.asarray(s.labels)[:n],
                            np.asarray(s.probs)[:n],
                            np.asarray(s.valid)[:n])
        full_valid = np.asarray(s.valid).copy()
        full_valid[n:] = False
        slam_b.process_scan(s.points, s.labels, s.probs, full_valid)
    np.testing.assert_allclose(np.stack(slam_a.poses),
                               np.stack(slam_b.poses), atol=1e-4)
