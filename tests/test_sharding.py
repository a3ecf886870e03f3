"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semantic_suma_tpu.config import (DataConfig, IcpConfig, MapConfig,
                                      SumaConfig)
from semantic_suma_tpu.core import surfel_map as sm
from semantic_suma_tpu.io.simulation import SimulationReader
from semantic_suma_tpu.models import rangenet as rn
from semantic_suma_tpu.models.segmenter import create_train_state
from semantic_suma_tpu.parallel import sharding as sh
from semantic_suma_tpu.utils import lie

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def small_cfg():
    d = DataConfig(width=128, height=32)
    return SumaConfig(
        data=d, model=d, icp=IcpConfig(max_iterations=10),
        map=MapConfig(surfel_capacity=1 << 14, active_capacity=1 << 13,
                      max_poses=64))


def test_sharded_step_runs_and_tracks():
    cfg = small_cfg()
    mesh = sh.make_mesh(8)
    step = sh.make_sharded_step(cfg, mesh)
    reader = SimulationReader(cfg.data, n_scans=60, radius=18.0)

    state = sm.empty_map(cfg.map)
    block = state.data
    count = jnp.zeros((), jnp.int32)
    poses = state.poses
    pose = jnp.eye(4, dtype=jnp.float32)
    inc = jnp.eye(4, dtype=jnp.float32)

    est = [np.eye(4)]
    with mesh:
        for t in range(5):
            scan = reader.read(t)
            block, count, poses, pose, inc, info = step(
                block, count, poses, pose, inc, jnp.asarray(t, jnp.int32),
                scan.points, scan.labels, scan.probs, scan.valid,
                jnp.asarray(-2.0, jnp.float32))
            est.append(np.asarray(pose))
    assert int(info["count"]) > 500
    # trajectory should track ground truth reasonably on clean data
    gt = np.asarray(reader.gt_pose(4)) @ np.linalg.inv(
        np.asarray(reader.gt_pose(0)))
    rel = np.linalg.inv(np.asarray(reader.gt_pose(0))) @ np.asarray(
        reader.gt_pose(4))
    err = np.linalg.norm(est[5][:3, 3] - rel[:3, 3])
    assert err < 0.5, err


def test_sharded_matches_single_device_icp():
    """The psum-reduced distributed GN must agree with the single-device
    pipeline increment on the same data."""
    from semantic_suma_tpu.core.pipeline import SurfelSLAM

    cfg = small_cfg()
    reader = SimulationReader(cfg.data, n_scans=60, radius=18.0)

    # single device reference
    slam = SurfelSLAM(cfg, enable_loop_closure=False)
    for t in range(4):
        scan = reader.read(t)
        slam.process_scan(scan.points, scan.labels, scan.probs, scan.valid)
    ref_poses = slam.trajectory()

    # sharded
    mesh = sh.make_mesh(8)
    step = sh.make_sharded_step(cfg, mesh)
    state = sm.empty_map(cfg.map)
    block, count, poses = state.data, jnp.zeros((), jnp.int32), state.poses
    pose = jnp.eye(4, dtype=jnp.float32)
    inc = jnp.eye(4, dtype=jnp.float32)
    with mesh:
        for t in range(4):
            scan = reader.read(t)
            block, count, poses, pose, inc, info = step(
                block, count, poses, pose, inc, jnp.asarray(t, jnp.int32),
                scan.points, scan.labels, scan.probs, scan.valid,
                jnp.asarray(slam.cfg.map.log_unstable, jnp.float32))
    # compare final positions: same algorithm, different reduction order ->
    # small numerical differences only
    err = np.linalg.norm(np.asarray(pose)[:3, 3] - ref_poses[-1][:3, 3])
    assert err < 0.1, err


def test_sharded_train_step():
    mesh = sh.make_2d_mesh(4, 2)
    model = rn.small_rangenet()
    tx, state = create_train_state(model, jax.random.PRNGKey(0),
                                   (1, 16, 64, 5))
    step = sh.make_sharded_train_step(model, tx, mesh)
    state = sh.shard_train_state(state, mesh)
    images = jnp.zeros((8, 16, 64, 5))
    labels = jnp.zeros((8, 16, 64), jnp.int32)
    valid = jnp.ones((8, 16, 64), bool)
    with mesh:
        state2, metrics = step(state, images, labels, valid)
    assert int(state2.step) == 1
    assert np.isfinite(float(metrics["loss"]))
