"""Checkpoint/resume: a resumed session must continue identically."""
import numpy as np
import jax.numpy as jnp

from semantic_suma_tpu.config import (DataConfig, IcpConfig, MapConfig,
                                      SumaConfig)
from semantic_suma_tpu.core.pipeline import SurfelSLAM
from semantic_suma_tpu.io.simulation import SimulationReader
from semantic_suma_tpu.utils.checkpoint import load_checkpoint, save_checkpoint


def cfg_small():
    d = DataConfig(width=120, height=24)
    return SumaConfig(data=d, model=d, icp=IcpConfig(max_iterations=8),
                      map=MapConfig(surfel_capacity=1 << 15,
                                    active_capacity=1 << 13, max_poses=128))


def test_checkpoint_roundtrip_and_continue(tmp_path):
    cfg = cfg_small()
    reader = SimulationReader(cfg.data, n_scans=60, radius=18.0)

    slam = SurfelSLAM(cfg, enable_loop_closure=False)
    for i in range(6):
        s = reader.read(i)
        slam.process_scan(s.points, s.labels, s.probs, s.valid)

    ckpt = str(tmp_path / "session.npz")
    save_checkpoint(slam, ckpt, compact_map=False)

    resumed = load_checkpoint(ckpt, cfg, enable_loop_closure=False)
    assert len(resumed.poses) == 6
    np.testing.assert_allclose(resumed.poses[-1], slam.poses[-1], atol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(resumed.state.map.data.valid),
        np.asarray(slam.state.map.data.valid))

    # continuing both sessions must produce identical poses
    for i in range(6, 9):
        s = reader.read(i)
        slam.process_scan(s.points, s.labels, s.probs, s.valid)
        resumed.process_scan(s.points, s.labels, s.probs, s.valid)
    np.testing.assert_allclose(resumed.poses[-1], slam.poses[-1], atol=1e-5)
    assert int(resumed.state.map.count) == int(slam.state.map.count)


def test_checkpoint_compacted(tmp_path):
    cfg = cfg_small()
    reader = SimulationReader(cfg.data, n_scans=60)
    slam = SurfelSLAM(cfg, enable_loop_closure=False)
    for i in range(3):
        s = reader.read(i)
        slam.process_scan(s.points, s.labels, s.probs, s.valid)
    ckpt = str(tmp_path / "c.npz")
    save_checkpoint(slam, ckpt, compact_map=True)
    resumed = load_checkpoint(ckpt, cfg, enable_loop_closure=False)
    v = np.asarray(resumed.state.map.data.valid)
    n = int(resumed.state.map.count)
    assert v[:n].all() and not v[n:].any()
