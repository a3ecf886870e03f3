"""Offline visualization artifact tests."""
import os

import numpy as np

from semantic_suma_tpu.utils import viz


def test_plot_trajectory_and_stats(tmp_path):
    n = 30
    est = np.tile(np.eye(4), (n, 1, 1))
    est[:, 0, 3] = np.arange(n)
    gt = est.copy()
    p1 = str(tmp_path / "traj.png")
    viz.plot_trajectory(est, gt, [5, 10], p1)
    assert os.path.getsize(p1) > 1000
    stats = [{"icp-iterations": i % 7, "icp-error": 1.0 / (i + 1),
              "map-count": 100 * i, "complete-time": 0.1} for i in range(n)]
    p2 = str(tmp_path / "stats.png")
    viz.plot_statistics(stats, path=p2)
    assert os.path.getsize(p2) > 1000


def test_save_map_images(tmp_path):
    import jax.numpy as jnp
    from semantic_suma_tpu.ops.icp import Maps
    h, w = 16, 64
    maps = Maps(vertex=jnp.ones((h, w, 3)), normal=jnp.ones((h, w, 3)),
                vertex_valid=jnp.ones((h, w), bool),
                normal_valid=jnp.ones((h, w), bool),
                sem_label=jnp.full((h, w), 40, jnp.int32),
                sem_prob=jnp.ones((h, w)))
    out = viz.save_map_images(maps, prefix=str(tmp_path / "f"))
    assert len(out) == 3
    for p in out:
        assert os.path.getsize(p) > 500
