"""Pose-graph GN+PCG solver tests."""
import numpy as np
import jax.numpy as jnp

from semantic_suma_tpu.core.posegraph import Posegraph
from semantic_suma_tpu.utils import lie


def _exp(x):
    return np.asarray(lie.se3_exp(jnp.asarray(x, jnp.float32)))


def test_two_pose_chain():
    g = Posegraph()
    g.set_initial(0, np.eye(4))
    z = _exp([1.0, 0.0, 0.0, 0.0, 0.0, 0.1])
    g.set_initial(1, _exp([1.3, 0.2, 0.0, 0.0, 0.0, 0.0]))  # bad init
    g.add_edge(0, 1, z)
    err = g.optimize()
    np.testing.assert_allclose(g.pose(0), np.eye(4), atol=1e-3)
    np.testing.assert_allclose(g.pose(1), z, atol=1e-3)
    assert err < 1e-6


def test_loop_closure_distributes_drift():
    """A square trajectory with accumulated drift + one loop edge: the
    optimizer must spread the error and close the loop."""
    rng = np.random.default_rng(0)
    n = 40
    true_inc = _exp([1.0, 0, 0, 0, 0, 2 * np.pi / n])
    # noisy odometry
    g = Posegraph()
    g.set_initial(0, np.eye(4))
    truth = [np.eye(4)]
    est = [np.eye(4)]
    for i in range(1, n):
        truth.append(truth[-1] @ true_inc)
        noise = _exp(rng.normal(0, 0.01, 6) * [1, 1, 0.2, 0.1, 0.1, 1])
        meas = true_inc @ noise
        est.append(est[-1] @ meas)
        g.set_initial(i, est[-1])
        g.add_edge(i - 1, i, meas)
    # loop edge: pose n-1 is one step before pose 0
    g.add_edge(n - 1, 0, np.linalg.inv(truth[-1]) @ truth[0],
               np.full(6, 100.0, np.float32))

    drift_before = np.linalg.norm(
        (np.linalg.inv(g.pose(n - 1)) @ truth[-1])[:3, 3])
    g.optimize(max_iterations=15)
    drift_after = np.linalg.norm(
        (np.linalg.inv(g.pose(n - 1)) @ truth[-1])[:3, 3])
    # loop must be (nearly) closed and overall drift reduced
    closure = np.linalg.norm(
        (np.linalg.inv(g.pose(n - 1) @ np.linalg.inv(truth[-1]) @ truth[0])
         @ g.pose(0))[:3, 3])
    assert drift_after < 0.5 * drift_before or drift_before < 0.05
    assert closure < 0.1


def test_prior_anchors_first_pose():
    g = Posegraph()
    g.set_initial(0, np.eye(4))
    g.set_initial(1, _exp([2.0, 0, 0, 0, 0, 0]))
    g.add_edge(0, 1, _exp([1.0, 0, 0, 0, 0, 0]))
    g.optimize()
    # pose 0 pinned by the prior; pose 1 moves to satisfy the edge
    np.testing.assert_allclose(g.pose(0), np.eye(4), atol=1e-3)
    np.testing.assert_allclose(g.pose(1)[:3, 3], [1.0, 0, 0], atol=1e-3)


def test_empty_and_trivial():
    g = Posegraph()
    assert g.optimize() == 0.0
    g.set_initial(0, np.eye(4))
    assert g.optimize() == 0.0
