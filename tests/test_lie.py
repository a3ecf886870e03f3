"""SE(3)/SO(3) tests against closed-form numpy oracles.

Validates the same identities the reference relies on in
``src/core/lie_algebra.cpp`` (exp/log round trips, Strasdat closed forms).
"""
import numpy as np
import jax.numpy as jnp
import jax

from semantic_suma_tpu.utils import lie


def np_se3_exp(x):
    """Numpy oracle mirroring lie_algebra.cpp:4-34."""
    v, omega = np.asarray(x[:3], np.float64), np.asarray(x[3:], np.float64)
    theta = np.linalg.norm(omega)
    T = np.eye(4)
    if theta > 1e-10:
        K = np.array([[0, -omega[2], omega[1]],
                      [omega[2], 0, -omega[0]],
                      [-omega[1], omega[0], 0]])
        K2 = K @ K
        T[:3, :3] = np.eye(3) + np.sin(theta) / theta * K + \
            (1 - np.cos(theta)) / theta**2 * K2
        V = np.eye(3) + (1 - np.cos(theta)) / theta**2 * K + \
            (theta - np.sin(theta)) / theta**3 * K2
        T[:3, 3] = V @ v
    else:
        T[:3, 3] = v
    return T


def random_twists(n, scale=1.0, seed=0):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(n, 6)).astype(np.float32) * scale


def test_exp_matches_oracle():
    for x in random_twists(20, 0.5):
        got = np.asarray(lie.se3_exp(jnp.asarray(x)))
        want = np_se3_exp(x)
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_exp_small_angle():
    x = np.array([0.1, -0.2, 0.3, 1e-9, -1e-9, 1e-9], np.float32)
    got = np.asarray(lie.se3_exp(jnp.asarray(x)))
    want = np_se3_exp(x)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_log_exp_roundtrip():
    for x in random_twists(20, 0.8, seed=1):
        back = np.asarray(lie.se3_log(lie.se3_exp(jnp.asarray(x))))
        np.testing.assert_allclose(back, x, atol=2e-4)


def test_exp_log_roundtrip_matrix():
    for x in random_twists(10, 1.2, seed=2):
        T = lie.se3_exp(jnp.asarray(x))
        T2 = lie.se3_exp(lie.se3_log(T))
        np.testing.assert_allclose(np.asarray(T2), np.asarray(T), atol=2e-4)


def test_log_near_pi():
    axis = np.array([1.0, 0.0, 0.0])
    for theta in (np.pi - 1e-4, np.pi - 1e-6):
        x = np.concatenate([np.zeros(3), axis * theta]).astype(np.float32)
        T = np_se3_exp(x)
        got = np.asarray(lie.se3_log(jnp.asarray(T, jnp.float32)))
        np.testing.assert_allclose(got[3:], axis * theta, atol=1e-3)


def test_inverse():
    for x in random_twists(5, 0.7, seed=3):
        T = lie.se3_exp(jnp.asarray(x))
        eye = np.asarray(T @ lie.se3_inverse(T))
        np.testing.assert_allclose(eye, np.eye(4), atol=1e-5)


def test_batched_and_jit():
    xs = jnp.asarray(random_twists(8, 0.5, seed=4))
    batched = jax.jit(lie.se3_exp)(xs)
    assert batched.shape == (8, 4, 4)
    single = np.stack([np.asarray(lie.se3_exp(x)) for x in xs])
    np.testing.assert_allclose(np.asarray(batched), single, atol=1e-6)


def test_transform_points():
    T = lie.se3_exp(jnp.asarray([1.0, 2.0, 3.0, 0.1, 0.2, 0.3]))
    pts = jnp.asarray(np.random.default_rng(5).normal(size=(7, 3)), jnp.float32)
    got = lie.transform_points(T, pts)
    hom = np.concatenate([np.asarray(pts), np.ones((7, 1))], 1)
    want = (np.asarray(T) @ hom.T).T[:, :3]
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_rotation_angle_and_distance():
    x = np.array([0.0, 0, 0, 0, 0, 0.5], np.float32)
    T = lie.se3_exp(jnp.asarray(x))
    assert abs(float(lie.rotation_angle(T)) - 0.5) < 1e-5
    A = lie.se3_exp(jnp.asarray([1, 0, 0, 0, 0, 0], jnp.float32))
    B = lie.se3_exp(jnp.asarray([0, 2, 0, 0, 0, 0], jnp.float32))
    assert abs(float(lie.pose_distance(A, B)) - np.sqrt(5)) < 1e-5
