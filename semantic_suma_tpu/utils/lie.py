"""SE(3)/SO(3) Lie-group operations in JAX.

TPU-native re-implementation of the math in
``/root/reference/src/core/lie_algebra.cpp`` (Strasdat closed forms): exp/log
maps used by the Gauss-Newton ICP (left-multiplicative increments,
``/root/reference/src/core/Objective.h:45-48``) and the pose graph.

Everything is branch-free (``jnp.where`` with Taylor fallbacks near theta=0 so
the ops are jit/vmap/grad-safe) and batched via vmap. Twist convention matches
the reference: ``x = [v (translation); omega (rotation)]``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def hat(omega: jnp.ndarray) -> jnp.ndarray:
    """so(3) hat operator: [3] -> [3,3] skew-symmetric matrix."""
    ox, oy, oz = omega[..., 0], omega[..., 1], omega[..., 2]
    zero = jnp.zeros_like(ox)
    return jnp.stack(
        [
            jnp.stack([zero, -oz, oy], -1),
            jnp.stack([oz, zero, -ox], -1),
            jnp.stack([-oy, ox, zero], -1),
        ],
        -2,
    )


def vee(m: jnp.ndarray) -> jnp.ndarray:
    """Inverse of hat: [3,3] -> [3]."""
    return jnp.stack([m[..., 2, 1], m[..., 0, 2], m[..., 1, 0]], -1)


def so3_exp(omega: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues formula with Taylor fallback: [...,3] -> [...,3,3]."""
    theta2 = jnp.sum(omega * omega, -1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    small = theta2 < _EPS
    # sin(t)/t and (1-cos t)/t^2 with series fallbacks
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    k = hat(omega)
    k2 = k @ k
    eye = jnp.broadcast_to(jnp.eye(3, dtype=omega.dtype), k.shape)
    return eye + a[..., None, None] * k + b[..., None, None] * k2


def so3_log(r: jnp.ndarray) -> jnp.ndarray:
    """SO(3) log: [...,3,3] -> [...,3] (angle-axis * angle).

    Matches SE3::log's rotation part (lie_algebra.cpp:44-53); safe at both
    theta ~ 0 and theta ~ pi (where the antisymmetric-part formula degenerates
    we fall back to the symmetric extraction of the axis).
    """
    trace = r[..., 0, 0] + r[..., 1, 1] + r[..., 2, 2]
    # clip strictly inside (-1, 1): arccos' diverges at the endpoints and
    # would poison autodiff (the pose-graph solver differentiates through
    # this); at theta ~ 0 the output is w-dominated and unaffected.
    cos_t = jnp.clip(0.5 * (trace - 1.0), -1.0 + 1e-7, 1.0 - 1e-7)
    theta = jnp.arccos(cos_t)
    sin_t = jnp.sin(theta)

    w = vee(r - jnp.swapaxes(r, -1, -2))  # = 2 sin(theta) * axis
    # generic: theta / (2 sin theta) * w
    scale = jnp.where(jnp.abs(sin_t) < 1e-5, 0.5 + theta * theta / 12.0,
                      theta / (2.0 * jnp.where(jnp.abs(sin_t) < 1e-5, 1.0, sin_t)))
    generic = scale * w

    # near pi: axis from diagonal of (R + I)/2 = axis axis^T (1-cos) + ...
    # R + I = 2 axis axis^T (at theta = pi exactly)
    rp = r + jnp.eye(3, dtype=r.dtype)
    diag = jnp.stack([rp[..., 0, 0], rp[..., 1, 1], rp[..., 2, 2]], -1)
    k = jnp.argmax(diag, axis=-1)
    col = jnp.take_along_axis(rp, k[..., None, None].repeat(3, -2), axis=-1)[..., 0]
    axis = col / (jnp.linalg.norm(col, axis=-1, keepdims=True) + _EPS)
    # fix sign so that it is consistent with the antisymmetric part
    sign = jnp.where(jnp.sum(axis * w, -1, keepdims=True) < 0, -1.0, 1.0)
    near_pi = (theta > jnp.pi - 1e-3)[..., None]
    return jnp.where(near_pi, sign * axis * theta[..., None], generic)


def _v_matrix(omega: jnp.ndarray) -> jnp.ndarray:
    """Left Jacobian V of SE(3) exp (translation coupling)."""
    theta2 = jnp.sum(omega * omega, -1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    small = theta2 < _EPS
    gamma = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    delta = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0,
                      (theta - jnp.sin(theta)) / (theta2 * theta))
    k = hat(omega)
    k2 = k @ k
    eye = jnp.broadcast_to(jnp.eye(3, dtype=omega.dtype), k.shape)
    return eye + gamma[..., None, None] * k + delta[..., None, None] * k2


def _v_inv_matrix(omega: jnp.ndarray) -> jnp.ndarray:
    """Inverse of the left Jacobian (lie_algebra.cpp:60-66)."""
    theta2 = jnp.sum(omega * omega, -1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    small = theta2 < _EPS
    half = 0.5 * theta
    # beta = 1/t^2 (1 - t cos(t/2) / (2 sin(t/2)))
    cot_term = jnp.where(small, 1.0 / 12.0 + theta2 / 720.0,
                         (1.0 - half * jnp.cos(half) / jnp.where(
                             small, 1.0, jnp.sin(half))) / jnp.where(small, 1.0, theta2))
    k = hat(omega)
    k2 = k @ k
    eye = jnp.broadcast_to(jnp.eye(3, dtype=omega.dtype), k.shape)
    return eye - 0.5 * k + cot_term[..., None, None] * k2


def se3_exp(x: jnp.ndarray) -> jnp.ndarray:
    """SE(3) exponential map: twist [...,6] = [v, omega] -> [...,4,4]."""
    v, omega = x[..., :3], x[..., 3:]
    r = so3_exp(omega)
    t = jnp.einsum("...ij,...j->...i", _v_matrix(omega), v)
    return rt_to_mat(r, t)


def se3_log(m: jnp.ndarray) -> jnp.ndarray:
    """SE(3) logarithm: [...,4,4] -> twist [...,6] = [v, omega]."""
    r = m[..., :3, :3]
    t = m[..., :3, 3]
    omega = so3_log(r)
    v = jnp.einsum("...ij,...j->...i", _v_inv_matrix(omega), t)
    return jnp.concatenate([v, omega], -1)


def rt_to_mat(r: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Assemble [...,4,4] from rotation [...,3,3] and translation [...,3]."""
    batch = jnp.broadcast_shapes(r.shape[:-2], t.shape[:-1])
    r = jnp.broadcast_to(r, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([r, t[..., None]], -1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=r.dtype), batch + (4,)
    )[..., None, :]
    return jnp.concatenate([top, bottom], -2)


def se3_inverse(m: jnp.ndarray) -> jnp.ndarray:
    """Fast inverse of a rigid transform."""
    r = m[..., :3, :3]
    t = m[..., :3, 3]
    rt = jnp.swapaxes(r, -1, -2)
    return rt_to_mat(rt, -jnp.einsum("...ij,...j->...i", rt, t))


def transform_points(m: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply [...,4,4] to points [...,N,3] (or [...,3])."""
    return jnp.einsum("...ij,...nj->...ni", m[..., :3, :3],
                      jnp.atleast_2d(pts)) + m[..., None, :3, 3]


def transform_normals(m: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Rotate normals (assumes rigid transform, as the reference does)."""
    return jnp.einsum("...ij,...nj->...ni", m[..., :3, :3], jnp.atleast_2d(n))


def pose_distance(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Euclidean translation distance (SurfelMapping::pose_distance)."""
    return jnp.linalg.norm(a[..., :3, 3] - b[..., :3, 3], axis=-1)


def rotation_angle(m: jnp.ndarray) -> jnp.ndarray:
    """Rotation angle of a transform (SurfelMapping.cpp:440-442)."""
    tr = m[..., 0, 0] + m[..., 1, 1] + m[..., 2, 2]
    return jnp.arccos(jnp.clip(0.5 * (tr - 1.0), -1.0, 1.0))


def orthonormalize(m: jnp.ndarray) -> jnp.ndarray:
    """Project the rotation block back onto SO(3) via SVD (drift cleanup)."""
    r = m[..., :3, :3]
    u, _, vt = jnp.linalg.svd(r)
    det = jnp.linalg.det(u @ vt)
    fix = jnp.concatenate(
        [jnp.ones(det.shape + (2,), m.dtype), det[..., None]], -1)
    r_fixed = (u * fix[..., None, :]) @ vt
    return rt_to_mat(r_fixed, m[..., :3, 3])
