"""Frame-to-model projective ICP: fused Jacobian products + Gauss-Newton loop.

TPU-native redesign of the reference's hot kernel
(``/root/reference/src/shader/Frame2Model_jacobians.geom`` +
``/root/reference/src/core/Frame2Model.cpp`` +
``/root/reference/src/core/LieGaussNewton.cpp``):

* The reference accumulates JtJ/Jtf by additive framebuffer blending and
  downloads a 2x8 texture to the CPU **every GN iteration** (33 round trips
  per scan, ``Frame2Model.cpp:211-227``). Here the residual/Jacobian rows are
  materialized as a ``[P, 8]`` matrix and reduced with a single ``AᵀA``
  matmul on the MXU; the entire Gauss-Newton iteration — including the 6x6
  solve and the SE(3) increment — runs inside one ``lax.while_loop`` under
  ``jit``, so a whole ICP alignment is one device launch with zero host
  synchronization.

* Gating, robust weighting (huber/turkey) and the semantic-consistency
  weight (movable-class model labels scale the weight by ``p`` on label
  agreement and ``1-p`` on mismatch, ``Frame2Model_jacobians.geom:143-158``)
  are branch-free elementwise ops fused by XLA into the row build.

Twist convention: ``x = [v, omega]``, increment applied on the left:
``pose <- exp(x) @ pose`` (reference ``Objective.h:45-48``).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import DataConfig, IcpConfig
from ..models.labels import is_movable
from ..utils import lie
from .projection import INV_PI


class Maps(NamedTuple):
    """Dense per-frame maps (the TPU analogue of the reference's ``Frame``
    RGBA textures, ``/root/reference/src/core/Frame.h:66-78``)."""

    vertex: jnp.ndarray     # [H, W, 3]
    normal: jnp.ndarray     # [H, W, 3]
    vertex_valid: jnp.ndarray  # [H, W] bool
    normal_valid: jnp.ndarray  # [H, W] bool
    sem_label: jnp.ndarray  # [H, W] int32
    sem_prob: jnp.ndarray   # [H, W] float32

    @property
    def valid(self):
        return self.vertex_valid & self.normal_valid


class IcpStats(NamedTuple):
    """Diagnostics matching the reference decode (Frame2Model.cpp:211-227)."""

    error: jnp.ndarray            # F = sum of weighted squared residuals
    valid: jnp.ndarray            # terms entering the cost (inlier+outlier)
    inlier: jnp.ndarray
    outlier: jnp.ndarray
    inlier_residual: jnp.ndarray  # sum weighted r^2 over inliers
    invalid: jnp.ndarray          # data pixels with no model association


class IcpResult(NamedTuple):
    pose: jnp.ndarray         # [4,4] final increment estimate
    stats: IcpStats           # stats at the last evaluated linearization
    iterations: jnp.ndarray   # int32


def _pack_model_image(model: Maps) -> jnp.ndarray:
    """Loop-invariant flat model image [H*W, 8]: vertex 0:3, normal 3:6,
    valid 6, label 7. Built ONCE per alignment so each GN iteration pays a
    single 4-tap flat row gather (TPU row gathers from a flat [HW, 8] array
    measure ~2x faster than 2D [H, W, C] advanced indexing)."""
    h, w = model.vertex.shape[:2]
    return jnp.concatenate([
        model.vertex.reshape(-1, 3),
        model.normal.reshape(-1, 3),
        model.valid.reshape(-1, 1).astype(jnp.float32),
        model.sem_label.reshape(-1, 1).astype(jnp.float32),
    ], axis=-1)


def _sample_model(model_img: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray,
                  h: int, w: int, bilinear: bool):
    """Sample (v_m, n_m, m_valid, m_label) at continuous coords from the
    packed flat image. Bilinear over geometry (4 flat taps, horizontal wrap,
    vertical clamp), nearest-tap for the label — all from the same gathers."""
    if not bilinear:
        xi = jnp.clip(u.astype(jnp.int32), 0, w - 1)
        yi = jnp.clip(v.astype(jnp.int32), 0, h - 1)
        g = model_img[yi * w + xi]
        n_m = g[..., 3:6]
        n_m = n_m / jnp.maximum(
            jnp.linalg.norm(n_m, axis=-1, keepdims=True), 1e-12)
        return g[..., 0:3], n_m, g[..., 6] > 0.5, g[..., 7].astype(jnp.int32)
    xf = u - 0.5
    yf = v - 0.5
    x0 = jnp.floor(xf)
    y0 = jnp.floor(yf)
    ax = (xf - x0)[..., None]
    ay = (yf - y0)[..., None]
    x0i = jnp.mod(x0.astype(jnp.int32), w)
    x1i = jnp.mod(x0i + 1, w)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0i + 1, 0, h - 1)
    g00 = model_img[y0i * w + x0i]
    g10 = model_img[y0i * w + x1i]
    g01 = model_img[y1i * w + x0i]
    g11 = model_img[y1i * w + x1i]
    top = g00 * (1 - ax) + g10 * ax
    bot = g01 * (1 - ax) + g11 * ax
    samp = top * (1 - ay) + bot * ay
    v_m = samp[..., 0:3]
    n_m_raw = samp[..., 3:6]
    m_valid = samp[..., 6] > 0.999  # all 4 taps valid
    n_m = n_m_raw / jnp.maximum(
        jnp.linalg.norm(n_m_raw, axis=-1, keepdims=True), 1e-12)
    # nearest-tap label (bilinearly blending class ids is meaningless)
    right = ax[..., 0] > 0.5
    down = ay[..., 0] > 0.5
    lab_top = jnp.where(right, g10[..., 7], g00[..., 7])
    lab_bot = jnp.where(right, g11[..., 7], g01[..., 7])
    m_label = jnp.where(down, lab_bot, lab_top).astype(jnp.int32)
    return v_m, n_m, m_valid, m_label


def _project_to_model(pts: jnp.ndarray, model_cfg: DataConfig):
    """Continuous model-image coords (Frame2Model_jacobians.geom:53-65)."""
    x, y, z = pts[..., 0], pts[..., 1], pts[..., 2]
    depth = jnp.sqrt(x * x + y * y + z * z)
    yaw = jnp.arctan2(y, x)
    pitch = -jnp.arcsin(jnp.clip(z / jnp.maximum(depth, 1e-12), -1.0, 1.0))
    u = 0.5 * (-yaw * INV_PI + 1.0) * model_cfg.width
    v = (1.0 - (jnp.degrees(pitch) + model_cfg.fov_up) / model_cfg.fov) * model_cfg.height
    return u, v


def build_rows(pose: jnp.ndarray, data: Maps, model: Maps,
               icp: IcpConfig, model_cfg: DataConfig,
               iteration: jnp.ndarray,
               semantic: bool = True,
               bilinear: bool | None = None,
               model_img: jnp.ndarray | None = None):
    """Compute weighted Jacobian rows A [P, 8] and per-pixel stats.

    Row layout: cols 0:3 = sqrt(w)*n_m, 3:6 = sqrt(w)*(v_d x n_m),
    col 6 = sqrt(w)*r. Then AᵀA[0:6,0:6] = JᵀWJ and AᵀA[0:6,6] = JᵀWf.

    ``model_img`` (from :func:`_pack_model_image`) is loop-invariant across
    GN iterations; pass it to avoid rebuilding it per linearization.
    """
    if bilinear is None:
        bilinear = icp.sampling == "bilinear"
    h, w = data.vertex.shape[:2]
    p = h * w
    v_data = data.vertex.reshape(p, 3)
    n_data = data.normal.reshape(p, 3)
    d_valid = (data.vertex_valid & data.normal_valid).reshape(p)

    # transform into model frame by current increment estimate
    r = pose[:3, :3]
    t = pose[:3, 3]
    v_d = v_data @ r.T + t
    n_d = n_data @ r.T

    u, v = _project_to_model(v_d, model_cfg)
    inside = (u >= 0) & (u < model_cfg.width) & (v >= 0) & (v < model_cfg.height)

    if model_img is None:
        model_img = _pack_model_image(model)
    v_m, n_m, m_valid, m_label = _sample_model(
        model_img, u, v, model_cfg.height, model_cfg.width, bilinear)

    assoc = d_valid & inside & m_valid  # both measurement and model valid

    diff = v_d - v_m
    residual = jnp.sum(n_m * diff, axis=-1)
    dist = jnp.linalg.norm(diff, axis=-1)
    ndot = jnp.sum(n_m * n_d, axis=-1)

    angle_thresh = jnp.cos(jnp.radians(icp.max_angle))
    inlier = assoc & (dist <= icp.max_distance) & (ndot >= angle_thresh)

    # robust weight
    absr = jnp.abs(residual)
    if icp.weighting == "huber":
        weight = jnp.where(absr > icp.factor, icp.factor / jnp.maximum(absr, 1e-12), 1.0)
    elif icp.weighting == "turkey":
        alpha = residual / icp.factor
        turkey = jnp.square(1.0 - alpha * alpha)
        weight = jnp.where(absr > icp.factor, 0.0,
                           jnp.where(iteration > 0, turkey, 1.0))
    else:
        weight = jnp.ones_like(residual)

    if semantic:
        d_label = data.sem_label.reshape(p)
        d_prob = data.sem_prob.reshape(p)
        movable = is_movable(m_label)
        agree = d_label == m_label
        sem_w = jnp.where(movable, jnp.where(agree, d_prob, 1.0 - d_prob), 1.0)
        weight = weight * sem_w

    cp = jnp.cross(v_d, n_m)
    sw = jnp.sqrt(jnp.maximum(weight, 0.0))
    row_mask = inlier.astype(jnp.float32)[:, None]
    rows = jnp.concatenate(
        [sw[:, None] * n_m, sw[:, None] * cp,
         (sw * residual)[:, None], jnp.zeros((p, 1), jnp.float32)],
        axis=-1) * row_mask

    wr2 = weight * residual * residual
    stats = IcpStats(
        error=jnp.sum(jnp.where(assoc, wr2, 0.0)),
        valid=jnp.sum(assoc).astype(jnp.int32),
        inlier=jnp.sum(inlier).astype(jnp.int32),
        outlier=jnp.sum(assoc & ~inlier).astype(jnp.int32),
        inlier_residual=jnp.sum(jnp.where(inlier, wr2, 0.0)),
        invalid=jnp.sum(d_valid & ~assoc).astype(jnp.int32),
    )
    return rows, stats


@partial(jax.jit, static_argnames=("icp", "model_cfg", "semantic", "bilinear"))
def jacobian_products(pose: jnp.ndarray, data: Maps, model: Maps,
                      icp: IcpConfig, model_cfg: DataConfig,
                      iteration=0, semantic: bool = True,
                      bilinear: bool | None = None):
    """One linearization: (JᵀWJ [6,6], JᵀWf [6], stats) via a single MXU matmul."""
    rows, stats = build_rows(pose, data, model, icp, model_cfg,
                             jnp.asarray(iteration), semantic, bilinear)
    ata = jnp.dot(rows.T, rows, preferred_element_type=jnp.float32)
    return ata[:6, :6], ata[:6, 6], stats


def _solve_spd(jtj: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
    """6x6 SPD solve (the reference uses LDLᵀ; Cholesky with a tiny Tikhonov
    floor keeps it robust in f32)."""
    a = jtj + 1e-8 * jnp.eye(6, dtype=jtj.dtype) * jnp.maximum(
        jnp.trace(jtj) / 6.0, 1.0)
    chol = jax.scipy.linalg.cho_factor(a, lower=True)
    return jax.scipy.linalg.cho_solve(chol, rhs)


@partial(jax.jit, static_argnames=("icp", "model_cfg", "semantic", "bilinear",
                                   "max_iterations", "axis"))
def gauss_newton(data: Maps, model: Maps, t0: jnp.ndarray,
                 icp: IcpConfig, model_cfg: DataConfig,
                 semantic: bool = True, bilinear: bool | None = None,
                 max_iterations: int | None = None,
                 axis: str | None = None) -> IcpResult:
    """Full Gauss-Newton alignment inside one jitted while_loop.

    Stopping criteria mirror LieGaussNewton.cpp:58-66: minimal step
    (||δ||_inf < delta), vanishing gradient, or converged error change —
    checked after applying the increment, like the reference.

    ``axis``: when called inside ``shard_map`` with ``data`` holding only
    this device's slice of the range-image rows, the per-device partial
    JᵀWJ/JᵀWf products and stats are combined with one ``psum`` per
    iteration — the collective analogue of the reference's additive-blend
    reduction (Frame2Model.cpp:189-197). The solve and increment are then
    computed redundantly (replicated) on every device.
    """
    max_iter = icp.max_iterations if max_iterations is None else max_iterations
    model_img = _pack_model_image(model)  # hoisted out of the GN loop

    def cond(carry):
        pose, last_err, k, done, _ = carry
        return (k < max_iter) & ~done

    def body(carry):
        pose, last_err, k, _, _ = carry
        jtj, jtf, stats = _products(pose, k)
        delta = _solve_spd(jtj, -jtf)
        err = stats.error
        done = (jnp.max(jnp.abs(delta)) < icp.delta)
        done |= jnp.abs(jnp.max(jtf)) < icp.stopping_threshold
        done |= (err < last_err) & (jnp.abs(err - last_err) < icp.stopping_threshold)
        done |= ~jnp.all(jnp.isfinite(delta))
        new_pose = lie.se3_exp(delta) @ pose
        new_pose = jnp.where(jnp.all(jnp.isfinite(delta)), new_pose, pose)
        return new_pose, err, k + 1, done, stats

    def _products(pose, k):
        rows, stats = build_rows(pose, data, model, icp, model_cfg, k,
                                 semantic, bilinear, model_img=model_img)
        ata = jnp.dot(rows.T, rows, preferred_element_type=jnp.float32)
        if axis is not None:
            ata = jax.lax.psum(ata, axis)
            stats = jax.tree.map(lambda s: jax.lax.psum(s, axis), stats)
        return ata[:6, :6], ata[:6, 6], stats

    zero_stats = IcpStats(
        error=jnp.zeros((), jnp.float32),
        valid=jnp.zeros((), jnp.int32),
        inlier=jnp.zeros((), jnp.int32),
        outlier=jnp.zeros((), jnp.int32),
        inlier_residual=jnp.zeros((), jnp.float32),
        invalid=jnp.zeros((), jnp.int32),
    )
    init = (t0.astype(jnp.float32), jnp.asarray(jnp.inf, jnp.float32),
            jnp.asarray(0, jnp.int32), jnp.asarray(False), zero_stats)
    pose, _, k, _, stats = jax.lax.while_loop(cond, body, init)
    return IcpResult(pose=pose, stats=stats, iterations=k)


@partial(jax.jit, static_argnames=("icp", "model_cfg", "semantic", "bilinear"))
def evaluate(pose: jnp.ndarray, data: Maps, model: Maps,
             icp: IcpConfig, model_cfg: DataConfig,
             semantic: bool = True, bilinear: bool | None = None) -> IcpStats:
    """Residual statistics at a fixed pose (used for odometry quality checks
    and loop-closure verification, SurfelMapping.cpp:406-419)."""
    _, _, stats = jacobian_products(pose, data, model, icp, model_cfg,
                                    0, semantic, bilinear)
    return stats
