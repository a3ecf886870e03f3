"""Spherical range-image projection.

TPU-native replacement for the reference's z-buffered projection draw call
(``/root/reference/src/shader/gen_vertexmap.vert:73-103`` +
``avg_vertexmap.frag``): each LiDAR point is mapped to (yaw, pitch) pixel
coordinates and the nearest point per pixel wins, producing the vertex map
(xyz + validity) and the semantic map (label + probability).

All maps are dense ``[H, W]`` arrays with a separate validity channel — the
TPU analogue of the reference's RGBA float textures with ``w`` = validity.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import DataConfig
from .zbuffer import zbuffer_argmin, scatter_reduce_sum, gather_or

INV_PI = 0.3183098861837907


class ProjectionResult(NamedTuple):
    vertex_map: jnp.ndarray    # [H, W, 3] xyz of winning point
    vertex_valid: jnp.ndarray  # [H, W] bool
    depth_map: jnp.ndarray     # [H, W] range (inf where empty)
    sem_label: jnp.ndarray     # [H, W] int32 SemanticKITTI label id
    sem_prob: jnp.ndarray      # [H, W] float32 label probability
    remission: jnp.ndarray     # [H, W] float32
    point_px: jnp.ndarray      # [N] int32 x pixel per point (-1 invalid)
    point_py: jnp.ndarray      # [N] int32 y pixel per point


def spherical_pixel(points: jnp.ndarray, cfg: DataConfig):
    """Project 3D points to integer pixel coordinates + depth.

    Math follows gen_vertexmap.vert:78-89: yaw = atan2(y, x),
    pitch = -asin(z/depth); x01 = 0.5(1 - yaw/pi); y01 = 1-(pitch_deg+fov_up)/fov.

    Returns (px, py, depth, inside) where inside reflects the reference's NDC
    clipping (depth within [min, max], row within image; columns always wrap).
    """
    x, y, z = points[..., 0], points[..., 1], points[..., 2]
    depth = jnp.sqrt(x * x + y * y + z * z)
    safe = jnp.maximum(depth, 1e-12)
    yaw = jnp.arctan2(y, x)
    pitch = -jnp.arcsin(jnp.clip(z / safe, -1.0, 1.0))

    x01 = 0.5 * (-yaw * INV_PI + 1.0)
    y01 = 1.0 - (jnp.degrees(pitch) + cfg.fov_up) / cfg.fov

    px = jnp.floor(x01 * cfg.width).astype(jnp.int32)
    px = jnp.clip(px, 0, cfg.width - 1)  # x wraps; clamp boundary texel
    py_f = jnp.floor(y01 * cfg.height)
    py = jnp.clip(py_f, 0, cfg.height - 1).astype(jnp.int32)

    inside = ((depth >= cfg.min_depth) & (depth <= cfg.max_depth)
              & (py_f >= 0) & (py_f < cfg.height))
    return px, py, depth, inside


def pixel_rays(cfg: DataConfig, dtype=jnp.float32) -> jnp.ndarray:
    """Unit view ray through each pixel center: [H, W, 3].

    Inverse of the projection above (reference update_surfels.vert:95-110
    ``centerize`` uses the same spherical parameterization).
    """
    xs = (jnp.arange(cfg.width, dtype=dtype) + 0.5) / cfg.width
    ys = (jnp.arange(cfg.height, dtype=dtype) + 0.5) / cfg.height
    yaw = -(2.0 * xs - 1.0) * jnp.pi
    pitch = jnp.radians((1.0 - ys) * cfg.fov - cfg.fov_up)  # note: -asin convention
    # pitch here solves y01 inversion: pitch_deg = (1-y01)*fov - fov_up,
    # point z/d = -sin(pitch) with pitch = -asin(z/d) => z = sin(-pitch)*d
    cp = jnp.cos(pitch)[:, None]
    sp = jnp.sin(pitch)[:, None]
    cy = jnp.cos(yaw)[None, :]
    sy = jnp.sin(yaw)[None, :]
    dirs = jnp.stack([cp * cy, cp * sy, -sp * jnp.ones_like(cy)], axis=-1)
    return dirs


@partial(jax.jit, static_argnames=("cfg", "averaging"))
def project_scan(points: jnp.ndarray,
                 labels: Optional[jnp.ndarray] = None,
                 probs: Optional[jnp.ndarray] = None,
                 remissions: Optional[jnp.ndarray] = None,
                 *,
                 cfg: DataConfig,
                 point_valid: Optional[jnp.ndarray] = None,
                 averaging: bool = False) -> ProjectionResult:
    """Build vertex/semantic maps from a raw scan.

    Args:
      points: [N, 3] float32 sensor-frame points.
      labels: [N] int32 semantic labels (SemanticKITTI ids), optional.
      probs: [N] float32 label probabilities, optional.
      remissions: [N] float32, optional.
      point_valid: [N] bool extra validity (e.g. movable-class suppression at
        init, gen_vertexmap.vert:94-102), optional.
      averaging: use blend-averaged maps (avg_vertexmap) instead of nearest.
    """
    n = points.shape[0]
    h, w = cfg.height, cfg.width
    px, py, depth, inside = spherical_pixel(points, cfg)
    if point_valid is not None:
        inside = inside & point_valid
    ids = jnp.where(inside, py * w + px, -1)

    if averaging:
        ones = jnp.where(inside, 1.0, 0.0)
        sums = scatter_reduce_sum(ids, points, h * w)
        cnt = scatter_reduce_sum(ids, ones, h * w)
        have = cnt > 0
        vertex = jnp.where(have[:, None], sums / jnp.maximum(cnt, 1.0)[:, None], 0.0)
        vmap = vertex.reshape(h, w, 3)
        vvalid = have.reshape(h, w)
        dmap = jnp.where(vvalid, jnp.linalg.norm(vmap, axis=-1), jnp.inf)
        # winner index still via zbuffer for semantics
        winner, _ = zbuffer_argmin(ids, depth, h * w,
                                   depth_bound=max(100.0, cfg.max_depth))
    else:
        winner, wdepth = zbuffer_argmin(ids, depth, h * w,
                                        depth_bound=max(100.0, cfg.max_depth))
        vmap = gather_or(winner, points, 0.0).reshape(h, w, 3)
        vvalid = (winner >= 0).reshape(h, w)
        dmap = wdepth.reshape(h, w)

    if labels is None:
        labels = jnp.zeros((n,), jnp.int32)
    if probs is None:
        probs = jnp.ones((n,), jnp.float32)
    if remissions is None:
        remissions = jnp.zeros((n,), jnp.float32)

    sem_label = gather_or(winner, labels.astype(jnp.int32), 0).reshape(h, w)
    sem_prob = gather_or(winner, probs.astype(jnp.float32), 0.0).reshape(h, w)
    rem = gather_or(winner, remissions.astype(jnp.float32), 0.0).reshape(h, w)

    return ProjectionResult(vmap, vvalid, dmap, sem_label, sem_prob, rem,
                            jnp.where(inside, px, -1), jnp.where(inside, py, -1))
