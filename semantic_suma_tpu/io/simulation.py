"""Synthetic LiDAR world: analytic raycaster with exact ground-truth poses.

Re-imagines the reference's ``SimulationReader``
(``/root/reference/src/io/SimulationReader.cpp:21-120``, the only data-free
test backend: a raycast world of ground plane + cubes along a circular
trajectory with Gaussian depth noise) as a fully vectorized JAX raycaster:
ground plane + labeled axis-aligned boxes, rays along the sensor's pixel
grid, optional noise — giving closed-loop odometry tests exact ground truth
without KITTI data or a neural net.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DataConfig
from ..ops.projection import pixel_rays
from ..utils import lie


@dataclass(frozen=True)
class Box:
    center: tuple
    size: tuple          # full extents
    label: int = 50      # SemanticKITTI id (50 = building)


@dataclass(frozen=True)
class World:
    """Ground plane at z = ground_z plus labeled boxes."""

    boxes: tuple = ()
    ground_z: float = -1.8
    ground_label: int = 40  # road


def default_world(seed: int = 0, n_boxes: int = 24, extent: float = 45.0,
                  movable_fraction: float = 0.0) -> World:
    """A ring of buildings around the trajectory; optionally some 'cars'."""
    rng = np.random.default_rng(seed)
    boxes = []
    for i in range(n_boxes):
        ang = 2 * np.pi * i / n_boxes + rng.uniform(-0.1, 0.1)
        rad = extent * rng.uniform(0.75, 1.0)
        cx, cy = rad * np.cos(ang), rad * np.sin(ang)
        sx, sy = rng.uniform(4, 12), rng.uniform(4, 12)
        sz = rng.uniform(4, 10)
        label = 10 if rng.uniform() < movable_fraction else 50
        boxes.append(Box((float(cx), float(cy), float(sz / 2 - 1.8)),
                         (float(sx), float(sy), float(sz)), label))
    # a few boxes inside the ring for nearby structure
    for i in range(6):
        ang = 2 * np.pi * i / 6 + 0.4
        rad = extent * 0.45
        boxes.append(Box((float(rad * np.cos(ang)), float(rad * np.sin(ang)), 0.2),
                         (3.0, 3.0, 4.0), 50))
    return World(boxes=tuple(boxes))


class SimScan(NamedTuple):
    points: jnp.ndarray     # [N, 3] sensor frame
    labels: jnp.ndarray     # [N] int32
    probs: jnp.ndarray      # [N] float32
    remissions: jnp.ndarray  # [N] float32
    valid: jnp.ndarray      # [N] bool (ray hit something in range)


def _ray_plane(origin, dirs, z0):
    """Distance along dirs to plane z=z0 (inf if parallel/behind)."""
    dz = dirs[..., 2]
    t = (z0 - origin[2]) / jnp.where(jnp.abs(dz) < 1e-9, jnp.inf, dz)
    return jnp.where(t > 0, t, jnp.inf)


def _ray_box(origin, dirs, lo, hi):
    """Slab-method ray/AABB intersection distance (inf on miss)."""
    inv = 1.0 / jnp.where(jnp.abs(dirs) < 1e-12,
                          jnp.where(dirs >= 0, 1e-12, -1e-12), dirs)
    t0 = (lo - origin) * inv
    t1 = (hi - origin) * inv
    tmin = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tmax = jnp.min(jnp.maximum(t0, t1), axis=-1)
    hit = (tmax >= tmin) & (tmax > 0)
    t = jnp.where(tmin > 0, tmin, tmax)
    return jnp.where(hit, t, jnp.inf)


def render_scan(world: World, pose: jnp.ndarray, cfg: DataConfig,
                noise_sigma: float = 0.0, key: jax.Array | None = None) -> SimScan:
    """Raycast one scan from sensor pose (sensor->world [4,4]).

    Returns points in the SENSOR frame (like a real scan), flattened in
    pixel-row-major order, with per-point labels.
    """
    rays_s = pixel_rays(cfg).reshape(-1, 3)              # sensor frame
    r = pose[:3, :3]
    origin = pose[:3, 3]
    rays_w = rays_s @ r.T

    t_best = _ray_plane(origin, rays_w, world.ground_z)
    label = jnp.full(rays_w.shape[:1], world.ground_label, jnp.int32)
    label = jnp.where(jnp.isfinite(t_best), label, 0)

    for box in world.boxes:
        c = jnp.asarray(box.center)
        s = jnp.asarray(box.size) / 2.0
        t_box = _ray_box(origin, rays_w, c - s, c + s)
        closer = t_box < t_best
        t_best = jnp.minimum(t_best, t_box)
        label = jnp.where(closer, box.label, label)

    if noise_sigma > 0.0 and key is not None:
        t_best = t_best + noise_sigma * jax.random.normal(key, t_best.shape)

    valid = jnp.isfinite(t_best) & (t_best >= cfg.min_depth) & (t_best <= cfg.max_depth)
    t_safe = jnp.where(valid, t_best, 1.0)
    pts = rays_s * t_safe[:, None]
    return SimScan(points=jnp.where(valid[:, None], pts, 0.0),
                   labels=jnp.where(valid, label, 0),
                   probs=jnp.where(valid, 0.95, 0.0).astype(jnp.float32),
                   remissions=jnp.zeros_like(t_safe),
                   valid=valid)


def circular_trajectory(n: int, radius: float = 18.0, height: float = 0.0,
                        step: float | None = None,
                        dtype=jnp.float32) -> jnp.ndarray:
    """[N,4,4] poses driving a circle, x-axis along the motion direction
    (like the reference's simulated vehicle loop).

    ``step`` fixes the arc length per scan (meters); default spreads the N
    poses over exactly one revolution.
    """
    if step is None:
        ang = 2 * np.pi * np.arange(n) / n
    else:
        ang = (step / radius) * np.arange(n)
    poses = []
    for a in ang:
        cy, sy = np.cos(a + np.pi / 2), np.sin(a + np.pi / 2)  # heading tangent
        rot = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]])
        t = np.array([radius * np.cos(a), radius * np.sin(a), height])
        m = np.eye(4)
        m[:3, :3] = rot
        m[:3, 3] = t
        poses.append(m)
    return jnp.asarray(np.stack(poses), dtype)


class SimulationReader:
    """Scan-reader facade over the raycaster (LaserscanReader contract:
    read/count/seek, ``/root/reference/src/rv/LaserscanReader.h``)."""

    def __init__(self, cfg: DataConfig, n_scans: int = 100,
                 world: World | None = None, radius: float = 18.0,
                 noise_sigma: float = 0.0, seed: int = 0,
                 step: float | None = None):
        self.cfg = cfg
        self.world = world if world is not None else default_world(seed)
        self.poses = circular_trajectory(n_scans, radius, step=step)
        self.noise_sigma = noise_sigma
        self._key = jax.random.PRNGKey(seed)
        self._n = n_scans
        # jit the raycast once (world/cfg/noise static via closure): the
        # eager path dispatches ~6 ops per BOX per scan, which on a remote
        # TPU backend costs a round trip each and dominated the CLI driver
        # (part of the round-3 bench-vs-driver 100x gap)
        self._render = jax.jit(
            lambda pose, key: render_scan(self.world, pose, self.cfg,
                                          self.noise_sigma, key))

    def count(self) -> int:
        return self._n

    def is_seekable(self) -> bool:
        return True

    def read(self, idx: int) -> SimScan:
        key = jax.random.fold_in(self._key, idx)
        return self._render(self.poses[idx], key)

    def gt_pose(self, idx: int) -> jnp.ndarray:
        return self.poses[idx]
