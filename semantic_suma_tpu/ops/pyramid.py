"""Range-image pyramids + coarse-to-fine ICP.

TPU-native analogue of the reference's ``ImagePyramidGenerator``
(``/root/reference/src/core/ImagePyramidGenerator.{h,cpp}``) and the
per-level iteration schedule of ``LieGaussNewton``
(``/root/reference/src/core/LieGaussNewton.cpp:18`` — {33,33,33,3,3,3}).

The reference builds its pyramid by REORDERING point coordinates so that
prefixes of one vertex buffer are coarser levels (halving the width per
level, ``ImagePyramidGenerator.cpp:17-48``); the GPU then draws a prefix.
That trick exists to avoid re-uploading points. On TPU the natural
equivalent is a strided min-depth pooling of the dense maps: level ``l``
keeps, for every ``1 x 2^l`` column bin, the pixel with the smallest range
(the z-buffer winner the reference would get from drawing into a
half-width image). Heights are left untouched, like the reference
(``ImagePyramidGenerator.cpp:24-29`` only halves the width).

Note the reference plumbs the pyramid but runs ICP at level 0 only
(``Frame2Model::getMaxLevel()==0``, ``Frame2Model.cpp:127-129``).
:func:`gauss_newton_pyramid` makes the coarse-to-fine schedule actually
usable: each level is a full in-jit GN solve (``ops/icp.py``), seeded with
the previous level's estimate.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp

from ..config import DataConfig, IcpConfig
from .icp import IcpResult, Maps, gauss_newton

# reference per-level iteration budget (LieGaussNewton.cpp:18)
DEFAULT_LEVEL_ITERATIONS = (33, 33, 33, 3, 3, 3)


def downsample_maps(maps: Maps, factor: int = 2) -> Maps:
    """One pyramid level: per ``1 x factor`` column bin keep the nearest
    (min range) valid pixel — the z-buffer winner of drawing the same
    points into a ``W/factor`` image."""
    h, w = maps.vertex.shape[:2]
    assert w % factor == 0, (w, factor)
    wl = w // factor

    depth = jnp.linalg.norm(maps.vertex, axis=-1)
    depth = jnp.where(maps.vertex_valid, depth, jnp.inf)
    binned = depth.reshape(h, wl, factor)
    # lowest in-bin offset wins ties (deterministic, like the stable sort)
    sel = jnp.argmin(binned, axis=-1)                       # [H, WL]

    def pick(img):
        if img.ndim == 3:
            r = img.reshape(h, wl, factor, img.shape[-1])
            return jnp.take_along_axis(r, sel[..., None, None],
                                       axis=2)[:, :, 0]
        r = img.reshape(h, wl, factor)
        return jnp.take_along_axis(r, sel[..., None], axis=2)[:, :, 0]

    return Maps(vertex=pick(maps.vertex), normal=pick(maps.normal),
                vertex_valid=pick(maps.vertex_valid),
                normal_valid=pick(maps.normal_valid),
                sem_label=pick(maps.sem_label), sem_prob=pick(maps.sem_prob))


def build_pyramid(maps: Maps, levels: int) -> list[Maps]:
    """Levels fine -> coarse: ``[maps, W/2, W/4, ...]`` (length ``levels``)."""
    out = [maps]
    for _ in range(levels - 1):
        out.append(downsample_maps(out[-1], 2))
    return out


def level_config(cfg: DataConfig, level: int) -> DataConfig:
    """DataConfig for a width-halved level (same FOV, same height)."""
    from dataclasses import replace
    return replace(cfg, width=cfg.width >> level)


@partial(jax.jit, static_argnames=("icp", "model_cfg", "levels", "semantic",
                                   "level_iterations"))
def gauss_newton_pyramid(data: Maps, model: Maps, t0: jnp.ndarray,
                         icp: IcpConfig, model_cfg: DataConfig,
                         levels: int = 3, semantic: bool = True,
                         level_iterations: Sequence[int] | None = None
                         ) -> IcpResult:
    """Coarse-to-fine projective ICP: solve at ``W/2^(levels-1)`` first,
    feed the estimate down to finer levels. The finest level's stats and
    pose are returned; iteration counts are summed over levels.

    Where it helps (measured on the synthetic world): initializations that
    satisfy the METRIC association gates (max_distance/max_angle) but fall
    outside the projective basin — e.g. ~0.5 rad yaw error aliases pixel
    associations at full width, while level-2/3 pixels still associate
    correctly. It cannot rescue initializations outside the metric gates
    (coarse pixels keep the same world-space mismatch), and loosening the
    gates at coarse levels was measured to make things worse (bad ground
    associations dominate), so the gates are the same at every level."""
    if level_iterations is None:
        level_iterations = DEFAULT_LEVEL_ITERATIONS
    data_pyr = build_pyramid(data, levels)
    model_pyr = build_pyramid(model, levels)

    pose = t0.astype(jnp.float32)
    total_iters = jnp.zeros((), jnp.int32)
    result = None
    for lvl in range(levels - 1, -1, -1):
        it = level_iterations[min(lvl, len(level_iterations) - 1)]
        result = gauss_newton(data_pyr[lvl], model_pyr[lvl], pose, icp,
                              level_config(model_cfg, lvl),
                              semantic=semantic, max_iterations=it)
        pose = result.pose
        total_iters = total_iters + result.iterations
    return IcpResult(pose=pose, stats=result.stats, iterations=total_iters)
