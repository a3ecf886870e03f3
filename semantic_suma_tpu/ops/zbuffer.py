"""Deterministic z-buffer ("rasterization") primitives for TPU.

The reference resolves depth contention with the OpenGL depth test
(``gen_vertexmap.vert`` z-buffered draw; ``gen_indexmap.vert``;
``render_surfels.geom``). A TPU has no rasterizer, and a naive
``scatter-min`` with colliding indices serializes badly in XLA. Instead we
use a sort-based reduction, which maps onto the TPU's fast bitonic sorter:

  1. lexicographically sort ``(pixel_id, depth, payload)`` (``lax.sort`` with
     ``num_keys=2`` — stable, so ties are resolved deterministically),
  2. keep the first element of every pixel run (the nearest),
  3. scatter the winners with *unique* indices (parallel-safe).

This turns an arbitrary-collision z-buffer into sort + unique-scatter, both
of which are efficient, deterministic XLA TPU primitives.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def zbuffer_argmin(ids: jnp.ndarray, depth: jnp.ndarray, num_cells: int):
    """Nearest-element-per-cell reduction.

    Args:
      ids: int32 [N] cell index per element; entries < 0 or >= num_cells are
        dropped (use for invalid elements).
      depth: f32 [N] depth per element (smaller wins).
      num_cells: static number of cells (H*W).

    Returns:
      winner: int32 [num_cells], index into the input arrays of the nearest
        element per cell, or -1 where the cell is empty.
      winner_depth: f32 [num_cells], depth of the winner (+inf where empty).
    """
    n = ids.shape[0]
    valid = (ids >= 0) & (ids < num_cells)
    ids_s = jnp.where(valid, ids, num_cells).astype(jnp.int32)
    depth_s = jnp.where(valid, depth, jnp.inf).astype(jnp.float32)
    payload = jnp.arange(n, dtype=jnp.int32)

    sorted_ids, sorted_depth, sorted_payload = jax.lax.sort(
        (ids_s, depth_s, payload), num_keys=2)

    # first element of each id-run is the winner for that cell
    prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), sorted_ids[:-1]])
    is_first = sorted_ids != prev

    scatter_ids = jnp.where(is_first & (sorted_ids < num_cells),
                            sorted_ids, num_cells)
    winner = jnp.full((num_cells,), -1, jnp.int32).at[scatter_ids].set(
        sorted_payload, mode="drop", unique_indices=True)
    winner_depth = jnp.full((num_cells,), jnp.inf, jnp.float32).at[
        scatter_ids].set(sorted_depth, mode="drop", unique_indices=True)
    return winner, winner_depth


def scatter_reduce_sum(ids: jnp.ndarray, values: jnp.ndarray, num_cells: int):
    """Segment-sum per cell via sorted segments (used by the blend-average
    vertex-map path, reference ``avg_vertexmap.frag``).

    values may be [N] or [N, C]. Returns [num_cells] or [num_cells, C].
    """
    valid = (ids >= 0) & (ids < num_cells)
    ids_s = jnp.where(valid, ids, num_cells).astype(jnp.int32)
    if values.ndim == 1:
        vals = jnp.where(valid, values, 0.0)
    else:
        vals = jnp.where(valid[:, None], values, 0.0)
    return jax.ops.segment_sum(vals, ids_s, num_segments=num_cells + 1,
                               indices_are_sorted=False)[:num_cells]


def gather_or(winner: jnp.ndarray, values: jnp.ndarray, fill):
    """Gather ``values[winner]`` with ``fill`` where winner == -1.

    values: [N] or [N, C]; winner: int32 [M].
    """
    safe = jnp.maximum(winner, 0)
    out = values[safe]
    mask = winner >= 0
    if out.ndim > 1:
        mask = mask[:, None]
    return jnp.where(mask, out, fill)
