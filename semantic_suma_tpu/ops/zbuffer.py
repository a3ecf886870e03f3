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


def zbuffer_argmin(ids: jnp.ndarray, depth: jnp.ndarray, num_cells: int,
                   depth_bound: float = 100.0):
    """Nearest-element-per-cell reduction.

    Args:
      ids: int32 [N] cell index per element; entries < 0 or >= num_cells are
        dropped (use for invalid elements).
      depth: f32 [N] depth per element (smaller wins).
      num_cells: static number of cells (H*W).
      depth_bound: depths are compared after quantization to
        ``depth_bound / 2**depth_bits`` buckets (>= 12 bits; 2.4 mm at the
        64x900 operating point); within-bucket ties resolve deterministically
        to the lowest input index. Depths beyond the bound all land in the
        far bucket but still lose to any nearer element.

    Returns:
      winner: int32 [num_cells], index into the input arrays of the nearest
        element per cell, or -1 where the cell is empty.
      winner_depth: f32 [num_cells], exact depth of the winner (+inf where
        empty).

    A single packed int32 key ``(cell_id << depth_bits) | quantized_depth``
    makes the lexicographic (id, depth) sort a one-key sort over two arrays
    instead of a two-key sort over three — measured ~1.45x faster on a
    v5e chip at the 2^18-candidate operating point. Falls back to the exact
    two-key sort when ``num_cells`` is too large to pack.
    """
    n = ids.shape[0]
    valid = (ids >= 0) & (ids < num_cells)
    payload = jnp.arange(n, dtype=jnp.int32)

    depth_bits = 31 - int(num_cells).bit_length()
    if depth_bits >= 12:
        qmax = (1 << depth_bits) - 1
        scale = (1 << depth_bits) / depth_bound
        q = jnp.clip((depth * scale).astype(jnp.int32), 0, qmax)
        key = jnp.where(valid,
                        (ids.astype(jnp.int32) << depth_bits) | q,
                        (jnp.int32(num_cells) << depth_bits) | qmax)
        sorted_key, sorted_payload = jax.lax.sort((key, payload), num_keys=1)
        sorted_ids = sorted_key >> depth_bits
    else:
        ids_s = jnp.where(valid, ids, num_cells).astype(jnp.int32)
        depth_s = jnp.where(valid, depth, jnp.inf).astype(jnp.float32)
        sorted_ids, _, sorted_payload = jax.lax.sort(
            (ids_s, depth_s, payload), num_keys=2)

    # first element of each id-run is the winner for that cell
    prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), sorted_ids[:-1]])
    is_first = sorted_ids != prev

    scatter_ids = jnp.where(is_first & (sorted_ids < num_cells),
                            sorted_ids, num_cells)
    winner = jnp.full((num_cells,), -1, jnp.int32).at[scatter_ids].set(
        sorted_payload, mode="drop", unique_indices=True)
    winner_depth = jnp.where(winner >= 0, depth[jnp.maximum(winner, 0)],
                             jnp.inf)
    return winner, winner_depth


def zbuffer_argmin_flagged(ids: jnp.ndarray, depth: jnp.ndarray,
                           flags: jnp.ndarray, num_cells: int,
                           depth_bound: float = 100.0):
    """One sort, two argmins: nearest element per cell among ALL candidates
    and among the FLAGGED subset.

    The fused per-scan surfel pass needs both the index-map winner (all
    visible surfels, ``gen_indexmap``) and the render winner (stability/
    timestamp-selected surfels, ``render_surfels``); sharing the single
    sorted order replaces two sorts with one sort plus two cheap
    segmented scans.

    Returns (winner_all, winner_flagged, winner_flagged_depth); winners are
    -1 where the cell is empty (no candidate / no flagged candidate).
    """
    n = ids.shape[0]
    valid = (ids >= 0) & (ids < num_cells)
    payload = jnp.arange(n, dtype=jnp.int32)

    depth_bits = 31 - int(num_cells).bit_length()
    if depth_bits >= 12:
        qmax = (1 << depth_bits) - 1
        scale = (1 << depth_bits) / depth_bound
        q = jnp.clip((depth * scale).astype(jnp.int32), 0, qmax)
        key = jnp.where(valid,
                        (ids.astype(jnp.int32) << depth_bits) | q,
                        (jnp.int32(num_cells) << depth_bits) | qmax)
        sorted_key, sorted_payload = jax.lax.sort((key, payload), num_keys=1)
        sorted_ids = sorted_key >> depth_bits
    else:
        ids_s = jnp.where(valid, ids, num_cells).astype(jnp.int32)
        depth_s = jnp.where(valid, depth, jnp.inf).astype(jnp.float32)
        sorted_ids, _, sorted_payload = jax.lax.sort(
            (ids_s, depth_s, payload), num_keys=2)
    # gather flags through the permutation instead of carrying a third
    # operand through every sort pass (one [N] gather is cheaper)
    sorted_flag = flags[sorted_payload]

    pos = jnp.arange(n, dtype=jnp.int32)
    prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), sorted_ids[:-1]])
    is_first = sorted_ids != prev
    in_range = sorted_ids < num_cells

    # first flagged element per id-run: flagged, and the latest flagged
    # position strictly before it precedes the run start
    seg_start = jax.lax.cummax(jnp.where(is_first, pos, -1))
    flagged = sorted_flag
    last_flag = jax.lax.cummax(jnp.where(flagged, pos, -1))
    prev_flag = jnp.concatenate([jnp.full((1,), -1, jnp.int32),
                                 last_flag[:-1]])
    first_flagged = flagged & (prev_flag < seg_start)

    sa = jnp.where(is_first & in_range, sorted_ids, num_cells)
    winner_all = jnp.full((num_cells,), -1, jnp.int32).at[sa].set(
        sorted_payload, mode="drop", unique_indices=True)
    sf = jnp.where(first_flagged & in_range, sorted_ids, num_cells)
    winner_flagged = jnp.full((num_cells,), -1, jnp.int32).at[sf].set(
        sorted_payload, mode="drop", unique_indices=True)
    wdepth = jnp.where(winner_flagged >= 0,
                       depth[jnp.maximum(winner_flagged, 0)], jnp.inf)
    return winner_all, winner_flagged, wdepth


def zbuffer_runs(ids: jnp.ndarray, depth: jnp.ndarray,
                 flags: "tuple[jnp.ndarray, ...]", num_cells: int,
                 depth_bound: float = 100.0):
    """One sort, ONE scatter, K flagged argmins.

    TPU scatters serialize per row (~2 ms per 2^18-row scatter on v5e
    regardless of payload width), so the classic "scatter each winner map"
    z-buffer costs one full scatter per output. This variant scatters only
    the RUN-START POSITION per cell, then answers every query with cheap
    [num_cells]-sized gathers over the sorted order:

      * ``winner_all[c]``  — nearest candidate (payload at the run start);
      * for each flag f: ``winner_f[c]`` — nearest FLAGGED candidate, found
        via a reverse ``cummin`` of flagged positions (the first flagged
        element at-or-after the run start, checked to be in the same run).

    ``flags`` ride the payload's high bits through the sort (bit 29-k for
    flag k), so no post-sort [N] gather of flag values is needed. Requires
    ``N < 2**26`` and at most 3 flags.

    Returns ``(winner_all, winners, winner_depths)`` where ``winners`` /
    ``winner_depths`` are tuples aligned with ``flags``; every winner is -1
    (depth +inf) where the cell has no (flagged) candidate. "Any flagged
    candidate at cell c" is simply ``winners[k][c] >= 0``.
    """
    n = ids.shape[0]
    assert n < (1 << 26) and len(flags) <= 3
    valid = (ids >= 0) & (ids < num_cells)
    payload = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
    for k, fl in enumerate(flags):
        payload = payload | (fl.astype(jnp.int32) << (29 - k))

    depth_bits = 31 - int(num_cells).bit_length()
    if depth_bits >= 12:
        qmax = (1 << depth_bits) - 1
        scale = (1 << depth_bits) / depth_bound
        q = jnp.clip((depth * scale).astype(jnp.int32), 0, qmax)
        key = jnp.where(valid,
                        (ids.astype(jnp.int32) << depth_bits) | q,
                        (jnp.int32(num_cells) << depth_bits) | qmax)
        sorted_key, sorted_payload = jax.lax.sort((key, payload), num_keys=1)
        sorted_ids = sorted_key >> depth_bits
    else:
        ids_s = jnp.where(valid, ids, num_cells).astype(jnp.int32)
        depth_s = jnp.where(valid, depth, jnp.inf).astype(jnp.float32)
        sorted_ids, _, sorted_payload = jax.lax.sort(
            (ids_s, depth_s, payload), num_keys=2)

    pmask = (1 << 26) - 1
    pos = jnp.arange(n, dtype=jnp.int32)
    prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), sorted_ids[:-1]])
    is_first = (sorted_ids != prev) & (sorted_ids < num_cells)

    # THE one scatter: sorted position of each cell's run start
    sa = jnp.where(is_first, sorted_ids, num_cells)
    pos0 = jnp.full((num_cells,), n, jnp.int32).at[sa].set(
        pos, mode="drop", unique_indices=True)
    has = pos0 < n
    p0 = jnp.minimum(pos0, n - 1)

    # pair gathers: (id, payload) at a sorted position in ONE row gather
    pair = jnp.stack([sorted_ids, sorted_payload], axis=-1)   # [N, 2]
    pair0 = pair[p0]
    winner_all = jnp.where(has, pair0[:, 1] & pmask, -1)

    winners, wdepths = [], []
    for k in range(len(flags)):
        fbit = (sorted_payload >> (29 - k)) & 1
        nxt = jax.lax.cummin(jnp.where(fbit > 0, pos, n), reverse=True)
        nf = jnp.minimum(nxt[p0], n - 1)
        pf = pair[nf]
        ok = has & (nxt[p0] < n) & (pf[:, 0] == pair0[:, 0])
        w = jnp.where(ok, pf[:, 1] & pmask, -1)
        winners.append(w)
        wdepths.append(jnp.where(w >= 0, depth[jnp.maximum(w, 0)], jnp.inf))
    return winner_all, tuple(winners), tuple(wdepths)


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
