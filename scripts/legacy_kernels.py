"""Superseded kernel designs kept ONLY as A/B measurement arms.

``zbuffer_argmin_flagged`` (one sort + run-start scatter, two flagged
argmins) was the round-2 z-buffer; it was replaced in the hot path by
``semantic_suma_tpu.ops.zbuffer.zbuffer_runs`` (sentinel sort, zero
scatters) — measured 2.96 -> 2.40 ms at the 2^18-candidate operating point
(PERF.md). The micro scripts import it from here to keep the historical
comparisons runnable; nothing in the package uses it.
"""

import jax
import jax.numpy as jnp


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
