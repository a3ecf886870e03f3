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


def zbuffer_runs(ids: jnp.ndarray, depth: jnp.ndarray,
                 flags: "tuple[jnp.ndarray, ...]", num_cells: int,
                 depth_bound: float = 100.0,
                 flag_payloads: "tuple[bool, ...] | None" = None):
    """One sentinel-augmented sort, ZERO scatters, K flagged argmins.

    TPU scatters serialize per row (~1.2 ms for a 2^18-update scatter on
    v5e regardless of payload width), so even the single run-start scatter
    of the previous design dominated this kernel. This variant removes it:
    one **sentinel row per cell** is appended to the sort input with a
    depth that sorts before every real candidate of that cell (real
    quantized depths are shifted up by one bucket). After the sort, the
    element right after cell c's sentinel is c's nearest candidate, and
    the per-cell answers live AT the sentinel rows — which are already in
    cell order, so one cheap stable 1-bit-key sort (sentinels first)
    compacts all K+1 winner arrays to dense [num_cells] maps at once.
    Sort + scans + sort; no serializing scatter anywhere.

      * ``winner_all[c]``  — nearest candidate (payload right after the
        sentinel, if in the same run);
      * for each flag f: ``winner_f[c]`` — nearest FLAGGED candidate, via
        a reverse ``cummin`` of flagged positions (first flagged element
        after the sentinel, checked to be in the same run).

    ``flags`` ride the payload's high bits through the sort (bit 29-k for
    flag k), so no post-sort [N] gather of flag values is needed. Requires
    ``N < 2**26`` and at most 3 flags.

    The kernel is GATHER-bound on TPU (row gathers ~8 ns/row), so round 5
    restructured its reads: all flags share ONE [K, m] reverse cummin
    (positions on the lane axis), the winner payload and every flag's
    first-flagged position come from ONE [C, 1+K] row gather at p+1
    (sentinels are never flagged, so nxt[p] == nxt[p+1] exactly), and the
    sentinel-compaction sort packs (is_real, position) into a single i32
    operand. Measured 2.70 -> 1.77 ms at the flagship operating point.

    Returns ``(winner_all, winners, winner_depths)`` where ``winners`` /
    ``winner_depths`` are tuples aligned with ``flags``; every winner is -1
    (depth +inf) where the cell has no (flagged) candidate. "Any flagged
    candidate at cell c" is simply ``winners[k][c] >= 0``.
    """
    n = ids.shape[0]
    # num_cells run sentinels + ONE terminator sentinel for pseudo-cell C:
    # it sorts after every real candidate but before the invalid rows
    # (which carry id C and the far bucket), so the last real cell's run
    # is bounded by a sentinel position like every other cell's — the
    # in-run checks below are pure position comparisons, no id decode
    m = n + num_cells + 1
    assert m < (1 << 26) and len(flags) <= 3
    valid = (ids >= 0) & (ids < num_cells)
    payload = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
    for k, fl in enumerate(flags):
        payload = payload | (fl.astype(jnp.int32) << (29 - k))
    # sentinel payloads carry bit 30; their iota is the cell id (unused)
    cell_iota = jax.lax.broadcasted_iota(jnp.int32, (num_cells + 1,), 0)
    pay_ext = jnp.concatenate([payload, cell_iota | (1 << 30)])

    depth_bits = 31 - int(num_cells).bit_length()
    if depth_bits >= 12:
        qmax = (1 << depth_bits) - 1
        scale = (1 << depth_bits) / depth_bound
        # real depths occupy buckets [1, qmax]; sentinels get bucket 0 and
        # therefore sort strictly first within their cell's run
        q = jnp.clip((depth * scale).astype(jnp.int32), 0, qmax - 1) + 1
        key = jnp.where(valid,
                        (ids.astype(jnp.int32) << depth_bits) | q,
                        (jnp.int32(num_cells) << depth_bits) | qmax)
        key_ext = jnp.concatenate([key, cell_iota << depth_bits])
        sorted_key, sorted_pay = jax.lax.sort((key_ext, pay_ext), num_keys=1)
        # the sorted key doubles as the winner's quantized depth (key & qmax)
        pair_first = sorted_key
    else:
        ids_s = jnp.where(valid, ids, num_cells).astype(jnp.int32)
        ids_ext = jnp.concatenate([ids_s, cell_iota])
        depth_s = jnp.where(valid, depth, jnp.inf).astype(jnp.float32)
        depth_ext = jnp.concatenate(
            [depth_s, jnp.full((num_cells + 1,), -jnp.inf, jnp.float32)])
        sorted_ids, _, sorted_pay = jax.lax.sort(
            (ids_ext, depth_ext, pay_ext), num_keys=2)
        pair_first = sorted_ids

    pmask = (1 << 26) - 1
    pos = jax.lax.broadcasted_iota(jnp.int32, (m,), 0)
    is_real = ((sorted_pay >> 30) & 1) == 0

    # first flagged real position at-or-after each row: ONE reverse cummin
    # over a [K, m] array instead of K separate [m] scans — positions ride
    # the lane axis, so all flags share the same log-shift passes (a [2, m]
    # scan costs the same tile traffic as a [1, m] scan)
    nxts = []
    if flags:
        fb = jnp.stack([
            jnp.where(is_real & (((sorted_pay >> (29 - k)) & 1) > 0),
                      pos, m)
            for k in range(len(flags))], axis=0)          # [K, m]
        nxt_all = jax.lax.cummin(fb, axis=1, reverse=True)
        nxts = [nxt_all[k] for k in range(len(flags))]

    # compact the sentinel POSITIONS (already in cell order) to the front
    # with one stable 1-bit-key sort; every per-cell answer then follows
    # from [num_cells]-sized gathers over the sorted order (cheap — the
    # wide multi-operand carry sort measured 3x the cost of these gathers)
    # ONE packed operand (is_real bit 26 | position) instead of a
    # (key, payload) pair — each extra sort operand costs ~+0.25 ms at
    # this size on v5e; positions fit 26 bits by the m < 2^26 assert
    p_sent = jax.lax.sort((is_real.astype(jnp.int32) << 26) | pos) & pmask
    p = p_sent[:num_cells]                              # [C], cell order
    p_term = p_sent[num_cells]                          # terminator position

    # sentinel positions are ascending in cell order, so "position q
    # belongs to cell c's run" is simply q < p_next[c] (the next cell's
    # sentinel position) — no id decode, and per-flag answers that only
    # need EXISTENCE (flag_payloads[k] = False) need no gather at all
    p_next = jnp.concatenate([p[1:], p_term[None]])      # [C]
    pair_pay_key = jnp.stack([pair_first, sorted_pay], axis=-1)  # [m, 2]

    # ONE [C, 2+K] row gather at q_all = p+1 answers winner_all AND every
    # flag's first-flagged position: sentinel rows are never flagged, so
    # the reverse cummin satisfies nxt[p] == nxt[p+1] exactly — gathers
    # are row-count-bound (~8 ns/row from HBM), so collapsing the three
    # separate [C] gathers into one is the dominant saving here
    q_all = jnp.minimum(p + 1, m - 1)
    cols = [sorted_pay[:, None]]
    if flags:
        cols.append(nxt_all.T)                           # [m, K]
    gall = jnp.concatenate(cols, axis=-1)[q_all]         # [C, 1+K] gather
    pay_all = gall[:, 0]
    # any row strictly inside a run is real (sentinels start runs)
    winner_all = jnp.where(p + 1 < p_next, pay_all & pmask, -1)

    if flag_payloads is None:
        flag_payloads = tuple(True for _ in flags)
    winners, wdepths = [], []
    for k in range(len(flags)):
        nxt_c = gall[:, 1 + k]                           # == nxts[k][p]
        ok = nxt_c < p_next                              # in this cell's run
        if not flag_payloads[k]:
            # caller only tests ``winner >= 0``: 0 marks existence, no
            # payload gather and no depth decode
            winners.append(jnp.where(ok, 0, -1))
            wdepths.append(jnp.where(ok, 0.0, jnp.inf))
            continue
        nf = jnp.minimum(nxt_c, m - 1)
        pf = pair_pay_key[nf]                            # [C, 2] row gather
        w = jnp.where(ok, pf[:, 1] & pmask, -1)
        winners.append(w)
        if depth_bits >= 12:
            # decode the winner's (quantized) depth straight from the sort
            # key carried in the pair gather — saves a [C]-from-[N] float
            # gather; callers use winner depths only for near-tie
            # comparisons (compose merge, cross-device argmin), where
            # bucket resolution (<=2.4 mm at the 64x900 point) is
            # immaterial
            wd = ((pf[:, 0] & qmax) - 1).astype(jnp.float32) / scale
            wdepths.append(jnp.where(w >= 0, wd, jnp.inf))
        else:
            wdepths.append(jnp.where(w >= 0, depth[jnp.maximum(w, 0)],
                                     jnp.inf))
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
