"""Host-RAM spill for the surfel arena (unbounded map scale).

The reference pages far submap tiles out of GPU memory into a CPU-side
``SubmapCache`` and re-uploads them when the vehicle returns
(``/root/reference/src/core/SurfelMap.cpp:744-824`` extractSurfels /
updateActiveSubmaps). The TPU analogue here works at the block-arena
granularity of :mod:`semantic_suma_tpu.core.surfel_map`:

* when the device arena nears capacity, the farthest allocated blocks
  (beyond the active radius) are gathered device->host in whole-block
  chunks, marked dead on device, and the store is stream-compacted;
* each chunk keeps its rows in **creation-pose frame** plus the creation
  pose index, so loop-closure pose rebases never touch spilled data — only
  the host-side chunk centroids are recomputed from the new pose table;
* when the vehicle (or a loop-closure verification view) comes near a
  spilled chunk's centroid again, the chunk is appended back into the
  arena tail with its world-frame cache re-derived from the CURRENT pose
  table, entirely on device.

All device work is three small jitted programs (sync+score, extract+kill,
insert) with static shapes; the host only moves whole chunks and keeps a
list of (rows, centroid) records.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import MapConfig
from . import surfel_map as sm
from .surfel_map import (NUM_F, NUM_I, PackedSurfels, _CTS, _NRM, _POS,
                         _VALID, _WNRM, _WPOS, _geometry)


@partial(jax.jit, static_argnames=("cfg",))
def _sync_and_score(state: sm.MapState, center: jnp.ndarray, cfg: MapConfig):
    """Write the view back, then return (synced_state, per-block min
    distance to ``center`` over valid rows [NB], inf where empty)."""
    state = sm.sync(state, cfg)
    bs, nb, _, _ = _geometry(cfg)
    d = state.data
    dist = jnp.linalg.norm(d.wpos.reshape(nb, bs, 3) - center, axis=-1)
    dmin = jnp.min(jnp.where(d.valid.reshape(nb, bs), dist, jnp.inf), axis=1)
    return state, dmin


@partial(jax.jit, static_argnames=("cfg",))
def _score_blocks(state: sm.MapState, center: jnp.ndarray, cfg: MapConfig):
    """Per-block min distance to ``center`` over valid ARENA rows [NB]
    (inf where empty) WITHOUT the view writeback. Active blocks' arena
    copies are stale, but spill eligibility masks them out anyway — this
    is the cheap async PROBE that detects futile spill attempts (nothing
    beyond the keep radius) without the ~0.25 s sync+blocking-fetch a
    full ``_sync_and_score`` costs on the remote tunnel."""
    bs, nb, _, _ = _geometry(cfg)
    d = state.data
    dist = jnp.linalg.norm(d.wpos.reshape(nb, bs, 3) - center, axis=-1)
    return jnp.min(jnp.where(d.valid.reshape(nb, bs), dist, jnp.inf), axis=1)


@partial(jax.jit, static_argnames=("cfg", "n_blocks"))
def _extract_blocks(state: sm.MapState, ids: jnp.ndarray, cfg: MapConfig,
                    n_blocks: int):
    """Gather ``n_blocks`` whole blocks out of the SYNCED store and mark
    them dead. Returns (state', rows_f [S*bs,16], rows_i [S*bs,4])."""
    bs, nb, _, _ = _geometry(cfg)
    rows = sm._block_take(state.data, ids, bs)
    n_out = jnp.sum(rows.valid).astype(jnp.int32)
    bi = state.data.i.reshape(nb, bs, NUM_I)
    bi = bi.at[ids, :, _VALID].set(0, mode="drop")
    state = state._replace(
        data=PackedSurfels(f=state.data.f, i=bi.reshape(-1, NUM_I)),
        count=state.count - n_out)
    return state, rows.f, rows.i


@partial(jax.jit, static_argnames=("cfg",))
def _insert_chunk(state: sm.MapState, rows_f: jnp.ndarray,
                  rows_i: jnp.ndarray, cfg: MapConfig):
    """Append a spilled chunk (S whole blocks of rows in creation frame) at
    the arena tail, world cache re-derived from the CURRENT pose table.
    Caller guarantees block_count + S <= num_blocks. View is reset."""
    bs, nb, _, _ = _geometry(cfg)
    state = sm.sync(state, cfg)
    cp = state.poses[jnp.clip(rows_i[:, _CTS], 0, state.poses.shape[0] - 1)]
    wpos = jnp.einsum("nij,nj->ni", cp[:, :3, :3], rows_f[:, _POS]) \
        + cp[:, :3, 3]
    wnrm = jnp.einsum("nij,nj->ni", cp[:, :3, :3], rows_f[:, _NRM])
    rows_f = rows_f.at[:, _WPOS].set(wpos).at[:, _WNRM].set(wnrm)

    off = state.block_count * bs
    data = PackedSurfels(
        f=jax.lax.dynamic_update_slice(state.data.f, rows_f, (off, 0)),
        i=jax.lax.dynamic_update_slice(state.data.i, rows_i, (off, 0)))
    n_in = jnp.sum(rows_i[:, _VALID] > 0).astype(jnp.int32)
    state = state._replace(
        data=data, count=state.count + n_in,
        block_count=state.block_count + rows_f.shape[0] // bs)
    return sm._reset_view(state, cfg)


class SpillChunk:
    """One spilled unit: S whole blocks of packed rows + a world centroid."""

    def __init__(self, f: np.ndarray, i: np.ndarray):
        self.f = f
        self.i = i
        self.n_valid = int((i[:, _VALID] > 0).sum())
        self.centroid = self._centroid_from_cache()

    def _centroid_from_cache(self) -> np.ndarray:
        v = self.i[:, _VALID] > 0
        if not v.any():
            return np.full((3,), np.inf, np.float32)
        return self.f[v][:, _WPOS].mean(axis=0)

    def recompute_centroid(self, poses: np.ndarray) -> None:
        """After a pose-graph rebase: re-derive the centroid from the
        creation-frame geometry and the NEW pose table (rows themselves
        never change — SurfelMap::updatePoses semantics)."""
        v = self.i[:, _VALID] > 0
        if not v.any():
            return
        cts = np.clip(self.i[v, _CTS], 0, len(poses) - 1)
        cp = poses[cts]
        wpos = np.einsum("nij,nj->ni", cp[:, :3, :3], self.f[v][:, _POS]) \
            + cp[:, :3, 3]
        self.centroid = wpos.mean(axis=0).astype(np.float32)


class SpillManager:
    """Host-side paging policy + chunk store for one SLAM session.

    Drivers call :meth:`maybe_spill` after each scan (cheap no-op unless the
    arena is nearly full) and :meth:`ensure_resident` with any position whose
    surroundings must be on device (the current pose every scan; a loop
    candidate's old pose before old-map rendering).
    """

    def __init__(self, cfg: MapConfig, chunk_blocks: int = 8,
                 spill_margin: float = 25.0, unspill_margin: float = 25.0):
        bs, nb, k, _ = _geometry(cfg)
        self.cfg = cfg
        self.chunk_blocks = max(1, min(chunk_blocks, nb // 2))
        self.spill_margin = spill_margin
        self.unspill_margin = unspill_margin
        self.chunks: List[SpillChunk] = []
        self.chunks_paged_in = 0
        self._bs, self._nb, self._k = bs, nb, k
        self._probe = None  # in-flight async eligibility probe

    @property
    def spilled_rows(self) -> int:
        return sum(c.n_valid for c in self.chunks)

    def on_rebase(self, poses: np.ndarray) -> None:
        for c in self.chunks:
            c.recompute_centroid(np.asarray(poses, np.float32))

    # -- spilling ----------------------------------------------------------

    @property
    def probe_pending(self) -> bool:
        """True while an async eligibility probe is in flight — the caller
        must NOT arm its futile-retry threshold yet (the verdict arrives
        on the next ``maybe_spill`` call)."""
        return self._probe is not None

    def maybe_spill(self, state: sm.MapState, center: np.ndarray,
                    headroom_rows: int,
                    async_probe: bool = False) -> Optional[sm.MapState]:
        """If fewer than ``headroom_rows`` free rows remain, evict far
        blocks to host RAM and compact. Returns the new state, or None if
        nothing was done (state untouched).

        With ``async_probe`` (the pipelined driver, unless creations are
        already dropping), the under-pressure-but-futile case (nothing
        beyond the keep radius — the loiter regime) is detected via a
        cheap ASYNC probe: the first pressured call dispatches
        ``_score_blocks`` and returns None with ``probe_pending`` set; the
        next call reads the (by then materialized) result without
        blocking. Only a non-futile verdict pays the synchronous
        sync+score+extract path — a futile attempt used to cost ~0.25 s
        of blocked pipeline on the remote tunnel."""
        cfg = self.cfg
        bs, nb = self._bs, self._nb
        free_rows = cfg.surfel_capacity - int(state.block_count) * bs
        if free_rows >= headroom_rows:
            self._probe = None
            return None

        keep_radius = cfg.active_radius + self.spill_margin
        if async_probe:
            if self._probe is None:
                # dispatch the probe; verdict next call
                p = _score_blocks(state, jnp.asarray(center, jnp.float32),
                                  cfg)
                try:
                    p.copy_to_host_async()
                except AttributeError:  # pragma: no cover
                    pass
                self._probe = p
                return None
            # probe result is a BOOLEAN hint only (block ids may have
            # been renumbered by a compaction since dispatch); the real
            # path below re-scores on the current state
            pd = np.asarray(self._probe)
            self._probe = None
            if not (np.isfinite(pd) & (pd > keep_radius)).any():
                return None  # futile — caller arms its retry threshold

        self._probe = None  # any outstanding probe is superseded
        state, dmin = _sync_and_score(state, jnp.asarray(center, jnp.float32),
                                      cfg)
        dmin = np.asarray(dmin)
        in_view = np.zeros(nb + self._k, bool)
        in_view[np.asarray(state.active_blocks)] = True
        eligible = np.where(np.isfinite(dmin) & (dmin > keep_radius)
                            & ~in_view[:nb])[0]
        if eligible.size == 0:
            return None
        # farthest-first, whole chunks
        eligible = eligible[np.argsort(-dmin[eligible])]
        n_goal = max(self.chunk_blocks,
                     min(eligible.size,
                         (headroom_rows - free_rows + bs - 1) // bs))
        took = 0
        while took < n_goal and took < eligible.size:
            ids = eligible[took:took + self.chunk_blocks]
            ids = np.pad(ids, (0, self.chunk_blocks - ids.size),
                         constant_values=nb)  # pads gather as invalid
            state, rf, ri = _extract_blocks(
                state, jnp.asarray(ids, jnp.int32), cfg, self.chunk_blocks)
            # host-side row compaction: keep only the blocks that contain
            # valid rows, so re-insertion consumes exactly
            # ceil(n_valid/bs) arena blocks instead of chunk_blocks whole
            # blocks of mostly-pad rows (repeated spill/unspill cycles
            # otherwise fragment the arena and trigger earlier pressure)
            rf_np, ri_np = np.asarray(rf), np.asarray(ri)
            v = ri_np[:, _VALID] > 0
            nv = int(v.sum())
            if nv:
                order = np.argsort(~v, kind="stable")
                keep = -(-nv // bs) * bs
                self.chunks.append(SpillChunk(rf_np[order][:keep],
                                              ri_np[order][:keep]))
            took += self.chunk_blocks
        return sm.compact(state, cfg)

    # -- unspilling --------------------------------------------------------

    def ensure_resident(self, state: sm.MapState,
                        center: np.ndarray) -> Optional[sm.MapState]:
        """Page back every chunk whose centroid lies within the active
        radius (+margin) of ``center``. Returns the new state, or None."""
        if not self.chunks:
            return None
        cfg = self.cfg
        bs, nb = self._bs, self._nb
        radius = cfg.active_radius + self.unspill_margin
        near = [c for c in self.chunks
                if np.linalg.norm(c.centroid - center) < radius]
        if not near:
            return None
        changed = False
        for chunk in near:
            s_blocks = chunk.f.shape[0] // bs
            if int(state.block_count) + s_blocks > nb:
                # make room: evict far blocks first; if the map near the
                # vehicle genuinely fills the arena, leave the chunk out
                spilled = self.maybe_spill(state, center,
                                           headroom_rows=(s_blocks + 1) * bs)
                if spilled is None:
                    continue
                state = spilled
                changed = True
                if int(state.block_count) + s_blocks > nb:
                    continue
            state = _insert_chunk(state, jnp.asarray(chunk.f),
                                  jnp.asarray(chunk.i), cfg)
            self.chunks.remove(chunk)
            self.chunks_paged_in += 1
            changed = True
        return state if changed else None
