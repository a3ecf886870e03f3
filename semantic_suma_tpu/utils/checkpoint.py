"""Checkpoint / resume for the full SLAM session.

The reference has NO persistence: ``Posegraph::save/load`` are empty stubs
(``/root/reference/src/core/Posegraph.cpp:118-119``) and the GUI can only
export poses/PNGs. Here the complete session state — surfel map (compacted),
pose table, device pipeline state, host pose log, pose-graph factors and the
loop-closure state machine — round-trips through a single ``.npz`` archive,
so long sequences can stop/resume and maps can be archived or inspected.
"""

from __future__ import annotations

import io
import json
import pickle
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _flatten_with_paths(tree):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    out = {}
    for path, leaf in flat:
        key = "/".join(str(getattr(p, "name", getattr(p, "idx", p)))
                       for p in path)
        out[key] = np.asarray(leaf)
    return out, treedef


def save_checkpoint(slam, path: str, compact_map: bool = True) -> None:
    """Serialize a SurfelSLAM session (device + host state)."""
    from ..core import surfel_map as sm

    if not hasattr(slam, "state"):
        raise ValueError(
            "only single-chip SurfelSLAM sessions are checkpointable "
            f"(got {type(slam).__name__}; sharded sessions keep per-shard "
            "state that this archive format does not cover)")
    state = slam.state
    if compact_map:
        state = state._replace(map=sm.compact(state.map, slam.cfg.map))

    arrays, _ = _flatten_with_paths(state)
    host = {
        "poses": [p.tolist() for p in slam.poses],
        "trajectory_distances": slam.trajectory_distances,
        "track_loss_count": slam.track_loss_count,
        "statistics": slam.statistics,
        # device->output correction pending from a below-gate async
        # integration (identity in the common case)
        "frame_correction": np.asarray(
            getattr(slam, "frame_correction",
                    np.eye(4, dtype=np.float32))).tolist(),
    }
    loop_blob = b""
    if slam._loop is not None:
        lc = slam._loop
        loop_blob = pickle.dumps({
            "posegraph_poses": lc.posegraph._poses,
            "posegraph_edges": lc.posegraph._edges,
            "unverified": lc.unverified,
            "verified": lc.verified,
            "already_verified": lc.already_verified,
            "time_without_loop": lc.time_without_loop,
            "loop_count": lc.loop_count,
            "pose_old": lc.pose_old,
            "last_pose_old": lc.last_pose_old,
            "num_loop_closures": lc.num_loop_closures,
        })
    spill_arrays = {}
    if getattr(slam, "spill", None) is not None:
        for n, chunk in enumerate(slam.spill.chunks):
            spill_arrays[f"__spill_f_{n}__"] = chunk.f
            spill_arrays[f"__spill_i_{n}__"] = chunk.i

    np.savez_compressed(
        path,
        __host__=np.frombuffer(json.dumps(host).encode(), dtype=np.uint8),
        __loop__=np.frombuffer(loop_blob, dtype=np.uint8),
        **spill_arrays, **arrays)


def load_checkpoint(path: str, cfg, enable_loop_closure: Optional[bool] = None):
    """Restore a SurfelSLAM session saved by :func:`save_checkpoint`."""
    from ..core.pipeline import SurfelSLAM, init_state

    data = np.load(path, allow_pickle=False)
    slam = SurfelSLAM(cfg, enable_loop_closure=enable_loop_closure)

    template = slam.state
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for p, leaf in flat:
        key = "/".join(str(getattr(q, "name", getattr(q, "idx", q)))
                       for q in p)
        stored = data[key]
        if stored.shape != leaf.shape:
            raise ValueError(
                f"checkpoint field {key} has shape {stored.shape}, config "
                f"expects {leaf.shape} — use the same capacities")
        leaves.append(jnp.asarray(stored, leaf.dtype))
    slam.state = jax.tree_util.tree_unflatten(treedef, leaves)

    host = json.loads(bytes(data["__host__"]).decode())
    slam.poses = [np.asarray(p) for p in host["poses"]]
    # the dispatch counter drives the confidence-threshold warmup; resume
    # must continue it where the saved session left off
    slam._dispatched = len(slam.poses)
    slam.trajectory_distances = list(host["trajectory_distances"])
    slam.track_loss_count = int(host["track_loss_count"])
    slam.statistics = host["statistics"]
    if "frame_correction" in host:
        slam.frame_correction = np.asarray(host["frame_correction"],
                                           np.float32)

    loop_blob = bytes(data["__loop__"])
    if loop_blob and slam._loop is not None:
        blob = pickle.loads(loop_blob)
        lc = slam._loop
        lc.posegraph._poses = blob["posegraph_poses"]
        lc.posegraph._edges = blob["posegraph_edges"]
        lc.unverified = blob["unverified"]
        lc.verified = blob["verified"]
        lc.already_verified = blob["already_verified"]
        lc.time_without_loop = blob["time_without_loop"]
        lc.loop_count = blob["loop_count"]
        lc.pose_old = blob["pose_old"]
        lc.last_pose_old = blob["last_pose_old"]
        lc.num_loop_closures = blob["num_loop_closures"]

    if slam.spill is not None:
        from ..core.spill import SpillChunk
        n = 0
        while f"__spill_f_{n}__" in data:
            slam.spill.chunks.append(SpillChunk(data[f"__spill_f_{n}__"],
                                                data[f"__spill_i_{n}__"]))
            n += 1
        # SpillChunk.__init__ derives its centroid from the cached _WPOS
        # columns, which are stale if the saved session had rebased poses
        # after spilling (on_rebase updates only the live centroid, not the
        # serialized world cache) — re-derive every centroid from the
        # restored pose table so paging decisions stay correct after resume
        if slam.spill.chunks:
            slam.spill.on_rebase(np.asarray(slam.state.map.poses))
    return slam
