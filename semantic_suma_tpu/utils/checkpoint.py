"""Checkpoint / resume for the full SLAM session.

The reference has NO persistence: ``Posegraph::save/load`` are empty stubs
(``/root/reference/src/core/Posegraph.cpp:118-119``) and the GUI can only
export poses/PNGs. Here the complete session state — surfel map (compacted),
pose table, device pipeline state, host pose log, pose-graph factors and the
loop-closure state machine — round-trips through a single ``.npz`` archive,
so long sequences can stop/resume and maps can be archived or inspected.
"""

from __future__ import annotations


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


def _host_blob(slam) -> dict:
    return {
        "poses": [np.asarray(p).tolist() for p in slam.poses],
        "trajectory_distances": list(slam.trajectory_distances),
        "track_loss_count": int(getattr(slam, "track_loss_count", 0)),
        "statistics": slam.statistics,
        # device->output correction pending from a below-gate async
        # integration (identity in the common case)
        "frame_correction": np.asarray(
            getattr(slam, "frame_correction",
                    np.eye(4, dtype=np.float32))).tolist(),
    }


def _loop_blob(slam) -> bytes:
    if getattr(slam, "_loop", None) is None:
        return b""
    lc = slam._loop
    return pickle.dumps({
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


def _restore_loop(slam, loop_blob: bytes) -> None:
    if not loop_blob or slam._loop is None:
        return
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


def save_checkpoint(slam, path: str, compact_map: bool = True) -> None:
    """Serialize a SurfelSLAM session (device + host state). Sharded
    sessions route to the per-shard archive format."""
    from ..core import surfel_map as sm

    if not hasattr(slam, "state"):
        if hasattr(slam, "map_sh"):
            return save_checkpoint_sharded(slam, path)
        raise ValueError(
            f"not a checkpointable SLAM session: {type(slam).__name__}")
    state = slam.state
    if compact_map:
        state = state._replace(map=sm.compact(state.map, slam.cfg.map))

    arrays, _ = _flatten_with_paths(state)
    host = _host_blob(slam)
    loop_blob = _loop_blob(slam)
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


def save_checkpoint_sharded(slam, path: str) -> None:
    """Serialize a ShardedSurfelSLAM session: every shard's MapState (read
    through ``addressable_shards``), the replicated pipeline arrays, host
    state, pose-graph/loop machine, and each shard's spill chunks.

    Single-process only (a multi-host run would need one archive per
    process; each process can only read its own shards)."""
    import jax as _jax

    if _jax.process_count() != 1:
        raise ValueError("sharded checkpointing is single-process only; "
                         "save one archive per process instead")
    arrays = {"__ndev__": np.asarray(slam.ndev, np.int32)}
    for d in slam._my_shards():
        st = slam._local_shard(d)
        flat, _ = _flatten_with_paths(st)
        for k, v in flat.items():
            arrays[f"shard{d}/{k}"] = v
    for name in ("pose", "last_increment"):
        arrays[f"repl/{name}"] = np.asarray(getattr(slam, name))
    for name in ("last_maps", "model_maps"):
        flat, _ = _flatten_with_paths(getattr(slam, name))
        for k, v in flat.items():
            arrays[f"repl/{name}/{k}"] = v
    if slam.spill is not None:
        for d in slam._my_shards():
            for n, chunk in enumerate(slam.spill[d].chunks):
                arrays[f"__spill{d}_f_{n}__"] = chunk.f
                arrays[f"__spill{d}_i_{n}__"] = chunk.i
    host = _host_blob(slam)
    np.savez_compressed(
        path,
        __host__=np.frombuffer(json.dumps(host).encode(), dtype=np.uint8),
        __loop__=np.frombuffer(_loop_blob(slam), dtype=np.uint8),
        **arrays)


def load_checkpoint_sharded(path: str, cfg, mesh, axis: str = "map",
                            enable_loop_closure: Optional[bool] = None):
    """Restore a ShardedSurfelSLAM session saved by
    :func:`save_checkpoint_sharded` onto ``mesh`` (same device count and
    capacities required)."""
    from ..parallel.sharding import ShardedSurfelSLAM

    data = np.load(path, allow_pickle=False)
    slam = ShardedSurfelSLAM(cfg, mesh, axis=axis,
                             enable_loop_closure=enable_loop_closure)
    ndev = int(data["__ndev__"])
    if ndev != slam.ndev:
        raise ValueError(f"checkpoint has {ndev} shards, mesh has "
                         f"{slam.ndev}")
    template = slam._local_shard(slam._my_shards()[0])
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    keys = ["/".join(str(getattr(q, "name", getattr(q, "idx", q)))
                     for q in p) for p, _ in flat]
    for d in slam._my_shards():
        leaves = [jnp.asarray(data[f"shard{d}/{k}"], leaf.dtype)
                  for k, (_, leaf) in zip(keys, flat)]
        slam._write_shard(d, jax.tree_util.tree_unflatten(treedef, leaves))
    slam.pose = jnp.asarray(data["repl/pose"])
    slam.last_increment = jnp.asarray(data["repl/last_increment"])
    for name in ("last_maps", "model_maps"):
        t = getattr(slam, name)
        flat_m, treedef_m = jax.tree_util.tree_flatten_with_path(t)
        leaves = []
        for p, leaf in flat_m:
            k = "/".join(str(getattr(q, "name", getattr(q, "idx", q)))
                         for q in p)
            leaves.append(jnp.asarray(data[f"repl/{name}/{k}"], leaf.dtype))
        setattr(slam, name, jax.tree_util.tree_unflatten(treedef_m, leaves))

    host = json.loads(bytes(data["__host__"]).decode())
    slam.poses = [np.asarray(p, np.float32) for p in host["poses"]]
    slam._dispatched = len(slam.poses)
    slam.trajectory_distances = list(host["trajectory_distances"])
    slam.statistics = host["statistics"]
    slam.frame_correction = np.asarray(
        host.get("frame_correction", np.eye(4)), np.float32)
    _restore_loop(slam, bytes(data["__loop__"]))
    if slam.spill is not None:
        from ..core.spill import SpillChunk
        for d in slam._my_shards():
            n = 0
            while f"__spill{d}_f_{n}__" in data:
                slam.spill[d].chunks.append(
                    SpillChunk(data[f"__spill{d}_f_{n}__"],
                               data[f"__spill{d}_i_{n}__"]))
                n += 1
            if slam.spill[d].chunks:
                slam.spill[d].on_rebase(
                    np.asarray(slam._local_shard(d).poses))
    return slam


def load_checkpoint(path: str, cfg, enable_loop_closure: Optional[bool] = None):
    """Restore a SurfelSLAM session saved by :func:`save_checkpoint`."""
    from ..core.pipeline import SurfelSLAM

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

    _restore_loop(slam, bytes(data["__loop__"]))

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
