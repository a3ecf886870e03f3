"""Multi-chip sharding for the SLAM engine and segmenter.

The reference is a single-GPU, single-process application (SURVEY §2.7);
scale-out here is a *new* TPU-native design (SURVEY §7, configs 4-5):

* **Surfel-map block sharding** (``map`` mesh axis): the fixed-capacity SoA
  store is split into per-device blocks (the submap grid's natural shard
  unit). Each device fuses the (replicated) scan into its own block;
  new surfels are assigned round-robin by pixel id so blocks stay balanced.

* **ICP reduction**: each device builds Jacobian rows for its slice of the
  range image rows and the 6x6+6 products are combined with one ``psum`` —
  the collective analogue of the reference's additive-blend reduction
  (``Frame2Model.cpp:189-197``). The whole Gauss-Newton loop stays inside
  ``shard_map`` (collectives inside ``lax.while_loop``), so a multi-chip
  alignment is still a single program launch.

* **Rendering**: each device z-buffers its own block into candidate maps +
  a depth image; an ``all_gather`` over the ``map`` axis followed by a
  per-pixel argmin merges them — a depth-min all-reduce over ICI.

* **Segmenter**: standard data-parallel training (batch over ``data`` axis)
  with optional tensor-parallel channel sharding of the widest conv layers
  (``model`` axis), expressed with NamedSharding on params/batch.

Everything works on any ``jax.sharding.Mesh`` — real TPU pods or the
virtual CPU mesh used in tests.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import SumaConfig
from ..core import surfel_map as sm
from ..core.preprocessing import preprocess_scan
from ..ops import icp as icp_ops
from ..ops.icp import Maps
from ..ops.zbuffer import zbuffer_argmin
from ..utils import lie

try:  # JAX >= 0.6 exposes shard_map at the top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore


def make_mesh(n_devices: int | None = None, axis: str = "map") -> Mesh:
    devs = jax.devices()[:n_devices] if n_devices else jax.devices()
    return Mesh(np.array(devs), (axis,))


def make_2d_mesh(n_data: int, n_model: int) -> Mesh:
    devs = np.array(jax.devices()[:n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devs, ("data", "model"))


# ---------------------------------------------------------------------------
# sharded SLAM step
# ---------------------------------------------------------------------------

def _merge_rendered(local_maps: Maps, local_depth: jnp.ndarray, axis: str):
    """Depth-min merge of per-device renders (all_gather + argmin)."""
    depth_all = jax.lax.all_gather(local_depth, axis)          # [D, H, W]
    maps_all = jax.tree.map(lambda a: jax.lax.all_gather(a, axis), local_maps)
    win = jnp.argmin(depth_all, axis=0)                        # [H, W]

    def pick(a):
        if a.ndim == 3:   # [D, H, W]
            return jnp.take_along_axis(a, win[None], axis=0)[0]
        return jnp.take_along_axis(a, win[None, ..., None], axis=0)[0]

    return jax.tree.map(pick, maps_all)


def _local_render(data: sm.PackedSurfels, pose: jnp.ndarray, cfg: SumaConfig,
                  conf_threshold, ts_threshold):
    """One device's block render + its per-pixel depth for merging."""
    pose_inv = lie.se3_inverse(pose)
    proj = sm._project_surfels(data, pose_inv, cfg.model)
    sel = sm._selection(data, proj, cfg.map, conf_threshold, ts_threshold,
                        "new")
    maps = sm._resolve_maps([sm.RenderEntries(data, proj, sel)], cfg.model)
    depth = jnp.where(maps.vertex_valid,
                      jnp.linalg.norm(maps.vertex, axis=-1), jnp.inf)
    return maps, depth


def make_sharded_step(cfg: SumaConfig, mesh: Mesh, axis: str = "map"):
    """Build the jitted multi-chip odometry step.

    State layout inside shard_map: each device holds a block of the surfel
    store (CAP/D rows) plus replicated pose/poses. The scan tensors are
    replicated (they are small); ICP parallelism comes from slicing image
    rows per device and psum-ing the products.
    """
    ndev = mesh.devices.size
    h = cfg.data.height
    assert h % ndev == 0, "image height must divide device count"
    rows = h // ndev

    def step(block: sm.SurfelData, count, poses, pose, last_inc, ts,
             points, labels, probs, point_valid, conf_threshold):
        me = jax.lax.axis_index(axis)

        data_maps = preprocess_scan(points, labels, probs, point_valid,
                                    ts < cfg.semantic.init_scans, cfg)

        # --- render model maps from all blocks (for ICP) ------------------
        ts_active = ts - cfg.loop.delta_timestamp
        local_maps, local_depth = _local_render(block, pose, cfg,
                                                conf_threshold, ts_active)
        model_maps = _merge_rendered(local_maps, local_depth, axis)

        # --- distributed Gauss-Newton: rows sliced per device, psum -------
        def row_slice(maps: Maps) -> Maps:
            return jax.tree.map(
                lambda a: jax.lax.dynamic_slice_in_dim(a, me * rows, rows, 0),
                maps)

        my_data = row_slice(data_maps)

        def products(pose_k, k):
            rows_mat, stats = icp_ops.build_rows(
                pose_k, my_data, model_maps, cfg.icp, cfg.model, k,
                cfg.semantic.enabled)
            ata = jnp.dot(rows_mat.T, rows_mat,
                          preferred_element_type=jnp.float32)
            ata = jax.lax.psum(ata, axis)
            stats = jax.tree.map(lambda s: jax.lax.psum(s, axis), stats)
            return ata[:6, :6], ata[:6, 6], stats

        def gn_cond(carry):
            _, _, k, done = carry
            return (k < cfg.icp.max_iterations) & ~done

        def gn_body(carry):
            pose_k, last_err, k, _ = carry
            jtj, jtf, stats = products(pose_k, k)
            delta = icp_ops._solve_spd(jtj, -jtf)
            err = stats.error
            done = (jnp.max(jnp.abs(delta)) < cfg.icp.delta)
            done |= jnp.abs(jnp.max(jtf)) < cfg.icp.stopping_threshold
            done |= (err < last_err) & (jnp.abs(err - last_err)
                                        < cfg.icp.stopping_threshold)
            new_pose = lie.se3_exp(delta) @ pose_k
            return new_pose, err, k + 1, done

        init = (last_inc, jnp.asarray(jnp.inf, jnp.float32),
                jnp.zeros((), jnp.int32), jnp.asarray(False))
        increment, _, iters, _ = jax.lax.while_loop(gn_cond, gn_body, init)
        increment = jnp.where(ts == 0, jnp.eye(4, dtype=jnp.float32),
                              increment)
        new_pose = lie.orthonormalize(pose @ increment)

        # --- sharded fusion ----------------------------------------------
        pose_inv = lie.se3_inverse(new_pose)
        frame = sm.data_surfel_init(data_maps, cfg.data, cfg.map)

        # global index winner: local winner depth per pixel, min over blocks
        proj = sm._project_surfels(block, pose_inv, cfg.data)
        ok = block.valid & proj.visible & proj.inside
        hw = cfg.data.height * cfg.data.width
        ids = jnp.where(ok, proj.py * cfg.data.width + proj.px, -1)
        local_winner, local_wdepth = zbuffer_argmin(ids, proj.depth, hw)
        wdepth_all = jax.lax.all_gather(local_wdepth, axis)     # [D, HW]
        win_shard = jnp.argmin(wdepth_all, axis=0)              # [HW]
        i_am_winner = win_shard == me

        frame_img = sm._pack_frame_image(frame)
        data2, compatible, pid = sm._update_view(
            block, frame_img, frame, new_pose, pose_inv, poses, ts,
            cfg.data, cfg.map, conf_threshold, cfg.semantic.enabled,
            index_winner_override=(local_winner, i_am_winner))

        # integrated flags: OR across devices (psum of 0/1)
        flag_ids = jnp.where(compatible, pid, hw)
        local_flags = jnp.zeros((hw,), jnp.int32).at[flag_ids].max(
            1, mode="drop")
        integrated = jax.lax.psum(local_flags, axis) > 0

        new_data, create = sm._make_new_surfels(frame, new_pose, ts,
                                                integrated, cfg.map,
                                                cfg.semantic.enabled)
        # round-robin block assignment by pixel id
        mine = create & (jnp.arange(hw, dtype=jnp.int32) % ndev == me)
        capb = data2.capacity
        slots = count + jnp.cumsum(mine.astype(jnp.int32)) - 1
        ok = mine & (slots < capb)
        data3 = data2.put(jnp.where(ok, slots, capb), new_data)
        n_created = jnp.sum(ok)
        new_block_count = jnp.minimum(count + jnp.sum(mine),
                                      capb).astype(jnp.int32)
        new_poses = poses.at[
            jnp.clip(ts, 0, poses.shape[0] - 1)].set(new_pose)

        info = {
            "iterations": iters,
            "n_created": jax.lax.psum(n_created, axis),
            "count": jax.lax.psum(new_block_count, axis),
        }
        return (data3, new_block_count, new_poses, new_pose,
                increment, info)

    sharded = shard_map(
        step, mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P(axis), sm._zeros_data(1)),
                  P(), P(), P(), P(), P(), P(), P(), P(), P(), P()),
        out_specs=(jax.tree.map(lambda _: P(axis), sm._zeros_data(1)),
                   P(), P(), P(), P(),
                   {"iterations": P(), "n_created": P(), "count": P()}),
        check_vma=False)
    return jax.jit(sharded)


# ---------------------------------------------------------------------------
# sharded segmenter training
# ---------------------------------------------------------------------------

def shard_train_state(tx_state, mesh: Mesh):
    """Replicate a segmenter TrainState over the mesh (DP); the widest conv
    kernels' output channels shard over the 'model' axis when present."""
    has_model = "model" in mesh.axis_names

    def spec_for(path, leaf):
        if has_model and hasattr(leaf, "ndim") and leaf.ndim == 4 \
                and leaf.shape[-1] >= 128:
            return NamedSharding(mesh, P(None, None, None, "model"))
        return NamedSharding(mesh, P())

    flat, treedef = jax.tree_util.tree_flatten_with_path(tx_state)
    shardings = jax.tree_util.tree_unflatten(
        treedef, [spec_for(p, l) for p, l in flat])
    return jax.device_put(tx_state, shardings)


def make_sharded_train_step(model, tx, mesh: Mesh, class_weights=None):
    """Data-parallel (+ optional channel-parallel) segmenter train step."""
    from ..models.segmenter import make_train_step

    base = make_train_step(model, tx, class_weights)
    batch_sharding = NamedSharding(mesh, P("data"))

    @partial(jax.jit, in_shardings=(None, batch_sharding, batch_sharding,
                                    batch_sharding), donate_argnums=(0,))
    def step(state, images, labels, valid):
        return base(state, images, labels, valid)

    return step
