"""Image-pyramid tests: downsampling semantics vs a numpy oracle, and
coarse-to-fine ICP convergence on the synthetic world (the reference's
ImagePyramidGenerator analogue, ImagePyramidGenerator.cpp:17-48)."""
import numpy as np
import jax.numpy as jnp

from semantic_suma_tpu.config import DataConfig, IcpConfig
from semantic_suma_tpu.io.simulation import default_world, render_scan
from semantic_suma_tpu.ops import icp
from semantic_suma_tpu.ops.filters import compute_normals
from semantic_suma_tpu.ops.projection import project_scan
from semantic_suma_tpu.ops.pyramid import (build_pyramid, downsample_maps,
                                           gauss_newton_pyramid,
                                           level_config)
from semantic_suma_tpu.utils import lie

CFG = DataConfig(width=360, height=48)


def make_maps(scan):
    res = project_scan(scan.points, scan.labels, scan.probs,
                       cfg=CFG, point_valid=scan.valid)
    normal, nvalid = compute_normals(res.vertex_map, res.vertex_valid)
    return icp.Maps(vertex=res.vertex_map, normal=normal,
                    vertex_valid=res.vertex_valid, normal_valid=nvalid,
                    sem_label=res.sem_label, sem_prob=res.sem_prob)


def test_downsample_keeps_nearest_valid():
    world = default_world(seed=3)
    scan = render_scan(world, jnp.eye(4), CFG)
    maps = make_maps(scan)
    down = downsample_maps(maps, 2)

    v = np.asarray(maps.vertex)
    ok = np.asarray(maps.vertex_valid)
    d = np.where(ok, np.linalg.norm(v, axis=-1), np.inf)
    h, w = v.shape[:2]
    sel = np.argmin(d.reshape(h, w // 2, 2), axis=-1)

    dv = np.asarray(down.vertex)
    assert dv.shape == (h, w // 2, 3)
    for yy in range(0, h, 7):
        for xx in range(0, w // 2, 11):
            cands = v[yy, 2 * xx:2 * xx + 2]
            # the selected pixel must be one of the two bin members, with
            # (near-)minimal depth — float tie-breaks may differ from numpy
            match = np.isclose(dv[yy, xx], cands, atol=1e-6).all(axis=-1)
            assert match.any(), (yy, xx, dv[yy, xx], cands)
            picked = np.linalg.norm(dv[yy, xx])
            dmin = d[yy, 2 * xx:2 * xx + 2].min()
            if np.isfinite(dmin):
                assert picked <= dmin + 1e-4, (yy, xx, picked, dmin)
    # a bin with any valid member stays valid
    dok = np.asarray(down.vertex_valid)
    src_ok = ok.reshape(h, w // 2, 2)
    np.testing.assert_array_equal(dok, src_ok.any(axis=-1))


def test_pyramid_shapes_and_level_config():
    world = default_world(seed=3)
    maps = make_maps(render_scan(world, jnp.eye(4), CFG))
    pyr = build_pyramid(maps, 3)
    assert [m.vertex.shape[1] for m in pyr] == [360, 180, 90]
    assert level_config(CFG, 2).width == 90
    assert level_config(CFG, 0) == CFG


def test_pyramid_icp_converges_from_larger_offset():
    """Coarse-to-fine should recover a transform comfortably; also check it
    matches single-level GN for a small offset."""
    world = default_world(seed=5)
    pose0 = jnp.eye(4)
    true_inc = lie.se3_exp(jnp.asarray([0.35, 0.1, 0.0, 0.0, 0.0, 0.06],
                                       jnp.float32))
    pose1 = pose0 @ true_inc

    m0 = make_maps(render_scan(world, pose0, CFG))
    m1 = make_maps(render_scan(world, pose1, CFG))

    icp_cfg = IcpConfig(max_iterations=25)
    res = gauss_newton_pyramid(m1, m0, jnp.eye(4), icp_cfg, CFG, levels=3,
                               semantic=False)
    err = lie.se3_inverse(res.pose) @ np.asarray(true_inc)
    t_err = np.linalg.norm(np.asarray(err)[:3, 3])
    assert t_err < 0.06, t_err
    assert int(res.iterations) > 0
