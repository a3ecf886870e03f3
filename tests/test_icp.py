"""Projective ICP tests: Jacobian products vs numpy oracle, and closed-loop
frame-to-frame alignment on the synthetic raycast world."""
import numpy as np
import jax.numpy as jnp

from semantic_suma_tpu.config import DataConfig, IcpConfig
from semantic_suma_tpu.io.simulation import (SimulationReader, default_world,
                                             render_scan)
from semantic_suma_tpu.ops import icp
from semantic_suma_tpu.ops.projection import project_scan
from semantic_suma_tpu.ops.filters import compute_normals
from semantic_suma_tpu.utils import lie

CFG = DataConfig(width=360, height=48)
ICP = IcpConfig(max_iterations=20)


def make_maps(scan):
    res = project_scan(scan.points, scan.labels, scan.probs,
                       cfg=CFG, point_valid=scan.valid)
    normal, nvalid = compute_normals(res.vertex_map, res.vertex_valid)
    return icp.Maps(vertex=res.vertex_map, normal=normal,
                    vertex_valid=res.vertex_valid, normal_valid=nvalid,
                    sem_label=res.sem_label, sem_prob=res.sem_prob)


def np_jacobian_products(pose, data, model, cfg, icp_cfg):
    """Straightforward numpy oracle of Frame2Model_jacobians.geom (nearest
    sampling, no semantics)."""
    h, w = data.vertex.shape[:2]
    vm = np.asarray(model.vertex)
    nm = np.asarray(model.normal)
    mv = np.asarray(model.vertex_valid & model.normal_valid)
    JtJ = np.zeros((6, 6))
    Jtf = np.zeros(6)
    err = 0.0
    n_in = n_out = n_inv = 0
    pose = np.asarray(pose)
    dvalid = np.asarray(data.vertex_valid & data.normal_valid)
    for yy in range(h):
        for xx in range(w):
            if not dvalid[yy, xx]:
                continue
            v = pose[:3, :3] @ np.asarray(data.vertex)[yy, xx] + pose[:3, 3]
            n = pose[:3, :3] @ np.asarray(data.normal)[yy, xx]
            d = np.linalg.norm(v)
            yaw = np.arctan2(v[1], v[0])
            pitch = -np.arcsin(v[2] / d)
            u = 0.5 * (-yaw / np.pi + 1.0) * cfg.width
            vv = (1.0 - (np.degrees(pitch) + cfg.fov_up) / cfg.fov) * cfg.height
            if not (0 <= u < cfg.width and 0 <= vv < cfg.height):
                n_inv += 1
                continue
            xi, yi = int(u), int(vv)
            if not mv[yi, xi]:
                n_inv += 1
                continue
            vmm, nmm = vm[yi, xi], nm[yi, xi]
            r = nmm @ (v - vmm)
            weight = 1.0
            if abs(r) > icp_cfg.factor:
                weight = icp_cfg.factor / abs(r)
            inl = (np.linalg.norm(v - vmm) <= icp_cfg.max_distance and
                   nmm @ n >= np.cos(np.radians(icp_cfg.max_angle)))
            err += weight * r * r
            if inl:
                cp = np.cross(v, nmm)
                J = np.concatenate([nmm, cp])
                JtJ += weight * np.outer(J, J)
                Jtf += weight * r * J
                n_in += 1
            else:
                n_out += 1
    return JtJ, Jtf, err, n_in, n_out, n_inv


def test_jacobian_products_match_oracle():
    small = DataConfig(width=90, height=16)
    world = default_world(seed=2)
    s0 = render_scan(world, jnp.eye(4), small)
    s1 = render_scan(world, jnp.asarray(lie.se3_exp(
        jnp.asarray([0.3, 0.05, 0.0, 0.0, 0.0, 0.04]))), small)

    def mk(s):
        res = project_scan(s.points, s.labels, s.probs, cfg=small,
                           point_valid=s.valid)
        normal, nvalid = compute_normals(res.vertex_map, res.vertex_valid)
        return icp.Maps(res.vertex_map, normal, res.vertex_valid, nvalid,
                        res.sem_label, res.sem_prob)

    data, model = mk(s1), mk(s0)
    pose = jnp.eye(4)
    jtj, jtf, stats = icp.jacobian_products(
        pose, data, model, ICP, small, semantic=False, bilinear=False)
    ojtj, ojtf, oerr, oin, oout, oinv = np_jacobian_products(
        pose, data, model, small, ICP)
    scale = max(np.abs(ojtj).max(), 1.0)
    np.testing.assert_allclose(np.asarray(jtj), ojtj, atol=2e-4 * scale)
    np.testing.assert_allclose(np.asarray(jtf), ojtf,
                               atol=2e-4 * max(np.abs(ojtf).max(), 1.0))
    np.testing.assert_allclose(float(stats.error), oerr, rtol=1e-4)
    assert int(stats.inlier) == oin
    assert int(stats.outlier) == oout


def test_gauss_newton_recovers_motion():
    """Frame-to-frame ICP must recover a known small motion on clean data."""
    world = default_world(seed=0)
    gt_inc = lie.se3_exp(jnp.asarray([0.35, 0.1, 0.01, 0.004, 0.006, 0.03]))
    pose0 = jnp.eye(4)
    pose1 = pose0 @ gt_inc

    model = make_maps(render_scan(world, pose0, CFG))
    data = make_maps(render_scan(world, pose1, CFG))

    result = icp.gauss_newton(data, model, jnp.eye(4), ICP, CFG,
                              semantic=False)
    # estimated increment maps data (scan at pose1) into model frame (pose0):
    # should equal pose0^-1 @ pose1 = gt_inc
    est = np.asarray(result.pose)
    err = np.asarray(lie.se3_log(jnp.asarray(
        np.linalg.inv(est) @ np.asarray(gt_inc), jnp.float32)))
    assert np.abs(err[:3]).max() < 0.03, err
    assert np.abs(err[3:]).max() < 0.005, err
    assert int(result.iterations) >= 2


def test_gauss_newton_with_constant_velocity_init():
    """With a good init the solver should converge in very few iterations."""
    world = default_world(seed=1)
    gt_inc = lie.se3_exp(jnp.asarray([0.8, 0.0, 0.0, 0.0, 0.0, 0.05]))
    model = make_maps(render_scan(world, jnp.eye(4), CFG))
    data = make_maps(render_scan(world, gt_inc, CFG))

    res_good = icp.gauss_newton(data, model, gt_inc, ICP, CFG, semantic=False)
    err = np.asarray(lie.se3_log(jnp.asarray(
        np.linalg.inv(np.asarray(res_good.pose)) @ np.asarray(gt_inc),
        jnp.float32)))
    assert np.abs(err).max() < 0.02


def test_sequential_odometry_on_circle():
    """Integrate frame-to-frame ICP along a circular trajectory; accumulated
    drift over 10 scans of clean data must stay small."""
    reader = SimulationReader(CFG, n_scans=60, radius=18.0)
    est_pose = np.eye(4)
    prev = make_maps(reader.read(0))
    t0 = jnp.eye(4)
    errs = []
    for i in range(1, 10):
        cur = make_maps(reader.read(i))
        res = icp.gauss_newton(cur, prev, t0, ICP, CFG, semantic=False)
        inc = np.asarray(res.pose)
        est_pose = est_pose @ inc
        t0 = jnp.asarray(inc)  # constant-velocity init
        prev = cur
        gt = np.asarray(reader.gt_pose(i)) @ np.linalg.inv(
            np.asarray(reader.gt_pose(0)))
        gt = np.linalg.inv(np.asarray(reader.gt_pose(0))) @ np.asarray(
            reader.gt_pose(i))
        errs.append(np.linalg.norm(est_pose[:3, 3] - gt[:3, 3]))
    assert errs[-1] < 0.25, errs


def test_semantic_weighting_downweights_movable_mismatch():
    """A movable-class model label with label mismatch must reduce weights."""
    small = DataConfig(width=90, height=16)
    world = default_world(seed=2)
    s0 = render_scan(world, jnp.eye(4), small)
    res = project_scan(s0.points, s0.labels, s0.probs, cfg=small,
                       point_valid=s0.valid)
    normal, nvalid = compute_normals(res.vertex_map, res.vertex_valid)
    # pretend the whole model is 'car' while data says 'building'
    model = icp.Maps(res.vertex_map, normal, res.vertex_valid, nvalid,
                     jnp.full_like(res.sem_label, 10), res.sem_prob)
    data = icp.Maps(res.vertex_map, normal, res.vertex_valid, nvalid,
                    jnp.full_like(res.sem_label, 50),
                    jnp.full_like(res.sem_prob, 0.9))
    jtj_sem, _, _ = icp.jacobian_products(jnp.eye(4), data, model, ICP, small,
                                          semantic=True, bilinear=False)
    jtj_geo, _, _ = icp.jacobian_products(jnp.eye(4), data, model, ICP, small,
                                          semantic=False, bilinear=False)
    # mismatch prob 0.9 -> weight 0.1
    np.testing.assert_allclose(np.asarray(jtj_sem), 0.1 * np.asarray(jtj_geo),
                               rtol=1e-3)
