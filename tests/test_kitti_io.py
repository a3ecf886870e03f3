"""KITTI IO + odometry metrics tests on synthetic files."""
import os

import numpy as np
import pytest

from semantic_suma_tpu.io import kitti
from semantic_suma_tpu.utils import metrics


def make_seq(tmp_path, n_scans=3, n_pts=100, with_labels=True,
             with_calib=True, with_poses=True):
    seq = tmp_path / "04"
    (seq / "velodyne").mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(n_scans):
        pts = rng.uniform(-30, 30, (n_pts, 4)).astype(np.float32)
        pts[:, 3] = rng.uniform(0, 3, n_pts)
        pts.tofile(seq / "velodyne" / f"{i:06d}.bin")
    if with_labels:
        (seq / "labels").mkdir()
        for i in range(n_scans):
            lab = rng.choice([0, 10, 40, 50], n_pts).astype(np.uint32)
            lab |= np.uint32(1) << 16  # instance bits must be masked off
            lab.tofile(seq / "labels" / f"{i:06d}.label")
    if with_calib:
        tr = np.array([[0, -1, 0, 0.1], [0, 0, -1, -0.05], [1, 0, 0, 0.2]])
        lines = []
        for name in ("P0", "P1", "P2", "P3"):
            lines.append(name + ": " + " ".join(
                str(v) for v in np.eye(3, 4).reshape(-1)))
        lines.append("Tr: " + " ".join(str(v) for v in tr.reshape(-1)))
        (seq / "calib.txt").write_text("\n".join(lines) + "\n")
    if with_poses:
        poses = np.tile(np.eye(4), (n_scans, 1, 1))
        for i in range(n_scans):
            poses[i, 0, 3] = i * 1.5
        rows = ["\n".join(" ".join(str(v) for v in p[:3, :4].reshape(-1))
                          for p in poses)]
        (seq / "poses.txt").write_text(rows[0] + "\n")
    return str(seq)


def test_read_bin_and_remission_normalized(tmp_path):
    seq = make_seq(tmp_path)
    reader = kitti.KITTIReader(seq, prefetch=False)
    assert reader.count() == 3
    scan = reader.read(0)
    assert scan.points.shape == (100, 3)
    assert scan.remissions.max() <= 1.0 + 1e-6
    assert scan.labels.shape == (100,)
    assert set(np.unique(scan.labels)).issubset({0, 10, 40, 50})
    # GT labels get prob 1.0 where labeled
    assert np.all((scan.probs == 1.0) == (scan.labels > 0))


def test_calib_and_pose_roundtrip(tmp_path):
    seq = make_seq(tmp_path)
    reader = kitti.KITTIReader(seq, prefetch=False)
    assert reader.tr is not None
    gt = reader.gt_poses()
    assert gt is not None and gt.shape == (3, 4, 4)
    # save in camera convention then reload: must round-trip
    out = str(tmp_path / "est.txt")
    kitti.save_poses(out, gt, reader.tr)
    back = kitti.load_poses(out, reader.tr)
    np.testing.assert_allclose(back, gt, atol=1e-6)


def test_no_labels_fallback(tmp_path):
    seq = make_seq(tmp_path, with_labels=False)
    reader = kitti.KITTIReader(seq, prefetch=False)
    scan = reader.read(1)
    assert np.all(scan.labels == 0)
    assert np.all(scan.probs == 1.0)


def straight_line(n, step=1.0):
    poses = np.tile(np.eye(4), (n, 1, 1))
    poses[:, 0, 3] = np.arange(n) * step
    return poses


def test_metrics_perfect_trajectory():
    gt = straight_line(1500, 1.0)  # 1.5 km: all segment lengths present
    res = metrics.evaluate(gt, gt.copy())
    assert res["t_rel_percent"] < 1e-9
    assert res["r_rel_deg_per_100m"] < 1e-9
    assert res["ate_rmse_m"] < 1e-9
    assert res["num_segments"] > 100


def test_metrics_known_scale_error():
    gt = straight_line(1500, 1.0)
    est = straight_line(1500, 1.02)  # 2% longer steps
    res = metrics.evaluate(gt, est)
    assert abs(res["t_rel_percent"] - 2.0) < 0.1, res
    assert res["r_rel_deg_per_100m"] < 1e-6


def test_metrics_rotation_error():
    # constant yaw-rate error of 0.01 rad per 1 m step
    n = 300
    gt = straight_line(n, 1.0)
    est = np.tile(np.eye(4), (n, 1, 1))
    pose = np.eye(4)
    inc = np.eye(4)
    inc[0, 3] = 1.0
    c, s = np.cos(0.01), np.sin(0.01)
    inc[:2, :2] = [[c, -s], [s, c]]
    for i in range(n):
        est[i] = pose
        pose = pose @ inc
    res = metrics.evaluate(gt, est)
    # 0.01 rad/m = 0.573 deg/m = 57.3 deg/100m
    assert abs(res["r_rel_deg_per_100m"] - 57.3) < 3.0, res


def test_ate_alignment_removes_rigid_offset():
    gt = straight_line(100, 1.0)
    rot = np.eye(4)
    th = 0.3
    rot[:2, :2] = [[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]]
    rot[:3, 3] = [5.0, -3.0, 1.0]
    est = np.einsum("ij,njk->nik", rot, gt)
    assert metrics.ate_rmse(gt, est) < 1e-6
    assert metrics.ate_rmse(gt, est, align=False) > 1.0


def test_native_loader_matches_numpy(tmp_path):
    """The C++ prefetching loader must return exactly what numpy reads."""
    pytest.importorskip("ctypes")
    seq = make_seq(tmp_path, n_scans=5, n_pts=333)
    from semantic_suma_tpu.io.native_io import NativeScanLoader
    files = sorted(os.path.join(seq, "velodyne", f)
                   for f in os.listdir(os.path.join(seq, "velodyne")))
    loader = NativeScanLoader(files, prefetch_depth=2)
    try:
        # sequential, repeated, and random-seek access
        for idx in (0, 1, 2, 2, 4, 1, 3):
            pts, rem = loader.read(idx)
            ref_pts, ref_rem = kitti.read_bin(files[idx])
            np.testing.assert_array_equal(pts, ref_pts)
            np.testing.assert_allclose(rem, ref_rem)
    finally:
        loader.close()


def test_reader_with_native_prefetch(tmp_path):
    seq = make_seq(tmp_path, n_scans=3)
    r_native = kitti.KITTIReader(seq, prefetch=True)
    r_numpy = kitti.KITTIReader(seq, prefetch=False)
    for i in range(3):
        a = r_native.read(i)
        b = r_numpy.read(i)
        np.testing.assert_array_equal(a.points, b.points)
        np.testing.assert_array_equal(a.labels, b.labels)


def test_robocar_reader_roundtrip(tmp_path):
    """3 float64 per point, y/z negated (reference RobocarReader.cpp:33-49)."""
    from semantic_suma_tpu.io.robocar import RobocarReader
    rng = np.random.default_rng(7)
    scans = []
    for i in range(2):
        pts = rng.uniform(-40, 40, (50, 3))
        pts.astype(np.float64).tofile(tmp_path / f"{i:04d}.bin")
        scans.append(pts)
    r = RobocarReader(str(tmp_path))
    assert r.count() == 2 and r.is_seekable()
    for i in range(2):
        s = r.read(i)
        expect = scans[i] * np.array([1.0, -1.0, -1.0])
        np.testing.assert_allclose(s.points, expect, rtol=1e-6)
        assert s.points.dtype == np.float32
        np.testing.assert_array_equal(s.remissions, 0.0)
        np.testing.assert_array_equal(s.labels, 0)
