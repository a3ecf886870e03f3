"""Tests for foundation utilities: stopwatch, event log, scan accumulator,
robocar reader, config XML parity."""
import json
import os
import time

import numpy as np

from semantic_suma_tpu.config import SumaConfig, config_from_xml, sweep
from semantic_suma_tpu.io.robocar import RobocarReader
from semantic_suma_tpu.utils.eventlog import EventLog
from semantic_suma_tpu.utils.scan_accumulator import ScanAccumulator
from semantic_suma_tpu.utils.timing import Stopwatch


def test_stopwatch_nesting():
    sw = Stopwatch()
    sw.tic()
    time.sleep(0.01)
    sw.tic()
    time.sleep(0.01)
    inner = sw.toc("inner")
    outer = sw.toc("outer")
    assert inner >= 0.01
    assert outer >= inner
    rep = sw.report()
    assert "inner" in rep and "outer" in rep
    assert sw.stats["inner"].count == 1


def test_stopwatch_scope():
    sw = Stopwatch()
    with sw.scope("work"):
        time.sleep(0.005)
    assert sw.stats["work"].last >= 0.005


def test_eventlog(tmp_path):
    path = str(tmp_path / "log.jsonl")
    log = EventLog("exp", path)
    log.log("loop-closure", frame=12, to=3)
    log.log("done", frames=100)
    log.close()
    lines = [json.loads(l) for l in open(path)]
    assert lines[0]["event"] == "loop-closure" and lines[0]["frame"] == 12
    assert lines[1]["frames"] == 100


def test_scan_accumulator():
    acc = ScanAccumulator(history_size=3, stride=2)
    pose = np.eye(4)
    pose[:3, 3] = [1, 0, 0]
    for i in range(8):
        acc.insert(np.ones((10, 3), np.float32), pose)
    assert acc.size() == 3  # stride 2 over 8 inserts, capped at 3
    cloud = acc.world_cloud()
    assert cloud.shape == (30, 3)
    np.testing.assert_allclose(cloud[0], [2, 1, 1])
    assert acc.world_cloud(max_points=7).shape == (7, 3)


def test_robocar_reader(tmp_path):
    """3 float64 per point, y/z negated (RobocarReader.cpp:33-49)."""
    d = tmp_path / "scans"
    d.mkdir()
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(50, 3))
    pts.tofile(d / "0001.bin")
    pts.tofile(d / "0002.bin")
    r = RobocarReader(str(d))
    assert r.count() == 2
    scan = r.read(0)
    assert scan.points.shape == (50, 3)
    np.testing.assert_allclose(scan.points,
                               pts * np.array([1.0, -1.0, -1.0]), rtol=1e-6)
    assert np.all(scan.labels == 0)


def test_config_xml_roundtrip():
    cfg = config_from_xml("/root/reference/config/default.xml")
    assert cfg.data.width == 900 and cfg.data.height == 64
    assert cfg.icp.max_iterations == 33
    assert cfg.icp.weighting == "huber"
    assert abs(cfg.map.p_stable - 0.6) < 1e-9
    assert cfg.loop.search_distance == 50
    assert cfg.approach == "frame-to-model"
    assert cfg.map.submap_dimension == 4


def test_config_sweep():
    cfg = SumaConfig()
    grid = {"icp.factor": [0.25, 0.5], "map.p_stable": [0.6, 0.7]}
    combos = list(sweep(cfg, grid))
    assert len(combos) == 4
    assert {c.icp.factor for c in combos} == {0.25, 0.5}
    assert combos[0].map.p_stable == 0.6


def test_devkit_breakdown_tables():
    """Per-length / per-speed error tables (reference kitti_utils.cpp
    saveErrorPlots outputs): a trajectory with a known constant relative
    error must report it in every populated bucket."""
    import numpy as np
    from semantic_suma_tpu.utils import metrics

    n = 400
    gt = np.tile(np.eye(4, dtype=np.float64), (n, 1, 1))
    est = gt.copy()
    for i in range(n):
        gt[i, 0, 3] = i * 1.0          # 1 m per frame -> 10 m/s at 10 Hz
        est[i, 0, 3] = i * 1.0
        est[i, 1, 3] = i * 0.01        # 1% lateral drift
    res = metrics.evaluate(gt, est, breakdown=True)
    assert res["num_segments"] > 0
    bl = res["by_length"]
    assert "100m" in bl and "300m" in bl
    for row in bl.values():
        assert abs(row["t_rel_percent"] - 1.0) < 0.1
        assert row["count"] > 0
    bs = res["by_speed"]
    assert len(bs) >= 1
    (bucket, row), = list(bs.items())[:1]
    assert "10-12m/s" in bs
    assert abs(bs["10-12m/s"]["t_rel_percent"] - 1.0) < 0.1
    # totals match the flat average
    assert abs(res["t_rel_percent"] - 1.0) < 0.1


def test_error_breakdown_plot(tmp_path):
    """plot_error_breakdown renders the devkit tl/rl/ts/rs panels
    (kitti_utils.cpp:149-191 saveErrorPlots analogue) to a PNG."""
    import numpy as np
    from semantic_suma_tpu.utils import metrics, viz

    n = 400
    gt = np.tile(np.eye(4, dtype=np.float64), (n, 1, 1))
    est = gt.copy()
    for i in range(n):
        gt[i, 0, 3] = i * 1.0
        est[i, 0, 3] = i * 1.0
        est[i, 1, 3] = i * 0.01
    res = metrics.evaluate(gt, est, breakdown=True)
    out = tmp_path / "errors.png"
    viz.plot_error_breakdown(res["by_length"], res["by_speed"],
                             path=str(out))
    assert out.exists() and out.stat().st_size > 5000


def test_eval_cli_plot_dir(tmp_path):
    """eval subcommand: --plot-dir writes the devkit path + error plots
    alongside the JSON metrics."""
    import numpy as np
    from semantic_suma_tpu.cli import main
    from semantic_suma_tpu.io.kitti import save_poses

    n = 150
    gt = np.tile(np.eye(4, dtype=np.float64), (n, 1, 1))
    est = gt.copy()
    for i in range(n):
        gt[i, 0, 3] = i * 1.0
        est[i, 0, 3] = i * 1.0
        est[i, 2, 3] = i * 0.005
    gt_f, est_f = tmp_path / "gt.txt", tmp_path / "est.txt"
    save_poses(str(gt_f), gt)
    save_poses(str(est_f), est)
    pd = tmp_path / "plots"
    assert main(["--cpu", "eval", "--gt", str(gt_f), "--est", str(est_f),
                 "--eval-breakdown", "--plot-dir", str(pd)]) == 0
    assert (pd / "traj.png").exists()
    assert (pd / "errors.png").exists()
