"""Real-data-path integration: KITTI-format files on disk -> KITTIReader
(+ native prefetch) -> CLI run -> camera-frame pose export -> devkit eval.

No KITTI data ships in this environment, so the synthetic raycast world is
exported in the exact SemanticKITTI on-disk layout
(``io/kitti_export.py``; byte format per ``KITTIReader.cpp:136-203``) and
the ENTIRE file-based pipeline is driven end-to-end — the code path a user
with real KITTI data would hit, minus the sensor.
"""
import json
import os

import numpy as np
import pytest

from semantic_suma_tpu.cli import main
from semantic_suma_tpu.config import DataConfig
from semantic_suma_tpu.io.kitti import KITTIReader, load_poses, parse_calib
from semantic_suma_tpu.io.kitti_export import (DEFAULT_TR,
                                               export_synthetic_sequence)


def test_kitti_export_reader_roundtrip(tmp_path):
    cfg = DataConfig(width=120, height=24)
    seq = tmp_path / "00"
    gt = export_synthetic_sequence(str(seq), 3, cfg, radius=10.0)

    reader = KITTIReader(str(seq))
    assert reader.count() == 3
    assert reader.label_files is not None
    scan = reader.read(0)
    assert scan.points.shape[1] == 3 and scan.points.shape[0] > 500
    # labels come back as raw SemanticKITTI ids
    assert set(np.unique(scan.labels)) <= {0, 10, 40, 50}
    # remission was constant 0.5 -> max-normalized to 1.0
    assert np.allclose(scan.remissions, 1.0)
    # calib Tr parses and poses round-trip through the camera frame:
    # load_poses(tr) inverts save_poses' Tr @ P @ Tr^-1
    tr = parse_calib(str(seq / "calib.txt"))["Tr"]
    assert np.allclose(tr, DEFAULT_TR, atol=1e-9)
    gt_back = load_poses(str(seq / "poses.txt"), tr)
    assert np.allclose(gt_back, gt, atol=1e-6)
    # reader auto-discovers them the same way
    auto = reader.gt_poses()
    assert auto is not None and np.allclose(auto, gt, atol=1e-6)


@pytest.mark.slow
def test_kitti_cli_end_to_end(tmp_path, capsys):
    """cli run --dataset over exported files + --eval + pose export, then
    cli eval on the exported files again (the full user workflow)."""
    cfg = DataConfig(width=120, height=24)
    seq = tmp_path / "04"
    n = 10
    export_synthetic_sequence(str(seq), n, cfg, radius=10.0, step=1.0)

    xml = tmp_path / "cfg.xml"
    xml.write_text("""<config>
<param name="data_width" type="integer">120</param>
<param name="data_height" type="integer">24</param>
<param name="model_width" type="integer">120</param>
<param name="model_height" type="integer">24</param>
</config>
""")
    est = tmp_path / "est.txt"
    rc = main(["run", "--config", str(xml), "--dataset", str(seq),
               "--no-loop-closure", "--surfel-capacity", str(1 << 15),
               "--active-capacity", str(1 << 13),
               "--export-poses", str(est), "--eval"])
    assert rc == 0
    out = capsys.readouterr().out
    metrics = json.loads(out[out.index("{"):])
    # exported pose file is in the camera frame; the eval inside cmd_run
    # compares velodyne-frame trajectories
    assert metrics["ate_rmse_m"] < 0.5, metrics
    assert os.path.getsize(est) > 0

    # standalone eval subcommand on the files (camera frame both sides)
    rc = main(["eval", "--gt", str(seq / "poses.txt"), "--est", str(est),
               "--calib", str(seq / "calib.txt")])
    assert rc == 0
    out2 = capsys.readouterr().out
    metrics2 = json.loads(out2[out2.index("{"):])
    assert metrics2["ate_rmse_m"] == pytest.approx(metrics["ate_rmse_m"],
                                                 abs=1e-6)
