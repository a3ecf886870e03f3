"""Interactive 3D viewer export: standalone HTML with embedded WebGL
renderer (the offline counterpart of the reference's ViewportWidget)."""
import base64
import re

import numpy as np

from semantic_suma_tpu.utils.viz3d import export_html


def _decode(html, name, dtype):
    m = re.search(rf'decode\("([A-Za-z0-9+/=]*)", {re.escape(name)}\)'
                  .replace("decode", name + "_X"), html)
    return m


def test_export_html_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    pos = rng.normal(0, 10, (5000, 3)).astype(np.float32)
    col = rng.integers(0, 255, (5000, 3)).astype(np.uint8)
    traj = np.tile(np.eye(4, dtype=np.float32), (7, 1, 1))
    traj[:, 0, 3] = np.arange(7)
    out = tmp_path / "v.html"
    export_html(str(out), pos, col, trajectory=traj)
    html = out.read_text()

    # structurally a standalone page with a WebGL canvas + controls
    for token in ("<canvas", "getContext(\"webgl\")", "gl.POINTS",
                  "LINE_STRIP", "onmousedown", "onwheel",
                  "requestAnimationFrame"):
        assert token in html, token
    # the .format templating must not have mangled the JS braces
    assert "{pos_b64}" not in html and "{{" not in html

    # embedded buffers round-trip exactly
    blobs = re.findall(r'decode\("([A-Za-z0-9+/=]*)"', html)
    assert len(blobs) == 4
    dec_pos = np.frombuffer(base64.b64decode(blobs[0]), np.float32)
    dec_col = np.frombuffer(base64.b64decode(blobs[1]), np.uint8)
    dec_traj = np.frombuffer(base64.b64decode(blobs[2]), np.float32)
    dec_car = np.frombuffer(base64.b64decode(blobs[3]), np.float32)
    assert np.array_equal(dec_pos.reshape(-1, 3), pos)
    assert np.array_equal(dec_col.reshape(-1, 3), col)
    assert np.array_equal(dec_traj.reshape(-1, 3), traj[:, :3, 3])
    # car glyph placed at the last pose: box + arrow line segments
    car = dec_car.reshape(-1, 3)
    assert car.shape[0] == 30  # 12 box edges + 3 arrow segments, 2 pts each
    assert abs(car[:, 0].mean() - traj[-1, 0, 3]) < 3.0


def test_export_html_subsamples(tmp_path):
    pos = np.zeros((1000, 3), np.float32)
    col = np.zeros((1000, 3), np.uint8)
    out = tmp_path / "v2.html"
    export_html(str(out), pos, col, max_points=100)
    html = out.read_text()
    blobs = re.findall(r'decode\("([A-Za-z0-9+/=]*)"', html)
    assert len(base64.b64decode(blobs[0])) == 100 * 3 * 4
