"""Oxford RobotCar-format binary scan reader.

Counterpart of ``/root/reference/src/io/RobocarReader.{h,cpp}``: lists the
binary scans of a RobotCar LiDAR directory and decodes each file as a
float64 column matrix — the RobotCar SDK stores an N-column array of
[x, y, z, intensity] rows written column-major (the reference reads 4
doubles per point). No semantics are available for this format.
"""

from __future__ import annotations

import os

import numpy as np

from .kitti import KittiScan


class RobocarReader:
    """LaserscanReader contract: read/count/seek over RobotCar .bin files."""

    def __init__(self, scan_dir: str):
        self.files = sorted(
            os.path.join(scan_dir, f) for f in os.listdir(scan_dir)
            if f.endswith(".bin"))
        if not self.files:
            raise FileNotFoundError(f"no .bin scans under {scan_dir}")

    def count(self) -> int:
        return len(self.files)

    def is_seekable(self) -> bool:
        return True

    def read(self, idx: int) -> KittiScan:
        raw = np.fromfile(self.files[idx], dtype=np.float64)
        # RobotCar velodyne binaries: 4 x N doubles, column-major rows
        pts = raw.reshape(4, -1).T
        points = pts[:, :3].astype(np.float32)
        rem = pts[:, 3].astype(np.float32)
        m = rem.max()
        if m > 0:
            rem = rem / m
        n = points.shape[0]
        return KittiScan(points=points, remissions=rem,
                         labels=np.zeros(n, np.int32),
                         probs=np.ones(n, np.float32))
