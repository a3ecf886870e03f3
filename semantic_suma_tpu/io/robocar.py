"""Oxford RobotCar-format binary scan reader.

Counterpart of ``/root/reference/src/io/RobocarReader.{h,cpp}``: lists the
``.bin`` scans of a RobotCar LiDAR directory and decodes each file as a
flat sequence of 3 float64 values per point (x, y, z), negating y and z to
bring the cloud into the engine's sensor frame — exactly the contract of
``RobocarReader.cpp:33-49``. No remissions and no semantics exist in this
format; remission defaults to zero and labels to "unlabeled".
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
        # 3 doubles per point, row-major [x y z]; sensor frame requires
        # negated y and z (reference RobocarReader.cpp:45-49).
        pts = raw.reshape(-1, 3).astype(np.float32)
        points = pts * np.array([1.0, -1.0, -1.0], np.float32)
        n = points.shape[0]
        return KittiScan(points=points,
                         remissions=np.zeros(n, np.float32),
                         labels=np.zeros(n, np.int32),
                         probs=np.ones(n, np.float32))
