"""EuRoC MAV dataset loader (ASL directory format).

Replaces the reference's rosbag playback (ros/launch/client_and_server
.launch plays EuRoC bags into /cam0/image_raw). Reads the standard
mav0/cam0/data.csv + mav0/imu0/data.csv layout; images are decoded lazily
per frame. Grayscale decoding uses a minimal PGM/PNG path so no OpenCV
dependency is needed (EuRoC ships 8-bit grayscale PNG).
"""

from __future__ import annotations

import csv
import os
from typing import Iterator, List, Optional, Tuple

import numpy as np


def _read_png_gray(path: str) -> np.ndarray:
    """Decode an 8-bit grayscale PNG via matplotlib (present in the image)
    or PIL, whichever is available."""
    try:
        from PIL import Image  # noqa: WPS433
        return np.asarray(Image.open(path).convert("L"), np.float32)
    except ImportError:
        import matplotlib.image as mpimg
        img = mpimg.imread(path)
        if img.ndim == 3:
            img = img[..., :3].mean(-1)
        if img.max() <= 1.0:
            img = img * 255.0
        return img.astype(np.float32)


class EurocSequence:
    """Iterates (timestamp_s, gray_image) with optional per-frame IMU
    batches, mirroring the reference's mono-inertial grabber sync
    (ros/src/MonoInertialNode.cc SyncWithImu)."""

    def __init__(self, root: str, cam: str = "cam0", imu: bool = False,
                 max_frames: Optional[int] = None):
        mav = os.path.join(root, "mav0")
        cam_dir = os.path.join(mav, cam)
        self.data_dir = os.path.join(cam_dir, "data")
        self.frames: List[Tuple[float, str]] = []
        with open(os.path.join(cam_dir, "data.csv")) as f:
            for row in csv.reader(f):
                if not row or row[0].startswith("#"):
                    continue
                self.frames.append((int(row[0]) * 1e-9, row[1].strip()))
        if max_frames:
            self.frames = self.frames[:max_frames]
        self.imu: Optional[np.ndarray] = None
        if imu:
            imu_rows = []
            with open(os.path.join(mav, "imu0", "data.csv")) as f:
                for row in csv.reader(f):
                    if not row or row[0].startswith("#"):
                        continue
                    imu_rows.append([float(x) for x in row])
            arr = np.asarray(imu_rows)
            arr[:, 0] *= 1e-9
            self.imu = arr  # (t, gx, gy, gz, ax, ay, az)

    def __len__(self) -> int:
        return len(self.frames)

    def __iter__(self) -> Iterator:
        prev_t = None
        for t, name in self.frames:
            img = _read_png_gray(os.path.join(self.data_dir, name))
            if self.imu is None:
                yield t, img
            else:
                if prev_t is None:
                    batch = np.zeros((0, 7))
                else:
                    sel = (self.imu[:, 0] > prev_t) & (self.imu[:, 0] <= t)
                    batch = self.imu[sel]
                dt = np.diff(batch[:, 0], prepend=prev_t or t)
                yield t, img, batch[:, 4:7], batch[:, 1:4], dt
            prev_t = t


def available(root: str) -> bool:
    return os.path.isdir(os.path.join(root, "mav0", "cam0", "data"))
