"""EuRoC MAV dataset loader (ASL format) — the platform-layer replacement
called for in SURVEY.md §7 L6: where the reference ingests camera frames
through the Android camera2 NDK stack (`camera_manager.cpp`,
`image_process.cpp` YUV->RGBA->gray), a TPU training/eval harness ingests
dataset sequences into pinned host buffers.

Layout (ASL):
  <root>/mav0/cam0/data.csv           timestamp_ns, filename
  <root>/mav0/cam0/data/<stamp>.png   8-bit grayscale images
  <root>/mav0/cam0/sensor.yaml        intrinsics (pinhole radtan)
  <root>/mav0/state_groundtruth_estimate0/data.csv   GT poses (optional)

PNG decoding uses PIL (no OpenCV anywhere in this framework).
"""

from __future__ import annotations

import csv
import os
from dataclasses import dataclass
from typing import Iterator, Optional

import numpy as np

from android_svo_tpu.geometry.camera import PinholeCamera


@dataclass
class EurocSequence:
    root: str
    cam_dir: str
    timestamps: list          # seconds (float)
    filenames: list
    camera: Optional[PinholeCamera]
    gt_stamps: Optional[np.ndarray] = None     # (N,) seconds
    gt_positions: Optional[np.ndarray] = None  # (N, 3)
    gt_quats: Optional[np.ndarray] = None      # (N, 4) wxyz

    def __len__(self):
        return len(self.filenames)

    def frames(self) -> Iterator[tuple[float, np.ndarray]]:
        """Yields (timestamp_s, image float32 (H, W) in [0, 255])."""
        from PIL import Image
        for ts, fn in zip(self.timestamps, self.filenames):
            path = os.path.join(self.cam_dir, "data", fn)
            img = np.asarray(Image.open(path).convert("L"), np.float32)
            yield ts, img

    def gt_at(self, t: float) -> Optional[np.ndarray]:
        """Nearest-neighbour GT position at time t (None if no GT)."""
        if self.gt_stamps is None or len(self.gt_stamps) == 0:
            return None
        i = int(np.argmin(np.abs(self.gt_stamps - t)))
        return self.gt_positions[i]


def _parse_sensor_yaml(path: str):
    """Minimal YAML reader for EuRoC sensor.yaml (no yaml dependency):
    extracts resolution, intrinsics, distortion_coefficients."""
    vals = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            for key in ("resolution", "intrinsics",
                        "distortion_coefficients"):
                if line.startswith(key + ":"):
                    arr = line.split("[", 1)[1].rsplit("]", 1)[0]
                    vals[key] = [float(x) for x in arr.split(",")]
    return vals


def load_imu(root: str, imu: str = "imu0") -> Optional[dict]:
    """IMU stream loader — the analog of the reference's accelerometer
    plumbing (`sensor_manager.cpp:35-61`; dead code in the live path,
    `android_main.cpp:320-321`).  Provided for parity and for downstream
    gravity-alignment / motion priors.  Returns
    {"stamps": (N,), "gyro": (N,3) rad/s, "accel": (N,3) m/s^2} or None."""
    imu_csv = os.path.join(root, "mav0", imu, "data.csv")
    if not os.path.exists(imu_csv):
        return None
    rows = []
    with open(imu_csv) as f:
        for row in csv.reader(f):
            if not row or row[0].startswith("#"):
                continue
            rows.append([float(x) for x in row[:7]])
    arr = np.asarray(rows)
    return {"stamps": arr[:, 0] * 1e-9, "gyro": arr[:, 1:4],
            "accel": arr[:, 4:7]}


def load_euroc(root: str, cam: str = "cam0",
               load_gt: bool = True) -> EurocSequence:
    cam_dir = os.path.join(root, "mav0", cam)
    stamps, files = [], []
    with open(os.path.join(cam_dir, "data.csv")) as f:
        for row in csv.reader(f):
            if not row or row[0].startswith("#"):
                continue
            stamps.append(int(row[0]) * 1e-9)
            files.append(row[1].strip())

    camera = None
    yaml_path = os.path.join(cam_dir, "sensor.yaml")
    if os.path.exists(yaml_path):
        v = _parse_sensor_yaml(yaml_path)
        if "intrinsics" in v and "resolution" in v:
            fx, fy, cx, cy = v["intrinsics"]
            w, h = (int(x) for x in v["resolution"])
            d = v.get("distortion_coefficients", [0, 0, 0, 0])
            d = (d + [0.0] * 5)[:5]
            camera = PinholeCamera.create(w, h, fx, fy, cx, cy, *d)

    gt_stamps = gt_pos = gt_quat = None
    gt_csv = os.path.join(root, "mav0", "state_groundtruth_estimate0",
                          "data.csv")
    if load_gt and os.path.exists(gt_csv):
        rows = []
        with open(gt_csv) as f:
            for row in csv.reader(f):
                if not row or row[0].startswith("#"):
                    continue
                rows.append([float(x) for x in row[:8]])
        arr = np.asarray(rows)
        gt_stamps = arr[:, 0] * 1e-9
        gt_pos = arr[:, 1:4]
        gt_quat = arr[:, 4:8]

    return EurocSequence(root=root, cam_dir=cam_dir, timestamps=stamps,
                         filenames=files, camera=camera,
                         gt_stamps=gt_stamps, gt_positions=gt_pos,
                         gt_quats=gt_quat)
