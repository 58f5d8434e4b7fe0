"""View-of-Delft (VoD) dataparser.

cf. reference nerfstudio/data/dataparsers/vod_dataparser.py: KITTI-format
camera / Velodyne-64 / 3+1D radar with odometry-chained poses; radar scans at
the camera timestamps; frame-range sequences (:70-98).

Requires the `vod-tudelft` devkit or a KITTI-format directory tree; imported
lazily.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Tuple

import numpy as np

from neuradar_tpu.cameras.cameras import CameraType
from neuradar_tpu.data.dataparsers.base import (
    DataparserOutputs,
    linspaced_split,
    recenter_poses,
    scene_box_from_poses,
    zero_base_times,
)
from neuradar_tpu.data.dataparsers.zod import OPENCV_TO_NERF

VOD_RADAR_FOV = dict(
    min_azimuth=-1.0, max_azimuth=1.0, min_elevation=-0.39, max_elevation=0.49,
    azimuth_step=0.02, elevation_step=0.02,
)
VOD_SEQUENCES = {
    # frame ranges of the reference's sequence table (vod_dataparser.py:70-98)
    "00": (0, 540),
    "01": (541, 1060),
    "02": (1061, 1680),
    "03": (1681, 2200),
    "04": (2201, 2920),
}
FRAME_RATE = 10.0


@dataclass
class VodDataParserConfig:
    sequence: str = "00"
    data: str = "data/vod"
    eval_fraction: float = 0.125

    def setup(self) -> "VodDataParser":
        return VodDataParser(self)


class VodDataParser:
    def __init__(self, config: VodDataParserConfig):
        self.config = config

    def get_dataparser_outputs(self) -> DataparserOutputs:
        cfg = self.config
        root = Path(cfg.data)
        if not root.exists():  # pragma: no cover - dataset not in CI image
            raise FileNotFoundError(
                f"VoD dataset not found at {root}. Use 'neuradar-synthetic' for dataset-free runs."
            )
        lo, hi = VOD_SEQUENCES.get(cfg.sequence, (0, 100))
        frames = list(range(lo, hi + 1))

        import PIL.Image

        pose_dir = root / "lidar" / "training" / "pose"
        img_dir = root / "lidar" / "training" / "image_2"
        lidar_dir = root / "lidar" / "training" / "velodyne"
        radar_dir = root / "radar" / "training" / "velodyne"
        calib_dir = root / "lidar" / "training" / "calib"

        def read_calib(idx):
            d = {}
            for line in open(calib_dir / f"{idx:05d}.txt"):
                if ":" in line:
                    k, v = line.split(":", 1)
                    d[k.strip()] = np.fromstring(v, sep=" ")
            return d

        c2ws, l2ws, r2ws, intr, images = [], [], [], [], []
        lidar_points, radar_points = [], []
        times = []
        for fi in frames:
            pose_file = pose_dir / f"{fi:05d}.json"
            if not pose_file.exists():
                continue
            import json

            odom = json.load(open(pose_file))
            # devkit FrameTransformMatrix assigns t_odom_camera straight from
            # the pose json's camelCase 'odomToCamera' — it is the CAMERA pose
            # in the odom frame (the reference uses it as camera_to_odom,
            # vod_dataparser.py:502-512); sensor poses chain through the
            # camera: l2w = cam2odom @ lidar_to_cam (vod_dataparser.py:183)
            key = "odomToCamera" if "odomToCamera" in odom else list(odom)[0]
            cam2odom = np.asarray(odom[key], np.float64).reshape(4, 4)
            calib = read_calib(fi)
            P2 = calib["P2"].reshape(3, 4)
            Tr = np.vstack([calib["Tr_velo_to_cam"].reshape(3, 4), [0, 0, 0, 1]])  # lidar -> cam
            l2w = cam2odom @ Tr
            # radar extrinsic from the radar split's calib (its Tr maps
            # radar -> cam, vod_dataparser.py:255); lidar pose as fallback
            radar_calib = root / "radar" / "training" / "calib" / f"{fi:05d}.txt"
            r2w = l2w
            if radar_calib.exists():
                rd = {}
                for line in open(radar_calib):
                    if ":" in line:
                        k2, v2 = line.split(":", 1)
                        rd[k2.strip()] = np.fromstring(v2, sep=" ")
                tr_line = rd.get("Tr_velo_to_cam")  # calib file may lack the line
                if tr_line is not None and tr_line.size == 12:
                    r2w = cam2odom @ np.vstack([tr_line.reshape(3, 4), [0, 0, 0, 1]])
            c2w = cam2odom[:3, :4].copy()
            c2w[:3, :3] = c2w[:3, :3] @ OPENCV_TO_NERF
            c2ws.append(c2w)
            l2ws.append(l2w[:3, :4])
            r2ws.append(r2w[:3, :4])
            intr.append([P2[0, 0], P2[1, 1], P2[0, 2], P2[1, 2]])
            images.append(np.asarray(PIL.Image.open(img_dir / f"{fi:05d}.jpg")))
            pts = np.fromfile(lidar_dir / f"{fi:05d}.bin", np.float32).reshape(-1, 4)
            lidar_points.append(
                np.concatenate([pts[:, :3], pts[:, 3:4], np.zeros((len(pts), 2), np.float32)], axis=1)
            )
            rad = np.fromfile(radar_dir / f"{fi:05d}.bin", np.float32).reshape(-1, 7)
            radar_points.append(rad[:, :3])
            times.append(fi / FRAME_RATE)

        images = np.stack(images)
        c2ws = np.stack(c2ws).astype(np.float32)
        l2ws = np.stack(l2ws).astype(np.float32)
        r2ws = np.stack(r2ws).astype(np.float32)
        times = np.asarray(times, np.float64)

        trajectories: list = []
        (tsets, duration) = zero_base_times([times], trajectories)
        (psets, center) = recenter_poses([c2ws, l2ws, r2ws])
        c2ws, l2ws, r2ws = psets
        box = scene_box_from_poses(psets)
        n = len(c2ws)
        return DataparserOutputs(
            camera_to_worlds=c2ws,
            intrinsics=np.asarray(intr, np.float32),
            image_size=(images.shape[1], images.shape[2]),
            camera_type=np.full(n, int(CameraType.PERSPECTIVE)),
            distortion_params=None,
            camera_times=tsets[0].astype(np.float32),
            camera_sensor_idxs=np.zeros(n, np.int64),
            images=images,
            lidar_to_worlds=l2ws,
            lidar_times=tsets[0].astype(np.float32),
            lidar_sensor_idxs=np.ones(n, np.int64),
            lidar_points=lidar_points,
            radar_to_worlds=r2ws,
            radar_times=tsets[0].astype(np.float32),
            radar_sensor_idxs=np.full(n, 2, np.int64),
            radar_points=radar_points,
            radar_fov=dict(VOD_RADAR_FOV),
            scene_box=box,
            trajectories=trajectories,
            duration=duration,
            sensor_idx_to_name={0: "camera", 1: "lidar", 2: "radar"},
            camera_split=linspaced_split(n, cfg.eval_fraction),
            lidar_split=linspaced_split(n, cfg.eval_fraction),
            radar_split=linspaced_split(n, cfg.eval_fraction),
        )
