"""PandaSet dataparser (camera + lidar, rolling shutter).

cf. reference nerfstudio/data/dataparsers/pandaset_dataparser.py: front camera
with TOP_TO_BOTTOM rolling shutter (velocities + per-frame shutter offsets),
Pandar64 lidar, cuboid actor annotations. Requires the pandaset devkit or the
raw directory tree (lazily loaded).
"""

from __future__ import annotations

import json
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

ALLOWED_CATEGORIES = {"Car", "Pickup Truck", "Medium-sized Truck", "Semi-truck", "Bus",
                      "Motorcycle", "Bicycle", "Other Vehicle - Construction Vehicle"}
DEFORMABLE_CATEGORIES = {"Pedestrian", "Pedestrian with Object"}
ROLLING_SHUTTER_DURATION = 0.05  # seconds top-to-bottom (approx, cf. pandaset parser)


@dataclass
class PandasetDataParserConfig:
    sequence: str = "001"
    data: str = "data/pandaset"
    cameras: Tuple[str, ...] = ("front_camera",)
    eval_fraction: float = 0.125

    def setup(self) -> "PandasetDataParser":
        return PandasetDataParser(self)


class PandasetDataParser:
    def __init__(self, config: PandasetDataParserConfig):
        self.config = config

    def get_dataparser_outputs(self) -> DataparserOutputs:
        import PIL.Image

        cfg = self.config
        seq_dir = Path(cfg.data) / cfg.sequence
        if not seq_dir.exists():  # pragma: no cover
            raise FileNotFoundError(
                f"PandaSet sequence not found at {seq_dir}. "
                "Use the 'neuradar-synthetic' method for dataset-free runs."
            )

        # --- cameras (directory layout: camera/<name>/{NN.jpg, poses.json,
        # intrinsics.json, timestamps.json})
        cam_name = cfg.cameras[0]
        cam_dir = seq_dir / "camera" / cam_name
        poses_j = json.loads((cam_dir / "poses.json").read_text())
        intr_j = json.loads((cam_dir / "intrinsics.json").read_text())
        times_j = json.loads((cam_dir / "timestamps.json").read_text())
        c2ws, images, intr, cam_times = [], [], [], []
        for i, pose in enumerate(poses_j):
            img_path = cam_dir / f"{i:02d}.jpg"
            if not img_path.exists():
                continue
            m = _pose_dict_to_mat(pose)
            m[:3, :3] = m[:3, :3] @ OPENCV_TO_NERF
            c2ws.append(m[:3, :4])
            images.append(np.asarray(PIL.Image.open(img_path)))
            intr.append([intr_j["fx"], intr_j["fy"], intr_j["cx"], intr_j["cy"]])
            cam_times.append(times_j[i])
        images = np.stack(images)
        c2ws = np.stack(c2ws).astype(np.float32)
        cam_times = np.asarray(cam_times)

        # rolling shutter velocities from pose differences (cf. ad_dataparser
        # sensor velocities, :395-423)
        vel = np.gradient(c2ws[:, :3, 3], cam_times, axis=0)
        rs_offsets = np.tile(
            np.asarray([[-ROLLING_SHUTTER_DURATION / 2, ROLLING_SHUTTER_DURATION / 2]], np.float32),
            (len(c2ws), 1),
        )

        # --- lidar (lidar/{NN.pkl or .pkl.gz dataframe}, poses.json, timestamps.json)
        lid_dir = seq_dir / "lidar"
        lposes = json.loads((lid_dir / "poses.json").read_text())
        ltimes = json.loads((lid_dir / "timestamps.json").read_text())
        l2ws, lidar_points, lidar_times = [], [], []
        import pandas as pd

        for i, pose in enumerate(lposes):
            f = lid_dir / f"{i:02d}.pkl.gz"
            if not f.exists():
                f = lid_dir / f"{i:02d}.pkl"
            if not f.exists():
                continue
            df = pd.read_pickle(f)
            m = _pose_dict_to_mat(pose)
            w2l = np.linalg.inv(m)
            pts_world = df[["x", "y", "z"]].to_numpy()
            pts = (np.concatenate([pts_world, np.ones((len(pts_world), 1))], 1) @ w2l.T)[:, :3]
            inten = (df["i"].to_numpy() / 255.0)[:, None] if "i" in df else np.zeros((len(pts), 1))
            t_rel = (df["t"].to_numpy() - ltimes[i])[:, None] if "t" in df else np.zeros((len(pts), 1))
            ch = df["d"].to_numpy()[:, None] if "d" in df else np.zeros((len(pts), 1))
            lidar_points.append(np.concatenate([pts, inten, t_rel, ch], 1).astype(np.float32))
            l2ws.append(m[:3, :4])
            lidar_times.append(ltimes[i])
        l2ws = np.stack(l2ws).astype(np.float32)
        lidar_times = np.asarray(lidar_times)

        trajectories = self._trajectories(seq_dir)
        tsets, duration = zero_base_times([cam_times, lidar_times], trajectories)
        cam_times, lidar_times = tsets
        psets, center = recenter_poses([c2ws, l2ws])
        c2ws, l2ws = psets
        for traj in trajectories:
            traj["poses"][:, :3, 3] -= center

        n = len(c2ws)
        return DataparserOutputs(
            camera_to_worlds=c2ws,
            intrinsics=np.asarray(intr, np.float32),
            image_size=(images.shape[1], images.shape[2]),
            camera_type=np.full(n, int(CameraType.PERSPECTIVE)),
            distortion_params=None,
            camera_times=cam_times.astype(np.float32),
            camera_sensor_idxs=np.zeros(n, np.int64),
            images=images,
            camera_velocities=vel.astype(np.float32),
            rolling_shutter_offsets=rs_offsets,
            lidar_to_worlds=l2ws,
            lidar_times=lidar_times.astype(np.float32),
            lidar_sensor_idxs=np.ones(len(l2ws), np.int64),
            lidar_points=lidar_points,
            radar_to_worlds=np.zeros((0, 3, 4), np.float32),
            radar_times=np.zeros(0, np.float32),
            radar_sensor_idxs=np.zeros(0, np.int64),
            radar_points=[],
            radar_fov=dict(min_azimuth=-0.5, max_azimuth=0.5, min_elevation=-0.1, max_elevation=0.1,
                           azimuth_step=0.02, elevation_step=0.02),
            scene_box=scene_box_from_poses(psets),
            trajectories=trajectories,
            duration=duration,
            sensor_idx_to_name={0: cam_name, 1: "pandar64"},
            camera_split=linspaced_split(n, cfg.eval_fraction),
            lidar_split=linspaced_split(len(l2ws), cfg.eval_fraction),
            radar_split=linspaced_split(0),
        )

    def _trajectories(self, seq_dir: Path) -> list:
        cub_dir = seq_dir / "annotations" / "cuboids"
        if not cub_dir.exists():
            return []
        import pandas as pd

        by_uuid: dict = {}
        ltimes = json.loads((seq_dir / "lidar" / "timestamps.json").read_text())
        for i in range(len(ltimes)):
            f = cub_dir / f"{i:02d}.pkl.gz"
            if not f.exists():
                f = cub_dir / f"{i:02d}.pkl"
            if not f.exists():
                continue
            df = pd.read_pickle(f)
            for _, row in df.iterrows():
                if row["label"] not in ALLOWED_CATEGORIES | DEFORMABLE_CATEGORIES:
                    continue
                yaw = row["yaw"]
                pose = np.eye(4, dtype=np.float32)
                c, s = np.cos(yaw), np.sin(yaw)
                pose[:3, :3] = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
                pose[:3, 3] = [row["position.x"], row["position.y"], row["position.z"]]
                rec = by_uuid.setdefault(row["uuid"], {"ts": [], "poses": [], "label": row["label"],
                                                       "dims": [row["dimensions.x"], row["dimensions.y"],
                                                                row["dimensions.z"]]})
                rec["ts"].append(ltimes[i])
                rec["poses"].append(pose)
        out = []
        for rec in by_uuid.values():
            if len(rec["ts"]) < 2:
                continue
            out.append(dict(timestamps=np.asarray(rec["ts"]), poses=np.stack(rec["poses"]),
                            dims=np.asarray(rec["dims"], np.float32)[[1, 0, 2]],
                            symmetric=rec["label"] in ALLOWED_CATEGORIES,
                            deformable=rec["label"] in DEFORMABLE_CATEGORIES))
        return out


def _pose_dict_to_mat(pose: dict) -> np.ndarray:
    from neuradar_tpu.utils.poses import rotation_6d_to_matrix  # noqa: F401 (not used; quaternion below)

    q = pose["heading"]
    w, x, y, z = q["w"], q["x"], q["y"], q["z"]
    R = np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )
    m = np.eye(4)
    m[:3, :3] = R
    m[:3, 3] = [pose["position"]["x"], pose["position"]["y"], pose["position"]["z"]]
    return m
