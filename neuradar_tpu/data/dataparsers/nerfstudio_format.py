"""Nerfstudio `transforms.json` ingestion (COLMAP / polycam / record3d output).

cf. reference nerfstudio/process_data/ (~2.5k LoC of COLMAP/video/polycam
converters) + nerfstudio/data/dataparsers/nerfstudio_dataparser.py: those
tools all *emit* the transforms.json format; this parser *consumes* it, which
is the piece a camera-only capture needs to train nerfacto/splatfacto here.
Video/COLMAP binary conversion itself requires ffmpeg/colmap binaries that
are not in this image — run the standard converters elsewhere and point this
parser at the output directory.

Camera convention: transforms.json stores OpenGL c2w (x right, y up, z back
= looking down -z) which matches this framework's native convention, so
matrices pass through unchanged.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from pathlib import Path
from typing import Optional

import numpy as np

from neuradar_tpu.cameras.cameras import CameraType
from neuradar_tpu.data.dataparsers.base import (
    DataparserOutputs,
    SceneBox,
    SensorSplit,
    linspaced_split,
    recenter_poses,
    scene_box_from_poses,
)

_CAMERA_MODELS = {
    "PERSPECTIVE": CameraType.PERSPECTIVE,
    "OPENCV": CameraType.PERSPECTIVE,
    "SIMPLE_PINHOLE": CameraType.PERSPECTIVE,
    "PINHOLE": CameraType.PERSPECTIVE,
    "OPENCV_FISHEYE": CameraType.FISHEYE,
    "FISHEYE": CameraType.FISHEYE,
    "EQUIRECTANGULAR": CameraType.EQUIRECTANGULAR,
}


@dataclass
class NerfstudioFormatDataParserConfig:
    data: str = "data"  # directory containing transforms.json
    eval_interval: int = 8  # ~1/N of frames become eval (nerfstudio default)
    downscale_factor: int = 1
    auto_recenter: bool = True

    def setup(self) -> "NerfstudioFormatDataParser":
        return NerfstudioFormatDataParser(self)


class NerfstudioFormatDataParser:
    def __init__(self, config: NerfstudioFormatDataParserConfig):
        self.config = config

    def get_dataparser_outputs(self) -> DataparserOutputs:
        from PIL import Image

        c = self.config
        root = Path(c.data)
        meta = json.loads((root / "transforms.json").read_text())
        frames = sorted(meta["frames"], key=lambda f: f["file_path"])

        def frame_val(f, key, default=None):
            return f.get(key, meta.get(key, default))

        poses, images, intr, dist, times, masks = [], [], [], [], [], []
        any_mask = False
        H = W = None
        for i, f in enumerate(frames):
            img_path = root / f["file_path"]
            if not img_path.exists():  # tolerate pruned frames
                continue
            img = Image.open(img_path).convert("RGB")
            if c.downscale_factor > 1:
                img = img.resize((img.width // c.downscale_factor, img.height // c.downscale_factor))
            arr = np.asarray(img, np.uint8)
            if H is None:
                H, W = arr.shape[:2]
            elif arr.shape[:2] != (H, W):
                raise ValueError(f"mixed image sizes: {arr.shape[:2]} vs {(H, W)}")
            images.append(arr)
            # per-frame foreground mask (reference nerfstudio dataparser
            # mask_path; 255/nonzero = keep); frames without one are fully kept
            mask_rel = f.get("mask_path")
            if mask_rel and (root / mask_rel).exists():
                mimg = Image.open(root / mask_rel).convert("L")
                if c.downscale_factor > 1:
                    mimg = mimg.resize((W, H))
                masks.append(np.asarray(mimg) > 127)
                any_mask = True
            else:
                masks.append(np.ones((H, W), bool))
            m = np.asarray(f["transform_matrix"], np.float64)
            poses.append(m[:3, :4])
            s = 1.0 / c.downscale_factor
            intr.append([
                frame_val(f, "fl_x") * s, frame_val(f, "fl_y") * s,
                frame_val(f, "cx") * s, frame_val(f, "cy") * s,
            ])
            dist.append([
                frame_val(f, "k1", 0.0), frame_val(f, "k2", 0.0),
                frame_val(f, "k3", 0.0), frame_val(f, "k4", 0.0),
                frame_val(f, "p1", 0.0), frame_val(f, "p2", 0.0),
            ])
            times.append(float(frame_val(f, "time", i)))

        if not images:
            raise FileNotFoundError(f"no readable frames under {root}")
        n = len(images)
        poses = np.stack(poses)
        if c.auto_recenter:
            poses = recenter_poses([poses])[0][0]
        cam_model = _CAMERA_MODELS.get(str(meta.get("camera_model", "PERSPECTIVE")).upper(), CameraType.PERSPECTIVE)

        times = np.asarray(times, np.float64)
        times = times - times.min()
        split = linspaced_split(n, eval_fraction=1.0 / max(c.eval_interval, 1))
        empty = SensorSplit(train=np.zeros(0, np.int64), eval=np.zeros(0, np.int64))
        return DataparserOutputs(
            camera_to_worlds=poses.astype(np.float32),
            intrinsics=np.asarray(intr, np.float32),
            image_size=(H, W),
            camera_type=np.full(n, int(cam_model), np.int32),
            distortion_params=np.asarray(dist, np.float32),
            camera_times=times.astype(np.float32),
            camera_sensor_idxs=np.zeros(n, np.int32),
            images=np.stack(images),
            masks=np.stack(masks) if any_mask else None,
            lidar_to_worlds=np.zeros((0, 3, 4), np.float32),
            lidar_times=np.zeros(0, np.float32),
            lidar_sensor_idxs=np.zeros(0, np.int32),
            lidar_points=[],
            radar_to_worlds=np.zeros((0, 3, 4), np.float32),
            radar_times=np.zeros(0, np.float32),
            radar_sensor_idxs=np.zeros(0, np.int32),
            radar_points=[],
            scene_box=scene_box_from_poses([poses]),
            trajectories=[],
            duration=float(times.max() - times.min()) if n > 1 else 1.0,
            sensor_idx_to_name={0: "camera"},
            camera_split=split,
            lidar_split=empty,
            radar_split=empty,
        )
