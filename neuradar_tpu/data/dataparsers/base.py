"""Dataparser base for autonomous-driving datasets.

cf. reference nerfstudio/data/dataparsers/ad_dataparser.py: the template-method
pipeline (time filter -> read point clouds -> recenter world on the mean ego
trajectory -> scene box from padded poses -> train/eval split -> interpolate
actor trajectories to sensor timestamps -> synthesize missing lidar points).

Host-side numpy throughout — dataparsing happens once at startup; only the
resulting tables are shipped to device.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dataclass_field
from typing import Dict, List, Optional, Tuple

import numpy as np


@dataclass
class SceneBox:
    aabb: np.ndarray  # [2, 3] min/max


@dataclass
class SensorSplit:
    """Frame indices for train/eval of one modality."""

    train: np.ndarray
    eval: np.ndarray


@dataclass
class DataparserOutputs:
    """Everything the datamanager needs (host-side numpy).

    cameras_*: per camera frame; lidar_*: per lidar scan; radar_*: per radar
    scan. Points are sensor-frame arrays (x, y, z, intensity, time, channel)
    for lidar and (x, y, z, ...) for radar ground truth.
    """

    # cameras
    camera_to_worlds: np.ndarray  # [Nc, 3, 4]
    intrinsics: np.ndarray  # [Nc, 4] fx fy cx cy
    image_size: Tuple[int, int]  # (H, W) — single size per scene
    camera_type: np.ndarray  # [Nc]
    distortion_params: Optional[np.ndarray]  # [Nc, 6]
    camera_times: np.ndarray  # [Nc]
    camera_sensor_idxs: np.ndarray  # [Nc]
    images: np.ndarray  # [Nc, H, W, 3] uint8
    masks: Optional[np.ndarray] = None
    """[Nc, H, W] bool, True = pixel participates in training. The
    datamanager rejection-samples patch positions against these (cf.
    reference pixel_samplers rejection_sample_mask; masks generated e.g. by
    scripts/process_nuscenes_masks)."""
    camera_velocities: Optional[np.ndarray] = None  # [Nc, 3]
    rolling_shutter_offsets: Optional[np.ndarray] = None  # [Nc, 2]
    rolling_shutter_horizontal: Optional[np.ndarray] = None
    """[Nc] bool — True where the sensor reads out column-by-column (WOD
    LEFT_TO_RIGHT/RIGHT_TO_LEFT, cf. reference wod_dataparser.py:136);
    False/absent = row-by-row (pandaset TOP_TO_BOTTOM)."""

    # lidars
    lidar_to_worlds: np.ndarray = None  # [Nl, 3, 4]
    lidar_times: np.ndarray = None  # [Nl]
    lidar_sensor_idxs: np.ndarray = None  # [Nl]
    lidar_points: List[np.ndarray] = dataclass_field(default_factory=list)  # per scan [Pi, 6]
    lidar_velocities: Optional[np.ndarray] = None  # [Nl, 3]

    # radars
    radar_to_worlds: np.ndarray = None  # [Nr, 3, 4]
    radar_times: np.ndarray = None  # [Nr]
    radar_sensor_idxs: np.ndarray = None  # [Nr]
    radar_points: List[np.ndarray] = dataclass_field(default_factory=list)  # per scan [Gi, >=3]
    radar_fov: Dict[str, float] = dataclass_field(default_factory=dict)

    # scene
    scene_box: SceneBox = None
    trajectories: List[dict] = dataclass_field(default_factory=list)
    duration: float = 10.0
    sensor_idx_to_name: Dict[int, str] = dataclass_field(default_factory=dict)
    # which way "one lane over" points for this sequence: +1 = driving-dir x z
    # (right), -1 = left (reference zod_dataparser.py:119-136 sign table,
    # consumed by the lane-shift FID eval, ad_pipeline.py:333)
    lane_shift_sign: int = 1

    # splits
    camera_split: SensorSplit = None
    lidar_split: SensorSplit = None
    radar_split: SensorSplit = None

    @property
    def num_train_frames(self) -> int:
        n = len(self.camera_split.train)
        if self.lidar_split is not None:
            n += len(self.lidar_split.train)
        if self.radar_split is not None:
            n += len(self.radar_split.train)
        return n


def linspaced_split(n: int, eval_fraction: float = 0.125) -> SensorSplit:
    """Evenly spaced eval frames (cf. ad_dataparser.py:369-393)."""
    if n == 0:
        return SensorSplit(train=np.zeros(0, np.int64), eval=np.zeros(0, np.int64))
    n_eval = max(1, int(round(n * eval_fraction)))
    eval_idx = np.unique(np.linspace(0, n - 1, n_eval).round().astype(np.int64))
    train_idx = np.setdiff1d(np.arange(n, dtype=np.int64), eval_idx)
    if len(train_idx) == 0:
        train_idx = eval_idx
    return SensorSplit(train=train_idx, eval=eval_idx)


def recenter_poses(pose_sets: List[np.ndarray]) -> Tuple[List[np.ndarray], np.ndarray]:
    """Shift all poses so the mean sensor position is the origin
    (cf. ad_dataparser.py:352-360)."""
    all_pos = np.concatenate([p[..., :3, 3].reshape(-1, 3) for p in pose_sets if p is not None and len(p)], axis=0)
    center = all_pos.mean(axis=0)
    shifted = []
    for p in pose_sets:
        if p is None or len(p) == 0:
            shifted.append(p)
            continue
        q = p.copy()
        q[..., :3, 3] -= center
        shifted.append(q)
    return shifted, center


def scene_box_from_poses(pose_sets: List[np.ndarray], padding: float = 40.0) -> SceneBox:
    """AABB around all sensor poses with padding (cf. ad_dataparser.py:272-287)."""
    all_pos = np.concatenate([p[..., :3, 3].reshape(-1, 3) for p in pose_sets if p is not None and len(p)], axis=0)
    lo = all_pos.min(axis=0) - padding
    hi = all_pos.max(axis=0) + padding
    return SceneBox(aabb=np.stack([lo, hi], axis=0))


def synthesize_missing_points(
    points: np.ndarray,
    azimuth_resolution_deg: float = 0.2,
    dummy_distance: float = 2e3,
    min_returns_per_channel: int = 32,
    skip_channels: Tuple[int, ...] = (),
) -> np.ndarray:
    """Synthesize non-return lidar points on the sensor's scan grid.

    cf. reference ad_dataparser.py:482-621: rotating lidars miss returns on
    sky/absorbing surfaces; those rays still carry carving signal, so dummy
    points are added at a far distance (2e3 m) wherever an (elevation channel,
    azimuth bin) cell has no return. Instead of the reference's hardcoded
    per-sensor elevation tables (lidar_elevation_mappings.py), per-channel
    elevation is estimated from the scan itself (median of returns).

    Args:
        points: [N, 6] (x, y, z, intensity, time, channel) sensor frame.

    Returns:
        [N + M, 6] with the M synthesized far points appended (intensity 0).
    """
    if len(points) == 0:
        return points
    channels = points[:, 5].astype(np.int64)
    az = np.arctan2(points[:, 1], points[:, 0])
    el = np.arcsin(np.clip(points[:, 2] / np.linalg.norm(points[:, :3], axis=1).clip(1e-6), -1, 1))

    az_res = np.deg2rad(azimuth_resolution_deg)
    n_bins = int(np.ceil(2 * np.pi / az_res))
    az_bin = ((az + np.pi) / az_res).astype(np.int64) % n_bins

    new_points = []
    for ch in np.unique(channels):
        if ch in skip_channels:
            continue
        m = channels == ch
        if m.sum() < min_returns_per_channel:
            continue
        ch_el = float(np.median(el[m]))
        have = np.zeros(n_bins, bool)
        have[az_bin[m]] = True
        missing_bins = np.nonzero(~have)[0]
        if len(missing_bins) == 0:
            continue
        miss_az = missing_bins * az_res - np.pi + az_res / 2
        d = np.stack(
            [np.cos(ch_el) * np.cos(miss_az), np.cos(ch_el) * np.sin(miss_az),
             np.full(len(miss_az), np.sin(ch_el))], axis=1,
        )
        t_med = float(np.median(points[m, 4]))
        pts = np.concatenate(
            [d * dummy_distance, np.zeros((len(d), 1)), np.full((len(d), 1), t_med),
             np.full((len(d), 1), ch)], axis=1,
        )
        new_points.append(pts.astype(points.dtype))
    if not new_points:
        return points
    return np.concatenate([points] + new_points, axis=0)


def zero_base_times(time_sets: List[np.ndarray], trajectories: List[dict]) -> Tuple[List[np.ndarray], float]:
    """Shift all timestamps so the earliest is 0 (cf. ad_dataparser pipeline);
    returns the scene duration."""
    t0 = min(float(t.min()) for t in time_sets if t is not None and len(t))
    out = [None if t is None else t - t0 for t in time_sets]
    for traj in trajectories:
        traj["timestamps"] = np.asarray(traj["timestamps"], np.float64) - t0
    t_max = max(float(t.max()) for t in out if t is not None and len(t))
    return out, float(t_max)
