"""Viewer overlays: lidar point clouds, actor boxes, camera frusta.

The reference viewer renders these as viser 3-D scene nodes
(viewer/viewer.py:58 populate_* + lidar point clouds / actor box controls);
without a client-side 3-D engine, this module projects the same scene
content onto the rendered image server-side — pure numpy, no dependencies.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

# wireframe edges of a unit box whose corners are the (+-x, +-y, +-z) signs
_BOX_EDGES = [
    (0, 1), (1, 3), (3, 2), (2, 0),  # bottom (z-)
    (4, 5), (5, 7), (7, 6), (6, 4),  # top (z+)
    (0, 4), (1, 5), (2, 6), (3, 7),  # verticals
]
_CORNER_SIGNS = np.array(
    [[sx, sy, sz] for sz in (-1, 1) for sy in (-1, 1) for sx in (-1, 1)], np.float64
)  # index bit order: x fastest, then y, then z — matches _BOX_EDGES


def project_points(
    c2w: np.ndarray, fx: float, fy: float, cx: float, cy: float, pts: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """World points [N, 3] -> pixel uv [N, 2] + camera depth [N] (camera
    looks down -z, y up — the convention of cameras/cameras.py)."""
    R = np.asarray(c2w[:3, :3], np.float64)
    t = np.asarray(c2w[:3, 3], np.float64)
    local = (np.asarray(pts, np.float64) - t) @ R  # world -> camera
    z = -local[:, 2]
    safe = np.where(np.abs(z) < 1e-6, 1e-6, z)
    u = cx + fx * local[:, 0] / safe
    v = cy - fy * local[:, 1] / safe
    return np.stack([u, v], axis=1), z


def _depth_colors(z: np.ndarray, near: float = 2.0, far: float = 60.0) -> np.ndarray:
    """Simple blue->green->red near-to-far ramp, uint8 [N, 3]."""
    t = np.clip((np.log(np.maximum(z, 1e-3)) - np.log(near)) / (np.log(far) - np.log(near)), 0, 1)
    r = np.clip(1.5 - np.abs(4 * t - 3), 0, 1)
    g = np.clip(1.5 - np.abs(4 * t - 2), 0, 1)
    b = np.clip(1.5 - np.abs(4 * t - 1), 0, 1)
    return (np.stack([r, g, b], 1) * 255).astype(np.uint8)


def draw_points(rgb: np.ndarray, uv: np.ndarray, z: np.ndarray, colors: Optional[np.ndarray] = None) -> np.ndarray:
    """Splat 1-px points (in place) onto rgb uint8 [H, W, 3]."""
    H, W = rgb.shape[:2]
    vis = (z > 0.05) & (uv[:, 0] >= 0) & (uv[:, 0] < W) & (uv[:, 1] >= 0) & (uv[:, 1] < H)
    if not vis.any():
        return rgb
    u = uv[vis, 0].astype(np.int64)
    v = uv[vis, 1].astype(np.int64)
    c = (colors[vis] if colors is not None else _depth_colors(z[vis]))
    rgb[v, u] = c
    return rgb


def draw_line(rgb: np.ndarray, p0: np.ndarray, p1: np.ndarray, color) -> None:
    """Sampled line segment in pixel space (in place)."""
    H, W = rgb.shape[:2]
    n = int(max(2, np.abs(p1 - p0).max()))
    ts = np.linspace(0.0, 1.0, min(n, 4 * max(H, W)))
    pts = p0[None] * (1 - ts[:, None]) + p1[None] * ts[:, None]
    u = pts[:, 0].astype(np.int64)
    v = pts[:, 1].astype(np.int64)
    ok = (u >= 0) & (u < W) & (v >= 0) & (v < H)
    rgb[v[ok], u[ok]] = color


def box_corners(pose: np.ndarray, dims_wlh: np.ndarray) -> np.ndarray:
    """World-space corners [8, 3] of an actor box: pose [3/4, 4] world<-box,
    dims (w, l, h) mapping to box (x, y, z) — the parsers' wlh contract."""
    half = np.asarray(dims_wlh, np.float64) / 2.0
    local = _CORNER_SIGNS * half[None]
    return local @ np.asarray(pose[:3, :3], np.float64).T + np.asarray(pose[:3, 3], np.float64)


def draw_wireframe(
    rgb: np.ndarray, c2w: np.ndarray, fx: float, fy: float, cx: float, cy: float,
    corners_world: np.ndarray, edges=None, color=(255, 180, 40),
) -> None:
    uv, z = project_points(c2w, fx, fy, cx, cy, corners_world)
    for i, j in (edges or _BOX_EDGES):
        if z[i] > 0.05 and z[j] > 0.05:  # skip edges crossing the camera plane
            draw_line(rgb, uv[i], uv[j], color)


def actor_boxes_at_time(trajectories: List[dict], time_s: float, tol: float = 0.3) -> List[np.ndarray]:
    """Corner sets for every actor with a pose near time_s (nearest pose,
    like the reference's per-timestep box nodes)."""
    out = []
    for traj in trajectories:
        ts = np.asarray(traj["timestamps"], np.float64)
        if len(ts) == 0:
            continue
        j = int(np.argmin(np.abs(ts - time_s)))
        if np.abs(ts[j] - time_s) > max(tol, float(np.diff(ts).mean() if len(ts) > 1 else tol)):
            continue
        out.append(box_corners(np.asarray(traj["poses"][j], np.float64), traj["dims"]))
    return out


def frustum_lines(cam_c2w: np.ndarray, aspect: float = 1.5, depth: float = 1.5) -> np.ndarray:
    """Corner points [5, 3] (apex + 4 image-plane corners) of a camera
    frustum pyramid for wireframe drawing."""
    apex = np.asarray(cam_c2w[:3, 3], np.float64)
    R = np.asarray(cam_c2w[:3, :3], np.float64)
    half_w, half_h = 0.5 * depth, 0.5 * depth / aspect
    corners_local = np.array(
        [[-half_w, -half_h, -depth], [half_w, -half_h, -depth],
         [half_w, half_h, -depth], [-half_w, half_h, -depth]], np.float64
    )
    return np.concatenate([apex[None], corners_local @ R.T + apex])


_FRUSTUM_EDGES = [(0, 1), (0, 2), (0, 3), (0, 4), (1, 2), (2, 3), (3, 4), (4, 1)]


def draw_scene_overlays(
    rgb: np.ndarray,
    c2w: np.ndarray,
    intrinsics: Tuple[float, float, float, float],
    opts: Dict,
    lidar_points: Optional[np.ndarray] = None,
    trajectories: Optional[List[dict]] = None,
    camera_poses: Optional[np.ndarray] = None,
    time_s: float = 0.0,
    radar_points: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Composite the requested overlays onto a render (rgb modified in
    place and returned). opts keys: lidar / boxes / frusta / radar (bools)."""
    fx, fy, cx, cy = intrinsics
    if opts.get("lidar") and lidar_points is not None and len(lidar_points):
        uv, z = project_points(c2w, fx, fy, cx, cy, lidar_points)
        draw_points(rgb, uv, z)
    if opts.get("radar") and radar_points is not None and len(radar_points):
        uv, z = project_points(c2w, fx, fy, cx, cy, radar_points)
        # predicted radar detections: magenta, drawn 2x2 for visibility
        col = np.tile(np.array([[255, 0, 255]], np.uint8), (len(uv), 1))
        for du in (0, 1):
            for dv in (0, 1):
                draw_points(rgb, uv + np.array([du, dv]), z, colors=col)
    if opts.get("boxes") and trajectories:
        for corners in actor_boxes_at_time(trajectories, time_s):
            draw_wireframe(rgb, c2w, fx, fy, cx, cy, corners)
    if opts.get("frusta") and camera_poses is not None and len(camera_poses):
        step = max(1, len(camera_poses) // 24)
        for cam in camera_poses[::step]:
            draw_wireframe(rgb, c2w, fx, fy, cx, cy, frustum_lines(np.asarray(cam)),
                           edges=_FRUSTUM_EDGES, color=(80, 200, 255))
    return rgb
