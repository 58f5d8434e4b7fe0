"""Dataparser debugging plots: sensor poses, point clouds, actor boxes.

cf. reference nerfstudio/data/dataparsers/data_plot_utils.py (plotly 3-D
scatter debug views of lidar/radar alignment + DBSCAN radar clustering,
:33-248). plotly is absent in this environment; matplotlib renders the same
content to PNG — a BEV (top-down) panel and an elevation panel — which is
also what the plots get used for (eyeballing parser frame conventions).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np


def plot_pose_axes(ax, pose: np.ndarray, scale: float = 2.0, label: str = "") -> None:
    """Draw a [3, 4] pose as x (red) / y (green) axis whiskers in BEV
    (reference plot_pose:33-70 draws the same three axis lines in 3-D)."""
    origin = pose[:2, 3]
    for axis, color in ((0, "tab:red"), (1, "tab:green")):
        d = pose[:2, axis]
        ax.plot([origin[0], origin[0] + scale * d[0]], [origin[1], origin[1] + scale * d[1]],
                color=color, linewidth=1.0)
    if label:
        ax.annotate(label, origin, fontsize=6)


def cluster_radar_points(points: np.ndarray, eps: float = 1.0, min_samples: int = 1) -> np.ndarray:
    """DBSCAN labels for radar returns (reference create_clusters:212-227
    uses sklearn DBSCAN with the same defaults). Returns [N] int labels,
    -1 = noise."""
    from sklearn.cluster import DBSCAN

    if len(points) == 0:
        return np.zeros((0,), np.int64)
    return DBSCAN(eps=eps, min_samples=min_samples).fit_predict(points[:, :3])


def plot_scene_overview(
    outputs,
    out_path: Path,
    frame_index: int = 0,
    max_lidar_points: int = 20000,
    cluster_radar: bool = False,
) -> Path:
    """Write a two-panel PNG (BEV + elevation) of one frame's world-space
    lidar cloud, radar returns, camera/lidar poses and actor boxes from a
    DataparserOutputs (the content of reference plot_data_for_iteration:72).
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from neuradar_tpu.utils.poses import transform_points

    fig, (ax_bev, ax_elev) = plt.subplots(1, 2, figsize=(14, 7))

    # lidar cloud in world space
    if getattr(outputs, "lidar_points", None) is not None and len(outputs.lidar_points) > frame_index:
        pts = np.asarray(outputs.lidar_points[frame_index])[:, :3]
        l2w = np.asarray(outputs.lidar_to_worlds[frame_index])
        world = np.asarray(transform_points(pts, l2w))
        world = world[np.all(np.abs(world) < 500, axis=1)][:max_lidar_points]
        ax_bev.scatter(world[:, 0], world[:, 1], s=0.2, c=world[:, 2], cmap="viridis", alpha=0.5)
        ax_elev.scatter(world[:, 0], world[:, 2], s=0.2, c="tab:blue", alpha=0.5)

    # radar returns (optionally clustered, reference create_clusters)
    if getattr(outputs, "radar_points", None) is not None and len(outputs.radar_points) > frame_index:
        rpts = np.asarray(outputs.radar_points[frame_index])[:, :3]
        r2w = np.asarray(outputs.radar_to_worlds[frame_index])
        rworld = np.asarray(transform_points(rpts, r2w))
        colors: Optional[np.ndarray] = None
        if cluster_radar and len(rworld):
            colors = cluster_radar_points(rworld)
        ax_bev.scatter(rworld[:, 0], rworld[:, 1], s=14, c=colors if colors is not None else "tab:red",
                       cmap="tab10", marker="x", label="radar")
        ax_elev.scatter(rworld[:, 0], rworld[:, 2], s=14, c="tab:red", marker="x")

    # sensor poses
    for i, c2w in enumerate(np.asarray(outputs.camera_to_worlds)):
        plot_pose_axes(ax_bev, c2w, label=f"cam{i}" if i % 8 == 0 else "")
    if getattr(outputs, "lidar_to_worlds", None) is not None:
        plot_pose_axes(ax_bev, np.asarray(outputs.lidar_to_worlds[frame_index]), label="lidar")

    # actor boxes (BEV footprints) at the frame's trajectory sample —
    # dataparser trajectories are per-actor dicts with `poses` [T, 4, 4] and
    # `dims` (l, w, h) in the actor frame (data/dataparsers/base.py)
    for tr in getattr(outputs, "trajectories", None) or []:
        poses = np.asarray(tr["poses"])
        t = min(frame_index, poses.shape[0] - 1)
        p = poses[t]
        l, w = float(tr["dims"][0]), float(tr["dims"][1])
        corners = np.array([[l / 2, w / 2], [l / 2, -w / 2], [-l / 2, -w / 2],
                            [-l / 2, w / 2], [l / 2, w / 2]])
        world_xy = corners @ p[:2, :2].T + p[:2, 3]
        ax_bev.plot(world_xy[:, 0], world_xy[:, 1], color="tab:orange", linewidth=1.2)

    ax_bev.set_title(f"BEV frame {frame_index}")
    ax_bev.set_xlabel("x (m)")
    ax_bev.set_ylabel("y (m)")
    ax_bev.set_aspect("equal")
    ax_elev.set_title("elevation")
    ax_elev.set_xlabel("x (m)")
    ax_elev.set_ylabel("z (m)")

    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out_path, dpi=110)
    plt.close(fig)
    return out_path
