"""Shared viewer render callback.

One implementation for both viewer hosts — the in-training viewer
(engine/trainer.py, renders between train steps under train_lock) and the
standalone frozen viewer (scripts/viewer.py) — so overlay/caching fixes
cannot diverge between them.
"""

from __future__ import annotations

import contextlib
import threading
from typing import Callable, Optional

import numpy as np

from neuradar_tpu.model_components.dynamic_actors import ActorEdits


def make_viewer_render_fn(
    pipeline,
    get_variables: Callable,
    lock: Optional[threading.Lock] = None,
    version_fn: Optional[Callable[[], int]] = None,
):
    """Build the (c2w, actor, overlays, preview, time_s) render callback.

    Args:
        pipeline: ADNeuRadarPipeline (render_pose / radar_points_world /
            viewer_intrinsics / datamanager / outputs).
        get_variables: returns the CURRENT eval variables (live training
            params or a frozen checkpoint).
        lock: serializes device work against training (trainer.train_lock);
            None for a frozen viewer.
        version_fn: cache-busting version for the radar overlay — the
            in-training viewer passes a coarse step counter so detections
            refresh as the model learns; None (frozen) never expires.
    """
    state = {"lidar": None, "radar_key": None, "radar_pts": None}
    cache_lock = threading.Lock()  # handler threads race on the radar cache

    def device_ctx():
        return lock if lock is not None else contextlib.nullcontext()

    def render(c2w, actor=None, overlays=None, preview=False, time_s=0.0, output="rgb"):
        edits = None
        if actor:
            edits = ActorEdits(
                lateral=float(actor.get("lateral", 0.0)),
                longitudinal=float(actor.get("longitudinal", 0.0)),
                rotation=float(actor.get("rotation", 0.0)),
                index=int(actor.get("index", -1)),
                remove=bool(actor.get("remove", False)),
            )
        # progressive resolution (reference render_state_machine.py): the
        # viewer's state machine passes True for low_move (0.5), a float
        # scale for intermediate states (low_static 0.75), False for high
        if preview is True:
            scale = 0.5
        elif isinstance(preview, bool) or not preview:
            scale = 1.0
        else:
            scale = float(preview)
        hw = (max(8, round(96 * scale)), max(8, round(156 * scale)))
        with device_ctx():
            rgb = pipeline.render_pose(get_variables(), c2w, actor_edits=edits, hw=hw,
                                       time_s=float(time_s), output=str(output or "rgb"))
        if overlays:
            from neuradar_tpu.viewer.overlays import draw_scene_overlays

            if overlays.get("lidar") and state["lidar"] is None:
                with cache_lock:  # dedup: concurrent handler threads would
                    # otherwise run the multi-scan accumulation twice
                    if state["lidar"] is None:
                        state["lidar"] = pipeline.datamanager.get_accumulated_lidar_points(max_points=60_000)
            radar_pts = None
            if overlays.get("radar") and hasattr(pipeline, "radar_points_world"):
                # key on the ACTUAL edit values (not just their presence) and
                # a model version so detections track edits and training
                key = (
                    round(float(time_s), 1),
                    None if not actor else tuple(sorted(actor.items())),
                    version_fn() if version_fn is not None else 0,
                )
                with cache_lock:  # also dedups concurrent radar renders
                    if state["radar_key"] != key:
                        with device_ctx():
                            pts = pipeline.radar_points_world(
                                get_variables(), float(time_s), actor_edits=edits)
                        state["radar_key"], state["radar_pts"] = key, pts
                    radar_pts = state["radar_pts"]
            rgb = draw_scene_overlays(
                np.ascontiguousarray(rgb), c2w,
                pipeline.viewer_intrinsics(rgb.shape[:2]), overlays,
                lidar_points=state["lidar"],
                trajectories=pipeline.outputs.trajectories,
                camera_poses=pipeline.outputs.camera_to_worlds,
                time_s=float(time_s),
                radar_points=radar_pts,
            )
        return rgb

    return render


def scene_duration(pipeline) -> float:
    times = getattr(pipeline.outputs, "camera_times", None)
    if times is None or not len(np.atleast_1d(times)):
        return 0.0
    return float(np.max(times))


def make_scene_graph_fn(pipeline) -> Callable[[], dict]:
    """Client-side scene-graph data for the viewer minimap (/scene):
    actor trajectories (sampled polylines + box dims), camera / lidar /
    radar mount positions. The reference ships a viser 3D scene graph
    (viewer/viewer.py:58); this dependency-free viewer draws the same
    entities on a top-down client canvas with click-to-teleport."""
    out = pipeline.outputs

    def scene() -> dict:
        actors = []
        for traj in out.trajectories or []:
            poses = np.asarray(traj["poses"], np.float32)  # [T, 4, 4]
            actors.append({
                "dims": np.asarray(traj["dims"], np.float32).tolist(),
                "timestamps": np.asarray(traj["timestamps"], np.float32).tolist(),
                "path": poses[:, :3, 3].tolist(),
                "heading": np.arctan2(poses[:, 1, 0], poses[:, 0, 0]).tolist(),
            })
        doc = {
            "actors": actors,
            "cameras": np.asarray(out.camera_to_worlds, np.float32)[:, :3, 3].tolist(),
        }
        for name in ("lidar_to_worlds", "radar_to_worlds"):
            arr = getattr(out, name, None)
            if arr is not None and len(arr):
                doc[name.split("_")[0] + "s"] = np.asarray(arr, np.float32)[:, :3, 3].tolist()
        return doc

    return scene
