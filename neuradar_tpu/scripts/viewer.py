"""Standalone viewer on a trained run: load checkpoint, serve, orbit.

cf. reference nerfstudio/scripts/viewer/run_viewer.py (RunViewer: eval_setup
+ start the viser viewer without training). Here: reload the run dir like
render.py does, wire the same render callback the trainer uses (actor edits,
overlays, preview resolution) and block until interrupted.

Usage:
  python -m neuradar_tpu.scripts.viewer --load-config outputs/<exp>/<method> [--port 7007]
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path

import numpy as np


def build_viewer(trainer, port: int = 7007):
    """ViewerServer wired to a (frozen) trainer — the same callback stack the
    in-training viewer uses, minus the train-lock contention."""
    from neuradar_tpu.model_components.dynamic_actors import ActorEdits
    from neuradar_tpu.viewer.viewer import ViewerServer

    pipeline = trainer.pipeline
    variables = trainer.eval_variables()
    lidar_cloud = {"pts": None}
    radar_cache = {}

    def render(c2w, actor=None, overlays=None, preview=False, time_s=0.0):
        edits = None
        if actor:
            edits = ActorEdits(
                lateral=float(actor.get("lateral", 0.0)),
                longitudinal=float(actor.get("longitudinal", 0.0)),
                rotation=float(actor.get("rotation", 0.0)),
                index=int(actor.get("index", -1)),
                remove=bool(actor.get("remove", False)),
            )
        hw = (48, 78) if preview else (96, 156)
        rgb = pipeline.render_pose(variables, c2w, actor_edits=edits, hw=hw, time_s=float(time_s))
        if overlays:
            from neuradar_tpu.viewer.overlays import draw_scene_overlays

            if overlays.get("lidar") and lidar_cloud["pts"] is None:
                lidar_cloud["pts"] = pipeline.datamanager.get_accumulated_lidar_points(max_points=60_000)
            radar_pts = None
            if overlays.get("radar") and hasattr(pipeline, "radar_points_world"):
                key = (round(float(time_s), 1), bool(actor))
                if radar_cache.get("key") != key:
                    radar_cache.update(key=key, pts=pipeline.radar_points_world(
                        variables, float(time_s), actor_edits=edits))
                radar_pts = radar_cache.get("pts")
            rgb = draw_scene_overlays(
                np.ascontiguousarray(rgb), c2w,
                pipeline.viewer_intrinsics(rgb.shape[:2]), overlays,
                lidar_points=lidar_cloud["pts"],
                trajectories=pipeline.outputs.trajectories,
                camera_poses=pipeline.outputs.camera_to_worlds,
                time_s=float(time_s),
                radar_points=radar_pts,
            )
        return rgb

    times = getattr(pipeline.outputs, "camera_times", None)
    stats = {"step": trainer._step, "mode": "frozen"}
    if times is not None and len(np.atleast_1d(times)):
        stats["scene_duration"] = round(float(np.max(times)), 2)
    return ViewerServer(
        render_fn=render,
        stats_fn=lambda: dict(stats),
        port=port,
    )


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--load-config", type=Path, required=True,
                        help="run directory containing config.json and checkpoints/")
    parser.add_argument("--port", type=int, default=7007)
    parser.add_argument("--serve-seconds", type=float, default=0.0,
                        help="exit after this many seconds (0 = until interrupted)")
    args = parser.parse_args(argv)

    from neuradar_tpu.scripts.render import _load_trainer

    run_dir = args.load_config if args.load_config.is_dir() else args.load_config.parent
    trainer = _load_trainer(run_dir)
    viewer = build_viewer(trainer, port=args.port)
    viewer.start()
    try:
        if args.serve_seconds > 0:
            time.sleep(args.serve_seconds)
        else:
            while True:
                time.sleep(3600)
    except KeyboardInterrupt:
        pass
    finally:
        viewer.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
