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


def build_viewer(trainer, port: int = 7007):
    """ViewerServer wired to a (frozen) trainer — the same callback stack the
    in-training viewer uses, minus the train-lock contention."""
    from neuradar_tpu.viewer.callbacks import make_viewer_render_fn, scene_duration
    from neuradar_tpu.viewer.viewer import ViewerServer

    pipeline = trainer.pipeline
    variables = trainer.eval_variables()
    render = make_viewer_render_fn(pipeline, lambda: variables)

    stats = {"step": trainer._step, "mode": "frozen"}
    duration = scene_duration(pipeline)
    if duration > 0:
        stats["scene_duration"] = round(duration, 2)
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
