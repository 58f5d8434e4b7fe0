"""Camera rendering script: dataset views, pose-shifted views, interpolated
trajectories.

cf. reference nerfstudio/scripts/render.py (1290 LoC; dataset render,
camera-path render, lane-shift render used for FID eval at
ad_pipeline.py:310-405). Writes PNGs + a metadata JSON per render.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def _load_trainer(run_dir: Path):
    from neuradar_tpu.configs.method_configs import get_method
    from neuradar_tpu.engine.trainer import Trainer

    cfg_json = json.loads((run_dir / "config.json").read_text())
    config = get_method(cfg_json.get("method_name", "neuradar-synthetic"))
    from neuradar_tpu.configs.cli import apply_config_dict

    apply_config_dict(config, cfg_json)
    config.output_dir = cfg_json.get("output_dir", str(run_dir.parent.parent))
    config.experiment_name = cfg_json.get("experiment_name", run_dir.parent.name)
    config.load_dir = str(run_dir / "checkpoints")
    trainer = Trainer(config)
    trainer.setup()
    return trainer


def _save_image(path: Path, img: np.ndarray) -> None:
    import PIL.Image

    path.parent.mkdir(parents=True, exist_ok=True)
    PIL.Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(path)


def parse_camera_path(spec: dict) -> list:
    """Extract [3, 4] c2w matrices from a nerfstudio camera_path.json dict.

    Accepts both the flat 16-float row-major `camera_to_world` layout the
    viewer exports and nested 4x4 / 3x4 lists."""
    frames = []
    for f in spec.get("camera_path", spec.get("keyframes", [])):
        m = np.asarray(f["camera_to_world"], np.float32)
        if m.ndim == 1:
            m = m.reshape(4, 4) if m.size == 16 else m.reshape(3, 4)
        frames.append(m[:3, :4])
    return frames


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers(dest="command", required=True)
    cp = sub.add_parser("camera-path")
    cp.add_argument("--load-config", type=Path, required=True)
    cp.add_argument("--camera-path-filename", type=Path, required=True,
                    help="nerfstudio camera_path.json (viewer-exported)")
    cp.add_argument("--output-dir", type=Path, default=Path("renders/camera"))
    for cmd in ("dataset", "lane-shift", "interpolated", "actor-shift", "spiral"):
        p = sub.add_parser(cmd)
        p.add_argument("--load-config", type=Path, required=True)
        p.add_argument("--output-dir", type=Path, default=Path("renders/camera"))
        p.add_argument("--split", choices=("eval", "train"), default="eval")
        p.add_argument("--max-frames", type=int, default=16)
        if cmd == "lane-shift":
            p.add_argument("--shift", type=float, default=2.0, help="lateral shift in meters")
        if cmd == "interpolated":
            p.add_argument("--steps-per-transition", type=int, default=4,
                           help="in-between frames per keyframe pair")
        if cmd == "spiral":
            p.add_argument("--radius", type=float, default=0.5, help="spiral radius in meters")
            p.add_argument("--rots", type=int, default=2)
            p.add_argument("--zrate", type=float, default=0.5)
        if cmd == "actor-shift":
            p.add_argument("--actor-lateral", type=float, default=0.0)
            p.add_argument("--actor-longitudinal", type=float, default=0.0)
            p.add_argument("--actor-rotation", type=float, default=0.0)
            p.add_argument("--actor-index", type=int, default=-1)
            p.add_argument("--actor-remove", action="store_true",
                           help="remove instead of shifting (actor-removal renders)")
    args = parser.parse_args(argv)

    run_dir = args.load_config if args.load_config.is_dir() else args.load_config.parent
    trainer = _load_trainer(run_dir)
    pipeline = trainer.pipeline
    variables = trainer.eval_variables()

    edits = None
    if args.command == "actor-shift":
        # camera renders with shifted/removed actors (cf. reference
        # render.py actor-removal renders + the FID actor-shift views)
        from neuradar_tpu.model_components.dynamic_actors import ActorEdits

        edits = ActorEdits(
            lateral=args.actor_lateral, longitudinal=args.actor_longitudinal,
            rotation=args.actor_rotation, index=args.actor_index, remove=args.actor_remove,
        )

    if args.command == "lane-shift":
        # shift camera poses laterally (FID-style novel views,
        # cf. ad_pipeline.py:310-405)
        import jax.numpy as jnp

        tables = pipeline.datamanager.tables
        c2w = tables.cameras.camera_to_worlds
        lateral = jnp.einsum("nij,j->ni", c2w[..., :3, :3], jnp.asarray([1.0, 0.0, 0.0]))
        new_c2w = c2w.at[..., :3, 3].add(args.shift * lateral)
        pipeline.datamanager.tables = tables.replace(
            cameras=tables.cameras.replace(camera_to_worlds=new_c2w)
        )

    if args.command == "camera-path":
        # nerfstudio viewer-exported camera_path.json: row-major 4x4 (or 3x4)
        # camera_to_world per keyframe (cf. reference render.py's camera-path
        # input, scripts/render.py:238)
        spec = json.loads(args.camera_path_filename.read_text())
        frames = parse_camera_path(spec)
        hw = (int(spec.get("render_height", 96)), int(spec.get("render_width", 156)))
        # nerfstudio camera_path.json camera_type names (cf. reference
        # camera_paths.get_path_from_json:190-199); the stereo types render
        # one image per eye and combine — ODS left-over-right, VR180
        # left-beside-right (reference scripts/render.py:471-583, ffmpeg
        # vstack/hstack replaced by a numpy concatenate)
        from neuradar_tpu.cameras.cameras import CameraType

        ct_name = str(spec.get("camera_type", "perspective")).lower()
        ct_map = {
            "perspective": [CameraType.PERSPECTIVE],
            "fisheye": [CameraType.FISHEYE],
            "equirectangular": [CameraType.EQUIRECTANGULAR],
            "omnidirectional": [CameraType.OMNIDIRECTIONALSTEREO_L, CameraType.OMNIDIRECTIONALSTEREO_R],
            "vr180": [CameraType.VR180_L, CameraType.VR180_R],
        }
        eyes = ct_map.get(ct_name, [CameraType.PERSPECTIVE])
        out_dir = args.output_dir / "camera_path"
        for i, c2w in enumerate(frames):
            imgs = [
                np.asarray(pipeline.render_pose(variables, c2w, hw=hw, camera_type=int(ct)), np.float32) / 255.0
                for ct in eyes
            ]
            if len(imgs) == 2:
                axis = 0 if eyes[0] == CameraType.OMNIDIRECTIONALSTEREO_L else 1
                img = np.concatenate(imgs, axis=axis)
            else:
                img = imgs[0]
            _save_image(out_dir / f"frame_{i:05d}.png", img)
        (out_dir / "render_info.json").write_text(json.dumps(
            {"command": "camera-path", "frames": len(frames), "camera_type": ct_name}))
        print(f"wrote {len(frames)} camera-path frames to {out_dir}")
        return 0

    if args.command == "spiral":
        # spiral trajectory seeded at the first split camera (reference
        # render.py SpiralRender:794 + camera_paths.get_spiral_path:107)
        from neuradar_tpu.utils.poses import get_spiral_path

        split_idx = list(pipeline.datamanager.eval_camera_indices() if args.split == "eval"
                         else pipeline.outputs.camera_split.train)
        seed_c2w = np.asarray(pipeline.outputs.camera_to_worlds[int(split_idx[0])], np.float32)
        poses = np.asarray(get_spiral_path(seed_c2w, steps=args.max_frames,
                                           radius=args.radius, rots=args.rots, zrate=args.zrate))
        out_dir = args.output_dir / args.command
        for i, c2w in enumerate(poses):
            img = pipeline.render_pose(variables, c2w.astype(np.float32))
            _save_image(out_dir / f"frame_{i:05d}.png", np.asarray(img, np.float32) / 255.0)
        (out_dir / "render_info.json").write_text(
            json.dumps({"command": "spiral", "seed_camera": int(split_idx[0]), "frames": len(poses)})
        )
        print(f"wrote {len(poses)} spiral frames to {out_dir}")
        return 0

    if args.command == "interpolated":
        # smooth camera path through the dataset poses: slerp rotations,
        # lerp translations (cf. reference render.py 'interpolate' path,
        # scripts/render.py:284)
        import jax.numpy as jnp

        from neuradar_tpu.utils.poses import matrix_to_quaternion, quaternion_slerp, quaternion_to_matrix

        split_idx = list(pipeline.datamanager.eval_camera_indices() if args.split == "eval"
                         else pipeline.outputs.camera_split.train)[: args.max_frames]
        keys = np.asarray(pipeline.outputs.camera_to_worlds[np.asarray(split_idx, np.int64)])
        out_dir = args.output_dir / args.command
        n_out = 0
        for a, b in zip(keys[:-1], keys[1:]):
            qa, qb = matrix_to_quaternion(jnp.asarray(a[:3, :3])), matrix_to_quaternion(jnp.asarray(b[:3, :3]))
            for s in range(args.steps_per_transition):
                t = s / args.steps_per_transition
                rot = np.asarray(quaternion_to_matrix(quaternion_slerp(qa, qb, t)))
                trans = (1 - t) * a[:3, 3] + t * b[:3, 3]
                c2w = np.concatenate([rot, trans[:, None]], axis=1)
                img = pipeline.render_pose(variables, c2w.astype(np.float32))
                _save_image(out_dir / f"frame_{n_out:05d}.png", np.asarray(img, np.float32) / 255.0)
                n_out += 1
        (out_dir / "render_info.json").write_text(
            json.dumps({"command": "interpolated", "keyframes": [int(i) for i in split_idx], "frames": n_out})
        )
        print(f"wrote {n_out} interpolated frames to {out_dir}")
        return 0

    split = pipeline.datamanager.eval_camera_indices() if args.split == "eval" else \
        pipeline.outputs.camera_split.train
    out_dir = args.output_dir / args.command
    frames = list(split)[: args.max_frames]
    for cam_idx in frames:
        rend = pipeline.render_camera(variables, int(cam_idx), actor_edits=edits)
        _save_image(out_dir / f"frame_{int(cam_idx):05d}.png", rend["rgb"])
        depth = np.asarray(rend["depth"], np.float32)
        from neuradar_tpu.utils.colormaps import apply_depth_colormap

        _save_image(out_dir / f"depth_{int(cam_idx):05d}.png", apply_depth_colormap(depth[..., None]))
    (out_dir / "render_info.json").write_text(
        json.dumps({"command": args.command, "frames": [int(f) for f in frames]})
    )
    print(f"wrote {len(frames)} frames to {out_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
