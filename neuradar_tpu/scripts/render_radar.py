"""Radar rendering / simulation script.

cf. reference nerfstudio/scripts/render_radar.py (1407 LoC; commands at
:238-1395): dataset rendering, pose-shifted rendering, and actor-removal
rendering of radar point clouds from a trained model. Figures use matplotlib
(plotly is not available in this environment); point clouds are also written
as JSON, matching the reference's to_json surface (cameras/radars.py:360).
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def _load_trainer(run_dir: Path):
    from neuradar_tpu.scripts.render import _load_trainer as load

    return load(run_dir)


def _save_scan(out_dir: Path, name: str, pred: np.ndarray, gt: np.ndarray | None) -> None:
    out_dir.mkdir(parents=True, exist_ok=True)
    payload = {"points": pred.tolist()}
    if gt is not None:
        payload["gt_points"] = gt.tolist()
    (out_dir / f"{name}.json").write_text(json.dumps(payload))

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 6))
    if gt is not None and len(gt):
        ax.scatter(gt[:, 0], gt[:, 1], c="green", s=12, label="gt")
    if len(pred):
        ax.scatter(pred[:, 0], pred[:, 1], c="blue", s=12, label="pred")
    ax.set_xlabel("x [m]")
    ax.set_ylabel("y [m]")
    ax.legend()
    ax.set_title(name)
    fig.savefig(out_dir / f"{name}.png", dpi=100)
    plt.close(fig)


def main(argv=None) -> int:
    import jax

    from neuradar_tpu.model_components.dynamic_actors import ActorEdits
    from neuradar_tpu.model_components.radar_utils import sample_radar_points

    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers(dest="command", required=True)
    for cmd in ("dataset", "pose-shift", "actor-shift", "interpolated", "full-sensor-set", "camera-path"):
        p = sub.add_parser(cmd)
        p.add_argument("--load-config", type=Path, required=True)
        p.add_argument("--output-dir", type=Path, default=Path("renders/radar"))
        p.add_argument("--max-scans", type=int, default=16)
        if cmd == "camera-path":
            p.add_argument("--camera-path-filename", type=Path, required=True,
                           help="nerfstudio camera_path.json; each keyframe pose is "
                                "used as the radar-to-world pose "
                                "(cf. reference render_radar.py:238)")
        if cmd == "pose-shift":
            p.add_argument("--lateral-shift", type=float, default=2.0)
        if cmd == "actor-shift":
            p.add_argument("--actor-lateral", type=float, default=0.0)
            p.add_argument("--actor-longitudinal", type=float, default=0.0)
            p.add_argument("--actor-rotation", type=float, default=0.0)
            p.add_argument("--actor-index", type=int, default=-1)
            p.add_argument("--actor-remove", action="store_true",
                           help="remove the selected actor(s) instead of shifting "
                                "(cf. reference render_radar.py:603)")
        if cmd == "interpolated":
            p.add_argument("--steps-per-transition", type=int, default=2)
        if cmd == "full-sensor-set":
            p.add_argument("--frame", type=int, default=0, help="index into the eval split")
    args = parser.parse_args(argv)

    run_dir = args.load_config if args.load_config.is_dir() else args.load_config.parent
    trainer = _load_trainer(run_dir)
    pipeline = trainer.pipeline
    variables = trainer.eval_variables()
    cfg = pipeline.config.model
    rng = jax.random.PRNGKey(0)

    edits = None
    if args.command == "actor-shift":
        edits = ActorEdits(
            lateral=args.actor_lateral,
            longitudinal=args.actor_longitudinal,
            rotation=args.actor_rotation,
            index=args.actor_index,
            remove=args.actor_remove,
        )
    if args.command == "pose-shift":
        # shift all radar poses laterally before rendering (cf. render_radar.py:437)
        import jax.numpy as jnp

        tables = pipeline.datamanager.tables
        r2w = tables.radars.radar_to_worlds
        shift = jnp.einsum("nij,j->ni", r2w[..., :3, :3], jnp.asarray([0.0, args.lateral_shift, 0.0]))
        new_r2w = r2w.at[..., :3, 3].add(shift)
        pipeline.datamanager.tables = tables.replace(radars=tables.radars.replace(radar_to_worlds=new_r2w))

    if args.command == "camera-path":
        # radar renders along a viewer-exported pose path: each keyframe's
        # camera_to_world is applied as the scan's radar-to-world pose
        # (cf. reference render_radar.py camera-path rendering, :238)
        import jax.numpy as jnp

        from neuradar_tpu.scripts.render import parse_camera_path

        spec = json.loads(args.camera_path_filename.read_text())
        frames = parse_camera_path(spec)[: args.max_scans or None]
        scans = list(pipeline.datamanager.eval_radar_indices())
        if not scans:
            print("no eval radar scans available")
            return 1
        base_scan = int(scans[0])
        tables0 = pipeline.datamanager.tables
        r2w0 = np.asarray(tables0.radars.radar_to_worlds)
        out_dir = args.output_dir / args.command
        for i, pose in enumerate(frames):
            new_r2w = jnp.asarray(r2w0).at[base_scan].set(jnp.asarray(pose[:3, :4], jnp.float32))
            pipeline.datamanager.tables = tables0.replace(
                radars=tables0.radars.replace(radar_to_worlds=new_r2w)
            )
            ro = pipeline.render_radar(variables, base_scan)["radar_output"]
            rng, sub_rng = jax.random.split(rng)
            pts, keep = sample_radar_points(
                np.asarray(ro), cfg.loss.radar_loss_type, rng=sub_rng,
                threshold=cfg.existence_probability_threshold,
            )
            pred = np.asarray(pts)[np.asarray(keep)]
            _save_scan(out_dir, f"path_{i:04d}", pred, None)
        pipeline.datamanager.tables = tables0
        print(f"wrote {len(frames)} camera-path radar scans to {out_dir}")
        return 0

    if args.command == "interpolated":
        # radar renders along a smooth pose path between eval scans
        # (cf. reference render_radar.py:284 interpolated rendering); the
        # source scan's timestamp is kept so actor poses stay frame-aligned
        import jax.numpy as jnp

        from neuradar_tpu.utils.poses import matrix_to_quaternion, quaternion_slerp, quaternion_to_matrix

        scans = list(pipeline.datamanager.eval_radar_indices())[: args.max_scans]
        tables0 = pipeline.datamanager.tables
        r2w0 = np.asarray(tables0.radars.radar_to_worlds)
        out_dir = args.output_dir / args.command
        n_out = 0
        for a, b in zip(scans[:-1], scans[1:]):
            pa, pb = r2w0[int(a)], r2w0[int(b)]
            qa, qb = matrix_to_quaternion(jnp.asarray(pa[:3, :3])), matrix_to_quaternion(jnp.asarray(pb[:3, :3]))
            for s in range(args.steps_per_transition):
                t = s / args.steps_per_transition
                rot = np.asarray(quaternion_to_matrix(quaternion_slerp(qa, qb, t)))
                trans = (1 - t) * pa[:3, 3] + t * pb[:3, 3]
                pose = np.concatenate([rot, trans[:, None]], axis=1)
                new_r2w = jnp.asarray(r2w0).at[int(a)].set(jnp.asarray(pose, jnp.float32))
                pipeline.datamanager.tables = tables0.replace(
                    radars=tables0.radars.replace(radar_to_worlds=new_r2w)
                )
                ro = pipeline.render_radar(variables, int(a))["radar_output"]
                rng, sub_rng = jax.random.split(rng)
                pts, keep = sample_radar_points(
                    np.asarray(ro), cfg.loss.radar_loss_type, rng=sub_rng,
                    threshold=cfg.existence_probability_threshold,
                )
                pred = np.asarray(pts)[np.asarray(keep)]
                _save_scan(out_dir, f"interp_{n_out:04d}", pred, np.zeros((0, 3)))
                n_out += 1
        pipeline.datamanager.tables = tables0
        print(f"wrote {n_out} interpolated scans to {out_dir}")
        return 0

    if args.command == "full-sensor-set":
        # one timestamp across every sensor: rgb + depth image, predicted
        # lidar cloud, predicted radar cloud (cf. render_radar.py:933)
        from neuradar_tpu.scripts.exporter import write_ply

        out_dir = args.output_dir / args.command
        out_dir.mkdir(parents=True, exist_ok=True)
        cams = list(pipeline.datamanager.eval_camera_indices())
        lids = list(pipeline.datamanager.eval_lidar_indices())
        rads = list(pipeline.datamanager.eval_radar_indices())
        written = {}
        if cams:
            ci = int(cams[min(args.frame, len(cams) - 1)])
            rend = pipeline.render_camera(variables, ci)
            from PIL import Image

            Image.fromarray((np.clip(rend["rgb"], 0, 1) * 255).astype(np.uint8)).save(out_dir / "rgb.png")
            d = rend["depth"]
            Image.fromarray((np.clip(d / max(d.max(), 1e-6), 0, 1) * 255).astype(np.uint8)).save(
                out_dir / "depth.png")
            written["camera_frame"] = ci
        if lids:
            li = int(lids[min(args.frame, len(lids) - 1)])
            lr = pipeline.render_lidar(variables, li)
            keep = lr["ray_drop_prob"][:, 0] < 0.5
            keep[int(lr["num_valid"]):] = False  # drop static-shape padding rows
            dirs = lr["points"][:, :3] / np.linalg.norm(lr["points"][:, :3], axis=-1, keepdims=True).clip(1e-6)
            write_ply(out_dir / "lidar.ply", (dirs * lr["depth"])[keep])
            written["lidar_scan"] = li
        if rads:
            ri = int(rads[min(args.frame, len(rads) - 1)])
            ro = pipeline.render_radar(variables, ri)["radar_output"]
            rng, sub_rng = jax.random.split(rng)
            pts, keep = sample_radar_points(
                np.asarray(ro), cfg.loss.radar_loss_type, rng=sub_rng,
                threshold=cfg.existence_probability_threshold,
            )
            write_ply(out_dir / "radar.ply", np.asarray(pts)[np.asarray(keep)][:, :3])
            written["radar_scan"] = ri
        (out_dir / "info.json").write_text(json.dumps(written))
        print(f"wrote full sensor set to {out_dir}: {written}")
        return 0

    scans = list(pipeline.datamanager.eval_radar_indices())[: args.max_scans]
    for scan_idx in scans:
        ro = pipeline.render_radar(variables, int(scan_idx), actor_edits=edits)["radar_output"]
        rng, sub_rng = jax.random.split(rng)
        pts, keep = sample_radar_points(
            np.asarray(ro), cfg.loss.radar_loss_type, rng=sub_rng,
            threshold=cfg.existence_probability_threshold,
        )
        pred = np.asarray(pts)[np.asarray(keep)]
        gt = pipeline.outputs.radar_points[int(scan_idx)][:, :3]
        _save_scan(args.output_dir / args.command, f"scan_{int(scan_idx):04d}", pred, gt)
    print(f"wrote {len(scans)} scans to {args.output_dir / args.command}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
