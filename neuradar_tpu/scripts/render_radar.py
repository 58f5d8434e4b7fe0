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
    for cmd in ("dataset", "pose-shift", "actor-shift"):
        p = sub.add_parser(cmd)
        p.add_argument("--load-config", type=Path, required=True)
        p.add_argument("--output-dir", type=Path, default=Path("renders/radar"))
        p.add_argument("--max-scans", type=int, default=16)
        if cmd == "pose-shift":
            p.add_argument("--lateral-shift", type=float, default=2.0)
        if cmd == "actor-shift":
            p.add_argument("--actor-lateral", type=float, default=0.0)
            p.add_argument("--actor-longitudinal", type=float, default=0.0)
            p.add_argument("--actor-rotation", type=float, default=0.0)
            p.add_argument("--actor-index", type=int, default=-1)
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
        )
    if args.command == "pose-shift":
        # shift all radar poses laterally before rendering (cf. render_radar.py:437)
        import jax.numpy as jnp

        tables = pipeline.datamanager.tables
        r2w = tables.radars.radar_to_worlds
        shift = jnp.einsum("nij,j->ni", r2w[..., :3, :3], jnp.asarray([0.0, args.lateral_shift, 0.0]))
        new_r2w = r2w.at[..., :3, 3].add(shift)
        pipeline.datamanager.tables = tables.replace(radars=tables.radars.replace(radar_to_worlds=new_r2w))

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
