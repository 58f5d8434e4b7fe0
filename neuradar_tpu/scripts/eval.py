"""Eval entrypoint: load a run dir + checkpoint, compute metrics, write JSON.

cf. reference nerfstudio/scripts/eval.py:34-83 (eval_setup at
utils/eval_utils.py:34-72 reloads the saved config + latest checkpoint).
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--load-config", type=Path, required=True,
                        help="run directory containing config.json and checkpoints/")
    parser.add_argument("--output-path", type=Path, default=Path("eval_output.json"))
    parser.add_argument("--radar-sampling-rounds", type=int, default=10)
    args = parser.parse_args(argv)

    run_dir = args.load_config if args.load_config.is_dir() else args.load_config.parent
    cfg_json = json.loads((run_dir / "config.json").read_text())

    from neuradar_tpu.configs.method_configs import get_method
    from neuradar_tpu.engine.trainer import Trainer

    config = get_method(cfg_json.get("method_name", "neuradar-synthetic"))
    from neuradar_tpu.configs.cli import apply_config_dict

    apply_config_dict(config, cfg_json)
    config.output_dir = cfg_json.get("output_dir", str(run_dir.parent.parent))
    config.experiment_name = cfg_json.get("experiment_name", run_dir.parent.name)
    config.load_dir = str(run_dir / "checkpoints")

    trainer = Trainer(config)
    trainer.setup()
    variables = trainer.eval_variables()
    results = {}
    results.update(trainer.pipeline.get_average_eval_image_metrics(variables))
    results.update(trainer.pipeline.get_average_eval_lidar_metrics(variables))
    results.update(
        trainer.pipeline.get_average_eval_radar_metrics(variables, sampling_rounds=args.radar_sampling_rounds)
    )
    out = {
        "experiment": config.experiment_name,
        "method": config.method_name,
        "checkpoint_step": trainer._step,
        "results": results,
    }
    args.output_path.parent.mkdir(parents=True, exist_ok=True)
    args.output_path.write_text(json.dumps(out, indent=2))
    print(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
