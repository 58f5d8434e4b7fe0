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
    from neuradar_tpu.scripts.render import _load_trainer

    trainer = _load_trainer(run_dir)
    variables = trainer.eval_variables()
    results = {}
    results.update(trainer.pipeline.get_average_eval_image_metrics(variables))
    results.update(trainer.pipeline.get_average_eval_lidar_metrics(variables))
    results.update(
        trainer.pipeline.get_average_eval_radar_metrics(variables, sampling_rounds=args.radar_sampling_rounds)
    )
    out = {
        "experiment": trainer.config.experiment_name,
        "method": trainer.config.method_name,
        "checkpoint_step": trainer._step,
        "results": results,
    }
    args.output_path.parent.mkdir(parents=True, exist_ok=True)
    args.output_path.write_text(json.dumps(out, indent=2))
    print(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
