"""Blender/nerfstudio-style multi-scene benchmarking harness.

cf. reference nerfstudio/scripts/benchmarking/launch_train_blender.sh (+
launch_eval_blender.sh): train the nerfacto baseline on every scene under a
data root and aggregate the final PSNRs into one JSON table. Scenes are
directories containing a `transforms.json` (the COLMAP/polycam/blender
export format consumed by the `nerfacto-data` method).

Usage:
  python -m neuradar_tpu.scripts.benchmarking --data-root /data/blender \
      [--scenes lego chair] [--max-iters 5000] [--output benchmark.json]
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--data-root", type=Path, required=True,
                        help="directory of scene dirs, each with transforms.json")
    parser.add_argument("--scenes", nargs="*", default=None,
                        help="scene subdirectories to run (default: all found)")
    parser.add_argument("--max-iters", type=int, default=5000)
    parser.add_argument("--output", type=Path, default=Path("benchmark.json"))
    parser.add_argument("--output-dir", type=Path, default=Path("outputs/benchmarking"))
    parser.add_argument("--override", action="append", default=[],
                        help="config override a.b.c=value, applied to every scene's TrainerConfig")
    args = parser.parse_args(argv)

    from neuradar_tpu.configs.method_configs import get_method
    from neuradar_tpu.engine.nerfacto_trainer import NerfactoTrainer

    scenes = args.scenes or sorted(
        p.name for p in args.data_root.iterdir() if (p / "transforms.json").exists()
    )
    if not scenes:
        print(f"no scenes with transforms.json under {args.data_root}")
        return 1

    results = {}
    for scene in scenes:
        cfg = get_method("nerfacto-data")
        cfg.dataparser.data = str(args.data_root / scene)
        cfg.max_num_iterations = args.max_iters
        if args.override:
            from neuradar_tpu.configs.cli import set_by_path

            for ov in args.override:
                key, value = ov.split("=", 1)
                set_by_path(cfg, key.replace("-", "_"), value)
        cfg.experiment_name = scene
        cfg.output_dir = str(args.output_dir)
        t0 = time.time()
        trainer = NerfactoTrainer(cfg)
        trainer.setup()
        metrics = trainer.train(args.max_iters)
        # held-out-split PSNR, matching launch_eval_blender.sh semantics —
        # the final train-batch psnr is reported separately and is NOT
        # comparable to published blender numbers
        results[scene] = {
            "psnr": trainer.eval_psnr().get("eval_psnr"),
            "train_psnr": metrics.get("psnr"),
            "loss": metrics.get("loss"),
            "train_time_s": round(time.time() - t0, 1),
            "iters": args.max_iters,
        }
        print(f"[benchmarking] {scene}: {results[scene]}")

    psnrs = [r["psnr"] for r in results.values() if r["psnr"] is not None]
    table = {
        "method": "nerfacto-data",
        "scenes": results,
        # None (not a fake 0.0) when no scene produced a psnr
        "mean_psnr": sum(psnrs) / len(psnrs) if psnrs else None,
    }
    args.output.parent.mkdir(parents=True, exist_ok=True)
    args.output.write_text(json.dumps(table, indent=2))
    print(json.dumps(table, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
