"""Eval-render throughput bench: eval rays/sec + fps (the reference's second
perf metric, nerfstudio/pipelines/ad_pipeline.py:216-221).

Builds the synthetic reference-scale scene, inits the flagship NeuRadar model,
and times `get_average_eval_image_metrics` (full-image renders chunked at
eval_num_rays_per_chunk = 2^15, like the reference operating point). Appends
the reading to BENCH_HISTORY.jsonl. Run during a healthy relay window
(`tools/relay_watch.py`); the headline train bench stays bench.py.

Usage: timeout -k 60 2400 python tools/bench_eval.py [--images 4] [--scale full]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # repo root
from neuradar_tpu.utils.cache_dirs import jax_cache_dir

T0 = time.perf_counter()


def log(msg):
    print(f"[bench_eval +{time.perf_counter() - T0:.1f}s] {msg}", file=sys.stderr, flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=4, help="eval images to render")
    ap.add_argument("--scale", choices=["full", "small"], default="full",
                    help="full: 96x156 reference-proxy frames; small: 64x96")
    ap.add_argument("--history", default="BENCH_HISTORY.jsonl")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", jax_cache_dir("tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from neuradar_tpu.data.datamanager import ADDataManagerConfig
    from neuradar_tpu.data.dataparsers.synthetic import SyntheticDataParser, SyntheticDataParserConfig
    from neuradar_tpu.pipelines.ad_neuradar_pipeline import ADNeuRadarPipeline, ADNeuRadarPipelineConfig

    if args.scale == "full":
        parser_cfg = SyntheticDataParserConfig(num_frames=24, image_height=96, image_width=156,
                                               lidar_points_per_scan=32768)
    else:
        parser_cfg = SyntheticDataParserConfig(num_frames=8, image_height=64, image_width=96,
                                               lidar_points_per_scan=8192)
    outputs = SyntheticDataParser(parser_cfg).get_dataparser_outputs()
    pipe_cfg = ADNeuRadarPipelineConfig(datamanager=ADDataManagerConfig.micro())
    pipe_cfg.model.loss.vgg_mult = 0.0
    pipe_cfg.model.compute_dtype = "bfloat16"
    pipeline = ADNeuRadarPipeline(pipe_cfg, outputs)
    log(f"backend {jax.devices()[0].platform}; initializing variables...")
    variables = pipeline.init_variables(0)
    log("init done; warm render (compile)...")

    # cap the eval set so a degraded relay still finishes within the timeout
    idxs = pipeline.datamanager.eval_camera_indices()
    if args.images and args.images < len(idxs):
        idxs = idxs[: args.images]
        pipeline.datamanager.eval_camera_indices = lambda: idxs

    # warmup compile on one image, then the timed pass measures steady-state
    idx0 = idxs[0]
    _ = pipeline.render_camera(variables, int(idx0))
    log("compiled; timing eval metrics pass...")
    metrics = pipeline.get_average_eval_image_metrics(variables)
    rec = {
        "metric": "eval_rays_per_sec",
        "value": round(float(metrics["eval_rays_per_sec"]), 1),
        "unit": "rays/s",
        "fps": round(float(metrics["fps"]), 3),
        "psnr": round(float(metrics.get("psnr", 0.0)), 2),
        "images": int(len(idxs)),
    }
    print(json.dumps(rec), flush=True)
    try:
        with open(args.history, "a") as f:
            f.write(json.dumps({"ts": time.time(), "args": ["bench_eval", args.scale], **rec}) + "\n")
    except OSError:
        pass


if __name__ == "__main__":
    main()
