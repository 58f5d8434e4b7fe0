"""Previous-frame-as-prediction radar baseline.

cf. reference nerfstudio/data/dataparsers/radar_eval_baseline.py: evaluate
chamfer/EMD/GOSPA when each eval radar scan is "predicted" by the previous
scan's point cloud — the sanity floor any learned radar model must beat.
"""

from __future__ import annotations

import argparse
import json

import numpy as np

from neuradar_tpu.model_components.gospa import calculate_gospa
from neuradar_tpu.model_components.radar_utils import chamfer_distance_np, emd_distance_np


def evaluate_prev_frame_baseline(radar_points, eval_indices) -> dict:
    chamfers, emds, gospas = [], [], []
    for idx in eval_indices:
        if idx == 0:
            continue
        pred = radar_points[idx - 1][:, :3]
        gt = radar_points[idx][:, :3]
        if len(pred) == 0 or len(gt) == 0:
            continue
        chamfers.append(chamfer_distance_np(pred, gt))
        emds.append(emd_distance_np(pred, gt))
        gospas.append(calculate_gospa(gt, pred)[0])
    return {
        "chamfer_mean": float(np.mean(chamfers)) if chamfers else float("nan"),
        "chamfer_median": float(np.median(chamfers)) if chamfers else float("nan"),
        "emd_mean": float(np.mean(emds)) if emds else float("nan"),
        "gospa_mean": float(np.mean(gospas)) if gospas else float("nan"),
        "num_scans": len(chamfers),
    }


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", choices=("synthetic", "zod", "vod"), default="synthetic")
    parser.add_argument("--sequence", default=None)
    parser.add_argument("--data", default=None)
    args = parser.parse_args(argv)

    if args.dataset == "synthetic":
        from neuradar_tpu.data.dataparsers.synthetic import SyntheticDataParserConfig

        cfg = SyntheticDataParserConfig()
    elif args.dataset == "zod":
        from neuradar_tpu.data.dataparsers.zod import ZodDataParserConfig

        cfg = ZodDataParserConfig()
        if args.sequence:
            cfg.sequence = args.sequence
        if args.data:
            cfg.data = args.data
    else:
        from neuradar_tpu.data.dataparsers.vod import VodDataParserConfig

        cfg = VodDataParserConfig()
        if args.sequence:
            cfg.sequence = args.sequence
        if args.data:
            cfg.data = args.data

    out = cfg.setup().get_dataparser_outputs()
    results = evaluate_prev_frame_baseline(out.radar_points, list(out.radar_split.eval))
    print(json.dumps(results, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
