"""Metrics/event writer: buffered scalar logging to JSONL + terminal.

cf. reference nerfstudio/utils/writer.py (EVENT_STORAGE + Wandb/TensorBoard/
LocalWriter backends). No wandb package exists in this environment; besides
the JSONL file (machine-readable) and a compact terminal line, scalars and
images mirror into standard TensorBoard event files via the dependency-free
wire-format writer in utils/tb_writer.py (reference writer.py:331-381's
TensorboardWriter surface). The public put_scalar/put_dict surface mirrors
the reference's.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Dict, Optional


class EventWriter:
    def __init__(self, log_dir: Optional[Path] = None, verbose: bool = True, tensorboard: bool = True):
        self.verbose = verbose
        self.log_path = None
        self._tb = None
        if log_dir is not None:
            log_dir = Path(log_dir)
            log_dir.mkdir(parents=True, exist_ok=True)
            self.log_path = log_dir / "events.jsonl"
            if tensorboard:
                from neuradar_tpu.utils.tb_writer import TBEventWriter

                self._tb = TBEventWriter(log_dir / "tb")
        self._t0 = time.time()

    def put_scalars(self, step: int, scalars: Dict[str, float]) -> None:
        record = {"step": step, "wall_time": time.time() - self._t0}
        record.update({k: float(v) for k, v in scalars.items()})
        if self.log_path is not None:
            with open(self.log_path, "a") as f:
                f.write(json.dumps(record) + "\n")
        if self._tb is not None:
            for k, v in record.items():
                if k not in ("step", "wall_time"):
                    self._tb.add_scalar(k, v, step)
        if self.verbose:
            keys = ("loss", "psnr", "train_rays_per_sec", "radar_loss", "depth_loss")
            shown = " ".join(f"{k}={record[k]:.4g}" for k in keys if k in record)
            print(f"[step {step:6d}] {shown}", flush=True)

    def put_scalar(self, step: int, name: str, value: float) -> None:
        self.put_scalars(step, {name: value})

    def put_image(self, step: int, name: str, image) -> None:
        """Save an image event as a PNG under <log_dir>/images
        (cf. reference writer.put_image; no wandb/tensorboard backends here).
        Accepts float [0,1] or uint8 arrays."""
        if self.log_path is None:
            return
        import numpy as np
        import PIL.Image

        img = np.asarray(image)
        if img.dtype != np.uint8:
            img = (np.clip(img, 0.0, 1.0) * 255).astype(np.uint8)
        out_dir = self.log_path.parent / "images"
        out_dir.mkdir(parents=True, exist_ok=True)
        PIL.Image.fromarray(img).save(out_dir / f"{name}_{step:06d}.png")
        if self._tb is not None:
            self._tb.add_image(name, img, step)
