"""Splatfacto trainer: whole-image 3DGS optimization.

cf. reference splatfacto training (models/splatfacto.py + the standard
nerfstudio full-image datamanager): one random training image per step,
Adam with per-parameter-group learning rates, periodic densify/cull.
All refinement is fixed-capacity masked ops, so the jitted train step and the
jitted refine step each compile exactly once.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field as dataclass_field
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from neuradar_tpu.data.dataparsers.base import DataparserOutputs
from neuradar_tpu.models import splatfacto as sf
from neuradar_tpu.utils.writer import EventWriter


@dataclass
class SplatfactoTrainerConfig:
    method_name: str = "splatfacto"
    experiment_name: str = "synthetic"
    output_dir: str = "outputs"
    model: sf.SplatfactoConfig = dataclass_field(default_factory=sf.SplatfactoConfig)
    max_num_iterations: int = 30000
    steps_per_log: int = 100
    steps_per_eval_all_images: int = 5000
    seed: int = 42
    # per-group lrs (cf. splatfacto method config)
    lr_means: float = 1.6e-4
    lr_scales: float = 5e-3
    lr_quats: float = 1e-3
    lr_opacity: float = 5e-2
    lr_rgb: float = 2.5e-2
    dataparser: object = None


class SplatfactoTrainer:
    def __init__(self, config: SplatfactoTrainerConfig, dataparser_outputs: Optional[DataparserOutputs] = None):
        self.config = config
        if dataparser_outputs is None:
            dataparser_outputs = config.dataparser.setup().get_dataparser_outputs()
        self.outputs = dataparser_outputs
        self.writer = EventWriter(log_dir=self._run_dir / "logs")
        self._step = 0

    @property
    def _run_dir(self) -> Path:
        return Path(self.config.output_dir) / self.config.experiment_name / self.config.method_name

    def setup(self):
        out = self.outputs
        # seed gaussians from world-frame lidar returns (cf. splatfacto seeds)
        pts, cols = [], []
        rng = np.random.RandomState(self.config.seed)
        for si in out.lidar_split.train[:8]:
            p = out.lidar_points[si]
            p = p[np.linalg.norm(p[:, :3], axis=1) < 1e3]
            sel = rng.choice(len(p), min(len(p), 8192), replace=False)
            l2w = out.lidar_to_worlds[si]
            pts.append(p[sel, :3] @ l2w[:3, :3].T + l2w[:3, 3])
            cols.append(np.tile(p[sel, 3:4], (1, 3)))
        points = np.concatenate(pts) if pts else rng.randn(4096, 3).astype(np.float32) * 10
        colors = np.concatenate(cols) if cols else np.full((4096, 3), 0.5, np.float32)
        self.params, self.state = sf.init_gaussians(self.config.model, points, colors)

        c = self.config
        self.tx = optax.multi_transform(
            {
                "means": optax.adam(c.lr_means),
                "log_scales": optax.adam(c.lr_scales),
                "quats": optax.adam(c.lr_quats),
                "opacity_logits": optax.adam(c.lr_opacity),
                "rgb_logits": optax.adam(c.lr_rgb),
                # SH rest bands train 20x slower than DC (splatfacto convention)
                "sh_rest": optax.adam(c.lr_rgb / 20.0),
            },
            {k: k for k in self.params},
        )
        self.opt_state = self.tx.init(self.params)

        cfg_model = self.config.model
        H, W = out.image_size
        # crop to tile multiples
        self.H = H // sf.TILE * sf.TILE
        self.W = W // sf.TILE * sf.TILE

        H, W = self.H, self.W

        def train_step(params, opt_state, state, w2c, intrin, gt):
            camera = {"w2c": w2c, "fx": intrin[0], "fy": intrin[1], "cx": intrin[2], "cy": intrin[3],
                      "height": H, "width": W}

            def loss_fn(p, off):
                loss, rend = sf.splat_loss(cfg_model, p, state, camera, gt, mean2d_offset=off)
                return loss, rend

            zero_off = jnp.zeros((cfg_model.max_gaussians, 2), jnp.float32)
            (loss, rend), (grads, g_off) = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
                params, zero_off
            )
            _mean2d, _radius, in_view, overflow_frac = rend["aux"]
            # TRUE screen-space mean gradient (via the zero offset injection),
            # scaled pixels -> half-resolution units so densify_grad_thresh
            # keeps the reference splatfacto's calibration
            g2d = jnp.linalg.norm(g_off, axis=-1) * (max(H, W) / 2.0)
            state = sf.accumulate_grad_stats(state, g2d, in_view)
            updates, opt_state = self.tx.update(grads, opt_state)
            params = optax.apply_updates(params, updates)
            return params, opt_state, state, loss, overflow_frac

        # donate params/opt-state/refine-state: in-place HBM update instead
        # of double-buffering the full gaussian field + Adam moments each step
        self._train_step = jax.jit(train_step, donate_argnums=(0, 1, 2))
        self._refine = jax.jit(lambda p, s, k, step: sf.refine_gaussians(cfg_model, p, s, k, step))

        def eval_render(params, state, w2c, intrin, gt):
            camera = {"w2c": w2c, "fx": intrin[0], "fy": intrin[1], "cx": intrin[2], "cy": intrin[3],
                      "height": H, "width": W}
            rend = sf.render_splats(cfg_model, params, state, camera)
            # colors clamp min-only during training; bound the metric inputs
            rgb = jnp.clip(rend["rgb"], 0.0, 1.0)
            mse = jnp.mean((rgb - gt) ** 2)
            return rgb, mse, sf._ssim(rgb, gt)

        # jitted eval render: eager full-model calls cost ~5x on the 1-core
        # host (see CLAUDE.md); the compile lands in the persistent cache
        self._eval_render = jax.jit(eval_render)

    def _camera_arrays(self, idx: int):
        out = self.outputs
        c2w = np.vstack([out.camera_to_worlds[idx], [0, 0, 0, 1]])
        w2c = np.linalg.inv(c2w)[:3]
        return jnp.asarray(w2c, jnp.float32), jnp.asarray(out.intrinsics[idx], jnp.float32)

    def _camera(self, idx: int) -> Dict:
        w2c, intrin = self._camera_arrays(idx)
        return {
            "w2c": w2c,
            "fx": float(intrin[0]), "fy": float(intrin[1]), "cx": float(intrin[2]), "cy": float(intrin[3]),
            "height": self.H, "width": self.W,
        }

    def train(self, num_iterations: Optional[int] = None) -> Dict[str, float]:
        cfg = self.config
        # default: train TO max_num_iterations (resume-aware), not for
        # max_num_iterations additional steps
        n = num_iterations if num_iterations is not None else max(cfg.max_num_iterations - self._step, 0)
        rng = np.random.RandomState(cfg.seed)
        key = jax.random.PRNGKey(cfg.seed)
        train_frames = self.outputs.camera_split.train
        last: Dict[str, float] = {}
        t0 = time.perf_counter()
        for i in range(n):
            idx = int(rng.choice(train_frames))
            w2c, intrin = self._camera_arrays(idx)
            gt = jnp.asarray(self.outputs.images[idx, : self.H, : self.W].astype(np.float32) / 255.0)
            self.params, self.opt_state, self.state, loss, overflow = self._train_step(
                self.params, self.opt_state, self.state, w2c, intrin, gt
            )
            if self._step > cfg.model.warmup_steps and self._step % cfg.model.refine_every == 0:
                key, sub = jax.random.split(key)
                self.params, self.state, refreshed = self._refine(self.params, self.state, sub,
                                                                  jnp.int32(self._step))
                # reset Adam moments ONLY for the refreshed slots (cf. the
                # reference's dup_in_optim); surviving gaussians keep theirs
                fresh = self.tx.init(self.params)
                G = cfg.model.max_gaussians

                def merge(old, new):
                    if getattr(old, "ndim", 0) >= 1 and old.shape[0] == G:
                        m = refreshed.reshape((G,) + (1,) * (old.ndim - 1))
                        return jnp.where(m, new, old)
                    return old  # counts / scalar state keep their history

                self.opt_state = jax.tree.map(merge, self.opt_state, fresh)
                reset_interval = cfg.model.refine_every * cfg.model.reset_alpha_every
                if (cfg.model.reset_alpha_every and self._step % reset_interval == 0
                        and self._step < cfg.model.stop_split_at):
                    # opacity reset (reference splatfacto.py:486-498, gated on
                    # step < stop_split_at): clamp all opacities to 2x the
                    # cull threshold and zero the opacity optimizer moments so
                    # the clamp isn't undone by stale momentum
                    self.params = sf.reset_opacities(cfg.model, self.params)
                    inner = dict(self.opt_state.inner_states)
                    inner["opacity_logits"] = fresh.inner_states["opacity_logits"]
                    self.opt_state = self.opt_state._replace(inner_states=inner)
            if self._step % cfg.steps_per_log == 0:
                # tile_overflow_frac: fraction of tiles whose overlapping
                # gaussians exceed tile_top_k (silent truncation indicator).
                # ONE batched fetch — each value fetch is a ~37 ms relay sync.
                loss_h, alive_h, overflow_h = jax.device_get((loss, jnp.sum(self.state["alive"]), overflow))
                last = {"loss": float(loss_h), "num_gaussians": float(alive_h),
                        "tile_overflow_frac": float(overflow_h)}
                self.writer.put_scalars(self._step, last)
            if (cfg.steps_per_eval_all_images and self._step > 0
                    and self._step % cfg.steps_per_eval_all_images == 0):
                ev = self.eval_psnr()
                self.writer.put_scalars(self._step, ev)
                last.update(ev)
            self._step += 1
        last["total_train_time"] = time.perf_counter() - t0
        last.update(self.eval_psnr())
        self.save_checkpoint()
        return last

    def save_checkpoint(self, path: Optional[Path] = None) -> Path:
        """Gaussians + refine state to a single npz (cf. the reference's
        per-step ckpts; 3DGS state is one flat dict, npz is sufficient)."""
        path = Path(path) if path is not None else self._run_dir / "gaussians.npz"
        path.parent.mkdir(parents=True, exist_ok=True)
        np.savez(
            path,
            step=self._step,
            **{f"param_{k}": np.asarray(v) for k, v in self.params.items()},
            **{f"state_{k}": np.asarray(v) for k, v in self.state.items()},
        )
        return path

    def load_checkpoint(self, path: Path) -> None:
        with np.load(path) as z:
            self._step = int(z["step"])
            self.params = {k[6:]: jnp.asarray(z[k]) for k in z.files if k.startswith("param_")}
            self.state = {k[6:]: jnp.asarray(z[k]) for k in z.files if k.startswith("state_")}
        self.opt_state = self.tx.init(self.params)

    def export_ply(self, path: Optional[Path] = None) -> Path:
        path = Path(path) if path is not None else self._run_dir / "splat.ply"
        sf.export_gaussians_ply(path, self.params, self.state["alive"])
        return path

    def eval_psnr(self) -> Dict[str, float]:
        # dispatch every eval render through the jitted path first, then
        # fetch — one sync per image instead of eager op-by-op execution
        pending = []
        for idx in self.outputs.camera_split.eval:
            w2c, intrin = self._camera_arrays(int(idx))
            gt = jnp.asarray(self.outputs.images[int(idx), : self.H, : self.W].astype(np.float32) / 255.0)
            _rgb, mse, ssim = self._eval_render(self.params, self.state, w2c, intrin, gt)
            pending.append((mse, ssim))
        psnrs, ssims = [], []
        for mse, ssim in pending:
            mse, ssim = jax.device_get((mse, ssim))
            psnrs.append(-10 * np.log10(max(float(mse), 1e-10)))
            ssims.append(float(ssim))
        return {
            "psnr": float(np.mean(psnrs)) if psnrs else 0.0,
            "ssim": float(np.mean(ssims)) if ssims else 0.0,
        }
