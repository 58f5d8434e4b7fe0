"""Trainer: jitted train step, eval cadence, checkpointing, early stopping.

cf. reference nerfstudio/engine/trainer.py. Differences by design:
* the whole optimization step (ray gen -> losses -> grads -> per-group
  updates) is ONE jitted function; there is no GradScaler because TPU bf16
  needs no loss scaling (trainer.py:549-598 uses AMP + GradScaler),
* rays/sec accounting matches trainer.py:333-340 (world_size x rays/batch /
  iteration time),
* checkpoints are orbax trees {step, params, opt_state, batch_stats}
  (cf. save_checkpoint at trainer.py:513-547),
* MetricTracker implements the same margin-tolerant best tracking + early
  stopping (trainer.py:60-106).
"""

from __future__ import annotations

import dataclasses
import functools
import time
from dataclasses import dataclass, field as dataclass_field
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from neuradar_tpu.engine.optimizers import OptimizerGroupConfig, build_optimizer, default_optimizer_groups
from neuradar_tpu.pipelines.ad_neuradar_pipeline import ADNeuRadarPipeline, ADNeuRadarPipelineConfig
from neuradar_tpu.utils.writer import EventWriter


@dataclass
class MetricTrackerConfig:
    """cf. trainer.py:137-140."""

    metric: str = "loss"
    margin: float = 0.05
    patience: int = 3


class MetricTracker:
    """Margin-tolerant best tracking + degradation detection (trainer.py:60-106)."""

    def __init__(self, config: MetricTrackerConfig):
        self.config = config
        self.best: Optional[float] = None
        self.num_degradations = 0

    def update(self, value: float) -> bool:
        """Returns True if the metric degraded past the margin."""
        if self.best is None or value < self.best:
            self.best = value
            self.num_degradations = 0
            return False
        if value > self.best * (1 + self.config.margin):
            self.num_degradations += 1
        return self.num_degradations > 0

    @property
    def should_stop(self) -> bool:
        return self.num_degradations >= self.config.patience


@dataclass
class TrainerConfig:
    """cf. reference TrainerConfig (engine/trainer.py:109-156) and the
    neuradar method preset (configs/method_configs.py:367-413)."""

    method_name: str = "neuradar"
    experiment_name: str = "synthetic"
    output_dir: str = "outputs"
    pipeline: ADNeuRadarPipelineConfig = dataclass_field(default_factory=ADNeuRadarPipelineConfig)
    optimizers: Optional[Dict[str, OptimizerGroupConfig]] = None

    max_num_iterations: int = 20001
    steps_per_eval_batch: int = 500
    steps_per_eval_image: int = 2000
    steps_per_eval_all_images: int = 20000
    steps_per_eval_all_radars: int = 20000
    steps_per_save: int = 10000
    steps_per_log: int = 100
    mixed_precision: bool = True
    gradient_accumulation_steps: int = 1
    """Accumulate gradients over k batches before applying updates
    (cf. the reference's per-group grad accumulation, trainer.py:549-598,
    engine/optimizers.py zero_grad_some/optimizer_scaler_step_some)."""
    seed: int = 42
    save_only_latest_checkpoint: bool = True
    load_dir: Optional[str] = None
    early_stopping: bool = False
    tracker: MetricTrackerConfig = dataclass_field(default_factory=MetricTrackerConfig)
    dataparser: Any = None  # set by method configs / CLI
    vis: str = "none"  # none | viewer (http orbit viewer, cf. reference viser)
    viewer_port: int = 7007
    profiler: str = "none"
    """none | basic | jax (cf. reference LoggingConfig.profiler
    {none,basic,pytorch}, configs/base_config.py:118): 'basic' keeps
    running-average wall times per annotated function, printed at exit;
    'jax' additionally captures a device trace around steps 12-17
    (the reference profiles steps {12, 17} with torch.profiler)."""


class Trainer:
    def __init__(self, config: TrainerConfig, dataparser_outputs=None):
        self.config = config
        if dataparser_outputs is None:
            assert config.dataparser is not None, "TrainerConfig.dataparser or explicit outputs required"
            dataparser_outputs = config.dataparser.setup().get_dataparser_outputs()
        self.pipeline = ADNeuRadarPipeline(config.pipeline, dataparser_outputs)
        self.writer = EventWriter(log_dir=self._run_dir / "logs")
        self.tracker = MetricTracker(config.tracker)
        self._step = 0

    @property
    def _run_dir(self) -> Path:
        return Path(self.config.output_dir) / self.config.experiment_name / self.config.method_name

    # -- setup --------------------------------------------------------------

    def setup(self):
        cfg = self.config
        if cfg.profiler != "none":
            from neuradar_tpu.utils import profiler

            profiler.enable(cfg.profiler)
        self.variables = self.pipeline.init_variables(cfg.seed)
        self.params = self.variables["params"]
        self.batch_stats = self.variables.get("batch_stats", {})
        groups = cfg.optimizers or default_optimizer_groups(cfg.max_num_iterations)
        self.tx = build_optimizer(self.params, groups)
        if cfg.gradient_accumulation_steps > 1:
            self.tx = optax.MultiSteps(self.tx, every_k_schedule=cfg.gradient_accumulation_steps)
        self.opt_state = self.tx.init(self.params)
        if cfg.load_dir:
            self.load_checkpoint(cfg.load_dir)
        self._train_step = self._build_train_step()
        self.pipeline.datamanager.start_prefetch()
        if cfg.vis == "viewer":
            from neuradar_tpu.viewer.viewer import ViewerServer

            self._viewer = ViewerServer(
                render_fn=lambda c2w: self.pipeline.render_pose(self.eval_variables(), c2w),
                stats_fn=lambda: {"step": self._step},
                port=cfg.viewer_port,
            )
            self._viewer.start()

    def _build_train_step(self):
        loss_fn = self.pipeline.make_train_loss_fn()
        tx = self.tx

        # donated buffers: the param/Adam-state update happens in-place in
        # HBM rather than allocating fresh output copies each step
        @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
        def train_step(params, opt_state, batch_stats, batch, rng):
            (total, (loss_dict, metrics, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch_stats, batch, rng
            )
            updates, new_opt_state = tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            return new_params, new_opt_state, new_bs, total, loss_dict, metrics

        return train_step

    # -- loop ----------------------------------------------------------------

    def train(self, num_iterations: Optional[int] = None) -> Dict[str, float]:
        cfg = self.config
        n_iters = num_iterations or cfg.max_num_iterations
        layout = self.pipeline.layout
        rays_per_batch = layout.total
        rng = jax.random.PRNGKey(cfg.seed)
        last_metrics: Dict[str, float] = {}

        from neuradar_tpu.utils import profiler

        t_train_start = time.perf_counter()
        for local_i in range(n_iters):
            step = self._step
            # device trace window, cf. the reference's torch.profiler capture
            # around steps {12, 17} (utils/profiler.py:134-179)
            if cfg.profiler == "jax":
                if local_i == 12:
                    jax.profiler.start_trace(str(self._run_dir / "profiles"))
                    self._tracing = True
                elif local_i == 17 and getattr(self, "_tracing", False):
                    jax.profiler.stop_trace()
                    self._tracing = False
            t0 = time.perf_counter()
            with profiler.time_function(name="train_iteration"):
                batch = self.pipeline.datamanager.next_train()
                batch = jax.tree.map(jnp.asarray, batch)
                step_rng = jax.random.fold_in(rng, step)
                self.params, self.opt_state, self.batch_stats, total, loss_dict, metrics = self._train_step(
                    self.params, self.opt_state, self.batch_stats, batch, step_rng
                )

            if step % cfg.steps_per_log == 0 or local_i == n_iters - 1:
                total = float(total)  # sync
                dt = time.perf_counter() - t0
                n_dev = jax.device_count()
                scalars = {k: float(v) for k, v in {**loss_dict, **metrics}.items()}
                scalars["loss"] = total
                # world_size x rays/batch / iter time (cf. trainer.py:333-340)
                scalars["train_rays_per_sec"] = n_dev * rays_per_batch / dt
                scalars["iter_train_time"] = dt
                self.writer.put_scalars(step, scalars)
                last_metrics = scalars

            if cfg.steps_per_eval_batch and step > 0 and step % cfg.steps_per_eval_batch == 0:
                if not hasattr(self, "_eval_loss_fn"):
                    self._eval_loss_fn = self.pipeline.make_eval_loss_fn()
                eb = jax.tree.map(jnp.asarray, self.pipeline.datamanager.sample_eval_batch())
                _etotal, _eld, emetrics = self._eval_loss_fn(self.eval_variables(), eb)
                self.writer.put_scalars(step, {f"eval_{k}": float(v) for k, v in emetrics.items()})
            if cfg.steps_per_eval_image and step > 0 and step % cfg.steps_per_eval_image == 0:
                self._eval_single_image_and_radar(step)
            if cfg.steps_per_save and step > 0 and step % cfg.steps_per_save == 0:
                self.save_checkpoint()
            if cfg.steps_per_eval_all_radars and step > 0 and step % cfg.steps_per_eval_all_radars == 0:
                radar_metrics = self.pipeline.get_average_eval_radar_metrics(self.eval_variables())
                self.writer.put_scalars(step, radar_metrics)
                last_metrics.update(radar_metrics)
            if step > 0 and step in tuple(cfg.pipeline.calc_fid_steps):
                fid = self.pipeline.compute_fid_metrics(self.eval_variables())
                self.writer.put_scalars(step, fid)
                last_metrics.update(fid)
            if cfg.steps_per_eval_all_images and step > 0 and step % cfg.steps_per_eval_all_images == 0:
                img_metrics = self.pipeline.get_average_eval_image_metrics(self.eval_variables())
                img_metrics.update(self.pipeline.get_average_eval_lidar_metrics(self.eval_variables()))
                self.writer.put_scalars(step, img_metrics)
                last_metrics.update(img_metrics)
                if cfg.early_stopping and self.tracker.update(-img_metrics["psnr"]) and self.tracker.should_stop:
                    break
            self._step += 1

        if getattr(self, "_tracing", False):  # loop shorter than the trace window
            jax.profiler.stop_trace()
            self._tracing = False
        last_metrics["total_train_time"] = time.perf_counter() - t_train_start
        self.save_checkpoint()
        self.pipeline.datamanager.stop()
        return last_metrics

    def eval_variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}

    def _eval_single_image_and_radar(self, step: int) -> None:
        """Render one eval image + one radar scan, log metrics and dump a
        radar figure (cf. eval_iteration_neuradar, trainer.py:645-700)."""
        variables = self.eval_variables()
        pipeline = self.pipeline
        cam_ids = pipeline.datamanager.eval_camera_indices()
        scalars = {}
        if len(cam_ids):
            cam_idx = int(cam_ids[self._step // max(self.config.steps_per_eval_image, 1) % len(cam_ids)])
            rend = pipeline.render_camera(variables, cam_idx)
            gt = pipeline.outputs.images[cam_idx].astype(np.float32) / 255.0
            h, w = rend["rgb"].shape[:2]
            mse = float(np.mean((rend["rgb"] - gt[:h, :w]) ** 2))
            scalars["eval_image_psnr"] = -10.0 * np.log10(max(mse, 1e-10))
            self.writer.put_image(step, "eval_rgb", rend["rgb"])
        radar_ids = pipeline.datamanager.eval_radar_indices()
        if len(radar_ids):
            import jax as _jax

            from neuradar_tpu.model_components import radar_utils as _ru

            scan_idx = int(radar_ids[0])
            ro = pipeline.render_radar(variables, scan_idx)["radar_output"]
            gt_pts = pipeline.outputs.radar_points[scan_idx][:, :3]
            pts, keep = _ru.sample_radar_points(
                jnp.asarray(ro), "euclidean",
                threshold=pipeline.config.model.existence_probability_threshold,
            )
            pred = np.asarray(pts)[np.asarray(keep)]
            if len(pred) and len(gt_pts):
                scalars["eval_radar_chamfer"] = _ru.chamfer_distance_np(pred, gt_pts)
            self._save_radar_figure(step, pred, gt_pts)
        if scalars:
            self.writer.put_scalars(step, scalars)

    def _save_radar_figure(self, step: int, pred: np.ndarray, gt: np.ndarray) -> None:
        """Radar point figure (matplotlib; the reference logs plotly figures
        via writer.put_figure)."""
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            fig, ax = plt.subplots(figsize=(6, 5))
            if len(gt):
                ax.scatter(gt[:, 0], gt[:, 1], c="green", s=10, label="gt")
            if len(pred):
                ax.scatter(pred[:, 0], pred[:, 1], c="blue", s=10, label="pred")
            ax.legend()
            ax.set_title(f"radar step {step}")
            fig_dir = self._run_dir / "figures"
            fig_dir.mkdir(parents=True, exist_ok=True)
            fig.savefig(fig_dir / f"radar_{step:06d}.png", dpi=80)
            plt.close(fig)
        except Exception as e:  # noqa: BLE001
            print(f"[trainer] radar figure failed: {e}")

    # -- checkpointing ------------------------------------------------------------

    def save_checkpoint(self) -> Path:
        import orbax.checkpoint as ocp

        ckpt_dir = (self._run_dir / "checkpoints").absolute()
        ckpt_dir.mkdir(parents=True, exist_ok=True)
        path = ckpt_dir / f"step-{self._step:09d}"
        ckptr = ocp.StandardCheckpointer()
        state = {
            "params": self.params,
            "opt_state": self.opt_state,
            "batch_stats": self.batch_stats,
            "step": jnp.asarray(self._step),
        }
        ckptr.save(path, state, force=True)
        ckptr.wait_until_finished()
        if self.config.save_only_latest_checkpoint:
            for old in sorted(ckpt_dir.glob("step-*"))[:-1]:
                import shutil

                shutil.rmtree(old, ignore_errors=True)
        return path

    def load_checkpoint(self, load_dir: str, step: Optional[int] = None) -> None:
        import orbax.checkpoint as ocp

        ckpt_dir = Path(load_dir).absolute()
        candidates = sorted(ckpt_dir.glob("step-*"))
        assert candidates, f"no checkpoints under {ckpt_dir}"
        path = candidates[-1] if step is None else ckpt_dir / f"step-{step:09d}"
        ckptr = ocp.StandardCheckpointer()
        template = {
            "params": self.params,
            "opt_state": self.opt_state,
            "batch_stats": self.batch_stats,
            "step": jnp.asarray(0),
        }
        restored = ckptr.restore(path, template)
        self.params = restored["params"]
        self.opt_state = restored["opt_state"]
        self.batch_stats = restored["batch_stats"]
        self._step = int(restored["step"])
