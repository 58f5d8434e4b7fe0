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

    metric: str = "psnr"
    # maximize metrics are negated before tracking (the tracker's convention
    # is lower-is-better); explicit — no name-substring guessing
    maximize: bool = True
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
        # additive margin scaled by |best| so the tolerance works for
        # negative metrics too (the trainer tracks -psnr)
        if value > self.best + self.config.margin * max(abs(self.best), 1e-8):
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
    steps_per_dispatch: int = 1
    """Training steps executed per device dispatch (lax.scan over stacked
    batches). >1 amortizes host->device round-trip latency — on a
    relay-attached TPU one synchronized dispatch costs ~37 ms regardless of
    program size, so K real optimizer steps per dispatch recover throughput;
    on directly-attached chips it removes per-step Python/dispatch overhead.
    Eval/log/save cadences fire when a dispatch window crosses the boundary."""
    gradient_accumulation_steps: int = 1
    """Accumulate gradients over k batches before applying updates
    (cf. the reference's per-group grad accumulation, trainer.py:549-598,
    engine/optimizers.py zero_grad_some/optimizer_scaler_step_some)."""
    data_parallel: str = "auto"
    """'auto': when more than one device is visible and every batch segment
    (rgb patches / lidar rays / radar scans) divides the device count, shard
    each batch's leading axis over a device mesh — XLA inserts the gradient
    psum (replaces the reference's DDP launcher; parallel/sharding.py).
    'off': always single-device."""
    tensor_parallel: int = 1
    """Additionally shard the flat hash tables (the dominant parameter mass)
    over this many devices: mesh becomes (data x model); must divide the
    device count (parallel/sharding.param_shardings)."""
    seed: int = 42
    save_only_latest_checkpoint: bool = True
    save_final_checkpoint: bool = True
    """Save a checkpoint when the loop ends. Validation harnesses turn this
    off: fetching the full param tree through a degraded device link can take
    longer than the training itself (see docs/PERFORMANCE.md relay notes)."""
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
        # multi-host: only rank 0 logs/writes events (cf. reference
        # @check_main_thread gating, utils/writer.py + utils/comms.py) —
        # evals still COMPUTE on every rank (localize_tree is collective).
        is_main = jax.process_count() == 1 or jax.process_index() == 0
        self.writer = EventWriter(log_dir=self._run_dir / "logs" if is_main else None, verbose=is_main)
        self.tracker = MetricTracker(config.tracker)
        self._step = 0
        import threading

        # serializes viewer renders against train dispatches (cf. the
        # reference's train_lock, trainer.py:182,312). Required here because
        # the donated train step deletes the params/opt-state buffers a
        # concurrent viewer render may still be reading.
        self.train_lock = threading.Lock()
        # live training controls driven from the viewer (cf. the reference
        # viewer's pause/stop training buttons, viewer/viewer.py:58 +
        # control_panel) — polled at the top of each dispatch window.
        self._paused = False
        self._stop_requested = False
        self._pause_parked = False  # True only while the loop is actually
        # waiting inside its pause gate (observable for the viewer UI and a
        # deterministic signal for tests — a bare `paused` flag can be set
        # before the loop has reached the gate)

    def control(self, action: str) -> Dict[str, Any]:
        """Viewer /control endpoint: pause/resume/stop/status."""
        if action == "pause":
            self._paused = True
        elif action == "resume":
            self._paused = False
        elif action == "stop":
            self._stop_requested = True
            self._paused = False
        return {"paused": self._paused, "stop_requested": self._stop_requested, "step": self._step,
                "parked": self._pause_parked}

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

            from neuradar_tpu.viewer.callbacks import (
                make_scene_graph_fn,
                make_viewer_render_fn,
                scene_duration,
            )

            viewer_render = make_viewer_render_fn(
                self.pipeline, self.eval_variables, lock=self.train_lock,
                # refresh the radar-overlay cache as the model trains
                version_fn=lambda: self._step // 100,
            )
            duration = round(scene_duration(self.pipeline), 2)
            self._viewer = ViewerServer(
                render_fn=viewer_render,
                stats_fn=lambda: {"step": self._step, "scene_duration": duration,
                                  "paused": self._paused},
                port=cfg.viewer_port,
                control_fn=self.control,
                scene_fn=make_scene_graph_fn(self.pipeline),
            )
            self._viewer.start()

    def change_patch_sampler(self, patch_size: int, num_rgb_patches: Optional[int] = None) -> None:
        """Runtime patch reconfiguration (cf. reference
        ad_datamanager.change_patch_sampler): re-tunes the datamanager and
        rebuilds everything shaped by the batch layout — the jitted train
        step recompiles on next dispatch."""
        with self.train_lock:
            self.pipeline.datamanager.change_patch_sampler(patch_size, num_rgb_patches)
            self.pipeline.layout = self.pipeline.datamanager.layout
            self._train_step = self._build_train_step()
            if hasattr(self, "_eval_loss_fn"):
                del self._eval_loss_fn

    def _multichip_shardings(self):
        """(in_shardings, scan_in_shardings, out_shardings) for multi-device
        training, or None when single-device / disabled / non-divisible."""
        n = jax.device_count()
        c = self.config
        if n <= 1 or c.data_parallel == "off":
            return None
        dmc = c.pipeline.datamanager
        for name, size in (("num_rgb_patches", dmc.num_rgb_patches),
                           ("num_lidar_rays", dmc.num_lidar_rays),
                           ("num_radar_scans", dmc.num_radar_scans)):
            if size and size % n:
                print(f"[trainer] data_parallel off: {name}={size} not divisible by {n} devices")
                return None
        from jax.sharding import NamedSharding, PartitionSpec as P

        from neuradar_tpu.parallel.sharding import make_mesh, make_mesh_2d, param_shardings, replicated

        tp = max(1, c.tensor_parallel)
        if tp > 1:
            assert n % tp == 0, f"tensor_parallel={tp} must divide device count {n}"
            mesh = make_mesh_2d(n // tp, tp)
            p_shard = param_shardings(self.params, mesh)
            o_shard = param_shardings(self.opt_state, mesh)
        else:
            mesh = make_mesh(n)
            p_shard = o_shard = replicated(mesh)
        rep = replicated(mesh)
        batch_s = NamedSharding(mesh, P("data"))
        scan_batch_s = NamedSharding(mesh, P(None, "data"))  # [K, B, ...]
        print(f"[trainer] multi-device training: dp={mesh.shape['data']}"
              + (f" x tp={tp}" if tp > 1 else "") + f" over {n} devices")
        return (
            dict(in_shardings=(p_shard, o_shard, rep, batch_s, rep),
                 out_shardings=(p_shard, o_shard, rep, rep, rep, rep)),
            dict(in_shardings=(p_shard, o_shard, rep, scan_batch_s, rep),
                 out_shardings=(p_shard, o_shard, rep, rep, rep, rep)),
        )

    def _build_train_step(self):
        loss_fn = self.pipeline.make_train_loss_fn()
        tx = self.tx
        shardings = self._multichip_shardings()
        step_kw = shardings[0] if shardings else {}
        scan_kw = shardings[1] if shardings else {}
        # multi-host (jax.distributed): host-local arrays can't enter a jit
        # whose shardings span other processes' devices — batches and state
        # must be assembled as global jax.Arrays first (sharding.global_put).
        # Single-process keeps the plain-numpy fast path.
        self._batch_shardings = None
        if shardings and jax.process_count() > 1:
            self._batch_shardings = (step_kw["in_shardings"][3], scan_kw["in_shardings"][3])
            self._rep_sharding = step_kw["in_shardings"][2]
            self._globalize_state(step_kw["in_shardings"])

        # donated buffers: the param/Adam-state update happens in-place in
        # HBM rather than allocating fresh output copies each step
        @functools.partial(jax.jit, donate_argnums=(0, 1, 2), **step_kw)
        def train_step(params, opt_state, batch_stats, batch, rng):
            (total, (loss_dict, metrics, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch_stats, batch, rng
            )
            updates, new_opt_state = tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            return new_params, new_opt_state, new_bs, total, loss_dict, metrics

        if self.config.steps_per_dispatch <= 1:
            return train_step

        # K steps per dispatch: scan the step over K stacked batches; only
        # the final step's scalars are returned (sufficient for logging)
        @functools.partial(jax.jit, donate_argnums=(0, 1, 2), static_argnames=("k",), **scan_kw)
        def train_steps(params, opt_state, batch_stats, batches, rng, k):
            def body(carry, xs):
                params, opt_state, batch_stats = carry
                batch, step_rng = xs
                (total, (loss_dict, metrics, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                    params, batch_stats, batch, step_rng
                )
                updates, new_opt_state = tx.update(grads, opt_state, params)
                return (optax.apply_updates(params, updates), new_opt_state, new_bs), (total, loss_dict, metrics)

            rngs = jax.random.split(rng, k)
            (params, opt_state, batch_stats), (totals, loss_dicts, metrics) = jax.lax.scan(
                body, (params, opt_state, batch_stats), (batches, rngs)
            )
            last = jax.tree.map(lambda x: x[-1], (totals, loss_dicts, metrics))
            return params, opt_state, batch_stats, last[0], last[1], last[2]

        return train_steps

    def _globalize_state(self, in_shardings) -> None:
        """Re-place params/opt-state/batch-stats as GLOBAL arrays matching
        the train step's in_shardings (multi-host only). Every host computed
        identical init values (same seed), mirroring the reference where
        each DDP rank constructs the same module state."""
        from neuradar_tpu.parallel.sharding import global_put

        p_s, o_s, rep = in_shardings[0], in_shardings[1], in_shardings[2]

        def gput(tree, sh):
            sh_tree = jax.tree.map(lambda _: sh, tree) if isinstance(sh, jax.sharding.Sharding) else sh
            return jax.tree.map(global_put, tree, sh_tree)

        self.params = gput(self.params, p_s)
        self.opt_state = gput(self.opt_state, o_s)
        self.batch_stats = gput(self.batch_stats, rep)

    def _device_batch(self, batch, scan: bool):
        """Host batch -> device arrays: plain asarray single-process, global
        sharded assembly under multi-controller (same-seed hosts hold the
        same global batch; each materializes only its shards)."""
        if self._batch_shardings is None:
            return jax.tree.map(jnp.asarray, batch)
        from neuradar_tpu.parallel.sharding import global_put

        sh = self._batch_shardings[1] if scan else self._batch_shardings[0]
        return jax.tree.map(lambda x: global_put(x, sh), batch)

    # -- loop ----------------------------------------------------------------

    def train(self, num_iterations: Optional[int] = None) -> Dict[str, float]:
        cfg = self.config
        # default: train TO max_num_iterations (resume-aware), not for
        # max_num_iterations additional steps after a checkpoint load
        n_iters = num_iterations if num_iterations is not None else max(cfg.max_num_iterations - self._step, 0)
        layout = self.pipeline.layout
        rays_per_batch = layout.total
        rng = jax.random.PRNGKey(cfg.seed)
        last_metrics: Dict[str, float] = {}

        from neuradar_tpu.utils import profiler

        K = max(1, cfg.steps_per_dispatch)
        t_train_start = time.perf_counter()
        t_last_log = t_train_start
        steps_since_log = 0
        local_i = 0
        while local_i < n_iters:
            if self._paused or self._stop_requested:
                if self._stop_requested:
                    break
                t_pause = time.perf_counter()
                self._pause_parked = True
                try:
                    while self._paused and not self._stop_requested:
                        time.sleep(0.05)  # train_lock stays free: viewer renders keep serving
                finally:
                    self._pause_parked = False
                t_last_log += time.perf_counter() - t_pause  # paused time out of rays/s window
                if self._stop_requested:
                    break
            step = self._step
            # if n_iters isn't a K-multiple, run the short window FIRST so
            # both executables compile up front (not at iteration ~n_iters)
            k = (n_iters % K or K) if local_i == 0 else min(K, n_iters - local_i)
            # device trace window, cf. the reference's torch.profiler capture
            # around steps {12, 17} (utils/profiler.py:134-179)
            if cfg.profiler == "jax":
                if local_i <= 12 < local_i + k and not getattr(self, "_tracing", False):
                    jax.profiler.start_trace(str(self._run_dir / "profiles"))
                    self._tracing = True
                elif local_i >= 17 and getattr(self, "_tracing", False):
                    jax.profiler.stop_trace()
                    self._tracing = False
            with profiler.time_function(name="train_iteration"), self.train_lock:
                step_rng = jax.random.fold_in(rng, step)
                if self._batch_shardings is not None:
                    from neuradar_tpu.parallel.sharding import global_put

                    step_rng = global_put(step_rng, self._rep_sharding)
                if K > 1:
                    hosts = [self.pipeline.datamanager.next_train() for _ in range(k)]
                    batch = self._device_batch(jax.tree.map(lambda *xs: np.stack(xs), *hosts), scan=True)
                    self.params, self.opt_state, self.batch_stats, total, loss_dict, metrics = self._train_step(
                        self.params, self.opt_state, self.batch_stats, batch, step_rng, k=k
                    )
                else:
                    batch = self._device_batch(self.pipeline.datamanager.next_train(), scan=False)
                    self.params, self.opt_state, self.batch_stats, total, loss_dict, metrics = self._train_step(
                        self.params, self.opt_state, self.batch_stats, batch, step_rng
                    )
            steps_since_log += k
            local_i += k
            self._step = step + k
            step = self._step - 1  # last completed step in this window

            first_window = step + 1 == k
            if (step + 1) // cfg.steps_per_log != (step + 1 - k) // cfg.steps_per_log or first_window or local_i >= n_iters:
                # ONE batched fetch (the only true sync on the relay
                # backend — per-value float() would pay ~37 ms each)
                total, loss_host, metrics_host = jax.device_get((total, loss_dict, metrics))
                total = float(total)
                now = time.perf_counter()
                window_dt = max(now - t_last_log, 1e-9)
                t_last_log = now
                scalars = {k2: float(v) for k2, v in {**loss_host, **metrics_host}.items()}
                scalars["loss"] = total
                # rays/batch x steps / window time, averaged over the whole
                # window since the last sync so queued async dispatches are
                # attributed to the steps that ran. Unlike the reference's
                # world_size multiplier (trainer.py:333-340, one batch PER
                # DDP rank), the datamanager samples ONE global batch that
                # the mesh shards — so rays/step is rays_per_batch however
                # many devices share the work.
                scalars["train_rays_per_sec"] = rays_per_batch * steps_since_log / window_dt
                scalars["iter_train_time"] = window_dt / steps_since_log
                steps_since_log = 0
                self.writer.put_scalars(step, scalars)
                last_metrics = scalars

            def crossed(cadence: int) -> bool:
                """Did any step in this dispatch window hit a cadence multiple
                (>0)? Reduces to `step % c == 0 and step > 0` when k == 1."""
                return bool(cadence) and step >= cadence and (step // cadence) > ((step - k) // cadence)

            t_aux0 = time.perf_counter()  # eval/save time is excluded from
            # the next rays/s window (the reference times only train iters)

            if crossed(cfg.steps_per_eval_batch):
                if not hasattr(self, "_eval_loss_fn"):
                    self._eval_loss_fn = self.pipeline.make_eval_loss_fn()
                eb = jax.tree.map(jnp.asarray, self.pipeline.datamanager.sample_eval_batch())
                _etotal, _eld, emetrics = self._eval_loss_fn(self.eval_variables(), eb)
                # one batched fetch (each value fetch is a ~37 ms relay sync)
                emetrics = jax.device_get(emetrics)
                self.writer.put_scalars(step, {f"eval_{k2}": float(v) for k2, v in emetrics.items()})
            if crossed(cfg.steps_per_eval_image):
                self._eval_single_image_and_radar(step)
            if crossed(cfg.steps_per_save):
                self.save_checkpoint()
            if crossed(cfg.steps_per_eval_all_radars):
                radar_metrics = self.pipeline.get_average_eval_radar_metrics(self.eval_variables())
                self.writer.put_scalars(step, radar_metrics)
                last_metrics.update(radar_metrics)
            if any(step - k < t <= step for t in tuple(cfg.pipeline.calc_fid_steps) if t > 0):
                fid = self.pipeline.compute_fid_metrics(self.eval_variables())
                self.writer.put_scalars(step, fid)
                last_metrics.update(fid)
            if crossed(cfg.steps_per_eval_all_images):
                img_metrics = self.pipeline.get_average_eval_image_metrics(self.eval_variables())
                img_metrics.update(self.pipeline.get_average_eval_lidar_metrics(self.eval_variables()))
                self.writer.put_scalars(step, img_metrics)
                last_metrics.update(img_metrics)
                # track the configured metric (negated when maximize, so the
                # tracker's lower-is-better convention applies); a metric not
                # in this eval round is skipped rather than silently swapped
                mname = cfg.tracker.metric
                tracked = {**last_metrics, **img_metrics}.get(mname)
                if tracked is not None:
                    if cfg.tracker.maximize:
                        tracked = -float(tracked)
                    if cfg.early_stopping and self.tracker.update(float(tracked)) and self.tracker.should_stop:
                        break
            t_last_log += time.perf_counter() - t_aux0  # exclude aux time

        if getattr(self, "_tracing", False):  # loop shorter than the trace window
            jax.profiler.stop_trace()
            self._tracing = False
        last_metrics["total_train_time"] = time.perf_counter() - t_train_start
        if self.config.save_final_checkpoint:
            self.save_checkpoint()
        self.pipeline.datamanager.stop()
        return last_metrics

    def eval_variables(self):
        """Variables for eval/render paths. Multi-host: those paths build
        host-local inputs (numpy batches, full-image bundles) which cannot
        enter a computation with arrays sharded across other processes'
        devices (see _build_train_steps), so fetch a host-local copy —
        collective for tp-sharded tables, hence called on every rank."""
        v = {"params": self.params, "batch_stats": self.batch_stats}
        if getattr(self, "_batch_shardings", None) is not None:
            from neuradar_tpu.parallel.sharding import localize_tree

            v = localize_tree(v)
        return v

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
        # GC from rank 0 only — on a shared filesystem every rank globs the
        # same dir and concurrent rmtrees race (orbax already coordinates
        # the save itself across processes)
        if self.config.save_only_latest_checkpoint and jax.process_index() == 0:
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
