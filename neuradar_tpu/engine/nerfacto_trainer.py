"""Nerfacto / LidarNerfacto trainer: single-modality per-ray optimization.

cf. reference nerfstudio nerfacto training (models/nerfacto.py with the
VanillaPipeline/VanillaDataManager) and models/lidar_nerfacto.py:35-137
(lidar-only variant). TPU shape: the host samples only integer indices
(frames + pixel coords / packed point ids); ray generation, sampling, field
eval and losses all run inside one jitted step with static shapes, exactly
like the flagship NeuRadar trainer.
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

from neuradar_tpu.data.datamanager import ADDataManager, ADDataManagerConfig, build_train_bundle
from neuradar_tpu.data.dataparsers.base import DataparserOutputs
from neuradar_tpu.models.nerfacto import NerfactoModel, NerfactoModelConfig
from neuradar_tpu.utils.writer import EventWriter


@dataclass
class NerfactoTrainerConfig:
    """cf. the 'nerfacto' method preset (nerfstudio method_configs.py)."""

    method_name: str = "nerfacto"
    experiment_name: str = "synthetic"
    output_dir: str = "outputs"
    model: NerfactoModelConfig = dataclass_field(default_factory=NerfactoModelConfig)
    max_num_iterations: int = 30000
    steps_per_log: int = 100
    steps_per_eval_batch: int = 500
    steps_per_save: int = 2000
    """0 disables the end-of-train checkpoint write."""
    seed: int = 42
    lr_init: float = 1e-2
    lr_final: float = 1e-4
    warmup_steps: int = 512
    # batch: camera mode shoots patches (one ray per GT pixel, u=1);
    # lidar mode shoots packed lidar returns
    num_rgb_patches: int = 16
    patch_size: int = 16
    num_lidar_rays: int = 8192
    dataparser: object = None


class NerfactoTrainer:
    """One trainer for both variants: ``predict_lidar`` in the model config
    selects lidar-only training (cf. lidar_nerfacto.py), otherwise
    camera-only (cf. nerfacto.py)."""

    def __init__(self, config: NerfactoTrainerConfig, dataparser_outputs: Optional[DataparserOutputs] = None):
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
        c = self.config
        lidar_mode = c.model.predict_lidar
        dm_cfg = ADDataManagerConfig(
            num_rgb_patches=0 if lidar_mode else c.num_rgb_patches,
            patch_size=c.patch_size,
            num_lidar_rays=c.num_lidar_rays if lidar_mode else 0,
            num_radar_scans=0,
        )
        # one ray per GT pixel: nerfacto has no CNN upsampler
        self.dm = ADDataManager(self.outputs, dm_cfg, rgb_upsample_factor=1)
        self.layout = self.dm.layout
        tables = self.dm.tables

        num_embeds = tables.num_cam_frames + (tables.num_lidar_frames if lidar_mode else 0)
        self.model = NerfactoModel(
            config=c.model,
            static_scale=float(np.abs(self.outputs.scene_box.aabb).max()),
            num_embeds=max(num_embeds, 1),
        )

        # init on a tiny single-ray layout (fast trace), reuse for the real shapes
        host = self.dm.sample_train_batch()
        init_bundle = build_train_bundle(tables, jax.tree.map(jnp.asarray, host), self.layout, 1)
        k = jax.random.PRNGKey(c.seed)
        self.variables = self.model.init(
            {"params": k, "sampling": jax.random.fold_in(k, 1)},
            jax.tree.map(lambda x: x[:2], init_bundle),
            train=True,
        )

        # single adam, warmup + exponential decay to lr_final
        # (cf. nerfacto optimizers: fields/proposals at 1e-2 -> 1e-4);
        # reuses the package scheduler so warmup semantics stay in one place
        from neuradar_tpu.engine.schedulers import ExponentialDecaySchedulerConfig

        sched = ExponentialDecaySchedulerConfig(
            lr_final=c.lr_final, warmup_steps=c.warmup_steps,
            max_steps=c.max_num_iterations, ramp="linear",
        ).build(c.lr_init)
        self.tx = optax.adam(sched, eps=1e-15)
        self.opt_state = self.tx.init(self.variables["params"])

        layout, u = self.layout, 1
        model, tx = self.model, self.tx

        def loss_fn(params, batch, rng, train=True, step=None):
            bundle = build_train_bundle(tables, batch, layout, u)
            gt: Dict[str, jax.Array] = {}
            if not lidar_mode:
                img = batch["image"]
                if img.dtype == jnp.uint8:  # shipped compact; normalize on device
                    img = img.astype(jnp.float32) / 255.0
                gt["rgb"] = img.reshape(-1, 3)
            else:
                gt["lidar_distance"] = batch["lidar_distance"]
                gt["lidar_intensity"] = batch["lidar_intensity"]
                gt["did_return"] = batch["did_return"]
            # proposal-weight annealing ramps in-graph from the (traced)
            # step counter; eval (step=None) uses the converged exponent
            # (cf. reference models/nerfacto.py:266-272)
            anneal = model.anneal_for_step(step) if (train and step is not None) else None
            # lidar depth-sigma schedule (reference lidar_nerfacto.py:130-137)
            depth_sigma = (
                model.depth_sigma_for_step(step)
                if (train and step is not None and model.config.predict_lidar)
                else None
            )
            total, aux = model.apply(
                {"params": params}, bundle, gt, train=train,
                method=model.loss_and_metrics, anneal=anneal, depth_sigma=depth_sigma,
                rngs={"sampling": rng} if train else {},
            )
            return total, aux

        def train_step(params, opt_state, batch, rng, step):
            (total, (loss_dict, metrics, _)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch, rng, step=step
            )
            updates, opt_state = tx.update(grads, opt_state)
            params = optax.apply_updates(params, updates)
            return params, opt_state, total, loss_dict, metrics

        # donate params/opt-state: the Adam update happens in place in HBM
        # instead of double-buffering the field each step (cf. the flagship
        # trainer's donation, trainer.py)
        self._train_step = jax.jit(train_step, donate_argnums=(0, 1))
        self._eval_loss = jax.jit(lambda p, b, r: loss_fn(p, b, r, train=False)[0])

    def train(self, max_iters: Optional[int] = None) -> Dict[str, float]:
        c = self.config
        iters = max(c.max_num_iterations - self._step, 0) if max_iters is None else max_iters
        params = self.variables["params"]
        key = jax.random.PRNGKey(c.seed + 7)
        self.dm.start_prefetch()
        last: Dict[str, float] = {}
        t0 = time.time()
        end = self._step + iters  # self._step moves inside the loop
        try:
            for step in range(self._step, end):
                batch = jax.tree.map(jnp.asarray, self.dm.next_train())
                key, sub = jax.random.split(key)
                params, self.opt_state, total, loss_dict, metrics = self._train_step(
                    params, self.opt_state, batch, sub,
                    np.int32(step),  # array arg: dynamic in-graph anneal, no recompile
                )
                if step % c.steps_per_log == 0 or step == end - 1:
                    # ONE batched fetch (each value fetch is a ~37 ms relay sync)
                    total, metrics_host = jax.device_get((total, metrics))
                    last = {"loss": float(total), **{k: float(v) for k, v in metrics_host.items()}}
                    self.writer.put_scalars(step, last)
                if c.steps_per_eval_batch and step and step % c.steps_per_eval_batch == 0:
                    ev = jax.tree.map(jnp.asarray, self.dm.sample_eval_batch())
                    key, sub = jax.random.split(key)
                    self.writer.put_scalar(step, "eval_loss", float(self._eval_loss(params, ev, sub)))
                self._step = step + 1
        finally:
            self.dm.stop()
        self.variables = {"params": params}
        last["iters_per_sec"] = iters / max(time.time() - t0, 1e-9)
        if self.config.steps_per_save:
            self.save_checkpoint()
        return last

    # -- full-image eval (the number benchmarking.py reports; cf. reference
    # launch_eval_blender.sh -> scripts/eval.py full-image metrics) ---------

    def render_camera(self, cam_idx: int) -> np.ndarray:
        """Render camera ``cam_idx`` full-image (one ray per pixel — nerfacto
        has no CNN upsampler): rgb float32 [H, W, 3]. Chunked at
        model.eval_num_rays_per_chunk; all chunks are dispatched before the
        single fetch (np.asarray is the only relay sync point)."""
        from neuradar_tpu.cameras.cameras import generate_camera_rays

        H, W = self.outputs.image_size
        rr, cc = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
        coords_np = np.stack([rr.reshape(-1), cc.reshape(-1)], axis=1)
        n_rays = len(coords_np)
        chunk = min(self.config.model.eval_num_rays_per_chunk, n_rays)
        n_pad = (-n_rays) % chunk
        if n_pad:
            coords_np = np.concatenate([coords_np, np.repeat(coords_np[-1:], n_pad, axis=0)])
        if not hasattr(self, "_render_chunk"):
            self._render_chunk = jax.jit(
                lambda p, b: self.model.apply({"params": p}, b, train=False)["rgb"]
            )
        cameras = self.dm.tables.cameras
        params = self.variables["params"]
        outs = []
        for i in range(0, len(coords_np), chunk):
            cam_ids = jnp.full((chunk,), cam_idx, jnp.int32)
            bundle = generate_camera_rays(cameras, cam_ids, jnp.asarray(coords_np[i : i + chunk]))
            outs.append(self._render_chunk(params, bundle))
        rgb = np.concatenate([np.asarray(o) for o in outs])[:n_rays]
        return rgb.reshape(H, W, 3)

    def eval_psnr(self) -> Dict[str, float]:
        """Mean PSNR over full-image renders of the held-out camera split
        (lidar-only variant has no images: returns {})."""
        if self.config.model.predict_lidar:
            return {}
        psnrs = []
        for ci in self.outputs.camera_split.eval:
            pred = np.clip(self.render_camera(int(ci)), 0.0, 1.0)
            gt = self.outputs.images[int(ci)].astype(np.float32) / 255.0
            mse = float(np.mean((pred - gt) ** 2))
            psnrs.append(-10.0 * np.log10(max(mse, 1e-10)))
        return {"eval_psnr": float(np.mean(psnrs)), "eval_num_images": float(len(psnrs))} if psnrs else {}

    # -- checkpointing (flat-npz; the main Trainer uses orbax — this trainer
    # keeps the single-file format its benchmarking/export flows expect) ----

    def save_checkpoint(self) -> Path:
        """Write params + step to <run_dir>/checkpoints/nerfacto.npz."""
        path = self._run_dir / "checkpoints" / "nerfacto.npz"
        path.parent.mkdir(parents=True, exist_ok=True)
        flat = {}
        for kp, leaf in jax.tree_util.tree_flatten_with_path(self.variables["params"])[0]:
            key = "/".join(getattr(p, "key", str(getattr(p, "idx", p))) for p in kp)
            flat[key] = np.asarray(leaf)
        np.savez(path, __step__=self._step, **flat)
        return path

    def load_checkpoint(self, path: Optional[Path] = None) -> None:
        """Restore params (by flattened path key) + step; call after setup()."""
        path = Path(path) if path is not None else self._run_dir / "checkpoints" / "nerfacto.npz"
        if path.is_dir():
            path = path / "nerfacto.npz"
        with np.load(path) as z:
            self._step = int(z["__step__"])
            leaves, treedef = jax.tree_util.tree_flatten_with_path(self.variables["params"])
            restored = []
            for kp, leaf in leaves:
                key = "/".join(getattr(p, "key", str(getattr(p, "idx", p))) for p in kp)
                arr = z[key]
                assert arr.shape == leaf.shape, f"{key}: {arr.shape} != {leaf.shape}"
                restored.append(jnp.asarray(arr))
        self.variables = {"params": jax.tree_util.tree_unflatten(treedef, restored)}
