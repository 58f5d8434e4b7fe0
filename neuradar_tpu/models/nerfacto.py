"""Nerfacto and LidarNerfacto models.

cf. reference nerfstudio/models/nerfacto.py:52-431 and
models/lidar_nerfacto.py:35-137: the hashgrid + 2-round-proposal RGB(+lidar)
baseline. Shares the sampler/renderer/loss machinery with NeuRadar; one ray
per pixel (no CNN upsampling).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dataclass_field
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from neuradar_tpu.cameras.camera_optimizers import CameraOptimizer, CameraOptimizerConfig
from neuradar_tpu.cameras.rays import RayBundle
from neuradar_tpu.fields.nerfacto_field import HashMLPDensityField, NerfactoField
from neuradar_tpu.model_components.losses import (
    binary_cross_entropy_with_logits,
    distortion_loss,
    interlevel_loss,
    masked_mean,
)
from neuradar_tpu.model_components.renderers import (
    render_accumulation,
    render_depth_expected,
    render_rgb_background,
)
from neuradar_tpu.model_components.ray_samplers import lin_disp_piecewise_sampler, proposal_network_sampler


@dataclass
class NerfactoModelConfig:
    """cf. NerfactoModelConfig (models/nerfacto.py:52-150)."""

    near_plane: float = 0.05
    far_plane: float = 1000.0
    hidden_dim: int = 64
    hidden_dim_color: int = 64
    num_levels: int = 16
    base_res: int = 16
    max_res: int = 2048
    log2_hashmap_size: int = 19
    features_per_level: int = 2
    num_proposal_samples_per_ray: Tuple[int, ...] = (256, 96)
    num_nerf_samples_per_ray: int = 48
    proposal_net_args_list: Tuple[Dict[str, Any], ...] = (
        {"hidden_dim": 16, "log2_hashmap_size": 17, "num_levels": 5, "max_res": 128, "use_linear": False},
        {"hidden_dim": 16, "log2_hashmap_size": 17, "num_levels": 5, "max_res": 256, "use_linear": False},
    )
    """Per-round proposal-network arguments (cf. reference
    models/nerfacto.py:90-96 proposal_net_args_list; same defaults)."""
    appearance_embedding_dim: int = 32
    interlevel_loss_mult: float = 1.0
    distortion_loss_mult: float = 0.002
    use_single_jitter: bool = True
    camera_optimizer: CameraOptimizerConfig = dataclass_field(
        default_factory=lambda: CameraOptimizerConfig(mode="SO3xR3")
    )
    """Learnable per-frame pose refinement, applied to train rays
    (cf. reference models/nerfacto.py:131 — nerfacto defaults to SO3xR3)."""
    use_proposal_weight_anneal: bool = True
    """Anneal proposal weights from uniform (exponent 0) to the plain PDF
    (exponent 1) over the first anneal_max_num_iters steps
    (cf. reference models/nerfacto.py:107-116, 266-272)."""
    proposal_weights_anneal_slope: float = 10.0
    proposal_weights_anneal_max_num_iters: int = 1000
    eval_num_rays_per_chunk: int = 1 << 14
    """Full-image eval renders run in chunks of this many rays (cf. reference
    nerfacto method config eval_num_rays_per_chunk, method_configs.py)."""
    predict_lidar: bool = False  # lidar-nerfacto variant
    depth_loss_type: str = "dsnerf"
    """Lidar depth supervision: 'dsnerf' (the reference LidarNerfacto's
    default — DS-NeRF termination likelihood over EVERY sampling round,
    lidar_nerfacto.py:51,95-108), 'urf' (Urban Radiance Fields), or 'l1'
    (simple expected-depth L1 — our pre-parity variant)."""
    depth_loss_mult: float = 1e-3
    """cf. reference lidar_nerfacto.py:39 (1e-3 for the DS-NeRF default)."""
    depth_sigma: float = 0.01
    should_decay_sigma: bool = True
    starting_depth_sigma: float = 0.2
    sigma_decay_rate: float = 0.99985
    """Depth-uncertainty schedule: sigma(step) = max(starting * rate^step,
    depth_sigma) — the reference's per-call exponential decay
    (lidar_nerfacto.py:66-77, 130-137) in closed form over the step."""
    intensity_loss_mult: float = 0.1
    ray_drop_loss_mult: float = 0.01


class NerfactoModel(nn.Module):
    config: NerfactoModelConfig
    static_scale: float
    num_embeds: int = 1

    def setup(self):
        cfg = self.config
        self.field = NerfactoField(
            static_scale=self.static_scale,
            num_embeds=self.num_embeds,
            hidden_dim=cfg.hidden_dim,
            hidden_dim_color=cfg.hidden_dim_color,
            num_levels=cfg.num_levels,
            base_res=cfg.base_res,
            max_res=cfg.max_res,
            log2_hashmap_size=cfg.log2_hashmap_size,
            features_per_level=cfg.features_per_level,
            appearance_embedding_dim=cfg.appearance_embedding_dim,
            predict_intensity=cfg.predict_lidar,
        )
        args_list = cfg.proposal_net_args_list
        self.proposal_fields = [
            HashMLPDensityField(
                static_scale=self.static_scale,
                name=f"proposal_{i}",
                **{k: v for k, v in args_list[min(i, len(args_list) - 1)].items()},
            )
            for i in range(len(cfg.num_proposal_samples_per_ray))
        ]
        self.camera_optimizer = CameraOptimizer(config=cfg.camera_optimizer, num_cameras=self.num_embeds)

    def depth_sigma_for_step(self, step) -> jax.Array:
        """Lidar depth-loss sigma at `step` (traced scalar ok) — the
        reference's exponential decay in closed form (module config)."""
        cfg = self.config
        if not cfg.should_decay_sigma:
            return jnp.asarray(cfg.depth_sigma, jnp.float32)
        return jnp.maximum(
            cfg.starting_depth_sigma * cfg.sigma_decay_rate ** jnp.asarray(step, jnp.float32),
            cfg.depth_sigma,
        )

    def anneal_for_step(self, step) -> Optional[jax.Array]:
        """Proposal-weight exponent at `step` (traced scalar ok): the
        reference's bias(x, b) = b*x/((b-1)*x + 1) ramp over train_frac
        (models/nerfacto.py:266-272). None when annealing is disabled."""
        cfg = self.config
        if not cfg.use_proposal_weight_anneal:
            return None
        n = cfg.proposal_weights_anneal_max_num_iters
        x = jnp.clip(jnp.asarray(step, jnp.float32) / n, 0.0, 1.0)
        b = cfg.proposal_weights_anneal_slope
        return b * x / ((b - 1) * x + 1)

    def __call__(self, ray_bundle: RayBundle, train: bool = False, anneal=None) -> Dict[str, Any]:
        cfg = self.config
        # the reference's NearFarCollider defaults reset_near_plane=True: the
        # near plane suppresses floaters during TRAINING but is reset to 0
        # for eval/inference renders (scene_colliders.py:175-189) — found by
        # tests/test_reference_nerfacto_parity.py
        near = cfg.near_plane if train else 0.0
        nears = jnp.full_like(ray_bundle.pixel_area, near)
        fars = jnp.full_like(ray_bundle.pixel_area, cfg.far_plane)
        ray_bundle = ray_bundle.replace(nears=nears, fars=fars)
        if train and cfg.camera_optimizer.mode != "off":
            # pose-refine train rays (cf. reference get_outputs camera_optimizer)
            ray_bundle = self.camera_optimizer.apply_to_raybundle(ray_bundle)

        rng = self.make_rng("sampling") if train else None
        density_fns = [lambda rs, f=f: f(rs) for f in self.proposal_fields]
        ray_samples, weights_list, samples_list = proposal_network_sampler(
            ray_bundle,
            density_fns,
            cfg.num_proposal_samples_per_ray,
            cfg.num_nerf_samples_per_ray,
            rng=rng,
            single_jitter=cfg.use_single_jitter,
            initial_sampler=lin_disp_piecewise_sampler,
            anneal=anneal,
        )
        cam_idx = ray_bundle.camera_indices[..., 0] if ray_bundle.camera_indices is not None else None
        field_out = self.field(ray_samples, cam_idx)
        weights = ray_samples.get_weights(field_out["density"])

        outputs = {
            # the reference's RGBRenderer default background_color =
            # "last_sample" (models/nerfacto.py:60)
            "rgb": render_rgb_background(field_out["rgb"], weights, last_sample_background=True),
            "accumulation": render_accumulation(weights),
            "depth": render_depth_expected(weights, ray_samples),
        }
        if cfg.predict_lidar:
            outputs["intensity"] = jnp.sum(weights * field_out["intensity"], axis=-2)
            outputs["ray_drop_logits"] = jnp.sum(weights * field_out["ray_drop_logits"], axis=-2)
        if train:
            outputs["weights_list"] = weights_list + [weights]
            outputs["ray_samples_list"] = samples_list + [ray_samples]
        return outputs

    def query_rgb(self, positions: jax.Array, directions: jax.Array) -> jax.Array:
        """Field color at world positions [N, 3] viewed along directions
        [N, 3] (unit) — the mesh-texturing query (cf. reference
        exporter/texture_utils.py which evaluates the field at surface points
        along -normal rays). Builds a degenerate 1-sample RaySamples at each
        point so the standard field path applies."""
        from neuradar_tpu.cameras.rays import Frustums, RaySamples

        n = positions.shape[0]
        eps = 1e-4
        frustums = Frustums(
            origins=positions - directions * eps,
            directions=directions,
            starts=jnp.full((n, 1, 1), eps),
            ends=jnp.full((n, 1, 1), eps),
            pixel_area=jnp.full((n, 1), 1e-6),
        )
        samples = RaySamples(frustums=frustums, deltas=jnp.full((n, 1, 1), eps))
        return self.field(samples)["rgb"][:, 0]

    def loss_and_metrics(self, ray_bundle: RayBundle, batch: Dict[str, jax.Array], train: bool = True,
                         anneal=None, depth_sigma=None):
        cfg = self.config
        outputs = self(ray_bundle, train=train, anneal=anneal)
        loss_dict: Dict[str, jax.Array] = {}
        metrics: Dict[str, jax.Array] = {}
        if "rgb" in batch:
            mse = jnp.mean((batch["rgb"] - outputs["rgb"]) ** 2)
            loss_dict["rgb_loss"] = mse
            metrics["psnr"] = -10 * jnp.log10(jax.lax.stop_gradient(mse))
        if cfg.predict_lidar and "lidar_distance" in batch:
            did_return = batch["did_return"][..., 0]
            if cfg.depth_loss_type in ("dsnerf", "urf") and train:
                # the reference LidarNerfacto's supervision: the likelihood
                # loss averaged over EVERY sampling round's weights
                # (lidar_nerfacto.py:95-108); termination depth <= 0 masks
                # non-returning rays inside the loss
                from neuradar_tpu.model_components.losses import lidar_depth_loss

                sigma = depth_sigma if depth_sigma is not None else jnp.asarray(cfg.depth_sigma)
                term = batch["lidar_distance"] * did_return[..., None]
                wl, rsl = outputs["weights_list"], outputs["ray_samples_list"]
                # per-round predicted depth (URF's expected-depth term; the
                # reference overrides its depth renderer to 'expected')
                dloss = sum(
                    lidar_depth_loss(w, rs, term, render_depth_expected(w, rs), sigma,
                                     cfg.depth_loss_type)
                    for w, rs in zip(wl, rsl)
                ) / len(wl)
                loss_dict["depth_loss"] = cfg.depth_loss_mult * dloss
            else:
                loss_dict["depth_loss"] = cfg.depth_loss_mult * masked_mean(
                    jnp.abs(outputs["depth"] - batch["lidar_distance"])[..., 0], did_return
                )
            loss_dict["intensity_loss"] = cfg.intensity_loss_mult * masked_mean(
                (outputs["intensity"] - batch["lidar_intensity"])[..., 0] ** 2, did_return
            )
            loss_dict["ray_drop_loss"] = cfg.ray_drop_loss_mult * jnp.mean(
                binary_cross_entropy_with_logits(
                    outputs["ray_drop_logits"][..., 0], (~did_return).astype(jnp.float32)
                )
            )
        if train:
            wl, rsl = outputs["weights_list"], outputs["ray_samples_list"]
            # mip-NeRF 360 proposal loss — the reference nerfacto's variant
            # (losses.py:115; NeuRAD keeps the ZipNeRF anti-aliased one)
            loss_dict["interlevel_loss"] = cfg.interlevel_loss_mult * interlevel_loss(wl, rsl)
            loss_dict["distortion_loss"] = cfg.distortion_loss_mult * distortion_loss(wl, rsl)
            if cfg.camera_optimizer.mode != "off":
                loss_dict["camera_opt_regularizer"] = self.camera_optimizer.regularization_loss()
        total = sum(loss_dict.values(), jnp.asarray(0.0))
        return total, (loss_dict, metrics, outputs)
