"""NeuRadar: joint camera + lidar + radar neural feature field model.

cf. reference nerfstudio/models/neuradar.py. TPU-first re-design:

* One merged ray bundle with a STATIC segment layout
  [camera | lidar | radar-scans] — modality "masks" are compile-time slices,
  not boolean gathers (the reference uses is_lidar/is_radar boolean indexing,
  models/neuradar.py:424-443).
* The whole forward — proposal sampling, field eval, volume rendering,
  modality decoders — is one jittable function; volume weights are vectorized
  scans (replacing nerfacc, :1010-1023).
* Actor candidates are computed ONCE per bundle and shared by the main and
  proposal fields (the reference recomputes the actor split per field).
* Losses are computed inside the module (so the VGG submodule and PRNG
  streams are available) and returned as a dict, mirroring
  get_metrics_dict/get_loss_dict (:588-704).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dataclass_field
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from neuradar_tpu.cameras.camera_optimizers import CameraOptimizer, CameraOptimizerConfig
from neuradar_tpu.cameras.rays import RayBundle, RaySamples, render_weights_from_alpha, render_weights_from_density
from neuradar_tpu.field_components.mlp import MLP
from neuradar_tpu.fields.neurad_field import (
    NeuRADField,
    NeuRADFieldConfig,
    NeuRADProposalField,
    NeuRADProposalFieldConfig,
)
from neuradar_tpu.model_components import radar_utils
from neuradar_tpu.model_components.cnns import RGBDecoder
from neuradar_tpu.model_components.dynamic_actors import (
    ActorCandidates,
    ActorEdits,
    ActorTrajectories,
    DynamicActors,
    DynamicActorsConfig,
)
from neuradar_tpu.model_components.losses import (
    binary_cross_entropy_with_logits,
    distortion_loss_sdist,
    masked_mean,
    ray_samples_to_sdist,
    zipnerf_interlevel_loss_sdist,
)
from neuradar_tpu.model_components.radar_decoder import RadarDecoder, SetRadarDecoder, spherical_to_cartesian
from neuradar_tpu.model_components.renderers import render_depth_simple
from neuradar_tpu.model_components.vgg import VGGPerceptualLossPix2Pix
from neuradar_tpu.model_components.ray_samplers import power_sampler, proposal_network_sampler

EPS = 1e-7


# ---------------------------------------------------------------------------
# Configuration (mirrors the reference's dataclass tree)
# ---------------------------------------------------------------------------


@dataclass
class LossSettings:
    """cf. reference LossSettings (models/neuradar.py:80-115)."""

    vgg_mult: float = 0.05
    rgb_mult: float = 5.0
    depth_mult: float = 0.01
    intensity_mult: float = 0.1
    carving_mult: float = 0.01
    carving_epsilon: float = 0.1
    quantile_threshold: float = 0.95
    interlevel_loss_mult: float = 0.001
    distortion_loss_mult: float = 0.002
    non_return_lidar_distance: float = 150.0
    non_return_loss_mult: float = 0.1
    ray_drop_loss_mult: float = 0.01
    prop_lidar_loss_mult: float = 0.1
    radar_mult: float = 0.02
    radar_loss_type: str = "nll"  # nll | euclidean
    radar_assignment: str = "auction"  # auction (on-device) | hungarian (host)
    radar_set_loss: str = "mb"
    """Loss for the set decoder (radar_decoder_type='set'): 'mb' reuses the
    multi-Bernoulli loss with n_mb=num_queries; 'detr' uses SetCriterion
    semantics (class-cost matching, eos-weighted existence BCE, L1 points —
    radar_utils.detr_set_loss, cf. reference detr/models/detr.py:102-210)."""


@dataclass
class SamplingSettings:
    """cf. reference SamplingSettings (models/neuradar.py:118-138)."""

    single_jitter: bool = True
    proposal_field_1: NeuRADProposalFieldConfig = dataclass_field(default_factory=NeuRADProposalFieldConfig)
    proposal_field_2: NeuRADProposalFieldConfig = dataclass_field(default_factory=NeuRADProposalFieldConfig)
    num_proposal_samples: Tuple[int, ...] = (128, 64)
    num_nerf_samples: int = 32
    power_lambda: float = -1.0
    power_scaling: float = 0.1
    sky_distance: float = 20000.0


@dataclass
class NeuRadarModelConfig:
    """cf. reference NeuRadarModelConfig (models/neuradar.py:141-186)."""

    loss: LossSettings = dataclass_field(default_factory=LossSettings)
    sampling: SamplingSettings = dataclass_field(default_factory=SamplingSettings)
    field: NeuRADFieldConfig = dataclass_field(default_factory=NeuRADFieldConfig)
    dynamic_actors: DynamicActorsConfig = dataclass_field(default_factory=DynamicActorsConfig)
    camera_optimizer: CameraOptimizerConfig = dataclass_field(default_factory=CameraOptimizerConfig)

    appearance_dim: int = 16
    use_temporal_appearance: bool = True
    temporal_appearance_freq: float = 1.0

    rgb_upsample_factor: int = 3
    rgb_hidden_dim: int = 32

    compensate_upsampling_when_rendering: bool = True
    normalize_depth: bool = False
    existence_probability_threshold: float = 0.5
    eval_num_rays_per_chunk: int = 1 << 15
    compute_dtype: str = "float32"
    """bfloat16 halves hashgrid gather bandwidth + runs MLPs on the MXU in
    bf16 (the TPU analogue of the reference's AMP, trainer.py:200)."""
    nff_chunks: int = 1
    """Sequential ray chunks for the NFF core (nn.scan); bounds the padded
    HBM footprint of [rays, samples] intermediates. Must divide total rays
    (otherwise falls back to a single unchunked evaluation)."""
    use_pallas_composite: Optional[bool] = None
    """Fused Pallas compositing (ops/volumetric.fused_composite_sky) instead
    of the XLA cumprod formulation. None = auto: ON for real TPU (measured
    1.9x faster fwd+bwd at the chunked bf16 production shape, 2026-08-17 —
    docs/PERFORMANCE.md), OFF elsewhere (the CPU fallback interprets)."""
    use_pallas_attention: Optional[bool] = None
    """Fused Pallas self-attention for the radar encoder (ops/attention.py:
    scores stay in VMEM instead of materializing [scans, rays, rays] in HBM
    twice). None = auto: ON for real TPU — A/B measured 2026-08-18 at the
    production shape: 22.9 -> 3.3 ms fwd+bwd unchunked, 9.0 -> 1.1 ms per
    remat group (7-8x, docs/PERFORMANCE.md) — OFF elsewhere (interpret mode
    is CI-only; set True to force it on CPU tests)."""
    radar_decode_chunks: int = 4
    """Radar scans are decoded in this many groups (remat'd): the encoder's
    self-attention materializes [scans, rays, rays] — 16 x 3424^2 at the
    reference batch — and grouping bounds that live buffer the same way
    nff_chunks bounds the field eval."""
    nff_remat: bool = True
    """Rematerialize the NFF core in backward (recompute-over-store)."""
    nff_remat_policy: str = "save_grid"
    """'save_grid' (default) = save the hashgrid gather outputs (tagged
    'hashgrid_out', encodings.py) and recompute only the cheap elementwise
    rest — skips one full re-gather + hash-index pass per chunk in backward
    for ~0.6 GB of saved activations at the reference batch (the wide
    gathers are the bandwidth-dominant ray-proportional cost; TPU cost
    model -18.6% bytes, docs/PERFORMANCE.md roofline). 'save_corners'
    additionally saves the gathered corner features (tagged
    'hashgrid_corners' inside the encode VJP) so the backward performs ZERO
    random-access table reads — the position-gradient corner features come
    from a sequential [N, 2^d*L*F] residual (~4.6 GB bf16 extra HBM
    residency across the three encodings at the reference batch; the
    random 8-byte-row gathers it replaces pay >=32-byte HBM transactions,
    so the physical saving exceeds the counted bytes). 'all' = recompute
    the whole chunk forward (minimum memory fallback). Numerics-identical
    in every mode (tests/test_nff_chunking.py)."""
    hoist_table_cast: bool = True
    """Cast hash tables to compute_dtype ONCE per step (in the pipeline loss
    fn) instead of inside the nff_chunks scan body, where the cast re-executes
    per chunk and forces f32 cotangent accumulation. Cuts ~40% of the step's
    ray-independent HBM traffic (encodings.cast_hash_tables, measured via
    tools/hlo_table_traffic.py). Table-gradient accumulation across chunks
    then happens in compute_dtype (Instant-NGP trains tables fully in fp16;
    parity covered by tests/test_table_cast_hoist.py)."""
    radar_transformer_dropout: float = 0.1
    """Dropout rate inside the radar transformer (train mode only; the
    reference detr Transformer default is 0.1). Parity tests set 0."""
    radar_decoder_type: str = "encoder"
    """'encoder' (per-ray heads grounded in NeRF geometry, the reference
    default) or 'set' (DETR-style learnable-query set prediction, the paper's
    alternative; cf. reference vendored detr/)."""
    num_radar_queries: int = 300
    """Query count for the set-based radar decoder."""
    radar_set_aux_loss: bool = True
    """Deep supervision on intermediate set-decoder layers during training
    (cf. reference detr/models/detr.py aux_loss)."""

    @property
    def num_proposal_rounds(self) -> int:
        return len(self.sampling.num_proposal_samples)


@dataclass(frozen=True)
class SegmentLayout:
    """Static partition of the merged ray bundle (compile-time constants)."""

    num_cam: int = 0
    num_lidar: int = 0
    num_radar_scans: int = 0
    rays_per_scan: int = 0
    patch_size: Tuple[int, int] = (1, 1)  # rendered (pre-upsample) patch

    @property
    def num_radar(self) -> int:
        return self.num_radar_scans * self.rays_per_scan

    @property
    def total(self) -> int:
        return self.num_cam + self.num_lidar + self.num_radar

    def cam(self, x):
        return x[: self.num_cam] if self.num_cam else None

    def lidar(self, x):
        return x[self.num_cam : self.num_cam + self.num_lidar] if self.num_lidar else None

    def radar(self, x):
        return x[self.num_cam + self.num_lidar :] if self.num_radar else None


@dataclass(frozen=True)
class SceneMeta:
    """Static scene constants the model needs at construction."""

    static_scale: float = 100.0  # scene_box.aabb.max()
    duration: float = 10.0
    num_sensors: int = 1
    num_train_frames: int = 1  # camera-optimizer frame count


# ---------------------------------------------------------------------------
# Model
# ---------------------------------------------------------------------------


class NeuRadarModel(nn.Module):
    """The joint model as a single flax module.

    PRNG streams: 'sampling' (stratified bins), 'flip' (actor x-flip),
    'dropout' (radar transformer).
    """

    config: NeuRadarModelConfig
    scene: SceneMeta
    trajectories: ActorTrajectories

    def setup(self):
        cfg = self.config
        self.dynamic_actors = DynamicActors(trajectories=self.trajectories, config=cfg.dynamic_actors)
        self.camera_optimizer = CameraOptimizer(config=cfg.camera_optimizer, num_cameras=self.scene.num_train_frames)

        n_actors = self.trajectories.n_actors
        cdt = jnp.dtype(cfg.compute_dtype) if cfg.compute_dtype != "float32" else None
        self.field = NeuRADField(
            config=cfg.field, static_scale=self.scene.static_scale, n_actors=n_actors, compute_dtype=cdt
        )
        self.proposal_fields = [
            NeuRADProposalField(
                config=c, static_scale=self.scene.static_scale, n_actors=n_actors, name=f"proposal_field_{i}",
                compute_dtype=cdt,
            )
            for i, c in enumerate((cfg.sampling.proposal_field_1, cfg.sampling.proposal_field_2))
        ]

        # appearance embedding (cf. models/neuradar.py:210-219)
        if cfg.use_temporal_appearance:
            self._embeds_per_sensor = max(1, int(-(-self.scene.duration * cfg.temporal_appearance_freq // 1)))
        else:
            self._embeds_per_sensor = 1
        num_embeds = self.scene.num_sensors * self._embeds_per_sensor
        self.appearance_embedding = nn.Embed(num_embeds, cfg.appearance_dim)

        n_features = cfg.field.nff_out_dim + cfg.appearance_dim
        self.rgb_decoder = RGBDecoder(hidden_dim=cfg.rgb_hidden_dim, upsample_factor=cfg.rgb_upsample_factor)
        self.lidar_decoder = MLP(out_dim=2, num_layers=3, layer_width=32)
        on_tpu = jax.default_backend() == "tpu"
        # None = auto: the fused kernel is a measured 7-8x on real TPU (see
        # config docstring); interpret mode exists only for CI, so auto never
        # selects it off-TPU
        use_attn = cfg.use_pallas_attention if cfg.use_pallas_attention is not None else on_tpu
        if use_attn:
            attn_impl = "pallas" if on_tpu else "pallas_interpret"
        else:
            attn_impl = "flax"
        if cfg.radar_decoder_type == "set":
            self.radar_decoder = SetRadarDecoder(
                d_model=n_features, num_queries=cfg.num_radar_queries,
                position_scale=self.scene.static_scale,
                dropout=cfg.radar_transformer_dropout,
                attn_impl=attn_impl,
                aux_loss=cfg.radar_set_aux_loss,
                dtype=cdt,
            )
        else:
            # remat: the backward pass recomputes each group's attention
            # instead of keeping every [g, nr, nr] residual alive (moot for
            # the fused-attention path, whose scores never reach HBM)
            decoder_cls = (
                nn.remat(RadarDecoder, static_argnums=(3,)) if cfg.radar_decode_chunks > 1 else RadarDecoder
            )
            self.radar_decoder = decoder_cls(
                d_model=n_features, dropout=cfg.radar_transformer_dropout,
                attn_impl=attn_impl, dtype=cdt,
            )
        self.vgg_loss = VGGPerceptualLossPix2Pix()

    # -- forward ------------------------------------------------------------

    def __call__(self, ray_bundle: RayBundle, layout: SegmentLayout, train: bool = False) -> Dict[str, Any]:
        return self.get_outputs(ray_bundle, layout, train)

    def get_outputs(
        self,
        ray_bundle: RayBundle,
        layout: SegmentLayout,
        train: bool = False,
        actor_edits: Optional[ActorEdits] = None,
        intensity_for_cam: bool = False,
    ) -> Dict[str, Any]:
        cfg = self.config
        if train and cfg.camera_optimizer.mode != "off":
            ray_bundle = self.camera_optimizer.apply_to_raybundle(ray_bundle)

        nff = self.get_nff_outputs(ray_bundle, layout, train, actor_edits)
        features = nff.pop("features")

        outputs = dict(nff)
        # --- camera decode: patches through the upsampling CNN (:454-461)
        cam_feats = layout.cam(features)
        if cam_feats is not None:
            ph, pw = layout.patch_size
            patches = cam_feats.reshape(-1, ph, pw, cam_feats.shape[-1])
            outputs["rgb"] = self.rgb_decoder(patches, train=train)

        # --- lidar decode (:445-452)
        lidar_feats = features if intensity_for_cam else layout.lidar(features)
        if lidar_feats is not None:
            decoded = self.lidar_decoder(lidar_feats)
            outputs["intensity"] = jax.nn.sigmoid(decoded[..., :1]).astype(jnp.float32)
            outputs["ray_drop_logits"] = decoded[..., 1:2].astype(jnp.float32)

        # --- radar decode (:464-492)
        radar_feats = layout.radar(features)
        if radar_feats is not None:
            ns, nr = layout.num_radar_scans, layout.rays_per_scan
            radar_feats = radar_feats.reshape(ns, nr, radar_feats.shape[-1])
            depth = layout.radar(outputs["depth"]).reshape(ns, nr, 1)
            spher = layout.radar(ray_bundle.metadata["directions_spher"]).reshape(ns, nr, 2)
            geometry = spherical_to_cartesian(depth, spher[..., 1:2], spher[..., 0:1])
            # decode scans in groups: attention within a scan is independent
            # across scans, so grouping only bounds the [g, nr, nr] live
            # buffer (remat recomputes it in the backward pass per group)
            n_groups = max(1, min(cfg.radar_decode_chunks, ns))
            while ns % n_groups:
                n_groups -= 1
            if n_groups > 1:
                g = ns // n_groups
                outs = [
                    self.radar_decoder(radar_feats[i * g : (i + 1) * g],
                                       geometry[i * g : (i + 1) * g], train)
                    for i in range(n_groups)
                ]
                radar_output = jnp.concatenate([o[0] for o in outs], axis=0)
                radar_angles = jnp.concatenate([o[1] for o in outs], axis=0)
                if len(outs[0]) == 3:  # set decoder deep supervision: [D-1, N, Q, 7]
                    outputs["radar_aux_outputs"] = jnp.concatenate([o[2] for o in outs], axis=1)
            else:
                out_dec = self.radar_decoder(radar_feats, geometry, train)
                radar_output, radar_angles = out_dec[0], out_dec[1]
                if len(out_dec) == 3:
                    outputs["radar_aux_outputs"] = out_dec[2]
            outputs["radar_output"] = radar_output
            outputs["radar_angles"] = radar_angles

        return outputs

    def query_geometry(self, positions: jax.Array) -> jax.Array:
        """Raw geometry (sdf if use_sdf else log-density) at world positions
        [R, S, 3] — exporter / debugging hook."""
        from neuradar_tpu.fields.neurad_field import field_query_geometry

        return field_query_geometry(self.field, positions)

    def decode_camera_features(self, features: jax.Array, patch_size: Tuple[int, int]) -> jax.Array:
        """Decode rendered features to rgb via the upsampling CNN (eval path)."""
        ph, pw = patch_size
        patches = features.reshape(-1, ph, pw, features.shape[-1])
        return self.rgb_decoder(patches, train=False)

    def get_nff_outputs(
        self,
        ray_bundle: RayBundle,
        layout: SegmentLayout,
        train: bool = False,
        actor_edits: Optional[ActorEdits] = None,
    ) -> Dict[str, Any]:
        """Neural-feature-field forward (cf. get_nff_outputs, :495-548).

        TPU memory strategy: the per-ray core is evaluated in ``nff_chunks``
        sequential chunks via nn.scan (+ nn.remat), bounding the padded HBM
        footprint of the big [rays, samples, ...] intermediates — the
        reference instead relies on CUDA's untiled memory and AMP.
        """
        cfg = self.config
        ray_bundle = self._scale_pixel_area(ray_bundle, layout)

        # sky clamp (cf. :570-576)
        sky = cfg.sampling.sky_distance
        fars = jnp.minimum(ray_bundle.fars, sky) if ray_bundle.fars is not None else jnp.full_like(
            ray_bundle.pixel_area, sky
        )
        nears = ray_bundle.nears if ray_bundle.nears is not None else jnp.zeros_like(fars)
        ray_bundle = ray_bundle.replace(nears=nears, fars=fars)

        # derive the boolean lidar mask from the static layout if absent
        # (the chunked core can't use static segment slicing)
        if train and layout.num_lidar > 0 and "is_lidar" not in ray_bundle.metadata:
            is_lidar = jnp.zeros((layout.total, 1), bool).at[
                layout.num_cam : layout.num_cam + layout.num_lidar
            ].set(True)
            md = dict(ray_bundle.metadata)
            md["is_lidar"] = is_lidar
            ray_bundle = ray_bundle.replace(metadata=md)

        # actor candidates computed once for the bundle
        flip_rng = self.make_rng("flip") if (train and cfg.field.grid.actor.flip_prob > EPS) else None
        times = ray_bundle.times[..., 0] if ray_bundle.times is not None else jnp.zeros(layout.total)
        candidates = self.dynamic_actors.get_ray_candidates(
            times,
            ray_bundle.origins,
            ray_bundle.directions,
            flip_rng=flip_rng,
            flip_prob=cfg.field.grid.actor.flip_prob,
            edits=actor_edits,
        ) if self.trajectories.n_actors > 0 else None

        # packed-cell tables are derived from params ONCE here, OUTSIDE the
        # chunk scan, and enter the scanned core as broadcast constants: the
        # scan backward then accumulates their cotangent across chunks and
        # the pack's fold-back scatter into the canonical tables runs once
        # per step (encodings.pack_cells — tracing the pack inside the body
        # would re-run that full-cell-table transpose every chunk)
        packed = (
            self.field.packed_tables(),
            tuple(pf.packed_tables() for pf in self.proposal_fields),
        )

        n_chunks = cfg.nff_chunks if (cfg.nff_chunks > 1 and layout.total % cfg.nff_chunks == 0) else 1
        if n_chunks == 1:
            return self._nff_core(ray_bundle, candidates, train, packed)

        def to_chunks(x):
            return x.reshape(n_chunks, x.shape[0] // n_chunks, *x.shape[1:])

        xs = jax.tree.map(to_chunks, (ray_bundle, candidates))

        def body(mdl, carry, x, packed):
            rb, cand = x
            return carry, mdl._nff_core(rb, cand, train, packed)

        if cfg.nff_remat:
            if cfg.nff_remat_policy not in ("save_grid", "save_corners", "all"):
                # a typo must not silently run full recompute while its
                # reading is banked/compared as a save_grid number
                raise ValueError(f"unknown nff_remat_policy {cfg.nff_remat_policy!r} "
                                 "(expected 'save_grid', 'save_corners' or 'all')")
            policy = {
                "save_grid": jax.checkpoint_policies.save_only_these_names("hashgrid_out"),
                "save_corners": jax.checkpoint_policies.save_only_these_names(
                    "hashgrid_out", "hashgrid_corners"),
                "all": None,
            }[cfg.nff_remat_policy]
            body = nn.remat(body, prevent_cse=False, policy=policy)
        scan = nn.scan(
            body,
            variable_broadcast=["params", "batch_stats"],
            split_rngs={"params": False, "sampling": True, "flip": False, "dropout": False},
            in_axes=(0, nn.broadcast),
            out_axes=0,
        )
        _, outs = scan(self, None, xs, packed)

        def unchunk(x):
            if x.ndim == 1:  # stacked per-chunk scalars (carving sums)
                return jnp.sum(x)
            return x.reshape(x.shape[0] * x.shape[1], *x.shape[2:])

        return {k: unchunk(v) if isinstance(v, jax.Array) else v for k, v in outs.items()}

    def _nff_core(
        self, ray_bundle: RayBundle, candidates: Optional[ActorCandidates], train: bool,
        packed=None,
    ) -> Dict[str, Any]:
        """Per-ray NFF core: sampling -> fields -> volume rendering -> masks.

        Modality handling uses the boolean is_lidar metadata (zero for
        camera/radar rays) so the function is chunk-shape-agnostic.

        ``packed``: (main_packed, per-proposal packed) hoisted packed-cell
        tables from get_nff_outputs, or None (packing off / direct call).
        """
        cfg = self.config
        packed_main, packed_props = packed if packed is not None else (None, (None,) * len(self.proposal_fields))
        sky = cfg.sampling.sky_distance
        # f=f binds round i to proposal field i. The REFERENCE builds these
        # with late-binding closures (models/neuradar.py:303), so BOTH of its
        # rounds evaluate proposal_fields[1] and proposal_fields[0] is never
        # queried or trained — a real upstream bug, found and documented by
        # tests/test_reference_model_parity.py::test_reference_dead_proposal_field.
        density_fns = [
            (lambda rs, f=f, pk=pk: f(rs, candidates, packed=pk))
            for f, pk in zip(self.proposal_fields, packed_props)
        ]
        sampling_rng = self.make_rng("sampling") if train else None
        ray_samples, weights_list, samples_list = proposal_network_sampler(
            ray_bundle,
            density_fns,
            cfg.sampling.num_proposal_samples,
            cfg.sampling.num_nerf_samples,
            rng=sampling_rng,
            single_jitter=cfg.sampling.single_jitter,
            initial_sampler=lambda rb, n, rng=None, single_jitter=True: power_sampler(
                rb, n, rng, single_jitter, lambda_=cfg.sampling.power_lambda, scaling=cfg.sampling.power_scaling
            ),
        )
        ray_samples = _apply_sky_sample(ray_samples, sky)

        field_out = self.field(ray_samples, candidates, packed=packed_main)
        use_pallas = (
            cfg.use_pallas_composite
            if cfg.use_pallas_composite is not None
            else jax.default_backend() == "tpu"
        )
        if use_pallas:
            # fused VMEM pass: weights + sky redistribution + feature render
            # in one kernel (ops/volumetric.py); exact same semantics as the
            # XLA formulation below (parity-tested in tests/test_pallas_ops)
            from neuradar_tpu.ops.volumetric import fused_composite_sky

            if cfg.field.use_sdf:
                alpha = field_out["alpha"][..., 0]
            else:
                d = ray_samples.frustums.ends[..., 0] - ray_samples.frustums.starts[..., 0]
                alpha = 1.0 - jnp.exp(-d * field_out["density"][..., 0])
            weights_sky, features, accumulation = fused_composite_sky(
                alpha, field_out["feature"], jax.default_backend() != "tpu"
            )
        else:
            weights = self._render_weights(field_out, ray_samples)  # [r, S]
            accumulation = jnp.sum(weights, axis=-1, keepdims=True)  # [r, 1]

            # dump remaining probability mass on the sky sample (cf. :507-509)
            weights_sky = jnp.concatenate([weights[..., :-1], weights[..., -1:] + 1 - accumulation], axis=-1)
            features = jnp.sum(weights_sky[..., None] * field_out["feature"], axis=-2)  # [r, C]
        if cfg.appearance_dim > 0:
            appearance = self._get_appearance_embedding(ray_bundle, features)
            features = jnp.concatenate([features, appearance], axis=-1)

        # discard sky sample for depth / losses (cf. :514-517)
        weights_main = weights_sky[..., :-1]  # [r, S-1]
        samples_main = _drop_last_sample(ray_samples)
        if cfg.normalize_depth:
            from neuradar_tpu.model_components.renderers import render_depth_expected

            depth = render_depth_expected(weights_main[..., None], samples_main)
        else:
            depth = render_depth_simple(weights_main[..., None], samples_main)

        outputs: Dict[str, Any] = {
            "features": features,
            "depth": depth,
            "accumulation": accumulation,
            "weights_final": weights_main,
            "sdist_final": _sdist(samples_main),
        }
        if cfg.normalize_depth:
            from neuradar_tpu.model_components.renderers import render_depth_expected as _prop_depth
        else:
            _prop_depth = render_depth_simple
        for i, (pw, prs) in enumerate(zip(weights_list, samples_list)):
            outputs[f"weights_prop_{i}"] = pw[..., 0]
            outputs[f"sdist_prop_{i}"] = _sdist(prs)
            outputs[f"prop_depth_{i}"] = _prop_depth(pw, prs)

        # lidar carving masks (cf. _compute_is_close_to_lidar, :971-994)
        if train and "is_lidar" in ray_bundle.metadata:
            is_lidar = ray_bundle.metadata["is_lidar"]  # [r, 1]
            lidar_dist = ray_bundle.metadata["directions_norm"]
            did_return = ray_bundle.metadata.get("did_return", jnp.ones_like(is_lidar))
            for i, (pw, prs) in enumerate(zip(weights_list, samples_list)):
                mask = self._not_close_to_lidar(prs, lidar_dist, did_return) & is_lidar
                outputs[f"prop_carving_sq_sum_{i}"] = jnp.sum((pw[..., 0] * mask) ** 2)
            mask = self._not_close_to_lidar(samples_main, lidar_dist, did_return) & is_lidar
            outputs["carving_sq_sum"] = jnp.sum((weights_main * mask) ** 2)

        return outputs

    def _not_close_to_lidar(self, ray_samples, lidar_dist, did_return) -> jax.Array:
        """[r, S] mask of samples NOT near the measured lidar return."""
        cfg = self.config.loss
        starts = ray_samples.frustums.starts[..., 0]  # [r, S]
        ends = ray_samples.frustums.ends[..., 0]
        sample_dist = (starts + ends) * 0.5
        close_to_hit = jnp.abs(lidar_dist - sample_dist) < cfg.carving_epsilon
        in_range = sample_dist < cfg.non_return_lidar_distance
        is_close = jnp.where(did_return, close_to_hit, in_range)
        return ~is_close

    def _render_weights(self, field_out: Dict[str, jax.Array], ray_samples: RaySamples) -> jax.Array:
        """SDF->alpha or density path (cf. _render_weights, :1010-1023)."""
        if self.config.field.use_sdf:
            return render_weights_from_alpha(field_out["alpha"][..., 0])
        return render_weights_from_density(
            ray_samples.frustums.starts[..., 0], ray_samples.frustums.ends[..., 0], field_out["density"][..., 0]
        )

    def _scale_pixel_area(self, ray_bundle: RayBundle, layout: SegmentLayout) -> RayBundle:
        """Camera rays render at 1/u resolution; grow their footprint by u^2
        (cf. _scale_pixel_area, :996-1008)."""
        u2 = float(self.config.rgb_upsample_factor**2)
        pa = ray_bundle.pixel_area
        if layout.num_cam == 0:
            return ray_bundle
        scaled = jnp.concatenate([pa[: layout.num_cam] * u2, pa[layout.num_cam :]], axis=0)
        return ray_bundle.replace(pixel_area=scaled)

    def _get_appearance_embedding(self, ray_bundle: RayBundle, features: jax.Array) -> jax.Array:
        """Temporal-interpolated per-sensor appearance (cf. :550-568)."""
        cfg = self.config
        sensor_idx = ray_bundle.metadata.get("sensor_idxs")
        if sensor_idx is None:
            sensor_idx = jnp.zeros((features.shape[0], 1), jnp.int32)
        sensor_idx = sensor_idx[..., 0].astype(jnp.int32)
        if cfg.use_temporal_appearance:
            eps_n = self._embeds_per_sensor
            times = ray_bundle.times[..., 0] if ray_bundle.times is not None else jnp.zeros_like(features[..., 0])
            time_idx = times / self.scene.duration * eps_n
            before = jnp.clip(jnp.floor(time_idx), 0, eps_n - 1)
            after = jnp.clip(before + 1, 0, eps_n - 1)
            ratio = (time_idx - before)[..., None]
            before_emb = self.appearance_embedding((before + sensor_idx * eps_n).astype(jnp.int32))
            after_emb = self.appearance_embedding((after + sensor_idx * eps_n).astype(jnp.int32))
            return before_emb * (1 - ratio) + after_emb * ratio
        return self.appearance_embedding(sensor_idx)

    # -- losses ---------------------------------------------------------------

    def loss_and_metrics(
        self, ray_bundle: RayBundle, batch: Dict[str, jax.Array], layout: SegmentLayout, train: bool = True
    ):
        """Forward + full loss dict (cf. get_metrics_dict/get_loss_dict,
        models/neuradar.py:588-704). Returns (total_loss, (loss_dict,
        metrics_dict, outputs))."""
        cfg = self.config
        conf = cfg.loss
        outputs = self.get_outputs(ray_bundle, layout, train=train)
        loss_dict: Dict[str, jax.Array] = {}
        metrics: Dict[str, jax.Array] = {}

        # ---- rgb
        if "rgb" in outputs and "image" in batch:
            image = batch["image"]
            if image.dtype == jnp.uint8:  # shipped compact; normalize on device
                image = image.astype(jnp.float32) / 255.0
            rgb = outputs["rgb"]
            loss_dict["rgb_loss"] = jnp.mean((image - rgb) ** 2) * conf.rgb_mult
            if conf.vgg_mult > 0.0:
                loss_dict["vgg_loss"] = self.vgg_loss(rgb, image) * conf.vgg_mult
            mse = jnp.mean((image - jax.lax.stop_gradient(rgb)) ** 2)
            metrics["psnr"] = -10.0 * jnp.log10(mse)

        # ---- lidar
        if layout.num_lidar > 0 and "lidar_distance" in batch:
            did_return = batch["did_return"][..., 0]  # [Nl]
            term_depth = batch["lidar_distance"]  # [Nl, 1]
            gt_intensity = batch["lidar_intensity"]  # [Nl, 1]
            pred_depth = layout.lidar(outputs["depth"])  # [Nl, 1]
            ray_drop_logits = outputs["ray_drop_logits"]
            pred_intensity = outputs["intensity"]

            metrics["depth_median_l2"] = _masked_median((pred_depth - term_depth)[..., 0] ** 2, did_return)
            metrics["depth_mean_rel_l2"] = masked_mean(
                ((pred_depth - term_depth) / term_depth)[..., 0] ** 2, did_return
            )
            metrics["intensity_rmse"] = jnp.sqrt(
                masked_mean((pred_intensity - gt_intensity)[..., 0] ** 2, did_return)
            )
            metrics["ray_drop_accuracy"] = jnp.mean(
                ((jax.nn.sigmoid(ray_drop_logits[..., 0]) > 0.5) == ~did_return).astype(jnp.float32)
            )

            if train:
                nonret = conf.non_return_lidar_distance
                ur_loss = _depth_l1_with_nonreturns(pred_depth, term_depth, did_return, nonret, conf.non_return_loss_mult)
                quantile = jnp.quantile(jax.lax.stop_gradient(ur_loss), conf.quantile_threshold)
                qmask = (ur_loss < quantile)[..., 0]
                depth_loss = masked_mean(ur_loss[..., 0], qmask)
                loss_dict["depth_loss"] = conf.depth_mult * depth_loss
                metrics["depth_loss"] = depth_loss

                qret = qmask & did_return
                intensity_loss = masked_mean((gt_intensity - pred_intensity)[..., 0] ** 2, qret)
                loss_dict["intensity_loss"] = conf.intensity_mult * intensity_loss

                ray_drop = jnp.mean(
                    binary_cross_entropy_with_logits(
                        ray_drop_logits[..., 0], (~did_return).astype(jnp.float32)
                    )
                )
                loss_dict["ray_drop_loss"] = conf.ray_drop_loss_mult * ray_drop

                n_lidar = float(layout.num_lidar)
                loss_dict["carving_loss"] = conf.carving_mult * outputs["carving_sq_sum"] / n_lidar

                prop_d_mult = conf.prop_lidar_loss_mult * conf.depth_mult
                prop_c_mult = conf.prop_lidar_loss_mult * conf.carving_mult
                for i in range(cfg.num_proposal_rounds):
                    p_depth = layout.lidar(outputs[f"prop_depth_{i}"])
                    p_loss = _depth_l1_with_nonreturns(
                        p_depth, term_depth, did_return, nonret, conf.non_return_loss_mult
                    )
                    loss_dict[f"depth_loss_{i}"] = prop_d_mult * jnp.mean(p_loss)
                    loss_dict[f"carving_loss_{i}"] = prop_c_mult * outputs[f"prop_carving_sq_sum_{i}"] / n_lidar

        # ---- radar
        if "radar_output" in outputs and "radar_gt" in batch:
            if cfg.radar_decoder_type == "set" and conf.radar_set_loss == "detr":
                # SetCriterion semantics for the set decoder (see LossSettings)
                def radar_loss_fn(pred):
                    return radar_utils.detr_set_loss(
                        batch["radar_gt"], batch["radar_gt_mask"], pred,
                        assignment=conf.radar_assignment,
                    )
            else:
                def radar_loss_fn(pred):
                    return radar_utils.calculate_radar_loss(
                        batch["radar_gt"], batch["radar_gt_mask"], pred,
                        loss_type=conf.radar_loss_type, training=train,
                        assignment=conf.radar_assignment,
                    )

            radar_loss, assoc = radar_loss_fn(outputs["radar_output"])
            metrics["radar_loss"] = radar_loss
            loss_dict["radar_loss"] = conf.radar_mult * radar_loss
            if train and "radar_aux_outputs" in outputs:
                # deep supervision: every intermediate set-decoder layer gets
                # the same loss at full weight (DETR sums aux losses,
                # reference detr/models/detr.py SetCriterion aux path)
                aux = outputs["radar_aux_outputs"]
                aux_total = 0.0
                for k in range(aux.shape[0]):
                    aux_k, _ = radar_loss_fn(aux[k])
                    aux_total = aux_total + aux_k
                loss_dict["radar_aux_loss"] = conf.radar_mult * aux_total

        # ---- interlevel / distortion (cf. :681-686)
        if train:
            sdist_list = [outputs[f"sdist_prop_{i}"] for i in range(cfg.num_proposal_rounds)]
            sdist_list.append(outputs["sdist_final"])
            wl = [outputs[f"weights_prop_{i}"] for i in range(cfg.num_proposal_rounds)]
            wl.append(outputs["weights_final"])
            loss_dict["interlevel_loss"] = conf.interlevel_loss_mult * zipnerf_interlevel_loss_sdist(sdist_list, wl)
            dist = distortion_loss_sdist(sdist_list[-1], wl[-1])
            metrics["distortion"] = dist
            loss_dict["distortion_loss"] = conf.distortion_loss_mult * dist
            if cfg.camera_optimizer.mode != "off":
                loss_dict["camera_opt_regularizer"] = self.camera_optimizer.regularization_loss()

        total = jnp.asarray(0.0)
        for v in loss_dict.values():
            total = total + v
        return total, (loss_dict, metrics, outputs)


_sdist = ray_samples_to_sdist  # normalized bin edges [r, S+1]


def _depth_l1_with_nonreturns(pred, target, did_return, nonret_dist, nonret_mult):
    """L1 depth loss with the non-return target trick (cf. :615-622)."""
    tgt = jnp.where(
        did_return[..., None], target, jnp.maximum(jax.lax.stop_gradient(pred), nonret_dist)
    )
    loss = jnp.abs(tgt - pred)
    return jnp.where(did_return[..., None], loss, loss * nonret_mult)


def _masked_median(x: jax.Array, mask: jax.Array) -> jax.Array:
    big = jnp.asarray(jnp.inf, x.dtype)
    vals = jnp.sort(jnp.where(mask, x, big))
    n = jnp.sum(mask)
    idx = jnp.clip((n - 1) // 2, 0, x.shape[0] - 1)
    hi = vals[jnp.clip(n // 2, 0, x.shape[0] - 1)]
    lo = vals[idx]
    return jnp.where(n > 0, (lo + hi) / 2, jnp.asarray(0.0, x.dtype))


def _apply_sky_sample(ray_samples: RaySamples, sky_distance: float) -> RaySamples:
    """Stretch the last sample to the sky (cf. models/neuradar.py:578-582)."""
    ends = ray_samples.frustums.ends
    dist_to_sky = sky_distance - ends[..., -1, 0]
    new_ends = ends.at[..., -1, 0].add(dist_to_sky)
    new_deltas = ray_samples.deltas.at[..., -1, 0].add(dist_to_sky)
    new_sp_ends = (
        ray_samples.spacing_ends.at[..., -1, 0].set(1 - EPS) if ray_samples.spacing_ends is not None else None
    )
    return ray_samples.replace(
        frustums=ray_samples.frustums.replace(ends=new_ends),
        deltas=new_deltas,
        spacing_ends=new_sp_ends,
    )


def _drop_last_sample(ray_samples: RaySamples) -> RaySamples:
    f = ray_samples.frustums
    return ray_samples.replace(
        frustums=f.replace(starts=f.starts[..., :-1, :], ends=f.ends[..., :-1, :]),
        deltas=ray_samples.deltas[..., :-1, :],
        spacing_starts=None if ray_samples.spacing_starts is None else ray_samples.spacing_starts[..., :-1, :],
        spacing_ends=None if ray_samples.spacing_ends is None else ray_samples.spacing_ends[..., :-1, :],
    )
