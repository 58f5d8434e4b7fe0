"""NeuRAD neural feature field and its proposal variant.

cf. reference nerfstudio/fields/neurad_field.py: hashgrid -> geometry MLP
(1 + 32 outputs) -> SH direction encoding + residual feature MLP; SDF is
converted to alpha by a learnable-steepness sigmoid (SigmoidDensity,
model_components/utils.py:21). Widths (32) are MXU-friendly dot chains.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dataclass_field
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from neuradar_tpu.cameras.rays import RaySamples
from neuradar_tpu.field_components.encodings import SHEncoding
from neuradar_tpu.field_components.mlp import MLP
from neuradar_tpu.field_components.neurad_encoding import (
    ActorSettings,
    NeuRADHashEncoding,
    NeuRADHashEncodingConfig,
    StaticSettings,
)
from neuradar_tpu.model_components.dynamic_actors import ActorCandidates
from neuradar_tpu.utils.math import GaussiansStd


@jax.custom_vjp
def trunc_exp(x):
    """exp with gradient-safe clamping (cf. field_components/activations.py)."""
    return jnp.exp(x)


def _trunc_exp_fwd(x):
    return jnp.exp(x), x


def _trunc_exp_bwd(x, g):
    return (g * jnp.exp(jnp.clip(x, -15.0, 15.0)),)


trunc_exp.defvjp(_trunc_exp_fwd, _trunc_exp_bwd)


class SigmoidDensity(nn.Module):
    """Learnable sdf -> alpha sigmoid (cf. model_components/utils.py:21)."""

    init_beta: float = 20.0
    beta_min: float = 1e-4
    learnable_beta: bool = True

    @nn.compact
    def __call__(self, sdf: jax.Array) -> jax.Array:
        beta_param = self.param("beta", lambda key: jnp.asarray([self.init_beta], jnp.float32))
        if not self.learnable_beta:
            beta_param = jax.lax.stop_gradient(beta_param)
        beta = jnp.abs(beta_param) + self.beta_min
        return jax.nn.sigmoid(-sdf * beta)

    @staticmethod
    def beta_value(params, beta_min: float = 1e-4) -> jax.Array:
        """The effective steepness forward() uses (abs(beta) + beta_min)."""
        return jnp.abs(params["beta"]) + beta_min


@dataclass
class NeuRADFieldConfig:
    """cf. reference NeuRADFieldConfig (neurad_field.py:45)."""

    grid: NeuRADHashEncodingConfig = dataclass_field(
        default_factory=lambda: NeuRADHashEncodingConfig(require_actor_grad=True, actor=ActorSettings(flip_prob=0.25))
    )
    geo_hidden_dim: int = 32
    geo_num_layers: int = 2
    nff_hidden_dim: int = 32
    nff_num_layers: int = 3
    nff_out_dim: int = 32
    num_multisamples: int = 1
    multisample_mode: str = "isotropic"
    """'isotropic' (NeuRAD's fast single-blob default) or 'hexagonal'
    (ZipNeRF 6-point spiral, utils/math.hexify_frustums — more accurate
    anti-aliasing at ~6x hashgrid-gather cost)."""
    use_sdf: bool = True
    sdf_beta: float = 20.0
    learnable_beta: bool = True


@dataclass
class NeuRADProposalFieldConfig:
    """cf. reference NeuRADProposalFieldConfig (neurad_field.py:156)."""

    grid: NeuRADHashEncodingConfig = dataclass_field(
        default_factory=lambda: NeuRADHashEncodingConfig(
            static=StaticSettings(log2_hashmap_size=20, num_levels=6, max_res=4096, base_res=128, hashgrid_dim=1),
            actor=ActorSettings(log2_hashmap_size=15, num_levels=4, base_res=64, max_res=1024, hashgrid_dim=1),
            require_actor_grad=False,
        )
    )
    hidden_dim: int = 16
    decoder: str = "mlp"
    """'mlp' (2-layer, width hidden_dim — our default; the reference's
    hidden_dim knob is dead code) or 'linear' (the reference's exact
    bias-free linear readout, neurad_field.py:205 — used by the
    executed-reference parity suite)."""


class NeuRADField(nn.Module):
    """Main neural feature field (cf. NeuRADField, neurad_field.py:78)."""

    config: NeuRADFieldConfig
    static_scale: float
    n_actors: int
    compute_dtype: Optional[jnp.dtype] = None

    def setup(self):
        cfg = self.config
        self.hashgrid = NeuRADHashEncoding(
            config=cfg.grid, static_scale=self.static_scale, n_actors=self.n_actors,
            compute_dtype=self.compute_dtype,
        )
        self.mlp_geo = MLP(
            out_dim=cfg.nff_out_dim + 1,
            num_layers=cfg.geo_num_layers,
            layer_width=cfg.geo_hidden_dim,
            compute_dtype=self.compute_dtype,
        )
        self.direction_encoding = SHEncoding(levels=4)
        self.mlp_feature = MLP(
            out_dim=cfg.nff_out_dim,
            num_layers=cfg.nff_num_layers,
            layer_width=cfg.nff_hidden_dim,
            compute_dtype=self.compute_dtype,
        )
        if cfg.use_sdf:
            self.sdf_to_density = SigmoidDensity(init_beta=cfg.sdf_beta, learnable_beta=cfg.learnable_beta)

    def packed_tables(self) -> Optional[dict]:
        """Hoisted packed-cell tables (encodings.pack_cells) or None."""
        return self.hashgrid.packed_tables()

    def __call__(
        self,
        ray_samples: RaySamples,
        candidates: Optional[ActorCandidates],
        packed: Optional[dict] = None,
    ) -> Dict[str, jax.Array]:
        """Evaluate the field on [R, S] samples.

        Returns dict with 'feature' [R, S, D] and either 'sdf' + 'alpha' or
        'density' (cf. neurad_field.py:128-152).
        """
        cfg = self.config
        if cfg.multisample_mode == "hexagonal":
            gaussians = ray_samples.frustums.get_hexagonal_gaussian()
        elif cfg.multisample_mode == "isotropic":
            gaussians = ray_samples.frustums.get_fast_isotropic_gaussian(cfg.num_multisamples)
        else:
            raise ValueError(f"unknown multisample_mode: {cfg.multisample_mode!r}")
        n_ms = gaussians.mean.shape[-2]
        dirs = jnp.broadcast_to(
            ray_samples.frustums.directions[:, None, :], gaussians.mean[..., 0, :].shape
        )
        # average features over multisamples (cf. _rescale_grid_features mean
        # over the M axis, neurad_encoding.py:315); M=1 by default
        features = None
        for m in range(n_ms):
            g_m = GaussiansStd(mean=gaussians.mean[..., m, :], std=gaussians.std[..., m, :])
            f_m, dirs_m = self.hashgrid(g_m, candidates, dirs if m == 0 else None, packed=packed)
            if m == 0:
                dirs = dirs_m if dirs_m is not None else dirs
            features = f_m if features is None else features + f_m
        features = features / n_ms

        geo = self.mlp_geo(features)  # [R, S, 1 + D]
        geo_out, geo_embed = geo[..., :1], geo[..., 1:]
        # raw unit directions: tcnn's SH (the reference's real path) unmaps
        # its [0,1] input internally, so the SH basis sees the true direction
        dir_embed = self.direction_encoding(dirs)
        feature = geo_embed + self.mlp_feature(jnp.concatenate([geo_embed, dir_embed], axis=-1))

        outputs = {"feature": feature}
        if cfg.use_sdf:
            outputs["sdf"] = geo_out
            outputs["alpha"] = self.sdf_to_density(geo_out)
        else:
            outputs["density"] = trunc_exp(geo_out)
        return outputs


def field_query_geometry(field: "NeuRADField", positions: jax.Array, std: float = 0.05) -> jax.Array:
    """Query raw geometry (sdf or log-density) at world positions [R, S, 3]
    — used by the exporter's SDF-surface extraction."""
    g = GaussiansStd(mean=positions, std=jnp.full((*positions.shape[:-1], 1), std, positions.dtype))
    feats, _ = field.hashgrid(g, None, None)
    geo = field.mlp_geo(feats)
    return geo[..., :1]


class NeuRADProposalField(nn.Module):
    """Density-only proposal field (cf. NeuRADProposalField, neurad_field.py:185)."""

    config: NeuRADProposalFieldConfig
    static_scale: float
    n_actors: int
    compute_dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.hashgrid = NeuRADHashEncoding(
            config=self.config.grid, static_scale=self.static_scale, n_actors=self.n_actors,
            compute_dtype=self.compute_dtype,
        )
        # 'mlp': one hidden layer of config.hidden_dim (the reference's
        # hidden_dim knob is dead code — its readout is a bias-free linear,
        # neurad_field.py:205 — ours puts the knob to work by default);
        # 'linear': the reference's exact architecture.
        if self.config.decoder == "linear":
            self.density_decoder = nn.Dense(1, use_bias=False, name="density_decoder_linear")
        else:
            self.density_decoder = MLP(
                out_dim=1, num_layers=2, layer_width=self.config.hidden_dim,
                compute_dtype=self.compute_dtype,
            )

    def packed_tables(self) -> Optional[dict]:
        """Hoisted packed-cell tables (encodings.pack_cells) or None."""
        return self.hashgrid.packed_tables()

    def __call__(
        self,
        ray_samples: RaySamples,
        candidates: Optional[ActorCandidates],
        packed: Optional[dict] = None,
    ) -> jax.Array:
        gaussians = ray_samples.frustums.get_fast_isotropic_gaussian(num_multisamples=1)
        g = GaussiansStd(mean=gaussians.mean[..., 0, :], std=gaussians.std[..., 0, :])
        features, _ = self.hashgrid(g, candidates, None, packed=packed)
        density = self.density_decoder(features)
        return trunc_exp(density)  # [R, S, 1]
