"""Nerfacto field: hashgrid -> density MLP -> (SH dirs + appearance) -> rgb.

cf. reference nerfstudio/fields/nerfacto_field.py:44-200 and
fields/density_fields.py:35 (HashMLPDensityField). The lidar variant adds
intensity + ray-drop heads (cf. models/lidar_nerfacto.py:35-137).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from neuradar_tpu.cameras.rays import RaySamples
from neuradar_tpu.field_components.encodings import HashEncoding, SHEncoding
from neuradar_tpu.field_components.mlp import MLP
from neuradar_tpu.field_components.spatial_distortions import ScaledSceneContraction
from neuradar_tpu.fields.neurad_field import trunc_exp


class NerfactoField(nn.Module):
    """cf. NerfactoField (nerfacto_field.py:44)."""

    static_scale: float
    num_embeds: int = 1
    num_layers: int = 2
    hidden_dim: int = 64
    geo_feat_dim: int = 15
    num_levels: int = 16
    base_res: int = 16
    max_res: int = 2048
    log2_hashmap_size: int = 19
    features_per_level: int = 2
    num_layers_color: int = 3
    hidden_dim_color: int = 64
    appearance_embedding_dim: int = 32
    predict_intensity: bool = False  # lidar-nerfacto heads

    def setup(self):
        self.contraction = ScaledSceneContraction(scale=self.static_scale)
        self.grid = HashEncoding(
            num_levels=self.num_levels,
            min_res=self.base_res,
            max_res=self.max_res,
            log2_hashmap_size=self.log2_hashmap_size,
            features_per_level=self.features_per_level,
        )
        self.mlp_base = MLP(out_dim=1 + self.geo_feat_dim, num_layers=self.num_layers, layer_width=self.hidden_dim)
        self.direction_encoding = SHEncoding(levels=4)
        self.mlp_head = MLP(
            out_dim=3 + (2 if self.predict_intensity else 0),
            num_layers=self.num_layers_color,
            layer_width=self.hidden_dim_color,
        )
        if self.appearance_embedding_dim > 0:
            self.appearance = nn.Embed(self.num_embeds, self.appearance_embedding_dim)

    def __call__(self, ray_samples: RaySamples, camera_indices: Optional[jax.Array] = None) -> Dict[str, jax.Array]:
        positions = ray_samples.frustums.get_positions()
        x = self.contraction(positions)
        h = self.mlp_base(self.grid(x))
        density = trunc_exp(h[..., :1])
        geo_feat = h[..., 1:]

        dirs = jnp.broadcast_to(ray_samples.frustums.directions[:, None, :], positions.shape)
        d_embed = self.direction_encoding(dirs)  # raw unit dirs (see neurad_field)
        head_in = [d_embed, geo_feat]
        if self.appearance_embedding_dim > 0:
            idx = camera_indices if camera_indices is not None else jnp.zeros(positions.shape[0], jnp.int32)
            idx = idx.reshape(positions.shape[0])  # accept [R] or RayBundle's [R, 1]
            emb = self.appearance(idx.astype(jnp.int32))  # [R, E]
            head_in.append(jnp.broadcast_to(emb[:, None, :], (*positions.shape[:2], emb.shape[-1])))
        out = self.mlp_head(jnp.concatenate(head_in, axis=-1))
        result = {"density": density, "rgb": jax.nn.sigmoid(out[..., :3])}
        if self.predict_intensity:
            result["intensity"] = jax.nn.sigmoid(out[..., 3:4])
            result["ray_drop_logits"] = out[..., 4:5]
        return result


class HashMLPDensityField(nn.Module):
    """Proposal density field (cf. fields/density_fields.py:35)."""

    static_scale: float
    num_levels: int = 5
    max_res: int = 256
    base_res: int = 16
    log2_hashmap_size: int = 17
    features_per_level: int = 2
    hidden_dim: int = 16
    use_linear: bool = False

    def setup(self):
        self.contraction = ScaledSceneContraction(scale=self.static_scale)
        self.grid = HashEncoding(
            num_levels=self.num_levels,
            min_res=self.base_res,
            max_res=self.max_res,
            log2_hashmap_size=self.log2_hashmap_size,
            features_per_level=self.features_per_level,
        )
        if self.use_linear:
            self.decoder = nn.Dense(1)
        else:
            self.decoder = MLP(out_dim=1, num_layers=2, layer_width=self.hidden_dim)

    def __call__(self, ray_samples: RaySamples) -> jax.Array:
        positions = ray_samples.frustums.get_positions()
        x = self.contraction(positions)
        return trunc_exp(self.decoder(self.grid(x)))
