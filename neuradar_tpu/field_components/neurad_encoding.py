"""NeuRAD scene encoding: static world hashgrid + 4D actor hashgrid.

cf. reference nerfstudio/field_components/neurad_encoding.py. TPU re-design:
the static/actor split is a dense masked computation over per-ray candidate
actors (see model_components/dynamic_actors.py) instead of `nonzero` index
lists; the actor grid is always the 4D variant (actor index as 4th coord,
reference's fast path at :282-293). Gaussian-std feature rescaling and the
random x-flip augmentation match the reference (:152-189, :218-226).

All per-sample actor math is written component-wise on [R, S] arrays — TPU
tiles the last two dims of every buffer to (8, 128), so [R, S, 3]-shaped
gathers/materializations would pad 10-40x in HBM.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dataclass_field
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from neuradar_tpu.field_components.encodings import HashEncoding
from neuradar_tpu.field_components.spatial_distortions import ScaledSceneContraction
from neuradar_tpu.model_components.dynamic_actors import (
    ActorCandidates,
    assign_samples_to_actors,
    gather_selected_w2b_components,
)
from neuradar_tpu.utils.math import GaussiansStd

EPS = 1.0e-7


@dataclass
class StaticSettings:
    """cf. reference StaticSettings (neurad_encoding.py:37)."""

    hashgrid_dim: int = 4
    num_levels: int = 8
    base_res: int = 32
    max_res: int = 8192
    log2_hashmap_size: int = 22
    dense_low_levels: bool = False
    """Collision-free dense rows for levels whose grid fits the table
    (tcnn behavior; default matches the reference torch fallback's
    hash-everything — see encodings.HashEncoding)."""
    packed_dense_cells: bool = False
    """Serve low-res levels from a per-step packed cell table (one aligned
    slice read per point-level instead of 2^d sub-transaction reads;
    bit-identical numerics — encodings.pack_cells). The model hoists the
    pack out of the nff chunk scan via packed_tables()."""
    packed_max_cells: int = 2**22


@dataclass
class ActorSettings:
    """cf. reference ActorSettings (neurad_encoding.py:51)."""

    flip_prob: float = 0.5
    actor_scale: float = 10.0
    hashgrid_dim: int = 4
    num_levels: int = 4
    base_res: int = 64
    max_res: int = 1024
    log2_hashmap_size: int = 17
    dense_low_levels: bool = False
    packed_dense_cells: bool = False
    packed_max_cells: int = 2**22


@dataclass
class NeuRADHashEncodingConfig:
    static: StaticSettings = dataclass_field(default_factory=StaticSettings)
    actor: ActorSettings = dataclass_field(default_factory=ActorSettings)
    disable_actors: bool = False
    require_actor_grad: bool = True


def _rescale_grid_features(grid_feats: jax.Array, std: jax.Array, scalings, num_levels: int, features_per_level: int):
    """Downweight features whose grid cell is smaller than the sample blob
    (cf. _rescale_grid_features, :309-316).

    grid_feats: [..., L*F], std: [..., 1] -> [..., L*F].
    """
    feats = grid_feats.reshape(*grid_feats.shape[:-1], num_levels, features_per_level)
    scalings = jnp.asarray(scalings, std.dtype)  # [L]
    weights = 1.0 / jnp.clip(scalings * 2 * std, 1.0, None)  # [..., L]
    feats = feats * weights[..., None]
    return feats.reshape(*grid_feats.shape[:-1], num_levels * features_per_level)


class NeuRADHashEncoding(nn.Module):
    """Joint static + actor-aware hash encoding.

    __call__ takes per-sample gaussian blobs (mean [R, S, 3], std [R, S, 1])
    plus per-ray actor candidates; the field averages over multisamples.
    """

    config: NeuRADHashEncodingConfig
    static_scale: float
    n_actors: int
    compute_dtype: Optional[jnp.dtype] = None

    def setup(self):
        cfg = self.config
        self.static_contraction = ScaledSceneContraction(scale=self.static_scale)
        self.actor_contraction = ScaledSceneContraction(scale=cfg.actor.actor_scale)
        self.static_grid = HashEncoding(
            num_levels=cfg.static.num_levels,
            min_res=cfg.static.base_res,
            max_res=cfg.static.max_res,
            log2_hashmap_size=cfg.static.log2_hashmap_size,
            features_per_level=cfg.static.hashgrid_dim,
            n_input_dims=3,
            compute_dtype=self.compute_dtype,
            dense_low_levels=cfg.static.dense_low_levels,
            packed_dense_cells=cfg.static.packed_dense_cells,
            packed_max_cells=cfg.static.packed_max_cells,
        )
        if self.has_actors:
            self.actor_grid = HashEncoding(
                num_levels=cfg.actor.num_levels,
                min_res=cfg.actor.base_res,
                max_res=cfg.actor.max_res,
                log2_hashmap_size=cfg.actor.log2_hashmap_size,
                features_per_level=cfg.actor.hashgrid_dim,
                n_input_dims=4,
                compute_dtype=self.compute_dtype,
                dense_low_levels=cfg.actor.dense_low_levels,
                packed_dense_cells=cfg.actor.packed_dense_cells,
                packed_max_cells=cfg.actor.packed_max_cells,
            )

    @property
    def has_actors(self) -> bool:
        return self.n_actors > 0 and not self.config.disable_actors

    def get_out_dim(self) -> int:
        return self.config.static.num_levels * self.config.static.hashgrid_dim

    def packed_tables(self) -> Optional[dict]:
        """Hoisted packed cell tables for this encoding's grids (None when
        no grid packs). The model computes this ONCE per step OUTSIDE the
        nff chunk scan and threads it to __call__ — see encodings.pack_cells
        for why the hoist is load-bearing."""
        out = {}
        p = self.static_grid.packed_cells()
        if p is not None:
            out["static"] = p
        if self.has_actors:
            p = self.actor_grid.packed_cells()
            if p is not None:
                out["actor"] = p
        return out or None

    def __call__(
        self,
        gaussians: GaussiansStd,
        candidates: Optional[ActorCandidates],
        directions: Optional[jax.Array] = None,
        packed: Optional[dict] = None,
    ) -> Tuple[jax.Array, Optional[jax.Array]]:
        """Args:
            gaussians: mean [R, S, 3], std [R, S, 1] (single multisample).
            candidates: per-ray actor candidates (None to disable actors).
            directions: [R, S, 3] per-sample directions or None.
            packed: hoisted packed_tables() output or None.

        Returns:
            features [R, S, static_out_dim], directions [R, S, 3] or None.
        """
        cfg = self.config
        packed = packed or {}
        mean, std = gaussians.mean, gaussians.std
        # ---- static world features
        static_pos = self.static_contraction(GaussiansStd(mean=mean, std=std))
        static_feats = _rescale_grid_features(
            self.static_grid(static_pos.mean, packed=packed.get("static")), static_pos.std,
            self.static_grid.scalings, cfg.static.num_levels, cfg.static.hashgrid_dim,
        )  # [R, S, L*F]

        if not self.has_actors or candidates is None:
            return static_feats, directions

        if not cfg.require_actor_grad:
            candidates = candidates.stop_gradient()

        # ---- per-sample actor assignment (component-wise masked dense)
        sel, has_actor = assign_samples_to_actors(candidates, mean)
        w2b = gather_selected_w2b_components(candidates, sel)  # 3x4 list of [R, S]
        actor_id = jnp.take_along_axis(candidates.actor_id, sel, axis=1)  # [R, S]
        flip = candidates.flip[:, None]  # [R, 1]

        px, py, pz = mean[..., 0], mean[..., 1], mean[..., 2]
        box_x = (w2b[0][0] * px + w2b[0][1] * py + w2b[0][2] * pz + w2b[0][3]) * flip
        box_y = w2b[1][0] * px + w2b[1][1] * py + w2b[1][2] * pz + w2b[1][3]
        box_z = w2b[2][0] * px + w2b[2][1] * py + w2b[2][2] * pz + w2b[2][3]
        pos_box = jnp.stack([box_x, box_y, box_z], axis=-1)  # [R, S, 3]

        actor_pos = self.actor_contraction(GaussiansStd(mean=pos_box, std=std))
        # 4D query: normalized actor index as the 4th coordinate (:282-293)
        id4 = (actor_id.astype(pos_box.dtype) / self.n_actors)[..., None]
        query = jnp.concatenate([actor_pos.mean, id4], axis=-1)  # [R, S, 4]
        actor_feats = _rescale_grid_features(
            self.actor_grid(query, packed=packed.get("actor")), actor_pos.std,
            self.actor_grid.scalings, cfg.actor.num_levels, cfg.actor.hashgrid_dim,
        )
        pad = self.get_out_dim() - actor_feats.shape[-1]
        if pad > 0:
            actor_feats = jnp.pad(actor_feats, [(0, 0)] * (actor_feats.ndim - 1) + [(0, pad)])

        features = jnp.where(has_actor[..., None], actor_feats, static_feats)

        if directions is not None:
            ux, uy, uz = directions[..., 0], directions[..., 1], directions[..., 2]
            bx = (w2b[0][0] * ux + w2b[0][1] * uy + w2b[0][2] * uz) * flip
            by = w2b[1][0] * ux + w2b[1][1] * uy + w2b[1][2] * uz
            bz = w2b[2][0] * ux + w2b[2][1] * uy + w2b[2][2] * uz
            norm = jnp.sqrt(bx * bx + by * by + bz * bz) + EPS
            dirs_box = jnp.stack([bx / norm, by / norm, bz / norm], axis=-1)
            directions = jnp.where(has_actor[..., None], dirs_box, directions)

        return features, directions
