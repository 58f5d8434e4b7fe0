"""Spatial distortions (scene contractions) in JAX.

cf. reference nerfstudio/field_components/spatial_distortions.py. The MERF /
mipnerf-360 style L-inf contraction maps unbounded space to [-2, 2]^3 and then
(when ``normalize``) linearly to [0, 1]^3 so hashgrid inputs are well scaled.
GaussiansStd get the ZipNeRF linearized std update.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from neuradar_tpu.utils.math import GaussiansStd

_INF = float("inf")


def _norm(x: jax.Array, order: float) -> jax.Array:
    if order == _INF:
        return jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    if order == 2:
        return jnp.linalg.norm(x, axis=-1, keepdims=True)
    raise ValueError(f"Unsupported norm order {order}")


def contract_points(x: jax.Array, order: float = _INF) -> jax.Array:
    """MipNeRF-360 contraction of points: identity inside the unit ball,
    (2 - 1/|x|) * x/|x| outside (cf. spatial_distortions.py:79-82)."""
    mag = _norm(x, order)
    clamped = jnp.maximum(mag, 1.0)
    return jnp.where(mag < 1, x, (2 - 1 / clamped) * (x / clamped))


def contract_gaussians(g: GaussiansStd, order: float = _INF) -> GaussiansStd:
    """ZipNeRF-style linearized contraction of gaussian blobs
    (cf. spatial_distortions.py:103-113)."""
    mag = _norm(g.mean, order)
    mask = mag < 1
    clamped = jnp.maximum(mag, 1.0)
    mean = jnp.where(mask, g.mean, (2 - 1 / clamped) * (g.mean / clamped))
    std_scaling = ((2 * clamped - 1) ** (1 / 3) / clamped) ** 2
    std = jnp.where(mask, g.std, g.std * std_scaling)
    return GaussiansStd(mean=mean, std=std)


class ScaledSceneContraction:
    """Contraction with a pre-scale, normalized to [0, 1]^3.

    cf. reference ScaledSceneContraction (spatial_distortions.py:118-141).
    Stateless; safe to construct inside jitted functions.
    """

    def __init__(self, order: float = _INF, scale: float = 1.0, normalize: bool = True):
        self.order = order
        self.scale = scale
        self.normalize = normalize

    def __call__(self, positions):
        if isinstance(positions, GaussiansStd):
            g = GaussiansStd(mean=positions.mean / self.scale, std=positions.std / self.scale)
            g = contract_gaussians(g, self.order)
            if self.normalize:
                g = GaussiansStd(mean=(g.mean + 2.0) / 4.0, std=g.std / 4.0)
            return g
        x = contract_points(positions / self.scale, self.order)
        if self.normalize:
            x = (x + 2.0) / 4.0
        return x
