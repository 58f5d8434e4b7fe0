"""Renderers: weighted accumulation along rays.

Replaces nerfacc.accumulate_along_rays (reference
nerfstudio/model_components/renderers.py) with vectorized weighted reductions
over the dense samples axis — a single fused multiply-reduce on TPU.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from neuradar_tpu.cameras.rays import RaySamples


def render_features(features: jax.Array, weights: jax.Array) -> jax.Array:
    """Weighted feature accumulation (cf. FeatureRenderer, renderers.py:59).

    features: [R, S, C], weights: [R, S, 1] -> [R, C].
    """
    return jnp.sum(weights * features, axis=-2)


def render_accumulation(weights: jax.Array) -> jax.Array:
    """Total accumulated weight per ray (cf. AccumulationRenderer, :322)."""
    return jnp.sum(weights, axis=-2)


def render_depth_simple(weights: jax.Array, ray_samples: RaySamples) -> jax.Array:
    """Unnormalized expected depth (cf. render_depth_simple, neurad.py:721)."""
    steps = (ray_samples.frustums.starts + ray_samples.frustums.ends) / 2.0
    return jnp.sum(weights * steps, axis=-2)


def render_depth_expected(weights: jax.Array, ray_samples: RaySamples, eps: float = 1e-10) -> jax.Array:
    """Accumulation-normalized expected depth (cf. DepthRenderer 'expected')."""
    steps = (ray_samples.frustums.starts + ray_samples.frustums.ends) / 2.0
    depth = jnp.sum(weights * steps, axis=-2) / (jnp.sum(weights, axis=-2) + eps)
    lo = jnp.min(steps, axis=-2)
    hi = jnp.max(steps, axis=-2)
    return jnp.clip(depth, lo, hi)


def render_depth_median(weights: jax.Array, ray_samples: RaySamples) -> jax.Array:
    """Median depth: first sample where cumulative weight exceeds 0.5."""
    steps = (ray_samples.frustums.starts + ray_samples.frustums.ends) / 2.0  # [R, S, 1]
    cum = jnp.cumsum(weights[..., 0], axis=-1)  # [R, S]
    split = jnp.full_like(cum[..., :1], 0.5)
    idx = jax.vmap(lambda c, s: jnp.searchsorted(c, s, side="left"))(cum, split)
    idx = jnp.clip(idx, 0, steps.shape[-2] - 1)
    return jnp.take_along_axis(steps[..., 0], idx, axis=-1)


def render_normals(normals: jax.Array, weights: jax.Array, normalize: bool = True) -> jax.Array:
    """Weighted normal accumulation (cf. NormalsRenderer, renderers.py:462)."""
    n = jnp.sum(weights * normals, axis=-2)
    if normalize:
        n = n / jnp.linalg.norm(n, axis=-1, keepdims=True).clip(1e-10)
    return n


def render_rgb_background(
    rgb: jax.Array, weights: jax.Array, background_color: Optional[jax.Array] = None,
    last_sample_background: bool = False,
) -> jax.Array:
    """Weighted rgb accumulation with optional background blend
    (cf. RGBRenderer used by the nerfacto family).

    last_sample_background implements the reference's default
    background_color="last_sample" (models/nerfacto.py:60): the missing
    accumulation is filled with the LAST sample's color — found by
    tests/test_reference_nerfacto_parity.py (a constant/no background left
    every rendered pixel ~0.05 off)."""
    comp = jnp.sum(weights * rgb, axis=-2)
    if last_sample_background:
        acc = jnp.sum(weights, axis=-2)
        comp = comp + rgb[..., -1, :] * (1.0 - acc)
    elif background_color is not None:
        acc = jnp.sum(weights, axis=-2)
        comp = comp + background_color * (1.0 - acc)
    return jnp.clip(comp, 0.0, 1.0)
