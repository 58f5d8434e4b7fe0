"""Shading helpers for rendered normals (cf. reference
model_components/shaders.py:22-77 — LambertianShader / NormalsShader).

Pure functions over jax arrays instead of nn.Modules: they hold no
parameters and sit on the visualization path, so the stateless form is the
idiomatic JAX shape.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def lambertian_shade(
    rgb: jax.Array,
    normals: jax.Array,
    light_direction: jax.Array,
    shading_weight: float = 1.0,
    detach_normals: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Lambertian shading (reference shaders.py:25-54).

    Args:
        rgb: [..., 3] accumulated color.
        normals: [..., 3] accumulated normals.
        light_direction: [3] or broadcastable [..., 3].
        shading_weight: 1.0 = fully Lambertian, 0.0 = ambient only.
        detach_normals: stop gradients through the shading term.

    Returns:
        (shaded, shaded_albedo): textureless shading [..., 3] and shaded rgb.
    """
    if detach_normals:
        normals = jax.lax.stop_gradient(normals)
    lambertian = (1.0 - shading_weight) + shading_weight * jnp.clip(
        jnp.sum(normals * light_direction, axis=-1), 0.0, None
    )
    shaded = jnp.repeat(lambertian[..., None], 3, axis=-1)
    shaded_albedo = rgb * lambertian[..., None]
    return shaded, shaded_albedo


def normals_shade(normals: jax.Array, weights: Optional[jax.Array] = None) -> jax.Array:
    """Map normalized 3D vectors into [0, 1] rgb (reference shaders.py:56-77),
    optionally scaled by accumulation weights for masking."""
    out = (normals + 1.0) / 2.0
    if weights is not None:
        out = out * weights
    return out
