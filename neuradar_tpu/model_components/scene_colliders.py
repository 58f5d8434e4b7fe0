"""Scene colliders: set per-ray near/far bounds.

cf. reference nerfstudio/model_components/scene_colliders.py:29 (NearFar,
AABBBox, Sphere colliders used by the nerfacto family and tests).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from neuradar_tpu.cameras.rays import RayBundle
from neuradar_tpu.utils.math import intersect_aabb


def near_far_collider(ray_bundle: RayBundle, near: float, far: float) -> RayBundle:
    """Constant near/far planes (cf. NearFarCollider)."""
    ones = jnp.ones_like(ray_bundle.pixel_area)
    return ray_bundle.replace(nears=ones * near, fars=ones * far)


def aabb_box_collider(ray_bundle: RayBundle, aabb: jax.Array, near_plane: float = 0.0) -> RayBundle:
    """Near/far from ray/AABB intersection (cf. AABBBoxCollider).

    Args:
        aabb: [2, 3] min/max corners.
    """
    t_min, t_max = intersect_aabb(ray_bundle.origins, ray_bundle.directions, aabb.reshape(-1))
    nears = jnp.maximum(t_min, near_plane)[:, None]
    fars = jnp.maximum(t_max, nears[:, 0] + 1e-3)[:, None]
    return ray_bundle.replace(nears=nears, fars=fars)


def sphere_collider(ray_bundle: RayBundle, center: jax.Array, radius: float) -> RayBundle:
    """Near/far from ray/sphere intersection (cf. SphereCollider)."""
    oc = ray_bundle.origins - center
    b = jnp.sum(oc * ray_bundle.directions, axis=-1)
    c = jnp.sum(oc * oc, axis=-1) - radius**2
    disc = jnp.maximum(b * b - c, 0.0)
    sq = jnp.sqrt(disc)
    nears = jnp.maximum(-b - sq, 0.0)[:, None]
    fars = jnp.maximum(-b + sq, nears[:, 0] + 1e-3)[:, None]
    return ray_bundle.replace(nears=nears, fars=fars)
