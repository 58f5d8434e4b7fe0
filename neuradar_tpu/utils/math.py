"""Math and tensor primitives.

Re-implements the math layer of the reference (nerfstudio/utils/math.py) in
pure JAX: isotropic gaussian sample blobs, the ZipNeRF power transform used by
the PowerSampler, AABB intersection, and chamfer distance.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class GaussiansStd:
    """Gaussian blobs with diagonal (isotropic) std.

    Mirrors ``GaussiansStd`` (reference nerfstudio/utils/math.py:115): mean has
    shape [..., num_multisamples, 3] and std [..., num_multisamples, 1].
    Registered as a pytree so it can flow through jit/vmap.
    """

    mean: jax.Array
    std: jax.Array

    @property
    def dtype(self):
        return self.mean.dtype


def power_fn(x: jax.Array, lam: float = -1.5, max_bound: float = 1e10) -> jax.Array:
    """ZipNeRF power transformation (Eq. 4), cf. reference utils/math.py:541."""
    if lam == 1:
        return x
    if lam == 0:
        return jnp.log1p(x)
    if lam > max_bound:
        return jnp.expm1(x)
    if lam < -max_bound:
        return -jnp.expm1(-x)
    lam_1 = abs(lam - 1)
    return (lam_1 / lam) * ((x / lam_1 + 1) ** lam - 1)


def inv_power_fn(x: jax.Array, lam: float = -1.5, eps: float = 1e-10, max_bound: float = 1e10) -> jax.Array:
    """Inverse of :func:`power_fn`, cf. reference utils/math.py:559."""
    if lam == 1:
        return x
    if lam == 0:
        return jnp.expm1(x)
    if lam > max_bound:
        return jnp.log1p(x)
    if lam < -max_bound:
        return -jnp.log(1 - x)
    lam_1 = abs(lam - 1)
    return (jnp.clip(x * lam / lam_1 + 1, min=eps) ** (1 / lam) - 1) * lam_1


def erf_approx(x: jax.Array) -> jax.Array:
    """ZipNeRF error-function approximation (Eq. 11), cf. utils/math.py:583."""
    return jnp.sign(x) * jnp.sqrt(1 - jnp.exp(-4 / jnp.pi * x**2))


def intersect_aabb(
    origins: jax.Array,
    directions: jax.Array,
    aabb: jax.Array,
    max_bound: float = 1e10,
    invalid_value: float = 1e10,
) -> Tuple[jax.Array, jax.Array]:
    """Ray/AABB slab intersection, cf. reference utils/math.py:337.

    Args:
        origins: [N, 3] ray origins.
        directions: [N, 3] ray directions.
        aabb: [6] flattened (xmin, ymin, zmin, xmax, ymax, zmax).

    Returns:
        (t_min, t_max) per ray, ``invalid_value`` where there is no hit.
    """
    dirs = jnp.where(jnp.abs(directions) < 1e-10, 1e-10, directions)
    tx_min = (aabb[:3] - origins) / dirs
    tx_max = (aabb[3:] - origins) / dirs
    t_low = jnp.minimum(tx_min, tx_max)
    t_high = jnp.maximum(tx_min, tx_max)
    t_min = jnp.clip(jnp.max(t_low, axis=-1), 0.0, max_bound)
    t_max = jnp.clip(jnp.min(t_high, axis=-1), 0.0, max_bound)
    miss = t_min >= t_max
    t_min = jnp.where(miss, invalid_value, t_min)
    t_max = jnp.where(miss, invalid_value, t_max)
    return t_min, t_max


def intersect_obb(
    origins: jax.Array,
    directions: jax.Array,
    centers: jax.Array,
    rotations: jax.Array,
    half_extents: jax.Array,
    max_bound: float = 1e10,
    invalid_value: float = 1e10,
) -> Tuple[jax.Array, jax.Array]:
    """Ray/oriented-box intersection, cf. reference utils/math.py (intersect_obb).

    Rotates rays into the box frame and reuses the AABB slab test; t values
    are in world units (rotation preserves norms).

    Args:
        origins/directions: [N, 3] world-frame rays.
        centers: [3] box center; rotations: [3, 3] box-to-world rotation;
        half_extents: [3].
    """
    o_box = (origins - centers) @ rotations  # world->box: R^T (o - c)
    d_box = directions @ rotations
    aabb = jnp.concatenate([-half_extents, half_extents])
    return intersect_aabb(o_box, d_box, aabb, max_bound=max_bound, invalid_value=invalid_value)


_HEX_ANGLES = jnp.arange(6) * (2.0 * jnp.pi / 6.0)


def hexify_frustums(
    origins: jax.Array,
    directions: jax.Array,
    starts: jax.Array,
    ends: jax.Array,
    pixel_area: jax.Array,
    rotate_per_ray: bool = True,
) -> GaussiansStd:
    """ZipNeRF-style hexagonal multisampling of conical frustums.

    cf. reference utils/math.py:230-320 (conical_frustum_to_gaussian's
    multisample pattern): 6 points per frustum arranged on a spiral —
    stratified along the axis, 60 degrees apart in angle, at radial offset
    r/sqrt(2) so the point set matches the cone cross-section's second
    moment (uniform disk: E[x^2] = r^2/4 per axis; 6 points at radius rho
    give rho^2/2 — equal at rho = r/sqrt(2)). Residual per-point std r/2.

    Args:
        origins/directions: [R, 3]; starts/ends: [R, S, 1];
        pixel_area: [R, 1].
    Returns:
        GaussiansStd with mean [R, S, 6, 3] and std [R, S, 6, 1].
    """
    # per-ray orthonormal basis perpendicular to the direction
    d = directions / jnp.linalg.norm(directions, axis=-1, keepdims=True).clip(1e-8)
    helper = jnp.where(jnp.abs(d[..., 2:3]) < 0.9, jnp.asarray([0.0, 0.0, 1.0]), jnp.asarray([1.0, 0.0, 0.0]))
    u = jnp.cross(helper, d)
    u = u / jnp.linalg.norm(u, axis=-1, keepdims=True).clip(1e-8)
    v = jnp.cross(d, u)

    j = jnp.arange(6, dtype=starts.dtype)
    t = starts + (ends - starts) * (2.0 * j + 1.0) / 12.0  # [R, S, 6] stratified
    # pixel radius growth per unit distance (disk of area pixel_area at t=1)
    r_dot = jnp.sqrt(pixel_area / jnp.pi)[:, None, :]  # [R, 1, 1]
    radius = r_dot * t  # [R, S, 6]
    theta = _HEX_ANGLES.astype(starts.dtype)
    if rotate_per_ray:
        # decorrelate neighboring rays (cf. ZipNeRF's per-ray rotation) with a
        # cheap hash of the origin — deterministic, no rng threading
        phase = jnp.sum(origins * jnp.asarray([12.9898, 78.233, 37.719]), axis=-1)
        theta = theta + (phase[:, None, None] % (2.0 * jnp.pi))
    offset = (radius / jnp.sqrt(2.0))[..., None] * (
        jnp.cos(theta)[..., None] * u[:, None, None, :] + jnp.sin(theta)[..., None] * v[:, None, None, :]
    )  # [R, S, 6, 3]
    mean = origins[:, None, None, :] + t[..., None] * d[:, None, None, :] + offset
    std = (radius / 2.0)[..., None]
    return GaussiansStd(mean=mean, std=std)


def chamfer_distance(
    pred: jax.Array,
    gt: jax.Array,
    pred_mask: Optional[jax.Array] = None,
    gt_mask: Optional[jax.Array] = None,
    squared: bool = False,
) -> jax.Array:
    """Bidirectional chamfer distance between two (masked, padded) point sets.

    Device-friendly brute-force pairwise-min (point counts are small in all
    call sites, cf. reference utils/math.py:745 which subsamples to 1000 and
    radar_utils.py:404 which uses a KD-tree over <=1e4 points).

    Args:
        pred: [N, 3], gt: [M, 3]. Masks are boolean validity (True = real).
    """
    if pred_mask is None:
        pred_mask = jnp.ones(pred.shape[:-1], dtype=bool)
    if gt_mask is None:
        gt_mask = jnp.ones(gt.shape[:-1], dtype=bool)
    d2 = jnp.sum((pred[:, None, :] - gt[None, :, :]) ** 2, axis=-1)  # [N, M]
    big = jnp.asarray(1e10, d2.dtype)
    d2_pg = jnp.where(gt_mask[None, :], d2, big)
    d2_gp = jnp.where(pred_mask[:, None], d2, big)
    min_p = jnp.min(d2_pg, axis=1)  # [N] distance from each pred to gt set
    min_g = jnp.min(d2_gp, axis=0)  # [M]
    if not squared:
        min_p = jnp.sqrt(jnp.maximum(min_p, 0.0))
        min_g = jnp.sqrt(jnp.maximum(min_g, 0.0))
    n_p = jnp.maximum(jnp.sum(pred_mask), 1)
    n_g = jnp.maximum(jnp.sum(gt_mask), 1)
    mean_p = jnp.sum(jnp.where(pred_mask, min_p, 0.0)) / n_p
    mean_g = jnp.sum(jnp.where(gt_mask, min_g, 0.0)) / n_g
    return mean_p + mean_g


def safe_normalize(x: jax.Array, axis: int = -1, eps: float = 1e-7) -> jax.Array:
    """Normalize vectors, guarding against zero norm."""
    return x / (jnp.linalg.norm(x, axis=axis, keepdims=True) + eps)


def normalize_with_norm(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> Tuple[jax.Array, jax.Array]:
    """Normalize and also return the norm (cf. camera_utils.normalize_with_norm)."""
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, eps), norm
