"""3D pose algebra and trajectory interpolation (JAX).

Covers the reference's nerfstudio/utils/poses.py and the rotation conversions
from nerfstudio/cameras/camera_utils.py used by dynamic actors, redesigned for
dense static-shape computation: the 6D trajectory interpolation returns a
dense [num_queries, num_actors, ...] tensor plus a validity mask instead of
flattened index lists (TPU needs static shapes; cf. poses.py:90-149).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def to4x4(pose: jax.Array) -> jax.Array:
    """Convert [..., 3, 4] pose matrices to homogeneous [..., 4, 4]."""
    bottom = jnp.zeros_like(pose[..., :1, :])
    bottom = bottom.at[..., 0, 3].set(1.0)
    return jnp.concatenate([pose, bottom], axis=-2)


def inverse(pose: jax.Array) -> jax.Array:
    """Invert [..., 3, 4] rigid poses (cf. reference poses.py:42)."""
    R = pose[..., :3, :3]
    t = pose[..., :3, 3:]
    R_inv = jnp.swapaxes(R, -2, -1)
    t_inv = -R_inv @ t
    return jnp.concatenate([R_inv, t_inv], axis=-1)


def multiply(pose_a: jax.Array, pose_b: jax.Array) -> jax.Array:
    """Compose two [..., 3, 4] poses: A @ B (cf. reference poses.py:58)."""
    R1, t1 = pose_a[..., :3, :3], pose_a[..., :3, 3:]
    R2, t2 = pose_b[..., :3, :3], pose_b[..., :3, 3:]
    return jnp.concatenate([R1 @ R2, t1 + R1 @ t2], axis=-1)


def transform_points(points: jax.Array, pose: jax.Array) -> jax.Array:
    """Apply a single [3, 4] pose to [..., 3] points."""
    return points @ pose[:3, :3].T + pose[:3, 3]


def transform_points_pairwise(points: jax.Array, poses: jax.Array, with_translation: bool = True) -> jax.Array:
    """Apply [..., 3, 4] poses to matching [..., 3] points (pairwise).

    cf. reference cameras/lidars.py transform_points_pairwise.
    """
    rotated = jnp.einsum("...ij,...j->...i", poses[..., :3, :3], points)
    if with_translation:
        rotated = rotated + poses[..., :3, 3]
    return rotated


def rotation_6d_to_matrix(d6: jax.Array) -> jax.Array:
    """6D rotation representation -> rotation matrix via Gram-Schmidt.

    cf. reference cameras/camera_utils.py:422 (Zhou et al. 2019).
    """
    a1, a2 = d6[..., :3], d6[..., 3:]
    b1 = a1 / jnp.linalg.norm(a1, axis=-1, keepdims=True).clip(1e-12)
    b2 = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = b2 / jnp.linalg.norm(b2, axis=-1, keepdims=True).clip(1e-12)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def matrix_to_rotation_6d(matrix: jax.Array) -> jax.Array:
    """Rotation matrix -> 6D representation (first two rows)."""
    return matrix[..., :2, :].reshape(*matrix.shape[:-2], 6)


def interpolate_trajectories_6d(
    poses_9d: jax.Array,
    pose_times: jax.Array,
    query_times: jax.Array,
    pose_valid_mask: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Linearly interpolate 9D (6D rot + 3D pos) actor trajectories.

    Dense-output version of reference poses.py:90 (flatten=False branch):

    Args:
        poses_9d: [num_times, num_actors, 9].
        pose_times: [num_times] sorted timestamps.
        query_times: [num_queries] timestamps to interpolate at.
        pose_valid_mask: [num_times, num_actors] actor-present mask.

    Returns:
        interpolated [num_queries, num_actors, 9] and validity mask
        [num_queries, num_actors].
    """
    # Orthogonalize the two rotation axes before interpolating them
    a1 = poses_9d[..., :3]
    a1 = a1 / jnp.linalg.norm(a1, axis=-1, keepdims=True).clip(1e-12)
    a2 = poses_9d[..., 3:6]
    a2 = a2 - jnp.sum(a1 * a2, axis=-1, keepdims=True) * a1
    a2 = a2 / jnp.linalg.norm(a2, axis=-1, keepdims=True).clip(1e-12)
    poses = jnp.concatenate([a1, a2, poses_9d[..., 6:9]], axis=-1)

    right_idx = jnp.searchsorted(pose_times, query_times)
    left_idx = jnp.clip(right_idx - 1, 0, None)
    right_idx = jnp.clip(right_idx, None, pose_times.shape[0] - 1)

    left_time = pose_times[left_idx]
    right_time = pose_times[right_idx]
    frac = (query_times - left_time) / (right_time - left_time + 1e-6)
    frac = jnp.clip(frac, 0.0, 1.0)

    if pose_valid_mask is None:
        pose_valid_mask = jnp.ones(poses.shape[:2], dtype=bool)
    valid = pose_valid_mask[left_idx] | pose_valid_mask[right_idx]  # [Q, A]

    poses_left = poses[left_idx]  # [Q, A, 9]
    poses_right = poses[right_idx]
    interp = poses_left + (poses_right - poses_left) * frac[:, None, None]
    return interp, valid


def interpolate_poses_9d_to_matrices(poses_9d: jax.Array) -> jax.Array:
    """[..., 9] (6D rot + pos) -> [..., 3, 4] pose matrices."""
    rot = rotation_6d_to_matrix(poses_9d[..., :6])
    return jnp.concatenate([rot, poses_9d[..., 6:9, None]], axis=-1)


def exp_map_SO3xR3(tangent: jax.Array) -> jax.Array:
    """SO(3)xR3 exponential map: [..., 6] -> [..., 3, 4].

    First 3 components are translation, last 3 are so(3) log-rotation,
    cf. reference cameras/lie_groups.py:exp_map_SO3xR3.
    """
    log_rot = tangent[..., 3:]
    nrms = jnp.sum(log_rot**2, axis=-1)
    theta = jnp.sqrt(jnp.clip(nrms, 1e-12))
    fac1 = jnp.sin(theta) / theta
    fac2 = (1 - jnp.cos(theta)) / (theta**2)
    # Taylor fallback near zero
    small = nrms < 1e-8
    fac1 = jnp.where(small, 1.0 - nrms / 6.0, fac1)
    fac2 = jnp.where(small, 0.5 - nrms / 24.0, fac2)
    skews = skew_symmetric(log_rot)
    skews_sq = skews @ skews
    eye = jnp.broadcast_to(jnp.eye(3, dtype=tangent.dtype), skews.shape)
    R = eye + fac1[..., None, None] * skews + fac2[..., None, None] * skews_sq
    return jnp.concatenate([R, tangent[..., :3, None]], axis=-1)


def exp_map_SE3(tangent: jax.Array) -> jax.Array:
    """SE(3) exponential map: [..., 6] -> [..., 3, 4]."""
    log_rot = tangent[..., 3:]
    nrms = jnp.sum(log_rot**2, axis=-1)
    theta = jnp.sqrt(jnp.clip(nrms, 1e-12))
    fac1 = jnp.sin(theta) / theta
    fac2 = (1 - jnp.cos(theta)) / (theta**2)
    fac3 = (theta - jnp.sin(theta)) / (theta**3)
    small = nrms < 1e-8
    fac1 = jnp.where(small, 1.0 - nrms / 6.0, fac1)
    fac2 = jnp.where(small, 0.5 - nrms / 24.0, fac2)
    fac3 = jnp.where(small, 1.0 / 6.0 - nrms / 120.0, fac3)
    skews = skew_symmetric(log_rot)
    skews_sq = skews @ skews
    eye = jnp.broadcast_to(jnp.eye(3, dtype=tangent.dtype), skews.shape)
    R = eye + fac1[..., None, None] * skews + fac2[..., None, None] * skews_sq
    V = eye + fac2[..., None, None] * skews + fac3[..., None, None] * skews_sq
    t = jnp.einsum("...ij,...j->...i", V, tangent[..., :3])
    return jnp.concatenate([R, t[..., None]], axis=-1)


def matrix_to_quaternion(m: jax.Array) -> jax.Array:
    """Rotation matrix [..., 3, 3] -> unit quaternion [..., 4] (w, x, y, z).

    Branch-free Shepperd variant (cf. the reference's pytorch3d-style
    conversion in camera_utils): builds all four candidate quaternions and
    picks the numerically best by largest denominator — jit/vmap safe.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22
    # squared components (guaranteed >= 0 up to fp noise)
    qw2 = jnp.maximum(1.0 + tr, 0.0)
    qx2 = jnp.maximum(1.0 + m00 - m11 - m22, 0.0)
    qy2 = jnp.maximum(1.0 - m00 + m11 - m22, 0.0)
    qz2 = jnp.maximum(1.0 - m00 - m11 + m22, 0.0)
    cand = jnp.stack(
        [
            jnp.stack([qw2, m21 - m12, m02 - m20, m10 - m01], -1),
            jnp.stack([m21 - m12, qx2, m01 + m10, m02 + m20], -1),
            jnp.stack([m02 - m20, m01 + m10, qy2, m12 + m21], -1),
            jnp.stack([m10 - m01, m02 + m20, m12 + m21, qz2], -1),
        ],
        axis=-2,
    )  # [..., 4 candidates, 4]
    mags = jnp.stack([qw2, qx2, qy2, qz2], -1)
    best = jnp.argmax(mags, axis=-1)
    q = jnp.take_along_axis(cand, best[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    denom = 2.0 * jnp.sqrt(jnp.take_along_axis(mags, best[..., None], axis=-1).clip(1e-12))
    q = q / denom
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True).clip(1e-12)


def quaternion_to_matrix(q: jax.Array) -> jax.Array:
    """Unit quaternion [..., 4] (w, x, y, z) -> rotation matrix [..., 3, 3]."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True).clip(1e-12)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )


def quaternion_slerp(q0: jax.Array, q1: jax.Array, t: jax.Array) -> jax.Array:
    """Spherical linear interpolation between unit quaternions
    (cf. reference camera_utils.quaternion_slerp). Takes the short arc; falls
    back to normalized lerp when the quaternions are nearly parallel."""
    q0 = q0 / jnp.linalg.norm(q0, axis=-1, keepdims=True).clip(1e-12)
    q1 = q1 / jnp.linalg.norm(q1, axis=-1, keepdims=True).clip(1e-12)
    dot = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(dot < 0, -q1, q1)  # short arc
    dot = jnp.abs(dot).clip(-1.0, 1.0)
    theta = jnp.arccos(dot.clip(max=1.0 - 1e-7))
    sin_theta = jnp.sin(theta)
    t = jnp.asarray(t)[..., None] if jnp.ndim(t) == q0.ndim - 1 else jnp.asarray(t)
    w0 = jnp.sin((1.0 - t) * theta) / sin_theta
    w1 = jnp.sin(t * theta) / sin_theta
    nearly_parallel = dot > 1.0 - 1e-6
    out = jnp.where(nearly_parallel, (1.0 - t) * q0 + t * q1, w0 * q0 + w1 * q1)
    return out / jnp.linalg.norm(out, axis=-1, keepdims=True).clip(1e-12)


def skew_symmetric(v: jax.Array) -> jax.Array:
    """[..., 3] -> [..., 3, 3] skew-symmetric matrices."""
    zero = jnp.zeros_like(v[..., 0])
    rows = [
        jnp.stack([zero, -v[..., 2], v[..., 1]], axis=-1),
        jnp.stack([v[..., 2], zero, -v[..., 0]], axis=-1),
        jnp.stack([-v[..., 1], v[..., 0], zero], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def viewmatrix(lookat: jax.Array, up: jax.Array, pos: jax.Array) -> jax.Array:
    """[3, 4] c2w with columns (right, up, lookat, pos) — reference
    camera_utils.viewmatrix:613-629 (note: the reference's convention puts
    the LOOK direction in column 2, i.e. the camera looks down +z here;
    get_spiral_path compensates with a -z target)."""

    def _norm(v):
        return v / jnp.linalg.norm(v).clip(1e-12)

    vec2 = _norm(lookat)
    vec1_avg = _norm(up)
    vec0 = _norm(jnp.cross(vec1_avg, vec2))
    vec1 = _norm(jnp.cross(vec2, vec0))
    return jnp.stack([vec0, vec1, vec2, pos], axis=1)


def get_spiral_path(
    c2w: jax.Array,
    steps: int = 30,
    radius: float = 0.1,
    rots: int = 2,
    zrate: float = 0.5,
    focal: float = 100.0,
) -> jax.Array:
    """[steps, 3, 4] spiral of poses around a seed camera pose (reference
    camera_paths.get_spiral_path:107-168: local spiral centers
    (cos t, -sin t, -sin(t*zrate)) * radius looking at (0, 0, -focal),
    composed with the global seed pose)."""
    c2w = jnp.asarray(c2w, jnp.float32)
    up = c2w[:3, 2]
    target = jnp.asarray([0.0, 0.0, -focal])
    thetas = jnp.linspace(0.0, 2.0 * jnp.pi * rots, steps + 1)[:-1]

    g = to4x4(c2w)
    poses = []
    for theta in thetas:
        center = jnp.asarray([jnp.cos(theta), -jnp.sin(theta), -jnp.sin(theta * zrate)]) * radius
        local = to4x4(viewmatrix(center - target, up, center))
        poses.append((g @ local)[:3, :4])
    return jnp.stack(poses)
