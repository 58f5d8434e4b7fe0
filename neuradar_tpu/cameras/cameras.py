"""Camera models and batched ray generation.

cf. reference nerfstudio/cameras/cameras.py (PERSPECTIVE and FISHEYE paths,
OpenCV-style undistortion, rolling-shutter compensation via per-row time
offsets and sensor velocities at :922-937). All ray generation here is a pure
vectorized function over [num_rays] pixel coordinates — it runs inside jit in
the train step or batched on host for eval.

Convention (same as the reference): camera looks down -z, x right, y up;
unit-plane coords are ((x+0.5-cx)/fx, -(y+0.5-cy)/fy).
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field as dataclass_field
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from neuradar_tpu.cameras.rays import RayBundle
from neuradar_tpu.utils.math import normalize_with_norm


class CameraType(enum.IntEnum):
    PERSPECTIVE = 1
    FISHEYE = 2
    EQUIRECTANGULAR = 3
    ORTHOPHOTO = 6


@struct.dataclass
class Cameras:
    """Batched camera intrinsics/extrinsics (pytree of [N, ...] arrays).

    metadata may carry 'sensor_idxs' [N, 1], 'velocities' [N, 3] and
    'rolling_shutter_offsets' [N, 2] (start/end row time offsets).
    """

    camera_to_worlds: jax.Array  # [N, 3, 4]
    fx: jax.Array  # [N, 1]
    fy: jax.Array  # [N, 1]
    cx: jax.Array  # [N, 1]
    cy: jax.Array  # [N, 1]
    width: jax.Array  # [N, 1] int
    height: jax.Array  # [N, 1] int
    camera_type: jax.Array  # [N, 1] int
    distortion_params: Optional[jax.Array] = None  # [N, 6] k1 k2 k3 k4 p1 p2
    times: Optional[jax.Array] = None  # [N, 1]
    metadata: Dict[str, jax.Array] = struct.field(default_factory=dict)

    @property
    def num_cameras(self) -> int:
        return self.camera_to_worlds.shape[0]

    def generate_rays(self, camera_indices: jax.Array, coords: jax.Array) -> RayBundle:
        """Generate rays for (camera, pixel) pairs.

        Args:
            camera_indices: [R] int camera index per ray.
            coords: [R, 2] (row, col) pixel indices.
        """
        return generate_camera_rays(self, camera_indices, coords)

    def image_coords(self, cam_idx: int) -> jax.Array:
        """Full-image [H*W, 2] (row, col) grid for a camera (static shapes)."""
        h = int(self.height[cam_idx, 0])
        w = int(self.width[cam_idx, 0])
        rows, cols = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
        return jnp.stack([rows.reshape(-1), cols.reshape(-1)], axis=-1)


def _undistort(coords: jax.Array, dist: jax.Array, num_iters: int = 3) -> jax.Array:
    """Iterative inverse of OpenCV radial(+tangential) distortion.

    cf. camera_utils.radial_and_tangential_undistort in the reference; fixed
    small iteration count keeps it jit-friendly.
    """
    k1, k2, k3, k4 = dist[..., 0:1], dist[..., 1:2], dist[..., 2:3], dist[..., 3:4]
    p1, p2 = dist[..., 4:5], dist[..., 5:6]
    xy = coords

    def distort(xy):
        x, y = xy[..., 0:1], xy[..., 1:2]
        r2 = x * x + y * y
        radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * (k3 + r2 * k4)))
        dx = x * radial + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
        dy = y * radial + 2 * p2 * x * y + p1 * (r2 + 2 * y * y)
        return jnp.concatenate([dx, dy], axis=-1)

    out = coords
    for _ in range(num_iters):
        out = out - (distort(out) - xy)
    return out


def _directions_from_coords(unit_coords: jax.Array, cam_type: jax.Array) -> jax.Array:
    """Per-camera-type direction in camera frame (z = -1 forward).

    cf. cameras.py:784-880: PERSPECTIVE uses (x, y, -1); FISHEYE equidistant
    with theta = |coord| and (coord * sin(theta)/theta, -cos(theta));
    EQUIRECTANGULAR maps coords to (azimuth, polar) angles; ORTHOPHOTO always
    points straight down -z (parallel rays).
    """
    x, y = unit_coords[..., 0], unit_coords[..., 1]
    persp = jnp.stack([x, y, -jnp.ones_like(x)], axis=-1)

    theta_f = jnp.clip(jnp.sqrt(x * x + y * y), 1e-9, jnp.pi)
    sin_over_theta = jnp.sin(theta_f) / theta_f
    fisheye = jnp.stack([x * sin_over_theta, y * sin_over_theta, -jnp.cos(theta_f)], axis=-1)

    # equirectangular: x in [-pi, pi] azimuth, y polar from equator
    theta_e = -jnp.pi * x
    phi_e = jnp.pi * (0.5 - (y * 0.5 + 0.5))
    equirect = jnp.stack(
        [-jnp.sin(theta_e) * jnp.sin(phi_e), jnp.cos(phi_e), -jnp.cos(theta_e) * jnp.sin(phi_e)], axis=-1
    )
    ortho = jnp.stack([jnp.zeros_like(x), jnp.zeros_like(x), -jnp.ones_like(x)], axis=-1)

    out = persp
    out = jnp.where((cam_type == CameraType.FISHEYE)[..., None], fisheye, out)
    out = jnp.where((cam_type == CameraType.EQUIRECTANGULAR)[..., None], equirect, out)
    out = jnp.where((cam_type == CameraType.ORTHOPHOTO)[..., None], ortho, out)
    return out


def generate_camera_rays(cameras: Cameras, camera_indices: jax.Array, coords: jax.Array) -> RayBundle:
    """Vectorized camera ray generation (jit-safe).

    Computes pixel_area from the direction deltas of +1-pixel neighbors in x
    and y, exactly like the reference's 3-coord stack (cameras.py:905-911).
    """
    idx = camera_indices.astype(jnp.int32)
    fx, fy = cameras.fx[idx], cameras.fy[idx]
    cx, cy = cameras.cx[idx], cameras.cy[idx]
    c2w = cameras.camera_to_worlds[idx]
    cam_type = cameras.camera_type[idx][..., 0]

    rows = coords[..., 0].astype(fx.dtype)[..., None]
    cols = coords[..., 1].astype(fx.dtype)[..., None]

    def unit_coords(r, c):
        u = (c + 0.5 - cx) / fx
        v = -(r + 0.5 - cy) / fy
        uv = jnp.concatenate([u, v], axis=-1)
        if cameras.distortion_params is not None:
            uv = _undistort(uv, cameras.distortion_params[idx])
        return uv

    dirs_cam = _directions_from_coords(unit_coords(rows, cols), cam_type)
    dirs_cam_dx = _directions_from_coords(unit_coords(rows, cols + 1), cam_type)
    dirs_cam_dy = _directions_from_coords(unit_coords(rows + 1, cols), cam_type)

    rot = c2w[..., :3, :3]
    to_world = lambda d: jnp.einsum("rij,rj->ri", rot, d)
    d0, n0 = normalize_with_norm(to_world(dirs_cam))
    d1, _ = normalize_with_norm(to_world(dirs_cam_dx))
    d2, _ = normalize_with_norm(to_world(dirs_cam_dy))

    dx = jnp.linalg.norm(d0 - d1, axis=-1)
    dy = jnp.linalg.norm(d0 - d2, axis=-1)
    pixel_area = (dx * dy)[..., None]

    origins = c2w[..., :3, 3]
    times = cameras.times[idx] if cameras.times is not None else None  # [R, 1]

    metadata = {k: v[idx] for k, v in cameras.metadata.items() if k not in ("rolling_shutter_offsets", "velocities")}
    metadata["directions_norm"] = jax.lax.stop_gradient(n0)

    # rolling shutter compensation (cf. cameras.py:922-937, TOP_TO_BOTTOM)
    if "rolling_shutter_offsets" in cameras.metadata and "velocities" in cameras.metadata:
        offsets = cameras.metadata["rolling_shutter_offsets"][idx]  # [R, 2]
        duration = offsets[..., 1:2] - offsets[..., 0:1]
        heights = cameras.height[idx].astype(rows.dtype)
        time_offsets = rows / heights * duration + offsets[..., 0:1]
        origins = origins + cameras.metadata["velocities"][idx] * time_offsets
        if times is not None:
            times = times + time_offsets

    return RayBundle(
        origins=origins,
        directions=d0,
        pixel_area=pixel_area,
        camera_indices=idx[..., None] if idx.ndim == 1 else idx,
        times=times,
        metadata=metadata,
        fars=jnp.full_like(pixel_area, 1e6),
    )
