"""Lidar sensors: rays from measured points.

cf. reference nerfstudio/cameras/lidars.py (_generate_rays_from_points,
:355-420): origin = sensor pose translation (offset by per-point time x
ego velocity), direction = normalized vector to the world point, the measured
distance rides in metadata['directions_norm'], did_return = distance below a
threshold (non-return points are synthesized at a dummy far distance by the
dataparser), beam divergence sets pixel_area.

Point format (cf. lidars.py docstring): x, y, z, intensity, time, channel.
"""

from __future__ import annotations

import enum
from typing import Dict, Optional

import jax
import jax.numpy as jnp
from flax import struct

from neuradar_tpu.cameras.rays import RayBundle
from neuradar_tpu.utils.math import normalize_with_norm
from neuradar_tpu.utils.poses import transform_points_pairwise

HORIZONTAL_BEAM_DIVERGENCE = 3.0e-3  # radians (cf. lidars.py:41)
VERTICAL_BEAM_DIVERGENCE = 1.5e-3  # radians (cf. lidars.py:42)
VALID_LIDAR_DISTANCE_THRESHOLD = 1e3  # meters (cf. lidars.py:107)


class LidarType(enum.IntEnum):
    VELODYNE16 = 1
    VELODYNE32 = 2
    VELODYNE64E = 3
    VELODYNE128 = 4
    PANDAR64 = 5
    WOD64 = 6
    HDL32 = 7


@struct.dataclass
class Lidars:
    """Batched lidar extrinsics (pytree of [N, ...] arrays)."""

    lidar_to_worlds: jax.Array  # [N, 3, 4]
    lidar_type: jax.Array  # [N, 1] int
    times: Optional[jax.Array] = None  # [N, 1]
    metadata: Dict[str, jax.Array] = struct.field(default_factory=dict)
    horizontal_beam_divergence: float = struct.field(pytree_node=False, default=HORIZONTAL_BEAM_DIVERGENCE)
    vertical_beam_divergence: float = struct.field(pytree_node=False, default=VERTICAL_BEAM_DIVERGENCE)
    valid_lidar_distance_threshold: float = struct.field(pytree_node=False, default=VALID_LIDAR_DISTANCE_THRESHOLD)
    assume_ego_compensated: bool = struct.field(pytree_node=False, default=True)

    @property
    def num_lidars(self) -> int:
        return self.lidar_to_worlds.shape[0]

    def generate_rays(self, lidar_indices: jax.Array, points: jax.Array) -> RayBundle:
        """Rays from measured points.

        Args:
            lidar_indices: [R] scan index per point.
            points: [R, >=3] points in sensor frame (x,y,z,intensity,time,...).
        """
        idx = lidar_indices.astype(jnp.int32)
        l2w = self.lidar_to_worlds[idx]
        points_world = transform_points_pairwise(points[..., :3], l2w)
        origins = l2w[..., :3, 3]

        has_time = points.shape[-1] >= 5
        if has_time and "velocities" in self.metadata:
            vel = self.metadata["velocities"][idx]
            origins = origins + points[..., 4:5] * vel
            if not self.assume_ego_compensated:
                points_world = points_world + points[..., 4:5] * vel

        directions, distance = normalize_with_norm(points_world - origins)
        pixel_area = jnp.full_like(distance, self.horizontal_beam_divergence * self.vertical_beam_divergence)

        metadata = {k: v[idx] for k, v in self.metadata.items() if k != "velocities"}
        metadata["directions_norm"] = jax.lax.stop_gradient(distance)
        metadata["is_lidar"] = jnp.ones_like(distance, dtype=bool)
        metadata["did_return"] = jax.lax.stop_gradient(distance) < self.valid_lidar_distance_threshold

        times = self.times[idx] if self.times is not None else jnp.zeros_like(distance)
        if has_time:
            times = times + points[..., 4:5]

        return RayBundle(
            origins=origins,
            directions=directions,
            pixel_area=pixel_area,
            camera_indices=idx[..., None],
            times=times,
            metadata=metadata,
            fars=jnp.full_like(pixel_area, 1e6),
        )
