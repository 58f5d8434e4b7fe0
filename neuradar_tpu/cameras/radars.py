"""Radar sensors: rays on a fixed azimuth x elevation FoV grid per scan.

cf. reference nerfstudio/cameras/radars.py (:268-358): unlike lidar, radar
rays do NOT come from measured points — each scan shoots a dense spherical
grid (arange over [min, max] azimuth/elevation at the ray-divergence step),
converted to cartesian in the radar frame and rotated to world. The grid is
static per sensor type (ZOD front radar: az [-0.80, 0.80], el [-0.08, 0.40]
@ 0.015 rad -> 107 x 33 = 3531 rays under torch.arange semantics — see
fov_grid; VoD: az [-1, 1], el [-0.39, 0.49] @ 0.02 -> 100 x 44 = 4400),
which is exactly what a TPU wants: a fixed [n_scans, rays_per_scan] token
layout.
"""

from __future__ import annotations

import enum
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from neuradar_tpu.cameras.rays import RayBundle
from neuradar_tpu.utils.poses import transform_points_pairwise

RADAR_AZIMUTH_RAY_DIVERGENCE = 0.015  # radians
RADAR_ELEVATION_RAY_DIVERGENCE = 0.015


class RadarType(enum.IntEnum):
    ZFFRGEN214D = 1
    ContiARS40821 = 2
    ContiFLR2 = 3


def fov_grid(
    min_azimuth: float,
    max_azimuth: float,
    min_elevation: float,
    max_elevation: float,
    azimuth_step: float,
    elevation_step: float,
) -> np.ndarray:
    """Static (azimuth, elevation) grid for one radar FoV: [n_rays, 2].

    cf. radars.py:278-294 (torch.arange + meshgrid ij, flattened az-major).
    Counts follow torch.arange EXACTLY: size = ceil((stop - start) / step)
    computed in float64. For ZOD's elevation span this INCLUDES a 33rd row at
    -0.08 + 32*0.015 = 0.3999999999999999 < 0.4 — the executed reference
    generates 107 x 33 = 3531 rays/scan, not the 107 x 32 = 3424 a tolerant
    rounding gives (found by tests/test_reference_parity.py).
    """
    n_az = int(np.ceil((np.float64(max_azimuth) - np.float64(min_azimuth)) / np.float64(azimuth_step)))
    n_el = int(np.ceil((np.float64(max_elevation) - np.float64(min_elevation)) / np.float64(elevation_step)))
    azimuths = (min_azimuth + np.arange(n_az) * azimuth_step).astype(np.float32)
    elevations = (min_elevation + np.arange(n_el) * elevation_step).astype(np.float32)
    az, el = np.meshgrid(azimuths, elevations, indexing="ij")
    return np.stack([az.reshape(-1), el.reshape(-1)], axis=1)


@struct.dataclass
class Radars:
    """Batched radar extrinsics + FoV spec (pytree of [N, ...] arrays).

    The FoV spec must be identical across scans of a sensor so the per-scan
    ray count is static; fov_directions holds the shared [rays_per_scan, 2]
    spherical grid.
    """

    radar_to_worlds: jax.Array  # [N, 3, 4]
    radar_type: jax.Array  # [N, 1] int
    fov_directions: jax.Array  # [rays_per_scan, 2] (azimuth, elevation)
    times: Optional[jax.Array] = None  # [N, 1]
    metadata: Dict[str, jax.Array] = struct.field(default_factory=dict)
    azimuth_ray_divergence: float = struct.field(pytree_node=False, default=RADAR_AZIMUTH_RAY_DIVERGENCE)
    elevation_ray_divergence: float = struct.field(pytree_node=False, default=RADAR_ELEVATION_RAY_DIVERGENCE)

    @property
    def num_radars(self) -> int:
        return self.radar_to_worlds.shape[0]

    @property
    def rays_per_scan(self) -> int:
        return self.fov_directions.shape[0]

    def generate_rays(self, scan_indices: jax.Array) -> RayBundle:
        """Rays for whole scans, flattened [n_scans * rays_per_scan].

        cf. _generate_rays_from_fov (radars.py:268-358). pixel_area uses the
        (divergence / 5)^2 heuristic from :324-329; metadata carries
        directions_spher for the radar decoder's positional grounding.
        """
        scan_indices = scan_indices.astype(jnp.int32)
        n_scans = scan_indices.shape[0]
        nr = self.rays_per_scan

        ray_scan_idx = jnp.repeat(scan_indices, nr)  # [n_scans * nr]
        spher = jnp.tile(self.fov_directions, (n_scans, 1))  # [N*nr, 2]

        r2w = self.radar_to_worlds[ray_scan_idx]
        origins = r2w[..., :3, 3]

        az, el = spher[:, 0], spher[:, 1]
        dirs_local = jnp.stack(
            [jnp.cos(el) * jnp.cos(az), jnp.cos(el) * jnp.sin(az), jnp.sin(el)], axis=-1
        )
        # rotate-only transform: exact unit directions (adding and then
        # subtracting the world translation loses precision at large offsets)
        directions = transform_points_pairwise(dirs_local, r2w, with_translation=False)
        distance = jnp.ones((directions.shape[0], 1), directions.dtype)

        dx = self.azimuth_ray_divergence / 5.0
        dy = self.elevation_ray_divergence / 5.0
        pixel_area = jnp.full((directions.shape[0], 1), dx * dy, directions.dtype)

        metadata = {k: v[ray_scan_idx] for k, v in self.metadata.items()}
        metadata["directions_norm"] = jax.lax.stop_gradient(distance)
        metadata["directions_spher"] = spher
        metadata["did_return"] = jnp.ones_like(distance, dtype=bool)
        metadata["is_radar"] = jnp.ones_like(distance, dtype=bool)

        times = self.times[ray_scan_idx] if self.times is not None else None

        return RayBundle(
            origins=origins,
            directions=directions,
            pixel_area=pixel_area,
            camera_indices=ray_scan_idx[..., None],
            times=times,
            metadata=metadata,
            fars=jnp.full_like(pixel_area, 1e6),
        )


# Per-dataset FoV presets (cf. zod_dataparser.py:138-140, vod_dataparser.py:47-49)
ZOD_RADAR_FOV = dict(
    min_azimuth=-0.80, max_azimuth=0.80, min_elevation=-0.08, max_elevation=0.40,
    azimuth_step=0.015, elevation_step=0.015,
)
VOD_RADAR_FOV = dict(
    min_azimuth=-1.0, max_azimuth=1.0, min_elevation=-0.39, max_elevation=0.49,
    azimuth_step=0.02, elevation_step=0.02,
)
