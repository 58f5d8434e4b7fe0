"""Random orbit-camera sampling for generative (SDS) training.

TPU-native equivalent of the reference's RandomCamerasDataManager pose
sampler (reference nerfstudio/data/datamanagers/random_cameras_datamanager.py:65-151):
cameras on a jittered sphere around a center, vertical rotation sampled
area-uniformly on the spherical cap (arccos(1 - 2u)), random focal length,
all facing the center. Functional and rng-keyed rather than stateful —
one jitted call returns a batch of Cameras plus the (vertical, central)
angles the DreamFusion positional prompting consumes
(generative.diffusion.PositionalEmbeddings).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Tuple

import jax
import jax.numpy as jnp

from neuradar_tpu.cameras.cameras import Cameras, CameraType


@dataclass(frozen=True)
class RandomCamerasConfig:
    """cf. reference RandomCamerasDataManagerConfig (:155-186)."""

    resolution: int = 64
    radius_mean: float = 2.5
    radius_std: float = 0.1
    center: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    vertical_rotation_range: Tuple[float, float] = (-90.0, 0.0)
    central_rotation_range: Tuple[float, float] = (0.0, 360.0)
    focal_range: Tuple[float, float] = (0.75, 1.35)
    jitter_std: float = 0.01


def random_train_pose(
    rng: jax.Array, size: int, cfg: RandomCamerasConfig = RandomCamerasConfig()
) -> Tuple[Cameras, jax.Array, jax.Array]:
    """Sample `size` orbit cameras looking at cfg.center.

    Matches reference random_train_pose (:65-151): vertical rotation is
    drawn area-uniformly over the requested cap (the arccos(1-2u) inverse
    CDF over [range+90]/180), central rotation uniformly; camera origin is
    R @ [0, 0, radius] + jitter + center with R = Rz(central) @ Rx(vertical),
    which leaves the -z camera axis pointing at the center. Returns
    (cameras, vertical_deg, central_deg) — the angles feed
    PositionalEmbeddings exactly as the reference returns them.
    """
    kv, kc, kr, kj, kf = jax.random.split(rng, 5)

    v_lo, v_hi = (cfg.vertical_rotation_range[0] + 90.0) / 180.0, (cfg.vertical_rotation_range[1] + 90.0) / 180.0
    u = jax.random.uniform(kv, (size,), minval=v_lo, maxval=v_hi)
    vertical = jnp.arccos(1.0 - 2.0 * u)
    central = jnp.deg2rad(
        jax.random.uniform(
            kc, (size,), minval=cfg.central_rotation_range[0], maxval=cfg.central_rotation_range[1]
        )
    )

    c_cos, c_sin = jnp.cos(central), jnp.sin(central)
    v_cos, v_sin = jnp.cos(vertical), jnp.sin(vertical)
    zeros, ones = jnp.zeros_like(central), jnp.ones_like(central)

    rot_z = jnp.stack(
        [
            jnp.stack([c_cos, -c_sin, zeros], -1),
            jnp.stack([c_sin, c_cos, zeros], -1),
            jnp.stack([zeros, zeros, ones], -1),
        ],
        -2,
    )
    rot_x = jnp.stack(
        [
            jnp.stack([ones, zeros, zeros], -1),
            jnp.stack([zeros, v_cos, -v_sin], -1),
            jnp.stack([zeros, v_sin, v_cos], -1),
        ],
        -2,
    )
    R = rot_z @ rot_x  # [size, 3, 3]

    # origin on +z at a jittered radius; the reference jitters radius with a
    # per-COMPONENT normal on the [0,0,1] vector (:132), which is radius
    # noise only since x=y=0 — written here as scalar radius noise.
    radius = cfg.radius_mean + jax.random.normal(kr, (size,)) * cfg.radius_std
    origins = jnp.stack([jnp.zeros_like(radius), jnp.zeros_like(radius), radius], -1)
    t = (
        (R @ origins[..., None])
        + jax.random.normal(kj, (size, 3, 1)) * cfg.jitter_std
        + jnp.asarray(cfg.center)[None, :, None]
    )
    c2w = jnp.concatenate([R, t], axis=-1)  # [size, 3, 4]

    focals = jax.random.uniform(kf, (size, 1), minval=cfg.focal_range[0], maxval=cfg.focal_range[1])
    res = float(cfg.resolution)
    cameras = Cameras(
        camera_to_worlds=c2w,
        fx=focals * res,
        fy=focals * res,
        cx=jnp.full((size, 1), res / 2.0),
        cy=jnp.full((size, 1), res / 2.0),
        width=jnp.full((size, 1), cfg.resolution, jnp.int32),
        height=jnp.full((size, 1), cfg.resolution, jnp.int32),
        camera_type=jnp.full((size, 1), int(CameraType.PERSPECTIVE), jnp.int32),
    )
    return cameras, jnp.rad2deg(vertical), jnp.rad2deg(central)
