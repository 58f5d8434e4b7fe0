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
    # render-only stereo types (cf. reference cameras.py:47-50): equirect
    # directions with per-eye ray origins on the interocular circle/axis
    OMNIDIRECTIONALSTEREO_L = 4
    OMNIDIRECTIONALSTEREO_R = 5
    ORTHOPHOTO = 6
    FISHEYE624 = 7
    VR180_L = 8
    VR180_R = 9


VR_IPD = 0.064  # interpupillary distance in meters (reference cameras.py:712)


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


def _undistort(coords: jax.Array, dist: jax.Array, num_iters: int = 5) -> jax.Array:
    """Newton inverse of OpenCV radial(+tangential) distortion.

    cf. camera_utils.radial_and_tangential_undistort in the reference (a
    Newton solve with the analytic Jacobian). A plain fixed-point iteration
    is inaccurate (~1e-2 unit-plane error at k1=-0.05) and can diverge at
    fisheye-strength distortion; the 2x2 Newton below converges at ZOD's
    real calibration coefficients. Jacobian columns via jvp — no per-ray
    autodiff graphs, jit-friendly (same scheme as _undistort_fisheye624).
    """
    k1, k2, k3, k4 = dist[..., 0:1], dist[..., 1:2], dist[..., 2:3], dist[..., 3:4]
    p1, p2 = dist[..., 4:5], dist[..., 5:6]

    def distort(xy):
        x, y = xy[..., 0:1], xy[..., 1:2]
        r2 = x * x + y * y
        radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * (k3 + r2 * k4)))
        dx = x * radial + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
        dy = y * radial + 2 * p2 * x * y + p1 * (r2 + 2 * y * y)
        return jnp.concatenate([dx, dy], axis=-1)

    f = lambda w: distort(w) - coords
    e1 = jnp.broadcast_to(jnp.asarray([1.0, 0.0], coords.dtype), coords.shape)
    e2 = jnp.broadcast_to(jnp.asarray([0.0, 1.0], coords.dtype), coords.shape)
    w = coords
    for _ in range(num_iters):
        r, j1 = jax.jvp(f, (w,), (e1,))
        _, j2 = jax.jvp(f, (w,), (e2,))
        det = j1[..., 0] * j2[..., 1] - j2[..., 0] * j1[..., 1]
        det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
        dx = (r[..., 0] * j2[..., 1] - r[..., 1] * j2[..., 0]) / det
        dy = (j1[..., 0] * r[..., 1] - j1[..., 1] * r[..., 0]) / det
        w = w - jnp.stack([dx, dy], axis=-1)
    return w


def fisheye624_distort(w: jax.Array, dist: jax.Array) -> jax.Array:
    """Forward FISHEYE624 distortion on equidistant-projected coords.

    cf. the reference's fisheye624 path (nerfstudio cameras.py FISHEYE624 /
    camera_utils.fisheye624_project): w = theta * (x, y)/r is the ideal
    equidistant projection (OpenCV frame, y down); dist packs
    [k1..k6, p1, p2, s1..s4]. Radial polynomial acts on theta, tangential and
    thin-prism terms on the radially-distorted coords.
    """
    k = [dist[..., i] for i in range(6)]
    p1, p2 = dist[..., 6], dist[..., 7]
    s1, s2, s3, s4 = dist[..., 8], dist[..., 9], dist[..., 10], dist[..., 11]
    wx, wy = w[..., 0], w[..., 1]
    th2 = wx * wx + wy * wy
    poly = 1.0 + th2 * (k[0] + th2 * (k[1] + th2 * (k[2] + th2 * (k[3] + th2 * (k[4] + th2 * k[5])))))
    ur, vr = wx * poly, wy * poly
    r2 = ur * ur + vr * vr
    u = ur + 2.0 * p1 * ur * vr + p2 * (r2 + 2.0 * ur * ur) + s1 * r2 + s2 * r2 * r2
    v = vr + p1 * (r2 + 2.0 * vr * vr) + 2.0 * p2 * ur * vr + s3 * r2 + s4 * r2 * r2
    return jnp.stack([u, v], axis=-1)


def _undistort_fisheye624(m: jax.Array, dist: jax.Array, num_iters: int = 8) -> jax.Array:
    """Invert fisheye624_distort with a fixed-iteration 2x2 Newton solve
    (jvp-built Jacobian columns — no per-ray autodiff graphs, jit-friendly).
    """
    f = lambda w: fisheye624_distort(w, dist) - m
    e1 = jnp.broadcast_to(jnp.asarray([1.0, 0.0], m.dtype), m.shape)
    e2 = jnp.broadcast_to(jnp.asarray([0.0, 1.0], m.dtype), m.shape)
    w = m
    for _ in range(num_iters):
        r, j1 = jax.jvp(f, (w,), (e1,))  # column d f / d wx
        _, j2 = jax.jvp(f, (w,), (e2,))  # column d f / d wy
        det = j1[..., 0] * j2[..., 1] - j2[..., 0] * j1[..., 1]
        det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
        dx = (r[..., 0] * j2[..., 1] - r[..., 1] * j2[..., 0]) / det
        dy = (j1[..., 0] * r[..., 1] - j1[..., 1] * r[..., 0]) / det
        w = w - jnp.stack([dx, dy], axis=-1)
    return w


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

    # equirectangular (cf. cameras.py:806-818): x in [-1, 1] -> azimuth,
    # y in [-1/2, 1/2] (already OpenGL-flipped) -> polar phi in [0, pi]
    theta_e = -jnp.pi * x
    phi_e = jnp.pi * (0.5 - y)
    equirect = jnp.stack(
        [-jnp.sin(theta_e) * jnp.sin(phi_e), jnp.cos(phi_e), -jnp.cos(theta_e) * jnp.sin(phi_e)], axis=-1
    )
    ortho = jnp.stack([jnp.zeros_like(x), jnp.zeros_like(x), -jnp.ones_like(x)], axis=-1)

    # VR180 (cf. cameras.py:736-741): equirect with azimuth range halved to
    # +-90 deg; the stereo eye offset is applied to the ORIGINS in
    # generate_camera_rays (_stereo_origin_offsets)
    theta_v = -jnp.pi * x / 2
    vr180 = jnp.stack(
        [-jnp.sin(theta_v) * jnp.sin(phi_e), jnp.cos(phi_e), -jnp.cos(theta_v) * jnp.sin(phi_e)], axis=-1
    )

    is_ods = (cam_type == CameraType.OMNIDIRECTIONALSTEREO_L) | (
        cam_type == CameraType.OMNIDIRECTIONALSTEREO_R
    )
    is_vr180 = (cam_type == CameraType.VR180_L) | (cam_type == CameraType.VR180_R)

    out = persp
    out = jnp.where((cam_type == CameraType.FISHEYE)[..., None], fisheye, out)
    out = jnp.where(((cam_type == CameraType.EQUIRECTANGULAR) | is_ods)[..., None], equirect, out)
    out = jnp.where(is_vr180[..., None], vr180, out)
    out = jnp.where((cam_type == CameraType.ORTHOPHOTO)[..., None], ortho, out)
    return out


def _stereo_origin_offsets(unit_x: jax.Array, cam_type: jax.Array, rot: jax.Array) -> jax.Array:
    """World-frame per-ray origin offsets for the stereo camera types.

    cf. reference cameras.py:699-718 (_compute_rays_for_omnidirectional_
    stereo) and :742-758 (_compute_rays_for_vr180): the eye sits
    +-VR_IPD/2 from the mount — for ODS on the interocular CIRCLE rotating
    with azimuth (camera-frame [cos(theta), 0, -sin(theta)]), for VR180 on
    the fixed interocular x-axis. Returns [R, 3] world offsets (zero for
    non-stereo types).
    """
    eye = jnp.zeros_like(unit_x)
    eye = jnp.where(cam_type == CameraType.OMNIDIRECTIONALSTEREO_L, -1.0, eye)
    eye = jnp.where(cam_type == CameraType.OMNIDIRECTIONALSTEREO_R, 1.0, eye)
    eye_vr = jnp.zeros_like(unit_x)
    eye_vr = jnp.where(cam_type == CameraType.VR180_L, -1.0, eye_vr)
    eye_vr = jnp.where(cam_type == CameraType.VR180_R, 1.0, eye_vr)

    theta = -jnp.pi * unit_x  # ODS azimuth, cf. ods_theta (cameras.py:700)
    half = VR_IPD / 2.0
    off_cam = jnp.stack(
        [
            eye * half * jnp.cos(theta) + eye_vr * half,
            jnp.zeros_like(unit_x),
            -eye * half * jnp.sin(theta),
        ],
        axis=-1,
    )
    return jnp.einsum("rij,rj->ri", rot, off_cam)


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

    dist = cameras.distortion_params[idx] if cameras.distortion_params is not None else None
    has_624 = dist is not None and dist.shape[-1] >= 12

    def dirs_for(r, c):
        u = (c + 0.5 - cx) / fx
        v_cv = (r + 0.5 - cy) / fy  # OpenCV frame (y down)
        uv = jnp.concatenate([u, -v_cv], axis=-1)
        if dist is not None:
            # fisheye624 packs [k1..k6, p1, p2, s1..s4]; the standard path
            # reads its k1..k4/p1/p2 slots so mixed batches stay well-defined
            std = jnp.concatenate([dist[..., 0:4], dist[..., 6:8]], -1) if has_624 else dist
            uv = _undistort(uv, std)
        d = _directions_from_coords(uv, cam_type)
        if has_624:
            w = _undistort_fisheye624(jnp.concatenate([u, v_cv], axis=-1), dist)
            th = jnp.clip(jnp.linalg.norm(w, axis=-1), 1e-9, jnp.pi)
            sot = jnp.sin(th) / th
            d624 = jnp.stack([w[..., 0] * sot, -w[..., 1] * sot, -jnp.cos(th)], axis=-1)
            d = jnp.where((cam_type == CameraType.FISHEYE624)[..., None], d624, d)
        return d

    dirs_cam = dirs_for(rows, cols)
    dirs_cam_dx = dirs_for(rows, cols + 1)
    dirs_cam_dy = dirs_for(rows + 1, cols)

    rot = c2w[..., :3, :3]
    to_world = lambda d: jnp.einsum("rij,rj->ri", rot, d)
    d0, n0 = normalize_with_norm(to_world(dirs_cam))
    d1, _ = normalize_with_norm(to_world(dirs_cam_dx))
    d2, _ = normalize_with_norm(to_world(dirs_cam_dy))

    dx = jnp.linalg.norm(d0 - d1, axis=-1)
    dy = jnp.linalg.norm(d0 - d2, axis=-1)
    pixel_area = (dx * dy)[..., None]

    origins = c2w[..., :3, 3]
    # stereo render types (ODS / VR180): per-eye, per-azimuth origin offsets
    unit_x = ((cols + 0.5 - cx) / fx)[..., 0]
    origins = origins + _stereo_origin_offsets(unit_x, cam_type, rot)
    times = cameras.times[idx] if cameras.times is not None else None  # [R, 1]

    metadata = {k: v[idx] for k, v in cameras.metadata.items()
                if k not in ("rolling_shutter_offsets", "velocities", "rs_horizontal")}
    metadata["directions_norm"] = jax.lax.stop_gradient(n0)

    # rolling shutter compensation (cf. cameras.py:922-937): row-wise
    # TOP_TO_BOTTOM (pandaset) by default; cameras flagged `rs_horizontal`
    # read out column-wise (WOD LEFT_TO_RIGHT/RIGHT_TO_LEFT — the
    # reference's rs_direction == "Horizontal" branch). The reference
    # computes row/height (col/width) from PIXEL-CENTER coords (callers go
    # through get_image_coords' +0.5 offset), so the center offset belongs
    # here too — executed-reference parity (test_reference_parity.py
    # test_rolling_shutter) caught the raw-row variant drifting by
    # velocity * 0.5/height * duration.
    if "rolling_shutter_offsets" in cameras.metadata and "velocities" in cameras.metadata:
        offsets = cameras.metadata["rolling_shutter_offsets"][idx]  # [R, 2]
        duration = offsets[..., 1:2] - offsets[..., 0:1]
        heights = cameras.height[idx].astype(rows.dtype)
        frac = (rows + 0.5) / heights
        if "rs_horizontal" in cameras.metadata:
            widths = cameras.width[idx].astype(cols.dtype)
            frac = jnp.where(cameras.metadata["rs_horizontal"][idx], (cols + 0.5) / widths, frac)
        time_offsets = frac * duration + offsets[..., 0:1]
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
