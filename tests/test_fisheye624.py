"""FISHEYE624 camera model: forward/inverse round trip and ray generation
(cf. the reference's fisheye624 support in nerfstudio cameras)."""

import jax.numpy as jnp
import numpy as np

from neuradar_tpu.cameras.cameras import (
    Cameras,
    CameraType,
    _undistort_fisheye624,
    fisheye624_distort,
)

# plausible wide-FoV params: [k1..k6, p1, p2, s1..s4]
DIST = np.array([0.35, -0.12, 0.03, -0.004, 0.0005, -0.00002,
                 1e-3, -8e-4, 5e-4, -2e-4, 3e-4, -1e-4], np.float32)


def test_newton_inverts_forward():
    rng = np.random.RandomState(0)
    w = rng.uniform(-1.0, 1.0, size=(256, 2)).astype(np.float32)  # theta up to ~1.4 rad
    dist = jnp.broadcast_to(jnp.asarray(DIST), (256, 12))
    m = fisheye624_distort(jnp.asarray(w), dist)
    w_rec = _undistort_fisheye624(m, dist)
    np.testing.assert_allclose(np.asarray(w_rec), w, atol=1e-5)


def test_fisheye624_ray_generation():
    """Project a known direction to pixels by the forward model, regenerate
    the ray, and require the same direction back."""
    fx = fy = 120.0
    cx = cy = 100.0
    # ground-truth camera-frame dir (our convention: -z forward, y up)
    d_gt = np.array([0.35, 0.25, -0.9], np.float32)
    d_gt /= np.linalg.norm(d_gt)
    # equidistant projection in OpenCV frame (y down, z forward): theta*(x,y)/r
    x_cv, y_cv, z_cv = d_gt[0], -d_gt[1], -d_gt[2]
    r = np.hypot(x_cv, y_cv)
    theta = np.arctan2(r, z_cv)
    w = theta * np.array([x_cv, y_cv]) / r
    m = np.asarray(fisheye624_distort(jnp.asarray(w[None]), jnp.asarray(DIST)[None]))[0]
    col = m[0] * fx + cx - 0.5
    row = m[1] * fy + cy - 0.5

    cams = Cameras(
        camera_to_worlds=jnp.eye(3, 4)[None],
        fx=jnp.full((1, 1), fx), fy=jnp.full((1, 1), fy),
        cx=jnp.full((1, 1), cx), cy=jnp.full((1, 1), cy),
        width=jnp.full((1, 1), 200, jnp.int32), height=jnp.full((1, 1), 200, jnp.int32),
        camera_type=jnp.full((1, 1), int(CameraType.FISHEYE624), jnp.int32),
        distortion_params=jnp.asarray(DIST)[None],
    )
    rb = cams.generate_rays(jnp.zeros((1,), jnp.int32), jnp.asarray([[row, col]], jnp.float32))
    np.testing.assert_allclose(np.asarray(rb.directions[0]), d_gt, atol=1e-4)


def test_perspective_unaffected_by_624_params():
    """A perspective camera in the same batch ignores the fisheye624 path."""
    base = dict(
        camera_to_worlds=jnp.eye(3, 4)[None],
        fx=jnp.full((1, 1), 100.0), fy=jnp.full((1, 1), 100.0),
        cx=jnp.full((1, 1), 50.0), cy=jnp.full((1, 1), 50.0),
        width=jnp.full((1, 1), 100, jnp.int32), height=jnp.full((1, 1), 100, jnp.int32),
        camera_type=jnp.full((1, 1), int(CameraType.PERSPECTIVE), jnp.int32),
    )
    zeros6 = jnp.zeros((1, 6))
    zeros12 = jnp.zeros((1, 12))
    coords = jnp.asarray([[30.0, 70.0]])
    idx = jnp.zeros((1,), jnp.int32)
    d6 = Cameras(**base, distortion_params=zeros6).generate_rays(idx, coords).directions
    d12 = Cameras(**base, distortion_params=zeros12).generate_rays(idx, coords).directions
    np.testing.assert_allclose(np.asarray(d6), np.asarray(d12), atol=1e-6)
