"""Sensor ray-generation tests (cf. reference tests/cameras/test_cameras.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from neuradar_tpu.cameras.cameras import Cameras, CameraType, generate_camera_rays
from neuradar_tpu.cameras.lidars import Lidars
from neuradar_tpu.cameras.radars import Radars, ZOD_RADAR_FOV, fov_grid


def make_cameras(n=2, H=48, W=64, cam_type=CameraType.PERSPECTIVE):
    c2w = np.tile(np.eye(3, 4, dtype=np.float32), (n, 1, 1))
    c2w[:, 0, 3] = np.arange(n)  # shift x
    return Cameras(
        camera_to_worlds=jnp.asarray(c2w),
        fx=jnp.full((n, 1), 50.0),
        fy=jnp.full((n, 1), 50.0),
        cx=jnp.full((n, 1), W / 2),
        cy=jnp.full((n, 1), H / 2),
        width=jnp.full((n, 1), W, jnp.int32),
        height=jnp.full((n, 1), H, jnp.int32),
        camera_type=jnp.full((n, 1), int(cam_type), jnp.int32),
        times=jnp.zeros((n, 1)),
        metadata={"sensor_idxs": jnp.zeros((n, 1), jnp.int32)},
    )


def test_camera_center_ray_points_forward():
    cams = make_cameras()
    # center pixel -> direction along -z (camera convention), identity c2w
    coords = jnp.asarray([[23.5, 31.5]])  # (row, col) with +0.5 offset -> exactly center
    rb = generate_camera_rays(cams, jnp.asarray([0]), coords)
    np.testing.assert_allclose(np.asarray(rb.directions[0]), [0, 0, -1], atol=1e-5)
    np.testing.assert_allclose(np.asarray(rb.origins[0]), [0, 0, 0], atol=1e-6)
    assert float(rb.pixel_area[0, 0]) > 0


def test_camera_rays_unit_norm_and_origins():
    cams = make_cameras()
    coords = jnp.asarray(np.random.RandomState(0).randint(0, 48, (32, 2)))
    idx = jnp.asarray(np.random.RandomState(1).randint(0, 2, 32))
    rb = generate_camera_rays(cams, idx, coords)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(rb.directions), axis=-1), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rb.origins[:, 0]), np.asarray(idx, np.float32), atol=1e-6)


def test_fisheye_wide_angle():
    cams = make_cameras(cam_type=CameraType.FISHEYE)
    # a pixel far from center should bend more than the pinhole equivalent
    coords = jnp.asarray([[0.0, 0.0]])
    rb_f = generate_camera_rays(cams, jnp.asarray([0]), coords)
    cams_p = make_cameras(cam_type=CameraType.PERSPECTIVE)
    rb_p = generate_camera_rays(cams_p, jnp.asarray([0]), coords)
    # fisheye direction should deviate more from the optical axis
    cos_f = -float(rb_f.directions[0, 2])
    cos_p = -float(rb_p.directions[0, 2])
    assert cos_f < cos_p


def test_rolling_shutter_offsets_shift_origins():
    cams = make_cameras()
    md = dict(cams.metadata)
    md["velocities"] = jnp.asarray([[10.0, 0, 0], [10.0, 0, 0]])
    md["rolling_shutter_offsets"] = jnp.asarray([[-0.02, 0.02], [-0.02, 0.02]])
    cams = cams.replace(metadata=md)
    top = generate_camera_rays(cams, jnp.asarray([0]), jnp.asarray([[0.0, 32.0]]))
    bottom = generate_camera_rays(cams, jnp.asarray([0]), jnp.asarray([[47.0, 32.0]]))
    # bottom row is exposed later -> shifted further along velocity
    assert float(bottom.origins[0, 0]) > float(top.origins[0, 0])
    assert float(bottom.times[0, 0]) > float(top.times[0, 0])


def test_lidar_rays_from_points():
    l2w = np.tile(np.eye(3, 4, dtype=np.float32), (2, 1, 1))
    l2w[:, 2, 3] = 2.0  # sensor at z=2
    lidars = Lidars(
        lidar_to_worlds=jnp.asarray(l2w),
        lidar_type=jnp.zeros((2, 1), jnp.int32),
        times=jnp.zeros((2, 1)),
        metadata={"sensor_idxs": jnp.ones((2, 1), jnp.int32)},
    )
    pts = jnp.asarray([[10.0, 0, 0, 0.5, 0.01, 3.0], [0.0, 2000.0, 0, 0.0, 0.0, 1.0]])
    rb = lidars.generate_rays(jnp.asarray([0, 1]), pts)
    np.testing.assert_allclose(np.asarray(rb.metadata["directions_norm"][0, 0]), 10.0, rtol=1e-5)
    assert bool(rb.metadata["did_return"][0, 0])
    assert not bool(rb.metadata["did_return"][1, 0])  # 2000m > threshold
    np.testing.assert_allclose(float(rb.times[0, 0]), 0.01, atol=1e-6)
    # direction from origin (0,0,2) to world point (10,0,2): +x
    np.testing.assert_allclose(np.asarray(rb.directions[0]), [1, 0, 0], atol=1e-5)


def test_radar_fov_grid_zod_size():
    g = fov_grid(**ZOD_RADAR_FOV)
    # torch.arange semantics include the 33rd elevation row at 0.3999999...
    # (executed-reference parity, tests/test_reference_parity.py): the real
    # ZOD scan is 107 x 33 = 3531 rays, not the naive 107 x 32
    assert g.shape == (107 * 33, 2)


def test_radar_generate_rays():
    r2w = np.tile(np.eye(3, 4, dtype=np.float32), (3, 1, 1))
    radars = Radars(
        radar_to_worlds=jnp.asarray(r2w),
        radar_type=jnp.zeros((3, 1), jnp.int32),
        fov_directions=jnp.asarray(fov_grid(-0.5, 0.5, -0.1, 0.1, 0.1, 0.1)),
        times=jnp.zeros((3, 1)),
        metadata={"sensor_idxs": jnp.full((3, 1), 2, jnp.int32)},
    )
    nr = radars.rays_per_scan
    rb = radars.generate_rays(jnp.asarray([0, 2]))
    assert rb.origins.shape == (2 * nr, 3)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(rb.directions), axis=-1), 1.0, atol=1e-5)
    assert rb.metadata["directions_spher"].shape == (2 * nr, 2)
    # azimuth 0, elevation 0 ray points along +x in the radar frame
    spher = np.asarray(rb.metadata["directions_spher"])
    zero = np.where((np.abs(spher) < 1e-6).all(axis=1))[0]
    if len(zero):
        np.testing.assert_allclose(np.asarray(rb.directions[zero[0]]), [1, 0, 0], atol=1e-5)
    assert bool(rb.metadata["is_radar"].all())


def test_equirectangular_full_sphere_coverage():
    """Equirect rays must span the full sphere: phi = pi*(0.5 - y) with the
    equirect intrinsic convention fx = width/2, fy = height
    (cf. reference cameras.py:806-818). Regression: a wrong phi formula
    confined all directions to the upper hemisphere."""
    H, W = 32, 64
    cams = make_cameras(n=1, H=H, W=W, cam_type=CameraType.EQUIRECTANGULAR)
    cams = cams.replace(fx=jnp.full((1, 1), W / 2.0), fy=jnp.full((1, 1), float(H)))
    rows, cols = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    coords = jnp.asarray(np.stack([rows.reshape(-1), cols.reshape(-1)], 1), jnp.float32)
    rb = generate_camera_rays(cams, jnp.zeros((H * W,), jnp.int32), coords)
    d = np.asarray(rb.directions)
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
    # identity c2w: camera +y is world +y; poles must be reached
    assert d[:, 1].min() < -0.95 and d[:, 1].max() > 0.95
    # top row points up, bottom row points down
    dg = d.reshape(H, W, 3)
    assert dg[0, :, 1].mean() > 0.9 and dg[-1, :, 1].mean() < -0.9
    # azimuth sweeps the full circle: forward (-z) and backward (+z) both hit
    assert dg[H // 2, :, 2].min() < -0.95 and dg[H // 2, :, 2].max() > 0.95


def test_undistort_newton_roundtrip():
    """Newton undistortion inverts OpenCV distortion at fisheye-strength
    coefficients where plain fixed-point iteration diverges."""
    from neuradar_tpu.cameras.cameras import _undistort

    dist = jnp.asarray([[-0.2, 0.05, 0.001, 0.0, 0.01, -0.01]])
    xy = jnp.asarray([[0.9, -1.2]])
    # forward distortion of the recovered point must give back the input
    und = _undistort(jnp.tile(xy, (1, 1)), dist)
    x, y = und[..., 0:1], und[..., 1:2]
    k1, k2, k3, k4 = dist[..., 0:1], dist[..., 1:2], dist[..., 2:3], dist[..., 3:4]
    p1, p2 = dist[..., 4:5], dist[..., 5:6]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * (k3 + r2 * k4)))
    fx_ = x * radial + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
    fy_ = y * radial + 2 * p2 * x * y + p1 * (r2 + 2 * y * y)
    np.testing.assert_allclose(np.asarray(jnp.concatenate([fx_, fy_], -1)), np.asarray(xy), atol=1e-4)


def test_ods_vr180_stereo_rays():
    """ODS/VR180 render-only stereo types (cf. reference cameras.py:699-758):
    equirect(-style) directions; origins offset +-VR_IPD/2 — for ODS on the
    interocular circle rotating with azimuth, for VR180 on the fixed
    camera x-axis."""
    from neuradar_tpu.cameras.cameras import VR_IPD

    H, W = 48, 64
    # identity pose, fx = W/2 so unit x spans [-1, 1]
    def cams(ct):
        c = make_cameras(n=1, H=H, W=W, cam_type=ct)
        return c.replace(fx=jnp.full((1, 1), W / 2.0), fy=jnp.full((1, 1), W / 2.0))

    coords = jnp.asarray([[H / 2 - 0.5, W / 2 - 0.5],   # center: u=0
                          [H / 2 - 0.5, W / 4 - 0.5],   # u=-0.5 (quarter left)
                          [H / 2 - 0.5, 7.5]])          # u=-0.75
    idx = jnp.zeros((3,), jnp.int32)

    rb_l = generate_camera_rays(cams(CameraType.OMNIDIRECTIONALSTEREO_L), idx, coords)
    rb_r = generate_camera_rays(cams(CameraType.OMNIDIRECTIONALSTEREO_R), idx, coords)
    rb_e = generate_camera_rays(cams(CameraType.EQUIRECTANGULAR), idx, coords)

    # directions identical to equirectangular
    np.testing.assert_allclose(np.asarray(rb_l.directions), np.asarray(rb_e.directions), atol=1e-6)
    # origins on the ipd/2 circle in the camera's xz plane, L/R antipodal
    for rb in (rb_l, rb_r):
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(rb.origins), axis=-1), VR_IPD / 2, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(rb_l.origins), -np.asarray(rb_r.origins), atol=1e-8)
    # center pixel (u=0, theta=0): right-eye offset along +x exactly
    np.testing.assert_allclose(np.asarray(rb_r.origins[0]), [VR_IPD / 2, 0, 0], atol=1e-7)
    # the circle ROTATES with azimuth: a different column lands elsewhere
    assert not np.allclose(np.asarray(rb_r.origins[1]), np.asarray(rb_r.origins[0]))

    rb_vl = generate_camera_rays(cams(CameraType.VR180_L), idx, coords)
    rb_vr = generate_camera_rays(cams(CameraType.VR180_R), idx, coords)
    # VR180 origins: fixed interocular axis, all pixels share the offset
    np.testing.assert_allclose(np.asarray(rb_vr.origins),
                               np.tile([VR_IPD / 2, 0, 0], (3, 1)), atol=1e-7)
    np.testing.assert_allclose(np.asarray(rb_vl.origins),
                               np.tile([-VR_IPD / 2, 0, 0], (3, 1)), atol=1e-7)
    # VR180 azimuth range is halved: u=-0.5 -> theta=+45deg; direction's
    # horizontal angle must be half the equirect one at the same column
    d_vr = np.asarray(rb_vr.directions[1])
    d_eq = np.asarray(rb_e.directions[1])
    ang = lambda d: np.arctan2(d[0], -d[2])
    np.testing.assert_allclose(ang(d_vr), ang(d_eq) / 2, atol=1e-5)
    # center ray still points forward
    np.testing.assert_allclose(np.asarray(rb_vr.directions[0]), [0, 0, -1], atol=1e-6)
