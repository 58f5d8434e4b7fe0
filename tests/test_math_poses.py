"""Parity tests for math/pose primitives against closed forms and the
reference's torch implementations (re-derived, not imported)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuradar_tpu.utils import math as nmath
from neuradar_tpu.utils import poses


def test_power_fn_roundtrip():
    x = jnp.linspace(0.01, 100.0, 50)
    for lam in (-1.0, -1.5, 0.5, 2.0):
        y = nmath.power_fn(x, lam)
        x2 = nmath.inv_power_fn(y, lam)
        np.testing.assert_allclose(np.asarray(x2), np.asarray(x), rtol=1e-4)


def test_power_fn_special_cases():
    x = jnp.linspace(0.01, 10.0, 20)
    np.testing.assert_allclose(np.asarray(nmath.power_fn(x, 1)), np.asarray(x))
    np.testing.assert_allclose(np.asarray(nmath.power_fn(x, 0)), np.log1p(np.asarray(x)), rtol=1e-6)


def test_intersect_aabb():
    aabb = jnp.array([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0])
    origins = jnp.array([[0.0, 0.0, -5.0], [0.0, 5.0, 0.0], [10.0, 10.0, 10.0]])
    dirs = jnp.array([[0.0, 0.0, 1.0], [0.0, -1.0, 0.0], [1.0, 0.0, 0.0]])
    t_min, t_max = nmath.intersect_aabb(origins, dirs, aabb)
    np.testing.assert_allclose(np.asarray(t_min[:2]), [4.0, 4.0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(t_max[:2]), [6.0, 6.0], atol=1e-5)
    assert t_min[2] == 1e10  # miss


def test_chamfer_distance_identical():
    pts = jax.random.normal(jax.random.PRNGKey(0), (32, 3))
    assert float(nmath.chamfer_distance(pts, pts)) < 1e-5


def test_chamfer_distance_masked():
    gt = jnp.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
    pred = jnp.array([[0.0, 0.0, 0.0], [99.0, 0.0, 0.0]])
    mask = jnp.array([True, False])
    d = nmath.chamfer_distance(pred, gt, pred_mask=mask)
    # pred->gt: only first point, dist 0; gt->pred: 0 and 1
    np.testing.assert_allclose(float(d), 0.5, atol=1e-5)


def test_pose_inverse_multiply():
    rng = np.random.RandomState(0)
    d6 = jnp.asarray(rng.randn(5, 6), jnp.float32)
    R = poses.rotation_6d_to_matrix(d6)
    t = jnp.asarray(rng.randn(5, 3, 1), jnp.float32)
    pose = jnp.concatenate([R, t], axis=-1)
    ident = poses.multiply(pose, poses.inverse(pose))
    expect = np.broadcast_to(np.eye(3, 4, dtype=np.float32), (5, 3, 4))
    np.testing.assert_allclose(np.asarray(ident), expect, atol=1e-5)


def test_rotation_6d_roundtrip():
    rng = np.random.RandomState(1)
    d6 = jnp.asarray(rng.randn(10, 6), jnp.float32)
    R = poses.rotation_6d_to_matrix(d6)
    # valid rotation matrices
    RtR = np.einsum("bij,bkj->bik", np.asarray(R), np.asarray(R))
    np.testing.assert_allclose(RtR, np.broadcast_to(np.eye(3), (10, 3, 3)), atol=1e-5)
    d6_back = poses.matrix_to_rotation_6d(R)
    R2 = poses.rotation_6d_to_matrix(d6_back)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)


def test_exp_map_so3xr3_zero():
    tangent = jnp.zeros((2, 6))
    p = poses.exp_map_SO3xR3(tangent)
    np.testing.assert_allclose(np.asarray(p), np.broadcast_to(np.eye(3, 4), (2, 3, 4)), atol=1e-6)


def test_exp_map_so3xr3_rotation():
    # 90 deg about z
    tangent = jnp.array([[0.0, 0.0, 0.0, 0.0, 0.0, np.pi / 2]])
    p = poses.exp_map_SO3xR3(tangent)
    expected_R = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], dtype=np.float32)
    np.testing.assert_allclose(np.asarray(p[0, :3, :3]), expected_R, atol=1e-5)


def test_interpolate_trajectories_6d():
    # two actors, three times; actor 0 moves linearly along x
    T, A = 3, 2
    poses_9d = np.zeros((T, A, 9), np.float32)
    poses_9d[..., 0] = 1.0  # a1 = x
    poses_9d[..., 4] = 1.0  # a2 = y
    poses_9d[:, 0, 6] = [0.0, 1.0, 2.0]  # x position over time
    times = jnp.array([0.0, 1.0, 2.0])
    valid = jnp.ones((T, A), bool)
    query = jnp.array([0.5, 1.5])
    interp, v = poses.interpolate_trajectories_6d(jnp.asarray(poses_9d), times, query, valid)
    assert interp.shape == (2, A, 9)
    np.testing.assert_allclose(np.asarray(interp[:, 0, 6]), [0.5, 1.5], atol=1e-5)
    assert bool(v.all())


def test_transform_points_pairwise():
    pose = jnp.asarray(np.array([[[0, -1, 0, 1], [1, 0, 0, 2], [0, 0, 1, 3]]], np.float32))
    pts = jnp.array([[1.0, 0.0, 0.0]])
    out = poses.transform_points_pairwise(pts, pose[:, :3])
    np.testing.assert_allclose(np.asarray(out), [[1.0, 3.0, 3.0]], atol=1e-6)


def test_intersect_obb():
    import jax.numpy as jnp
    from neuradar_tpu.utils.math import intersect_aabb, intersect_obb
    from neuradar_tpu.utils.poses import quaternion_to_matrix

    # identity-rotation OBB == AABB
    origins = jnp.asarray([[-5.0, 0.2, 0.1], [0.0, 5.0, 0.0]])
    dirs = jnp.asarray([[1.0, 0.0, 0.0], [0.0, -1.0, 0.0]])
    he = jnp.asarray([1.0, 1.0, 1.0])
    t0, t1 = intersect_obb(origins, dirs, jnp.zeros(3), jnp.eye(3), he)
    a0, a1 = intersect_aabb(origins, dirs, jnp.concatenate([-he, he]))
    np.testing.assert_allclose(np.asarray(t0), np.asarray(a0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(t1), np.asarray(a1), atol=1e-5)

    # 45-degree-rotated unit box: at y=0 its x cross-section spans [-sqrt2, sqrt2]
    rot = quaternion_to_matrix(jnp.asarray([np.cos(np.pi / 8), 0.0, 0.0, np.sin(np.pi / 8)]))
    o = jnp.asarray([[-5.0, 0.0, 0.1]])
    t0, t1 = intersect_obb(o, dirs[:1], jnp.zeros(3), rot, he)
    np.testing.assert_allclose(float(t0[0]), 5.0 - np.sqrt(2), atol=1e-4)
    np.testing.assert_allclose(float(t1[0]), 5.0 + np.sqrt(2), atol=1e-4)


def test_quaternion_slerp_and_conversions():
    import jax.numpy as jnp
    from neuradar_tpu.utils.poses import matrix_to_quaternion, quaternion_slerp, quaternion_to_matrix

    rng = np.random.RandomState(3)
    q = rng.randn(32, 4)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    # round trip through matrices (up to sign)
    q_rt = np.asarray(matrix_to_quaternion(quaternion_to_matrix(jnp.asarray(q))))
    sign = np.sign(np.sum(q_rt * q, -1, keepdims=True))
    np.testing.assert_allclose(q_rt * sign, q, atol=1e-5)

    # slerp endpoints + midpoint of a 90-degree z-rotation
    q0 = jnp.asarray([1.0, 0.0, 0.0, 0.0])
    q1 = jnp.asarray([np.cos(np.pi / 4), 0.0, 0.0, np.sin(np.pi / 4)])
    np.testing.assert_allclose(np.asarray(quaternion_slerp(q0, q1, 0.0)), np.asarray(q0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(quaternion_slerp(q0, q1, 1.0)), np.asarray(q1), atol=1e-6)
    mid = np.asarray(quaternion_slerp(q0, q1, 0.5))
    np.testing.assert_allclose(mid, [np.cos(np.pi / 8), 0, 0, np.sin(np.pi / 8)], atol=1e-6)
    # constant angular velocity: angle(t) linear in t
    for t in (0.25, 0.75):
        qt = np.asarray(quaternion_slerp(q0, q1, t))
        assert abs(2 * np.arccos(qt[0]) - t * np.pi / 2) < 1e-5


def test_hexagonal_multisample_moments():
    import jax.numpy as jnp
    from neuradar_tpu.utils.math import hexify_frustums

    R, S = 4, 8
    origins = jnp.zeros((R, 3))
    dirs = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (R, 1))
    starts = jnp.tile(jnp.linspace(1.0, 8.0, S)[None, :, None], (R, 1, 1))
    ends = starts + 1.0
    pixel_area = jnp.full((R, 1), np.pi * 0.01**2)  # r_dot = 0.01

    g = hexify_frustums(origins, dirs, starts, ends, pixel_area, rotate_per_ray=False)
    assert g.mean.shape == (R, S, 6, 3) and g.std.shape == (R, S, 6, 1)
    m = np.asarray(g.mean)
    # along-axis (z) positions stratified inside each frustum
    z = m[..., 2]
    assert (z >= np.asarray(starts) - 1e-6).all() and (z <= np.asarray(ends) + 1e-6).all()
    # radial second moment matches the uniform-disk value r^2/4 per axis
    t = z.reshape(-1)
    rad2 = (m[..., 0] ** 2 + m[..., 1] ** 2).reshape(-1)
    r_cone = 0.01 * t
    np.testing.assert_allclose(rad2, r_cone**2 / 2, rtol=1e-4)
    # std grows linearly with distance
    s = np.asarray(g.std)[..., 0]
    np.testing.assert_allclose(s, 0.01 * z / 2, rtol=1e-5)


def test_merge_and_concatenate_ray_bundles():
    """Bundle pytree utilities (cf. reference tensor_dataclass cat/broadcast
    tests, utils/tensor_dataclass.py:28)."""
    import jax.numpy as jnp
    from neuradar_tpu.cameras.rays import RayBundle, concatenate_ray_bundles
    from neuradar_tpu.data.datamanager import merge_modality_bundles

    def mk(n, v, extra=None):
        return RayBundle(
            origins=jnp.full((n, 3), float(v)),
            directions=jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1)),
            pixel_area=jnp.ones((n, 1)),
            camera_indices=jnp.full((n, 1), v, jnp.int32),
            metadata={"directions_norm": jnp.ones((n, 1)), **(extra or {})},
        )

    cat = concatenate_ray_bundles([mk(2, 0), mk(3, 1)])
    assert cat.origins.shape == (5, 3)
    assert np.asarray(cat.camera_indices)[:, 0].tolist() == [0, 0, 1, 1, 1]

    # lidar segment carries is_lidar; the camera segment gets default-False
    lidar_b = mk(3, 1, {"is_lidar": jnp.ones((3, 1), bool)})
    merged = merge_modality_bundles(mk(2, 0), lidar_b, None)
    assert merged.origins.shape == (5, 3)
    # modality flags default-filled for segments lacking them
    assert "is_lidar" in merged.metadata
    flags = np.asarray(merged.metadata["is_lidar"])[:, 0]
    assert flags.tolist() == [False, False, True, True, True]


def test_spiral_path_geometry():
    """get_spiral_path (reference camera_paths.get_spiral_path:107-168):
    poses orbit the seed at the given radius, rotations stay orthonormal."""
    import numpy as np

    from neuradar_tpu.utils.poses import get_spiral_path

    seed = np.eye(3, 4, dtype=np.float32)
    seed[:3, 3] = [1.0, 2.0, 3.0]
    poses = np.asarray(get_spiral_path(seed, steps=8, radius=0.5, rots=1, zrate=0.5))
    assert poses.shape == (8, 3, 4)
    # theta=0: local center = (radius, 0, 0) composed with the seed pose
    np.testing.assert_allclose(poses[0, :3, 3], seed[:3, 3] + [0.5, 0, 0], atol=1e-5)
    # every rotation orthonormal with det +1
    for p in poses:
        r = p[:3, :3]
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)
        assert np.linalg.det(r) > 0.99
    # centers stay within the radius ball around the seed position
    d = np.linalg.norm(poses[:, :3, 3] - seed[:3, 3], axis=-1)
    assert np.all(d <= 0.5 * np.sqrt(2) + 1e-5)
