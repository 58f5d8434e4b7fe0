"""Dataparser base utility tests (recenter/splits/missing points/times)."""

import numpy as np

from neuradar_tpu.data.dataparsers.base import (
    linspaced_split,
    recenter_poses,
    scene_box_from_poses,
    synthesize_missing_points,
    zero_base_times,
)


def test_linspaced_split():
    s = linspaced_split(32, eval_fraction=0.125)
    assert len(s.eval) == 4
    assert len(np.intersect1d(s.train, s.eval)) == 0
    assert len(s.train) + len(s.eval) == 32
    # eval frames spread over the sequence
    assert s.eval[0] == 0 and s.eval[-1] == 31


def test_recenter_poses():
    a = np.tile(np.eye(3, 4, dtype=np.float32), (4, 1, 1))
    a[:, 0, 3] = [10, 10, 10, 10]
    (out,), center = recenter_poses([a])
    np.testing.assert_allclose(center, [10, 0, 0], atol=1e-6)
    np.testing.assert_allclose(out[:, 0, 3], 0, atol=1e-6)


def test_scene_box_padding():
    a = np.tile(np.eye(3, 4, dtype=np.float32), (2, 1, 1))
    a[1, :3, 3] = [100, 0, 0]
    box = scene_box_from_poses([a], padding=40.0)
    np.testing.assert_allclose(box.aabb[0], [-40, -40, -40])
    np.testing.assert_allclose(box.aabb[1], [140, 40, 40])


def test_zero_base_times():
    traj = [dict(timestamps=np.array([100.0, 101.0]))]
    (a, b), duration = zero_base_times([np.array([100.0, 105.0]), np.array([102.0])], traj)
    assert a[0] == 0.0 and b[0] == 2.0
    assert duration == 5.0
    assert traj[0]["timestamps"][0] == 0.0


def test_missing_points_full_coverage_adds_none():
    n = 3600
    az = np.linspace(-np.pi, np.pi - 1e-4, n)
    pts = np.stack([np.cos(az) * 10, np.sin(az) * 10, np.zeros(n), np.ones(n), np.zeros(n), np.zeros(n)], 1)
    out = synthesize_missing_points(pts.astype(np.float32), azimuth_resolution_deg=1.0)
    assert len(out) == len(pts)  # full coverage -> nothing added


def test_missing_points_skip_channels():
    n = 360
    az = np.linspace(-np.pi, 0, n)
    pts = np.stack([np.cos(az) * 10, np.sin(az) * 10, np.zeros(n), np.ones(n), np.zeros(n), np.ones(n) * 7], 1)
    out = synthesize_missing_points(pts.astype(np.float32), azimuth_resolution_deg=1.0, skip_channels=(7,))
    assert len(out) == len(pts)
