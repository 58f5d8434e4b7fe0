"""Viewer overlay projection/drawing + datamanager viewer-support methods
(cf. reference viewer lidar/actor nodes and
ad_datamanager.{change_patch_sampler,get_accumulated_lidar_points})."""

import numpy as np

from neuradar_tpu.viewer import overlays as ov


def _cam_at_origin():
    # camera at origin looking down world -z is identity in our convention
    # (right=x, up=y, forward=-z)
    return np.eye(3, 4)


def test_project_points_pinhole():
    c2w = _cam_at_origin()
    pts = np.array([[0.0, 0.0, -10.0], [1.0, 0.0, -10.0], [0.0, 1.0, -10.0], [0.0, 0.0, 5.0]])
    uv, z = ov.project_points(c2w, 100.0, 100.0, 64.0, 48.0, pts)
    np.testing.assert_allclose(z[:3], 10.0)
    np.testing.assert_allclose(uv[0], [64.0, 48.0])  # on-axis -> principal point
    np.testing.assert_allclose(uv[1], [74.0, 48.0])  # +x -> +u
    np.testing.assert_allclose(uv[2], [64.0, 38.0])  # +y (up) -> -v
    assert z[3] < 0  # behind the camera


def test_draw_points_and_boxes_modify_image():
    rgb = np.zeros((96, 128, 3), np.uint8)
    c2w = _cam_at_origin()
    pts = np.stack([np.linspace(-2, 2, 50), np.zeros(50), np.full(50, -12.0)], 1)
    uv, z = ov.project_points(c2w, 100.0, 100.0, 64.0, 48.0, pts)
    ov.draw_points(rgb, uv, z)
    assert (rgb > 0).any()

    rgb2 = np.zeros((96, 128, 3), np.uint8)
    pose = np.eye(4)[:3]
    pose[:3, 3] = [0, 0, -15.0]
    corners = ov.box_corners(pose, np.array([2.0, 4.0, 1.5]))
    assert corners.shape == (8, 3)
    # wlh maps to box x/y/z half extents
    np.testing.assert_allclose(np.abs(corners - pose[:3, 3]).max(0), [1.0, 2.0, 0.75])
    ov.draw_wireframe(rgb2, c2w, 100.0, 100.0, 64.0, 48.0, corners)
    assert (rgb2 > 0).any()


def test_draw_scene_overlays_all_families():
    rgb = np.zeros((48, 64, 3), np.uint8)
    c2w = _cam_at_origin()
    lidar = np.random.RandomState(0).randn(500, 3) * 3 - [0, 0, 10]
    trajs = [dict(timestamps=np.array([0.0, 1.0]), poses=np.stack([np.eye(4)[:3]] * 2) + 0.0,
                  dims=np.array([2.0, 4.0, 1.5]))]
    trajs[0]["poses"][:, 2, 3] = -12.0
    cams = np.stack([_cam_at_origin()] * 4)
    cams[:, 2, 3] = -5.0
    out = ov.draw_scene_overlays(rgb, c2w, (80.0, 80.0, 32.0, 24.0),
                                 {"lidar": True, "boxes": True, "frusta": True},
                                 lidar_points=lidar, trajectories=trajs, camera_poses=cams)
    assert (out > 0).any()


def test_accumulated_lidar_points_and_remove_dynamic():
    import __graft_entry__

    pipe = __graft_entry__._tiny_pipeline()
    dm = pipe.datamanager
    pts = dm.get_accumulated_lidar_points()
    assert pts.shape[1] == 3 and len(pts) > 100
    # parity with a manual transform of the first train scan
    si = int(pipe.outputs.lidar_split.train[0])
    l2w = np.asarray(pipe.outputs.lidar_to_worlds[si], np.float64)
    pc = pipe.outputs.lidar_points[si][:, :3].astype(np.float64)
    world0 = (pc @ l2w[:3, :3].T + l2w[:3, 3]).astype(np.float32)
    np.testing.assert_allclose(pts[: len(world0)], world0, atol=1e-4)
    # removing dynamic actors strictly reduces (synthetic scene has actors
    # crossing the lidar fov) and never increases the count
    pruned = dm.get_accumulated_lidar_points(remove_dynamic=True)
    assert len(pruned) <= len(pts)
    # subsampling cap honored
    assert len(dm.get_accumulated_lidar_points(max_points=128)) == 128


def test_change_patch_sampler_updates_layout():
    import __graft_entry__

    pipe = __graft_entry__._tiny_pipeline()
    dm = pipe.datamanager
    old_ps = dm.config.patch_size
    assert dm.layout.patch_size == (old_ps, old_ps)
    dm.start_prefetch()
    _ = dm.next_train()
    dm.change_patch_sampler(old_ps * 2, num_rgb_patches=1)
    assert dm.layout.patch_size == (old_ps * 2, old_ps * 2)
    assert dm.layout.num_cam == 1 * (old_ps * 2) ** 2
    b = dm.next_train()  # prefetcher restarted with the new shapes
    u = dm.u
    assert b["image"].shape[1] == old_ps * 2 * u
    dm.stop()


def test_radar_points_overlay_drawn():
    """Predicted radar detections draw as magenta markers when opts['radar']."""
    import numpy as np

    from neuradar_tpu.viewer.overlays import draw_scene_overlays

    rgb = np.zeros((48, 64, 3), np.uint8)
    c2w = np.eye(3, 4)  # camera at origin looking -z
    pts = np.array([[0.0, 0.0, -5.0], [1.0, 0.5, -8.0]])
    out = draw_scene_overlays(rgb, c2w, (40.0, 40.0, 32.0, 24.0), {"radar": True},
                              radar_points=pts)
    magenta = (out[..., 0] == 255) & (out[..., 1] == 0) & (out[..., 2] == 255)
    assert magenta.sum() >= 4  # 2x2 marker per visible point
    # radar off: nothing drawn
    out2 = draw_scene_overlays(np.zeros((48, 64, 3), np.uint8), c2w,
                               (40.0, 40.0, 32.0, 24.0), {}, radar_points=pts)
    assert out2.sum() == 0
