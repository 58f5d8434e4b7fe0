"""nuScenes dynamic-object mask generation (scripts/process_nuscenes_masks;
cf. reference process_nuscenes_masks.py geometry, devkit-free core)."""

import numpy as np

from neuradar_tpu.scripts.process_nuscenes_masks import (
    dynamic_instance_tokens,
    make_camera_mask,
    view_points,
)


def _cube_corners(center, half=1.0):
    """[3, 8] axis-aligned cube corners (camera frame, z forward)."""
    cx, cy, cz = center
    corners = []
    for dx in (1, -1):
        for dy in (1, -1):
            for dz in (1, -1):
                corners.append([cx + half * dx, cy + half * dy, cz + half * dz])
    return np.asarray(corners, np.float64).T


INTR = np.array([[800.0, 0, 800.0], [0, 800.0, 450.0], [0, 0, 1.0]])


def test_view_points_center():
    pts = np.array([[0.0], [0.0], [10.0]])
    uv = view_points(pts, INTR)
    np.testing.assert_allclose(uv[:, 0], [800.0, 450.0])


def test_mask_zeroes_box_projection():
    corners = _cube_corners((0, 0, 10), half=1.0)
    mask = make_camera_mask([corners], INTR)
    assert mask.shape == (900, 1600)
    assert mask[450, 800] == 0           # box center projected
    assert mask[450, 800 + 200] == 1     # outside the +-80 px box footprint
    assert mask[50, 50] == 1
    # the zeroed region is about (2*800/10)^2 = 160x160 px
    zero_frac = 1 - mask.mean()
    assert 0.005 < zero_frac < 0.05


def test_mask_ego_truck_strip():
    mask = make_camera_mask([], INTR, mask_ego_truck=True)
    assert (mask[-100:] == 0).all() and (mask[:-100] == 1).all()


def test_dynamic_instance_walk():
    """Mocked devkit: an instance is dynamic iff any annotation in its chain
    moves faster than the threshold; NaN velocities (first/last frames in the
    real devkit) count as dynamic — same comparison as the reference."""

    class _Nusc:
        instance = [
            {"token": "static", "first_annotation_token": "s1"},
            {"token": "moving", "first_annotation_token": "m1"},
            {"token": "nanvel", "first_annotation_token": "n1"},
        ]
        _ann = {
            "s1": {"next": "s2"}, "s2": {"next": ""},
            "m1": {"next": "m2"}, "m2": {"next": ""},
            "n1": {"next": ""},
        }
        _vel = {"s1": [0.1, 0, 0], "s2": [0.2, 0, 0],
                "m1": [0.0, 0, 0], "m2": [3.0, 0, 0],
                "n1": [np.nan, np.nan, np.nan]}

        def box_velocity(self, tok):
            return np.asarray(self._vel[tok])

        def get(self, table, tok):
            assert table == "sample_annotation"
            return self._ann[tok]

    dyn = dynamic_instance_tokens(_Nusc(), velocity_thresh=0.75)
    assert dyn == {"moving", "nanvel"}
