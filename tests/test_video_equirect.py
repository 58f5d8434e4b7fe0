"""Video frame extraction + equirect->perspective (process_data/video_equirect).

Behavioral checks against the reference semantics (equirect_utils.py,
process_data_utils.py): center-of-frame lookup, yaw shifting the sampled
longitude, the 8/14 sampling layouts, vertical crop ring adjustment, and
even-spacing frame selection from a synthetic video."""

import numpy as np
import pytest

from neuradar_tpu.process_data import video_equirect as ve


def _gradient_pano(h=64, w=128):
    """Panorama whose red channel encodes longitude and green latitude."""
    img = np.zeros((h, w, 3), np.uint8)
    img[..., 0] = (np.arange(w)[None, :] * 255 // (w - 1)).astype(np.uint8)
    img[..., 1] = (np.arange(h)[:, None] * 255 // (h - 1)).astype(np.uint8)
    return img


def test_equirect_center_lookup():
    """theta=0/phi=0 looks at the pano center (+x axis -> lon 0, lat 0)."""
    img = _gradient_pano()
    out = ve.equirect_to_perspective(img, fov=90, theta=0, phi=0, hd=33, wd=33)
    assert out.shape == (33, 33, 3)
    c = out[16, 16]
    assert abs(int(c[0]) - 127) <= 3  # lon ~ w/2
    assert abs(int(c[1]) - 127) <= 3  # lat ~ h/2


def test_equirect_yaw_shifts_longitude():
    img = _gradient_pano()
    c0 = ve.equirect_to_perspective(img, 90, 0, 0, 17, 17)[8, 8, 0].astype(int)
    c90 = ve.equirect_to_perspective(img, 90, 90, 0, 17, 17)[8, 8, 0].astype(int)
    # +90deg yaw moves a quarter of the panorama width (wrapping)
    assert abs((c90 - c0) % 255 - 255 // 4) <= 4


def test_equirect_pitch_moves_latitude():
    img = _gradient_pano()
    up = ve.equirect_to_perspective(img, 90, 0, 45, 17, 17)[8, 8, 1].astype(int)
    down = ve.equirect_to_perspective(img, 90, 0, -45, 17, 17)[8, 8, 1].astype(int)
    assert up < 127 - 20 and down > 127 + 20  # phi>0 looks up (smaller row)


def test_yaw_pitch_layouts():
    fov8, pairs8 = ve.equirect_yaw_pitch_pairs(8)
    assert fov8 == 120 and len(pairs8) == 8
    assert sum(1 for _, p in pairs8 if p == 0) == 4  # horizon ring every 90
    fov14, pairs14 = ve.equirect_yaw_pitch_pairs(14)
    assert fov14 == 110 and len(pairs14) == 14
    assert sum(1 for _, p in pairs14 if p == 0) == 6  # horizon ring every 60
    with pytest.raises(ValueError):
        ve.equirect_yaw_pitch_pairs(5)


def test_crop_bound_arr_drops_and_nudges():
    # heavy bottom crop: the 45deg (downward) ring is pushed in/dropped
    arr = ve.crop_bound_arr_vertical([-45.0, 0.0, 45.0], 120, (0.0, 0.5, 0.0, 0.0))
    assert arr[2] is None or arr[2] < 45.0
    # no crop: unchanged
    assert ve.crop_bound_arr_vertical([-45.0, 0.0, 45.0], 120, (0, 0, 0, 0)) == [-45.0, 0.0, 45.0]


def test_generate_planar_projections(tmp_path):
    import PIL.Image

    PIL.Image.fromarray(_gradient_pano()).save(tmp_path / "pano_0.png")
    out_dir = ve.generate_planar_projections(tmp_path, (24, 16), 8)
    files = sorted(out_dir.glob("pano_0_*.jpg"))
    assert len(files) == 8
    im = np.asarray(PIL.Image.open(files[0]))
    assert im.shape == (16, 24, 3)


def test_video_to_images(tmp_path):
    import cv2

    vid = tmp_path / "clip.avi"
    wr = cv2.VideoWriter(str(vid), cv2.VideoWriter_fourcc(*"MJPG"), 10, (32, 24))
    assert wr.isOpened()
    for i in range(20):
        frame = np.full((24, 32, 3), i * 10, np.uint8)
        wr.write(frame)
    wr.release()

    rel, n = ve.video_to_images(vid, tmp_path / "images", num_frames_target=5, num_downscales=2)
    assert n == len(rel) == 5  # spacing 4 -> frames 0,4,8,12,16
    assert (tmp_path / "images" / "frame_00001.png").exists()
    assert (tmp_path / "images_2" / "frame_00001.png").exists()
    assert (tmp_path / "images_4" / "frame_00005.png").exists()
    import PIL.Image

    first = np.asarray(PIL.Image.open(tmp_path / "images" / "frame_00001.png"))
    last = np.asarray(PIL.Image.open(tmp_path / "images" / "frame_00005.png"))
    assert int(last.mean()) > int(first.mean()) + 100  # even spacing across the ramp


def test_video_cli(tmp_path):
    """`process_data video` extracts frames and stops cleanly without a
    COLMAP model path (pose estimation is env-gated)."""
    import cv2

    from neuradar_tpu.scripts.process_data import main as pd_main

    vid = tmp_path / "clip.avi"
    wr = cv2.VideoWriter(str(vid), cv2.VideoWriter_fourcc(*"MJPG"), 10, (32, 24))
    for i in range(12):
        wr.write(np.full((24, 32, 3), i * 20, np.uint8))
    wr.release()
    out = tmp_path / "out"
    rc = pd_main(["video", "--data", str(vid), "--output-dir", str(out),
                  "--num-frames-target", "4", "--num-downscales", "1"])
    assert rc == 0
    assert len(list((out / "images").glob("frame_*.png"))) == 4


def test_equirect_cli(tmp_path):
    import PIL.Image

    from neuradar_tpu.scripts.process_data import main as pd_main

    data = tmp_path / "panos"
    data.mkdir()
    PIL.Image.fromarray(_gradient_pano()).save(data / "p0.png")
    out = tmp_path / "out"
    rc = pd_main(["equirect", "--data", str(data), "--output-dir", str(out),
                  "--planar-size", "16x24", "--num-downscales", "1"])
    assert rc == 0
    assert len(list((out / "images").iterdir())) == 8
