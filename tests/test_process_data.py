"""process_data converters: capture-format exports -> transforms.json
(cf. reference process_data/*_utils.py pose math, cited per test)."""

import json
import struct

import numpy as np
import PIL.Image
import pytest

from neuradar_tpu import process_data as pd
from neuradar_tpu.scripts.process_data import main as pd_main


def _write_images(d, n=3, w=16, h=12):
    d.mkdir(parents=True, exist_ok=True)
    paths = []
    for i in range(n):
        p = d / f"img_{i:03d}.jpg"
        PIL.Image.fromarray(np.full((h, w, 3), 40 * i, np.uint8)).save(p)
        paths.append(p)
    return paths


def test_polycam_cli_end_to_end(tmp_path):
    cap = tmp_path / "cap"
    imgs = _write_images(cap / "keyframes" / "images")
    cam_dir = cap / "keyframes" / "cameras"
    cam_dir.mkdir(parents=True)
    for i, p in enumerate(imgs):
        t = np.eye(4)
        t[:3, 3] = [i, 2 * i, 3 * i]
        (cam_dir / f"{p.stem}.json").write_text(json.dumps({
            "fx": 100.0, "fy": 101.0, "cx": 8.0, "cy": 6.0, "width": 16, "height": 12,
            "blur_score": 100.0,
            **{f"t_{r}{c}": t[r, c] for r in range(3) for c in range(4)},
        }))
    out = tmp_path / "out"
    assert pd_main(["polycam", "--data", str(cap), "--output-dir", str(out)]) == 0
    meta = json.loads((out / "transforms.json").read_text())
    assert len(meta["frames"]) == 3
    # row permutation (z, x, y): identity rotation maps to [[z row],[x row],[y row]]
    m = np.asarray(meta["frames"][1]["transform_matrix"])
    np.testing.assert_allclose(m[:3, 3], [3.0, 1.0, 2.0])  # (t_z, t_x, t_y)
    assert (out / "images").is_dir() and (out / "images_2").is_dir()
    # the converted dataset loads through the nerfstudio-format dataparser
    from neuradar_tpu.data.dataparsers.nerfstudio_format import NerfstudioFormatDataParserConfig

    dpo = NerfstudioFormatDataParserConfig(data=str(out), auto_recenter=False).setup().get_dataparser_outputs()
    assert dpo.images.shape[0] == 3


def test_record3d_quaternion_pose(tmp_path):
    (tmp_path / "meta").mkdir()
    # 90 deg about z, scalar-last (x, y, z, w)
    q = [0.0, 0.0, np.sin(np.pi / 4), np.cos(np.pi / 4)]
    meta = {"poses": [[*q, 1.0, 2.0, 3.0]], "K": np.eye(3).T.reshape(-1).tolist(),
            "w": 16, "h": 12}
    mp = tmp_path / "meta" / "metadata.json"
    mp.write_text(json.dumps(meta))
    data = pd.record3d_to_json(["./images/frame_00001.jpg"], mp, tmp_path / "out", np.array([0]))
    m = np.asarray(data["frames"][0]["transform_matrix"])
    expect = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]])
    np.testing.assert_allclose(m[:3, :3], expect, atol=1e-7)
    np.testing.assert_allclose(m[:3, 3], [1, 2, 3])


def test_metashape_xml(tmp_path):
    xml = tmp_path / "cameras.xml"
    transform = " ".join(str(x) for x in np.eye(4).reshape(-1))
    xml.write_text(f"""<document><chunk>
      <sensors><sensor id="0" type="frame">
        <resolution width="16" height="12"/>
        <calibration><f>100.0</f><cx>0.5</cx><cy>-0.5</cy></calibration>
      </sensor></sensors>
      <cameras><camera id="0" sensor_id="0" label="img_000">
        <transform>{transform}</transform>
      </camera></cameras>
    </chunk></document>""")
    data = pd.metashape_to_json({"img_000": "images/img_000.jpg"}, xml, tmp_path / "out")
    f = data["frames"][0]
    assert f["fl_x"] == 100.0 and f["cx"] == 8.5 and f["cy"] == 5.5
    # identity pose -> rows permuted (2, 0, 1) with cols 1:3 negated
    m = np.asarray(f["transform_matrix"])
    expect = np.eye(4)[[2, 0, 1, 3], :]
    expect[:, 1:3] *= -1
    np.testing.assert_allclose(m, expect)


def test_realitycapture_csv(tmp_path):
    imgs = _write_images(tmp_path / "out" / "images", n=1)
    csvf = tmp_path / "poses.csv"
    csvf.write_text("#name,x,y,alt,heading,pitch,roll,f,px,py,k1,k2,k3,k4,t1,t2\n"
                    "img_000.jpg,1.0,2.0,3.0,0,0,0,36.0,0,0,0,0,0,0,0,0\n")
    data = pd.realitycapture_to_json({"img_000": f"images/{imgs[0].name}"}, csvf, tmp_path / "out")
    f = data["frames"][0]
    assert f["fl_x"] == pytest.approx(16.0)  # f(35mm) * max(w,h)/36
    m = np.asarray(f["transform_matrix"])
    np.testing.assert_allclose(m[:3, 3], [1, 2, 3])
    np.testing.assert_allclose(m[:3, :3], np.eye(3), atol=1e-12)


def test_odm(tmp_path):
    (tmp_path / "odm_report").mkdir(parents=True)
    (tmp_path / "cameras.json").write_text(json.dumps({
        "v2 cam": {"width": 16, "height": 12, "focal": 0.9, "c_x": 0.0, "c_y": 0.0}
    }))
    (tmp_path / "odm_report" / "shots.geojson").write_text(json.dumps({
        "features": [{"properties": {"filename": "img_000.jpg", "rotation": [0, 0, 0],
                                     "translation": [4.0, 5.0, 6.0]}}]
    }))
    data = pd.odm_to_json({"img_000": "images/img_000.jpg"}, tmp_path / "cameras.json",
                          tmp_path / "odm_report" / "shots.geojson", tmp_path / "out")
    assert data["fl_x"] == pytest.approx(0.9 * 16)
    m = np.asarray(data["frames"][0]["transform_matrix"])
    np.testing.assert_allclose(m[:3, 3], [4, 5, 6])


def _write_colmap_binary(sparse_dir, qvec, tvec):
    sparse_dir.mkdir(parents=True, exist_ok=True)
    with open(sparse_dir / "cameras.bin", "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, 16, 12))  # PINHOLE
        f.write(struct.pack("<4d", 100.0, 101.0, 8.0, 6.0))
    with open(sparse_dir / "images.bin", "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<i", 1))
        f.write(struct.pack("<4d", *qvec))
        f.write(struct.pack("<3d", *tvec))
        f.write(struct.pack("<i", 1))
        f.write(b"im0.jpg\x00")
        f.write(struct.pack("<Q", 0))


def test_colmap_binary_model(tmp_path):
    """Binary reader + the colmap_to_json pose chain (w2c invert, OpenCV->
    OpenGL flip, world permute; reference colmap_utils:419-441)."""
    _write_colmap_binary(tmp_path / "sparse", [1.0, 0, 0, 0], [1.0, 2.0, 3.0])
    cams = pd.read_colmap_cameras(tmp_path / "sparse" / "cameras.bin")
    assert cams[1]["model"] == "PINHOLE" and cams[1]["params"][0] == 100.0
    data = pd.colmap_to_json(tmp_path / "sparse", tmp_path / "out")
    assert data["fl_x"] == 100.0 and data["fl_y"] == 101.0
    m = np.asarray(data["frames"][0]["transform_matrix"])
    # identity rotation: c2w translation = -tvec, then flips/permutes
    c2w = np.eye(4)
    c2w[:3, 3] = [-1.0, -2.0, -3.0]
    c2w[0:3, 1:3] *= -1
    c2w = c2w[[0, 2, 1, 3], :]
    c2w[2, :] *= -1
    np.testing.assert_allclose(m, c2w, atol=1e-12)


def test_colmap_text_model(tmp_path):
    d = tmp_path / "sparse"
    d.mkdir()
    (d / "cameras.txt").write_text("# comment\n1 SIMPLE_PINHOLE 16 12 100.0 8.0 6.0\n")
    (d / "images.txt").write_text("# comment\n1 1 0 0 0 0.5 0.5 0.5 1 im0.jpg\n\n")
    data = pd.colmap_to_json(d, tmp_path / "out")
    assert data["fl_x"] == 100.0 and len(data["frames"]) == 1


def test_colmap_text_zero_point_image(tmp_path):
    """A valid images.txt where an image has an EMPTY 2D-point line must stay
    in phase (regression: blank-line filtering made lines[::2] parse point
    rows as poses)."""
    d = tmp_path / "sparse"
    d.mkdir()
    (d / "cameras.txt").write_text("1 SIMPLE_PINHOLE 16 12 100.0 8.0 6.0\n")
    (d / "images.txt").write_text(
        "# header\n"
        "1 1 0 0 0 0.5 0.5 0.5 1 im0.jpg\n"
        "\n"  # zero observations
        "2 1 0 0 0 1.5 2.5 3.5 1 im1.jpg\n"
        "4.0 4.0 7 8.0 8.0 9\n"
    )
    images = pd.read_colmap_images(d / "images.txt")
    assert sorted(images) == [1, 2]
    assert images[1]["name"] == "im0.jpg"
    assert images[2]["name"] == "im1.jpg"
    np.testing.assert_allclose(images[2]["tvec"], [1.5, 2.5, 3.5])


def test_odm_reference_conventions(tmp_path):
    """cx/cy use the reference's raw c_x + (w-1)/2 form and the geojson pose
    branch applies NO OpenCV->OpenGL flip (odm_utils.py:127,164-172)."""
    (tmp_path / "odm_report").mkdir(parents=True)
    (tmp_path / "cameras.json").write_text(json.dumps({
        "v2 cam": {"width": 16, "height": 12, "focal_x": 0.9, "focal_y": 0.8,
                   "c_x": 0.25, "c_y": -0.5, "k3": 0.01}
    }))
    (tmp_path / "odm_report" / "shots.geojson").write_text(json.dumps({
        "features": [{"properties": {"filename": "img_000.jpg", "rotation": [0, 0, 0],
                                     "translation": [4.0, 5.0, 6.0]}}]
    }))
    data = pd.odm_to_json({"img_000": "images/img_000.jpg"}, tmp_path / "cameras.json",
                          tmp_path / "odm_report" / "shots.geojson", tmp_path / "out")
    assert data["fl_x"] == pytest.approx(0.9 * 16)
    assert data["fl_y"] == pytest.approx(0.8 * 16)
    assert data["cx"] == pytest.approx(0.25 + 7.5)
    assert data["cy"] == pytest.approx(-0.5 + 5.5)
    assert data["k3"] == pytest.approx(0.01)
    m = np.asarray(data["frames"][0]["transform_matrix"])
    np.testing.assert_allclose(m[:3, :3], np.eye(3), atol=1e-12)  # no flip


def test_realitycapture_orientation_override(tmp_path):
    """Geo-referenced RealityCapture poses pin orientation_override='none'
    (reference realitycapture_utils.py:49)."""
    imgs = _write_images(tmp_path / "out" / "images", n=1)
    csvf = tmp_path / "poses.csv"
    csvf.write_text("#name,x,y,alt,heading,pitch,roll,f,px,py,k1,k2,k3,k4,t1,t2\n"
                    "img_000.jpg,1.0,2.0,3.0,0,0,0,36.0,0,0,0,0,0,0,0,0\n")
    data = pd.realitycapture_to_json({"img_000": f"images/{imgs[0].name}"}, csvf, tmp_path / "out")
    assert data["orientation_override"] == "none"
