"""Capture-format converters -> transforms.json (see package docstring).

Each converter returns the transforms dict it wrote. Pose conventions follow
the reference exactly (cited per function) so outputs are interchangeable
with stock nerfstudio datasets.
"""

from __future__ import annotations

import csv
import json
import struct
import xml.etree.ElementTree as ET
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np


def _write(output_dir: Path, data: dict) -> dict:
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    with open(output_dir / "transforms.json", "w", encoding="utf-8") as f:
        json.dump(data, f, indent=4)
    return data


def copy_and_downscale_images(
    image_paths: List[Path], output_dir: Path, num_downscales: int = 3, prefix: str = "frame_"
) -> List[str]:
    """Copy images to <out>/images plus images_{2,4,8,...} power-of-two
    downscales (cf. process_data_utils.copy_images+downscale_images, which
    shell out to ffmpeg; PIL here). Returns the relative file paths."""
    import PIL.Image

    output_dir = Path(output_dir)
    rel_paths = []
    dirs = [(1, output_dir / "images")] + [
        (2**i, output_dir / f"images_{2**i}") for i in range(1, num_downscales + 1)
    ]
    for _, d in dirs:
        d.mkdir(parents=True, exist_ok=True)
    for i, src in enumerate(image_paths):
        name = f"{prefix}{i + 1:05d}{Path(src).suffix}"
        img = PIL.Image.open(src)
        for scale, d in dirs:
            out = img if scale == 1 else img.resize((max(1, img.width // scale), max(1, img.height // scale)))
            out.save(d / name)
        rel_paths.append(f"./images/{name}")
    return rel_paths


# -- polycam ------------------------------------------------------------------


def polycam_to_json(
    image_filenames: List[Path],
    cameras_dir: Path,
    output_dir: Path,
    min_blur_score: float = 0.0,
    crop_border_pixels: int = 0,
    depth_filenames: Optional[List[Path]] = None,
) -> dict:
    """Polycam keyframes -> transforms.json (cf. polycam_utils.polycam_to_json:
    per-frame fx/fy/cx/cy and the t_ij row permutation at :74-79)."""
    use_depth = depth_filenames is not None and len(depth_filenames) == len(image_filenames)
    frames = []
    for i, image_filename in enumerate(image_filenames):
        fj = json.loads((Path(cameras_dir) / f"{Path(image_filename).stem}.json").read_text())
        if fj.get("blur_score", np.inf) < min_blur_score:
            continue
        frame = {
            "fl_x": fj["fx"], "fl_y": fj["fy"],
            "cx": fj["cx"] - crop_border_pixels, "cy": fj["cy"] - crop_border_pixels,
            "w": fj["width"] - 2 * crop_border_pixels, "h": fj["height"] - 2 * crop_border_pixels,
            "file_path": f"./images/frame_{i + 1:05d}{Path(image_filename).suffix}",
            # row permutation (z, x, y) of the stored matrix — polycam's ARKit
            # frame to the nerfstudio world convention
            "transform_matrix": [
                [fj["t_20"], fj["t_21"], fj["t_22"], fj["t_23"]],
                [fj["t_00"], fj["t_01"], fj["t_02"], fj["t_03"]],
                [fj["t_10"], fj["t_11"], fj["t_12"], fj["t_13"]],
                [0.0, 0.0, 0.0, 1.0],
            ],
        }
        if use_depth:
            frame["depth_file_path"] = f"./depth/frame_{i + 1:05d}{Path(depth_filenames[i]).suffix}"
        frames.append(frame)
    if not frames:
        raise ValueError("no frames remain after blur filtering")
    return _write(output_dir, {"camera_model": "OPENCV", "orientation_override": "none", "frames": frames})


# -- record3d -----------------------------------------------------------------


def _quat_xyzw_to_mat(q: np.ndarray) -> np.ndarray:
    """Scalar-last (x, y, z, w) quaternion -> rotation matrix."""
    x, y, z, w = q
    n = x * x + y * y + z * z + w * w
    s = 0.0 if n < 1e-12 else 2.0 / n
    xs, ys, zs = x * s, y * s, z * s
    return np.array([
        [1 - (y * ys + z * zs), x * ys - w * zs, x * zs + w * ys],
        [x * ys + w * zs, 1 - (x * xs + z * zs), y * zs - w * xs],
        [x * zs - w * ys, y * zs + w * xs, 1 - (x * xs + y * ys)],
    ])


def record3d_to_json(
    image_paths: List[Path], metadata_path: Path, output_dir: Path, indices: Optional[np.ndarray] = None
) -> dict:
    """Record3D metadata -> transforms.json (cf. record3d_utils:28-92 —
    scalar-last quats, shared intrinsics from K, centered principal point)."""
    meta = json.loads(Path(metadata_path).read_text())
    poses = np.asarray(meta["poses"], np.float64)  # [N, 7] = qx qy qz qw tx ty tz
    if indices is None:
        indices = np.arange(len(image_paths))
    frames = []
    for i, im_path in enumerate(image_paths):
        p = poses[int(indices[i])]
        c2w = np.eye(4)
        c2w[:3, :3] = _quat_xyzw_to_mat(p[:4])
        c2w[:3, 3] = p[4:7]
        frames.append({"file_path": Path(im_path).as_posix(), "transform_matrix": c2w.tolist()})
    K = np.asarray(meta["K"], np.float64).reshape(3, 3).T
    return _write(output_dir, {
        "fl_x": float(K[0, 0]), "fl_y": float(K[0, 0]),
        "cx": meta["w"] / 2.0, "cy": meta["h"] / 2.0,
        "w": meta["w"], "h": meta["h"],
        "camera_model": "PERSPECTIVE",
        "frames": frames,
    })


# -- metashape ----------------------------------------------------------------


def _ms_param(calib, name: str) -> float:
    e = calib.find(name)
    return float(e.text) if e is not None else 0.0


def metashape_to_json(image_filename_map: Dict[str, Path], xml_filename: Path, output_dir: Path) -> dict:
    """Metashape cameras.xml -> transforms.json (cf. metashape_utils:35-199:
    per-sensor calibration, component transforms, (2,0,1) row permute with
    y/z negation)."""
    root = ET.parse(str(xml_filename)).getroot()
    chunk = root[0]
    sensors = chunk.find("sensors")
    if sensors is None:
        raise ValueError("No sensors found")
    calibrated = [s for s in sensors if s.get("type") == "spherical" or s.find("calibration") is not None]
    if not calibrated:
        raise ValueError("No calibrated sensor found in Metashape XML")
    types = {s.get("type") for s in calibrated}
    if len(types) != 1:
        raise ValueError("mixed Metashape sensor types are unsupported")
    camera_model = {"frame": "OPENCV", "fisheye": "OPENCV_FISHEYE", "spherical": "EQUIRECTANGULAR"}.get(
        next(iter(types))
    )
    if camera_model is None:
        raise ValueError(f"Unsupported Metashape sensor type {types}")

    sensor_dict = {}
    for sensor in calibrated:
        res = sensor.find("resolution")
        s = {"w": int(res.get("width")), "h": int(res.get("height"))}
        calib = sensor.find("calibration")
        if calib is None:
            s.update(fl_x=s["w"] / 2.0, fl_y=float(s["h"]), cx=s["w"] / 2.0, cy=s["h"] / 2.0)
        else:
            f = float(calib.find("f").text)
            s.update(
                fl_x=f, fl_y=f,
                cx=_ms_param(calib, "cx") + s["w"] / 2.0, cy=_ms_param(calib, "cy") + s["h"] / 2.0,
                k1=_ms_param(calib, "k1"), k2=_ms_param(calib, "k2"), k3=_ms_param(calib, "k3"),
                k4=_ms_param(calib, "k4"), p1=_ms_param(calib, "p1"), p2=_ms_param(calib, "p2"),
            )
        sensor_dict[sensor.get("id")] = s

    components = {}
    comps = chunk.find("components")
    if comps is not None:
        for component in comps:
            transform = component.find("transform")
            if transform is None:
                continue
            rot = transform.find("rotation")
            r = np.eye(3) if rot is None else np.array([float(x) for x in rot.text.split()]).reshape(3, 3)
            trans = transform.find("translation")
            t = np.zeros(3) if trans is None else np.array([float(x) for x in trans.text.split()])
            sc = transform.find("scale")
            s = 1.0 if sc is None else float(sc.text)
            m = np.eye(4)
            m[:3, :3] = r
            m[:3, 3] = t / s
            components[component.get("id")] = m

    frames = []
    for camera in chunk.find("cameras"):
        label = camera.get("label", "")
        if label not in image_filename_map:
            label = label.split(".")[0]
            if label not in image_filename_map:
                continue
        sensor = sensor_dict.get(camera.get("sensor_id"))
        tr = camera.find("transform")
        if sensor is None or tr is None:
            continue
        transform = np.array([float(x) for x in tr.text.split()]).reshape(4, 4)
        comp = components.get(camera.get("component_id"))
        if comp is not None:
            transform = comp @ transform
        transform = transform[[2, 0, 1, 3], :]
        transform[:, 1:3] *= -1
        frame = {"file_path": Path(image_filename_map[label]).as_posix(), **sensor,
                 "transform_matrix": transform.tolist()}
        frames.append(frame)
    return _write(output_dir, {"camera_model": camera_model, "frames": frames})


# -- realitycapture -----------------------------------------------------------


def _rc_rotation(yaw: float, pitch: float, roll: float) -> np.ndarray:
    """cf. realitycapture_utils._get_rotation_matrix:113-127."""
    sy, cy = np.sin(np.deg2rad(yaw)), np.cos(np.deg2rad(yaw))
    sp, cp = np.sin(np.deg2rad(pitch)), np.cos(np.deg2rad(pitch))
    sr, cr = np.sin(np.deg2rad(roll)), np.cos(np.deg2rad(roll))
    rot_x = np.array([[1, 0, 0], [0, cp, -sp], [0, sp, cp]])
    rot_y = np.array([[cr, 0, sr], [0, 1, 0], [-sr, 0, cr]])
    rot_z = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]])
    return rot_z @ rot_x @ rot_y


def realitycapture_to_json(
    image_filename_map: Dict[str, Path], csv_filename: Path, output_dir: Path,
    image_sizes: Optional[Dict[str, tuple]] = None,
) -> dict:
    """RealityCapture CSV export -> transforms.json (cf. realitycapture_utils:
    35-mm-equivalent focal scaling at :76-80, -heading/pitch/roll rotation)."""
    with open(csv_filename, encoding="utf-8") as f:
        rows = list(csv.DictReader(f))
    frames = []
    for row in rows:
        basename = row["#name"].rpartition(".")[0] if "#name" in row else row["name"].rpartition(".")[0]
        if basename not in image_filename_map:
            continue
        path = Path(image_filename_map[basename])
        if image_sizes and basename in image_sizes:
            height, width = image_sizes[basename]
        else:
            import PIL.Image

            with PIL.Image.open(path if path.is_absolute() else Path(output_dir) / path) as im:
                width, height = im.size
        transform = np.eye(4)
        transform[:3, :3] = _rc_rotation(-float(row["heading"]), float(row["pitch"]), float(row["roll"]))
        transform[:3, 3] = [float(row["x"]), float(row["y"]), float(row["alt"])]
        frames.append({
            "h": int(height), "w": int(width), "file_path": path.as_posix(),
            "fl_x": float(row["f"]) * max(width, height) / 36,
            "fl_y": float(row["f"]) * max(width, height) / 36,
            "cx": float(row["px"]) / 36.0 + width / 2.0,
            "cy": float(row["py"]) / 36.0 + height / 2.0,
            "k1": float(row.get("k1", 0)), "k2": float(row.get("k2", 0)),
            "k3": float(row.get("k3", 0)), "k4": float(row.get("k4", 0)),
            "p1": float(row.get("t1", 0)), "p2": float(row.get("t2", 0)),
            "transform_matrix": transform.tolist(),
        })
    # RealityCapture poses are geo-referenced; the reference pins
    # orientation_override='none' so auto-orientation doesn't re-rotate the
    # world (realitycapture_utils.py:49)
    return _write(output_dir, {"camera_model": "OPENCV", "orientation_override": "none",
                               "frames": frames})


# -- ODM ----------------------------------------------------------------------


def odm_to_json(image_filename_map: Dict[str, Path], cameras_json: Path, shots_geojson: Path,
                output_dir: Path) -> dict:
    """OpenDroneMap cameras.json + odm_report shots.geojson -> transforms.json
    (cf. odm_utils.cameras2nerfds: normalized focal * max(w, h), per-shot
    translation + rotation in axis-angle)."""
    cams = json.loads(Path(cameras_json).read_text())
    cam = next(iter(cams.values()))
    w, h = int(cam["width"]), int(cam["height"])
    scale = max(w, h)
    # intrinsics convention matches reference odm_utils.cameras2nerfds
    # (:124-133): focal_x/focal_y preferred over the shared focal, principal
    # point added RAW to the (dim-1)/2 center (OpenSfM's c_x/c_y are
    # near-zero pixel offsets there)
    data = {
        "w": w, "h": h,
        "fl_x": float(cam.get("focal_x", cam.get("focal", 0.85))) * scale,
        "fl_y": float(cam.get("focal_y", cam.get("focal", 0.85))) * scale,
        "cx": float(cam.get("c_x", 0)) + (w - 1.0) / 2.0,
        "cy": float(cam.get("c_y", 0)) + (h - 1.0) / 2.0,
        "k1": float(cam.get("k1", 0)), "k2": float(cam.get("k2", 0)),
        "k3": float(cam.get("k3", 0)),
        "p1": float(cam.get("p1", 0)), "p2": float(cam.get("p2", 0)),
        "camera_model": "OPENCV",
    }
    shots = json.loads(Path(shots_geojson).read_text())
    frames = []
    for feat in shots.get("features", []):
        props = feat["properties"]
        name = Path(props["filename"]).stem
        if name not in image_filename_map:
            continue
        rot = np.asarray(props["rotation"], np.float64)
        angle = np.linalg.norm(rot)
        if angle < 1e-12:
            R = np.eye(3)
        else:
            k = rot / angle
            K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
            R = np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * (K @ K)
        c2w = np.eye(4)
        # R.T == rodrigues(-rotation): the reference's geojson branch
        # (odm_utils.py:164-172) builds the matrix from the NEGATED axis-angle
        # and applies NO OpenCV->OpenGL flip (unlike its reconstruction.json
        # branch) — shots.geojson already carries the final convention
        c2w[:3, :3] = R.T
        c2w[:3, 3] = np.asarray(props["translation"], np.float64)
        frames.append({"file_path": Path(image_filename_map[name]).as_posix(),
                       "transform_matrix": c2w.tolist()})
    data["frames"] = frames
    return _write(output_dir, data)


# -- COLMAP sparse models -----------------------------------------------------

# (model_name, num_params) by COLMAP model id — colmap/src/base/camera_models.h
_COLMAP_MODELS = {
    0: ("SIMPLE_PINHOLE", 3), 1: ("PINHOLE", 4), 2: ("SIMPLE_RADIAL", 4), 3: ("RADIAL", 5),
    4: ("OPENCV", 8), 5: ("OPENCV_FISHEYE", 8), 6: ("FULL_OPENCV", 12), 7: ("FOV", 5),
    8: ("SIMPLE_RADIAL_FISHEYE", 4), 9: ("RADIAL_FISHEYE", 5), 10: ("THIN_PRISM_FISHEYE", 12),
}


def read_colmap_cameras(path: Path) -> Dict[int, dict]:
    """cameras.bin or cameras.txt -> {camera_id: {model, width, height, params}}."""
    path = Path(path)
    cams = {}
    if path.suffix == ".txt":
        for line in path.read_text().splitlines():
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            cams[int(parts[0])] = {
                "model": parts[1], "width": int(parts[2]), "height": int(parts[3]),
                "params": np.array([float(x) for x in parts[4:]]),
            }
        return cams
    with open(path, "rb") as f:
        (n,) = struct.unpack("<Q", f.read(8))
        for _ in range(n):
            cam_id, model_id, width, height = struct.unpack("<iiQQ", f.read(24))
            name, n_params = _COLMAP_MODELS[model_id]
            params = struct.unpack(f"<{n_params}d", f.read(8 * n_params))
            cams[cam_id] = {"model": name, "width": width, "height": height,
                            "params": np.asarray(params)}
    return cams


def read_colmap_images(path: Path) -> Dict[int, dict]:
    """images.bin or images.txt -> {image_id: {qvec, tvec, camera_id, name}}."""
    path = Path(path)
    images = {}
    if path.suffix == ".txt":
        # image/points lines strictly alternate, and a zero-observation image
        # has an EMPTY points line — keep blanks so the pairing stays in
        # phase (cf. reference colmap_parsing_utils.read_images_text, which
        # reads the points line pairwise for the same reason)
        lines = [ln for ln in path.read_text().splitlines() if not ln.startswith("#")]
        expect_pose = True
        for ln in lines:
            if expect_pose and not ln.strip():
                continue  # blank separator before an image entry
            if expect_pose:
                p = ln.split()
                images[int(p[0])] = {
                    "qvec": np.array([float(x) for x in p[1:5]]),
                    "tvec": np.array([float(x) for x in p[5:8]]),
                    "camera_id": int(p[8]), "name": p[9],
                }
            expect_pose = not expect_pose  # next line is the 2D point list (possibly empty)
        return images
    with open(path, "rb") as f:
        (n,) = struct.unpack("<Q", f.read(8))
        for _ in range(n):
            image_id = struct.unpack("<i", f.read(4))[0]
            qvec = np.asarray(struct.unpack("<4d", f.read(32)))
            tvec = np.asarray(struct.unpack("<3d", f.read(24)))
            (camera_id,) = struct.unpack("<i", f.read(4))
            name = b""
            while True:
                c = f.read(1)
                if c == b"\x00":
                    break
                name += c
            (n_pts,) = struct.unpack("<Q", f.read(8))
            f.read(24 * n_pts)  # skip 2D points (x, y, point3D_id)
            images[image_id] = {"qvec": qvec, "tvec": tvec, "camera_id": camera_id,
                                "name": name.decode()}
    return images


def _qvec2rotmat(q: np.ndarray) -> np.ndarray:
    """COLMAP scalar-FIRST quaternion -> rotation matrix."""
    w, x, y, z = q
    return np.array([
        [1 - 2 * y * y - 2 * z * z, 2 * x * y - 2 * w * z, 2 * x * z + 2 * w * y],
        [2 * x * y + 2 * w * z, 1 - 2 * x * x - 2 * z * z, 2 * y * z - 2 * w * x],
        [2 * x * z - 2 * w * y, 2 * y * z + 2 * w * x, 1 - 2 * x * x - 2 * y * y],
    ])


def colmap_to_json(recon_dir: Path, output_dir: Path, keep_original_world_coordinate: bool = False) -> dict:
    """Existing COLMAP sparse model -> transforms.json (cf. colmap_utils.
    colmap_to_json:419-441: w2c invert, OpenCV->OpenGL flip, (0, 2, 1) world
    permute with z negation). Works with .bin or .txt models."""
    recon_dir = Path(recon_dir)
    cam_path = recon_dir / "cameras.bin"
    img_path = recon_dir / "images.bin"
    if not cam_path.exists():
        cam_path, img_path = recon_dir / "cameras.txt", recon_dir / "images.txt"
    cams = read_colmap_cameras(cam_path)
    images = read_colmap_images(img_path)
    if len(cams) != 1:
        raise ValueError("only single-camera COLMAP models are supported (like the reference)")
    cam = next(iter(cams.values()))
    params = cam["params"]
    model = cam["model"]
    if model == "SIMPLE_PINHOLE":
        intr = {"fl_x": params[0], "fl_y": params[0], "cx": params[1], "cy": params[2]}
    elif model == "PINHOLE":
        intr = {"fl_x": params[0], "fl_y": params[1], "cx": params[2], "cy": params[3]}
    elif model in ("OPENCV", "OPENCV_FISHEYE"):
        intr = {"fl_x": params[0], "fl_y": params[1], "cx": params[2], "cy": params[3],
                "k1": params[4], "k2": params[5]}
        if model == "OPENCV":
            intr.update(p1=params[6], p2=params[7])
        else:
            intr.update(k3=params[6], k4=params[7])
    elif model == "SIMPLE_RADIAL":
        intr = {"fl_x": params[0], "fl_y": params[0], "cx": params[1], "cy": params[2], "k1": params[3]}
    else:
        raise ValueError(f"unsupported COLMAP camera model {model}")
    intr = {k: float(v) for k, v in intr.items()}

    frames = []
    for im in images.values():
        w2c = np.eye(4)
        w2c[:3, :3] = _qvec2rotmat(im["qvec"])
        w2c[:3, 3] = im["tvec"]
        c2w = np.linalg.inv(w2c)
        c2w[0:3, 1:3] *= -1  # OpenCV -> OpenGL camera axes
        if not keep_original_world_coordinate:
            c2w = c2w[np.array([0, 2, 1, 3]), :]
            c2w[2, :] *= -1
        frames.append({"file_path": f"./images/{im['name']}", "transform_matrix": c2w.tolist()})
    frames.sort(key=lambda fr: fr["file_path"])
    data = {
        **intr, "w": int(cam["width"]), "h": int(cam["height"]),
        "camera_model": "OPENCV_FISHEYE" if "FISHEYE" in model else "OPENCV",
        "frames": frames,
    }
    return _write(output_dir, data)
