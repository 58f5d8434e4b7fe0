"""Video frame extraction + equirectangular -> perspective projections.

cf. reference nerfstudio/process_data/process_data_utils.py:102-223
(`get_num_frames_in_video` / `convert_video_to_images`, which shell out to
ffmpeg — not present in this environment, so frames are read with cv2) and
nerfstudio/process_data/equirect_utils.py:31-321 (`equirect2persp`,
`_crop_bound_arr_vertical`, `generate_planar_projections_from_equirectangular`
— torch/CUDA there; pure numpy here, bilinear sampling instead of cubic).
"""

from __future__ import annotations

import math
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import numpy as np


def _rodrigues(axis: np.ndarray, theta: float) -> np.ndarray:
    """Rotation matrix about `axis` by `theta` radians (cf. reference
    equirect_utils.euler_rodriguez_rotation_matrix:31)."""
    axis = np.asarray(axis, np.float64)
    axis = axis / (np.linalg.norm(axis) + 1e-12)
    a = math.cos(theta / 2.0)
    b, c, d = -axis * math.sin(theta / 2.0)
    return np.array(
        [
            [a * a + b * b - c * c - d * d, 2 * (b * c + a * d), 2 * (b * d - a * c)],
            [2 * (b * c - a * d), a * a + c * c - b * b - d * d, 2 * (c * d + a * b)],
            [2 * (b * d + a * c), 2 * (c * d - a * b), a * a + d * d - b * b - c * c],
        ]
    )


def _bilinear_wrap(img: np.ndarray, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Sample img [H, W, C] at float pixel coords (x: col, y: row); longitude
    (x) wraps, latitude (y) clamps. Reference remap_cubic uses cubic
    interpolation with border_mode='wrap'; bilinear is the numpy equivalent
    at negligible quality cost for photographic input."""
    h, w = img.shape[:2]
    x0 = np.floor(x).astype(np.int64)
    y0 = np.floor(y).astype(np.int64)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0w, x1w = x0 % w, (x0 + 1) % w
    y0c = np.clip(y0, 0, h - 1)
    y1c = np.clip(y0 + 1, 0, h - 1)
    im = img.astype(np.float32)
    top = im[y0c, x0w] * (1 - fx) + im[y0c, x1w] * fx
    bot = im[y1c, x0w] * (1 - fx) + im[y1c, x1w] * fx
    return top * (1 - fy) + bot * fy


def equirect_to_perspective(
    img: np.ndarray, fov: float, theta: float, phi: float, hd: int, wd: int
) -> np.ndarray:
    """Perspective crop from an equirectangular panorama.

    Args:
        img: [H, W, C] uint8 or float equirectangular image.
        fov: horizontal field of view, degrees.
        theta: yaw (left/right), degrees.
        phi: pitch (up/down), degrees.
        hd, wd: output height/width in pixels.

    Port of reference equirect_utils.equirect2persp:86-160 (same ray grid,
    z-axis yaw then rotated-y-axis pitch, lon/lat lookup).
    """
    equ_h, equ_w = img.shape[:2]
    equ_cx, equ_cy = equ_w / 2.0, equ_h / 2.0
    hfov = float(hd) / wd * fov
    c_x, c_y = wd / 2.0, hd / 2.0

    w_interval = 2 * math.tan(math.radians(fov / 2.0)) / wd
    h_interval = 2 * math.tan(math.radians(hfov / 2.0)) / hd

    x_map = np.ones((hd, wd), np.float64)
    y_map = np.tile((np.arange(wd) - c_x) * w_interval, (hd, 1))
    z_map = -np.tile((np.arange(hd) - c_y) * h_interval, (wd, 1)).T
    d = np.sqrt(x_map**2 + y_map**2 + z_map**2)
    xyz = np.stack([x_map / d, y_map / d, z_map / d], axis=-1)  # [hd, wd, 3]

    r1 = _rodrigues(np.array([0.0, 0.0, 1.0]), math.radians(theta))
    r2 = _rodrigues(r1 @ np.array([0.0, 1.0, 0.0]), math.radians(-phi))
    xyz = xyz.reshape(-1, 3) @ (r2 @ r1).T

    lat = np.arcsin(np.clip(xyz[:, 2], -1.0, 1.0))
    lon = np.arctan2(xyz[:, 1], xyz[:, 0])  # branchless form of the ref's quadrant cases

    lon = lon.reshape(hd, wd) / np.pi * 180
    lat = -lat.reshape(hd, wd) / np.pi * 180
    x_px = lon / 180 * equ_cx + equ_cx
    y_px = lat / 90 * equ_cy + equ_cy

    out = _bilinear_wrap(img, x_px, y_px)
    return out.astype(img.dtype) if np.issubdtype(img.dtype, np.integer) else out


def crop_bound_arr_vertical(
    bound_arr: List[Optional[float]], fov: float, crop_factor: Tuple[float, float, float, float]
) -> List[Optional[float]]:
    """Adjust the ascending pitch-ring list for top/bottom crops (exact port
    of reference equirect_utils._crop_bottom/_crop_top/_crop_bound_arr_vertical
    :161-231 — rings pushed inward by the cropped degrees, dropped (None)
    when fully outside, neighbors nudged by diff/2^distance)."""
    arr = list(bound_arr)

    if crop_factor[1] > 0:  # bottom
        chopped = 180 * crop_factor[1]
        new_bottom = 90 - chopped - fov / 2
        for i in reversed(range(len(arr))):
            el = arr[i]
            if el is None:
                continue
            if el > new_bottom + fov / 2:
                arr[i] = None
            elif el > new_bottom:
                diff = el - new_bottom
                arr[i] = new_bottom
                for j in range(i - 1, -1, -1):
                    if arr[j] is not None:
                        arr[j] -= diff / (2 ** (i - j))
                break

    if crop_factor[0] > 0:  # top
        chopped = 180 * crop_factor[0]
        new_top = -90 + chopped + fov / 2
        for i in range(len(arr)):
            el = arr[i]
            if el is None:
                continue
            if el < new_top - fov / 2:
                arr[i] = None
            elif el < new_top:
                diff = new_top - el
                arr[i] = new_top
                for j in range(i + 1, len(arr)):
                    if arr[j] is not None:
                        arr[j] += diff / (2 ** (j - i))
                break

    return arr


def equirect_yaw_pitch_pairs(
    samples_per_im: int, crop_factor: Tuple[float, float, float, float] = (0.0, 0.0, 0.0, 0.0)
) -> Tuple[float, List[Tuple[float, float]]]:
    """(fov, [(yaw, pitch)]) sampling layout for 8 or 14 crops per panorama
    (reference generate_planar_projections_from_equirectangular:258-292:
    8 -> fov 120, horizon ring every 90deg + up/down rings every 180deg;
    14 -> fov 110, horizon every 60deg + rings every 90deg)."""
    if samples_per_im not in (8, 14):
        raise ValueError("samples_per_im must be 8 or 14")
    left, right = -180.0, 180.0
    if crop_factor[3] > 0:
        left = -180 + 360 * crop_factor[3]
    if crop_factor[2] > 0:
        right = 180 - 360 * crop_factor[2]
    fov = 120.0 if samples_per_im == 8 else 110.0
    mid_step = 90.0 if samples_per_im == 8 else 60.0
    ring_step = 180.0 if samples_per_im == 8 else 90.0
    bound_arr = crop_bound_arr_vertical([-45.0, 0.0, 45.0], fov, crop_factor)
    pairs: List[Tuple[float, float]] = []
    if bound_arr[1] is not None:
        pairs += [(y, bound_arr[1]) for y in np.arange(left, right, mid_step)]
    if bound_arr[2] is not None:
        pairs += [(y, bound_arr[2]) for y in np.arange(left, right, ring_step)]
    if bound_arr[0] is not None:
        pairs += [(y, bound_arr[0]) for y in np.arange(left, right, ring_step)]
    return fov, pairs


def generate_planar_projections(
    image_dir: Path,
    planar_image_size: Tuple[int, int],
    samples_per_im: int,
    crop_factor: Tuple[float, float, float, float] = (0.0, 0.0, 0.0, 0.0),
) -> Path:
    """Write <stem>_<k>.jpg perspective crops for every panorama in
    image_dir into image_dir/planar_projections (reference
    generate_planar_projections_from_equirectangular:233-321)."""
    import PIL.Image

    image_dir = Path(image_dir)
    out_dir = image_dir / "planar_projections"
    out_dir.mkdir(exist_ok=True)
    wd, hd = planar_image_size
    fov, pairs = equirect_yaw_pitch_pairs(samples_per_im, crop_factor)
    for p in sorted(image_dir.iterdir()):
        if p.suffix.lower() not in (".jpg", ".jpeg", ".png", ".tif", ".tiff"):
            continue
        img = np.asarray(PIL.Image.open(p).convert("RGB"))
        for k, (yaw, pitch) in enumerate(pairs):
            crop = equirect_to_perspective(img, fov, yaw, pitch, hd, wd)
            PIL.Image.fromarray(crop.astype(np.uint8)).save(out_dir / f"{p.stem}_{k}.jpg")
    return out_dir


def video_to_images(
    video_path: Path,
    image_dir: Path,
    num_frames_target: int,
    num_downscales: int = 3,
    image_prefix: str = "frame_",
) -> Tuple[List[str], int]:
    """Extract ~evenly-spaced frames from a video into image_dir (+
    images_{2,4,8} downscales) and return (relative paths, count).

    Reference convert_video_to_images:120-223 runs ffmpeg with a
    `thumbnail=spacing` filter at spacing = num_frames // target; same
    selection rule here via cv2.VideoCapture (ffmpeg absent in this env).
    """
    import cv2
    import PIL.Image

    video_path, image_dir = Path(video_path), Path(image_dir)
    if not video_path.exists():
        raise FileNotFoundError(str(video_path))
    cap = cv2.VideoCapture(str(video_path))
    num_frames = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    if num_frames <= 0:
        cap.release()
        raise ValueError(f"video has no frames: {video_path}")
    spacing = max(1, num_frames // max(1, num_frames_target))
    keep = set(range(0, num_frames, spacing))

    dirs = [(1, image_dir)] + [(2**i, Path(f"{image_dir}_{2**i}")) for i in range(1, num_downscales + 1)]
    for _, d in dirs:
        d.mkdir(parents=True, exist_ok=True)

    rel_paths: List[str] = []
    out_idx = 0
    for frame_idx in range(num_frames):
        ok, frame = cap.read()
        if not ok:
            break
        if frame_idx not in keep:
            continue
        out_idx += 1
        name = f"{image_prefix}{out_idx:05d}.png"
        rgb = frame[..., ::-1]  # cv2 gives BGR
        img = PIL.Image.fromarray(rgb)
        for scale, d in dirs:
            out = img if scale == 1 else img.resize((max(1, img.width // scale), max(1, img.height // scale)))
            out.save(d / name)
        rel_paths.append(f"./{image_dir.name}/{name}")
    cap.release()
    return rel_paths, len(rel_paths)
