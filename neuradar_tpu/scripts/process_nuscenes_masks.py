"""Render dynamic-object masks for nuScenes from cuboid annotations.

cf. reference nerfstudio/scripts/datasets/process_nuscenes_masks.py:28-146:
instances moving faster than velocity_thresh in ANY frame are dynamic; their
boxes are projected per camera and all six faces rasterized to 0 in a
900x1600 mask (CAM_BACK additionally masks the ego truck strip). The
geometry core here is devkit-free (testable); the CLI needs the nuscenes
devkit on the data root, like the nuscenes dataparser.

Usage:
  python -m neuradar_tpu.scripts.process_nuscenes_masks --data-dir /data/nuscenes \
      --output-dir masks_out [--version v1.0-mini] [--velocity-thresh 0.75]
"""

from __future__ import annotations

import argparse
from pathlib import Path
from typing import Iterable, List

import numpy as np

# the reference rasterizes the quad faces of the box in this corner order
# (nuscenes Box.corners() convention), process_nuscenes_masks.py:113-119
_BOX_FACES = ((0, 1, 2, 3), (4, 5, 6, 7), (0, 1, 5, 4), (2, 3, 7, 6), (0, 3, 7, 4), (1, 2, 6, 5))


def view_points(points: np.ndarray, intrinsics: np.ndarray) -> np.ndarray:
    """[3, N] camera-frame points -> [2, N] normalized pixel coords
    (nuscenes geometry_utils.view_points with normalize=True — including its
    behind-camera flip behavior, which the reference notes as a known
    limitation)."""
    viewpad = np.eye(4)
    viewpad[:3, :3] = intrinsics
    n = points.shape[1]
    pts = np.concatenate([points, np.ones((1, n))])
    proj = viewpad @ pts
    return proj[:2] / proj[2:3]


def rasterize_box_faces(mask: np.ndarray, corners_cam: np.ndarray, intrinsics: np.ndarray) -> None:
    """Zero out the projection of a cuboid (corners_cam [3, 8], camera frame)
    in `mask` (uint8 [H, W], modified in place) by filling all six faces."""
    import cv2

    corners = np.round(view_points(corners_cam, intrinsics)).astype(np.int32).T  # [8, 2]
    for face in _BOX_FACES:
        cv2.fillPoly(mask, [corners[list(face)]], 0)


def make_camera_mask(
    boxes_corners_cam: Iterable[np.ndarray],
    intrinsics: np.ndarray,
    hw=(900, 1600),
    mask_ego_truck: bool = False,
) -> np.ndarray:
    """uint8 {0, 1} mask for one camera frame: 1 = keep, 0 = dynamic object
    (reference mask semantics; mask_ego_truck zeroes the bottom 100 rows for
    CAM_BACK)."""
    mask = np.ones(hw, dtype=np.uint8)
    if mask_ego_truck:
        mask[-100:] = 0
    for corners in boxes_corners_cam:
        rasterize_box_faces(mask, np.asarray(corners, np.float64), np.asarray(intrinsics, np.float64))
    return mask


def dynamic_instance_tokens(nusc, velocity_thresh: float = 0.75) -> set:
    """Tokens of instances whose annotated velocity exceeds the threshold in
    ANY frame (reference :74-84)."""
    dynamic = set()
    for instance in nusc.instance:
        ann_token = instance["first_annotation_token"]
        while ann_token:
            velocity = nusc.box_velocity(ann_token)
            if not np.linalg.norm(velocity) < velocity_thresh:  # NaN-safe, same as reference
                dynamic.add(instance["token"])
                break
            ann_token = nusc.get("sample_annotation", ann_token)["next"]
    return dynamic


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--data-dir", type=Path, required=True)
    parser.add_argument("--output-dir", type=Path, required=True)
    parser.add_argument("--version", default="v1.0-mini")
    parser.add_argument("--velocity-thresh", type=float, default=0.75)
    parser.add_argument("--cameras", nargs="+",
                        default=["FRONT", "FRONT_LEFT", "FRONT_RIGHT", "BACK", "BACK_LEFT", "BACK_RIGHT"])
    args = parser.parse_args(argv)

    try:
        from nuscenes.nuscenes import NuScenes as NuScenesDatabase
        from nuscenes.utils.geometry_utils import BoxVisibility
    except ImportError:
        print("error: the nuscenes devkit is not installed in this environment "
              "(same gate as the nuscenes dataparser)")
        return 2
    import cv2

    nusc = NuScenesDatabase(version=args.version, dataroot=str(args.data_dir.absolute()), verbose=False)
    cameras: List[str] = ["CAM_" + c for c in args.cameras]
    for camera in cameras:
        (args.output_dir / "masks" / camera).mkdir(parents=True, exist_ok=True)

    dynamic = dynamic_instance_tokens(nusc, args.velocity_thresh)
    samples = sorted(nusc.sample, key=lambda x: (x["scene_token"], x["timestamp"]))
    for sample in samples:
        for camera in cameras:
            camera_data = nusc.get("sample_data", sample["data"][camera])
            calibrated = nusc.get("calibrated_sensor", camera_data["calibrated_sensor_token"])
            intrinsics = np.array(calibrated["camera_intrinsic"])
            _, boxes, _ = nusc.get_sample_data(sample["data"][camera], box_vis_level=BoxVisibility.ANY)
            corners = [
                box.corners() for box in boxes
                if nusc.get("sample_annotation", box.token)["instance_token"] in dynamic
            ]
            mask = make_camera_mask(corners, intrinsics, mask_ego_truck=(camera == "CAM_BACK"))
            maskname = Path(camera_data["filename"]).name.replace("jpg", "png")
            cv2.imwrite(str(args.output_dir / "masks" / camera / maskname), mask * 255)
    print(f"wrote masks for {len(samples)} samples x {len(cameras)} cameras to {args.output_dir / 'masks'}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
