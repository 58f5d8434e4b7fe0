"""Dataset ingestion CLI: capture exports -> a nerfstudio-format dataset.

cf. reference nerfstudio/scripts/process_data.py (ns-process-data). The
reference's `images`/`video` commands shell out to COLMAP/ffmpeg — the
binaries are absent in this image — so `images` consumes an EXISTING COLMAP
sparse model (--colmap-model-path), `video` extracts frames via cv2 and then
likewise needs a model path for poses, `equirect` slices panoramas into 8/14
perspective crops, and the capture-format commands (polycam, record3d,
metashape, realitycapture, odm) are full conversions (see
neuradar_tpu/process_data/).

Usage:
  python -m neuradar_tpu.scripts.process_data polycam --data <capture_dir> --output-dir out/
  python -m neuradar_tpu.scripts.process_data images --data <imgs> --colmap-model-path sparse/0 --output-dir out/
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

IMAGE_EXTS = {".jpg", ".jpeg", ".png"}


def _list_images(d: Path):
    return sorted(p for p in Path(d).iterdir() if p.suffix.lower() in IMAGE_EXTS)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("command", choices=["images", "video", "equirect", "polycam", "record3d",
                                            "metashape", "realitycapture", "odm"])
    parser.add_argument("--data", type=Path, required=True, help="capture directory (or images dir)")
    parser.add_argument("--output-dir", type=Path, required=True)
    parser.add_argument("--num-downscales", type=int, default=3)
    parser.add_argument("--colmap-model-path", type=Path, default=None,
                        help="images: existing COLMAP sparse model dir (cameras.bin/images.bin or .txt)")
    parser.add_argument("--xml", type=Path, default=None, help="metashape: cameras xml (default: <data>/cameras.xml)")
    parser.add_argument("--csv", type=Path, default=None, help="realitycapture: csv export")
    parser.add_argument("--min-blur-score", type=float, default=25.0, help="polycam keyframe filter")
    parser.add_argument("--max-dataset-size", type=int, default=600)
    parser.add_argument("--num-frames-target", type=int, default=300, help="video: frames to extract")
    parser.add_argument("--images-per-equirect", type=int, choices=(8, 14), default=8)
    parser.add_argument("--planar-size", type=str, default="1080x1440",
                        help="equirect: HxW of each perspective crop")
    args = parser.parse_args(argv)

    from neuradar_tpu import process_data as pd

    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)

    if args.command == "images":
        if args.colmap_model_path is None:
            print("error: no COLMAP binary in this environment — run COLMAP elsewhere and pass "
                  "--colmap-model-path <sparse/0> (cf. reference images_to_nerfstudio_dataset.py)",
                  file=sys.stderr)
            return 2
        imgs = _list_images(args.data)[: args.max_dataset_size]
        # keep original names: the COLMAP model references them
        import shutil

        (out / "images").mkdir(exist_ok=True)
        for p in imgs:
            shutil.copy2(p, out / "images" / p.name)
        pd.colmap_to_json(args.colmap_model_path, out)
    elif args.command == "video":
        # frame extraction (reference convert_video_to_images); pose
        # estimation still needs COLMAP run elsewhere, like `images`
        rels, n = pd.video_to_images(args.data, out / "images",
                                     num_frames_target=args.num_frames_target,
                                     num_downscales=args.num_downscales)
        print(f"extracted {n} frames -> {out / 'images'}")
        if args.colmap_model_path is not None:
            pd.colmap_to_json(args.colmap_model_path, out)
        else:
            print("no --colmap-model-path: stopping after frame extraction "
                  "(run COLMAP on the frames, then re-run with the model path)")
            return 0
    elif args.command == "equirect":
        # panoramas -> 8/14 perspective crops each (reference
        # equirect_utils.generate_planar_projections_from_equirectangular);
        # downstream, treat the crops like any images dataset
        h, w = (int(v) for v in args.planar_size.split("x"))
        crops_dir = pd.generate_planar_projections(args.data, (w, h), args.images_per_equirect)
        imgs = _list_images(crops_dir)[: args.max_dataset_size]
        pd.copy_and_downscale_images(imgs, out, args.num_downscales)
        print(f"wrote {len(imgs)} perspective crops -> {out / 'images'}")
        if args.colmap_model_path is not None:
            pd.colmap_to_json(args.colmap_model_path, out)
        else:
            return 0
    elif args.command == "polycam":
        # polycam exports keyframes/{images,cameras} (corrected_* when present)
        root = args.data
        img_dir = next((root / k for k in ("keyframes/corrected_images", "keyframes/images")
                        if (root / k).is_dir()), None)
        cam_dir = next((root / k for k in ("keyframes/corrected_cameras", "keyframes/cameras")
                        if (root / k).is_dir()), None)
        if img_dir is None or cam_dir is None:
            print(f"error: no keyframes/{{images,cameras}} under {root}", file=sys.stderr)
            return 2
        imgs = _list_images(img_dir)[: args.max_dataset_size]
        pd.copy_and_downscale_images(imgs, out, args.num_downscales)
        pd.polycam_to_json(imgs, cam_dir, out, min_blur_score=args.min_blur_score)
    elif args.command == "record3d":
        img_dir = args.data / "rgb" if (args.data / "rgb").is_dir() else args.data
        imgs = _list_images(img_dir)[: args.max_dataset_size]
        rels = pd.copy_and_downscale_images(imgs, out, args.num_downscales)
        import numpy as np

        indices = np.asarray([int(Path(p).stem) if Path(p).stem.isdigit() else i
                              for i, p in enumerate(imgs)])
        pd.record3d_to_json([Path(r) for r in rels], args.data / "metadata.json", out, indices)
    elif args.command == "metashape":
        xml = args.xml or (args.data / "cameras.xml")
        imgs = _list_images(args.data)[: args.max_dataset_size]
        rels = pd.copy_and_downscale_images(imgs, out, args.num_downscales)
        name_map = {p.stem: Path(r) for p, r in zip(imgs, rels)}
        pd.metashape_to_json(name_map, xml, out)
    elif args.command == "realitycapture":
        csv_path = args.csv or next(args.data.glob("*.csv"))
        imgs = _list_images(args.data)[: args.max_dataset_size]
        rels = pd.copy_and_downscale_images(imgs, out, args.num_downscales)
        name_map = {p.stem: Path(r) for p, r in zip(imgs, rels)}
        pd.realitycapture_to_json(name_map, csv_path, out)
    elif args.command == "odm":
        img_dir = args.data / "images" if (args.data / "images").is_dir() else args.data
        imgs = _list_images(img_dir)[: args.max_dataset_size]
        rels = pd.copy_and_downscale_images(imgs, out, args.num_downscales)
        name_map = {p.stem: Path(r) for p, r in zip(imgs, rels)}
        pd.odm_to_json(name_map, args.data / "cameras.json",
                       args.data / "odm_report" / "shots.geojson", out)
    print(f"wrote {out / 'transforms.json'}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
