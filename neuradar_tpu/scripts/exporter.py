"""Exporter: point clouds, meshes and gaussians from trained models.

cf. reference nerfstudio/scripts/exporter.py:50-620. Full subcommand parity:
pointcloud / radar-pointcloud (lidar- and radar-predicted points), tsdf-mesh
(ExportTSDFMesh), sdf-surface / sdf-mesh (ExportMarchingCubesMesh via
marching tetrahedra), poisson-mesh (ExportPoissonMesh — open3d's Kazhdan
solver replaced by utils/meshing.screened_poisson_mesh's DCT-space solve),
gaussian-ply (splatfacto -> standard 3DGS PLY), cameras (pose export).
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def write_ply(path: Path, points: np.ndarray, colors: np.ndarray | None = None) -> None:
    path.parent.mkdir(parents=True, exist_ok=True)
    n = len(points)
    has_color = colors is not None
    with open(path, "wb") as f:
        header = ["ply", "format binary_little_endian 1.0", f"element vertex {n}",
                  "property float x", "property float y", "property float z"]
        if has_color:
            header += ["property uchar red", "property uchar green", "property uchar blue"]
        header += ["end_header"]
        f.write(("\n".join(header) + "\n").encode())
        if has_color:
            rec = np.zeros(n, dtype=[("xyz", np.float32, 3), ("rgb", np.uint8, 3)])
            rec["xyz"] = points.astype(np.float32)
            rec["rgb"] = (np.clip(colors, 0, 1) * 255).astype(np.uint8)
            rec.tofile(f)
        else:
            points.astype(np.float32).tofile(f)


def export_camera_poses(pipeline, out_dir: Path) -> None:
    """Write train/eval camera poses as transforms-style json (reference
    ExportCameraPoses, scripts/exporter.py:452-476: one file per split,
    4x4 camera_to_world per frame)."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    eval_idx = set(int(i) for i in pipeline.datamanager.eval_camera_indices())
    c2ws = np.asarray(pipeline.outputs.camera_to_worlds)
    splits = {"transforms_train.json": [i for i in range(len(c2ws)) if i not in eval_idx],
              "transforms_eval.json": sorted(eval_idx)}
    for name, idxs in splits.items():
        frames = [{"camera_index": int(i),
                   "transform": np.concatenate([c2ws[i], [[0, 0, 0, 1]]], axis=0).tolist()}
                  for i in idxs]
        (out_dir / name).write_text(json.dumps(frames, indent=4))
        print(f"wrote {len(frames)} poses to {out_dir / name}")


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "command",
        choices=("pointcloud", "radar-pointcloud", "sdf-surface", "sdf-mesh", "tsdf-mesh",
                 "poisson-mesh", "gaussian-ply", "cameras"),
    )
    parser.add_argument("--load-config", type=Path, required=True)
    parser.add_argument("--output-path", type=Path, default=Path("exports/points.ply"))
    parser.add_argument("--max-scans", type=int, default=8)
    parser.add_argument("--points-per-scan", type=int, default=8192)
    parser.add_argument("--grid-resolution", type=int, default=128)
    parser.add_argument("--bounds", type=float, default=60.0, help="half-extent of the export cube (m)")
    args = parser.parse_args(argv)

    run_dir = args.load_config if args.load_config.is_dir() else args.load_config.parent
    if args.command == "gaussian-ply":
        # splatfacto run -> standard 3DGS PLY (cf. the reference exporter's
        # gaussian-splat path); reads the trainer's gaussians.npz directly
        import jax.numpy as jnp

        from neuradar_tpu.models.splatfacto import export_gaussians_ply

        ckpt = run_dir / "gaussians.npz" if run_dir.is_dir() else run_dir
        with np.load(ckpt) as z:
            params = {k[6:]: jnp.asarray(z[k]) for k in z.files if k.startswith("param_")}
            alive = z["state_alive"]
        n = export_gaussians_ply(args.output_path, params, alive)
        print(f"wrote {n} gaussians to {args.output_path}")
        return 0

    from neuradar_tpu.scripts.render import _load_trainer

    trainer = _load_trainer(run_dir)
    pipeline = trainer.pipeline

    if args.command == "cameras":
        out_dir = args.output_path if args.output_path.suffix == "" else args.output_path.parent
        export_camera_poses(pipeline, out_dir)
        return 0

    variables = trainer.eval_variables()

    all_pts = []
    if args.command == "tsdf-mesh":
        # fuse rendered eval-camera depth maps into a TSDF and mesh it
        # (cf. exporter.py ExportTSDFMesh; open3d-free numpy fusion)
        from neuradar_tpu.utils.meshing import marching_tetrahedra, tsdf_fuse, write_ply_mesh

        u = pipeline.config.model.rgb_upsample_factor
        cam_idxs = list(pipeline.datamanager.eval_camera_indices())[: args.max_scans]
        depths, intr, c2ws = [], [], []
        for ci in cam_idxs:
            depths.append(pipeline.render_camera(variables, int(ci))["depth"])
            intr.append(np.asarray(pipeline.outputs.intrinsics[int(ci), :4]))
            c2ws.append(np.asarray(pipeline.outputs.camera_to_worlds[int(ci)]))
        tsdf, _, spacing = tsdf_fuse(
            np.stack(depths), np.stack(intr), np.stack(c2ws),
            bounds=args.bounds, resolution=args.grid_resolution, depth_stride=u,
        )
        verts, faces = marching_tetrahedra(tsdf, np.array([-args.bounds] * 3), spacing)
        write_ply_mesh(args.output_path, verts, faces)
        print(f"wrote mesh ({len(verts)} verts, {len(faces)} faces) to {args.output_path}")
        return 0
    if args.command in ("sdf-surface", "sdf-mesh"):
        # SDF zero-crossings on a voxel grid (cf. ExportMarchingCubesMesh,
        # exporter.py:50-620): 'sdf-mesh' extracts a triangle mesh via
        # marching tetrahedra; 'sdf-surface' exports the crossings as points.
        import jax
        import jax.numpy as jnp

        from neuradar_tpu.models.neuradar import NeuRadarModel

        res, b = args.grid_resolution, args.bounds
        xs = np.linspace(-b, b, res, dtype=np.float32)
        query = jax.jit(
            lambda v, p: pipeline.model.apply(v, p, method=NeuRadarModel.query_geometry)
        )
        sdf = np.zeros((res, res, res), np.float32)
        for i, x in enumerate(xs):
            yy, zz = np.meshgrid(xs, xs, indexing="ij")
            pts = np.stack([np.full(yy.size, x), yy.reshape(-1), zz.reshape(-1)], 1)
            out = query(variables, jnp.asarray(pts.reshape(res, res, 3)))
            sdf[i] = np.asarray(out)[..., 0]
        if args.command == "sdf-mesh":
            from neuradar_tpu.utils.meshing import marching_tetrahedra, write_ply_mesh

            spacing = 2 * b / (res - 1)
            verts, faces = marching_tetrahedra(sdf, np.array([-b] * 3), spacing)
            write_ply_mesh(args.output_path, verts, faces)
            print(f"wrote mesh ({len(verts)} verts, {len(faces)} faces) to {args.output_path}")
            return 0
        surf = []
        for axis in range(3):
            a = np.moveaxis(sdf, axis, 0)
            sign = (a[:-1] * a[1:]) < 0
            idx = np.argwhere(sign)
            if len(idx) == 0:
                continue
            v0 = a[idx[:, 0], idx[:, 1], idx[:, 2]]
            v1 = a[idx[:, 0] + 1, idx[:, 1], idx[:, 2]]
            frac = v0 / (v0 - v1 + 1e-9)
            coords = idx.astype(np.float32)
            coords[:, 0] += frac
            coords = np.moveaxis(coords.reshape(-1, 3), 0, 0)
            order = [axis, *(i for i in range(3) if i != axis)]
            world = np.empty_like(coords)
            for src, dst in enumerate(order):
                world[:, dst] = coords[:, src]
            surf.append(-b + world * (2 * b / (res - 1)))
        points = np.concatenate(surf) if surf else np.zeros((0, 3))
        write_ply(args.output_path, points)
        print(f"wrote {len(points)} surface points to {args.output_path}")
        return 0
    if args.command in ("pointcloud", "poisson-mesh"):
        # lidar rays -> predicted depth -> world points
        all_origins = []
        for scan_idx in list(pipeline.datamanager.eval_lidar_indices())[: args.max_scans]:
            rend = pipeline.render_lidar(variables, int(scan_idx), max_points=args.points_per_scan)
            keep = rend["ray_drop_prob"][:, 0] < 0.5
            keep[int(rend["num_valid"]):] = False  # drop static-shape padding rows
            pts_sensor = rend["points"][:, :3] / np.linalg.norm(
                rend["points"][:, :3], axis=-1, keepdims=True
            ).clip(1e-6) * rend["depth"]
            l2w = np.asarray(pipeline.datamanager.tables.lidars.lidar_to_worlds[int(scan_idx)])
            pts_world = pts_sensor @ l2w[:3, :3].T + l2w[:3, 3]
            all_pts.append(pts_world[keep])
            all_origins.append(np.broadcast_to(l2w[:3, 3], all_pts[-1].shape).copy())
        if args.command == "poisson-mesh":
            # screened-Poisson reconstruction from the oriented point cloud
            # (cf. reference ExportPoissonMesh, exporter.py:136-247 — open3d
            # replaced by utils/meshing.screened_poisson_mesh's DCT solve;
            # normals are PCA + exact sensor-facing orientation)
            from neuradar_tpu.utils.meshing import (
                estimate_normals, screened_poisson_mesh, write_ply_mesh,
            )

            points = np.concatenate(all_pts, axis=0)
            origins = np.concatenate(all_origins, axis=0)
            inb = np.abs(points).max(axis=1) < args.bounds
            points, origins = points[inb], origins[inb]
            if len(points) < 16:
                raise SystemExit("poisson-mesh: too few in-bounds points")
            normals = estimate_normals(points, origins)
            verts, faces = screened_poisson_mesh(
                points, normals, bounds=args.bounds, resolution=args.grid_resolution,
            )
            write_ply_mesh(args.output_path, verts, faces)
            print(f"wrote mesh ({len(verts)} verts, {len(faces)} faces) to {args.output_path}")
            return 0
    else:
        import jax

        from neuradar_tpu.model_components.radar_utils import sample_radar_points

        rng = jax.random.PRNGKey(0)
        cfg = pipeline.config.model
        for scan_idx in list(pipeline.datamanager.eval_radar_indices())[: args.max_scans]:
            ro = pipeline.render_radar(variables, int(scan_idx))["radar_output"]
            rng, sub = jax.random.split(rng)
            pts, keep = sample_radar_points(
                np.asarray(ro), cfg.loss.radar_loss_type, rng=sub,
                threshold=cfg.existence_probability_threshold,
            )
            r2w = np.asarray(pipeline.datamanager.tables.radars.radar_to_worlds[int(scan_idx)])
            local = np.asarray(pts)[np.asarray(keep)]
            all_pts.append(local @ r2w[:3, :3].T + r2w[:3, 3])

    points = np.concatenate(all_pts, axis=0) if all_pts else np.zeros((0, 3))
    write_ply(args.output_path, points)
    print(f"wrote {len(points)} points to {args.output_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
