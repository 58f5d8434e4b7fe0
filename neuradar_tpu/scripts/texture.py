"""Texture an existing mesh from a trained run -> vertex-colored PLY.

cf. reference nerfstudio/scripts/texture.py + exporter/texture_utils.py
(~500 LoC: xatlas UV unwrap + texture-image baking from field queries). The
TPU port bakes PER-VERTEX colors by projecting vertices into rendered
dataset views with a depth visibility test and normal-cosine weighting —
model-agnostic (works for NeuRAD's feature-field + CNN decode, where no
direct per-point RGB query exists, as well as nerfacto). Viewers interpolate
vertex colors across faces, which at export-mesh vertex densities is the
same quality point as a low-res texture atlas.

Usage:
  python -m neuradar_tpu.scripts.texture --load-config outputs/<exp>/<method> \
      --input-mesh exports/mesh.ply --output-path exports/textured.ply
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def bake_vertex_colors(
    pipeline,
    variables,
    verts: np.ndarray,
    faces: np.ndarray,
    max_cameras: int = 8,
    depth_tol: float = 0.08,
) -> np.ndarray:
    """[N, 3] colors in [0, 1]: project each vertex into up to max_cameras
    rendered views, keep pixels whose rendered depth agrees (visibility),
    weight by the cosine between the vertex normal and the view direction."""
    from neuradar_tpu.utils.meshing import vertex_normals
    from neuradar_tpu.viewer.overlays import project_points

    normals = vertex_normals(verts, faces)
    acc = np.zeros((len(verts), 3), np.float64)
    wsum = np.zeros(len(verts), np.float64)

    cam_idxs = list(pipeline.datamanager.eval_camera_indices())
    # pad with train cameras for coverage
    all_idx = [i for i in range(len(pipeline.outputs.camera_to_worlds))]
    cam_idxs = (cam_idxs + [i for i in all_idx if i not in set(cam_idxs)])[:max_cameras]

    for ci in cam_idxs:
        rend = pipeline.render_camera(variables, int(ci))
        rgb = np.asarray(rend["rgb"], np.float64)
        depth = np.asarray(rend["depth"], np.float64)
        if depth.ndim == 3:
            depth = depth[..., 0]
        H, W = rgb.shape[:2]
        if depth.shape != (H, W):  # depth renders at the pre-CNN-upsample
            # resolution (H/u, W/u); nearest-upsample to the rgb grid
            ry, rx = H // depth.shape[0], W // depth.shape[1]
            depth = np.repeat(np.repeat(depth, ry, axis=0), rx, axis=1)[:H, :W]
        c2w = np.asarray(pipeline.outputs.camera_to_worlds[int(ci)])
        fx, fy, cx, cy = np.asarray(pipeline.outputs.intrinsics[int(ci), :4])
        uv, z = project_points(c2w, fx, fy, cx, cy, verts)
        u = np.round(uv[:, 0]).astype(np.int64)
        v = np.round(uv[:, 1]).astype(np.int64)
        inside = (z > 0.1) & (u >= 0) & (u < W) & (v >= 0) & (v < H)
        ui, vi = np.clip(u, 0, W - 1), np.clip(v, 0, H - 1)
        visible = inside & (np.abs(depth[vi, ui] - z) < depth_tol * np.maximum(z, 1.0))
        view_dir = c2w[:3, 3][None] - verts  # vertex -> camera
        view_dir = view_dir / np.clip(np.linalg.norm(view_dir, axis=1, keepdims=True), 1e-9, None)
        w = np.clip(np.sum(normals * view_dir, axis=1), 0.0, None)  # front-facing weight
        w = np.where(visible, w, 0.0)
        acc += rgb[vi, ui] * w[:, None]
        wsum += w

    colors = np.where(wsum[:, None] > 1e-9, acc / np.clip(wsum[:, None], 1e-9, None), 0.5)
    return np.clip(colors, 0.0, 1.0)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--load-config", type=Path, required=True)
    parser.add_argument("--input-mesh", type=Path, required=True, help="PLY mesh (e.g. exporter sdf-mesh output)")
    parser.add_argument("--output-path", type=Path, default=Path("exports/textured.ply"))
    parser.add_argument("--max-cameras", type=int, default=8)
    parser.add_argument("--depth-tol", type=float, default=0.08,
                        help="relative rendered-depth agreement for visibility")
    args = parser.parse_args(argv)

    from neuradar_tpu.scripts.render import _load_trainer
    from neuradar_tpu.utils.meshing import read_ply_mesh, write_ply_mesh

    run_dir = args.load_config if args.load_config.is_dir() else args.load_config.parent
    trainer = _load_trainer(run_dir)
    verts, faces, _ = read_ply_mesh(args.input_mesh)
    colors = bake_vertex_colors(
        trainer.pipeline, trainer.eval_variables(), verts, faces,
        max_cameras=args.max_cameras, depth_tol=args.depth_tol,
    )
    write_ply_mesh(args.output_path, verts, faces, colors=colors)
    print(f"wrote textured mesh ({len(verts)} verts) to {args.output_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
