"""Marching tetrahedra + TSDF fusion (cf. reference exporter TSDF/
marching-cubes paths, scripts/exporter.py:50-620)."""

import numpy as np

from neuradar_tpu.utils.meshing import marching_tetrahedra, tsdf_fuse, write_ply_mesh


def _sphere_grid(res=48, radius=1.0, bounds=1.6):
    xs = np.linspace(-bounds, bounds, res)
    gx, gy, gz = np.meshgrid(xs, xs, xs, indexing="ij")
    sdf = np.sqrt(gx**2 + gy**2 + gz**2) - radius
    spacing = 2 * bounds / (res - 1)
    return sdf, np.array([-bounds] * 3), spacing


def test_marching_tetrahedra_sphere():
    sdf, origin, spacing = _sphere_grid()
    verts, faces = marching_tetrahedra(sdf, origin, spacing)
    assert len(verts) > 500 and len(faces) > 1000
    r = np.linalg.norm(verts, axis=-1)
    # every vertex sits on the unit sphere to within a voxel
    assert np.abs(r - 1.0).max() < spacing
    # faces index valid vertices and are non-degenerate
    assert faces.min() >= 0 and faces.max() < len(verts)
    a, b, c = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    area = 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=-1)
    assert (area > 0).all()
    # total area close to the analytic sphere area 4*pi
    assert abs(area.sum() - 4 * np.pi) / (4 * np.pi) < 0.1


def test_marching_tetrahedra_empty():
    grid = np.ones((8, 8, 8))
    verts, faces = marching_tetrahedra(grid, np.zeros(3), 1.0)
    assert len(verts) == 0 and len(faces) == 0


def test_tsdf_fuse_sphere():
    """Fuse synthetic depth renders of a unit sphere from 6 axis-aligned
    cameras and check the zero level sits at the sphere."""
    H = W = 64
    fx = fy = 64.0
    cx, cy = W / 2, H / 2
    radius, cam_dist = 1.0, 3.0

    # camera looks down -z in our convention; build c2w per viewpoint
    def look_at(origin):
        z = origin / np.linalg.norm(origin)  # camera +z points away from target
        up = np.array([0.0, 0.0, 1.0]) if abs(z[2]) < 0.9 else np.array([1.0, 0.0, 0.0])
        x = np.cross(up, z); x /= np.linalg.norm(x)
        y = np.cross(z, x)
        return np.concatenate([np.stack([x, y, z], 1), origin[:, None]], 1)  # [3,4]

    views = [np.array(o, np.float64) * cam_dist for o in
             [(1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0), (0, 0, 1), (0, 0, -1)]]
    depths, c2ws, intr = [], [], []
    rows, cols = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    for o in views:
        c2w = look_at(o)
        # ray dirs through pixel centers
        x = (cols + 0.5 - cx) / fx
        y = -(rows + 0.5 - cy) / fy
        d_cam = np.stack([x, y, -np.ones_like(x)], -1)
        d_world = d_cam @ c2w[:3, :3].T
        d_world /= np.linalg.norm(d_world, axis=-1, keepdims=True)
        # analytic ray-sphere: |o + t d| = r
        b = 2 * d_world @ o
        disc = b * b - 4 * (o @ o - radius**2)
        t = np.where(disc > 0, (-b - np.sqrt(np.maximum(disc, 0))) / 2, np.inf)
        depths.append(t)
        c2ws.append(c2w)
        intr.append([fx, fy, cx, cy])

    tsdf, weight, spacing = tsdf_fuse(np.stack(depths), np.array(intr), np.array(c2ws),
                                      bounds=1.5, resolution=48)
    verts, faces = marching_tetrahedra(tsdf, np.array([-1.5] * 3), spacing)
    assert len(verts) > 300
    r = np.linalg.norm(verts, axis=-1)
    assert abs(np.median(r) - radius) < 2 * spacing


def test_write_ply_mesh(tmp_path):
    sdf, origin, spacing = _sphere_grid(res=16)
    verts, faces = marching_tetrahedra(sdf, origin, spacing)
    p = tmp_path / "mesh.ply"
    write_ply_mesh(p, verts, faces)
    data = p.read_bytes()
    assert data.startswith(b"ply")
    assert f"element vertex {len(verts)}".encode() in data
    assert f"element face {len(faces)}".encode() in data


def test_ply_mesh_color_roundtrip(tmp_path):
    """write_ply_mesh with colors <-> read_ply_mesh (texture.py I/O)."""
    import numpy as np

    from neuradar_tpu.utils.meshing import read_ply_mesh, write_ply_mesh

    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    faces = np.array([[0, 1, 2], [0, 1, 3]], np.int32)
    colors = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1], [0.5, 0.5, 0.5]], np.float32)
    p = tmp_path / "m.ply"
    write_ply_mesh(p, verts, faces, colors=colors)
    v2, f2, c2 = read_ply_mesh(p)
    np.testing.assert_allclose(v2, verts, atol=1e-6)
    np.testing.assert_array_equal(f2, faces)
    np.testing.assert_allclose(c2, colors, atol=1 / 255)
    # plain meshes read back with colors=None
    p2 = tmp_path / "plain.ply"
    write_ply_mesh(p2, verts, faces)
    v3, f3, c3 = read_ply_mesh(p2)
    assert c3 is None and len(v3) == 4 and len(f3) == 2


def test_vertex_normals_flat_plane():
    import numpy as np

    from neuradar_tpu.utils.meshing import vertex_normals

    verts = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    n = vertex_normals(verts, faces)
    np.testing.assert_allclose(np.abs(n[:, 2]), 1.0, atol=1e-6)  # all +-z
    np.testing.assert_allclose(n[:, :2], 0.0, atol=1e-6)


def test_screened_poisson_sphere():
    """Poisson reconstruction of a sampled sphere: normals orient outward
    (sensor at origin faces inward -> flipped), mesh verts lie on r~=1."""
    from neuradar_tpu.utils.meshing import estimate_normals, screened_poisson_mesh

    rng = np.random.RandomState(0)
    d = rng.randn(4000, 3)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    pts = d * 1.0
    # observed from far outside along +x: origins outside the sphere
    origins = pts * 3.0
    normals = estimate_normals(pts, origins, k=12)
    # normals should point radially outward (toward the far origins)
    cos = np.einsum("ni,ni->n", normals, d)
    assert (cos > 0.9).mean() > 0.95

    verts, faces = screened_poisson_mesh(pts, normals, bounds=2.0, resolution=48)
    assert len(verts) > 100 and len(faces) > 100
    r = np.linalg.norm(verts, axis=1)
    # the indicator isosurface tracks the sphere within a couple voxels
    h = 4.0 / 47
    assert abs(np.median(r) - 1.0) < 3 * h, np.median(r)
    assert np.quantile(np.abs(r - 1.0), 0.9) < 5 * h
