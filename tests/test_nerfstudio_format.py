"""transforms.json ingestion parser (cf. reference process_data output format
+ nerfstudio_dataparser)."""

import json

import numpy as np


def _make_dataset(root, n=6, h=24, w=32):
    from PIL import Image

    (root / "images").mkdir(parents=True)
    rng = np.random.RandomState(0)
    frames = []
    for i in range(n):
        name = f"images/frame_{i:03d}.png"
        Image.fromarray(rng.randint(0, 255, (h, w, 3), np.uint8)).save(root / name)
        th = i / n * 2 * np.pi
        c2w = np.eye(4)
        c2w[:3, 3] = [3 * np.cos(th), 3 * np.sin(th), 1.0]
        frames.append({"file_path": name, "transform_matrix": c2w.tolist(), "time": i * 0.1})
    meta = {
        "camera_model": "OPENCV",
        "fl_x": 30.0, "fl_y": 31.0, "cx": w / 2, "cy": h / 2,
        "k1": 0.01, "k2": 0.0, "p1": 0.0, "p2": 0.0,
        "frames": frames,
    }
    (root / "transforms.json").write_text(json.dumps(meta))


def test_parse_transforms_json(tmp_path):
    from neuradar_tpu.data.dataparsers.nerfstudio_format import NerfstudioFormatDataParserConfig

    _make_dataset(tmp_path, n=6)
    out = NerfstudioFormatDataParserConfig(data=str(tmp_path)).setup().get_dataparser_outputs()
    assert out.images.shape == (6, 24, 32, 3)
    assert out.camera_to_worlds.shape == (6, 3, 4)
    np.testing.assert_allclose(out.intrinsics[0], [30.0, 31.0, 16.0, 12.0])
    assert out.distortion_params[0, 0] == np.float32(0.01)
    # recentered: mean camera position at origin
    np.testing.assert_allclose(out.camera_to_worlds[:, :, 3].mean(0), 0.0, atol=1e-5)
    # splits cover all frames disjointly
    tr, ev = set(out.camera_split.train.tolist()), set(out.camera_split.eval.tolist())
    assert tr | ev == set(range(6)) and not (tr & ev)
    assert len(out.lidar_points) == 0 and out.radar_to_worlds.shape[0] == 0


def test_rays_from_parsed_cameras(tmp_path):
    import jax.numpy as jnp

    from neuradar_tpu.data.datamanager import build_sensor_tables
    from neuradar_tpu.data.dataparsers.nerfstudio_format import NerfstudioFormatDataParserConfig

    _make_dataset(tmp_path, n=4)
    out = NerfstudioFormatDataParserConfig(data=str(tmp_path)).setup().get_dataparser_outputs()
    tables = build_sensor_tables(out)
    rb = tables.cameras.generate_rays(jnp.zeros((8,), jnp.int32), jnp.tile(jnp.asarray([[12.0, 16.0]]), (8, 1)))
    d = np.asarray(rb.directions)
    assert np.isfinite(d).all()
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)


def test_benchmarking_harness(tmp_path):
    """Multi-scene benchmarking CLI (cf. reference scripts/benchmarking/):
    trains nerfacto-data briefly on two synthetic transforms.json scenes and
    writes the aggregate table."""
    for scene in ("sceneA", "sceneB"):
        _make_dataset(tmp_path / scene, n=4)
    from neuradar_tpu.scripts.benchmarking import main

    out = tmp_path / "bench.json"
    rc = main([
        "--data-root", str(tmp_path), "--max-iters", "3",
        "--output", str(out), "--output-dir", str(tmp_path / "runs"),
        "--override", "num_rgb_patches=2", "--override", "patch_size=4",
        "--override", "model.num_proposal_samples_per_ray=8,4",
        "--override", "model.num_nerf_samples_per_ray=4",
        "--override", "model.log2_hashmap_size=10",
        "--override", "model.num_levels=4", "--override", "model.max_res=64",
        "--override", "model.hidden_dim=8", "--override", "model.hidden_dim_color=8",
        "--override", "steps_per_eval_batch=0",
    ])
    assert rc == 0
    table = json.loads(out.read_text())
    assert set(table["scenes"]) == {"sceneA", "sceneB"}
    assert np.isfinite(table["mean_psnr"])


def test_mask_path_loading(tmp_path):
    """frames may carry mask_path (reference nerfstudio dataparser): loaded
    as boolean keep-masks; frames without one are fully kept."""
    import json

    import numpy as np
    import PIL.Image

    from neuradar_tpu.data.dataparsers.nerfstudio_format import (
        NerfstudioFormatDataParser,
        NerfstudioFormatDataParserConfig,
    )

    (tmp_path / "images").mkdir()
    (tmp_path / "masks").mkdir()
    frames = []
    for i in range(3):
        PIL.Image.fromarray(np.full((16, 24, 3), 100 + i, np.uint8)).save(tmp_path / "images" / f"f{i}.png")
        fr = {"file_path": f"images/f{i}.png",
              "transform_matrix": np.eye(4).tolist(), "fl_x": 20.0, "fl_y": 20.0, "cx": 12.0, "cy": 8.0}
        if i == 1:  # only frame 1 has a mask: left half excluded
            m = np.ones((16, 24), np.uint8) * 255
            m[:, :12] = 0
            PIL.Image.fromarray(m).save(tmp_path / "masks" / f"f{i}.png")
            fr["mask_path"] = f"masks/f{i}.png"
        frames.append(fr)
    (tmp_path / "transforms.json").write_text(json.dumps({"frames": frames}))

    out = NerfstudioFormatDataParser(NerfstudioFormatDataParserConfig(data=str(tmp_path))).get_dataparser_outputs()
    assert out.masks is not None and out.masks.shape == (3, 16, 24)
    assert out.masks[0].all() and out.masks[2].all()
    assert not out.masks[1][:, :12].any() and out.masks[1][:, 12:].all()
