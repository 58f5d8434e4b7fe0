"""Dataparser debug plots (data/plot_utils.py; cf. reference
data_plot_utils.py plotly views — matplotlib PNG here)."""

import numpy as np

from neuradar_tpu.data.plot_utils import cluster_radar_points, plot_scene_overview


def _synthetic_outputs():
    from neuradar_tpu.data.dataparsers.synthetic import SyntheticDataParser, SyntheticDataParserConfig

    cfg = SyntheticDataParserConfig(num_frames=4, image_height=15, image_width=24,
                                    lidar_points_per_scan=128)
    return SyntheticDataParser(cfg).get_dataparser_outputs()


def test_plot_scene_overview_writes_png(tmp_path):
    out = plot_scene_overview(_synthetic_outputs(), tmp_path / "scene.png", frame_index=1,
                              cluster_radar=True)
    assert out.exists() and out.stat().st_size > 5000
    with open(out, "rb") as f:
        assert f.read(8) == b"\x89PNG\r\n\x1a\n"


def test_cluster_radar_points_separates_groups():
    a = np.random.default_rng(0).normal(0, 0.1, (20, 3))
    b = a + np.array([50.0, 0, 0])
    labels = cluster_radar_points(np.concatenate([a, b]), eps=1.0, min_samples=2)
    assert len(set(labels[:20])) == 1 and len(set(labels[20:])) == 1
    assert labels[0] != labels[25]


def test_cluster_empty():
    assert cluster_radar_points(np.zeros((0, 3))).shape == (0,)
