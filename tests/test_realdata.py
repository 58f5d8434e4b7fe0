"""Real-dataset readiness harness (VERDICT r2 item 8).

The eight AD dataparsers are logic-validated against synthetic trees and
mocked devkits (tests/test_dataset_parsers.py) — this module is the
non-circular complement: the moment a real dataset is mounted under
$NEURADAR_DATA_ROOT (default ``data/``), `pytest -m realdata` parses ONE
real sequence end-to-end (parser -> DataparserOutputs invariants ->
datamanager -> one train batch) per dataset. Until then every test skips
cleanly, so the harness collects everywhere and self-resolves when data
appears. cf. reference data/dataparsers/* which are only exercised against
the real datasets.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np
import pytest

DATA_ROOT = Path(os.environ.get("NEURADAR_DATA_ROOT", "data"))

# dataset key -> (subdir under DATA_ROOT, required devkit modules)
DATASETS = {
    "zod": ("zod", ["zod"]),
    "vod": ("vod", []),
    "pandaset": ("pandaset", []),
    "nuscenes": ("nuscenes", ["nuscenes", "pyquaternion"]),
    "argoverse2": ("av2", []),
    "wod": ("wod", ["tensorflow", "waymo_open_dataset"]),
    "kittimot": ("kittimot", []),
}


def _make_parser(key: str, data_dir: Path):
    if key == "zod":
        from neuradar_tpu.data.dataparsers.zod import ZodDataParser, ZodDataParserConfig

        return ZodDataParser(ZodDataParserConfig(data=str(data_dir)))
    if key == "vod":
        from neuradar_tpu.data.dataparsers.vod import VodDataParser, VodDataParserConfig

        return VodDataParser(VodDataParserConfig(data=str(data_dir)))
    if key == "pandaset":
        from neuradar_tpu.data.dataparsers.pandaset import PandasetDataParser, PandasetDataParserConfig

        return PandasetDataParser(PandasetDataParserConfig(data=str(data_dir)))
    if key == "nuscenes":
        from neuradar_tpu.data.dataparsers.nuscenes import NuScenesDataParser, NuScenesDataParserConfig

        return NuScenesDataParser(NuScenesDataParserConfig(data=str(data_dir)))
    if key == "argoverse2":
        from neuradar_tpu.data.dataparsers.argoverse2 import Argoverse2DataParser, Argoverse2DataParserConfig

        return Argoverse2DataParser(Argoverse2DataParserConfig(data=str(data_dir)))
    if key == "wod":
        from neuradar_tpu.data.dataparsers.wod import WodDataParser, WodDataParserConfig

        return WodDataParser(WodDataParserConfig(data=str(data_dir)))
    if key == "kittimot":
        from neuradar_tpu.data.dataparsers.kittimot import KittiMotDataParser, KittiMotDataParserConfig

        return KittiMotDataParser(KittiMotDataParserConfig(data=str(data_dir)))
    raise KeyError(key)


def _require(key: str) -> Path:
    subdir, devkits = DATASETS[key]
    data_dir = DATA_ROOT / subdir
    if not data_dir.is_dir() or not any(data_dir.iterdir()):
        pytest.skip(f"no {key} dataset at {data_dir} (set NEURADAR_DATA_ROOT)")
    for mod in devkits:
        pytest.importorskip(mod, reason=f"{key} devkit '{mod}' not installed")
    return data_dir


def _check_outputs(outputs) -> None:
    """Structural invariants every real parse must satisfy (the mocked tests
    assert exact values; here we assert the contract the datamanager needs)."""
    nc = outputs.camera_to_worlds.shape[0]
    assert nc > 0 and outputs.camera_to_worlds.shape[1:] == (3, 4)
    assert np.isfinite(outputs.camera_to_worlds).all()
    # rotations orthonormal to float tolerance
    rot = outputs.camera_to_worlds[:, :, :3]
    eye = np.einsum("nij,nkj->nik", rot, rot)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-4)
    assert outputs.intrinsics.shape == (nc, 4) and (outputs.intrinsics[:, :2] > 0).all()
    h, w = outputs.image_size
    assert outputs.images.shape == (nc, h, w, 3) and outputs.images.dtype == np.uint8
    assert outputs.camera_times.shape == (nc,) and np.isfinite(outputs.camera_times).all()

    nl = outputs.lidar_to_worlds.shape[0]
    assert nl > 0 and len(outputs.lidar_points) == nl
    for pts in outputs.lidar_points:
        assert pts.ndim == 2 and pts.shape[1] >= 6 and np.isfinite(pts[:, :3]).all()

    if outputs.radar_to_worlds is not None and len(outputs.radar_to_worlds):
        assert len(outputs.radar_points) == outputs.radar_to_worlds.shape[0]
        assert outputs.radar_fov, "radar scans present but no FoV table"

    assert outputs.scene_box is not None


def _one_train_batch(outputs) -> None:
    from neuradar_tpu.data.datamanager import ADDataManager, ADDataManagerConfig

    has_radar = outputs.radar_to_worlds is not None and len(outputs.radar_to_worlds) > 0
    cfg = ADDataManagerConfig(
        num_rgb_patches=2, patch_size=8, num_lidar_rays=64,
        num_radar_scans=min(2, len(outputs.radar_points)) if has_radar else 0,
        max_radar_gt=32,
    )
    dm = ADDataManager(outputs, cfg)
    batch = dm.next_train()
    for k, v in batch.items():
        arr = np.asarray(v)
        if arr.dtype.kind == "f":
            assert np.isfinite(arr).all(), f"non-finite values in batch[{k!r}]"


@pytest.mark.realdata
@pytest.mark.parametrize("key", sorted(DATASETS))
def test_parse_one_real_sequence_end_to_end(key):
    data_dir = _require(key)
    parser = _make_parser(key, data_dir)
    outputs = parser.get_dataparser_outputs()
    _check_outputs(outputs)
    _one_train_batch(outputs)
