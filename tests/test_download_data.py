"""Offline tests for the ns-download-data parity CLI.

The real endpoints need egress (absent in CI); the fetch/unpack/placement
plumbing is exercised via file:// URLs over locally-built archives —
covering each placement rule the reference datasets use
(cf. reference nerfstudio/scripts/downloads/download_data.py:141-179).
"""

import tarfile
import zipfile
from pathlib import Path

import pytest

from neuradar_tpu.scripts.download_data import (
    NERFSTUDIO_DATASET_GROUP,
    REGISTRY,
    Capture,
    captures_for,
    download_capture,
    main,
)


def _make_zip(path: Path, names: dict) -> None:
    with zipfile.ZipFile(path, "w") as z:
        for name, content in names.items():
            z.writestr(name, content)


def test_registry_shape():
    # every capture row is well-formed; dataset/capture names match the
    # reference command surface
    for dataset, table in REGISTRY.items():
        assert table, dataset
        for name, cap in table.items():
            assert cap.url.startswith(("http://", "https://")), (dataset, name)
            assert cap.kind in ("zip", "tar", "tar.gz")
    assert set(NERFSTUDIO_DATASET_GROUP) <= set(REGISTRY["nerfstudio"])
    for ds in ("blender", "sitcoms3d", "nerfstudio", "record3d", "dnerf",
               "phototourism", "sdfstudio", "nerfosr", "mill19"):
        assert ds in REGISTRY


def test_strip_inner_zip(tmp_path):
    archive = tmp_path / "src.zip"
    _make_zip(archive, {"poster_v1/images/a.txt": "x", "poster_v1/transforms.json": "{}"})
    cap = Capture(url=archive.as_uri(), kind="zip", strip_inner=True)
    out = download_capture("nerfstudio", "poster", cap, tmp_path / "data")
    assert out == tmp_path / "data" / "nerfstudio" / "poster"
    assert (out / "transforms.json").exists()
    assert (out / "images" / "a.txt").read_text() == "x"
    assert not list((tmp_path / "data").glob(".tmp_*"))  # tmp dir cleaned
    assert not list((tmp_path / "data").glob("*.zip"))  # archive removed


def test_rename_from_zip(tmp_path):
    archive = tmp_path / "blender.zip"
    _make_zip(archive, {"nerf_synthetic/lego/transforms_train.json": "{}"})
    cap = Capture(url=archive.as_uri(), rename_from="nerf_synthetic")
    out = download_capture("blender", "", cap, tmp_path / "data")
    assert out == tmp_path / "data" / "blender"
    assert (out / "lego" / "transforms_train.json").exists()


def test_targz_strip_inner(tmp_path):
    src = tmp_path / "capture"
    (src / "dense").mkdir(parents=True)
    (src / "dense" / "img.txt").write_text("y")
    archive = tmp_path / "cap.tar.gz"
    with tarfile.open(archive, "w:gz") as t:
        t.add(src, arcname="brandenburg_gate")
    cap = Capture(url=archive.as_uri(), kind="tar.gz", strip_inner=True)
    out = download_capture("phototourism", "brandenburg-gate", cap, tmp_path / "data")
    assert (out / "dense" / "img.txt").read_text() == "y"


def test_captures_for_groups():
    assert list(captures_for("nerfstudio", "poster")) == ["poster"]
    assert list(captures_for("nerfstudio", "nerfstudio-dataset")) == NERFSTUDIO_DATASET_GROUP
    assert set(captures_for("phototourism", "all")) == set(REGISTRY["phototourism"])
    with pytest.raises(SystemExit):
        captures_for("nerfstudio", "nope")


def test_cli_main_offline(tmp_path, monkeypatch):
    # drive main() end-to-end against a patched single-capture registry
    archive = tmp_path / "bear.zip"
    _make_zip(archive, {"bear_export/rgb.txt": "z"})
    monkeypatch.setitem(REGISTRY, "record3d",
                        {"bear": Capture(url=archive.as_uri(), strip_inner=True)})
    rc = main(["record3d", "--capture-name", "bear", "--save-dir", str(tmp_path / "d")])
    assert rc == 0
    assert (tmp_path / "d" / "record3d" / "bear" / "rgb.txt").read_text() == "z"


def test_eyefultower_points_at_awscli(capsys):
    assert main(["eyefultower"]) == 2
    assert "awscli" in capsys.readouterr().err
