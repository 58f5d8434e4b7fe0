"""Top-level CLI surface: eval.py / render.py / render_radar.py main()
functions driven end-to-end against a real (tiny) run directory — the
load-config + checkpoint-reload + output-writing paths the component tests
don't touch (cf. reference scripts/eval.py:34-83, render.py, render_radar.py)."""

import json

import numpy as np
import pytest


@pytest.fixture(scope="module")
def run_dir(tmp_path_factory):
    """Drive the TRAIN CLI for 3 tiny steps and return the run directory
    (config.json + checkpoints/), i.e. exactly what --load-config consumes —
    the same surface a user touches."""
    from neuradar_tpu.scripts.train import main

    out_dir = tmp_path_factory.mktemp("cli_runs")
    rc = main([
        "neuradar-synthetic",
        "--max-num-iterations", "3",
        "--steps-per-eval-batch", "0", "--steps-per-eval-image", "0",
        "--steps-per-eval-all-images", "0", "--steps-per-eval-all-radars", "0",
        "--steps-per-save", "0", "--steps-per-log", "1",
        "--output-dir", str(out_dir), "--experiment-name", "clitest",
        "--dataparser.num_frames", "8", "--dataparser.image_height", "24",
        "--dataparser.image_width", "36", "--dataparser.lidar_points_per_scan", "256",
        "--pipeline.datamanager.num_rgb_patches", "2", "--pipeline.datamanager.patch_size", "4",
        "--pipeline.datamanager.num_lidar_rays", "32", "--pipeline.datamanager.num_radar_scans", "2",
        "--pipeline.datamanager.max_radar_gt", "16",
        "--pipeline.model.field.grid.static.log2_hashmap_size", "12",
        "--pipeline.model.field.grid.actor.log2_hashmap_size", "10",
        "--pipeline.model.sampling.proposal_field_1.grid.static.log2_hashmap_size", "11",
        "--pipeline.model.sampling.proposal_field_1.grid.actor.log2_hashmap_size", "9",
        "--pipeline.model.sampling.proposal_field_2.grid.static.log2_hashmap_size", "11",
        "--pipeline.model.sampling.proposal_field_2.grid.actor.log2_hashmap_size", "9",
        "--pipeline.model.sampling.num_proposal_samples", "16,8",
        "--pipeline.model.sampling.num_nerf_samples", "6",
    ])
    assert rc in (0, None)
    run = out_dir / "clitest" / "neuradar-synthetic"
    assert (run / "config.json").exists(), list(out_dir.rglob("*"))[:20]
    return run


def test_eval_cli(run_dir, tmp_path):
    from neuradar_tpu.scripts.eval import main

    out = tmp_path / "eval.json"
    rc = main(["--load-config", str(run_dir), "--output-path", str(out),
               "--radar-sampling-rounds", "1"])
    assert rc == 0
    rec = json.loads(out.read_text())
    res = rec["results"]
    assert np.isfinite(res["psnr"]) and np.isfinite(res["eval_rays_per_sec"])
    assert any(k.startswith("radar_chamfer") or "chamfer" in k for k in res)
    assert rec["checkpoint_step"] >= 3


def test_render_dataset_cli(run_dir, tmp_path):
    from neuradar_tpu.scripts.render import main

    out = tmp_path / "renders"
    rc = main(["dataset", "--load-config", str(run_dir), "--output-dir", str(out),
               "--max-frames", "1"])
    assert rc == 0
    pngs = list(out.rglob("*.png")) + list(out.rglob("*.jpg"))
    assert pngs, f"no images written under {out}"


def test_render_radar_dataset_cli(run_dir, tmp_path):
    from neuradar_tpu.scripts.render_radar import main

    out = tmp_path / "radar_renders"
    rc = main(["dataset", "--load-config", str(run_dir), "--output-dir", str(out),
               "--max-scans", "1"])
    assert rc == 0
    written = [p for p in out.rglob("*") if p.is_file()]
    assert written, f"nothing written under {out}"


def test_exporter_pointcloud_cli(run_dir, tmp_path):
    from neuradar_tpu.scripts.exporter import main

    out = tmp_path / "points.ply"
    rc = main(["pointcloud", "--load-config", str(run_dir), "--output-path", str(out),
               "--max-scans", "1", "--points-per-scan", "256"])
    assert rc == 0
    data = out.read_bytes()
    assert data.startswith(b"ply") and len(data) > 100


def test_radar_eval_baseline_cli(capsys):
    from neuradar_tpu.scripts.radar_eval_baseline import main

    rc = main(["--dataset", "synthetic"])
    assert rc == 0
    printed = capsys.readouterr().out
    assert "chamfer" in printed.lower() or "gospa" in printed.lower()


def test_viewer_cli(run_dir):
    """Standalone viewer CLI on a real run: serves stats + a time-scrubbed
    render with radar/box overlays (the reference run_viewer surface)."""
    import json as _json
    import threading
    import time as _time
    import urllib.request

    import socket

    from neuradar_tpu.scripts.viewer import main

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    t = threading.Thread(
        target=main,
        args=(["--load-config", str(run_dir), "--port", str(port), "--serve-seconds", "120"],),
        daemon=True,
    )
    t.start()
    for i in range(60):
        _time.sleep(2)
        try:
            with urllib.request.urlopen(f"http://127.0.0.1:{port}/stats", timeout=5) as r:
                stats = _json.loads(r.read())
            break
        except Exception:
            if i == 59:
                raise
    assert "scene_duration" in stats and stats["scene_duration"] > 0
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/render",
        data=_json.dumps({"eye": [-6, 0, 2], "target": [8, 0, 0], "time": 1.0,
                          "overlays": {"radar": True, "boxes": True}}).encode(),
    )
    with urllib.request.urlopen(req, timeout=600) as r:
        body = r.read()
    assert body[:2] == b"\xff\xd8"


def test_curve_from_events_tool(tmp_path):
    """tools/curve_from_events.py rebuilds a validate_learning-format curve
    doc from an (incrementally-appended, possibly torn) events.jsonl, so a
    killed curve run still yields its trajectory artifact."""
    import json
    import sys

    sys.path.insert(0, "tools")
    try:
        from curve_from_events import build_curve, find_events
    finally:
        sys.path.pop(0)

    run = tmp_path / "run" / "logs"
    run.mkdir(parents=True)
    ev = run / "events.jsonl"
    lines = [
        {"step": 1, "wall": 0.1, "loss": 1.0, "psnr": 9.0},
        {"step": 2, "wall": 0.2, "loss": 0.5, "psnr": 11.0, "eval_psnr": 10.5},
    ]
    with open(ev, "w") as f:
        for l in lines:
            f.write(json.dumps(l) + "\n")
        f.write('{"step": 3, "loss": 0.25')  # torn final line (killed writer)

    assert find_events(tmp_path) == ev
    doc = build_curve(ev, {"scale": "tiny"})
    assert doc["scale"] == "tiny" and doc["n_events"] == 2
    assert doc["curves"]["loss"] == [(1, 1.0), (2, 0.5)]
    assert doc["curves"]["psnr"] == [(1, 9.0), (2, 11.0)]
    assert doc["curves"]["eval_psnr"] == [(2, 10.5)]
    assert "wall" not in doc["curves"]
