"""HTTP services: orbit viewer + closed-loop simulator server
(cf. reference nerfstudio/viewer/ and scripts/closed_loop/server.py)."""

import json
import threading
import types
import urllib.request

import numpy as np


def _free_port():
    import socket

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_viewer_server_roundtrip():
    from neuradar_tpu.viewer.viewer import ViewerServer

    calls = []

    def render_fn(c2w):
        calls.append(np.asarray(c2w))
        return np.full((12, 16, 3), 128, np.uint8)

    port = _free_port()
    v = ViewerServer(render_fn=render_fn, stats_fn=lambda: {"step": 7}, port=port)
    v.start()
    try:
        # stats endpoint
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/stats", timeout=10) as r:
            assert json.loads(r.read())["step"] == 7
        # index page served
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/", timeout=10) as r:
            assert b"<html" in r.read().lower()
        # render: look-at camera from eye/target
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/render",
            data=json.dumps({"eye": [0, 0, 2], "target": [5, 0, 1]}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=10) as r:
            body = r.read()
            assert r.headers["Content-Type"] == "image/jpeg" and body[:2] == b"\xff\xd8"
        assert len(calls) == 1 and calls[0].shape == (3, 4)
        # camera looks from eye toward target: -z axis points at the target
        fwd = -calls[0][:, 2]
        want = np.asarray([5, 0, 1.0]) - np.asarray([0, 0, 2.0])
        want = want / np.linalg.norm(want)
        np.testing.assert_allclose(fwd / np.linalg.norm(fwd), want, atol=1e-5)
    finally:
        v.stop()


def test_viewer_server_overlay_passthrough():
    """An arity-3 render_fn receives the HUD's overlay toggles + actor edit."""
    from neuradar_tpu.viewer.viewer import ViewerServer

    seen = []

    def render_fn(c2w, actor, overlays):
        seen.append((actor, overlays))
        return np.full((12, 16, 3), 64, np.uint8)

    port = _free_port()
    v = ViewerServer(render_fn=render_fn, port=port)
    v.start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/render",
            data=json.dumps({
                "eye": [0, 0, 2], "target": [5, 0, 1],
                "actor": {"index": 1, "lateral": 2.0},
                "overlays": {"lidar": True, "boxes": True, "frusta": False},
            }).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=10) as r:
            assert r.read()[:2] == b"\xff\xd8"
        actor, overlays = seen[0]
        assert actor["index"] == 1 and actor["lateral"] == 2.0
        assert overlays == {"lidar": True, "boxes": True, "frusta": False}
    finally:
        v.stop()


def test_closed_loop_server():
    from neuradar_tpu.scripts.closed_loop import serve

    edits = {}

    class FakeState:
        pipeline = types.SimpleNamespace(
            outputs=types.SimpleNamespace(
                trajectories=[{"timestamps": np.arange(3.0), "dims": np.asarray([4.0, 2.0, 1.5])}],
            )
        )

        def render(self, pose, time_s, hw):
            assert np.asarray(pose).size == 12
            return np.zeros((hw[0], hw[1], 3), np.uint8)

        def set_edits(self, d):
            edits.update(d)

        def info(self):
            return {"duration": 10.0, "num_actors": 1}

    port = _free_port()
    server = serve(FakeState(), port)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/info", timeout=10) as r:
            assert json.loads(r.read())["num_actors"] == 1
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/actors", timeout=10) as r:
            trajs = json.loads(r.read())["trajectories"]
            assert trajs[0]["dims"] == [4.0, 2.0, 1.5]
        pose = np.hstack([np.eye(3), np.zeros((3, 1))]).tolist()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/render",
            data=json.dumps({"pose": pose, "hw": [8, 10]}).encode(),
        )
        with urllib.request.urlopen(req, timeout=10) as r:
            assert r.headers["Content-Type"] == "image/png" and r.read()[:4] == b"\x89PNG"
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/actors",
            data=json.dumps({"index": 0, "lateral": 1.5}).encode(),
        )
        with urllib.request.urlopen(req, timeout=10) as r:
            assert json.loads(r.read())["ok"]
        assert edits == {"index": 0, "lateral": 1.5}
    finally:
        server.shutdown()


def test_parse_camera_path():
    """nerfstudio camera_path.json layouts: flat 16, nested 4x4, nested 3x4."""
    from neuradar_tpu.scripts.render import parse_camera_path

    m = np.eye(4)
    m[:3, 3] = [1.0, 2.0, 3.0]
    spec = {
        "render_height": 64, "render_width": 96,
        "camera_path": [
            {"camera_to_world": m.reshape(-1).tolist(), "fov": 60},
            {"camera_to_world": m.tolist()},
            {"camera_to_world": m[:3].tolist()},
        ],
    }
    frames = parse_camera_path(spec)
    assert len(frames) == 3
    for f in frames:
        assert f.shape == (3, 4)
        np.testing.assert_allclose(f[:, 3], [1.0, 2.0, 3.0])
    # keyframes-style key also accepted
    assert len(parse_camera_path({"keyframes": [{"camera_to_world": m.tolist()}]})) == 1


def test_viewer_actor_edits_and_camera_path():
    """Actor-edit fields pass through to the render callback; keyframes
    accumulate server-side and export as a nerfstudio camera_path.json."""
    from neuradar_tpu.viewer.viewer import ViewerServer

    seen = []

    def render_fn(c2w, actor=None):
        seen.append((np.asarray(c2w), actor))
        return np.full((12, 16, 3), 64, np.uint8)

    port = _free_port()
    v = ViewerServer(render_fn=render_fn, port=port)
    v.start()
    try:
        body = {"eye": [0, 0, 2], "target": [5, 0, 1],
                "actor": {"index": 1, "lateral": 2.0, "remove": False}}
        req = urllib.request.Request(f"http://127.0.0.1:{port}/render",
                                     data=json.dumps(body).encode())
        with urllib.request.urlopen(req, timeout=10) as r:
            assert r.status == 200
        assert seen[-1][1] == {"index": 1, "lateral": 2.0, "remove": False}

        # two keyframes -> downloadable camera path
        for _ in range(2):
            req = urllib.request.Request(f"http://127.0.0.1:{port}/keyframe",
                                         data=json.dumps(body).encode())
            with urllib.request.urlopen(req, timeout=10) as r:
                count = json.loads(r.read())["count"]
        assert count == 2
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/camera_path", timeout=10) as r:
            path = json.loads(r.read())
        assert len(path["camera_path"]) == 2
        assert len(path["camera_path"][0]["camera_to_world"]) == 16
        # the exported path parses with the render scripts' loader
        from neuradar_tpu.scripts.render import parse_camera_path

        frames = parse_camera_path(path)
        assert len(frames) == 2 and frames[0].shape == (3, 4)
    finally:
        v.stop()


def test_closed_loop_state_applies_edits():
    """POSTed actor edits and the render time must actually reach
    render_pose (regression: edits were stored but never applied)."""
    from neuradar_tpu.scripts.closed_loop import ClosedLoopState

    recorded = {}

    class MockPipeline:
        def render_pose(self, variables, c2w, hw=(96, 156), actor_edits=None, time_s=0.0):
            recorded.update(edits=actor_edits, time_s=time_s, hw=hw)
            return np.zeros((hw[0], hw[1], 3), np.uint8)

    class MockTrainer:
        pipeline = MockPipeline()

        def eval_variables(self):
            return {}

    state = ClosedLoopState(MockTrainer())
    state.set_edits({"lateral": 2.0, "index": 1, "remove": True})
    state.render(np.eye(3, 4).reshape(-1).tolist(), 1.5, [24, 36])
    assert recorded["edits"].lateral == 2.0
    assert recorded["edits"].index == 1
    assert recorded["edits"].remove is True
    assert recorded["time_s"] == 1.5


def test_viewer_preview_resolution_passthrough():
    """In-motion requests carry preview=True to a 4-arg render_fn (the
    render_state_machine low-res-move behavior); static requests don't."""
    from neuradar_tpu.viewer.viewer import ViewerServer

    seen = []

    def render_fn(c2w, actor, overlays, preview):
        seen.append(preview)
        hw = (6, 8) if preview else (12, 16)
        return np.full(hw + (3,), 90, np.uint8)

    port = _free_port()
    v = ViewerServer(render_fn=render_fn, port=port)
    v.start()
    try:
        for body in ({"eye": [0, 0, 2], "target": [5, 0, 1], "preview": True},
                     {"eye": [0, 0, 2], "target": [5, 0, 1]}):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/render", data=json.dumps(body).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=10) as r:
                assert r.read()[:2] == b"\xff\xd8"
        assert seen == [True, False]
    finally:
        v.stop()


def test_standalone_viewer_build(tmp_path):
    """scripts/viewer.build_viewer wires a frozen trainer into the viewer
    (reference run_viewer.py RunViewer). Uses a stub trainer to keep this a
    server test; the CLI loader is shared with render.py (tested there)."""
    from neuradar_tpu.scripts.viewer import build_viewer

    class _Pipe:
        class outputs:
            trajectories = []
            camera_to_worlds = np.eye(3, 4, dtype=np.float32)[None]

        @staticmethod
        def render_pose(variables, c2w, actor_edits=None, hw=(96, 156), time_s=0.0, output="rgb"):
            return np.full((hw[0], hw[1], 3), 77, np.uint8)

        @staticmethod
        def viewer_intrinsics(hw):
            return 100.0, 100.0, hw[1] / 2, hw[0] / 2

    class _Trainer:
        pipeline = _Pipe()
        _step = 42

        @staticmethod
        def eval_variables():
            return {}

    port = _free_port()
    v = build_viewer(_Trainer(), port=port)
    v.start()
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/stats", timeout=10) as r:
            j = json.loads(r.read())
            assert j == {"step": 42, "mode": "frozen"}
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/render",
            data=json.dumps({"eye": [0, 0, 2], "target": [5, 0, 1], "preview": True}).encode(),
        )
        with urllib.request.urlopen(req, timeout=10) as r:
            assert r.read()[:2] == b"\xff\xd8"
    finally:
        v.stop()


def test_viewer_server_time_passthrough():
    """The HUD time slider scrubs scene time: /render's `time` field reaches
    a 5-arity callback as time_s (dynamic actors move along trajectories)."""
    import urllib.request

    from neuradar_tpu.viewer.viewer import ViewerServer

    seen = []

    def render_fn(c2w, actor=None, overlays=None, preview=False, time_s=0.0):
        seen.append((preview, time_s))
        return np.full((12, 16, 3), 64, np.uint8)

    port = _free_port()
    v = ViewerServer(render_fn=render_fn, port=port)
    v.start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/render",
            data=json.dumps({"eye": [0, 0, 2], "target": [5, 0, 1],
                             "time": 3.5, "preview": True}).encode(),
        )
        with urllib.request.urlopen(req, timeout=10) as r:
            assert r.status == 200
        assert seen == [(True, 3.5)]
    finally:
        v.stop()


def test_render_state_machine_transitions():
    """Progressive re-render decider (cf. reference
    viewer/render_state_machine.py:1-451): interaction demotes to low_move,
    settle polls promote low_move -> low_static -> high, a plain request is
    served directly at full resolution."""
    from neuradar_tpu.viewer.render_state_machine import RenderStateMachine

    m = RenderStateMachine()
    # drag: every move event stays at low_move, half resolution, pending
    assert m.action("poseA", moving=True, settle=False) == ("low_move", 0.5, True)
    assert m.action("poseB", moving=True, settle=False) == ("low_move", 0.5, True)
    # motion stops: settle polls sharpen through low_static to high
    assert m.action("poseB", moving=False, settle=True) == ("low_static", 0.75, True)
    assert m.action("poseB", moving=False, settle=True) == ("high", 1.0, False)
    # extra settle polls at high stay settled
    assert m.action("poseB", moving=False, settle=True) == ("high", 1.0, False)
    # a settle poll whose fingerprint CHANGED is interaction -> low_move
    assert m.action("poseC", moving=False, settle=True) == ("low_move", 0.5, True)
    # plain one-shot request (scripted client): full res, machine parks high
    assert m.action("poseD", moving=False, settle=False) == ("high", 1.0, False)


def test_viewer_progressive_settle_over_http():
    """A drag streams low-res previews, then settle polls sharpen
    low_static -> high; headers drive the client's polling loop."""
    from neuradar_tpu.viewer.viewer import ViewerServer

    seen = []

    def render_fn(c2w, actor=None, overlays=None, preview=False, time_s=0.0):
        seen.append(preview)
        return np.full((12, 16, 3), 90, np.uint8)

    port = _free_port()
    v = ViewerServer(render_fn=render_fn, port=port)
    v.start()
    try:
        def post(body):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/render", data=json.dumps(body).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=10) as r:
                assert r.read()[:2] == b"\xff\xd8"
                return r.headers["X-Render-State"], r.headers["X-Render-Pending"]

        pose = {"eye": [0, 0, 2], "target": [5, 0, 1]}
        assert post({**pose, "preview": True}) == ("low_move", "1")
        assert post({**pose, "settle": True}) == ("low_static", "1")
        assert post({**pose, "settle": True}) == ("high", "0")
        # render callback saw: True (low_move), 0.75 scale, False (high)
        assert seen == [True, 0.75, False]
        # moving the camera under a settle poll demotes back to low_move
        assert post({"eye": [1, 0, 2], "target": [5, 0, 1], "settle": True}) == ("low_move", "1")
    finally:
        v.stop()


def test_viewer_control_endpoint():
    """Live training controls (cf. reference viewer pause/stop buttons):
    /control round-trips through control_fn; a frozen viewer returns 501."""
    from neuradar_tpu.viewer.viewer import ViewerServer

    actions = []

    def control_fn(action):
        actions.append(action)
        return {"paused": action == "pause", "stop_requested": action == "stop", "step": 42}

    def render_fn(c2w):
        return np.zeros((4, 6, 3), np.uint8)

    def post_control(port, action, expect_status=200):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/control", data=json.dumps({"action": action}).encode(),
            headers={"Content-Type": "application/json"},
        )
        try:
            with urllib.request.urlopen(req, timeout=10) as r:
                return r.status, json.loads(r.read())
        except urllib.error.HTTPError as e:
            return e.code, json.loads(e.read())

    import urllib.error

    port = _free_port()
    v = ViewerServer(render_fn=render_fn, control_fn=control_fn, port=port)
    v.start()
    try:
        status, state = post_control(port, "pause")
        assert status == 200 and state["paused"] is True and state["step"] == 42
        status, state = post_control(port, "stop")
        assert status == 200 and state["stop_requested"] is True
        assert actions == ["pause", "stop"]
    finally:
        v.stop()

    # frozen viewer (no trainer attached): 501
    port = _free_port()
    v = ViewerServer(render_fn=render_fn, port=port)
    v.start()
    try:
        status, state = post_control(port, "pause")
        assert status == 501 and "error" in state
    finally:
        v.stop()


def test_viewer_output_selector_passthrough():
    """The render output selector (rgb/depth/accumulation) reaches a 6-arity
    render callback, and switching outputs under a settle poll is treated as
    interaction (fingerprint change -> low_move)."""
    from neuradar_tpu.viewer.viewer import ViewerServer

    seen = []

    def render_fn(c2w, actor=None, overlays=None, preview=False, time_s=0.0, output="rgb"):
        seen.append(output)
        return np.full((8, 12, 3), 70, np.uint8)

    port = _free_port()
    v = ViewerServer(render_fn=render_fn, port=port)
    v.start()
    try:
        def post(body):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/render", data=json.dumps(body).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=10) as r:
                r.read()
                return r.headers["X-Render-State"]

        pose = {"eye": [0, 0, 2], "target": [5, 0, 1]}
        assert post({**pose, "output": "depth"}) == "high"
        assert seen == ["depth"]
        # settle poll with a changed output is interaction, not a sharpen
        assert post({**pose, "output": "accumulation", "settle": True}) == "low_move"
        assert seen == ["depth", "accumulation"]
        # omitted output defaults to rgb
        assert post(pose) == "high"
        assert seen[-1] == "rgb"
    finally:
        v.stop()


def test_render_state_machine_adaptive_preview_scale():
    """In-motion preview resolution adapts to measured render throughput
    (cf. reference render_state_machine._calculate_image_res targeting
    vis_rays_per_sec): slow renders shrink the move scale below the 0.5
    baseline toward the target fps; fast renders stay at the baseline."""
    from neuradar_tpu.viewer.render_state_machine import RenderStateMachine

    m = RenderStateMachine(target_fps=10.0)  # budget 0.1 s/frame
    # fast renders: full-res estimate ~0.02 s -> capped at the 0.5 baseline
    for _ in range(5):
        m.observe(1.0, 0.02)
    state, scale, _ = m.action("p1", moving=True, settle=False)
    assert state == "low_move" and scale == 0.5

    # slow renders: 1.6 s at full res -> sqrt(0.1/1.6) = 0.25
    m2 = RenderStateMachine(target_fps=10.0)
    for _ in range(8):
        m2.observe(1.0, 1.6)
    state, scale, _ = m2.action("p1", moving=True, settle=False)
    assert state == "low_move" and 0.2 < scale < 0.35
    # low_static sits midway between the move scale and full res
    state, scale2, _ = m2.action("p1", moving=False, settle=True)
    assert state == "low_static" and scale < scale2 < 1.0
    # never below the 0.15 floor even for pathologically slow renders
    m3 = RenderStateMachine(target_fps=10.0)
    m3.observe(1.0, 500.0)
    _, scale3, _ = m3.action("p1", moving=True, settle=False)
    assert scale3 == 0.15


def test_viewer_mjpeg_stream():
    """GET /stream is a server-push multipart/x-mixed-replace MJPEG stream
    (viewer.py: the viser-style continuous path — viser pushes frames over
    its websocket, cf. reference nerfstudio/viewer/viewer.py): POST /pose is
    fire-and-forget (204, no body) and the stream loop renders the LATEST
    pose, low-res while poses keep arriving, settling toward `high`."""
    from neuradar_tpu.viewer.viewer import ViewerServer

    calls = []

    def render_fn(c2w, actor=None, overlays=None, preview=False, time_s=0.0):
        calls.append((np.asarray(c2w), preview))
        return np.full((12, 16, 3), 90, np.uint8)

    port = _free_port()
    v = ViewerServer(render_fn=render_fn, port=port)
    v.start()
    try:
        # fire-and-forget pose update: 204 before any render happens
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/pose",
            data=json.dumps({"eye": [0, 0, 2], "target": [5, 0, 1]}).encode(),
        )
        with urllib.request.urlopen(req, timeout=10) as r:
            assert r.status == 204
        # pull 3 frames off the stream (frames=N caps it so the test ends)
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/stream?frames=3", timeout=30
        ) as r:
            assert r.headers["Content-Type"].startswith("multipart/x-mixed-replace")
            raw = r.read()
        parts = [p for p in raw.split(b"--njframe") if b"Content-Type" in p]
        assert len(parts) == 3
        states = []
        for p in parts:
            head, _, body = p.partition(b"\r\n\r\n")
            assert b"image/jpeg" in head
            assert body[:2] == b"\xff\xd8"  # JPEG SOI
            for line in head.split(b"\r\n"):
                if line.startswith(b"X-Render-State:"):
                    states.append(line.split(b":")[1].strip().decode())
        # first frame renders the new pose in motion; with no further pose
        # updates the machine promotes toward high
        assert states[0] == "low_move"
        assert states[-1] in ("low_static", "high")
        # the rendered pose is the POSTed one (camera -z toward target)
        c2w, first_preview = calls[0]
        assert first_preview is True  # in-motion frame is a preview
        fwd = -c2w[:, 2]
        want = np.asarray([5, 0, 1.0]) - np.asarray([0, 0, 2.0])
        want = want / np.linalg.norm(want)
        np.testing.assert_allclose(fwd / np.linalg.norm(fwd), want, atol=1e-5)
    finally:
        v.stop()


def test_viewer_scene_graph_endpoint():
    """/scene serves the client minimap's scene graph (viewer/callbacks.
    make_scene_graph_fn shape): actor polylines + box dims + sensor mounts;
    empty dict when no scene_fn is wired."""
    import urllib.request

    from neuradar_tpu.viewer.viewer import ViewerServer

    def render_fn(c2w):
        return np.zeros((12, 18, 3), np.uint8)

    scene = {
        "actors": [{"dims": [2.0, 4.0, 1.5], "timestamps": [0.0, 1.0],
                    "path": [[0, 0, 0], [1, 0, 0]], "heading": [0.0, 0.0]}],
        "cameras": [[0.0, 0.0, 1.5]],
        "lidars": [[0.0, 0.0, 2.0]],
    }
    port = _free_port()
    v = ViewerServer(render_fn=render_fn, port=port, scene_fn=lambda: scene)
    v.start()
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/scene", timeout=10) as r:
            doc = json.loads(r.read())
        assert doc == scene
        # the page ships the minimap client
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/", timeout=10) as r:
            page = r.read().decode()
        assert "drawMap" in page and "/scene" in page
    finally:
        v.stop()
    # no scene_fn -> empty doc, not an error
    port = _free_port()
    v2 = ViewerServer(render_fn=render_fn, port=port)
    v2.start()
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/scene", timeout=10) as r:
            assert json.loads(r.read()) == {}
    finally:
        v2.stop()
