"""Interactive web viewer: orbit the trained scene from a browser.

cf. reference nerfstudio/viewer/ (viser websocket viewer, 7.5k LoC). viser is
not available in this environment, so this is a dependency-free equivalent:
a small threaded HTTP server serving an embedded orbit-controls page; every
camera move POSTs a pose and receives a freshly rendered JPEG from the model.
Renders run on the shared device between train steps (the reference
serializes with train_lock at trainer.py:312; here device dispatch order
provides the same exclusion).

Feature parity with the reference viewer beyond orbiting:
  * actor editing (lateral/longitudinal/rotation shift or removal of dynamic
    actors, cf. the reference's viewer actor controls wired into
    DynamicActors.edit_boxes2world) — the HUD fields POST an `actor` dict
    which the trainer converts to ActorEdits,
  * camera-path authoring: "add keyframe" collects poses server-side and
    GET /camera_path returns a nerfstudio-style camera_path.json consumable
    by `render.py camera-path` and `render_radar.py camera-path`,
  * server-push streaming (the reference viewer's continuous feel, where
    viser pushes frames over its websocket): GET /stream is a
    multipart/x-mixed-replace MJPEG stream — the client fire-and-forgets
    pose updates to POST /pose and the server's stream loop renders the
    LATEST pose as fast as the model allows (state-machine scaled while
    poses keep arriving, settling to full resolution when they stop),
    instead of one request-response round trip per frame.
"""

from __future__ import annotations

import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, List, Optional

import numpy as np

_PAGE = """<!DOCTYPE html>
<html><head><title>neuradar-tpu viewer</title><style>
body { margin:0; background:#111; color:#eee; font-family:monospace; }
#hud { position:fixed; top:8px; left:8px; background:#000a; padding:8px; border-radius:6px; }
#hud input { width:52px; background:#222; color:#eee; border:1px solid #444; }
canvas { display:block; margin:auto; }
button { background:#333; color:#eee; border:1px solid #555; border-radius:4px; }
</style></head><body>
<div id="hud">neuradar-tpu viewer &mdash; drag to orbit, wheel to zoom, WASD to move<br/>
<span id="stats"></span><br/>
actor <input id="aidx" type="number" value="-1" title="actor index (-1 = all)"/>
lat <input id="alat" type="number" value="0" step="0.5"/>
long <input id="along" type="number" value="0" step="0.5"/>
rot <input id="arot" type="number" value="0" step="0.1"/>
<label><input id="arem" type="checkbox" style="width:auto"/>remove</label>
<button onclick="render()">apply</button><br/>
time <input id="atime" type="range" min="0" max="12" value="0" step="0.1"
  style="width:140px" oninput="document.getElementById('atv').textContent=this.value; render(true)"
  onchange="render()" title="scene time (s): dynamic actors move along their trajectories"/>
<span id="atv">0</span>s <button id="play" onclick="togglePlay()">&#9654;</button><br/>
show <label><input id="olidar" type="checkbox" style="width:auto" onchange="render()"/>lidar</label>
<label><input id="oradar" type="checkbox" style="width:auto" onchange="render()"/>radar</label>
<label><input id="oboxes" type="checkbox" style="width:auto" onchange="render()"/>boxes</label>
<label><input id="ofrusta" type="checkbox" style="width:auto" onchange="render()"/>frusta</label>
output <select id="osel" onchange="render()" style="width:auto">
<option value="rgb">rgb</option><option value="depth">depth</option>
<option value="accumulation">accumulation</option></select><br/>
<label><input id="ostream" type="checkbox" style="width:auto"
  onchange="toggleStream(this.checked)" title="server-push MJPEG stream instead of per-request polling"/>stream</label>
<button onclick="keyframe()">add keyframe</button>
<a href="/camera_path" download="camera_path.json" style="color:#8cf">download path</a>
<span id="kf"></span><br/>
train <button onclick="control('pause')">&#9646;&#9646;</button>
<button onclick="control('resume')">&#9654;</button>
<button onclick="control('stop')" title="finish training (saves final checkpoint)">&#9632;</button>
<span id="trainstate"></span></div>
<canvas id="view" width="624" height="384"></canvas>
<img id="mjpeg" width="624" height="384" style="display:none;margin:auto"/>
<canvas id="map" width="170" height="170" title="scene map: actors (orange), cameras (cyan), lidar (green), radar (magenta); click to teleport"
 style="position:fixed;right:8px;bottom:8px;background:rgba(0,0,0,0.55);border:1px solid #444"></canvas>
<script>
let az = 0, el = 0.15, dist = 12, cx = 0, cy = 0, cz = 1.5;
let dragging = false, lx = 0, ly = 0, pending = false;
const canvas = document.getElementById('view');
const ctx = canvas.getContext('2d');
let streaming = false, lastPose = 0;
function toggleStream(on) {  // server-push MJPEG instead of request/response
  streaming = on;
  const img = document.getElementById('mjpeg');
  img.style.display = on ? 'block' : 'none';
  canvas.style.display = on ? 'none' : 'block';
  if (on) { img.src = '/stream'; postPose(true); } else { img.src = ''; render(); }
}
function postPose(force) {  // fire-and-forget, ~30 Hz throttle
  const now = performance.now();
  if (!force && now - lastPose < 33) return;
  lastPose = now;
  fetch('/pose', {method: 'POST', body: JSON.stringify(pose())});
}
// ---- client-side scene map (top-down world xy; server /scene) ----------
let sceneDoc = null, mapScale = 1, mapCx = 0, mapCy = 0;
const map = document.getElementById('map'), mctx = map.getContext('2d');
function mapXY(p) { return [85 + (p[0] - mapCx) * mapScale, 85 - (p[1] - mapCy) * mapScale]; }
function drawMap() {
  if (!sceneDoc) return;
  mctx.clearRect(0, 0, 170, 170);
  const t = +document.getElementById('atime').value;
  mctx.strokeStyle = '#ff9640'; mctx.fillStyle = '#ff9640'; mctx.lineWidth = 1;
  for (const a of sceneDoc.actors || []) {
    mctx.beginPath();
    a.path.forEach((p, i) => { const [x, y] = mapXY(p); i ? mctx.lineTo(x, y) : mctx.moveTo(x, y); });
    mctx.stroke();
    // box footprint at scene time t (nearest trajectory sample)
    let bi = 0; (a.timestamps || []).forEach((ts, i) => { if (Math.abs(ts - t) < Math.abs(a.timestamps[bi] - t)) bi = i; });
    const c = a.path[bi], h = a.heading[bi], L = a.dims[1] / 2, W = a.dims[0] / 2;
    const ch = Math.cos(h), sh = Math.sin(h);
    mctx.beginPath();
    [[L, W], [L, -W], [-L, -W], [-L, W]].forEach((d, i) => {
      const [x, y] = mapXY([c[0] + d[0] * ch - d[1] * sh, c[1] + d[0] * sh + d[1] * ch]);
      i ? mctx.lineTo(x, y) : mctx.moveTo(x, y);
    });
    mctx.closePath(); mctx.stroke();
  }
  const dots = [['cameras', '#6ee7ff'], ['lidars', '#7CFC00'], ['radars', '#ff6ef0']];
  for (const [k, col] of dots) {
    mctx.fillStyle = col;
    for (const p of sceneDoc[k] || []) { const [x, y] = mapXY(p); mctx.fillRect(x - 1, y - 1, 2, 2); }
  }
  // current orbit center + view direction
  const [x, y] = mapXY([cx, cy]);
  mctx.strokeStyle = '#fff'; mctx.fillStyle = '#fff';
  mctx.beginPath(); mctx.arc(x, y, 3, 0, 6.284); mctx.fill();
  mctx.beginPath(); mctx.moveTo(x, y);
  mctx.lineTo(x + 9 * Math.cos(az), y - 9 * Math.sin(az)); mctx.stroke();
}
fetch('/scene').then(r => r.json()).then(d => {
  sceneDoc = d;
  const pts = [].concat(...((d.actors || []).map(a => a.path)), d.cameras || [], d.lidars || [], d.radars || []);
  if (pts.length) {
    const xs = pts.map(p => p[0]), ys = pts.map(p => p[1]);
    mapCx = (Math.min(...xs) + Math.max(...xs)) / 2;
    mapCy = (Math.min(...ys) + Math.max(...ys)) / 2;
    const span = Math.max(Math.max(...xs) - Math.min(...xs), Math.max(...ys) - Math.min(...ys), 1);
    mapScale = 150 / span;
  }
  drawMap();
}).catch(() => {});
map.onclick = e => {  // teleport the orbit center to the clicked world xy
  const r = map.getBoundingClientRect();
  cx = mapCx + (e.clientX - r.left - 85) / mapScale;
  cy = mapCy - (e.clientY - r.top - 85) / mapScale;
  drawMap(); render();
};
function pose() {
  const fx = Math.cos(el) * Math.cos(az), fy = Math.cos(el) * Math.sin(az), fz = Math.sin(el);
  const body = {eye: [cx - dist * fx, cy - dist * fy, cz - dist * fz], target: [cx, cy, cz]};
  const aidx = +document.getElementById('aidx').value;
  const lat = +document.getElementById('alat').value;
  const lng = +document.getElementById('along').value;
  const rot = +document.getElementById('arot').value;
  const rem = document.getElementById('arem').checked;
  if (lat || lng || rot || rem) body.actor = {index: aidx, lateral: lat, longitudinal: lng, rotation: rot, remove: rem};
  const ol = document.getElementById('olidar').checked;
  const orr = document.getElementById('oradar').checked;
  const ob = document.getElementById('oboxes').checked;
  const of = document.getElementById('ofrusta').checked;
  if (ol || orr || ob || of) body.overlays = {lidar: ol, radar: orr, boxes: ob, frusta: of};
  body.time = +document.getElementById('atime').value;
  const osel = document.getElementById('osel').value;
  if (osel !== 'rgb') body.output = osel;
  return body;
}
let dirty = false, dirtyPreview = false, settleTimer = null, playing = null;
async function render(preview) {
  drawMap();  // track the orbit marker / actor boxes with every interaction
  if (streaming) { postPose(preview !== true); return; }  // stream mode: push pose, server renders
  // queue the LATEST request's preview flag, not the in-flight one's: a
  // full-res request queued behind a preview must settle full-res (and a
  // drag queued behind a full-res render must stay on the fast path)
  if (pending) { dirty = true; dirtyPreview = preview; return; }
  pending = true;
  let pendingSharper = false;
  try {
    const body = pose();
    if (preview === true) body.preview = true;       // low-res while moving
    else if (preview === 'settle') body.settle = true;  // sharpen poll
    const r = await fetch('/render', {method: 'POST', body: JSON.stringify(body)});
    pendingSharper = r.headers.get('X-Render-Pending') === '1';
    const blob = await r.blob();
    const img = await createImageBitmap(blob);
    ctx.drawImage(img, 0, 0, canvas.width, canvas.height);
  } finally {
    pending = false;
    if (dirty) { dirty = false; render(dirtyPreview); return; }
  }
  // progressive settle (server render state machine): once motion stops,
  // poll for sharper frames until the machine reaches `high`
  if (!playing && (preview === true || (preview === 'settle' && pendingSharper))) {
    clearTimeout(settleTimer);
    settleTimer = setTimeout(() => render('settle'), preview === true ? 300 : 30);
  }
}
async function control(action) {
  const r = await fetch('/control', {method: 'POST', body: JSON.stringify({action: action})});
  const j = await r.json();
  document.getElementById('trainstate').textContent =
    j.error ? j.error : (j.stop_requested ? 'stopping' : (j.paused ? 'paused' : 'training')) + ' @' + j.step;
}
function togglePlay() {  // animate scene time at preview resolution
  const btn = document.getElementById('play'), t = document.getElementById('atime');
  if (playing) { clearInterval(playing); playing = null; btn.innerHTML = '&#9654;'; render(); return; }
  btn.innerHTML = '&#9646;&#9646;';
  playing = setInterval(() => {
    let v = +t.value + +t.step * 5;
    if (v > +t.max) v = 0;
    t.value = v;
    document.getElementById('atv').textContent = t.value;
    render(true);
  }, 400);
}
async function keyframe() {
  const r = await fetch('/keyframe', {method: 'POST', body: JSON.stringify(pose())});
  const j = await r.json();
  document.getElementById('kf').textContent = ' keyframes: ' + j.count;
}
canvas.onmousedown = e => { dragging = true; lx = e.clientX; ly = e.clientY; };
window.onmouseup = () => dragging = false;
window.onmousemove = e => {
  if (!dragging) return;
  az -= (e.clientX - lx) * 0.005; el += (e.clientY - ly) * 0.005;
  el = Math.max(-1.3, Math.min(1.3, el)); lx = e.clientX; ly = e.clientY; render(true);
};
canvas.onwheel = e => { dist *= Math.exp(e.deltaY * 0.001); render(true); e.preventDefault(); };
window.onkeydown = e => {
  const s = 2.0, fx = Math.cos(az), fy = Math.sin(az);
  if (e.key === 'w') { cx += s * fx; cy += s * fy; }
  if (e.key === 's') { cx -= s * fx; cy -= s * fy; }
  if (e.key === 'a') { cx -= s * fy; cy += s * fx; }
  if (e.key === 'd') { cx += s * fy; cy -= s * fx; }
  render(true);
};
async function stats() {
  try {
    const r = await fetch('/stats'); const j = await r.json();
    document.getElementById('stats').textContent = JSON.stringify(j);
    if (j.scene_duration) document.getElementById('atime').max = j.scene_duration;
  } catch (err) {}
  setTimeout(stats, 2000);
}
render(); stats();
</script></body></html>"""


def _look_at(eye: np.ndarray, target: np.ndarray, up=np.array([0.0, 0.0, 1.0])) -> np.ndarray:
    """c2w [3, 4] for our convention: camera looks down -z, y up."""
    forward = target - eye
    forward = forward / (np.linalg.norm(forward) + 1e-9)
    right = np.cross(forward, up)
    if np.linalg.norm(right) < 1e-6:  # looking straight along up (top-down
        # HTTP request): fall back to world-y so the basis stays orthonormal
        right = np.cross(forward, np.array([0.0, 1.0, 0.0]))
    right = right / (np.linalg.norm(right) + 1e-9)
    true_up = np.cross(right, forward)
    c2w = np.eye(3, 4)
    c2w[:3, 0] = right
    c2w[:3, 1] = true_up
    c2w[:3, 2] = -forward
    c2w[:3, 3] = eye
    return c2w.astype(np.float32)


class ViewerServer:
    """Threaded HTTP viewer bound to a render callback.

    render_fn(c2w [3,4]) -> rgb uint8 [H, W, 3]; richer signatures
    (c2w, actor), (c2w, actor, overlays), (c2w, actor, overlays, preview),
    (c2w, actor, overlays, preview, time_s) and
    (..., time_s, output) are detected by arity. time_s
    scrubs dynamic actors along their trajectories (the HUD time slider —
    the reference AD viewer's scene-time control). `preview=True` marks in-motion requests — render
    at reduced resolution for responsiveness and the client settles to a
    full-res frame when motion stops (the reference's render_state_machine
    low-res-move / high-res-static behavior, viewer/render_state_machine.py).
    stats_fn() -> dict.
    """

    def __init__(self, render_fn: Callable, stats_fn: Optional[Callable] = None, port: int = 7007,
                 control_fn: Optional[Callable] = None, scene_fn: Optional[Callable] = None):
        from neuradar_tpu.viewer.render_state_machine import RenderStateMachine

        self.render_fn = render_fn
        self.stats_fn = stats_fn or (lambda: {})
        self.scene_fn = scene_fn  # () -> scene-graph dict for the minimap (/scene)
        self.control_fn = control_fn  # live training controls: fn(action) -> state
        # dict (trainer.control); None = frozen viewer, /control returns 501
        self.port = port
        self.keyframes: List[np.ndarray] = []
        # POST /render poll clients share this machine; each GET /stream
        # handler gets its OWN instance (_stream below) so concurrent or
        # mixed poll+stream clients can't interleave action()/observe() and
        # thrash the adaptive scale. State is a few floats — per-client is
        # free.
        self.state_machine = RenderStateMachine()
        self._stream_slots = threading.Semaphore(4)  # cap concurrent streams
        self._server: Optional[ThreadingHTTPServer] = None
        # latest-pose mailbox for the /stream push loop: /pose overwrites
        # (never queues — a lagging renderer must skip, not replay, stale
        # poses) and notifies every waiting stream
        self._pose_cond = threading.Condition()
        self._pose_seq = 0
        self._pose_req: dict = {}
        import inspect

        try:
            self._arity = len(inspect.signature(render_fn).parameters)
        except (TypeError, ValueError):
            self._arity = 1

    def _render(self, c2w: np.ndarray, actor: Optional[dict], overlays: Optional[dict] = None,
                preview: bool = False, time_s: float = 0.0, output: str = "rgb"):
        if self._arity >= 6:
            return self.render_fn(c2w, actor, overlays, preview, time_s, output)
        if self._arity >= 5:
            return self.render_fn(c2w, actor, overlays, preview, time_s)
        if self._arity >= 4:
            return self.render_fn(c2w, actor, overlays, preview)
        if self._arity >= 3:
            return self.render_fn(c2w, actor, overlays)
        if self._arity >= 2:
            return self.render_fn(c2w, actor)
        return self.render_fn(c2w)

    def camera_path_json(self) -> dict:
        """nerfstudio-style camera_path.json from the collected keyframes
        (flat row-major 4x4 camera_to_world per frame)."""
        frames = []
        for c2w in self.keyframes:
            m = np.eye(4, dtype=np.float32)
            m[:3, :4] = c2w
            frames.append({"camera_to_world": m.reshape(-1).tolist()})
        return {"camera_path": frames, "render_height": 384, "render_width": 624}

    def start(self) -> None:
        viewer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):  # quiet
                pass

            def do_GET(self):
                if self.path.startswith("/stats"):
                    body = json.dumps(viewer.stats_fn()).encode()
                    self._send(200, "application/json", body)
                elif self.path.startswith("/camera_path"):
                    body = json.dumps(viewer.camera_path_json()).encode()
                    self._send(200, "application/json", body)
                elif self.path.startswith("/scene"):
                    doc = viewer.scene_fn() if viewer.scene_fn is not None else {}
                    self._send(200, "application/json", json.dumps(doc).encode())
                elif self.path.startswith("/stream"):
                    self._stream()
                else:
                    self._send(200, "text/html", _PAGE.encode())

            def _stream(self):
                """Server-push MJPEG loop: render the LATEST /pose payload as
                fast as the model allows, at the state machine's adaptive
                scale while poses keep arriving, settling to full resolution
                (state `high`) when they stop. Ends when the client
                disconnects (or after a ?frames=N cap, used by tests)."""
                from urllib.parse import parse_qs, urlparse

                q = parse_qs(urlparse(self.path).query)
                max_frames = int(q.get("frames", [0])[0]) or None
                if not viewer._stream_slots.acquire(blocking=False):
                    self._send(503, "text/plain", b"too many concurrent streams")
                    return
                try:
                    self._stream_loop(max_frames)
                finally:
                    viewer._stream_slots.release()

            def _stream_loop(self, max_frames):
                from neuradar_tpu.viewer.render_state_machine import RenderStateMachine

                state_machine = RenderStateMachine()  # per-client (no sharing)
                self.send_response(200)
                self.send_header("Content-Type", "multipart/x-mixed-replace; boundary=njframe")
                self.send_header("Cache-Control", "no-cache")
                self.end_headers()
                self.close_connection = True
                served_seq = -1
                sent = 0
                while max_frames is None or sent < max_frames:
                    with viewer._pose_cond:
                        # wait for a newer pose; on timeout keep sharpening
                        # the current one until the machine reaches `high`
                        if viewer._pose_seq == served_seq:
                            viewer._pose_cond.wait(timeout=0.1)
                        moved = viewer._pose_seq != served_seq
                        served_seq = viewer._pose_seq
                        req = dict(viewer._pose_req)
                    key = json.dumps({k: req.get(k) for k in
                                      ("eye", "target", "time", "actor", "overlays", "output")},
                                     sort_keys=True)
                    state, scale, pending = state_machine.action(key, moved, not moved)
                    if not moved and not pending and state == "high" and max_frames is None:
                        continue  # fully settled: wait for the next pose
                    eye = np.asarray(req.get("eye", [0, 0, 2.0]), np.float32)
                    target = np.asarray(req.get("target", [10, 0, 1.0]), np.float32)
                    preview = (True if (state == "low_move" and scale == 0.5)
                               else (False if scale >= 1.0 else scale))
                    t_render = time.perf_counter()
                    rgb = viewer._render(_look_at(eye, target), req.get("actor"),
                                         req.get("overlays"), preview,
                                         float(req.get("time", 0.0)),
                                         str(req.get("output", "rgb")))
                    state_machine.observe(scale, time.perf_counter() - t_render)
                    import PIL.Image

                    buf = io.BytesIO()
                    PIL.Image.fromarray(rgb).save(buf, format="JPEG", quality=85)
                    frame = buf.getvalue()
                    try:
                        self.wfile.write(b"--njframe\r\n")
                        self.wfile.write(b"Content-Type: image/jpeg\r\n")
                        self.wfile.write(f"X-Render-State: {state}\r\n".encode())
                        self.wfile.write(f"Content-Length: {len(frame)}\r\n\r\n".encode())
                        self.wfile.write(frame)
                        self.wfile.write(b"\r\n")
                        self.wfile.flush()
                    except (BrokenPipeError, ConnectionResetError):
                        return  # client went away — normal stream teardown
                    sent += 1

            def do_POST(self):
                length = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(length) or b"{}")
                eye = np.asarray(req.get("eye", [0, 0, 2.0]), np.float32)
                target = np.asarray(req.get("target", [10, 0, 1.0]), np.float32)
                c2w = _look_at(eye, target)
                if self.path.startswith("/keyframe"):
                    viewer.keyframes.append(c2w)
                    self._send(200, "application/json", json.dumps({"count": len(viewer.keyframes)}).encode())
                    return
                if self.path.startswith("/pose"):
                    # fire-and-forget pose update feeding GET /stream; the
                    # 204 returns before any render happens
                    with viewer._pose_cond:
                        viewer._pose_req = req
                        viewer._pose_seq += 1
                        viewer._pose_cond.notify_all()
                    self.send_response(204)
                    self.send_header("Content-Length", "0")
                    self.end_headers()
                    return
                if self.path.startswith("/control"):
                    if viewer.control_fn is None:
                        self._send(501, "application/json",
                                   json.dumps({"error": "no trainer attached (frozen viewer)"}).encode())
                        return
                    state = viewer.control_fn(str(req.get("action", "status")))
                    self._send(200, "application/json", json.dumps(state).encode())
                    return
                if not self.path.startswith("/render"):
                    self._send(404, "text/plain", b"not found")
                    return
                try:
                    # progressive re-render decision (render_state_machine.py):
                    # fingerprint everything that affects the frame, classify
                    # the request, render at the machine's resolution scale
                    key = json.dumps({k: req.get(k) for k in
                                      ("eye", "target", "time", "actor", "overlays", "output")},
                                     sort_keys=True)
                    state, scale, pending = viewer.state_machine.action(
                        key, bool(req.get("preview", False)), bool(req.get("settle", False)))
                    # legacy callback contract: baseline low_move -> True,
                    # high -> False; any other (incl. fps-adapted) scale
                    # passes its float through the same slot
                    preview = (True if (state == "low_move" and scale == 0.5)
                               else (False if scale >= 1.0 else scale))
                    t_render = time.perf_counter()
                    rgb = viewer._render(c2w, req.get("actor"), req.get("overlays"),
                                         preview, float(req.get("time", 0.0)),
                                         str(req.get("output", "rgb")))
                    # feed the measured duration back so in-motion previews
                    # adapt toward the machine's target fps
                    viewer.state_machine.observe(scale, time.perf_counter() - t_render)
                    import PIL.Image

                    buf = io.BytesIO()
                    PIL.Image.fromarray(rgb).save(buf, format="JPEG", quality=85)
                    self._send(200, "image/jpeg", buf.getvalue(),
                               extra={"X-Render-State": state,
                                      "X-Render-Pending": "1" if pending else "0"})
                except Exception as e:  # noqa: BLE001
                    self._send(500, "text/plain", str(e).encode())

            def _send(self, code, ctype, body, extra=None):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                for k, v in (extra or {}).items():
                    self.send_header(k, v)
                self.end_headers()
                self.wfile.write(body)

        self._server = ThreadingHTTPServer(("0.0.0.0", self.port), Handler)
        thread = threading.Thread(target=self._server.serve_forever, daemon=True)
        thread.start()
        print(f"[viewer] http://localhost:{self.port}")

    def stop(self) -> None:
        if self._server is not None:
            self._server.shutdown()
