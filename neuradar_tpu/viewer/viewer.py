"""Interactive web viewer: orbit the trained scene from a browser.

cf. reference nerfstudio/viewer/ (viser websocket viewer, 7.5k LoC). viser is
not available in this environment, so this is a dependency-free equivalent:
a small threaded HTTP server serving an embedded orbit-controls page; every
camera move POSTs a pose and receives a freshly rendered JPEG from the model.
Renders run on the shared device between train steps (the reference
serializes with train_lock at trainer.py:312; here device dispatch order
provides the same exclusion).
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, Optional

import numpy as np

_PAGE = """<!DOCTYPE html>
<html><head><title>neuradar-tpu viewer</title><style>
body { margin:0; background:#111; color:#eee; font-family:monospace; }
#hud { position:fixed; top:8px; left:8px; background:#000a; padding:8px; border-radius:6px; }
canvas { display:block; margin:auto; }
</style></head><body>
<div id="hud">neuradar-tpu viewer &mdash; drag to orbit, wheel to zoom, WASD to move<br/>
<span id="stats"></span></div>
<canvas id="view" width="624" height="384"></canvas>
<script>
let az = 0, el = 0.15, dist = 12, cx = 0, cy = 0, cz = 1.5;
let dragging = false, lx = 0, ly = 0, pending = false;
const canvas = document.getElementById('view');
const ctx = canvas.getContext('2d');
function pose() {
  const fx = Math.cos(el) * Math.cos(az), fy = Math.cos(el) * Math.sin(az), fz = Math.sin(el);
  return {eye: [cx - dist * fx, cy - dist * fy, cz - dist * fz], target: [cx, cy, cz]};
}
async function render() {
  if (pending) return; pending = true;
  const r = await fetch('/render', {method: 'POST', body: JSON.stringify(pose())});
  const blob = await r.blob();
  const img = await createImageBitmap(blob);
  ctx.drawImage(img, 0, 0, canvas.width, canvas.height);
  pending = false;
}
canvas.onmousedown = e => { dragging = true; lx = e.clientX; ly = e.clientY; };
window.onmouseup = () => dragging = false;
window.onmousemove = e => {
  if (!dragging) return;
  az -= (e.clientX - lx) * 0.005; el += (e.clientY - ly) * 0.005;
  el = Math.max(-1.3, Math.min(1.3, el)); lx = e.clientX; ly = e.clientY; render();
};
canvas.onwheel = e => { dist *= Math.exp(e.deltaY * 0.001); render(); e.preventDefault(); };
window.onkeydown = e => {
  const s = 2.0, fx = Math.cos(az), fy = Math.sin(az);
  if (e.key === 'w') { cx += s * fx; cy += s * fy; }
  if (e.key === 's') { cx -= s * fx; cy -= s * fy; }
  if (e.key === 'a') { cx -= s * fy; cy += s * fx; }
  if (e.key === 'd') { cx += s * fy; cy -= s * fx; }
  render();
};
async function stats() {
  try {
    const r = await fetch('/stats'); const j = await r.json();
    document.getElementById('stats').textContent = JSON.stringify(j);
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

    render_fn(c2w [3,4]) -> rgb uint8 [H, W, 3]; stats_fn() -> dict.
    """

    def __init__(self, render_fn: Callable, stats_fn: Optional[Callable] = None, port: int = 7007):
        self.render_fn = render_fn
        self.stats_fn = stats_fn or (lambda: {})
        self.port = port
        self._server: Optional[ThreadingHTTPServer] = None

    def start(self) -> None:
        viewer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):  # quiet
                pass

            def do_GET(self):
                if self.path.startswith("/stats"):
                    body = json.dumps(viewer.stats_fn()).encode()
                    self._send(200, "application/json", body)
                else:
                    self._send(200, "text/html", _PAGE.encode())

            def do_POST(self):
                if not self.path.startswith("/render"):
                    self._send(404, "text/plain", b"not found")
                    return
                length = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(length) or b"{}")
                eye = np.asarray(req.get("eye", [0, 0, 2.0]), np.float32)
                target = np.asarray(req.get("target", [10, 0, 1.0]), np.float32)
                try:
                    rgb = viewer.render_fn(_look_at(eye, target))
                    import PIL.Image

                    buf = io.BytesIO()
                    PIL.Image.fromarray(rgb).save(buf, format="JPEG", quality=85)
                    self._send(200, "image/jpeg", buf.getvalue())
                except Exception as e:  # noqa: BLE001
                    self._send(500, "text/plain", str(e).encode())

            def _send(self, code, ctype, body):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        self._server = ThreadingHTTPServer(("0.0.0.0", self.port), Handler)
        thread = threading.Thread(target=self._server.serve_forever, daemon=True)
        thread.start()
        print(f"[viewer] http://localhost:{self.port}")

    def stop(self) -> None:
        if self._server is not None:
            self._server.shutdown()
