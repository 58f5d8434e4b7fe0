"""Closed-loop simulation server: render camera views + edit actors over HTTP.

cf. reference nerfstudio/scripts/closed_loop/{main,models,server}.py: a web
service a driving simulator calls to (1) render camera images at arbitrary
ego poses/times and (2) update actor trajectories. FastAPI is not available
in this environment, so the service uses the stdlib http.server with the same
JSON API shape:

  POST /render  {"pose": [[...3x4...]], "time": t, "hw": [H, W]} -> PNG bytes
  GET  /actors                         -> {"trajectories": [...]}
  POST /actors  {"index": i, "lateral": dy, "longitudinal": dx, "rotation": r}
                                        -> applies an ActorEdits-style shift
  GET  /info                           -> scene metadata
"""

from __future__ import annotations

import argparse
import io
import json
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

import numpy as np


class ClosedLoopState:
    def __init__(self, trainer):
        self.trainer = trainer
        self.pipeline = trainer.pipeline
        self.variables = trainer.eval_variables()
        from neuradar_tpu.model_components.dynamic_actors import ActorEdits

        self.edits = ActorEdits()
        self._edits_cls = ActorEdits

    def render(self, pose, time_s, hw):
        c2w = np.asarray(pose, np.float32).reshape(3, 4)
        return self.pipeline.render_pose(
            self.variables, c2w, hw=tuple(hw), time_s=float(time_s), actor_edits=self.edits
        )

    def set_edits(self, d: dict):
        self.edits = self._edits_cls(
            lateral=float(d.get("lateral", 0.0)),
            longitudinal=float(d.get("longitudinal", 0.0)),
            rotation=float(d.get("rotation", 0.0)),
            index=int(d.get("index", -1)),
            remove=bool(d.get("remove", False)),
        )

    def info(self) -> dict:
        out = self.pipeline.outputs
        return {
            "duration": out.duration,
            "image_size": list(out.image_size),
            "num_actors": len(out.trajectories),
            "sensors": out.sensor_idx_to_name,
        }


def serve(state: ClosedLoopState, port: int = 8000) -> ThreadingHTTPServer:
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):
            pass

        def _send(self, code, ctype, body):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path.startswith("/info"):
                self._send(200, "application/json", json.dumps(state.info()).encode())
            elif self.path.startswith("/actors"):
                trajs = [
                    {"timestamps": t["timestamps"].tolist(), "dims": np.asarray(t["dims"]).tolist()}
                    for t in state.pipeline.outputs.trajectories
                ]
                self._send(200, "application/json", json.dumps({"trajectories": trajs}).encode())
            else:
                self._send(404, "text/plain", b"endpoints: /info /actors /render")

        def do_POST(self):
            length = int(self.headers.get("Content-Length", "0"))
            req = json.loads(self.rfile.read(length) or b"{}")
            if self.path.startswith("/render"):
                try:
                    rgb = state.render(req["pose"], req.get("time", 0.0), req.get("hw", [96, 156]))
                    import PIL.Image

                    buf = io.BytesIO()
                    PIL.Image.fromarray(rgb).save(buf, format="PNG")
                    self._send(200, "image/png", buf.getvalue())
                except Exception as e:  # noqa: BLE001
                    self._send(500, "text/plain", str(e).encode())
            elif self.path.startswith("/actors"):
                state.set_edits(req)
                self._send(200, "application/json", b'{"ok": true}')
            else:
                self._send(404, "text/plain", b"not found")

    server = ThreadingHTTPServer(("0.0.0.0", port), Handler)
    return server


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--load-config", type=Path, required=True)
    parser.add_argument("--port", type=int, default=8000)
    args = parser.parse_args(argv)

    from neuradar_tpu.scripts.render import _load_trainer

    run_dir = args.load_config if args.load_config.is_dir() else args.load_config.parent
    trainer = _load_trainer(run_dir)
    state = ClosedLoopState(trainer)
    server = serve(state, args.port)
    print(f"[closed_loop] serving on :{args.port}")
    server.serve_forever()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
