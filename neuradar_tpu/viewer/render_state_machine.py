"""Server-side render state machine.

cf. reference nerfstudio/viewer/render_state_machine.py:1-451 — the reference
viewer drives progressive re-renders through three states:

  low_move   — camera in motion: render cheap low-res frames per event
  low_static — motion just stopped: re-render once at a middle resolution
  high       — fully settled: final full-resolution render, then idle

Over this repo's HTTP request/response viewer the same machine runs
server-side. Every /render request is classified into an event:

  * ``move``   — the client flagged in-motion (``preview: true``) OR the
    request fingerprint (pose/time/actor/overlays) changed under a settle
    poll — interaction always demotes to ``low_move``;
  * ``static`` — a settle poll (``settle: true``) with an unchanged
    fingerprint — each poll promotes one step toward ``high``;
  * ``direct`` — neither flag: a plain one-shot request (initial page load,
    scripted clients) is served at full resolution and parks the machine in
    ``high``.

The response carries ``X-Render-State`` and ``X-Render-Pending`` headers;
the client keeps polling (with ``settle: true``) while pending is 1, so a
drag streams cheap previews and then sharpens low_static -> high.
"""

from __future__ import annotations

import math
import threading
from typing import Hashable, Tuple

TRANSITIONS = {
    ("low_move", "move"): "low_move",
    ("low_move", "static"): "low_static",
    ("low_static", "move"): "low_move",
    ("low_static", "static"): "high",
    ("high", "move"): "low_move",
    ("high", "static"): "high",
}

# baseline resolution scale per state. low_move additionally ADAPTS downward
# from 0.5 when measured render times miss the target fps (the reference
# machine sizes previews from vis_rays_per_sec the same way,
# render_state_machine.py:_calculate_image_res). low_move at the 0.5
# baseline / high are delivered to render callbacks as the legacy booleans
# (True/False) so 4-arity callbacks keep working; other scales pass their
# float through the same argument slot.
SCALES = {"low_move": 0.5, "low_static": 0.75, "high": 1.0}


class RenderStateMachine:
    """Thread-safe (HTTP handler threads race) progressive-render decider."""

    def __init__(self, target_fps: float = 10.0):
        self.state = "high"
        self._target_s = 1.0 / target_fps
        self._full_s_ema = None  # EMA of the estimated FULL-res render seconds
        self._last_key: Hashable = None
        self._lock = threading.Lock()

    def observe(self, scale: float, seconds: float) -> None:
        """Feed back one measured render duration at `scale` — cost scales
        with pixel count, so seconds/scale^2 estimates the full-res cost."""
        full = seconds / max(scale * scale, 1e-4)
        with self._lock:
            self._full_s_ema = full if self._full_s_ema is None else 0.7 * self._full_s_ema + 0.3 * full

    def _move_scale(self) -> float:
        """In-motion scale: hit target fps, never above the 0.5 baseline."""
        if self._full_s_ema is None or self._full_s_ema <= 0:
            return SCALES["low_move"]
        s = math.sqrt(self._target_s / self._full_s_ema)
        return min(SCALES["low_move"], max(0.15, s))

    def action(self, key: Hashable, moving: bool, settle: bool) -> Tuple[str, float, bool]:
        """Advance on one /render request.

        Args:
            key: hashable fingerprint of everything that affects the frame.
            moving: client says the camera is in motion (``preview`` flag).
            settle: client is polling for a sharper frame (``settle`` flag).

        Returns:
            (state, scale, pending): resolution scale for THIS render and
            whether a sharper re-render is still pending (client should poll
            again with ``settle: true``).
        """
        with self._lock:
            if moving:
                event = "move"
            elif settle:
                # a settle poll whose fingerprint changed is still interaction
                event = "static" if key == self._last_key else "move"
            else:
                # plain one-shot request: full resolution, machine settled
                self._last_key = key
                self.state = "high"
                return self.state, 1.0, False
            self._last_key = key
            self.state = TRANSITIONS[(self.state, event)]
            if self.state == "low_move":
                scale = self._move_scale()
            elif self.state == "low_static":
                # midway between the current move scale and full res
                scale = min(SCALES["low_static"], (self._move_scale() + 1.0) / 2.0)
            else:
                scale = 1.0
            return self.state, scale, self.state != "high"
