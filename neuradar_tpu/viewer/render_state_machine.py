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

# resolution scale per state. low_move/high are delivered to render
# callbacks as the legacy booleans (True/False) so 4-arity callbacks keep
# working; the intermediate state passes its float scale through the same
# argument slot.
SCALES = {"low_move": 0.5, "low_static": 0.75, "high": 1.0}


class RenderStateMachine:
    """Thread-safe (HTTP handler threads race) progressive-render decider."""

    def __init__(self):
        self.state = "high"
        self._last_key: Hashable = None
        self._lock = threading.Lock()

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
            return self.state, SCALES[self.state], self.state != "high"
