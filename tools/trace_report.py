"""Turn a jax.profiler trace into an op-category device-time table.

The trainer captures a device trace around steps 12-17 when run with
`--profiler jax` (cf. reference nerfstudio/utils/profiler.py:134-179 which
wraps the same window in torch.profiler + chrome export). The reference
inspects those chrome traces by hand in perfetto; here the analysis itself
is scripted: parse the XPlane protos TensorBoard's profile plugin writes,
sum per-HLO-op self time on the device planes, roll ops up into the
categories that matter for this model (hashgrid gathers, MXU matmuls,
fusions, scatter-adds, collectives), and print a table for
docs/PERFORMANCE.md.

Usage:
  python tools/trace_report.py <run_dir_or_profiles_dir> [--top 25] [--json]

Accepts either the trainer run dir (looks under profiles/) or any directory
containing *.xplane.pb files (searched recursively).
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from collections import defaultdict
from pathlib import Path

CATEGORIES = [
    # (category, regex over "name|display_name" lowercased) — first match wins
    ("gather", re.compile(r"gather")),
    ("scatter-add (hash bwd)", re.compile(r"scatter")),
    ("matmul (MXU)", re.compile(r"\b(dot|conv|einsum)|dot_general|convolution")),
    ("sort/searchsorted (PDF)", re.compile(r"\bsort|search")),
    ("collective", re.compile(r"all-reduce|all-gather|reduce-scatter|collective|psum|ppermute")),
    ("pallas kernel", re.compile(r"custom-call.*(mosaic|pallas)|fused_composite|attention_fwd|attention_bwd")),
    ("rng", re.compile(r"rng|threefry")),
    ("copy/transpose", re.compile(r"\bcopy|transpose|bitcast|reshape")),
    ("reduce", re.compile(r"\breduce")),
    ("fusion (elementwise)", re.compile(r"fusion|cmp|select|add|multiply|subtract|divide|exp|log|tanh")),
]


def categorize(name: str) -> str:
    low = name.lower()
    for cat, rx in CATEGORIES:
        if rx.search(low):
            return cat
    return "other"


def find_xplanes(root: Path) -> list:
    if root.is_file() and root.name.endswith(".xplane.pb"):
        return [root]
    cands = sorted(root.rglob("*.xplane.pb"))
    if not cands and (root / "profiles").exists():
        cands = sorted((root / "profiles").rglob("*.xplane.pb"))
    return cands


def load_xspace(path: Path):
    try:  # plugin location (newer releases)
        from tensorboard_plugin_profile.protobuf import xplane_pb2
    except ImportError:  # tensorflow's bundled copy (this image's tf 2.21)
        from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    xs.ParseFromString(path.read_bytes())
    return xs


def device_op_times(xspace) -> dict:
    """Sum event durations per op name across device planes.

    Uses the 'XLA Ops' line (leaf HLO executions) when present; falls back
    to all lines of device planes otherwise. Host/python planes are skipped
    — this reports DEVICE time.
    """
    def accumulate(plane, lines, per_op, plane_total):
        meta = plane.event_metadata
        total = 0.0
        for line in lines:
            for ev in line.events:
                md = meta.get(ev.metadata_id)
                name = (md.display_name or md.name) if md is not None else str(ev.metadata_id)
                if name.startswith("end: "):  # async completion marker, not a new op
                    continue
                dur_ms = ev.duration_ps / 1e9
                per_op[name] += dur_ms
                total += dur_ms
        if total:
            plane_total[plane.name] = plane_total.get(plane.name, 0.0) + total

    per_op = defaultdict(float)
    plane_total = {}
    for plane in xspace.planes:
        pname = plane.name
        if not ("TPU" in pname or "GPU" in pname or "/device:" in pname or pname.startswith("Device")):
            continue
        lines = [ln for ln in plane.lines if "xla op" in ln.name.lower()] or list(plane.lines)
        accumulate(plane, lines, per_op, plane_total)
    if not per_op:
        # CPU-backend traces have no device plane; XLA executable-level events
        # sit on the host plane's PjRt client line (coarser: one event per
        # executed program, not per HLO op — still enough for step timing).
        for plane in xspace.planes:
            if "CPU" not in plane.name:
                continue
            lines = [ln for ln in plane.lines if "xla" in ln.name.lower()]
            accumulate(plane, lines, per_op, plane_total)
    return per_op, plane_total


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("path", type=Path)
    ap.add_argument("--top", type=int, default=25, help="top-N ops to list")
    ap.add_argument("--json", action="store_true", help="emit one JSON blob instead of a table")
    args = ap.parse_args(argv)

    xplanes = find_xplanes(args.path)
    if not xplanes:
        print(f"no *.xplane.pb under {args.path}", file=sys.stderr)
        return 2

    per_op = defaultdict(float)
    planes = {}
    for p in xplanes:
        ops, totals = device_op_times(load_xspace(p))
        for k, v in ops.items():
            per_op[k] += v
        for k, v in totals.items():
            planes[k] = planes.get(k, 0.0) + v

    if not per_op:
        print("no device-plane events found (host-only trace? relay may not stream device traces)", file=sys.stderr)
        return 3

    total = sum(per_op.values())
    by_cat = defaultdict(float)
    for name, ms in per_op.items():
        by_cat[categorize(name)] += ms
    cats = sorted(by_cat.items(), key=lambda kv: -kv[1])
    top_ops = sorted(per_op.items(), key=lambda kv: -kv[1])[: args.top]

    if args.json:
        print(json.dumps({
            "files": [str(p) for p in xplanes],
            "device_total_ms": round(total, 3),
            "planes": {k: round(v, 3) for k, v in planes.items()},
            "categories_ms": {k: round(v, 3) for k, v in cats},
            "top_ops_ms": [[n, round(v, 4)] for n, v in top_ops],
        }))
        return 0

    print(f"device time total: {total:.2f} ms across {len(planes)} plane(s), {len(per_op)} ops")
    print("\n== category rollup ==")
    for cat, ms in cats:
        print(f"{ms:10.3f} ms  {100 * ms / total:5.1f}%  {cat}")
    print(f"\n== top {len(top_ops)} ops ==")
    for name, ms in top_ops:
        print(f"{ms:10.4f} ms  {100 * ms / total:5.1f}%  {name[:110]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
