"""Regenerate a learning-curve artifact from a trainer event log.

`validate_learning --eval-every N` writes its curve JSON only after the run
completes; a run killed mid-way (relay episode, CPU budget) still leaves the
incrementally-appended `events.jsonl` behind. This tool rebuilds the same
curve document from any event log, so a partial trajectory is never lost.

Usage:
  python tools/curve_from_events.py RUN_DIR_OR_EVENTS_JSONL -o curve.json \
      [--meta scale=micro iters=1500 backend=cpu]

The output matches validate_learning's `--curve-output` format:
  {"curves": {key: [[step, value], ...]}, ...metadata}
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path


def find_events(path: Path) -> Path:
    if path.is_file():
        return path
    hits = sorted(path.rglob("events.jsonl"))
    if not hits:
        raise FileNotFoundError(f"no events.jsonl under {path}")
    if len(hits) > 1:
        print(f"[curve_from_events] {len(hits)} logs under {path}; using {hits[-1]}", file=sys.stderr)
    return hits[-1]


def build_curve(events_path: Path, meta: dict) -> dict:
    events = []
    with open(events_path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            try:
                events.append(json.loads(line))
            except json.JSONDecodeError:
                break  # torn final line from a killed writer
    curve_keys = sorted({k for e in events for k in e if k not in ("step", "wall")})
    curves = {}
    for k in curve_keys:
        series = [(e["step"], e[k]) for e in events if k in e]
        if series:
            curves[k] = series
    return {**meta, "source_events": str(events_path), "n_events": len(events), "curves": curves}


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("run_dir", type=Path, help="run directory or events.jsonl path")
    p.add_argument("-o", "--output", required=True)
    p.add_argument("--meta", nargs="*", default=[], help="key=value metadata pairs")
    args = p.parse_args(argv)

    meta = {}
    for kv in args.meta:
        k, _, v = kv.partition("=")
        try:
            meta[k] = json.loads(v)
        except json.JSONDecodeError:
            meta[k] = v
    doc = build_curve(find_events(args.run_dir), meta)
    with open(args.output, "w") as f:
        json.dump(doc, f)
    print(json.dumps({"output": args.output, "n_events": doc["n_events"],
                      "curve_keys": sorted(doc["curves"])}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
