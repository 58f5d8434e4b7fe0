"""Relay health watcher: probe the axon TPU link until it looks healthy.

Loops forever (bounded by --max-hours), probing every --interval minutes:
  stage 1: time N varied small matmul value-fetches (healthy: ~40 ms/call;
           degraded episodes execute ~500x slow, so even these crawl).
  stage 2: if stage 1 is fast, run a micro-scale bench.py worker (init +
           compile + its adaptive timed window — the smallest production
           measurement, known to survive every episode) and check its rays/s
           against the degraded-regime ceiling (~1k).

Exits 0 the first time BOTH stages pass (so a background launcher can react),
exits 3 on --max-hours elapsed without a healthy window. Appends one JSON
line per probe to /tmp/relay_watch.jsonl.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time

PROBE_SRC = r"""
import time, sys
import jax, jax.numpy as jnp
t0 = time.time()
jax.devices()
init_s = time.time() - t0
times = []
for i in range(3):
    x = jnp.full((1024, 1024), 1.0 + i, jnp.bfloat16)
    t0 = time.time()
    v = float((x @ x).sum())
    times.append(time.time() - t0)
print("PROBE_OK", init_s, min(times))
"""


def probe_small(timeout_s: int) -> dict:
    t0 = time.time()
    try:
        out = subprocess.run(
            [sys.executable, "-c", PROBE_SRC],
            capture_output=True, text=True, timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        return {"stage": "small", "ok": False, "why": "timeout", "wall_s": time.time() - t0}
    for line in out.stdout.splitlines():
        if line.startswith("PROBE_OK"):
            _, init_s, call_s = line.split()
            return {
                "stage": "small", "ok": float(call_s) < 1.0,
                "init_s": round(float(init_s), 1), "call_s": round(float(call_s), 3),
                "wall_s": round(time.time() - t0, 1),
            }
    return {"stage": "small", "ok": False, "why": "crash", "rc": out.returncode,
            "tail": (out.stderr or out.stdout)[-300:], "wall_s": round(time.time() - t0, 1)}


def probe_micro(timeout_s: int) -> dict:
    """Micro-scale production measurement: `bench.py --worker --scale micro`
    (full worker init + warmup + adaptive timed window, bounded by timeout_s)."""
    t0 = time.time()
    cmd = [sys.executable, "bench.py", "--worker", "--chunks", "8",
           "--scale", "micro", "--scan-steps", "1"]
    try:
        out = subprocess.run(cmd, capture_output=True, text=True, timeout=timeout_s, cwd="/root/repo")
    except subprocess.TimeoutExpired:
        return {"stage": "micro", "ok": False, "why": "timeout", "wall_s": round(time.time() - t0, 1)}
    rays_s = None
    for line in (out.stdout or "").splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                rec = json.loads(line)
                rays_s = rec.get("value")
            except json.JSONDecodeError:
                pass
    healthy = rays_s is not None and rays_s > 5000.0  # degraded regime crawls at ~700
    return {"stage": "micro", "ok": healthy, "rays_s": rays_s, "rc": out.returncode,
            "wall_s": round(time.time() - t0, 1)}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--interval", type=float, default=20.0, help="minutes between probes")
    ap.add_argument("--max-hours", type=float, default=11.0)
    ap.add_argument("--log", default="/tmp/relay_watch.jsonl")
    ap.add_argument("--skip-micro", action="store_true", help="stage-1 matmul probe only")
    args = ap.parse_args()

    deadline = time.time() + args.max_hours * 3600
    while time.time() < deadline:
        rec = {"ts": time.time()}
        small = probe_small(timeout_s=420)
        rec["small"] = small
        if small["ok"] and not args.skip_micro:
            rec["micro"] = probe_micro(timeout_s=1500)
        with open(args.log, "a") as f:
            f.write(json.dumps(rec) + "\n")
        healthy = small["ok"] and (args.skip_micro or rec.get("micro", {}).get("ok"))
        print(json.dumps(rec), flush=True)
        if healthy:
            print("RELAY_HEALTHY", flush=True)
            return 0
        time.sleep(args.interval * 60)
    return 3


if __name__ == "__main__":
    sys.exit(main())
