#!/bin/bash
# Session companion: probe the relay until healthy, then run the full
# healthy-window playbook automatically (VERDICT r3 item 1: window-first).
# The watcher exits 0 on RELAY_HEALTHY (and is then no longer probing, per
# the playbook's "stop the watcher first" rule), so chaining is safe.
# Logs: /tmp/relay_watch.jsonl (probes), /tmp/healthy_window.log (playbook).
set -u
cd "$(dirname "$0")/.."
echo "[watch_then_measure] start $(date -u +%FT%TZ)" >> /tmp/healthy_window.log
python tools/relay_watch.py --interval "${INTERVAL:-15}" --max-hours "${MAX_HOURS:-11}"
rc=$?
if [ "$rc" -eq 0 ]; then
  echo "[watch_then_measure] RELAY_HEALTHY at $(date -u +%FT%TZ); launching playbook" >> /tmp/healthy_window.log
  bash tools/healthy_window.sh
else
  echo "[watch_then_measure] no healthy window (rc=$rc) $(date -u +%FT%TZ)" >> /tmp/healthy_window.log
fi
