#!/bin/bash
# Pre-warm the TPU compile caches for the exact bench programs (compile-only,
# no device execution — works during degraded episodes once the relay at
# least answers backend init). Retries each program until it succeeds once;
# exits when all three are warm. Run AFTER any CPU-heavy job finishes (one
# core: tracing the full step needs minutes of CPU).
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/warm_caches.log}
exec >>"$LOG" 2>&1
echo "=== warm_caches $(date -u +%FT%TZ) ==="
declare -A done
progs=(
  "--chunks 8 --scale full --scan-steps 4"
  "--chunks 8 --scale full --scan-steps 1"
  "--chunks 8 --scale micro --scan-steps 1"
)
for attempt in $(seq 1 40); do
  all=1
  for p in "${progs[@]}"; do
    [ "${done[$p]:-}" = 1 ] && continue
    echo "--- [$(date -u +%T)] warm: $p"
    if NEURADAR_BENCH_COMPILE_ONLY=1 timeout -k 60 1500 python bench.py --worker $p \
        | grep -q '"metric": "compile_s"'; then
      echo "--- warm OK: $p"
      done[$p]=1
    else
      echo "--- warm failed (relay init hang or compile fault): $p"
      all=0
    fi
  done
  [ "$all" = 1 ] && { echo "=== all warm $(date -u +%FT%TZ)"; exit 0; }
  sleep 900
done
echo "=== gave up $(date -u +%FT%TZ)"; exit 1
