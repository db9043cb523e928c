#!/bin/bash
# Background waiter: probe the axon tunnel every 4 min (subprocess,
# timed out — in-process backend init hangs forever when the tunnel is
# down); the moment it answers, run the one-shot measurement battery.
set -u
OUT="${1:-/tmp/tpu_session_r3}"
PROBE='import jax; d=jax.devices(); assert d[0].platform!="cpu", d; print(d[0].platform)'
for i in $(seq 1 200); do
  if timeout 120 python -c "$PROBE" >/dev/null 2>&1; then
    echo "[wait] tunnel UP at $(date +%H:%M:%S) (probe $i)"
    bash scripts/tpu_session.sh "$OUT"
    exit 0
  fi
  echo "[wait] probe $i: down ($(date +%H:%M:%S))"
  sleep 240
done
echo "[wait] gave up after 200 probes"
exit 1
