#!/bin/bash
# Round-5 background waiter: probe the axon tunnel every 3 min
# (subprocess, timed out — in-process backend init hangs forever when
# the tunnel is down); whenever it answers, (re-)run the consolidated
# round-5 battery. The battery persists each leg into chip_sessions/
# as it completes and skips legs already done, so a flapping tunnel
# accumulates results across windows; exit once every leg is complete.
set -u
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/tpu_session_r5}"
PROBE='import jax; d=jax.devices(); assert d[0].platform!="cpu", d; print(d[0].platform)'
for i in $(seq 1 300); do
  if timeout 120 python -c "$PROBE" >/dev/null 2>&1; then
    echo "[wait] tunnel UP at $(date +%H:%M:%S) (probe $i)"
    if bash scripts/tpu_session_r5.sh "$OUT"; then
      echo "[wait] battery complete at $(date +%H:%M:%S)"
      exit 0
    fi
    echo "[wait] battery incomplete (tunnel flap?) — resuming probes"
  else
    echo "[wait] probe $i: down ($(date +%H:%M:%S))"
  fi
  sleep 180
done
echo "[wait] gave up after 300 probes"
exit 1
