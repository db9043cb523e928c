#!/bin/bash
# Background waiter: probe the axon tunnel every 4 min (subprocess,
# timed out — in-process backend init hangs forever when the tunnel is
# down); whenever it answers, (re-)run the measurement battery. The
# battery skips legs already completed (rc=0), so a flapping tunnel
# accumulates results across windows; exit once every leg is complete.
set -u
cd "$(dirname "$0")/.."   # the battery is invoked by repo-relative path
OUT="${1:-/tmp/tpu_session_r3}"
PROBE='import jax; d=jax.devices(); assert d[0].platform!="cpu", d; print(d[0].platform)'
for i in $(seq 1 200); do
  if timeout 120 python -c "$PROBE" >/dev/null 2>&1; then
    echo "[wait] tunnel UP at $(date +%H:%M:%S) (probe $i)"
    if bash scripts/tpu_session.sh "$OUT"; then
      echo "[wait] battery complete at $(date +%H:%M:%S)"
      exit 0
    fi
    echo "[wait] battery incomplete (tunnel flap?) — resuming probes"
  else
    echo "[wait] probe $i: down ($(date +%H:%M:%S))"
  fi
  sleep 240
done
echo "[wait] gave up after 200 probes"
exit 1
