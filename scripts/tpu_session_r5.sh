#!/bin/bash
# Round-5 consolidated on-chip battery: merges tpu_session.sh (round-4
# baselines + confirmations + floors) and tpu_session_r5b.sh (the
# round-5 candidates) into ONE priority-ordered leg list, because the
# previous round-5 window was lost mid-session (/tmp evidence gone with
# the container) — this script persists every leg into
# chip_sessions/ IMMEDIATELY after it completes, so a tunnel flap can
# no longer lose data.
#
#   bash scripts/tpu_session_r5.sh [outdir]
#
# Ordering rationale (tunnel may flap; highest-value-new-data first):
#   1. current-default baselines (di mapped, solve base) — they double
#      as compile+run proof of the shipping defaults on chip
#   2. storage-sharded DI bodies at N=1200 (round-4 advisor finding:
#      never executed on chip post-flat-slice fix)
#   3. solve candidates (slab syrk, isolated HIGH residual)
#   4. NS-iteration and exact-fit-RB DI candidates + N=200 gate points
#   5. wide-N mapped + at-scale sharded tiled (solo)
#   6. golden parity gates (current defaults, ns14, res=high)
#   7. round-4 confirmations (gathered DI, distance sweep, warm batch)
#   8. floor gate + re-pin
#   9. crash-expected documentation legs DEAD LAST (the local-gather
#      body crashed the backend INTERNAL at N=2500 in the lost window
#      and wedged the following leg)
set -u
OUT="${1:-/tmp/tpu_session_r5}"
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
DEST="chip_sessions/$(basename "$OUT")"
mkdir -p "$DEST"
echo "[session] output -> $OUT (persisted to $DEST per-leg)"

export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$HOME/.cache/gdca_xla}"
mkdir -p "$JAX_COMPILATION_CACHE_DIR"

INCOMPLETE=0
run() {  # run <name> <timeout_s> <cmd...>
  local name="$1" t="$2"; shift 2
  # complete = previous attempt exited 0 with output (resume across
  # flaps); also honor results already persisted in the repo copy
  if [ ! -s "$OUT/$name.json" ] && [ -s "$DEST/$name.json" ] \
     && [ "$(cat "$DEST/$name.rc" 2>/dev/null)" = "0" ]; then
    cp "$DEST/$name.json" "$OUT/$name.json"; cp "$DEST/$name.rc" "$OUT/$name.rc"
  fi
  if [ -s "$OUT/$name.json" ] && [ "$(cat "$OUT/$name.rc" 2>/dev/null)" = "0" ]; then
    echo "[session] === $name === (done earlier, skipping)"
    return 0
  fi
  echo "[session] === $name ==="
  timeout "$t" "$@" >"$OUT/$name.json" 2>"$OUT/$name.log"
  local rc=$?
  echo "$rc" > "$OUT/$name.rc"
  echo "[session] $name: rc=$rc"
  if [ "$rc" != 0 ] || [ ! -s "$OUT/$name.json" ]; then
    INCOMPLETE=$((INCOMPLETE + 1))
  fi
  tail -2 "$OUT/$name.log" 2>/dev/null | sed 's/^/  | /'
  cat "$OUT/$name.json" 2>/dev/null | tail -1 | sed 's/^/  > /'
  # persist the leg NOW — a later flap or backend wedge must not lose it
  cp "$OUT/$name.json" "$OUT/$name.rc" "$DEST"/ 2>/dev/null || true
  tail -c 100000 "$OUT/$name.log" > "$DEST/$name.log" 2>/dev/null || true
}

# --- 1. shipping-default baselines (also: defaults compile+run proof)
run di1000_mapped 1800 env GDCA_DI_TILED=mapped python scripts/tpu_ab.py di-n1000
run di400_mapped   900 env GDCA_DI_TILED=mapped python scripts/tpu_ab.py di-n400
run solve20k_base 1200 python scripts/tpu_ab.py solve --syrk dense --res highest

# --- 2. storage-sharded DI bodies, N=1200 A/B (timing + on-chip
#        agreement; round-4 advisor finding)
run di_shard1200_tiled    1500 python scripts/tpu_ab.py di-sharded --impl tiled --N 1200
run di_shard1200_gathered 1500 python scripts/tpu_ab.py di-sharded --impl gathered --N 1200

# --- 3. solve candidates: slab syrk (disjoint-output column slabs)
#        and the residual-precision knob isolated on the dense baseline
run solve20k_slab      1200 python scripts/tpu_ab.py solve --syrk slab --res highest
run solve20k_slab_res  1200 python scripts/tpu_ab.py solve --syrk slab --res high
run solve20k_res_dense 1200 python scripts/tpu_ab.py solve --syrk dense --res high

# --- 4. DI candidates: NS iteration count, exact-fit RB, N=200 gate
run di1000_ns16 1200 env GDCA_DI_NS_ITERS=16 python scripts/tpu_ab.py di-n1000
run di1000_ns14 1200 env GDCA_DI_NS_ITERS=14 python scripts/tpu_ab.py di-n1000
run di400_exact  900 env GDCA_DI_TILED=mapped GDCA_DI_RB=exact python scripts/tpu_ab.py di-n400
run di1000_exact 1200 env GDCA_DI_TILED=mapped GDCA_DI_RB=exact python scripts/tpu_ab.py di-n1000
run di200_gathered 900 env GDCA_DI_TILED=0 python scripts/tpu_ab.py di-n400 --N 200 --M 5000
run di200_mapped   900 env GDCA_DI_TILED=mapped python scripts/tpu_ab.py di-n400 --N 200 --M 5000
run di200_exact    900 env GDCA_DI_TILED=mapped GDCA_DI_RB=exact python scripts/tpu_ab.py di-n400 --N 200 --M 5000

# --- 5. wide-N mapped (the past-the-gate default) + at-scale sharded
#        tiled, each solo (one impl's crash must not contaminate the
#        other; small-width agreement is checked inside the legs)
run di2500_mapped    1800 python scripts/tpu_ab.py di-wide --impl mapped
run di_sharded_tiled 1500 python scripts/tpu_ab.py di-sharded --impl tiled --preflight-n -1

# --- 6. golden parity gates (each compiles several classes: 2400 s)
run golden      2400 python scripts/tpu_check.py
run golden_ns14 2400 env GDCA_DI_NS_ITERS=14 python scripts/tpu_check.py
run golden_res_high 2400 env GDCA_SOLVE_RES_PREC=high GDCA_SOLVE_SYRK=slab python scripts/tpu_check.py

# --- 7. round-4 confirmations
run di1000_gathered 1200 env GDCA_DI_TILED=0 python scripts/tpu_ab.py di-n1000
run di400_gathered   900 env GDCA_DI_TILED=0 python scripts/tpu_ab.py di-n400
run dist_square      900 python scripts/tpu_ab.py dist-square
run dist_square_t512 900 python scripts/tpu_ab.py dist-square --tile 512
run dist_asym_k4     900 python scripts/tpu_ab.py dist-asym --k 4
run warm_batch      2400 python scripts/tpu_ab.py warm-batch

# --- 8. floor gate; auto-re-pin ONLY on a passing gate (pinning after
#        a FAILED gate would absorb the regression it exists to catch)
run bench_check 2400 python bench.py --check
if [ "$(cat "$OUT/bench_check.rc" 2>/dev/null)" = "0" ]; then
  run floor_pin 7200 python bench.py --update-floor
else
  echo "[session] bench_check rc != 0 — NOT auto-pinning floors"
fi

# --- 9. crash-expected documentation legs (dead last)
run di2500_gathered    2400 python scripts/tpu_ab.py di-wide --impl gathered
run di_sharded_gathered 1500 python scripts/tpu_ab.py di-sharded --impl gathered --preflight-n -1

python scripts/tpu_decide.py "$OUT" --r5 > "$OUT/decision.txt" 2>&1 || true
tail -60 "$OUT/decision.txt" | sed 's/^/  /'
cp "$OUT/decision.txt" "$DEST"/ 2>/dev/null || true

echo "[session] done — results in $OUT (persisted to $DEST; $INCOMPLETE leg(s) incomplete)"
exit $((INCOMPLETE > 0 ? 1 : 0))
