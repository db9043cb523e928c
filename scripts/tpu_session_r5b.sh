#!/bin/bash
# Round-5 follow-up battery: the NEW candidates added this round, each
# measured against the main session's baselines (same tree, so the
# di{400,1000}_mapped legs there already carry the min-scaling core):
#   - exact-fit mapped row block (GDCA_DI_RB=exact, guarded to a
#     single uniform strip): N=400 plans 1.51x fewer lanes, N=200
#     2.01x -> 1.27x overhead — does the unaligned dynamic_slice
#     offset (RB*s not 128-divisible) eat the lane saving?
#   - NS iteration count (GDCA_DI_NS_ITERS=16/14 vs the default 20):
#     the NS loop is ~65% of DI-stage HBM traffic; the min-scaling
#     commit bought back margin, these legs price the margin itself.
#     golden_ns14 is the accuracy gate (all 4 golden configs on chip).
#   - N=200 mapped-vs-gathered recalibration of _mapped_worthwhile
#     under the exact-fit plan (round-4 gate points were po2-only).
# Run AFTER tpu_session.sh completes (legs assume a solo chip):
#   bash scripts/tpu_session_r5b.sh [outdir]
set -u
OUT="${1:-/tmp/tpu_session_r5b}"
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
echo "[session] output -> $OUT"

export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$HOME/.cache/gdca_xla}"
mkdir -p "$JAX_COMPILATION_CACHE_DIR"

INCOMPLETE=0
run() {  # run <name> <timeout_s> <cmd...>
  local name="$1" t="$2"; shift 2
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
}

# exact-fit mapped RB (vs the main session's di{400,1000}_mapped po2
# baselines; same iters=20 + min-scaling core)
run di400_exact  900 env GDCA_DI_TILED=mapped GDCA_DI_RB=exact python scripts/tpu_ab.py di-n400
run di1000_exact 1200 env GDCA_DI_TILED=mapped GDCA_DI_RB=exact python scripts/tpu_ab.py di-n1000
# N=200 floor-shape recalibration: gathered (round-4 winner) vs mapped
# po2 (round-4 loser, 2.47x lanes) vs mapped exact (2.01x lanes)
run di200_gathered 900 env GDCA_DI_TILED=0 python scripts/tpu_ab.py di-n400 --N 200 --M 5000
run di200_mapped   900 env GDCA_DI_TILED=mapped python scripts/tpu_ab.py di-n400 --N 200 --M 5000
run di200_exact    900 env GDCA_DI_TILED=mapped GDCA_DI_RB=exact python scripts/tpu_ab.py di-n400 --N 200 --M 5000
# NS iteration count at the width where the NS loop dominates
run di1000_ns16 1200 env GDCA_DI_NS_ITERS=16 python scripts/tpu_ab.py di-n1000
run di1000_ns14 1200 env GDCA_DI_NS_ITERS=14 python scripts/tpu_ab.py di-n1000
# accuracy gate for any NS-iteration flip: all 4 golden configs in f32
# at the CANDIDATE count (14 — if 14 passes, 16 passes a fortiori)
run golden_ns14 2400 env GDCA_DI_NS_ITERS=14 python scripts/tpu_check.py
# solve candidates, round 2 of measure-then-flip: the main session
# rejected blocked syrk (accumulator copies + compile blow-up) and its
# res leg was confounded by it — isolate the residual-precision knob
# on the dense baseline, and price the slab syrk (disjoint-output
# column slabs, 8 shapes, 0.4 n^3 MACs)
run solve20k_res_dense 1200 python scripts/tpu_ab.py solve --syrk dense --res high
run solve20k_slab      1200 python scripts/tpu_ab.py solve --syrk slab --res highest
run solve20k_slab_res  1200 python scripts/tpu_ab.py solve --syrk slab --res high
# storage-sharded DI bodies, rerun after the main session's local-gather
# body crashed the backend at N=2500 (INTERNAL) and wedged the next
# leg: first both bodies at N=1200 (timing + on-chip agreement), then
# each at-scale solo (preflight skipped — one impl's crash must not
# contaminate the other's leg; the gathered@2500 leg EXPECTS to
# reproduce the crash and document it)
# main-session rerun: both di2500 legs timed out — each compiled BOTH
# formulations at full N for the cross-impl sanity, and the gathered
# ~48-chunk graph is an 18+-minute remote compile. The restructured
# leg checks agreement at N=600 and compiles only its own impl; the
# gathered arm still owns the mega-graph, so it gets a 2400 s budget.
run di2500_mapped   1800 python scripts/tpu_ab.py di-wide --impl mapped
run di2500_gathered 2400 python scripts/tpu_ab.py di-wide --impl gathered
run di_shard1200_tiled    1200 python scripts/tpu_ab.py di-sharded --impl tiled --N 1200
run di_shard1200_gathered 1200 python scripts/tpu_ab.py di-sharded --impl gathered --N 1200
run di_sharded_tiled      1200 python scripts/tpu_ab.py di-sharded --impl tiled --preflight-n -1
run di_sharded_gathered   1200 python scripts/tpu_ab.py di-sharded --impl gathered --preflight-n -1

python scripts/tpu_decide.py "$OUT" --r5b > "$OUT/decision.txt" 2>&1 || true
tail -30 "$OUT/decision.txt" | sed 's/^/  /'

DEST="chip_sessions/$(basename "$OUT")"
mkdir -p "$DEST"
cp "$OUT"/*.json "$OUT"/*.rc "$OUT/decision.txt" "$DEST"/ 2>/dev/null || true

echo "[session] done — results in $OUT (copied to $DEST; $INCOMPLETE leg(s) incomplete)"
exit $((INCOMPLETE > 0 ? 1 : 0))
