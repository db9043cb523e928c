#!/bin/bash
# One-shot on-chip measurement battery for the round-3 kernel
# candidates. Run as soon as the TPU tunnel answers (it may flap —
# everything lands in $OUT so a partial session still yields data).
#
#   bash scripts/tpu_session.sh [outdir]
#
# Legs (each its own interpreter: dispatch knobs are read at trace
# time):
#   1. on-chip golden parity (tpu_check.py) — correctness first
#   2. distance A/B: square circulant (tile auto + 384) vs grouped-A
#      asym (k=auto, 2, 4)
#   3. DI e2e A/B at N=1000 and N=400: gathered vs dense-tile
#   4. bench.py --check against the pinned floors
# After: read $OUT/*.json, flip dispatch defaults or log rejections in
# PERFORMANCE.md, and re-pin floors (bench.py --update-floor) if a
# default changed.
set -u
OUT="${1:-/tmp/tpu_session_$(date +%m%d_%H%M)}"
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
echo "[session] output -> $OUT"

# persistent compile cache: legs measure post-compile reps, so this
# only cuts the 40-130 s/shape remote-tunnel compiles on resumed or
# repeated sessions (warm-batch arms override it with their own dir)
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$HOME/.cache/gdca_xla}"
mkdir -p "$JAX_COMPILATION_CACHE_DIR"

INCOMPLETE=0
run() {  # run <name> <timeout_s> <cmd...>
  local name="$1" t="$2"; shift 2
  # complete = previous attempt exited 0 with output; anything else
  # (timeout kill, CPU-pinned refusal, mid-leg tunnel death) re-runs
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

# NEW-DATA legs first (the tunnel may flap mid-session; round-4
# confirmations and the long golden/warm legs come after):
# round-5 solve candidates at the N=1000/q=21 class width: blocked
# triangular syrk (exact math, 3x fewer MACs) and HIGH Newton residual
# (2x faster residual matmul; accuracy-gated on golden_res_high below,
# not just the reported max|I-CX|)
run solve20k_base 1200 python scripts/tpu_ab.py solve --syrk dense --res highest
run solve20k_syrk 1200 python scripts/tpu_ab.py solve --syrk blocked --res highest
run solve20k_res  1200 python scripts/tpu_ab.py solve --syrk blocked --res high
# storage-sharded DI bodies — never executed on chip post-flat-slice
# fix (round-4 advisor finding); tiled-vs-gathered promote/reject A/B
run di_sharded_tiled    1200 python scripts/tpu_ab.py di-sharded --impl tiled
run di_sharded_gathered 1200 python scripts/tpu_ab.py di-sharded --impl gathered
# wide-N single-chip DI handoff (mapped default past the lane gate)
run di2500_mapped   1200 python scripts/tpu_ab.py di-wide --impl mapped
run di2500_gathered 1200 python scripts/tpu_ab.py di-wide --impl gathered
# accuracy gate for the res=high flip (4 golden configs on chip)
run golden_res_high 2400 env GDCA_SOLVE_RES_PREC=high GDCA_SOLVE_SYRK=blocked python scripts/tpu_check.py
# 2400s: the first run hit the old 900s cap after 3/4 configs — the
# large-DI config + the 1x1-mesh sharded check compile several shape
# classes through the remote tunnel (40-130 s each)
run golden      2400 python scripts/tpu_check.py
# square auto now picks tile=384 (round-4 flip); t512 re-checks the
# rejected pick, asym k4 re-checks the best rejected asym variant
run dist_square 900 python scripts/tpu_ab.py dist-square
run dist_square_t512 900 python scripts/tpu_ab.py dist-square --tile 512
run dist_asym_k4   900 python scripts/tpu_ab.py dist-asym --k 4
# DI default is the mapped (lax.map-streamed, flat-sliced) dense-tile
# formulation at every N; gathered is the A/B twin. The unrolled
# per-tile graph is measured-rejected on the real runtime (round 4:
# compile > 900 s at N=400, 19.8 GB HBM OOM at N=1000) — no legs.
run di1000_mapped   1200 env GDCA_DI_TILED=mapped python scripts/tpu_ab.py di-n1000
run di1000_gathered 1200 env GDCA_DI_TILED=0 python scripts/tpu_ab.py di-n1000
run di400_mapped    900 env GDCA_DI_TILED=mapped python scripts/tpu_ab.py di-n400
run di400_gathered  900 env GDCA_DI_TILED=0 python scripts/tpu_ab.py di-n400
run warm_batch      2400 python scripts/tpu_ab.py warm-batch
run bench_check    2400 python bench.py --check
# re-pin ALL seven floors (median-of-3 with spread) under the CURRENT
# defaults — ONLY if bench_check passed: auto-pinning after a FAILED
# gate would absorb the very regression the gate exists to catch
# (round-4 review finding). On rc!=0, the floors need a human: read
# decision.txt, fix/flip, then `python bench.py --update-floor`.
if [ "$(cat "$OUT/bench_check.rc" 2>/dev/null)" = "0" ]; then
  run floor_pin    7200 python bench.py --update-floor
else
  echo "[session] bench_check rc != 0 — NOT auto-pinning floors"
fi

# pure reader: one flip/reject table from the leg JSONs
python scripts/tpu_decide.py "$OUT" > "$OUT/decision.txt" 2>&1 || true
tail -40 "$OUT/decision.txt" | sed 's/^/  /'

# persist the evidence into the repo: if the tunnel window happens
# while nobody is watching, the leg JSONs + decision table still land
# in the tree (the round driver commits uncommitted files at round end)
DEST="chip_sessions/$(basename "$OUT")"
mkdir -p "$DEST"
cp "$OUT"/*.json "$OUT"/*.rc "$OUT/decision.txt" "$DEST"/ 2>/dev/null || true

echo "[session] done — results in $OUT (copied to $DEST; $INCOMPLETE leg(s) incomplete)"
exit $((INCOMPLETE > 0 ? 1 : 0))
