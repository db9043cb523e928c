#!/usr/bin/env python
"""Summarize a tpu_session.sh output dir into flip/reject decisions.

    python scripts/tpu_decide.py [/tmp/tpu_session_r3]

Reads each leg's JSON + rc and prints, per pending round-3 decision
(docs/ROADMAP.md items 5-7, PERFORMANCE.md round-3 section):
  - distance kernel: square (auto / tile-384) vs asym (auto / k=2 / 4)
  - DI formulation at N=400 / N=1000: gathered vs dense-tile vs
    exact-fit row block
  - golden parity + floor-gate outcomes
with the measured deltas, so the measure-then-flip step after a tunnel
window is a read of one table instead of 13 files. Purely a reader —
flips themselves stay manual (dispatch defaults are code changes).
"""

import json
import os
import sys

# The one leg set scripts/tpu_session.sh currently produces. A reused
# output dir can hold JSONs from prior rounds' leg names (round-4
# advisor finding: di{n}_tiled / di{n}_tiled_exact / dist_asym_auto /
# dist_asym_k2 were silently mixed into the table); anything on disk
# outside this set is reported as stale and NEVER loaded.
CURRENT_LEGS = frozenset({
    "golden",
    "dist_square", "dist_square_t512", "dist_asym_k4",
    "di1000_mapped", "di1000_gathered",
    "di400_mapped", "di400_gathered",
    "di2500_mapped", "di2500_gathered",
    "di_sharded_tiled", "di_sharded_gathered",
    "solve20k_base", "solve20k_syrk", "solve20k_res", "golden_res_high",
    "warm_batch", "bench_check", "floor_pin",
})


def _load(out, name):
    if name not in CURRENT_LEGS:
        return None, None
    p = os.path.join(out, f"{name}.json")
    rcp = os.path.join(out, f"{name}.rc")
    rc = None
    if os.path.exists(rcp):
        rc = open(rcp).read().strip()
    if not os.path.exists(p) or os.path.getsize(p) == 0:
        return rc, None
    try:
        with open(p) as fh:
            # legs print one JSON object on their last line
            lines = [ln for ln in fh.read().splitlines() if ln.strip()]
        return rc, json.loads(lines[-1])
    except (ValueError, IndexError):
        return rc, None


def main(out):
    print(f"[decide] session dir: {out}\n")

    stale = sorted(
        f[:-5] for f in os.listdir(out)
        if f.endswith(".json") and f[:-5] not in CURRENT_LEGS)
    if stale:
        print("STALE legs on disk (not in the current tpu_session.sh "
              f"leg set — IGNORED): {', '.join(stale)}\n")

    rc, _ = _load(out, "golden")
    print(f"golden parity: rc={rc}  "
          f"{'OK' if rc == '0' else '!! investigate before any flip'}")

    # --- distance kernel sweep ---------------------------------------
    dist = {}
    for name in ("dist_square", "dist_square_t512", "dist_asym_k4"):
        rc, d = _load(out, name)
        if d and "pairs_per_s" in d:
            dist[name] = d
    if dist:
        base = dist.get("dist_square", {}).get("pairs_per_s")
        print("\ndistance kernel (pairs/s, vs square auto):")
        for name, d in sorted(dist.items(),
                              key=lambda kv: -kv[1]["pairs_per_s"]):
            rel = (d["pairs_per_s"] / base - 1) * 100 if base else 0.0
            extra = (f" (tile={d.get('tile')}, k={d.get('k')})"
                     if "asym" in name else f" (tile={d.get('tile')})")
            print(f"  {name:18s} {d['pairs_per_s']:.3e} "
                  f"({d['tf_equiv']:.0f} TF-equiv) {rel:+.1f}%{extra}")
        best = max(dist, key=lambda k: dist[k]["pairs_per_s"])
        if base and dist[best]["pairs_per_s"] > 1.03 * base:
            print(f"  -> {best} beats the auto plan by > 3%: update "
                  "_plan_tiles / ops.dispatch and --update-floor")
        elif base:
            print("  -> keep square auto (round-4 pick: tile=384) as "
                  "default; log any rejection in PERFORMANCE.md")

    # --- DI formulation: mapped (default) vs gathered ------------------
    print("\nDI end-to-end (median_s; lower is better):")
    for n in ("400", "1000"):
        row = {}
        for variant in ("gathered", "mapped"):
            rc, d = _load(out, f"di{n}_{variant}")
            if d and "median_s" in d:
                row[variant] = d["median_s"]
        if row:
            parts = ", ".join(f"{k}={v:.3f}s" for k, v in row.items())
            print(f"  N={n}: {parts}")
            if "gathered" in row:
                best = min(row, key=row.get)
                sp = row["gathered"] / row[best]
                print(f"    best: {best} ({sp:.2f}x vs gathered)")
    print("  -> decision: mapped stays the default iff mapped <= "
          "gathered at BOTH N (round-4 numbers: 0.37 vs 0.40 at 400, "
          "2.15 vs 3.17 at 1000); the unrolled graph is chip-rejected "
          "(compile > 900 s at N=400, HBM OOM at N=1000) — do NOT "
          "re-flip it without a fix for both. PERFORMANCE.md entry "
          "either way.")

    # --- wide-N DI: mapped (past-the-gate default) vs gathered --------
    wide = {}
    for variant in ("mapped", "gathered"):
        rc, d = _load(out, f"di2500_{variant}")
        if d and "median_s" in d:
            wide[variant] = d
    if wide:
        parts = ", ".join(f"{k}={v['median_s']:.3f}s" for k, v in
                          wide.items())
        print(f"\nwide-N DI formulation (N=2500, q=9): {parts}")
        if len(wide) == 2:
            sp = wide["gathered"]["median_s"] / wide["mapped"]["median_s"]
            print(f"  mapped is {sp:.2f}x vs gathered -> "
                  + ("keep mapped as the past-the-gate default"
                     if sp >= 1.0 else
                     "mapped LOST: revert _tiled_lane_gate's else-branch "
                     "to the gathered path and record why in "
                     "PERFORMANCE.md"))

    # --- storage-sharded DI body: tiled vs gathered (1x1-mesh proxy) --
    shd = {}
    for variant in ("tiled", "gathered"):
        rc, d = _load(out, f"di_sharded_{variant}")
        if d and "median_s" in d:
            shd[variant] = d
    if shd:
        parts = ", ".join(f"{k}={v['median_s']:.3f}s" for k, v in
                          shd.items())
        print(f"\nstorage-sharded DI body (N=2500, q=9, 1x1 mesh): "
              f"{parts}")
        if len(shd) == 2:
            sp = shd["gathered"]["median_s"] / shd["tiled"]["median_s"]
            print(f"  tiled is {sp:.2f}x vs local-gather -> "
                  + ("make GDCA_DI_SHARDED=tiled the storage-sharded "
                     "default (parallel/sharded.py gate) + record"
                     if sp >= 1.05 else
                     "keep local-gather default; record the rejection "
                     "in PERFORMANCE.md"))

    # --- solve: syrk formulation x Newton residual precision ----------
    sv = {}
    for name in ("solve20k_base", "solve20k_syrk", "solve20k_res"):
        rc, d = _load(out, name)
        if d and "median_s" in d:
            sv[name] = d
    if sv:
        print("\ncovariance solve Ns=20000 (median_s / max|I-CX|):")
        for name, d in sv.items():
            print(f"  {name:15s} {d['median_s']:.3f}s  "
                  f"residual={d['residual']:.2e}  "
                  f"(syrk={d['syrk']}, res={d['res']})")
        g_rc, _ = _load(out, "golden_res_high")
        if "solve20k_base" in sv and "solve20k_syrk" in sv:
            sp = (sv["solve20k_base"]["median_s"]
                  / sv["solve20k_syrk"]["median_s"])
            print(f"  blocked syrk: {sp:.2f}x vs dense -> "
                  + ("flip GDCA_SOLVE_SYRK default to blocked "
                     "(cholesky._syrk_impl) + re-pin solve floors"
                     if sp >= 1.05 else
                     "keep dense; record the rejection"))
        if "solve20k_syrk" in sv and "solve20k_res" in sv:
            sp = (sv["solve20k_syrk"]["median_s"]
                  / sv["solve20k_res"]["median_s"])
            print(f"  HIGH residual: {sp:.2f}x vs HIGHEST; "
                  f"golden_res_high rc={g_rc} -> "
                  + ("flip GDCA_SOLVE_RES_PREC default to high "
                     "(cholesky._residual_precision) + re-pin"
                     if sp >= 1.05 and g_rc == "0" else
                     "keep HIGHEST (needs BOTH >=5% win AND "
                     "golden_res_high rc=0); record either way"))

    rc, d = _load(out, "warm_batch")
    if d and "speedup" in d:
        print(f"\nwarm-batch (--warm-compile, {d.get('nfam')} fams / "
              f"2 classes): off={d['off_s']}s on={d['on_s']}s "
              f"-> {d['speedup']}x")
        print("  -> " + ("recommend --warm-compile in README batch "
                         "docs + record in PERFORMANCE.md"
                         if d["speedup"] >= 1.05 else
                         "no win at this shape — record the rejection "
                         "in PERFORMANCE.md, keep the flag opt-in"))

    rc, d = _load(out, "bench_check")
    print(f"\nbench --check: rc={rc}"
          + (f"  parsed: {d.get('metric', '')[:60]}..." if d else ""))
    if rc == "0":
        print("  -> floors hold; after any default flip, re-pin with "
              "`python bench.py --update-floor` (solo chip!)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1] if len(sys.argv) > 1
                          else "/tmp/tpu_session_r3"))
