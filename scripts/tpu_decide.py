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

# the round-5 follow-up battery (scripts/tpu_session_r5b.sh) — read
# with --r5b; its exact-vs-po2 deltas compare against the MAIN
# session's mapped baselines (--base dir)
R5B_LEGS = frozenset({
    "di400_exact", "di1000_exact",
    "di200_gathered", "di200_mapped", "di200_exact",
    "di1000_ns16", "di1000_ns14", "golden_ns14",
    "solve20k_res_dense", "solve20k_slab", "solve20k_slab_res",
    "di2500_mapped", "di2500_gathered",
    "di_shard1200_tiled", "di_shard1200_gathered",
    "di_sharded_tiled", "di_sharded_gathered",
})


def _load(out, name, legs=CURRENT_LEGS):
    if name not in legs:
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


# the consolidated round-5 battery (scripts/tpu_session_r5.sh): one
# dir holds the main leg set AND the follow-up candidates — read with
# --r5 (prints both tables, stale-checks against the union)
R5_LEGS = CURRENT_LEGS | R5B_LEGS


def main_r5b(out, base, stale_against=R5B_LEGS):
    """Decision table for the round-5 follow-up legs (R5B_LEGS).

    ``base``: the MAIN session dir holding the di{400,1000}_mapped po2
    baselines the exact-fit legs compare against (same tree/core)."""
    print(f"[decide/r5b] session dir: {out}  (baselines: {base})\n")

    stale = sorted(
        f[:-5] for f in os.listdir(out)
        if f.endswith(".json") and f[:-5] not in stale_against)
    if stale:
        print("STALE legs on disk (not in the r5b leg set — IGNORED): "
              f"{', '.join(stale)}\n")

    def med(d):
        return d["median_s"] if d and "median_s" in d else None

    # exact-fit mapped RB vs the po2 baseline
    print("exact-fit mapped row block (median_s; lower is better):")
    for n in ("400", "1000"):
        _, dm = _load(base, f"di{n}_mapped")
        _, de = _load(out, f"di{n}_exact", R5B_LEGS)
        if med(dm) and med(de):
            sp = med(dm) / med(de)
            print(f"  N={n}: po2={med(dm):.3f}s exact={med(de):.3f}s "
                  f"({sp:.2f}x)")
    print("  -> flip _plan_row_block_mapped's default to exact-fit "
          "(within the single-strip guard) iff exact wins >= 3% at "
          "N=400 AND does not lose at N=1000; recalibrate "
          "_mapped_worthwhile with the di200 row below either way.")

    row = {}
    for v in ("gathered", "mapped", "exact"):
        _, d = _load(out, f"di200_{v}", R5B_LEGS)
        if med(d):
            row[v] = med(d)
    if row:
        parts = ", ".join(f"{k}={v:.3f}s" for k, v in row.items())
        print(f"\nN=200 floor shape (M=5000): {parts}")
        print("  -> if exact <= gathered, lower _mapped_worthwhile's "
              "threshold below 2.01 is WRONG — raise it so N=200 maps; "
              "if gathered still wins, set the threshold between the "
              "N=200 exact ratio (2.01) and the N=400 exact ratio "
              "(1.36).")

    # NS iteration count (vs the 20-iteration mapped baseline)
    _, d20 = _load(base, "di1000_mapped")
    print("\nNS iteration count at N=1000 (default 20 = "
          f"{med(d20) if med(d20) else '?'}s):")
    for name in ("di1000_ns16", "di1000_ns14"):
        _, d = _load(out, name, R5B_LEGS)
        if med(d):
            sp = med(d20) / med(d) if med(d20) else float("nan")
            print(f"  {name}: {med(d):.3f}s ({sp:.2f}x vs 20)")
    rc, _ = _load(out, "golden_ns14", R5B_LEGS)
    print(f"  golden_ns14 gate: rc={rc}")
    print("  -> flip BM_NS_ITERS only if the winning count gains >= 5% "
          "e2e AND golden_ns14 rc=0 (all 4 configs in envelope); "
          "document the margin analysis (min-scaling coverage "
          "~2.25^(iters-6) in cond(G)) in PERFORMANCE.md either way.")

    # solve knobs, round 2 (the main session rejected blocked syrk and
    # its res leg was confounded by it)
    _, dbase = _load(base, "solve20k_base")
    sv = {"dense+highest (base)": med(dbase)}
    for name, label in (("solve20k_res_dense", "dense+high"),
                        ("solve20k_slab", "slab+highest"),
                        ("solve20k_slab_res", "slab+high")):
        _, d = _load(out, name, R5B_LEGS)
        if d:
            sv[label] = med(d)
            sv[label + " residual"] = d.get("residual")
    if len(sv) > 1:
        print("\ncovariance solve Ns=20000 (median_s):")
        for k, v in sv.items():
            if v is not None and "residual" not in k:
                r = sv.get(k + " residual")
                print(f"  {k:22s} {v:.3f}s"
                      + (f"  max|I-CX|={r:.2e}" if r else ""))
        print("  -> flip GDCA_SOLVE_SYRK to slab iff slab+highest "
              "beats base >= 5%; flip GDCA_SOLVE_RES_PREC to high iff "
              "dense+high beats base >= 5% AND the main session's "
              "golden_res_high rc=0. Both flips -> re-pin all floors.")

    # storage-sharded DI bodies (post-crash rerun)
    for n in ("1200", ""):
        row = {}
        for v in ("tiled", "gathered"):
            name = f"di_shard{n}_{v}" if n else f"di_sharded_{v}"
            _, d = _load(out, name, R5B_LEGS)
            if d:
                row[v] = med(d)
            else:
                rc2, _ = _load(out, name, R5B_LEGS)
                row[v + "_rc"] = rc2
        lbl = f"N={n}" if n else "N=2500 (solo, no preflight)"
        if row:
            print(f"\nstorage-sharded DI body {lbl}: "
                  + ", ".join(f"{k}={v if isinstance(v, str) else v}"
                              if not isinstance(v, float)
                              else f"{k}={v:.3f}s"
                              for k, v in row.items()))
    print("  -> default flip: make tiled the storage-sharded default "
          "if it wins the 1200 A/B OR the gathered body reproduces the "
          "at-scale backend crash (robustness trumps a small timing "
          "delta); record either way.")
    return 0


def main(out, stale_against=CURRENT_LEGS):
    print(f"[decide] session dir: {out}\n")

    stale = sorted(
        f[:-5] for f in os.listdir(out)
        if f.endswith(".json") and f[:-5] not in stale_against)
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
    argv = sys.argv[1:]
    r5b = "--r5b" in argv
    r5 = "--r5" in argv
    base = "/tmp/tpu_session_r5"
    if "--base" in argv:
        i = argv.index("--base")
        base = argv[i + 1]
        del argv[i:i + 2]
    argv = [a for a in argv if a not in ("--r5b", "--r5")]
    out = argv[0] if argv else ("/tmp/tpu_session_r5b" if r5b
                                else "/tmp/tpu_session_r5" if r5
                                else "/tmp/tpu_session_r3")
    if r5:
        # consolidated round-5 session: both tables over one dir (the
        # follow-up candidates compare against baselines in the SAME
        # dir), stale-checked against the union leg set
        main(out, stale_against=R5_LEGS)
        print("\n" + "=" * 70 + "\n")
        raise SystemExit(main_r5b(out, out, stale_against=R5_LEGS))
    raise SystemExit(main_r5b(out, base) if r5b else main(out))
