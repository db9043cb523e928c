"""Benchmark: reweighting throughput (the reference's hot loop #1).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "seq-pairs/s", "vs_baseline": N}

The metric is all-pairs similarity throughput of the streaming row-stats
kernel (ops/distance.py) — the TPU replacement for the reference's
threaded bit-packed Hamming loop (SURVEY.md 2.5). The reference publishes
no numbers (BASELINE.md), so ``vs_baseline`` is measured against a CPU
baseline run in-process: NumPy/BLAS one-hot sgemm, the strongest
same-machine stand-in for the single-node reference (multithreaded BLAS
generally beats the Julia popcount loop).

Detail lines go to stderr; stdout carries exactly the one JSON line.
"""

import json
import os
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _setup_compile_cache():
    """Persistent XLA compile cache for every bench invocation.

    Timing convention already excludes compiles (first rep compiles,
    timed reps follow), so the cache only cuts the 40-130 s/shape
    remote-tunnel compile cost of repeated runs (--update-floor passes
    2+, the driver's round-end run after a battery)."""
    path = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                          os.path.expanduser("~/.cache/gdca_xla"))
    try:
        os.makedirs(path, exist_ok=True)
        import jax
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
    except Exception as e:          # cache is an optimization only
        log(f"[bench] compile cache unavailable ({e}) — continuing")


def bench_tpu(M=32768, N=384, q=21, reps=5):
    import jax
    import jax.numpy as jnp
    from gaussdca_tpu.ops import dispatch, distance

    # measure the PRODUCTION dispatch (honors GDCA_DISTANCE_IMPL and any
    # future default flip) so the floor leg tracks what the pipeline runs
    row_stats = dispatch.kernels().get("row_stats_fn") \
        or distance.row_stats_sym_pallas

    rng = np.random.default_rng(0)
    # distinct input per rep (guards against any transparent caching of
    # identical requests in the runtime) + host fetch to bound completion
    Zs = [jnp.asarray(rng.integers(1, q + 1, size=(M, N), dtype=np.int8))
          for _ in range(reps)]
    thresh = jnp.asarray(float(int(0.2 * N)), jnp.float32)

    def run(Zi):
        rs, _ = row_stats(Zi, thresh, q)
        return float(np.asarray(rs[0]))

    run(Zs[0])  # compile
    times = []
    for Zi in Zs:
        t0 = time.perf_counter()
        run(Zi)
        times.append(time.perf_counter() - t0)
    t = float(np.median(times))
    pairs = M * (M - 1) / 2
    log(f"[bench] backend={jax.default_backend()} M={M} N={N} q={q} "
        f"impl={getattr(row_stats, '__name__', repr(row_stats))} "
        f"median={t:.4f}s (all: {[round(x, 4) for x in times]}) -> "
        f"{pairs / t:.3e} pairs/s "
        f"({2 * M * M * N * q / t / 1e12:.1f} TFLOP/s one-hot-equiv)")
    return pairs / t


def bench_solve(Ns=8000, reps=3):
    """Covariance-solve throughput (hot loop #2): SPD inverse at the
    large-golden scale (N=400, s=20 -> 8000^2), f32 HIGHEST."""
    import jax
    import jax.numpy as jnp
    from gaussdca_tpu.solve.cholesky import spd_inverse

    rng = np.random.default_rng(1)

    @jax.jit
    def inv(A):
        with jax.default_matmul_precision("highest"):
            return spd_inverse(A)

    def make(seed):
        # host-side np array; device_put happens one rep at a time below
        rng = np.random.default_rng(seed)
        A = rng.standard_normal((Ns, 256)).astype(np.float32)
        C = (A @ A.T) / 256
        C[np.arange(Ns), np.arange(Ns)] += Ns
        return C

    # One device-resident input at a time: at Ns=20000 a single f32
    # input is 1.6 GB, and holding reps+1 of them alongside the solve's
    # own ~5 n^2 working buffers would approach the 16 GB HBM budget.
    # The axon-cache rule needs distinct VALUES per rep, not
    # simultaneous residency.
    C = jnp.asarray(make(0))
    float(np.asarray(inv(C)[0, 0]))  # compile
    del C
    times = []
    for s in range(1, reps + 1):
        C = jnp.asarray(make(s))
        # Force the H2D transfer to COMPLETE before the timer starts:
        # jnp.asarray is async on the axon runtime and the transfer
        # rides the remote tunnel (256 MB at Ns=8000, 1.6 GB at 20000)
        # — measured 7.5 s "solve" at Ns=8000 when the transfer landed
        # inside the timed region vs 0.16 s round-2 compute.
        float(np.asarray(C[0, 0]))
        t0 = time.perf_counter()
        float(np.asarray(inv(C)[0, 0]))
        times.append(time.perf_counter() - t0)
        del C
    t = float(np.median(times))
    # dpotrf+dpotri-equivalent flops: (1/3 + 2/3) * Ns^3 ~= Ns^3; the
    # Newton refinement step adds 4 Ns^3 matmul flops
    flops = Ns ** 3 + 4 * Ns ** 3
    log(f"[bench] covariance solve Ns={Ns}: {t:.3f}s -> "
        f"{flops / t / 1e12:.1f} TFLOP/s (f32 HIGHEST, incl. 1 Newton "
        f"refinement)")
    return flops / t


def bench_family(M=5000, N=200, q=21, reps=3):
    """s/family end-to-end, BASELINE config #3 (mid-size Pfam)."""
    import jax.numpy as jnp
    from gaussdca_tpu.api import _scores_jit

    rng = np.random.default_rng(2)
    out = {}
    for score in ("frob", "DI"):
        Zs = [jnp.asarray(rng.integers(1, q + 1, size=(M, N), dtype=np.int8))
              for _ in range(reps + 1)]

        def run(Zi):
            S, th, meff = _scores_jit(
                Zi, jnp.asarray(0.2, jnp.float32),
                jnp.asarray(0.2, jnp.float32), q=q, score=score,
                theta_is_auto=False, dtype_name="float32", use_pallas=True)
            return float(np.asarray(S[0, 1]))

        run(Zs[0])
        times = []
        for Zi in Zs[1:]:
            t0 = time.perf_counter()
            run(Zi)
            times.append(time.perf_counter() - t0)
        out[score] = float(np.median(times))
    log(f"[bench] end-to-end s/family (M={M} N={N} theta=0.2): "
        f"frob {out['frob']:.3f}s, DI {out['DI']:.3f}s")
    return out


def bench_deep(M=100_000, N=200, q=21, reps=3):
    """Deep-MSA end-to-end: auto-theta + frob at M=1e5 (the regime the
    single-pass auto-theta redesign targets — the O(M^2 N q) distance
    kernel runs exactly once; round 1's two-pass design measured
    0.77 s here)."""
    import jax.numpy as jnp
    from gaussdca_tpu.api import _scores_jit

    Zs = [jnp.asarray(np.random.default_rng(s).integers(
        1, q + 1, size=(M, N), dtype=np.int8)) for s in range(reps + 1)]

    def run(Zi):
        S, th, meff = _scores_jit(
            Zi, jnp.asarray(0.8, jnp.float32), jnp.asarray(0.0, jnp.float32),
            q=q, score="frob", theta_is_auto=True, dtype_name="float32",
            use_pallas=True)
        return float(np.asarray(S[0, 1]))

    run(Zs[0])
    times = []
    for Zi in Zs[1:]:
        t0 = time.perf_counter()
        run(Zi)
        times.append(time.perf_counter() - t0)
    t = float(np.median(times))
    log(f"[bench] deep-MSA e2e (M={M} N={N} auto-theta frob, single-pass "
        f"reweighting): {t:.3f}s")
    return t


def bench_family_n1000(M=1024, N=1000, q=21, reps=3):
    """Wide-family DI end-to-end (M=1024, N=1000): the largest measured
    distance-to-roofline in the single-chip pipeline (ROADMAP item 0) —
    pinned as its own floor leg so regressions in the DI gather/concat
    path are caught even when the small-family leg stays flat."""
    import jax.numpy as jnp
    from gaussdca_tpu.api import _scores_jit

    rng = np.random.default_rng(5)
    Zs = [jnp.asarray(rng.integers(1, q + 1, size=(M, N), dtype=np.int8))
          for _ in range(reps + 1)]

    def run(Zi):
        S, th, meff = _scores_jit(
            Zi, jnp.asarray(0.2, jnp.float32), jnp.asarray(0.2, jnp.float32),
            q=q, score="DI", theta_is_auto=False, dtype_name="float32",
            use_pallas=True)
        return float(np.asarray(S[0, 1]))

    run(Zs[0])
    times = []
    for Zi in Zs[1:]:
        t0 = time.perf_counter()
        run(Zi)
        times.append(time.perf_counter() - t0)
    t = float(np.median(times))
    log(f"[bench] wide-family e2e (M={M} N={N} DI): {t:.3f}s")
    return t


def bench_ingest(M=100_000, N=400, reps=4):
    """Host ingest throughput (Mtok/s) of the native parser on a deep
    gzipped MSA — ingest is host-side work that gates every family, and
    at deep-MSA scale it rivals the whole device pipeline (0.32 s parse
    vs 0.34 s compute; PERFORMANCE.md round 3). None when the native
    library is unavailable (the leg is then reported-not-enforced)."""
    from gaussdca_tpu.io import native

    if not native.available():
        log("[bench] ingest leg skipped: native parser unavailable")
        return None
    path = f"/tmp/gdca_bench_ingest_{M}x{N}.fasta.gz"
    if not os.path.exists(path):
        import gzip

        log(f"[bench] synthesizing {path} (one-time)")
        rng = np.random.default_rng(0)
        aa = np.frombuffer(b"ACDEFGHIKLMNPQRSTVWY-", dtype=np.uint8)
        toks = aa[rng.integers(0, 21, size=(M, N))]
        tmp = path + ".tmp"
        with gzip.open(tmp, "wb", compresslevel=6) as fh:
            for i in range(M):
                fh.write(b">seq%d/1-%d\n" % (i, N))
                row = toks[i].tobytes()
                for j in range(0, N, 80):
                    fh.write(row[j:j + 80] + b"\n")
        os.replace(tmp, path)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        tokens, _, _, _ = native.parse_fasta(path, 0.9)
        times.append(time.perf_counter() - t0)
    t = float(np.median(times))
    mtok_s = tokens.size / t / 1e6
    log(f"[bench] host ingest ({M}x{N} gzipped FASTA): median {t:.3f}s "
        f"-> {mtok_s:.0f} Mtok/s (all: {[round(x, 3) for x in times]})")
    return mtok_s


def bench_cpu_baseline(M=4096, N=384, q=21, reps=3):
    """NumPy/BLAS one-hot sgemm + threshold counts: the CPU stand-in for
    the reference's threaded Hamming loop, on this same host. Best of
    ``reps`` (shared-host BLAS timing is noisy; the fastest run is the
    fairest baseline, i.e. the most conservative speedup ratio)."""
    rng = np.random.default_rng(0)
    Z = rng.integers(1, q + 1, size=(M, N), dtype=np.int8)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        E = np.zeros((M, N * q), dtype=np.float32)
        np.put_along_axis(E.reshape(M, N, q),
                          (Z - 1)[:, :, None].astype(np.int64), 1.0, axis=2)
        D = E @ E.T
        thresh = float(int(0.2 * N))
        below = ((N - D) < thresh).sum(1)
        _ = 1.0 / (1.0 + np.maximum(below - 1, 0))
        best = min(best, time.perf_counter() - t0)
    pairs = M * (M - 1) / 2
    log(f"[bench] cpu-baseline (numpy/BLAS one-hot sgemm, best of {reps}) "
        f"M={M} N={N}: {best:.3f}s -> {pairs / best:.3e} pairs/s")
    return pairs / best


def _floor_entry(floor):
    """(value, tolerance) from a floor entry.

    New format: {"value": v, "spread": s} pinned as the median of >= 3
    solo runs with s = max relative deviation from that median; the gate
    bites at max(2*spread, 10%). Legacy scalar floors (single-run pins)
    keep the old blanket 15% — their variance was never recorded."""
    if isinstance(floor, dict):
        return float(floor["value"]), max(
            2.0 * float(floor.get("spread", 0.0)), 0.10)
    return float(floor), 0.15


def check_floors(measured: dict, floor_path: str) -> int:
    """Perf regression gate: fail when any measured metric regresses
    beyond its pinned floor's tolerance (see ``_floor_entry``; floors
    come from bench_floor.json, recorded by --update-floor on the TPU).
    Addresses SURVEY.md section 4's "no asserted perf thresholds" gap in
    the reference. Returns a process exit code."""
    import os

    import jax

    if not os.path.exists(floor_path):
        log(f"[bench --check] no floor file at {floor_path}; "
            "run with --update-floor first")
        return 1
    with open(floor_path) as fh:
        floors = json.load(fh)
    # floors from a different backend would make the gate meaningless
    # (CPU floors trivially pass on TPU and vice versa). 'tpu' and
    # 'axon' are the same hardware (the plugin registers under either
    # name depending on the stack) — normalize before comparing.
    def _norm(b):
        return "tpu" if b in ("tpu", "axon") else b

    floor_backend = floors.get("backend")
    if floor_backend and _norm(floor_backend) != _norm(
            jax.default_backend()):
        log(f"[bench --check] floor file was recorded on "
            f"'{floor_backend}' but this run is "
            f"'{jax.default_backend()}' — refusing to compare; "
            "re-pin with --update-floor on the target backend")
        return 1
    rc = 0
    for key in measured:
        if key not in floors.get("higher_is_better", {}) and \
                key not in floors.get("lower_is_better", {}):
            log(f"[bench --check] metric '{key}' has no pinned floor "
                "(stale floor file?) — not enforced")
    for key, floor in floors.get("higher_is_better", {}).items():
        got = measured.get(key)
        if got is None:
            log(f"[bench --check] pinned metric '{key}' was not "
                "measured this run — not enforced")
            continue
        val, tol = _floor_entry(floor)
        lim = val * (1.0 - tol)
        status = "OK" if got >= lim else "REGRESSION"
        if got < lim:
            rc = 1
        log(f"[bench --check] {key}: {got:.4g} vs floor {val:.4g} "
            f"(limit {lim:.4g}, tol {tol:.0%}) -> {status}")
    for key, floor in floors.get("lower_is_better", {}).items():
        got = measured.get(key)
        if got is None:
            log(f"[bench --check] pinned metric '{key}' was not "
                "measured this run — not enforced")
            continue
        val, tol = _floor_entry(floor)
        lim = val * (1.0 + tol)
        status = "OK" if got <= lim else "REGRESSION"
        if got > lim:
            rc = 1
        log(f"[bench --check] {key}: {got:.4g}s vs floor {val:.4g}s "
            f"(limit {lim:.4g}s, tol {tol:.0%}) -> {status}")
    return rc


def pin_floors(samples: list) -> dict:
    """Median + relative spread per metric from >= 1 full bench passes.

    ``samples``: list of measured dicts (one per solo pass). Spread is
    the max relative deviation from the median — recorded in the floor
    file so the gate's tolerance reflects the measured run-to-run
    variance instead of a blanket constant (round-2 verdict: single-run
    pins could silently absorb 10-15% drift)."""
    keys = sorted(set().union(*(s.keys() for s in samples)))
    out = {}
    for k in keys:
        xs = np.asarray([s[k] for s in samples if k in s], float)
        if len(xs) < len(samples):
            log(f"[bench --update-floor] metric '{k}' measured in only "
                f"{len(xs)}/{len(samples)} passes — pinning from those")
        med = float(np.median(xs))
        spread = float(np.max(np.abs(xs - med)) / med) if med else 0.0
        out[k] = {"value": round(med, 4), "spread": round(spread, 4)}
    return out


_HIGHER = ("pairs_per_s", "solve_flops_per_s", "solve20k_flops_per_s",
           "ingest_mtok_s")
_LOWER = ("family_frob_s", "family_di_s", "family_di_n1000_s",
          "deep_msa_s")


def measure_all():
    """One full bench pass -> measured-metric dict (all floor legs)."""
    value = bench_tpu()
    solve = bench_solve()
    solve20k = bench_solve(Ns=20000)
    fam = bench_family()
    wide_di = bench_family_n1000()
    deep = bench_deep()
    ingest = bench_ingest()
    out = {
        "pairs_per_s": value,
        "solve_flops_per_s": solve,
        "solve20k_flops_per_s": solve20k,
        "family_frob_s": fam["frob"],
        "family_di_s": fam["DI"],
        "family_di_n1000_s": wide_di,
        "deep_msa_s": deep,
    }
    if ingest is not None:
        out["ingest_mtok_s"] = ingest
    return out


def main(argv=None):
    import argparse
    import os

    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true",
                    help="fail (exit 1) on regression beyond each floor's "
                         "max(2*spread, 10%%) tolerance vs the pinned "
                         "bench_floor.json (TPU backend only)")
    ap.add_argument("--update-floor", action="store_true",
                    help="rewrite bench_floor.json from --floor-reps full "
                         "solo passes (median + recorded spread)")
    ap.add_argument("--floor-reps", type=int, default=3,
                    help="full bench passes for --update-floor (>= 3 "
                         "recommended; the gate tolerance comes from the "
                         "measured spread)")
    ap.add_argument("--floor-file",
                    default=os.path.join(os.path.dirname(
                        os.path.abspath(__file__)), "bench_floor.json"))
    args = ap.parse_args(argv)

    # The axon plugin's first backend init blocks FOREVER when the TPU
    # tunnel is down (no timeout anywhere in the init path) — a plain
    # `import jax; jax.default_backend()` here would hang the driver's
    # end-of-round bench run with no output at all. Probe the backend
    # in a SUBPROCESS with a hard timeout; if it doesn't answer, pin
    # the CPU platform before any in-process backend init so this run
    # degrades to the visible smoke-leg/FAIL path below instead.
    if os.environ.get("GDCA_BENCH_NO_PROBE") != "1":
        import subprocess
        try:
            subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=180, check=True,
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        except (subprocess.TimeoutExpired,
                subprocess.CalledProcessError, OSError) as e:
            log(f"[bench] backend probe failed ({type(e).__name__}) — "
                "TPU tunnel down? Pinning the CPU platform so this run "
                "reports instead of hanging")
            import jax
            jax.config.update("jax_platforms", "cpu")

    import jax

    _setup_compile_cache()

    if jax.default_backend() not in ("tpu", "axon"):
        # The TPU legs (Pallas kernels) cannot run here at all, so the
        # backend gate comes BEFORE measure_all. A perf-gate lane that
        # silently lands on CPU (e.g. plugin init failure falling back)
        # must FAIL visibly, not crash or pass vacuously (ADVICE r2);
        # GDCA_BENCH_ALLOW_CPU=1 is the explicit opt-out and degrades
        # to the BLAS smoke leg so the bench plumbing still runs.
        if args.check and os.environ.get("GDCA_BENCH_ALLOW_CPU") != "1":
            log("[bench --check] FAIL: floors are TPU numbers but this "
                f"is the {jax.default_backend()} backend — the gate "
                "cannot be enforced here (set GDCA_BENCH_ALLOW_CPU=1 "
                "to skip deliberately)")
            return 3
        baseline = bench_cpu_baseline()
        print(json.dumps({
            "metric": "all-pairs reweighting throughput (CPU BLAS smoke "
                      "leg — TPU backend unavailable)",
            "value": round(baseline, 1),
            "unit": "seq-pairs/s",
            "vs_baseline": 1.0,
        }))
        if args.check:
            log("[bench --check] skipped (GDCA_BENCH_ALLOW_CPU=1): "
                "floors are TPU numbers and this is the "
                f"{jax.default_backend()} backend")
        if args.update_floor:
            log("[bench] NOT writing floors: backend is "
                f"'{jax.default_backend()}' — floors are TPU numbers "
                "(a CPU floor update would neuter the gate)")
        return 0

    measured = measure_all()
    baseline = bench_cpu_baseline()
    print(json.dumps({
        "metric": "all-pairs reweighting throughput (symmetry-halved int8 "
                  "Pallas row-stats kernel, M=32768 N=384 q=21)",
        "value": round(measured["pairs_per_s"], 1),
        "unit": "seq-pairs/s",
        "vs_baseline": round(measured["pairs_per_s"] / baseline, 2),
    }))

    if args.update_floor:
        samples = [measured]
        for k in range(max(args.floor_reps, 1) - 1):
            log(f"[bench] floor-pinning pass {k + 2}/{args.floor_reps}")
            samples.append(measure_all())
        pinned = pin_floors(samples)
        with open(args.floor_file, "w") as fh:
            json.dump({
                "comment": "perf floors: median of "
                           f"{len(samples)} solo TPU passes with recorded "
                           "relative spread; bench.py --check fails "
                           "beyond max(2*spread, 10%)",
                "backend": jax.default_backend(),
                "higher_is_better": {k: pinned[k] for k in _HIGHER
                                     if k in pinned},
                "lower_is_better": {k: pinned[k] for k in _LOWER
                                    if k in pinned},
            }, fh, indent=1)
        log(f"[bench] floors written to {args.floor_file}")
    if args.check:
        return check_floors(measured, args.floor_file)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
