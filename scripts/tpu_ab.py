"""On-chip A/B timing for the round-3 kernel candidates.

Each leg runs in its own interpreter invocation because the dispatch
knobs (``GDCA_DISTANCE_IMPL``, ``GDCA_DI_TILED``) are read at trace
time and a jitted function would otherwise pin the first value seen::

    python scripts/tpu_ab.py dist-square          # square circulant kernel
    python scripts/tpu_ab.py dist-asym [--k 3]    # grouped-A asym kernel
    GDCA_DI_TILED=0 python scripts/tpu_ab.py di-n1000        # gathered DI
    GDCA_DI_TILED=mapped python scripts/tpu_ab.py di-n1000   # dense-tile DI

Timing conventions follow bench.py: distinct inputs per rep (the axon
runtime caches identical compute requests) and a host scalar fetch to
bound completion. Output is one JSON line on stdout per leg.
"""

import argparse
import json
import os
import sys
import time

# `python scripts/tpu_ab.py` puts scripts/ at sys.path[0]; the package
# lives one level up (first real battery run failed every in-process
# leg on this — warm-batch escaped only because it imports the package
# in `python -c` subprocesses whose cwd IS the repo root).
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _times(run, inputs):
    run(inputs[0])  # compile
    times = []
    for x in inputs[1:]:
        t0 = time.perf_counter()
        run(x)
        times.append(time.perf_counter() - t0)
    return float(np.median(times)), times


def leg_distance(impl, M, N, q, reps, k, tile):
    import jax
    import jax.numpy as jnp
    from gaussdca_tpu.ops import distance
    from gaussdca_tpu.stats import reweight

    rng = np.random.default_rng(0)
    Zs = [jnp.asarray(rng.integers(1, q + 1, size=(M, N), dtype=np.int8))
          for _ in range(reps + 1)]
    thresh = jnp.asarray(float(int(0.2 * N)), jnp.float32)

    if impl == "asym":
        # resolve the partial plan up front so the JSON records the
        # (tile_b, k) that actually runs, not the CLI request
        tile, k = distance._plan_asym(N, q, tile_b=tile, k=k)

        def run(Zi):
            rs, _ = distance.row_stats_asym_pallas(Zi, thresh, q, k=k,
                                                   tile_b=tile)
            return float(np.asarray(rs[0]))

        def stats(Zi, th):
            return distance.row_stats_asym_pallas(Zi, th, q, k=k,
                                                  tile_b=tile)
    else:
        if tile == 0:
            # record the tile the auto plan actually runs (the decide
            # table must show whether auto already picked 384)
            tile, _ = distance._plan_tiles(N, q)

        def run(Zi):
            rs, _ = distance.row_stats_sym_pallas(Zi, thresh, q, tile_m=tile)
            return float(np.asarray(rs[0]))

        def stats(Zi, th):
            return distance.row_stats_sym_pallas(Zi, th, q, tile_m=tile)

    # on-chip exactness preflight: interpret-mode tests can't catch a
    # real-Mosaic miscompile, and timing a wrong kernel would silently
    # poison the flip decision. Counts are exact integers in f32, so
    # the comparison is equality. Small M: one extra compile, ~s.
    Mv = min(M, 2048)
    Zv = jnp.asarray(rng.integers(1, q + 1, size=(Mv, N), dtype=np.int8))
    tv = jnp.asarray(7.0, jnp.float32)
    rs_k, bel_k = (np.asarray(x) for x in stats(Zv, tv))
    D = np.asarray(reweight.match_counts(Zv))
    if not (np.array_equal(rs_k, D.sum(1).astype(rs_k.dtype))
            and np.array_equal(bel_k,
                               ((N - D) < 7.0).sum(1).astype(bel_k.dtype))):
        log(f"[ab] {impl} EXACTNESS FAILED at M={Mv} — aborting leg")
        raise SystemExit(9)
    log(f"[ab] {impl} exactness preflight OK (M={Mv})")

    t, times = _times(run, Zs)
    pairs = M * (M - 1) / 2
    log(f"[ab] {impl} M={M} N={N} q={q} k={k} tile={tile}: median={t:.4f}s "
        f"(all: {[round(x, 4) for x in times]}) -> {pairs / t:.3e} pairs/s "
        f"({2 * M * M * N * q / t / 1e12:.1f} TF-equiv)")
    return {"leg": f"dist-{impl}", "M": M, "N": N, "q": q, "k": k,
            "tile": tile, "median_s": t, "pairs_per_s": pairs / t,
            "tf_equiv": 2 * M * M * N * q / t / 1e12,
            "times": [round(x, 5) for x in times],
            "backend": jax.default_backend()}


def leg_di_n1000(M, N, q, reps):
    import os

    import jax
    import jax.numpy as jnp
    from gaussdca_tpu.api import _scores_jit

    tiled = os.environ.get("GDCA_DI_TILED", "1")
    rb = os.environ.get("GDCA_DI_RB", "")
    ns = os.environ.get("GDCA_DI_NS_ITERS", "")
    rng = np.random.default_rng(5)
    Zs = [jnp.asarray(rng.integers(1, q + 1, size=(M, N), dtype=np.int8))
          for _ in range(reps + 1)]

    def run(Zi):
        S, th, meff = _scores_jit(
            Zi, jnp.asarray(0.2, jnp.float32), jnp.asarray(0.2, jnp.float32),
            q=q, score="DI", theta_is_auto=False, dtype_name="float32",
            use_pallas=True)
        return float(np.asarray(S[0, 1]))

    t, times = _times(run, Zs)
    log(f"[ab] di e2e M={M} N={N} GDCA_DI_TILED={tiled} GDCA_DI_RB={rb} "
        f"GDCA_DI_NS_ITERS={ns}: median={t:.3f}s "
        f"(all: {[round(x, 3) for x in times]})")
    return {"leg": "di-e2e", "M": M, "N": N, "tiled": tiled,
            "rb": rb, "ns_iters": ns,
            "median_s": t, "times": [round(x, 4) for x in times],
            "backend": jax.default_backend()}


def _hi(f):
    """Trace the wrapped callable under HIGHEST matmul precision — the
    production context (api.scores_pipeline). The direct-formulation
    legs (di-wide, di-sharded) MUST run under it too: bare on TPU the
    matmuls lower to single-pass bf16, the two formulations' different
    contraction orders diverge far past the agreement tolerance (the
    round-5 di_shard1200 preflight DISAGREE was exactly this), and the
    timing measures a precision production never runs."""
    import jax

    def g(*a):
        with jax.default_matmul_precision("highest"):
            return f(*a)
    return g


def _diff_stats(a, b):
    """One-line magnitude report for a failed cross-impl agreement
    check: is it a rounding-envelope miss (max rel ~1e-4..1e-3) or a
    real miscompile (O(1) values disagreeing)?"""
    import numpy as np
    d = np.abs(a - b)
    am = np.abs(b)
    rel = d[am > 1e-5] / am[am > 1e-5]
    return (f"max|d|={d.max():.3e} at |ref|~{am.flat[d.argmax()]:.3e}, "
            f"max rel={rel.max() if rel.size else float('nan'):.3e}, "
            f"ref scale max={am.max():.3e}, "
            f"n_viol={int((~np.isclose(a, b, rtol=1e-4, atol=1e-5)).sum())}"
            f"/{a.size}")


def leg_di_wide(N, q, reps, impl, preflight_n=600):
    """Wide-N DI formulation A/B: mapped (lax.map-streamed dense tiles,
    the default past the lane gate at N >= ~2049) vs gathered (chunked
    per-lane gathers — the round-3 fallback the mapped path replaced).

    Times the score-stage FORMULATION directly on synthetic coupling
    blocks (no e2e solve: at production q=21 the [Ns, Ns] coupling
    matrix alone is ~10 GB at N=2500 — wide-N e2e is the storage-
    sharded path's job; q=9 keeps the single-chip A/B honest at 1.6 GB
    while the gate, tile grid, and strip plan are q-independent).
    Distinct inputs per rep via an on-device scale (the axon runtime
    caches identical compute requests; host re-transfer of GB-scale
    inputs would swamp the timing).
    """
    import jax
    import jax.numpy as jnp
    from gaussdca_tpu.score import di

    s = q - 1
    # Build the synthetic inputs ON DEVICE (jax.random under jit): the
    # host-numpy construction pushed a 1.6 GB coupling matrix through
    # the tunnel's H2D path, which stalled past the leg budget in the
    # round-5 window (di2500_*.rc = 124 with no output). The coupling
    # stays FLAT on device ([Ns, Ns] is layout-aligned) and reshapes to
    # [N, s, N, s] only INSIDE jit, where it fuses away — production
    # always calls these formulations under _scores_jit. Eager ops on a
    # materialized [N, s, N, s] array relayout it to the (8, 128)-tiled
    # form, a 128/s = 16x-padded 25.6 GB copy at q=9.
    def make(n, key=7):
        @jax.jit
        def _make(k):
            kj, kl = jax.random.split(k)
            Jm = 0.05 * jax.random.normal(kj, (n * s, n * s), jnp.float32)
            Jm = 0.5 * (Jm + Jm.T)
            B = 0.1 * jax.random.normal(kl, (n, s, s), jnp.float32)
            L = jnp.tril(B, k=-1) + \
                (jnp.abs(B) + 1.0) * jnp.eye(s, dtype=jnp.float32)[None]
            return Jm, L

        Jm, L = _make(jax.random.PRNGKey(key))
        float(np.asarray(Jm[0, 0]))  # construction complete
        return Jm, L

    # cross-impl sanity on chip at a SMALL width FIRST: a broken mapped
    # assembly under real Mosaic/XLA-TPU lowering must not get silently
    # timed — but compiling BOTH formulations at the full N stalled the
    # round-5 window's remote compiles past the 1200 s leg budget twice
    # (the gathered graph unrolls ~P/65536 chunk bodies: ~48 copies at
    # N=2500 — an 18+-minute remote compile, paid by BOTH legs). The
    # small width exercises the same code paths (multi-tile grid,
    # multi-chunk gathers at pair_chunk=65536: P(600) = 179,700 -> 3
    # chunks) at a compile size that fits; the full-N graph is compiled
    # only for the impl actually under test.
    npf = preflight_n
    mJp, Lp = make(npf, key=11)
    iup, jup = np.triu_indices(npf, k=1)
    S_m = np.asarray(jax.jit(_hi(
        lambda: di.di_score_bm_mapped(
            mJp.reshape(npf, s, npf, s), Lp, npf)))())
    d_g = np.asarray(jax.jit(_hi(
        lambda: di.di_pairs_bm_gathered(
            mJp.reshape(npf, s, npf, s), Lp, iup, jup)))())
    if not np.allclose(S_m[iup, jup], d_g, rtol=1e-4, atol=1e-5):
        log("[ab] di-wide mapped/gathered DISAGREE on chip — aborting leg")
        log(f"[ab]   {_diff_stats(S_m[iup, jup], d_g)}")
        raise SystemExit(9)
    log(f"[ab] di-wide cross-impl agreement OK (N={npf}, q={q})")

    mJd, Ld = make(N)
    iu, ju = np.triu_indices(N, k=1)

    if impl == "mapped":
        def _f(c):
            return di.di_score_bm_mapped(
                (mJd * c).reshape(N, s, N, s), Ld, N)
    else:
        # the PRODUCTION gathered path including its [N, N] scatter
        # assembly (di_score does exactly this) — the mapped arm's
        # timing includes its own assembly, and the per-lane scatter
        # is part of the op class under test
        def _f(c):
            dv = di.di_pairs_bm_gathered(
                (mJd * c).reshape(N, s, N, s), Ld, iu, ju)
            S = jnp.zeros((N, N), dv.dtype)
            S = S.at[iu, ju].set(dv)
            return S.at[ju, iu].set(dv)
    fn = jax.jit(_hi(_f))

    def score(c):
        # distinct compute request per rep via the on-device scale
        return float(np.asarray(fn(c)[0, 1]))

    t, times = _times(score, [1.0 + 0.001 * i for i in range(reps + 1)])
    log(f"[ab] di-wide impl={impl} N={N} q={q}: median={t:.3f}s "
        f"(all: {[round(x, 3) for x in times]})")
    lanes = di.planned_lane_count(N) if impl == "mapped" else len(iu)
    return {"leg": "di-wide", "impl": impl, "N": N, "q": q,
            "median_s": t, "times": [round(x, 4) for x in times],
            "lanes": lanes, "backend": jax.default_backend()}


def leg_di_sharded(N, q, reps, impl, preflight_n=0):
    """Storage-sharded DI body A/B on a 1x1 mesh: locally-TILED
    (zero gathers, parallel/sharded._di_sharded_tiled, opt-in
    GDCA_DI_SHARDED=tiled) vs the local-GATHER default. One real chip
    is a valid proxy for the per-device body cost — the variants differ
    only inside the shard_map body (dense dynamic_slice tiles vs
    per-lane fancy gathers); the cross-device pattern is identical.
    Synthetic q=9 for the same memory reason as di-wide.

    ``preflight_n``: width of the cross-impl agreement check. The
    round-5 main session ran BOTH impls at the full N inside each leg
    and the local-gather body crashed the TPU backend (INTERNAL) at
    N=2500, wedging the chip for the next leg (FAILED_PRECONDITION at
    its first host fetch). A smaller preflight width still catches a
    real-Mosaic miscompile of either body while keeping one impl's
    at-scale crash from contaminating the other's leg; 0 = full N (the
    old behavior)."""
    import jax
    import jax.numpy as jnp
    from gaussdca_tpu.parallel import mesh as meshlib
    from gaussdca_tpu.parallel.sharded import (_di_sharded_local,
                                               _di_sharded_tiled)

    m = meshlib.make_mesh(1, shape=(1, 1))
    s = q - 1

    # device-side construction: the host version was a 20000^2 CPU
    # BLAS A@A^T (~5 min) plus two 1.6 GB H2D transfers — the same
    # tunnel stall class as di-wide (see _make there)
    def make(n, key=7):
        ns = n * s

        @jax.jit
        def _make(key):
            ka, km = jax.random.split(key)
            A = (0.3 / ns**0.5) * jax.random.normal(ka, (ns, ns),
                                                    jnp.float32)
            C = A @ A.T + jnp.eye(ns, dtype=jnp.float32)
            mm = 0.05 * jax.random.normal(km, (ns, ns), jnp.float32)
            return C, mm + mm.T

        C, mJ = _make(jax.random.PRNGKey(key))
        float(np.asarray(C[0, 0]))
        return C, mJ

    fn_t = jax.jit(_hi(lambda a, b: _di_sharded_tiled(m, a, b, q)))
    fn_l = jax.jit(_hi(lambda a, b: _di_sharded_local(m, a, b, q,
                                                      use_pallas=True)))

    # cross-impl agreement preflight before timing anything
    # (preflight_n < 0 skips it outright — for at-scale solo legs whose
    # agreement is evidenced by a smaller same-session A/B leg)
    npf = preflight_n or N
    if npf > 0:
        Cp, mJp = (make(npf, key=11) if npf != N else make(N))
        S_t = np.asarray(fn_t(mJp, Cp))
        S_l = np.asarray(fn_l(mJp, Cp))
        if not np.allclose(S_t, S_l, rtol=1e-4, atol=1e-5):
            log("[ab] di-sharded tiled/gathered DISAGREE on chip — "
                "aborting")
            log(f"[ab]   {_diff_stats(S_t, S_l)}")
            raise SystemExit(9)
        log(f"[ab] di-sharded cross-impl agreement OK (N={npf}, q={q})")

    C, mJ = make(N) if npf != N else (Cp, mJp)
    fn = fn_t if impl == "tiled" else fn_l

    def run(c):
        S = fn(mJ * c, C)
        return float(np.asarray(S[0, 1]))

    t, times = _times(run, [1.0 + 0.001 * i for i in range(reps + 1)])
    log(f"[ab] di-sharded impl={impl} N={N} q={q}: median={t:.3f}s "
        f"(all: {[round(x, 3) for x in times]})")
    return {"leg": "di-sharded", "impl": impl, "N": N, "q": q,
            "preflight_n": npf,
            "median_s": t, "times": [round(x, 4) for x in times],
            "backend": jax.default_backend()}


def leg_solve(Ns, reps, syrk, res):
    """Covariance-solve A/B at the wide-production width (Ns=20000 =
    the N=1000/q=21 class): dense vs blocked triangular syrk
    (``GDCA_SOLVE_SYRK``) x HIGHEST vs HIGH Newton residual
    (``GDCA_SOLVE_RES_PREC``). The solve is ~58% of the round-4 N=1000
    DI e2e wall, with the HIGHEST residual matmul (2n^3 at the 6-pass
    ceiling) its largest single term. Each leg reports the timing AND
    the achieved max|I - CX| residual (computed once at HIGHEST after
    timing) — the res=high flip is additionally gated on the
    golden_res_high accuracy leg, not just this residual.

    The knobs are read at trace time, so each (syrk, res) combination
    runs as its own interpreter invocation (tpu_session.sh legs).
    """
    import os

    os.environ["GDCA_SOLVE_SYRK"] = syrk
    os.environ["GDCA_SOLVE_RES_PREC"] = res

    import jax
    import jax.numpy as jnp
    from gaussdca_tpu.solve.cholesky import spd_inverse

    # same construction family as bench.py's solve legs (SPD via a
    # random low-rank part + ridge), built ON DEVICE: a host [Ns, Ns]
    # f32 is a 1.6 GB H2D through the tunnel — the round-5 stall class
    @jax.jit
    def _make(key):
        A = jax.random.normal(key, (Ns, 256), jnp.float32)
        return A @ A.T / 256 + \
            0.05 * Ns * jnp.eye(Ns, dtype=jnp.float32)

    C = _make(jax.random.PRNGKey(3))
    float(np.asarray(C[0, 0]))  # construction complete before timing

    # inv(sc*C) = inv(C)/sc, so multiplying back by sc recovers inv(C)
    # while keeping each rep a distinct compute request (axon caches
    # identical ones)
    fn = jax.jit(lambda c, sc: spd_inverse(c * sc) * sc)

    def run(scale):
        X = fn(C, jnp.asarray(scale, jnp.float32))
        return float(np.asarray(X[0, 0]))

    t, times = _times(run, [1.0 + 0.001 * i for i in range(reps + 1)])

    @jax.jit
    def residual(c, x):
        R = -jnp.matmul(c, x, precision=jax.lax.Precision.HIGHEST)
        R = R.at[jnp.arange(c.shape[0]), jnp.arange(c.shape[0])].add(1.0)
        return jnp.abs(R).max()

    X = fn(C, jnp.asarray(1.0, jnp.float32))
    res_max = float(np.asarray(residual(C, X)))
    log(f"[ab] solve Ns={Ns} syrk={syrk} res={res}: median={t:.3f}s "
        f"(all: {[round(x, 3) for x in times]}) max|I-CX|={res_max:.3e}")
    return {"leg": "solve", "Ns": Ns, "syrk": syrk, "res": res,
            "median_s": t, "times": [round(x, 4) for x in times],
            "residual": res_max, "backend": jax.default_backend()}


def leg_warm_batch(M, N, q, per_class):
    """Warm-batch A/B: does --warm-compile hide the per-class
    executable load in a multi-class batch?

    Three DISJOINT family sets of identical shapes (same two shape
    classes — M and M+256 rows — so they share the persistent compile
    cache, but distinct contents so the axon runtime's compute-request
    cache cannot favor a later arm): a prime pass populates the
    persistent cache (cold-compile cost, reported but not compared),
    then the off/on arms each run in a FRESH subprocess (per-process
    jit caches) against the warm persistent cache. The difference is
    the per-class dispatch-time executable load the AOT cache is meant
    to hide. CPU-side output parity is pinned by tests/test_exe_cache.py.
    """
    import subprocess
    import tempfile

    letters = "ACDEFGHIKLMNPQRSTVWY-"[:q]
    rng = np.random.default_rng(23)
    tmp = tempfile.mkdtemp(prefix="gdca_warmab_")
    cachedir = f"{tmp}/xla"

    def gen(set_name):
        fams = []
        for i in range(2 * per_class):
            m = M + 256 * (i % 2)           # two shape classes
            rows = rng.integers(0, len(letters), size=(m, N))
            p = f"{tmp}/{set_name}_{i}.fasta"
            with open(p, "w") as fh:
                for r in range(m):
                    fh.write(f">s{r}\n" +
                             "".join(letters[c] for c in rows[r]) + "\n")
            fams.append(p)
        return fams

    # equivalent to `python -m gaussdca_tpu`, with an opt-in CPU pin so
    # the leg logic is smokable off-chip (a bare subprocess would hang
    # in axon backend init when the tunnel is down — env vars are too
    # late, only a pre-init config update works; see CLAUDE.md)
    launch = (
        "import sys, os\n"
        "if os.environ.get('GDCA_AB_FORCE_CPU'):\n"
        "    import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "from gaussdca_tpu.cli import main\n"
        "sys.exit(main(sys.argv[1:]))\n")

    def run(fams, warm, outname):
        cmd = [sys.executable, "-c", launch, *fams,
               "-o", f"{tmp}/{outname}", "--compile-cache", cachedir,
               "--quiet"]
        if warm:
            cmd.append("--warm-compile")
        t0 = time.perf_counter()
        # cwd-pin the child to the repo root: the module-top sys.path
        # fix covers the in-process legs only, and a child launched
        # from elsewhere would fail the package import (review finding)
        r = subprocess.run(cmd, capture_output=True, text=True,
                           cwd=os.path.join(os.path.dirname(
                               os.path.abspath(__file__)), ".."))
        dt = time.perf_counter() - t0
        if r.returncode != 0:
            log(f"[ab] warm-batch arm failed:\n{r.stderr[-2000:]}")
            raise SystemExit(9)
        return dt

    prime_s = run(gen("prime"), False, "prime")
    off_s = run(gen("off"), False, "off")
    on_s = run(gen("on"), True, "on")
    nfam = 2 * per_class
    log(f"[ab] warm-batch {nfam} fams/2 classes M={M}/{M+256} N={N}: "
        f"prime={prime_s:.1f}s off={off_s:.1f}s on={on_s:.1f}s "
        f"({off_s / on_s:.2f}x)")
    import jax
    return {"leg": "warm-batch", "M": M, "N": N, "q": q, "nfam": nfam,
            "prime_s": round(prime_s, 2), "off_s": round(off_s, 2),
            "on_s": round(on_s, 2),
            "speedup": round(off_s / on_s, 3),
            "backend": jax.default_backend()}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("leg", choices=["dist-square", "dist-asym", "di-n1000",
                                    "di-n400", "di-wide", "di-sharded",
                                    "warm-batch", "solve"])
    ap.add_argument("--syrk", choices=["dense", "blocked", "slab"],
                    default="dense",
                    help="solve leg: GDCA_SOLVE_SYRK variant")
    ap.add_argument("--res", choices=["highest", "high"], default="highest",
                    help="solve leg: GDCA_SOLVE_RES_PREC variant")
    ap.add_argument("--Ns", type=int, default=20000,
                    help="solve leg: matrix side")
    ap.add_argument("--impl", choices=["mapped", "gathered", "tiled"],
                    default="mapped", help="di-wide / di-sharded "
                    "formulation (di-sharded: tiled | gathered)")
    ap.add_argument("--preflight-n", type=int, default=0,
                    help="di-sharded / di-wide: cross-impl agreement "
                    "width (di-sharded: 0 = full N, -1 = skip; "
                    "di-wide: 0 = the 600 default). Smaller keeps one "
                    "impl's at-scale crash or mega-graph compile out "
                    "of the other impl's leg")
    ap.add_argument("--M", type=int, default=None)
    ap.add_argument("--N", type=int, default=None)
    ap.add_argument("--q", type=int, default=0, help="0 = per-leg "
                    "default (21; di-wide uses 9 — see its docstring)")
    ap.add_argument("--k", type=int, default=0, help="asym A-group size "
                    "(0 = auto-plan)")
    ap.add_argument("--tile", type=int, default=0, help="override the "
                    "planner's tile (sym tile_m / asym tile_b; 0 = auto) — "
                    "for the tile-384 candidate, docs/ROADMAP.md item 6")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args(argv)

    import jax
    if jax.default_backend() == "cpu":
        log("[ab] refusing to run on CPU — this is an on-chip A/B script")
        return 2

    if args.leg in ("dist-square", "dist-asym"):
        impl = args.leg.split("-")[1]
        out = leg_distance(impl, args.M or 32768, args.N or 384,
                           args.q or 21, args.reps, args.k, args.tile)
    elif args.leg == "di-n1000":
        out = leg_di_n1000(args.M or 1024, args.N or 1000, args.q or 21,
                           min(args.reps, 3))
    elif args.leg == "di-wide":
        out = leg_di_wide(args.N or 2500, args.q or 9,
                          min(args.reps, 3), args.impl,
                          preflight_n=args.preflight_n or 600)
    elif args.leg == "di-sharded":
        out = leg_di_sharded(args.N or 2500, args.q or 9,
                             min(args.reps, 3),
                             "tiled" if args.impl == "tiled"
                             else "gathered",
                             preflight_n=args.preflight_n)
    elif args.leg == "solve":
        out = leg_solve(args.Ns, min(args.reps, 3), args.syrk, args.res)
    elif args.leg == "warm-batch":
        out = leg_warm_batch(args.M or 1024, args.N or 128,
                             args.q or 21, per_class=3)
    else:  # di-n400
        out = leg_di_n1000(args.M or 1024, args.N or 400, args.q or 21,
                           min(args.reps, 3))
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
