"""On-chip verification: f32 TPU results vs the reference golden files.

The CPU test suite pins exact f64 parity; this script is the TPU-side
check (run it on a machine with a TPU attached):

    python scripts/tpu_check.py

For each golden config it asserts (a) identical pair sets, (b) 100%
top-K rank overlap at K in {10, 100, all}, (c) max abs score error
within the documented f32 envelope (PERFORMANCE.md). Also runs the
sharded (shard_map) pipeline on a trivial 1x1 mesh of the real chip —
the closest real-hardware exercise of the multi-chip code path — and
checks it against the single-chip scores.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np

GOLDEN = os.environ.get("GAUSSDCA_GOLDEN_DIR", os.path.join(os.path.dirname(__file__), "..", "tests", "data"))

CASES = [
    ("small frob defaults", "small.fasta.gz", "small.FNRout.txt",
     dict(), 5e-4),
    ("small DI dedup", "small.fasta.gz", "small.DIRout.txt",
     dict(score="DI", pseudocount=0.2, remove_dups=True), 5e-4),
    ("small DI theta0", "small.fasta.gz", "small.DIRout2.txt",
     dict(score="DI", pseudocount=0.2, theta=0.0, max_gap_fraction=0.8,
          min_separation=4), 5e-4),
    ("large DI dedup", "large.fasta.gz", "large.DIRout.txt",
     dict(score="DI", pseudocount=0.2, remove_dups=True), 1e-3),
]


def load_golden(path):
    out = {}
    for line in open(path):
        t = line.split()
        out[(int(t[0]), int(t[1]))] = float(t[2])
    return out


def main():
    # Probe the backend in a SUBPROCESS first (like bench.py): the axon
    # plugin's first in-process backend init blocks FOREVER when the
    # TPU tunnel is down, which would hang this script before the
    # no-TPU gate below could fire.
    import subprocess
    try:
        subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=180, check=True,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    except (subprocess.TimeoutExpired, subprocess.CalledProcessError,
            OSError) as e:
        print(f"backend probe failed ({type(e).__name__}) — TPU tunnel "
              "down?")
        if os.environ.get("GDCA_TPUCHECK_ALLOW_CPU") != "1":
            print("FAIL: no TPU reachable — this is the on-chip parity "
                  "check (set GDCA_TPUCHECK_ALLOW_CPU=1 to run the f32 "
                  "envelope on CPU deliberately)")
            return 2
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    import gaussdca_tpu as g

    backend = jax.default_backend()
    print(f"backend: {backend}")
    if backend not in ("tpu", "axon"):
        # This script IS the on-chip check: succeeding on CPU would let
        # the battery (scripts/tpu_session.sh) permanently mark the
        # golden leg complete (rc=0) without ever touching the chip.
        # GDCA_TPUCHECK_ALLOW_CPU=1 is the explicit local-debug opt-in.
        if os.environ.get("GDCA_TPUCHECK_ALLOW_CPU") != "1":
            print("FAIL: no TPU attached — this is the on-chip parity "
                  "check (set GDCA_TPUCHECK_ALLOW_CPU=1 to run the f32 "
                  "envelope on CPU deliberately)")
            return 2
        print("WARNING: no TPU attached — checking the same f32 envelope "
              "on CPU (GDCA_TPUCHECK_ALLOW_CPU=1)")

    failures = 0
    for name, fa, gold, kw, tol in CASES:
        r = g.gdca(os.path.join(GOLDEN, fa), **kw)
        want = load_golden(os.path.join(GOLDEN, gold))
        got = {(i, j): s for i, j, s in r.ranking}
        assert set(got) == set(want), f"{name}: pair sets differ"
        ks = sorted(want)
        w = np.array([want[k] for k in ks])
        v = np.array([got[k] for k in ks])
        maxerr = float(np.abs(v - w).max())
        order_w = sorted(want, key=lambda k: -want[k])
        order_g = sorted(got, key=lambda k: -got[k])
        overlaps = {K: len(set(order_w[:K]) & set(order_g[:K]))
                    for K in (10, 100, len(ks))}
        rank_ok = all(v == K for K, v in overlaps.items())
        if backend not in ("tpu", "axon") and not rank_ok:
            # CPU debug opt-in runs f32 through the MONITORED jnp DI
            # path (the chip's batch-minor core is gated on a TPU
            # backend), whose f32 envelope is slightly wider — a
            # boundary-tie flip inside the abs tolerance is expected
            # noise there, not a regression; the 100%-overlap contract
            # is the CHIP gate (100/100 measured, PERFORMANCE.md)
            rank_ok = all(v >= K - 1 for K, v in overlaps.items())
        ok = maxerr <= tol and rank_ok
        failures += 0 if ok else 1
        print(f"[{name}] max abs err {maxerr:.2e} (tol {tol:.0e}); "
              f"top-K overlap {overlaps} -> {'PASS' if ok else 'FAIL'}")

    # sharded path on a trivial real-chip mesh vs single-chip scores
    import jax.numpy as jnp
    from gaussdca_tpu.api import scores_pipeline
    from gaussdca_tpu.parallel import mesh as meshlib
    from gaussdca_tpu.parallel.sharded import run_sharded

    rng = np.random.default_rng(0)
    q = 21
    Z = jnp.asarray(rng.integers(1, q + 1, size=(256, 64), dtype=np.int8))
    S0, th0, me0 = scores_pipeline(
        Z, jnp.asarray(0.5, jnp.float32), jnp.asarray(0.2, jnp.float32),
        q=q, score="frob", theta_is_auto=False, dtype=jnp.float32,
        use_pallas=True)
    m = meshlib.make_mesh(1, shape=(1, 1))
    S1, th1, me1 = run_sharded(m, Z, 0.5, 0.2, q=q, score="frob",
                               dtype=jnp.float32)
    derr = float(np.abs(np.asarray(S1) - np.asarray(S0)).max())
    ok = derr < 1e-5 and abs(float(me1) - float(me0)) < 1e-3
    failures += 0 if ok else 1
    print(f"[sharded 1x1 mesh vs single-chip] max abs dS {derr:.2e}, "
          f"Meff {float(me0):.2f}/{float(me1):.2f} -> "
          f"{'PASS' if ok else 'FAIL'}")

    print("ALL PASS" if failures == 0 else f"{failures} FAILURES")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
