"""Dev harness: compare pipeline output against the reference golden files.

Usage: JAX_PLATFORMS=cpu python scripts/golden_check.py
"""

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from gaussdca_tpu import gdca
from gaussdca_tpu.score.rank import format_rank

DATA = os.environ.get("GAUSSDCA_GOLDEN_DIR", os.path.join(os.path.dirname(__file__), "..", "tests", "data"))


def todict(text):
    d = {}
    for line in text.splitlines():
        toks = line.split()
        assert len(toks) == 3, line
        key = (int(toks[0]), int(toks[1]))
        assert key not in d
        d[key] = float(toks[2])
    return d


def compare(name, result, golden_path):
    got = todict(format_rank(result.ranking))
    want = todict(open(golden_path).read())
    keys_ok = set(got) == set(want)
    if not keys_ok:
        extra = set(got) - set(want)
        missing = set(want) - set(got)
        print(f"[{name}] KEY MISMATCH: extra={len(extra)} missing={len(missing)}")
        print("  sample extra:", sorted(extra)[:5], " missing:", sorted(missing)[:5])
        return False
    rel = np.array([abs(got[k] - want[k]) / max(abs(want[k]), 1e-300)
                    for k in want])
    worst = rel.max()
    k_worst = list(want)[int(rel.argmax())]
    ok = worst < 1e-6
    print(f"[{name}] keys ok ({len(want)} pairs); max rel err = {worst:.3e} "
          f"at {k_worst} (got {got[k_worst]:.9e}, want {want[k_worst]:.9e}) "
          f"theta={result.theta:.6f} Meff={result.meff:.4f} "
          f"M={result.M} N={result.N} -> {'PASS' if ok else 'FAIL'}")
    return ok


def main():
    small = os.path.join(DATA, "small.fasta.gz")
    large = os.path.join(DATA, "large.fasta.gz")
    ok = True

    r = gdca(small)
    ok &= compare("small frob defaults", r, os.path.join(DATA, "small.FNRout.txt"))

    r = gdca(small, pseudocount=0.2, score="DI", remove_dups=True)
    ok &= compare("small DI dedup", r, os.path.join(DATA, "small.DIRout.txt"))

    r = gdca(small, pseudocount=0.2, score="DI", theta=0.0,
             max_gap_fraction=0.8, min_separation=4)
    ok &= compare("small DI theta0", r, os.path.join(DATA, "small.DIRout2.txt"))

    r = gdca(large, pseudocount=0.2, score="DI", remove_dups=True)
    ok &= compare("large DI dedup", r, os.path.join(DATA, "large.DIRout.txt"))

    print("ALL PASS" if ok else "FAILURES PRESENT")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
