"""End-to-end demo: recover planted covarying position pairs.

Generates a synthetic MSA where K position pairs covary (position j
copies a permuted image of position i with high probability) against an
iid background, runs the full Gaussian DCA pipeline both ways, and
reports how many planted pairs land in the top-K ranking — the
contact-prediction task the package exists for, verifiable without any
external data.

    python examples/recover_contacts.py [--score DI] [--seqs 2000]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def synth_msa(M=2000, N=60, q=21, n_pairs=8, copy_p=0.8, min_sep=5,
              seed=0):
    """(tokens [M, N] in 1..q, planted pair list, 1-based)."""
    rng = np.random.default_rng(seed)
    Z = rng.integers(1, q + 1, size=(M, N), dtype=np.int8)
    pairs = []
    free = list(range(N))
    while len(pairs) < n_pairs and len(free) > min_sep + 1:
        i = free[rng.integers(0, len(free) // 2)]
        js = [j for j in free if j >= i + min_sep]
        if not js:
            free.remove(i)
            continue
        j = js[rng.integers(0, len(js))]
        free.remove(i)
        free.remove(j)
        perm = rng.permutation(q) + 1
        copy = rng.random(M) < copy_p
        Z[copy, j] = perm[Z[copy, i] - 1]
        pairs.append((i + 1, j + 1))
    return Z, sorted(pairs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--score", choices=["frob", "DI"], default="frob")
    ap.add_argument("--seqs", type=int, default=2000)
    ap.add_argument("--cols", type=int, default=60)
    ap.add_argument("--pairs", type=int, default=8)
    args = ap.parse_args()

    from gaussdca_tpu import api
    from gaussdca_tpu.core.config import GDCAConfig
    from gaussdca_tpu.io.fasta import MSA

    Z, planted = synth_msa(args.seqs, args.cols, n_pairs=args.pairs)
    msa = MSA(tokens=Z, headers=[f"s{i}" for i in range(len(Z))], q=21)
    cfg = GDCAConfig(score=args.score,
                     pseudocount=0.2 if args.score == "DI" else 0.8,
                     theta=0.2)
    res = api.gdca_from_msa(msa, cfg)
    top = {(i, j) for i, j, _ in res.ranking[:len(planted)]}
    hits = sum(1 for p in planted if p in top)
    print(f"score={args.score}  planted={planted}")
    print(f"top-{len(planted)}: {sorted(top)}")
    print(f"recovered {hits}/{len(planted)} planted pairs "
          f"(theta={res.theta:.3f}, Meff={res.meff:.0f})")


if __name__ == "__main__":
    main()
