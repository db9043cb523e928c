"""Statistical end-to-end test: planted covarying pairs must dominate the
ranking — validates the method itself, independent of the golden files.
"""

import sys
import os

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "examples"))
from recover_contacts import synth_msa  # noqa: E402


@pytest.mark.parametrize("score,pc", [("frob", 0.8), ("DI", 0.2)])
def test_planted_pairs_recovered(score, pc):
    from gaussdca_tpu import api
    from gaussdca_tpu.core.config import GDCAConfig
    from gaussdca_tpu.io.fasta import MSA

    Z, planted = synth_msa(M=800, N=40, n_pairs=5, copy_p=0.9, seed=3)
    msa = MSA(tokens=Z, headers=[f"s{i}" for i in range(len(Z))], q=21)
    res = api.gdca_from_msa(msa, GDCAConfig(score=score, pseudocount=pc,
                                            theta=0.2))
    top = {(i, j) for i, j, _ in res.ranking[:len(planted)]}
    hits = sum(1 for p in planted if p in top)
    assert hits == len(planted), (
        f"recovered only {hits}/{len(planted)}: top={sorted(top)} "
        f"planted={planted}")


def test_recovery_with_phylogenetic_redundancy():
    """Planted pairs must still surface when the MSA is dominated by
    near-duplicate (phylogenetically clustered) sequences — the regime
    sequence reweighting exists for."""
    import numpy as np
    from gaussdca_tpu import api
    from gaussdca_tpu.core.config import GDCAConfig
    from gaussdca_tpu.io.fasta import MSA

    rng = np.random.default_rng(11)
    q, N = 21, 40
    n_founders, copies = 40, 20
    founders = rng.integers(1, q + 1, size=(n_founders, N), dtype=np.int8)
    # plant covariation among the founders
    pairs = [(3, 11), (8, 20), (15, 33)]
    for (i, j) in pairs:
        perm = rng.permutation(q) + 1
        founders[:, j - 1] = perm[founders[:, i - 1] - 1]
    # each founder spawns near-duplicates (2% mutations) — a crude
    # star phylogeny that floods the MSA with redundancy
    rows = []
    for f in founders:
        for _ in range(copies):
            child = f.copy()
            mut = rng.random(N) < 0.02
            child[mut] = rng.integers(1, q + 1, size=mut.sum())
            rows.append(child)
    Z = np.stack(rows)
    msa = MSA(tokens=Z, headers=[f"s{k}" for k in range(len(Z))], q=q)
    res = api.gdca_from_msa(msa, GDCAConfig(pseudocount=0.8))
    # reweighting collapses each cluster: Meff far below M
    assert res.meff < len(Z) / 4
    top = {(i, j) for i, j, _ in res.ranking[:len(pairs)]}
    hits = sum(1 for p in pairs if p in top)
    assert hits == len(pairs), (res.ranking[:5], pairs, res.meff, res.theta)
