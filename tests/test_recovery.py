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
