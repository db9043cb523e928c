"""End-to-end golden-file regression against the reference outputs.

Comparison semantics match the reference's test harness
(/root/reference/test/runtests.jl:29-50): parse each "%i %i %e" line into a
(i, j) -> score map, require the exact same key set, and per-key approximate
equality (the reference uses Julia isapprox, rtol ~ 1.5e-8; golden files
carry 7 significant digits so we allow 1e-6 against the printed values).
Tie ORDER is deliberately unasserted — the reference's sort is unstable.
"""

import os

import numpy as np
import pytest

from gaussdca_tpu import gdca
from gaussdca_tpu.score.rank import format_rank

RTOL = 1e-6


def todict(text):
    d = {}
    for line in text.splitlines():
        toks = line.split()
        assert len(toks) == 3
        key = (int(toks[0]), int(toks[1]))
        assert key not in d
        d[key] = float(toks[2])
    return d


def assert_matches_golden(result, golden_path):
    got = todict(format_rank(result.ranking))
    want = todict(open(golden_path).read())
    assert set(got) == set(want)
    g = np.array([got[k] for k in sorted(want)])
    w = np.array([want[k] for k in sorted(want)])
    np.testing.assert_allclose(g, w, rtol=RTOL, atol=1e-12)


def test_small_frob_defaults(golden_dir):
    r = gdca(os.path.join(golden_dir, "small.fasta.gz"))
    assert len(r) == 1176
    assert_matches_golden(r, os.path.join(golden_dir, "small.FNRout.txt"))


def test_small_di_dedup(golden_dir):
    r = gdca(os.path.join(golden_dir, "small.fasta.gz"),
             pseudocount=0.2, score="DI", remove_dups=True)
    assert r.M == 98  # 106 - 8 duplicate copies
    assert_matches_golden(r, os.path.join(golden_dir, "small.DIRout.txt"))


def test_small_di_theta0(golden_dir):
    r = gdca(os.path.join(golden_dir, "small.fasta.gz"),
             pseudocount=0.2, score="DI", theta=0.0,
             max_gap_fraction=0.8, min_separation=4)
    assert len(r) == 1225
    assert r.meff == pytest.approx(106.0)  # theta=0 -> uniform weights
    assert_matches_golden(r, os.path.join(golden_dir, "small.DIRout2.txt"))


def test_large_di_dedup(golden_dir):
    r = gdca(os.path.join(golden_dir, "large.fasta.gz"),
             pseudocount=0.2, score="DI", remove_dups=True)
    assert r.N == 400 and r.n_dropped_gaps == 5
    assert len(r) == 78210
    assert_matches_golden(r, os.path.join(golden_dir, "large.DIRout.txt"))


def test_fallback_path_matches_golden(golden_dir, monkeypatch):
    """The reference's test3 pattern (runtests.jl:78-86): force the
    fallback kernels and require identical golden output."""
    monkeypatch.setenv("GDCA_FORCE_FALLBACK", "true")
    r = gdca(os.path.join(golden_dir, "small.fasta.gz"),
             pseudocount=0.2, score="DI", remove_dups=True)
    assert_matches_golden(r, os.path.join(golden_dir, "small.DIRout.txt"))


def test_bucketed_padding_matches_exact(golden_dir):
    """m_bucket padding (masked rows) must not change the ranking at all,
    including through the auto-theta global mean."""
    import os
    import numpy as np
    from gaussdca_tpu import api
    from gaussdca_tpu.core.config import GDCAConfig
    from gaussdca_tpu.io import fasta

    path = os.path.join(golden_dir, "small.fasta.gz")
    msa = fasta.read_fasta_alignment(path, 0.9)
    base = api.gdca_from_msa(msa, GDCAConfig(score="frob"))
    padded = api.gdca_from_msa(msa, GDCAConfig(score="frob", m_bucket=64))
    assert msa.M % 64 != 0  # the bucket actually pads (M=106)
    assert base.theta == padded.theta
    assert base.meff == padded.meff
    # scores agree to summation-order noise (the padded reduction shape
    # changes the f.p. reduction tree); pair sets are identical
    want = {(i, j): s for i, j, s in base.ranking}
    got = {(i, j): s for i, j, s in padded.ranking}
    assert set(got) == set(want)
    for k, s0 in want.items():
        assert got[k] == pytest.approx(s0, rel=1e-9, abs=1e-11)


@pytest.mark.parametrize("score,pc", [("frob", 0.8), ("DI", 0.2)])
def test_n_bucketed_padding_matches_exact(golden_dir, score, pc):
    """(M, N)-bucketed runs must reproduce the exact-shape ranking:
    padding columns decouple exactly from the covariance."""
    import os
    import numpy as np
    from gaussdca_tpu import api
    from gaussdca_tpu.core.config import GDCAConfig
    from gaussdca_tpu.io import fasta

    path = os.path.join(golden_dir, "small.fasta.gz")
    msa = fasta.read_fasta_alignment(path, 0.9)
    base = api.gdca_from_msa(msa, GDCAConfig(score=score, pseudocount=pc))
    padded = api.gdca_from_msa(
        msa, GDCAConfig(score=score, pseudocount=pc,
                        m_bucket=64, n_bucket=64))
    assert msa.N % 64 != 0  # N=53 actually pads
    assert base.theta == pytest.approx(padded.theta, rel=1e-13)
    assert base.meff == padded.meff
    want = {(i, j): s for i, j, s in base.ranking}
    got = {(i, j): s for i, j, s in padded.ranking}
    assert set(got) == set(want)
    for k, s0 in want.items():
        assert got[k] == pytest.approx(s0, rel=1e-7, abs=1e-9)


def _synth_q31_msa():
    """The deterministic q=31 synthetic alignment behind the
    tests/data/synth_q31.* fixtures (see PROVENANCE.md): a 20-founder
    star phylogeny, 4 children each, 15% mutations, alphabet pinned to
    the reference's hard limit q=31 (src/GaussDCA.jl:26)."""
    from gaussdca_tpu.io.fasta import MSA

    rng = np.random.default_rng(31)
    N, q = 24, 31
    founders = rng.integers(1, q + 1, size=(20, N), dtype=np.uint8)
    rows = []
    for f in founders:
        for _ in range(4):
            child = f.copy()
            mut = rng.random(N) < 0.15
            child[mut] = rng.integers(1, q + 1, size=mut.sum())
            rows.append(child)
    Z = np.stack(rows)
    Z[0, 0] = q
    return MSA(tokens=Z, headers=[f"s{i}" for i in range(len(Z))],
               q=int(Z.max()))


@pytest.mark.parametrize("score,pc,fixture", [
    ("frob", 0.8, "synth_q31.FNRout.txt"),
    ("DI", 0.2, "synth_q31.DIRout.txt"),
])
def test_synthetic_q31_golden(golden_dir, score, pc, fixture):
    """End-to-end regression at the q=31 alphabet boundary (self-generated
    f64 fixture — the reference's own golden data never exceeds q=21)."""
    from gaussdca_tpu import api
    from gaussdca_tpu.core.config import GDCAConfig

    msa = _synth_q31_msa()
    assert msa.q == 31
    res = api.gdca_from_msa(msa, GDCAConfig(score=score, pseudocount=pc,
                                            min_separation=2))
    want = {}
    for line in open(os.path.join(golden_dir, fixture)):
        t = line.split()
        want[(int(t[0]), int(t[1]))] = float(t[2])
    got = {(i, j): s for i, j, s in res.ranking}
    assert set(got) == set(want)
    for k, v in want.items():
        # the fixture text is "%e" (7 significant digits): compare at the
        # format's own resolution
        assert got[k] == pytest.approx(v, rel=5e-7, abs=1e-9)


def test_gdca_convenience_kwargs(golden_dir):
    """gdca() exposes the batch machinery (top_k, buckets, precision)
    directly (VERDICT r1 item 10): bucketed + top-k results must match
    the exact-shape full ranking's head."""
    full = gdca(os.path.join(golden_dir, "small.fasta.gz"))
    head = gdca(os.path.join(golden_dir, "small.fasta.gz"),
                top_k=25, m_bucket=64, n_bucket=32, precision="highest")
    assert len(head.ranking) == 25
    want = {(i, j): s for i, j, s in full.ranking[:40]}
    for i, j, s in head.ranking:
        assert (i, j) in want
        assert s == pytest.approx(want[(i, j)], rel=1e-7, abs=1e-9)
    assert head.theta == pytest.approx(full.theta, rel=1e-9)
