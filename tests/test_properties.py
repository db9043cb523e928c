"""Property tests over random MSAs — the per-stage invariants the
reference's end-to-end-only test suite never checks (SURVEY.md section 4).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from gaussdca_tpu.score.apc import correct_apc
from gaussdca_tpu.stats import reweight
from gaussdca_tpu.stats.frequencies import weighted_frequencies
from gaussdca_tpu.stats.pseudocount import add_pseudocount, compute_C


def _msa(M, N, q, seed):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.integers(1, q + 1, size=(M, N), dtype=np.int8))


@pytest.mark.parametrize("seed", range(4))
def test_weight_invariants(seed):
    Z = _msa(60, 25, 21, seed)
    for theta in ("auto", 0.0, 0.15, 0.5, 1.0):
        W, Meff, th = reweight.compute_weights(Z, theta)
        W = np.asarray(W)
        assert ((W > 0) & (W <= 1)).all()
        assert 0 < float(Meff) <= Z.shape[0] + 1e-9
        assert float(Meff) == pytest.approx(W.sum(), rel=1e-12)
        assert 0.0 <= float(th) <= 1.0
        if theta == 0.0:
            assert (W == 1.0).all()       # uniform-weights branch
        if theta == "auto":
            assert float(th) <= 0.5       # auto-theta cap


@pytest.mark.parametrize("seed", range(3))
def test_frequency_invariants(seed):
    q, N, M = 8, 12, 40
    Z = _msa(M, N, q, 100 + seed)
    rng = np.random.default_rng(seed)
    W = jnp.asarray(rng.uniform(0.2, 1.0, size=M))
    Pi, Pij, Meff = weighted_frequencies(Z, W, q)
    Pi = np.asarray(Pi).reshape(N, q - 1)
    Pij = np.asarray(Pij)
    # single-site marginals: sum over reduced states = 1 - P(gap) <= 1
    assert (Pi.sum(axis=1) <= 1 + 1e-12).all()
    assert (Pi >= 0).all()
    # symmetric, diagonal blocks diagonal with Pi on the diagonal
    np.testing.assert_allclose(Pij, Pij.T, atol=1e-14)
    s = q - 1
    for i in range(N):
        blk = Pij[i * s:(i + 1) * s, i * s:(i + 1) * s]
        np.testing.assert_allclose(np.diag(blk), Pi[i], atol=1e-14)
        np.testing.assert_allclose(blk - np.diag(np.diag(blk)), 0,
                                   atol=1e-14)


@pytest.mark.parametrize("pc", [0.0, 0.2, 0.8, 1.0])
def test_pseudocount_preserves_normalization(pc):
    q, N, M = 6, 9, 30
    Z = _msa(M, N, q, 7)
    W = jnp.ones((M,))
    Pi_t, Pij_t, _ = weighted_frequencies(Z, W, q)
    Pi, Pij = add_pseudocount(Pi_t, Pij_t, jnp.asarray(float(pc)), q)
    Pi = np.asarray(Pi).reshape(N, q - 1)
    # full-alphabet mass per site is 1; the reduced states carry 1 - P(gap),
    # and shrinkage pulls each state toward 1/q
    full = Pi.sum(axis=1)
    assert (full <= 1 + 1e-12).all()
    if pc == 1.0:
        np.testing.assert_allclose(Pi, 1.0 / q, atol=1e-14)


def test_covariance_spd_after_pseudocount():
    q, N, M = 8, 10, 35
    Z = _msa(M, N, q, 11)
    W = jnp.ones((M,))
    Pi_t, Pij_t, _ = weighted_frequencies(Z, W, q)
    Pi, Pij = add_pseudocount(Pi_t, Pij_t, jnp.asarray(0.3), q)
    C = np.asarray(compute_C(Pi, Pij))
    np.testing.assert_allclose(C, C.T, atol=1e-14)
    w = np.linalg.eigvalsh(C)
    assert w.min() > 0, f"C not SPD: min eig {w.min()}"


def test_apc_removes_rank_one_structure():
    """APC zeroes a matrix of the exact product form s_i * s_j."""
    rng = np.random.default_rng(3)
    N = 20
    v = rng.uniform(0.5, 2.0, size=N)
    S = np.outer(v, v)
    np.fill_diagonal(S, 0.0)
    # APC on zero-diagonal product structure: S - Sj Si / Sa leaves ~0 on
    # the off-diagonal up to the diagonal-exclusion correction O(1/N)
    out = np.asarray(correct_apc(jnp.asarray(S)))
    off = out[~np.eye(N, dtype=bool)]
    assert np.abs(off).max() < np.abs(S[~np.eye(N, dtype=bool)]).max() * 0.2


def test_ranking_pair_count_formula():
    from gaussdca_tpu.score.rank import compute_ranking
    rng = np.random.default_rng(9)
    for N, m in ((53, 5), (53, 4), (30, 1), (10, 9)):
        S = rng.standard_normal((N, N))
        R = compute_ranking(S, m)
        assert len(R) == (N - m) * (N - m + 1) // 2
        scores = [x for _, _, x in R]
        assert scores == sorted(scores, reverse=True)
        assert all(j - i >= m for i, j, _ in R)


# -- hypothesis-driven invariants (derandomized for CI stability) --------

from hypothesis import given, settings, strategies as st

_h = settings(deadline=None, max_examples=25, derandomize=True)


@_h
@given(st.integers(2, 12), st.integers(5, 40), st.integers(6, 30),
       st.one_of(st.just("auto"),
                 st.floats(0, 1, allow_nan=False).map(lambda x: round(x, 3))),
       st.integers(0, 2 ** 31 - 1))
def test_hyp_weight_invariants(q, M, N, theta, seed):
    import numpy as np
    import jax.numpy as jnp
    rng = np.random.default_rng(seed)
    Z = jnp.asarray(rng.integers(1, q + 1, size=(M, N), dtype=np.int8))
    W, Meff, th = reweight.compute_weights(Z, theta)
    W = np.asarray(W)
    assert ((W > 0) & (W <= 1)).all()
    assert 0 < float(Meff) <= M + 1e-9
    assert 0.0 <= float(th) <= 1.0


@_h
@given(st.integers(2, 10), st.integers(3, 30), st.integers(4, 16),
       st.floats(0.01, 0.99), st.integers(0, 2 ** 31 - 1))
def test_hyp_covariance_spd_and_scores_finite(q, M, N, pc, seed):
    import numpy as np
    import jax.numpy as jnp
    from gaussdca_tpu.api import scores_pipeline
    rng = np.random.default_rng(seed)
    Z = jnp.asarray(rng.integers(1, q + 1, size=(M, N), dtype=np.int8))
    S, th, meff = scores_pipeline(
        Z, jnp.asarray(pc, jnp.float64), jnp.asarray(0.2, jnp.float64),
        q=q, score="frob", theta_is_auto=False, dtype=jnp.float64,
        use_pallas=False)
    S = np.asarray(S)
    assert np.isfinite(S).all()
    np.testing.assert_allclose(S, S.T, atol=1e-10)


@_h
@given(st.integers(5, 60), st.integers(1, 8), st.integers(0, 2 ** 31 - 1))
def test_hyp_ranking_contract(N, m, seed):
    import numpy as np
    from gaussdca_tpu.score.rank import compute_ranking
    if m >= N:
        return
    rng = np.random.default_rng(seed)
    S = rng.standard_normal((N, N))
    R = compute_ranking(S, m)
    assert len(R) == (N - m) * (N - m + 1) // 2
    assert all(1 <= i < j <= N and j - i >= m for i, j, _ in R)
    scores = [x for _, _, x in R]
    assert scores == sorted(scores, reverse=True)


@_h
@given(st.integers(3, 8), st.integers(4, 25), st.integers(4, 12),
       st.floats(0.05, 0.95), st.integers(0, 2 ** 31 - 1))
def test_hyp_di_finite_symmetric_nonneg_diag0(q, M, N, pc, seed):
    import numpy as np
    import jax.numpy as jnp
    from gaussdca_tpu.api import scores_pipeline
    rng = np.random.default_rng(seed)
    Z = jnp.asarray(rng.integers(1, q + 1, size=(M, N), dtype=np.int8))
    S, th, meff = scores_pipeline(
        Z, jnp.asarray(pc, jnp.float64), jnp.asarray(0.2, jnp.float64),
        q=q, score="DI", theta_is_auto=False, dtype=jnp.float64,
        use_pallas=False)
    # pre-APC DI is a mutual information (>= 0); APC can shift it, so
    # check the uncorrected invariants via the internal pieces instead:
    # here assert finiteness + symmetry of the final matrix
    S = np.asarray(S)
    assert np.isfinite(S).all()
    np.testing.assert_allclose(S, S.T, atol=1e-9)


@_h
@given(st.integers(4, 10), st.integers(6, 40), st.integers(6, 14),
       st.sampled_from(["frob", "DI"]),
       st.integers(4, 32), st.integers(4, 16),
       st.integers(0, 2 ** 31 - 1))
def test_hyp_bucketing_equivalence(q, M, N, score, mb, nb, seed):
    """The core batch-mode invariant over the whole config space:
    (M, N)-bucketed runs equal exact-shape runs."""
    import numpy as np
    from gaussdca_tpu import api
    from gaussdca_tpu.core.config import GDCAConfig
    from gaussdca_tpu.io.fasta import MSA
    rng = np.random.default_rng(seed)
    Z = rng.integers(1, q + 1, size=(M, N), dtype=np.int8)
    Z[0, 0] = q  # pin q
    msa = MSA(tokens=Z, headers=[f"s{i}" for i in range(M)], q=q)
    kw = dict(score=score, pseudocount=0.4, min_separation=1)
    base = api.gdca_from_msa(msa, GDCAConfig(**kw))
    padded = api.gdca_from_msa(
        msa, GDCAConfig(**kw, m_bucket=mb, n_bucket=nb))
    assert base.meff == padded.meff
    assert base.theta == pytest.approx(padded.theta, rel=1e-12)
    want = {(i, j): s for i, j, s in base.ranking}
    got = {(i, j): s for i, j, s in padded.ranking}
    assert set(got) == set(want)
    for k, s0 in want.items():
        assert got[k] == pytest.approx(s0, rel=1e-6, abs=1e-9)
