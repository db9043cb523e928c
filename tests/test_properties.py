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
