"""Per-stage unit tests: reweighting, frequencies, pseudocount, covariance.

The reference has no per-stage tests (SURVEY.md section 4 gap list) — every
intermediate here is checked against tiny hand-computable cases.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from gaussdca_tpu.stats import reweight
from gaussdca_tpu.stats.frequencies import weighted_frequencies
from gaussdca_tpu.stats.pseudocount import add_pseudocount, compute_C


def toy_Z():
    # 4 sequences x 5 positions, q = 3 (state 3 = gauge/gap)
    return jnp.array([
        [1, 2, 1, 3, 2],
        [1, 2, 1, 3, 2],   # identical to row 0
        [1, 2, 2, 3, 2],   # hamming 1 from rows 0/1
        [2, 1, 3, 1, 1],   # far from everything
    ], dtype=jnp.int8)


def test_match_counts_small():
    Z = toy_Z()
    D = np.asarray(reweight.match_counts(Z))
    assert D.shape == (4, 4)
    np.testing.assert_array_equal(np.diag(D), [5, 5, 5, 5])
    assert D[0, 1] == 5
    assert D[0, 2] == 4
    assert D[0, 3] == 0
    np.testing.assert_array_equal(D, D.T)


def test_match_counts_chunked_matches_dense():
    rng = np.random.default_rng(0)
    Z = jnp.asarray(rng.integers(1, 22, size=(37, 19), dtype=np.int8))
    dense = np.asarray(reweight.match_counts(Z))
    chunked = np.asarray(reweight.match_counts(Z, row_chunk=8))
    np.testing.assert_array_equal(dense, chunked)


def test_theta_zero_gives_uniform_weights():
    Z = toy_Z()
    W, Meff, th = reweight.compute_weights(Z, 0.0)
    np.testing.assert_allclose(np.asarray(W), np.ones(4))
    assert float(Meff) == 4.0
    assert float(th) == 0.0


def test_weights_hand_case():
    Z = toy_Z()
    # theta = 0.5 -> thresh = floor(0.5*5) = 2; neighbors iff hamming < 2.
    # rows 0,1: each others' neighbor (d=0) + row 2 (d=1) -> 2 neighbors
    # row 2: neighbors 0,1 -> 2; row 3: none (d=5,5,4... all >= 2) -> 0
    W, Meff, _ = reweight.compute_weights(Z, 0.5)
    np.testing.assert_allclose(np.asarray(W), [1/3, 1/3, 1/3, 1.0])
    np.testing.assert_allclose(float(Meff), 2.0)


def test_weight_threshold_strictness():
    # hamming == thresh must NOT count as neighbor (strict <).
    Z = jnp.array([[1, 2, 1, 1], [1, 2, 2, 2]], dtype=jnp.int8)  # d = 2
    # theta=0.5, N=4 -> thresh=2; d=2 not < 2 -> no neighbors
    W, Meff, _ = reweight.compute_weights(Z, 0.5)
    np.testing.assert_allclose(np.asarray(W), [1.0, 1.0])
    # theta=0.75 -> thresh=3; d=2 < 3 -> mutual neighbors
    W, Meff, _ = reweight.compute_weights(Z, 0.75)
    np.testing.assert_allclose(np.asarray(W), [0.5, 0.5])


def test_auto_theta_formula():
    Z = toy_Z()
    D = reweight.match_counts(Z)
    # matches over 6 pairs: (0,1)=5 (0,2)=4 (0,3)=0 (1,2)=4 (1,3)=0 (2,3)=0
    mfi = (5 + 4 + 0 + 4 + 0 + 0) / (5 * 6)
    expected = min(0.5, 0.38 * 0.32 / mfi)
    got = float(reweight.auto_theta(D, 5))
    assert got == pytest.approx(expected, rel=1e-12)


def test_frequencies_hand_case():
    # 2 positions, q=3 (s=2), 2 sequences, weights [1, 3]
    Z = jnp.array([[1, 2], [2, 3]], dtype=jnp.int8)
    W = jnp.array([1.0, 3.0])
    Pi, Pij, Meff = weighted_frequencies(Z, W, 3)
    assert float(Meff) == 4.0
    # Pi layout: [site0:a1, site0:a2, site1:a1, site1:a2]
    np.testing.assert_allclose(np.asarray(Pi), [0.25, 0.75, 0.0, 0.25])
    # diagonal blocks are diag(Pi); cross block from seq contributions
    P = np.asarray(Pij)
    np.testing.assert_allclose(np.diag(P), [0.25, 0.75, 0.0, 0.25])
    assert P[0, 1] == 0.0  # same-site off-diagonal
    assert P[0, 3] == pytest.approx(0.25)  # (site0=1, site1=2): seq0, w=1/4
    assert P[1, 2] == pytest.approx(0.0)
    assert P[1, 3] == pytest.approx(0.0)   # seq1 has gap at site1
    np.testing.assert_allclose(P, P.T)


def test_frequencies_sum_bounds():
    rng = np.random.default_rng(1)
    Z = jnp.asarray(rng.integers(1, 4, size=(20, 6), dtype=np.int8))
    W = jnp.asarray(rng.uniform(0.1, 1.0, size=20))
    Pi, Pij, Meff = weighted_frequencies(Z, W, 3)
    # per-site sums over reduced states <= 1 (equality iff no gauge state)
    site_sums = np.asarray(Pi).reshape(6, 2).sum(1)
    assert np.all(site_sums <= 1 + 1e-12)


def test_pseudocount_formulas():
    q, s, N = 3, 2, 2
    rng = np.random.default_rng(2)
    Pi_t = jnp.asarray(rng.uniform(size=N * s))
    Pij_t = rng.uniform(size=(N * s, N * s))
    Pij_t = jnp.asarray((Pij_t + Pij_t.T) / 2)
    pc = 0.4
    Pi, Pij = add_pseudocount(Pi_t, Pij_t, pc, q)
    np.testing.assert_allclose(np.asarray(Pi),
                               (1 - pc) * np.asarray(Pi_t) + pc / q)
    P, Pt = np.asarray(Pij), np.asarray(Pij_t)
    # off-diagonal site block
    np.testing.assert_allclose(P[0, 2], (1 - pc) * Pt[0, 2] + pc / q**2)
    # diagonal site block, off-diagonal entry: no pc/q^2 term
    np.testing.assert_allclose(P[0, 1], (1 - pc) * Pt[0, 1])
    # diagonal entry: + pc/q
    np.testing.assert_allclose(P[0, 0], (1 - pc) * Pt[0, 0] + pc / q)


def test_covariance():
    Pi = jnp.array([0.2, 0.3])
    Pij = jnp.array([[0.2, 0.1], [0.1, 0.3]])
    C = np.asarray(compute_C(Pi, Pij))
    np.testing.assert_allclose(C, [[0.16, 0.04], [0.04, 0.21]])


def test_weighted_frequencies_chunked_matches_dense():
    import jax.numpy as jnp
    import numpy as np
    from gaussdca_tpu.stats.frequencies import weighted_frequencies

    rng = np.random.default_rng(23)
    M, N, q = 57, 11, 6
    Z = jnp.asarray(rng.integers(1, q + 1, size=(M, N), dtype=np.int8))
    W = jnp.asarray(rng.uniform(0.1, 1.0, size=M))
    Pi0, Pij0, Meff0 = weighted_frequencies(Z, W, q)
    for chunk in (8, 16, 57, 100):
        Pi1, Pij1, Meff1 = weighted_frequencies(Z, W, q, m_chunk=chunk)
        np.testing.assert_allclose(np.asarray(Pi1), np.asarray(Pi0),
                                   rtol=1e-13, atol=1e-15)
        np.testing.assert_allclose(np.asarray(Pij1), np.asarray(Pij0),
                                   rtol=1e-13, atol=1e-15)
        assert float(Meff1) == float(Meff0)


@pytest.mark.parametrize("q,pad", [(5, False), (21, False), (21, True)])
def test_total_matches_closed_form(q, pad):
    """The histogram closed form sum_k sum_c n_kc^2 must equal the brute
    pairwise total (incl. self pairs), with token-0 padding excluded —
    this is what makes auto-theta single-pass (SURVEY.md 7.4)."""
    import numpy as np
    rng = np.random.default_rng(q + pad)
    Z = rng.integers(1, q + 1, size=(37, 19), dtype=np.int8)
    if pad:
        Z[-5:] = 0          # padding rows
        Z[:, -3:] = 0       # padding columns
    Zj = jnp.asarray(Z)
    D = np.asarray(reweight.match_counts(Zj))  # pairwise, token-0 inert
    want = float(D.sum())
    got = float(reweight.total_matches_closed_form(Zj, q, jnp.float64))
    assert got == want
