"""Optimized distance kernels vs the pure-jnp fallback (exactness).

Counts are small integers, so the MXU/Pallas paths must agree bit-for-bit
with the fallback — the reference cross-validates its packed kernel against
its generic one the same way (test/runtests.jl:78-86).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from gaussdca_tpu.ops import distance
from gaussdca_tpu.stats import reweight


@pytest.mark.parametrize("M,N,q", [(7, 5, 3), (64, 53, 21), (130, 40, 21),
                                   (257, 129, 21)])
def test_mxu_matches_fallback(M, N, q):
    rng = np.random.default_rng(M * 1000 + N)
    Z = jnp.asarray(rng.integers(1, q + 1, size=(M, N), dtype=np.int8))
    want = np.asarray(reweight.match_counts(Z))
    got = np.asarray(distance.match_counts_mxu(Z, q))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("M,N,q", [(16, 24, 5), (100, 53, 21)])
def test_pallas_interpret_matches_fallback(M, N, q):
    rng = np.random.default_rng(M)
    Z = jnp.asarray(rng.integers(1, q + 1, size=(M, N), dtype=np.int8))
    want = np.asarray(reweight.match_counts(Z))
    got = np.asarray(distance.match_counts_pallas(Z, q, tile_m=128,
                                                  interpret=True))
    np.testing.assert_array_equal(got, want)


def test_padding_rows_are_inert():
    # M not a multiple of the tile: padded rows must not leak into results.
    rng = np.random.default_rng(3)
    Z = jnp.asarray(rng.integers(1, 22, size=(33, 19), dtype=np.int8))
    want = np.asarray(reweight.match_counts(Z))
    got = np.asarray(distance.match_counts_pallas(Z, 21, tile_m=128,
                                                  interpret=True))
    np.testing.assert_array_equal(got, want)


def _row_stats_interp(Z, thresh, q):
    return distance.row_stats_pallas(Z, thresh, q, tile_m=128,
                                     interpret=True)


@pytest.mark.parametrize("theta", [0.0, 0.2, 0.5, "auto"])
def test_streaming_weights_match_dense(theta):
    rng = np.random.default_rng(7)
    Z = jnp.asarray(rng.integers(1, 22, size=(70, 31), dtype=np.int8))
    W0, Meff0, th0 = reweight.compute_weights(Z, theta)
    W1, Meff1, th1 = reweight.compute_weights_streaming(
        Z, theta, 21, _row_stats_interp)
    np.testing.assert_allclose(np.asarray(W1), np.asarray(W0), rtol=1e-12)
    np.testing.assert_allclose(float(Meff1), float(Meff0), rtol=1e-12)
    np.testing.assert_allclose(float(th1), float(th0), rtol=1e-12)


@pytest.mark.parametrize("M,tile", [
    (40, 128),    # T = 1 (single diagonal tile)
    (300, 128),   # T = 3 (odd: clean circulant covering)
    (513, 128),   # T = 5 odd, with padding rows
    (520, 128),   # T = 5
    (1000, 128),  # T = 8 (even: the half-column special case)
])
def test_row_stats_sym_matches_dense(M, tile):
    rng = np.random.default_rng(M)
    N, q = 37, 21
    Z = jnp.asarray(rng.integers(1, q + 1, size=(M, N), dtype=np.int8))
    D = np.asarray(reweight.match_counts(Z))
    thresh = 9.0
    rowsum, below = distance.row_stats_sym_pallas(
        Z, jnp.float32(thresh), q, tile_m=tile, interpret=True)
    np.testing.assert_allclose(np.asarray(rowsum), D.sum(1))
    np.testing.assert_allclose(np.asarray(below), ((N - D) < thresh).sum(1))


@pytest.mark.parametrize("theta", [0.0, 0.3, "auto"])
def test_streaming_weights_sym_kernel(theta):
    rng = np.random.default_rng(11)
    Z = jnp.asarray(rng.integers(1, 22, size=(310, 29), dtype=np.int8))
    W0, Meff0, th0 = reweight.compute_weights(Z, theta)
    W1, Meff1, th1 = reweight.compute_weights_streaming(
        Z, theta, 21,
        lambda z, t, q: distance.row_stats_sym_pallas(
            z, t, q, tile_m=128, interpret=True))
    np.testing.assert_allclose(np.asarray(W1), np.asarray(W0), rtol=1e-12)
    np.testing.assert_allclose(float(Meff1), float(Meff0), rtol=1e-12)
    np.testing.assert_allclose(float(th1), float(th0), rtol=1e-12)


def test_row_stats_values():
    rng = np.random.default_rng(8)
    M, N, q = 40, 17, 6
    Z = jnp.asarray(rng.integers(1, q + 1, size=(M, N), dtype=np.int8))
    D = np.asarray(reweight.match_counts(Z))
    thresh = 4.0
    rowsum, below = _row_stats_interp(Z, jnp.float32(thresh), q)
    np.testing.assert_allclose(np.asarray(rowsum), D.sum(1))
    np.testing.assert_allclose(np.asarray(below),
                               ((N - D) < thresh).sum(1))


@pytest.mark.parametrize("q", [2, 22, 31])
def test_kernels_q_boundaries(q):
    """q boundary coverage through every optimized path (interpret mode):
    q=2 (minimum meaningful alphabet), q=22 (first beyond the standard
    protein alphabet — pads every plane loop), q=31 (the reference's
    hard 5-bit-packing limit, src/GaussDCA.jl:26)."""
    rng = np.random.default_rng(q)
    M, N = 96, 40
    Z = jnp.asarray(rng.integers(1, q + 1, size=(M, N), dtype=np.int8))
    D = np.asarray(reweight.match_counts(Z))
    thresh = 7.0

    rowsum, below = distance.row_stats_pallas(
        Z, jnp.float32(thresh), q, tile_m=128, interpret=True)
    np.testing.assert_allclose(np.asarray(rowsum), D.sum(1))
    np.testing.assert_allclose(np.asarray(below), ((N - D) < thresh).sum(1))

    rowsum, below = distance.row_stats_sym_pallas(
        Z, jnp.float32(thresh), q, tile_m=128, interpret=True)
    np.testing.assert_allclose(np.asarray(rowsum), D.sum(1))
    np.testing.assert_allclose(np.asarray(below), ((N - D) < thresh).sum(1))

    ra, rb = distance.row_stats_rect_pallas(
        Z[:40], Z, jnp.float32(thresh), q, tile_m=128, interpret=True)
    np.testing.assert_allclose(np.asarray(ra), D[:40].sum(1))
    np.testing.assert_allclose(np.asarray(rb),
                               ((N - D[:40]) < thresh).sum(1))

    got = np.asarray(distance.match_counts_pallas(Z, q, tile_m=128,
                                                  interpret=True))
    np.testing.assert_array_equal(got, D)
    np.testing.assert_array_equal(np.asarray(distance.match_counts_mxu(Z, q)),
                                  D)


def test_kernels_q31_wide_forces_no_unroll():
    """q=31 at a width where full unroll cannot fit VMEM: the planner
    must select the unroll=False branch, and both row-stats kernels must
    stay exact through it (interpret mode). This is the padded-plane
    regime docs/ROADMAP.md flagged: plan budgets are keyed on q, not on
    the q=21 default."""
    q, N, M = 31, 1536, 96
    tile, full_unroll = distance._plan_tiles(N, q)
    assert not full_unroll  # (2q+8)*Np > 12 MB at every tile >= 128
    rng = np.random.default_rng(31)
    Z = jnp.asarray(rng.integers(1, q + 1, size=(M, N), dtype=np.int8))
    D = np.asarray(reweight.match_counts(Z))
    thresh = 300.0

    # tile_m=0: the planner's own choice (the unroll=False branch)
    rowsum, below = distance.row_stats_pallas(
        Z, jnp.float32(thresh), q, tile_m=0, interpret=True)
    np.testing.assert_allclose(np.asarray(rowsum), D.sum(1))
    np.testing.assert_allclose(np.asarray(below), ((N - D) < thresh).sum(1))

    # sym kernel: full_unroll=False also disables the plane scratch ->
    # the wide-N in-kernel path
    rowsum, below = distance.row_stats_sym_pallas(
        Z, jnp.float32(thresh), q, tile_m=0, interpret=True)
    np.testing.assert_allclose(np.asarray(rowsum), D.sum(1))
    np.testing.assert_allclose(np.asarray(below), ((N - D) < thresh).sum(1))


def test_row_stats_sym_e8_auto_kblk_q_aligned():
    """kblk=0 auto-sizes to 128*q: lane-aligned and plane-period-aligned
    for non-standard alphabets (no q=21 constant in the plan)."""
    rng = np.random.default_rng(77)
    M, N, q = 64, 19, 29
    Z = jnp.asarray(rng.integers(1, q + 1, size=(M, N), dtype=np.int8))
    D = np.asarray(reweight.match_counts(Z))
    thresh = 5.0
    rowsum, below = distance.row_stats_sym_e8_pallas(
        Z, jnp.float32(thresh), q, tile_m=128, interpret=True)
    np.testing.assert_allclose(np.asarray(rowsum), D.sum(1))
    np.testing.assert_allclose(np.asarray(below), ((N - D) < thresh).sum(1))


def test_plan_tiles_q31_vmem_budget():
    """The tile planner's VMEM accounting must hold at the q=31 boundary
    for every alignment-width regime (docs/ROADMAP.md flags q in 22..31
    as the padded-plane regime)."""
    q = 31
    for N in (53, 128, 384, 1024, 3000, 4096):
        tile, full_unroll = distance._plan_tiles(N, q)
        Np = -(-max(N, 128) // 128) * 128
        assert tile >= 128 and tile % 128 == 0
        if full_unroll:
            # full-unroll temporaries: ~(2q + 8) * tile * Np bytes
            assert tile * (2 * q + 8) * Np <= 12 * 2 ** 20
        else:
            # unroll=1 temporaries: ~10 * tile * Np bytes
            assert 10 * tile * Np <= 10 * 2 ** 20
        # the sym kernel's scratch plane cache must also respect its
        # budget whenever the planner enables full unroll
        if full_unroll and tile * Np * q <= distance._SCRATCH_BUDGET:
            assert tile * Np * q + tile * Np <= 16 * 2 ** 20


@pytest.mark.parametrize("M,tile,kblk", [
    (40, 128, 256),    # T = 1, K padded
    (300, 128, 128),   # odd T
    (1000, 128, 256),  # even T (half-column case), K padding
])
def test_row_stats_sym_e8_matches_dense(M, tile, kblk):
    rng = np.random.default_rng(M + 1)
    N, q = 37, 21
    Z = jnp.asarray(rng.integers(1, q + 1, size=(M, N), dtype=np.int8))
    D = np.asarray(reweight.match_counts(Z))
    thresh = 9.0
    rowsum, below = distance.row_stats_sym_e8_pallas(
        Z, jnp.float32(thresh), q, tile_m=tile, kblk=kblk, interpret=True)
    np.testing.assert_allclose(np.asarray(rowsum), D.sum(1))
    np.testing.assert_allclose(np.asarray(below), ((N - D) < thresh).sum(1))


@pytest.mark.parametrize("M,tile,k", [
    (300, 16, 3),    # T = 21 (odd covering), padding rows
    (256, 16, 2),    # T = 16 (even: the d = T/2 tie split)
    (520, 64, 3),    # T = 9 odd, group padding (Mp = 576)
    (1000, 128, 2),  # T = 8 even at a realistic tile, padding rows
])
def test_row_stats_asym_matches_dense(M, tile, k):
    rng = np.random.default_rng(M + k)
    N, q = 37, 21
    Z = jnp.asarray(rng.integers(1, q + 1, size=(M, N), dtype=np.int8))
    D = np.asarray(reweight.match_counts(Z))
    thresh = 9.0
    rowsum, below = distance.row_stats_asym_pallas(
        Z, jnp.float32(thresh), q, tile_b=tile, k=k, interpret=True)
    np.testing.assert_allclose(np.asarray(rowsum), D.sum(1))
    np.testing.assert_allclose(np.asarray(below), ((N - D) < thresh).sum(1))


def test_row_stats_asym_small_T_falls_back():
    # T = Mp/tile_b = 2 < Dmax + k: the grouped covering would wrap, so
    # the wrapper must route to the square kernel and stay exact.
    rng = np.random.default_rng(5)
    N, q = 23, 21
    Z = jnp.asarray(rng.integers(1, q + 1, size=(40, N), dtype=np.int8))
    D = np.asarray(reweight.match_counts(Z))
    thresh = 6.0
    rowsum, below = distance.row_stats_asym_pallas(
        Z, jnp.float32(thresh), q, tile_b=128, k=2, interpret=True)
    np.testing.assert_allclose(np.asarray(rowsum), D.sum(1))
    np.testing.assert_allclose(np.asarray(below), ((N - D) < thresh).sum(1))


@pytest.mark.parametrize("q", [2, 31])
def test_row_stats_asym_q_boundaries(q):
    rng = np.random.default_rng(q)
    M, N = 260, 19
    Z = jnp.asarray(rng.integers(1, q + 1, size=(M, N), dtype=np.int8))
    D = np.asarray(reweight.match_counts(Z))
    thresh = 5.0
    rowsum, below = distance.row_stats_asym_pallas(
        Z, jnp.float32(thresh), q, tile_b=16, k=3, interpret=True)
    np.testing.assert_allclose(np.asarray(rowsum), D.sum(1))
    np.testing.assert_allclose(np.asarray(below), ((N - D) < thresh).sum(1))


def test_plan_asym_honors_explicit_params():
    """An explicit k (or tile_b) must survive partial planning — the
    on-chip k-sweep (scripts/tpu_session.sh dist_asym_k*) varies only
    k, and replanning both would measure the auto plan three times."""
    for k in (2, 3, 4):
        tb, kk = distance._plan_asym(384, 21, k=k)
        assert kk == k and tb > 0
    for tile in (128, 256):
        tb, kk = distance._plan_asym(384, 21, tile_b=tile)
        assert tb == tile and kk >= 2
    # both explicit: passthrough
    assert distance._plan_asym(384, 21, tile_b=192, k=5) == (192, 5)
    # every partial plan must still respect the VMEM budget
    for k in (2, 3, 4):
        tb, kk = distance._plan_asym(384, 21, k=k)
        Np = 384
        assert distance._asym_vmem(tb, kk, Np, 21) <= \
            distance._ASYM_VMEM_BUDGET


def test_row_stats_asym_k4_exact():
    # k=4 is in the battery's sweep (dist_asym_k4) but not the auto
    # plan; pin its covering exactness in interpret mode.
    rng = np.random.default_rng(44)
    M, N, q = 600, 29, 21
    Z = jnp.asarray(rng.integers(1, q + 1, size=(M, N), dtype=np.int8))
    D = np.asarray(reweight.match_counts(Z))
    thresh = 8.0
    rowsum, below = distance.row_stats_asym_pallas(
        Z, jnp.float32(thresh), q, tile_b=32, k=4, interpret=True)
    np.testing.assert_allclose(np.asarray(rowsum), D.sum(1))
    np.testing.assert_allclose(np.asarray(below), ((N - D) < thresh).sum(1))


def test_plan_asym_vmem_budget():
    """The asym planner's VMEM accounting must hold for every plan it
    can emit, across alignment widths and alphabets."""
    for q in (2, 21, 31):
        for N in (53, 128, 384, 512, 1024, 3000):
            tile_b, k = distance._plan_asym(N, q)
            if k < 2:
                continue
            Np = -(-max(N, 128) // 128) * 128
            assert tile_b % 8 == 0
            use = (k * tile_b * Np * q + (q + 4) * tile_b * Np
                   + 4 * k * tile_b * tile_b + (k + 1) * tile_b * Np)
            assert use <= int(13.5 * 2 ** 20)


def test_dispatch_asym(monkeypatch):
    monkeypatch.setenv("GDCA_DISTANCE_IMPL", "asym")
    from gaussdca_tpu.ops import dispatch
    ks = dispatch.kernels()
    assert ks["row_stats_fn"] is distance.row_stats_asym_pallas
    assert ks["match_counts_fn"] is distance.match_counts_pallas


@pytest.mark.parametrize("theta", [0.2, "auto"])
def test_streaming_weights_asym_kernel(theta):
    rng = np.random.default_rng(13)
    Z = jnp.asarray(rng.integers(1, 22, size=(310, 29), dtype=np.int8))
    W0, Meff0, th0 = reweight.compute_weights(Z, theta)
    W1, Meff1, th1 = reweight.compute_weights_streaming(
        Z, theta, 21,
        lambda z, t, q: distance.row_stats_asym_pallas(
            z, t, q, tile_b=16, k=3, interpret=True))
    np.testing.assert_allclose(np.asarray(W1), np.asarray(W0), rtol=1e-12)
    np.testing.assert_allclose(float(Meff1), float(Meff0), rtol=1e-12)
    np.testing.assert_allclose(float(th1), float(th0), rtol=1e-12)


def test_match_counts_auto_plan_wide_alignment():
    """tile_m=0 (the default) must consult _plan_tiles: at Np=2048/q=21
    the full-unroll one-hot temporaries of the old fixed tile=256 would
    blow the 16 MB scoped-VMEM budget — the auto plan drops to the
    rolled loop (unroll=False) with a wider tile and stays exact."""
    from gaussdca_tpu.ops.distance import _plan_tiles

    tile, unroll = _plan_tiles(2048, 21)
    assert not unroll  # the plan must leave full unroll at this width
    rng = np.random.default_rng(7)
    Z = jnp.asarray(rng.integers(1, 22, size=(12, 2048), dtype=np.int8))
    want = np.asarray(reweight.match_counts(Z))
    got = np.asarray(distance.match_counts_pallas(Z, 21, interpret=True))
    np.testing.assert_array_equal(got, want)
