"""Config validation parity with the reference's check_arguments
(/root/reference/src/GaussDCA.jl:49-65)."""

import pytest

from gaussdca_tpu import GDCAConfig


def test_defaults_match_reference():
    cfg = GDCAConfig()
    assert cfg.pseudocount == 0.8
    assert cfg.theta == "auto"
    assert cfg.max_gap_fraction == 0.9
    assert cfg.score == "frob"
    assert cfg.min_separation == 5
    assert cfg.remove_dups is False


@pytest.mark.parametrize("kwargs", [
    dict(pseudocount=-0.1),
    dict(pseudocount=1.5),
    dict(theta=-0.2),
    dict(theta=2.0),
    dict(theta="automatic"),
    dict(max_gap_fraction=-0.5),
    dict(max_gap_fraction=1.01),
    dict(score="frobenius"),
    dict(score="di"),
    dict(min_separation=0),
    dict(min_separation=-3),
])
def test_invalid_arguments_raise(kwargs):
    with pytest.raises(ValueError):
        GDCAConfig(**kwargs)


@pytest.mark.parametrize("kwargs", [
    dict(pseudocount=0.0),
    dict(pseudocount=1.0),
    dict(theta=0.0),
    dict(theta=1.0),
    dict(theta="auto"),
    dict(max_gap_fraction=0.0),
    dict(max_gap_fraction=1.0),
    dict(score="DI"),
    dict(min_separation=1),
])
def test_boundary_arguments_accepted(kwargs):
    GDCAConfig(**kwargs)


def test_missing_file_raises():
    from gaussdca_tpu import gdca
    with pytest.raises(ValueError, match="cannot open file"):
        gdca("/nonexistent/path/foo.fasta")


def test_q_limit_rejected():
    """q >= 32 must error like the reference (src/GaussDCA.jl:25-26)."""
    import numpy as np
    import pytest
    from gaussdca_tpu import api
    from gaussdca_tpu.core.config import GDCAConfig
    from gaussdca_tpu.io.fasta import MSA

    Z = np.full((4, 6), 32, dtype=np.uint8)
    msa = MSA(tokens=Z, headers=list("abcd"), q=32)
    with pytest.raises(ValueError, match="too big"):
        api.gdca_from_msa(msa, GDCAConfig())


def test_q31_boundary_runs():
    """q = 31 (the 5-bit packing limit) must work through the kernels'
    fallbacks and the full pipeline."""
    import numpy as np
    from gaussdca_tpu import api
    from gaussdca_tpu.core.config import GDCAConfig
    from gaussdca_tpu.io.fasta import MSA

    rng = np.random.default_rng(0)
    Z = rng.integers(1, 32, size=(40, 12), dtype=np.uint8)
    Z[0, 0] = 31  # pin q
    msa = MSA(tokens=Z, headers=[f"s{i}" for i in range(40)], q=31)
    r = api.gdca_from_msa(msa, GDCAConfig(theta=0.3, pseudocount=0.5))
    assert len(r) == (12 - 5) * (12 - 5 + 1) // 2
    assert all(np.isfinite(s) for _, _, s in r.ranking)


def test_degenerate_alignments():
    """Tiny / pathological MSAs must run or fail with clear errors."""
    import numpy as np
    import pytest
    from gaussdca_tpu import api
    from gaussdca_tpu.core.config import GDCAConfig
    from gaussdca_tpu.io.fasta import MSA

    def run(Z, q, **kw):
        msa = MSA(tokens=np.asarray(Z, np.uint8),
                  headers=[f"s{i}" for i in range(len(Z))], q=q)
        return api.gdca_from_msa(msa, GDCAConfig(**kw))

    # single sequence: uniform weight, pseudocount keeps C SPD
    r = run(np.tile([1, 2, 3, 4, 5, 6, 7, 8], (1, 1)), 8, theta=0.2,
            pseudocount=0.5, min_separation=1)
    assert len(r) == 8 * 7 // 2 and r.meff == 1.0

    # two identical sequences, auto-theta: mfi=1 -> theta=0.1216.
    # at N=8 the threshold floors to 0 -> no neighbors -> Meff=2
    Z = np.tile(np.arange(1, 9, dtype=np.uint8), (2, 1))
    r = run(Z, 8, pseudocount=0.5, min_separation=1)
    assert r.theta == pytest.approx(0.1216) and r.meff == 2.0
    # at N=16 the threshold is 1 -> each counts its twin -> W=1/2 each
    Z = np.tile(np.arange(1, 17, dtype=np.uint8) % 8 + 1, (2, 1))
    r = run(Z, 8, pseudocount=0.5, min_separation=1)
    assert r.meff == 1.0

    # single-state alignment: no reduced alphabet
    with pytest.raises(ValueError, match="at least 2"):
        run(np.ones((4, 6)), 1, pseudocount=0.5)


def test_singular_covariance_raises_not_nan():
    """pc=0 with M << N*s makes C singular: the reference dies with a
    PosDefException from inv(cholesky(C)) (src/GaussDCA.jl:34); this
    pipeline must raise a clear error rather than emit an all-NaN
    ranking (NaN propagates to every score through APC)."""
    import numpy as np
    import pytest
    from gaussdca_tpu import api
    from gaussdca_tpu.core.config import GDCAConfig
    from gaussdca_tpu.io.fasta import MSA

    rng = np.random.default_rng(3)
    Z = rng.integers(1, 9, size=(6, 12)).astype(np.uint8)  # M=6, Ns=88
    msa = MSA(tokens=Z, headers=[f"s{i}" for i in range(6)], q=8)
    cfg = GDCAConfig(pseudocount=0.0, theta=0.2, min_separation=1)
    with pytest.raises(ArithmeticError, match="positive definite"):
        api.gdca_from_msa(msa, cfg)
    # the device-side top-k path (NaNs sort FIRST under lax.top_k's
    # descending total order) must catch it too
    with pytest.raises(ArithmeticError, match="positive definite"):
        api.gdca_from_msa(msa, cfg, top_k=5)
    # score=DI exercises the gemm-tail path (small P), whose
    # under-convergence nan_to_num must NOT sanitize solver-poisoned
    # inputs into a clean-looking all-zero ranking
    cfg_di = GDCAConfig(pseudocount=0.0, theta=0.2, min_separation=1,
                        score="DI")
    with pytest.raises(ArithmeticError, match="positive definite"):
        api.gdca_from_msa(msa, cfg_di)


def test_numpy_scalar_config_values():
    """np.float32/np.int64 values (a np.linspace parameter sweep) are
    valid reals for pseudocount/theta/max_gap_fraction/min_separation."""
    import numpy as np

    cfg = GDCAConfig(pseudocount=np.float32(0.2), theta=np.float64(0.3),
                     max_gap_fraction=np.float32(0.8),
                     min_separation=np.int64(4))
    cfg.validate()
    with pytest.raises(ValueError, match="pseudocount"):
        GDCAConfig(pseudocount=np.float32(1.5)).validate()
