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
