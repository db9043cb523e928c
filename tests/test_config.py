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
