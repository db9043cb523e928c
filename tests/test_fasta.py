"""MSA ingest: parsing, letter mapping, gap filter, dedup, insert states."""

import gzip
import os

import numpy as np
import pytest

from gaussdca_tpu.io import fasta


def write_fasta(tmp_path, records, gz=False, name="t.fasta"):
    path = os.path.join(tmp_path, name + (".gz" if gz else ""))
    text = "".join(f">{h}\n{s}\n" for h, s in records)
    if gz:
        with gzip.open(path, "wt") as fh:
            fh.write(text)
    else:
        with open(path, "w") as fh:
            fh.write(text)
    return path


def test_letter_mapping(tmp_path):
    path = write_fasta(tmp_path, [("s1", "ACDEFGHIKLMNPQRSTVWY-BXZ")])
    msa = fasta.read_fasta_alignment(path, 1.0)
    expected = list(range(1, 21)) + [21, 21, 21, 21]
    assert msa.tokens.tolist() == [expected]
    assert msa.q == 21


def test_multiline_and_gzip(tmp_path):
    recs = [("a", "ACDE\nFGHI".replace("\n", "")), ("b", "ACDEFGHI")]
    # line-wrapped sequence
    path = os.path.join(tmp_path, "w.fasta.gz")
    with gzip.open(path, "wt") as fh:
        fh.write(">a\nACDE\nFGHI\n>b\nACDEFGHI\n")
    msa = fasta.read_fasta_alignment(path, 1.0)
    assert msa.M == 2 and msa.N == 8
    np.testing.assert_array_equal(msa.tokens[0], msa.tokens[1])


def test_gap_filter_boundary_inclusive(tmp_path):
    # 2 gaps / 4 cols = 0.5 exactly: kept at threshold 0.5, dropped below.
    path = write_fasta(tmp_path, [("ok", "ACDE"), ("half", "AC--"),
                                  ("allgap", "----")])
    msa = fasta.read_fasta_alignment(path, 0.5)
    assert msa.M == 2 and msa.n_dropped_gaps == 1
    msa = fasta.read_fasta_alignment(path, 0.49)
    assert msa.M == 1 and msa.n_dropped_gaps == 2


def test_insert_states_removed(tmp_path):
    path = write_fasta(tmp_path, [("a", "AC.deFG"), ("b", "ACFGxy.")])
    msa = fasta.read_fasta_alignment(path, 1.0)
    assert msa.N == 4
    assert msa.tokens.shape == (2, 4)
    np.testing.assert_array_equal(msa.tokens[0], msa.tokens[1])


def test_ragged_raises(tmp_path):
    path = write_fasta(tmp_path, [("a", "ACDE"), ("b", "ACD")])
    with pytest.raises(ValueError, match="inconsistent"):
        fasta.read_fasta_alignment(path, 1.0)


def test_dedup_keeps_first_occurrence_order(tmp_path):
    path = write_fasta(tmp_path, [("a", "ACDE"), ("b", "ACDF"),
                                  ("c", "ACDE"), ("d", "ACDG"),
                                  ("e", "ACDF")])
    msa = fasta.read_fasta_alignment(path, 1.0)
    out = fasta.remove_duplicate_sequences(msa)
    assert out.M == 3
    assert out.headers == ["a", "b", "d"]
    assert out.n_dropped_dups == 2


def test_small_golden_shapes(golden_dir):
    msa = fasta.read_fasta_alignment(
        os.path.join(golden_dir, "small.fasta.gz"), 0.9)
    assert (msa.M, msa.N, msa.q) == (106, 53, 21)
    dd = fasta.remove_duplicate_sequences(msa)
    assert dd.M == 98


def test_large_golden_gap_filter(golden_dir):
    msa = fasta.read_fasta_alignment(
        os.path.join(golden_dir, "large.fasta.gz"), 0.9)
    # 5 of 102 sequences exceed 0.9 gap fraction (incl. all-gap rows).
    assert (msa.M, msa.N) == (97, 400)
    assert msa.n_dropped_gaps == 5
