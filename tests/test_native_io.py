"""Native C++ FASTA parser vs the NumPy reference parser (exact parity).

Mirrors the reference's optimized-vs-fallback cross-validation pattern
(/root/reference/test/runtests.jl:78-86) at the ingest layer.
"""

import gzip
import os

import numpy as np
import pytest

from gaussdca_tpu.io import fasta, native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native parser unavailable (no g++/zlib)")


def _parity(path, mgf):
    a = fasta.read_fasta_alignment(path, mgf, use_native=True)
    b = fasta.read_fasta_alignment(path, mgf, use_native=False)
    np.testing.assert_array_equal(a.tokens, b.tokens)
    assert a.headers == b.headers
    assert a.q == b.q
    assert a.n_dropped_gaps == b.n_dropped_gaps


@pytest.mark.parametrize("name,mgf", [
    ("small.fasta.gz", 0.9), ("small.fasta.gz", 0.8),
    ("large.fasta.gz", 0.9), ("large.fasta.gz", 1.0),
])
def test_parity_on_reference_data(golden_dir, name, mgf):
    _parity(os.path.join(golden_dir, name), mgf)


def test_parity_ragged_error(tmp_path):
    text = (">s1\nACDEF\n>s2\nACDEFG\n")
    p = tmp_path / "ragged.fasta"
    p.write_text(text)
    for un in (True, False):
        with pytest.raises(ValueError, match="inconsistent"):
            fasta.read_fasta_alignment(str(p), 0.9, use_native=un)


def test_parity_synthetic(tmp_path):
    # Exercises: multi-line sequences, insert states (lowercase + '.'),
    # CRLF endings, blank lines, header whitespace, non-standard letters
    # (Z -> gap state), a gap-heavy sequence, plain and gzipped input.
    # All sequences are length 10 after insert removal.
    good = (">s1/1-10 desc here\r\n"
            "ACDEF.xy\nGHIKL\n"      # inserts ., x, y -> ACDEFGHIKL
            "\n"
            ">s2\n"
            "MNPQRSTVWY\n"
            ">s3\n"
            "--------AB\n"           # gap fraction 0.8
            ">s4\n"
            "ZZZZZZZZZZ\n")          # all non-standard -> state 21
    for gz in (False, True):
        p2 = tmp_path / ("good.fasta" + (".gz" if gz else ""))
        if gz:
            with gzip.open(p2, "wt") as fh:
                fh.write(good)
        else:
            p2.write_text(good)
        for mgf in (0.9, 0.8, 0.5, 1.0):   # 0.8 hits the inclusive boundary
            _parity(str(p2), mgf)


def test_parity_errors(tmp_path):
    cases = {
        "noheader.fasta": "ACDEF\n>s1\nACDEF\n",
        "empty.fasta": "",
        "headeronly.fasta": ">s1\n>s2\nACD\n",
    }
    for name, text in cases.items():
        p = tmp_path / name
        p.write_text(text)
        err_native = err_np = None
        try:
            fasta.read_fasta_alignment(str(p), 0.9, use_native=True)
        except ValueError as e:
            err_native = str(e)
        try:
            fasta.read_fasta_alignment(str(p), 0.9, use_native=False)
        except ValueError as e:
            err_np = str(e)
        assert err_native is not None and err_np is not None, name


def test_all_dropped_error(tmp_path):
    p = tmp_path / "allgap.fasta"
    p.write_text(">a\n-----\n>b\n-----\n")
    for un in (True, False):
        with pytest.raises(ValueError, match="max_gap_fraction"):
            fasta.read_fasta_alignment(str(p), 0.5, use_native=un)
