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


def test_parity_multimember_gzip(tmp_path):
    """Concatenated gzip members are one logical stream (RFC 1952 §2.2;
    pigz/bgzip emit these). Pins the native libdeflate member loop —
    whose per-member ISIZE guess undershoots the total — against the
    NumPy parser (Python gzip also concatenates members)."""
    part1 = ">m1\nACDEFGHIKL\n>m2\nMNPQRSTVWY\n"
    part2 = ">m3\nAAAAAAAAAA\n"
    p = tmp_path / "multi.fasta.gz"
    blob = gzip.compress(part1.encode()) + gzip.compress(part2.encode())
    p.write_bytes(blob)
    msa = fasta.read_fasta_alignment(str(p), 0.9, use_native=True)
    assert msa.M == 3 and msa.headers == ["m1", "m2", "m3"]
    _parity(str(p), 0.9)


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


def test_differential_fuzz(tmp_path):
    """Random structured FASTA-ish inputs: both parsers must agree on
    success output or both must reject (messages may differ in detail)."""
    import numpy as np

    rng = np.random.default_rng(0)
    seq_alpha = list("ACDEFGHIKLMNPQRSTVWYXZB-")
    ins_alpha = list("acd.z")
    n_agree = 0
    for trial in range(60):
        width = int(rng.integers(3, 15))
        lines = []
        for _ in range(int(rng.integers(1, 6))):
            lines.append(">" + "".join(
                rng.choice(list("abc /1-9"), size=rng.integers(0, 8))))
            w = width
            if rng.random() < 0.15:               # corrupt: ragged length
                w = max(1, width + int(rng.integers(-2, 3)) or width)
            chars = list(rng.choice(seq_alpha, size=w))
            for _ in range(int(rng.integers(0, 4))):   # inserts (removed)
                chars.insert(int(rng.integers(0, len(chars) + 1)),
                             str(rng.choice(ins_alpha)))
            # split across 1-2 lines
            k = int(rng.integers(0, len(chars) + 1)) \
                if rng.random() < 0.4 else len(chars)
            lines.append("".join(chars[:k]))
            if k < len(chars):
                lines.append("".join(chars[k:]))
            if rng.random() < 0.2:
                lines.append("")                       # blank line
        if rng.random() < 0.1:
            lines.insert(0, "LEADINGJUNK")             # data before header
        text = ("\r\n" if rng.random() < 0.3 else "\n").join(lines)
        if rng.random() < 0.5:
            text += "\n"
        p = tmp_path / f"fuzz{trial}.fasta"
        p.write_text(text)
        mgf = float(rng.choice([0.5, 0.9, 1.0]))

        def run(un):
            try:
                m = fasta.read_fasta_alignment(str(p), mgf, use_native=un)
                return ("ok", m.tokens.tobytes(), tuple(m.headers), m.q,
                        m.n_dropped_gaps)
            except ValueError:
                return ("err",)

        a, b = run(True), run(False)
        if a[0] == "ok":
            assert a == b, f"trial {trial}: native={a[0]} numpy={b[0]}\n{text!r}"
            n_agree += 1
        else:
            assert b[0] == "err", f"trial {trial}: native rejected, " \
                                  f"numpy accepted\n{text!r}"
    assert n_agree >= 5  # the generator produces some valid files


def test_parity_nonascii_and_control_bytes(tmp_path):
    """Arbitrary bytes must tokenize identically in both parsers: a
    Latin-1 byte in a sequence maps to the gap state (21), a control
    byte at a line EDGE is trimmed (native trims every byte <= 0x20 —
    the old text-mode fallback either raised UnicodeDecodeError or kept
    \\x01 and reported a different width), and non-UTF-8 header bytes
    decode with replacement instead of raising."""
    p = tmp_path / "bytes.fasta"
    p.write_bytes(b">s1 caf\xe9\n"
                  b"\x01ACDEF\xe9KLMN\x02\n"   # edge \x01/\x02 trimmed
                  b">s2\n"
                  b"ACDEFGHKLM\n")             # same width: 10
    a = fasta.read_fasta_alignment(str(p), 0.9, use_native=True)
    b = fasta.read_fasta_alignment(str(p), 0.9, use_native=False)
    np.testing.assert_array_equal(a.tokens, b.tokens)
    assert a.headers == b.headers
    assert a.N == 10
    assert a.tokens[0, 5] == 21  # the \xe9 byte -> gap state


def test_parity_trailing_garbage_gzip(tmp_path):
    """A valid gzip member with trailing junk: the libdeflate fast path
    must fall back to zlib's tolerant reader (incl. when the junk makes
    the ISIZE guess absurd), matching the NumPy parser's gzip module."""
    p = tmp_path / "junk.fasta.gz"
    body = gzip.compress(b">s1\nACDEF\n>s2\nGHKLM\n")
    p.write_bytes(body + b"\xff\xff\xff\xff")
    _parity(str(p), 0.9)


def test_differential_fuzz_arbitrary_bytes(tmp_path):
    """Full-byte-range fuzz (headers and sequences drawn from 1..255):
    both parsers must agree exactly on success or both reject — pins
    the bytes-mode parity contract (edge trim of bytes <= 0x20, inserts
    removed, everything else -> states via the shared LUT)."""
    rng = np.random.default_rng(1)
    n_agree = 0
    for trial in range(40):
        width = int(rng.integers(3, 12))
        parts = []
        for _ in range(int(rng.integers(1, 5))):
            hdr = bytes(rng.integers(0x21, 256, size=int(
                rng.integers(0, 6))).astype(np.uint8).tolist())
            parts.append(b">" + hdr)
            w = width
            if rng.random() < 0.15:               # corrupt: ragged
                w = max(1, width + int(rng.integers(-2, 3)))
            seq = bytes(rng.integers(1, 256, size=w).astype(
                np.uint8).tolist())
            # keep the record structure: no embedded newlines/headers
            seq = seq.replace(b"\n", b"A").replace(b">", b"B")
            parts.append(seq)
        data = b"\n".join(parts) + (b"\n" if rng.random() < 0.5 else b"")
        p = tmp_path / f"bfuzz{trial}.fasta"
        p.write_bytes(data)
        mgf = float(rng.choice([0.5, 0.9, 1.0]))

        def run(un):
            try:
                m = fasta.read_fasta_alignment(str(p), mgf, use_native=un)
                return ("ok", m.tokens.tobytes(), tuple(m.headers), m.q,
                        m.n_dropped_gaps)
            except ValueError:
                return ("err",)

        a, b = run(True), run(False)
        assert a == b or (a[0] == "err" and b[0] == "err"), \
            f"trial {trial}: native={a[0]} numpy={b[0]}\n{data!r}"
        if a[0] == "ok":
            n_agree += 1
    assert n_agree >= 5
