"""Unit tests for the chunking helpers."""

import jax.numpy as jnp
import numpy as np

from gaussdca_tpu.utils.chunked import balanced_chunk, map_rows


def test_balanced_chunk():
    # below the cap: whole thing in one chunk
    assert balanced_chunk(100, 128) == 100
    assert balanced_chunk(1, 128) == 1
    # ceil-split: 79800 over 65536 -> 2 chunks of ~39900, 128-aligned
    c = balanced_chunk(79800, 65536, align=128)
    assert c % 128 == 0
    n_chunks = -(-79800 // c)
    assert n_chunks == 2
    # waste is bounded by one alignment unit per chunk
    assert n_chunks * c - 79800 < n_chunks * 128
    # exact multiples split cleanly
    assert balanced_chunk(2048, 1024) == 1024


def test_map_rows_prefers_divisor_chunks():
    # n_rows=1000, chunk=16 -> falls back to a divisor (8) so no padded
    # copy of the input is made; result identical to direct vmap
    x = jnp.arange(1000 * 3, dtype=jnp.float64).reshape(1000, 3)
    got = np.asarray(map_rows(lambda r: r.sum(), x, 1000, chunk=16))
    np.testing.assert_allclose(got, np.asarray(x).sum(1))


def test_map_rows_padding_path():
    # prime row count: no divisor <= chunk except 1; padding path used
    x = jnp.arange(97 * 2, dtype=jnp.float64).reshape(97, 2)
    got = np.asarray(map_rows(lambda r: r[0] - r[1], x, 97, chunk=16))
    np.testing.assert_allclose(got, np.asarray(x)[:, 0] - np.asarray(x)[:, 1])


def test_map_rows_prime_rows_keep_reasonable_chunk():
    """Prime row counts must NOT degrade the chunk to 1 (401-step loops);
    the padded path with the original chunk is used instead."""
    x = jnp.arange(401 * 2, dtype=jnp.float64).reshape(401, 2)
    got = np.asarray(map_rows(lambda r: r.sum(), x, 401, chunk=16))
    np.testing.assert_allclose(got, np.asarray(x).sum(1))
