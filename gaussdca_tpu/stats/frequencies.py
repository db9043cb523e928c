"""Weighted one- and two-site frequency statistics.

Implements the frequency stage of DCAUtils ``compute_weighted_frequencies``
as consumed at /root/reference/src/GaussDCA.jl:28 and by ``compute_C``
(src/GaussDCA.jl:76):

- states run over the reduced alphabet ``1..s`` with ``s = q - 1`` — the
  highest state (the gap, for standard data) is the gauge and is dropped,
- ``Pi[(i*s + a)] = sum_m W[m] * 1[Z[m,i] == a+1] / Meff``  (0-based),
- ``Pij[(i*s+a), (j*s+b)] = sum_m W[m] * 1[Z[m,i]==a+1] * 1[Z[m,j]==b+1] / Meff``
  for i != j, and the i == j diagonal blocks equal ``diag(Pi_i)``.

TPU-first design: both statistics are a single MXU matmul over the one-hot
expansion E [M, N*s] (zero row for the gauge state):
``Pi = W @ E / Meff`` and ``Pij = E^T diag(W) E / Meff``. The one-hot
product reproduces the diagonal blocks exactly (1[Z=a]*1[Z=b] = delta_ab),
so no fixup pass is needed. Under data-parallel sharding of M this becomes
a psum-reduced local matmul (parallel/sharded.py).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def one_hot_reduced(Z: jax.Array, q: int, dtype) -> jax.Array:
    """One-hot over states 1..q-1 (state q -> zero row): [M, N*(q-1)]."""
    s = q - 1
    M, N = Z.shape
    states = jnp.arange(1, q, dtype=Z.dtype)
    E = (Z[:, :, None] == states[None, None, :]).astype(dtype)
    return E.reshape(M, N * s)


def weighted_frequencies(
    Z: jax.Array,
    W: jax.Array,
    q: int,
    *,
    dtype=jnp.float64,
    precision=jax.lax.Precision.HIGHEST,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(Pi_true [N*s], Pij_true [N*s, N*s], Meff) from tokens and weights."""
    E = one_hot_reduced(Z, q, dtype)
    W = W.astype(dtype)
    Meff = jnp.sum(W)
    Pi = jnp.einsum("m,mx->x", W, E, precision=precision) / Meff
    Pij = jnp.einsum("mx,my->xy", E * W[:, None], E,
                     precision=precision) / Meff
    return Pi, Pij, Meff
