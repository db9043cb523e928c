"""SPD inverse of the covariance via Cholesky.

The reference's L5 is ``mJ = inv(cholesky(C))`` (/root/reference/src/
GaussDCA.jl:34) — LAPACK dpotrf + dpotri on the dense N*s square matrix.
Here: ``jnp.linalg.cholesky`` + triangular solves against the identity,
which XLA lowers to its native blocked TPU factorization/TRSM. The result
is symmetrized (dpotri fills one triangle and mirrors it; cho_solve's
round-off asymmetry is ~ulp but the score stages read both triangles).

A mesh-sharded blocked factorization for N*s >> 10^3 lives in
solve/blocked.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.linalg import cho_solve


def spd_inverse(C: jax.Array) -> jax.Array:
    """Inverse of a symmetric positive-definite matrix via Cholesky."""
    L = jnp.linalg.cholesky(C)
    eye = jnp.eye(C.shape[0], dtype=C.dtype)
    inv = cho_solve((L, True), eye)
    return (inv + inv.T) * 0.5
