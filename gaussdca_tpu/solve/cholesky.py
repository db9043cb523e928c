"""SPD inverse of the covariance via Cholesky.

The reference's L5 is ``mJ = inv(cholesky(C))`` (/root/reference/src/
GaussDCA.jl:34) — LAPACK dpotrf + dpotri on the dense N*s square matrix.
Here: ``jnp.linalg.cholesky`` + triangular solves against the identity,
which XLA lowers to its native blocked TPU factorization/TRSM. The result
is symmetrized (dpotri fills one triangle and mirrors it; cho_solve's
round-off asymmetry is ~ulp but the score stages read both triangles).

In f32 (the TPU dtype) the Cholesky error amplifies with cond(C) —
visible in the DI scores at small pseudocounts. ``refine_iters`` runs
Newton's iteration X <- X(2I - CX) after the factorization: each step
costs two (Ns)^3 matmuls (HIGHEST precision) and roughly squares the
residual, recovering most of the f64 accuracy without f64 hardware
support. f64 (CPU golden mode) needs no refinement.

A mesh-sharded blocked factorization for N*s >> 10^3 lives in
solve/blocked.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.linalg import cho_solve


def newton_refine(C: jax.Array, X: jax.Array, iters: int) -> jax.Array:
    """Newton iterative refinement of an approximate inverse X of C."""
    eye = jnp.eye(C.shape[0], dtype=C.dtype)
    p = jax.lax.Precision.HIGHEST
    for _ in range(iters):
        R = eye - jnp.matmul(C, X, precision=p)
        X = X + jnp.matmul(X, R, precision=p)
        X = (X + X.T) * 0.5
    return X


def spd_inverse(C: jax.Array, *, refine_iters: int = None) -> jax.Array:
    """Inverse of a symmetric positive-definite matrix via Cholesky.

    ``refine_iters=None`` picks the dtype default: 1 Newton step in f32
    (TPU), 0 in f64 (CPU golden mode, already at working precision).
    """
    L = jnp.linalg.cholesky(C)
    eye = jnp.eye(C.shape[0], dtype=C.dtype)
    inv = cho_solve((L, True), eye)
    inv = (inv + inv.T) * 0.5
    if refine_iters is None:
        refine_iters = 0 if C.dtype == jnp.float64 else 1
    return newton_refine(C, inv, refine_iters)
