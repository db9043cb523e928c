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


def newton_refine(C: jax.Array, X: jax.Array, iters: int,
                  constrain=None) -> jax.Array:
    """Newton iterative refinement of an approximate inverse X of C.

    ``constrain`` (optional) is applied to each matmul product — the
    mesh-sharded caller passes a sharding-constraint function so the
    refinement matmuls distribute (solve/blocked.py).
    """
    p = jax.lax.Precision.HIGHEST
    n = C.shape[0]
    diag = jnp.arange(n)
    ident = constrain if constrain is not None else (lambda x: x)
    for _ in range(iters):
        # R = I - C X without materializing the identity (Ns^2 buffers
        # are the single-chip HBM bound at wide N)
        R = -ident(jnp.matmul(C, X, precision=p))
        R = R.at[diag, diag].add(1.0)
        X = X + ident(jnp.matmul(X, R, precision=p))
        X = (X + X.T) * 0.5
    return X


def chunked_cho_inverse(L: jax.Array, rhs_chunk: int) -> jax.Array:
    """inv from a Cholesky factor, solving ``rhs_chunk`` identity columns
    per lax.map step.

    XLA's TPU TriangularSolve keeps every internal block-step buffer
    live (~n/128 copies of the full RHS): a one-shot n x n solve at
    n = 20000 wants ~117 GB of HBM. Chunking the RHS bounds the live
    set at ~(n/128) * n * rhs_chunk * 4 bytes.
    """
    n = L.shape[0]
    nc = -(-n // rhs_chunk)

    def step(k, X):
        cols = k * rhs_chunk + jnp.arange(rhs_chunk)
        E = (jnp.arange(n)[:, None] == cols[None, :]).astype(L.dtype)
        xk = cho_solve((L, True), E)
        # in-place carry update: one [n, n] result buffer, no
        # stack-then-transpose copies
        return jax.lax.dynamic_update_slice(X, xk, (0, k * rhs_chunk))

    X0 = jnp.zeros((n, nc * rhs_chunk), L.dtype)
    X = jax.lax.fori_loop(0, nc, step, X0)
    return X[:, :n]


# above this size the one-shot TRSM exceeds single-chip HBM (see
# chunked_cho_inverse); 8000 (the large-golden width) still fits easily
_CHUNKED_SOLVE_MIN = 8192


def spd_inverse(C: jax.Array, *, refine_iters: int = None,
                rhs_chunk: int = 0) -> jax.Array:
    """Inverse of a symmetric positive-definite matrix via Cholesky.

    ``refine_iters=None`` picks the dtype default: 1 Newton step in f32
    (TPU), 0 in f64 (CPU golden mode, already at working precision).
    ``rhs_chunk=0`` auto-selects: one-shot solve below 8192, chunked
    identity columns above (HBM bound, see ``chunked_cho_inverse``).

    The factorization/solve run at DEFAULT matmul precision even under
    an ambient "highest" context: measured on-chip, multi-pass chol/TRSM
    is ~35x slower and gives the SAME residual — the f32 accuracy comes
    from the HIGHEST-precision Newton refinement (and the HIGHEST
    statistics einsums upstream), not from the factorization passes.
    f64 (CPU) is unaffected (precision contexts are f32-only).
    """
    n = C.shape[0]
    if refine_iters is None:
        refine_iters = 0 if C.dtype == jnp.float64 else 1
    fact_prec = "highest" if (C.dtype == jnp.float64 or not refine_iters) \
        else "default"
    with jax.default_matmul_precision(fact_prec):
        L = jnp.linalg.cholesky(C)
        if rhs_chunk == 0:
            rhs_chunk = 512 if n > _CHUNKED_SOLVE_MIN else n
        if rhs_chunk >= n:
            inv = cho_solve((L, True), jnp.eye(n, dtype=C.dtype))
        else:
            inv = chunked_cho_inverse(L, rhs_chunk)
    if refine_iters:
        # refine symmetrizes at the end of each step; skipping the
        # pre-symmetrization saves a live Ns^2 buffer at the peak
        return newton_refine(C, inv, refine_iters)
    return (inv + inv.T) * 0.5
