"""Gaussian Direct Information scores.

Implements the contract of DCAUtils ``compute_DI_gauss(mJ, C, q)`` as
consumed at /root/reference/src/GaussDCA.jl:37: for each position pair
(i, j), the DI is the mutual information of the two-site Gaussian "direct"
model whose precision matrix is ``[[A_i, J_ij], [J_ij^T, B_j]]`` with A_i,
B_j chosen so that the model's single-site marginal covariances match the
empirical (pseudocounted) C_ii and C_jj (Baldassi et al. 2014, PLoS ONE
9(3):e92721, Methods).

Closed form (derived from the coupled fixed point
``A = C_ii^-1 + J B^-1 J^T``, ``B = C_jj^-1 + J^T A^-1 J``; validated to
~1e-8 against the golden files small.DIRout*.txt / large.DIRout.txt): with
``lam_k`` the eigenvalues of ``C_ii J_ij C_jj J_ij^T``,

    DI_ij = 1/2 * sum_k log( (1 + sqrt(1 + 4 lam_k)) / 2 )

TPU-native realization — NO eigendecomposition anywhere (TPU has no native
eigh, and XLA's iterative f64 eigh proved non-robust on exactly these
degenerate spectra):

1. ``rho = L_i^T J_ij L_j`` with ``L`` the site Cholesky factors
   (``rho rho^T`` is similar to ``C_ii J C_jj J^T`` — same eigenvalues as
   the symmetric-sqrt sandwich, but Cholesky is direct and robust),
2. ``sum_k log((1 + sqrt(1 + 4 lam_k))/2) = logdet((I + sqrtm(B))/2)`` with
   ``B = I + 4 rho rho^T`` (SPD, spectrum >= 1),
3. ``sqrtm(B)`` by the determinant-scaled Denman–Beavers iteration —
   batched s x s matmuls + Cholesky inverses, quadratically convergent,
4. the final logdet via the Cholesky diagonal.

Everything batches over pairs with vmap and is row-chunked
(utils/chunked.py) so peak memory is O(chunk * N * s^2).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from gaussdca_tpu.utils.chunked import map_rows

_DB_ITERS = 14


def _chol_logdet(A: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(cholesky(A), logdet(A)) for a batch [..., s, s] of SPD matrices."""
    L = jnp.linalg.cholesky(A)
    diag = jnp.diagonal(L, axis1=-2, axis2=-1)
    return L, 2.0 * jnp.sum(jnp.log(diag), axis=-1)


def _chol_inverse(A: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(A^{-1}, logdet A) for a batch of SPD matrices, via Cholesky."""
    L, logdet = _chol_logdet(A)
    eye = jnp.broadcast_to(jnp.eye(A.shape[-1], dtype=A.dtype), A.shape)
    Linv = jax.lax.linalg.triangular_solve(
        L, eye, left_side=True, lower=True)
    inv = jnp.einsum("...ki,...kj->...ij", Linv, Linv)
    return inv, logdet


def sqrtm_spd(A: jax.Array, iters: int = _DB_ITERS) -> jax.Array:
    """Principal square root of a batch of SPD matrices.

    Determinant-scaled Denman–Beavers iteration (Higham, "Functions of
    Matrices", alg. 6.15): Y -> sqrt(A), Z -> sqrt(A)^{-1} via
        mu = |det Y * det Z|^{-1/(2s)}
        Y' = (mu Y + (mu Z)^{-1}) / 2,   Z' = (mu Z + (mu Y)^{-1}) / 2
    Quadratically convergent; the scaling makes the iteration count
    essentially condition-independent (14 doubles are enough for f64 at
    cond(A) up to ~1e12). Only matmuls and Cholesky solves — MXU-friendly
    and robust where iterative eigendecompositions are not.
    """
    s = A.shape[-1]

    def body(_, carry):
        Y, Z = carry
        Yi, ldY = _chol_inverse(Y)
        Zi, ldZ = _chol_inverse(Z)
        mu = jnp.exp(-(ldY + ldZ) / (2.0 * s))[..., None, None]
        Y2 = 0.5 * (mu * Y + Zi / mu)
        Z2 = 0.5 * (mu * Z + Yi / mu)
        # keep exact symmetry (guards the Cholesky calls downstream)
        Y2 = 0.5 * (Y2 + jnp.swapaxes(Y2, -1, -2))
        Z2 = 0.5 * (Z2 + jnp.swapaxes(Z2, -1, -2))
        return Y2, Z2

    eye = jnp.broadcast_to(jnp.eye(s, dtype=A.dtype), A.shape)
    Y, _ = jax.lax.fori_loop(0, iters, body, (A, eye))
    return Y


def site_cholesky(C: jax.Array, q: int) -> jax.Array:
    """Cholesky factor of every diagonal site block C_ii: [N, s, s]."""
    s = q - 1
    Ns = C.shape[0]
    N = Ns // s
    C4 = C.reshape(N, s, N, s)
    Cii = jnp.einsum("iaib->iab", C4)
    return jnp.linalg.cholesky(Cii)


def _di_row(args: Tuple[jax.Array, jax.Array], Lsite: jax.Array,
            q: int) -> jax.Array:
    """DI of row i against all j. args = (Jrow [s, N, s], L_i [s, s])."""
    Jrow, L_i = args
    s = q - 1
    # rho_j = L_i^T @ J_ij @ L_j for all j: [N, s, s]
    t = jnp.einsum("ba,bjc->jac", L_i, Jrow)
    rho = jnp.einsum("jac,jcd->jad", t, Lsite)
    B = jnp.einsum("jab,jcb->jac", rho, rho)  # rho rho^T, PSD
    B = 4.0 * B + jnp.eye(s, dtype=rho.dtype)
    S = sqrtm_spd(B)
    half = 0.5 * (S + jnp.eye(s, dtype=rho.dtype))
    _, logdet = _chol_logdet(half)
    return 0.5 * logdet


def di_score(mJ: jax.Array, C: jax.Array, q: int,
             *, row_chunk: int = 16) -> jax.Array:
    """S [N, N]: Gaussian direct information per position pair."""
    s = q - 1
    Ns = mJ.shape[0]
    N = Ns // s
    J4 = mJ.reshape(N, s, N, s)
    Lsite = site_cholesky(C, q)
    S = map_rows(lambda a: _di_row(a, Lsite, q), (J4, Lsite), N,
                 chunk=row_chunk)
    S = S * (1.0 - jnp.eye(N, dtype=mJ.dtype))
    return S
