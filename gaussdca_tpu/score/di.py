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
          = 1/2 * logdet( (I + sqrtm(G)) / 2 ),   G = I + 4 rho rho^T,
            rho = L_i^T J_ij L_j,  C_ii = L_i L_i^T (Cholesky)

(`rho rho^T` is similar to ``C_ii J C_jj J^T`` — same spectrum as the
symmetric-sqrt sandwich, but Cholesky is direct and robust).

TPU-native realization — no eigendecomposition (TPU has no native eigh,
and XLA's iterative f64 eigh proved non-robust on exactly these
degenerate spectra), and no batched tiny Cholesky in the hot loop (XLA's
[P, s, s] cholesky is ~30x slower than the equivalent matmuls on TPU):

1. all P = N(N-1)/2 pairs are processed as one flat batch (chunked by
   ``pair_chunk`` via lax.map to bound memory at O(chunk * s^2)),
2. ``sqrtm(G)`` by the trace-scaled Newton–Schulz coupled iteration —
   pure batched matmuls, quadratically convergent, with a convergence-
   monitored while_loop (f64 reaches ~1e-13; validated against the golden
   DI files),
3. one batched Cholesky at the end for ``logdet((I + sqrtm(G))/2)`` (the
   argument is SPD with spectrum >= 1 — perfectly conditioned).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _batch_eye(s: int, shape, dtype):
    return jnp.broadcast_to(jnp.eye(s, dtype=dtype), tuple(shape) + (s, s))


def sqrtm_spd(A: jax.Array, *, tol: float = None,
              max_iters: int = 40) -> jax.Array:
    """Principal square root of a batch [..., s, s] of SPD matrices.

    Trace-scaled Newton–Schulz: with A' = A/c (c = trace, so the spectrum
    of A' lies in (0, 1]), iterate
        T = (3I - Z Y) / 2 ;  Y <- Y T ;  Z <- T Z
    Y -> sqrt(A'), Z -> sqrt(A')^{-1}; matmuls only. The loop exits when
    mean((ZY - I)^2) falls below ``tol`` (dtype-dependent default) or at
    ``max_iters`` (trace scaling needs ~log_2.25(s * cond) + 6 steps).
    """
    s = A.shape[-1]
    dtype = A.dtype
    if tol is None:
        tol = 1e-26 if dtype == jnp.float64 else 1e-12
    c = jnp.trace(A, axis1=-2, axis2=-1)[..., None, None]
    Ap = A / c
    eye = _batch_eye(s, A.shape[:-2], dtype)

    def cond(state):
        _, _, err, k = state
        return jnp.logical_and(err > tol, k < max_iters)

    def body(state):
        Y, Z, _, k = state
        ZY = jnp.einsum("...ij,...jk->...ik", Z, Y)
        T = 0.5 * (3.0 * eye - ZY)
        Y2 = jnp.einsum("...ij,...jk->...ik", Y, T)
        Z2 = jnp.einsum("...ij,...jk->...ik", T, Z)
        err = jnp.mean((ZY - eye) ** 2)
        return Y2, Z2, err, k + 1

    Y, _, _, _ = jax.lax.while_loop(
        cond, body, (Ap, eye, jnp.asarray(jnp.inf, dtype), 0))
    return Y * jnp.sqrt(c)


def _chol_logdet(A: jax.Array) -> jax.Array:
    """logdet of a batch of SPD matrices via the Cholesky diagonal."""
    L = jnp.linalg.cholesky(A)
    diag = jnp.diagonal(L, axis1=-2, axis2=-1)
    return 2.0 * jnp.sum(jnp.log(diag), axis=-1)


def site_cholesky(C: jax.Array, q: int) -> jax.Array:
    """Cholesky factor of every diagonal site block C_ii: [N, s, s]."""
    s = q - 1
    Ns = C.shape[0]
    N = Ns // s
    C4 = C.reshape(N, s, N, s)
    Cii = jnp.einsum("iaib->iab", C4)
    return jnp.linalg.cholesky(Cii)


def _sqrtm_fused(G: jax.Array, refine_steps: int = 2) -> jax.Array:
    """sqrt(G) via the fused Pallas NS kernel (ops/di_kernel.py).

    The kernel runs a FIXED number of HIGHEST-precision iterations (the
    jnp ``sqrtm_spd`` fallback instead monitors convergence, up to 40);
    ``refine_steps`` extra coupled NS steps outside the kernel are
    convergence insurance for ill-conditioned blocks that need more than
    the in-kernel budget. Validated against the golden DI files
    (max abs err 9.6e-5, identical to the fallback path).
    """
    from gaussdca_tpu.ops.di_kernel import ns_sqrtm_pallas

    s = G.shape[-1]
    Y, Z, c = ns_sqrtm_pallas(G)
    eye = _batch_eye(s, G.shape[:-2], G.dtype)
    p = jax.lax.Precision.HIGHEST
    for _ in range(refine_steps):
        T = 1.5 * eye - 0.5 * jnp.einsum("pij,pjk->pik", Z, Y, precision=p)
        Y = jnp.einsum("pij,pjk->pik", Y, T, precision=p)
        Z = jnp.einsum("pij,pjk->pik", T, Z, precision=p)
    return Y * jnp.sqrt(c.astype(G.dtype))


def _di_pairs(Jb: jax.Array, Li: jax.Array, Lj: jax.Array,
              use_pallas: bool = False) -> jax.Array:
    """DI of a flat batch of pairs. Jb, Li, Lj: [P, s, s] -> [P]."""
    s = Jb.shape[-1]
    rho = jnp.einsum("pba,pbc,pcd->pad", Li, Jb, Lj)
    G = jnp.einsum("pab,pcb->pac", rho, rho)
    G = 4.0 * G + _batch_eye(s, G.shape[:-2], G.dtype)
    if use_pallas and G.dtype == jnp.float32:
        S = _sqrtm_fused(G)
    else:
        S = sqrtm_spd(G)
    half = 0.5 * (S + _batch_eye(s, S.shape[:-2], S.dtype))
    # exact symmetry guard for the final Cholesky
    half = 0.5 * (half + jnp.swapaxes(half, -1, -2))
    return 0.5 * _chol_logdet(half)


def di_pairs_flat(Jb: jax.Array, Li: jax.Array, Lj: jax.Array,
                  *, pair_chunk: int = 65536,
                  use_pallas: bool = False) -> jax.Array:
    """DI of a flat batch of coupling blocks: [P, s, s] x3 -> [P].

    The chunked core shared by ``di_score`` and the multi-chip sharded
    pipeline (each device calls this on its own pair slab — the pair
    batch is embarrassingly parallel, zero communication). ``pair_chunk``
    bounds the live set at O(chunk * s^2) via lax.map.
    """
    P = Jb.shape[0]
    s = Jb.shape[-1]
    if P <= pair_chunk:
        return _di_pairs(Jb, Li, Lj, use_pallas)
    # balance the chunks: ceil-split P over the minimum chunk count
    # (lane-aligned) instead of padding the tail to a full pair_chunk
    # — at N=400 naive padding would compute 64% extra pairs
    from gaussdca_tpu.utils.chunked import balanced_chunk
    chunk = balanced_chunk(P, pair_chunk, align=128)
    pad = (-P) % chunk

    def padz(x):
        return jnp.concatenate(
            [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)

    blocks = jax.tree_util.tree_map(
        lambda x: padz(x).reshape(-1, chunk, s, s), (Jb, Li, Lj))
    return jax.lax.map(lambda a: _di_pairs(*a, use_pallas),
                       blocks).reshape(-1)[:P]


def di_score(mJ: jax.Array, C: jax.Array, q: int,
             *, pair_chunk: int = 65536,
             use_pallas: bool = None) -> jax.Array:
    """S [N, N]: Gaussian direct information per position pair.

    ``use_pallas=False`` forces the jnp sqrtm. Otherwise the fused
    NS-sqrtm kernel engages only when GDCA_DI_FUSED is truthy ("1",
    "true", "yes") AND a TPU backend is active. Default OFF even on TPU:
    it is only ~10% faster end-to-end but costs ~67 s of Mosaic compile
    per shape class — a bad trade for batch mode. Note the env var is
    read at TRACE time: set it before the first DI call of a shape class
    (later changes won't affect already-compiled programs).
    """
    if use_pallas is not False:
        import os
        from gaussdca_tpu.ops.dispatch import _on_tpu
        env = os.environ.get("GDCA_DI_FUSED", "").lower()
        use_pallas = env in ("1", "true", "yes") and _on_tpu()
    s = q - 1
    Ns = mJ.shape[0]
    N = Ns // s
    J4 = mJ.reshape(N, s, N, s)
    Lsite = site_cholesky(C, q)

    iu, ju = np.triu_indices(N, k=1)
    P = iu.size
    Jb = J4[iu, :, ju, :]
    Li = Lsite[iu]
    Lj = Lsite[ju]

    di = di_pairs_flat(Jb, Li, Lj, pair_chunk=pair_chunk,
                       use_pallas=use_pallas)

    S = jnp.zeros((N, N), mJ.dtype)
    S = S.at[iu, ju].set(di)
    S = S.at[ju, iu].set(di)
    return S
