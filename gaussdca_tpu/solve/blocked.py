"""Mesh-blocked Cholesky factorization + distributed SPD inverse.

The reference's L5 is a single LAPACK ``inv(cholesky(C))`` on one host
(/root/reference/src/GaussDCA.jl:34). XLA likewise has no distributed
Cholesky: under pjit the dense solve replicates, so for N*s >> 10^3 the
O((Ns)^3) solve becomes the single-chip bottleneck of an otherwise
sharded pipeline (SURVEY.md section 7.4). This module distributes it:

- ``blocked_cholesky``: right-looking blocked factorization, unrolled
  over a static block grid. Per step: factor the diagonal block
  (replicated — O(b^3), negligible), triangular-solve the panel, and
  rank-b-update the trailing matrix. The trailing update is where the
  FLOPs are ((Ns)^3/3 total); its rows are sharding-constrained over the
  mesh so GSPMD turns it into local matmuls + an all-gather of the b-wide
  panel per step.
- ``spd_inverse_blocked``: the inverse via two triangular solves against
  the identity, column-sharded with ``shard_map`` over ALL mesh axes —
  embarrassingly parallel (L is replicated after factorization; each
  device solves only its own identity columns), no communication inside.

Numerics: bitwise-deterministic per mesh shape; agrees with the
replicated ``spd_inverse`` to factorization round-off (f64 ~1e-13 rel;
validated in tests/test_blocked_solve.py).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pad_spd(A: jax.Array, npad: int) -> jax.Array:
    """Embed A in the top-left of an npad-square SPD matrix (identity
    tail): block-diag([A, I]) factors/inverts blockwise, so the result's
    top-left corner is exactly chol(A) / inv(A)."""
    n = A.shape[0]
    if npad == n:
        return A
    out = jnp.zeros((npad, npad), A.dtype)
    out = out.at[:n, :n].set(A)
    return out.at[jnp.arange(n, npad), jnp.arange(n, npad)].set(1.0)


def blocked_cholesky(A: jax.Array, *, block: int = 1024,
                     mesh: Optional[Mesh] = None,
                     axes: Optional[Sequence[str]] = None) -> jax.Array:
    """Lower Cholesky factor of SPD ``A`` via right-looking block steps.

    Traceable (the block loop is unrolled over a static grid — keep
    ``n/block`` modest, <= ~32). With ``mesh``, the trailing-matrix
    rank-b updates are sharded over ``axes`` (default: all mesh axes).
    """
    n = A.shape[0]
    npad = _round_up(n, block)
    nb = npad // block
    T = _pad_spd(A, npad)

    spec = None
    if mesh is not None:
        names = tuple(axes) if axes is not None else tuple(mesh.axis_names)
        spec = jax.sharding.NamedSharding(mesh, P(names, None))

    cols = []
    for k in range(nb):
        Akk = T[:block, :block]
        Lkk = jnp.linalg.cholesky(0.5 * (Akk + Akk.T))
        rest = T[block:, :block]                       # [r - b, b]
        # panel = rest @ inv(Lkk)^T
        panel = solve_triangular(Lkk, rest.T, lower=True).T
        colk = jnp.concatenate([
            jnp.zeros((k * block, block), A.dtype), Lkk, panel], axis=0)
        cols.append(colk)
        if k + 1 < nb:
            T = T[block:, block:] - panel @ panel.T
            if spec is not None:
                T = jax.lax.with_sharding_constraint(T, spec)

    L = jnp.concatenate(cols, axis=1)
    return jnp.tril(L)[:n, :n]


def tri_inverse_apply(L: jax.Array, *, mesh: Optional[Mesh] = None,
                      axes: Optional[Sequence[str]] = None,
                      rhs_chunk: int = 2048) -> jax.Array:
    """inv(A) from its Cholesky factor: solve L L^T X = I.

    With a mesh, the identity's columns are sharded over ``axes`` (default
    all axes) via shard_map — each device runs local triangular solves
    against its own column slab, lax.map-chunked by ``rhs_chunk`` columns
    to bound the TRSM's internal live set (see
    solve/cholesky.chunked_cho_inverse); zero communication.
    """
    n = L.shape[0]

    def solve_cols(Lf, eye_cols):
        ncols = eye_cols.shape[1]
        if ncols <= rhs_chunk:
            y = solve_triangular(Lf, eye_cols, lower=True)
            return solve_triangular(Lf.T, y, lower=False)
        pad = (-ncols) % rhs_chunk
        ec = jnp.pad(eye_cols, ((0, 0), (0, pad)))
        blocks = jnp.moveaxis(ec.reshape(n, -1, rhs_chunk), 1, 0)

        def one(eb):
            y = solve_triangular(Lf, eb, lower=True)
            return solve_triangular(Lf.T, y, lower=False)

        X = jax.lax.map(one, blocks)              # [nb, n, rhs_chunk]
        return jnp.moveaxis(X, 0, 1).reshape(n, -1)[:, :ncols]

    if mesh is None:
        inv = solve_cols(L, jnp.eye(n, dtype=L.dtype))
        return 0.5 * (inv + inv.T)

    names = tuple(axes) if axes is not None else tuple(mesh.axis_names)
    nshards = 1
    for a in names:
        nshards *= mesh.shape[a]
    npad = _round_up(n, nshards)
    eye = jnp.eye(n, npad, dtype=L.dtype)     # padded cols solve to zeros
    inv = shard_map(
        solve_cols, mesh=mesh,
        in_specs=(P(), P(None, names)),
        out_specs=P(None, names),
    )(L, eye)
    inv = inv[:, :n] if npad != n else inv
    return 0.5 * (inv + inv.T)


def spd_inverse_blocked(C: jax.Array, *, block: int = 1024,
                        mesh: Optional[Mesh] = None,
                        axes: Optional[Sequence[str]] = None,
                        refine_iters: Optional[int] = None) -> jax.Array:
    """Distributed inverse of an SPD matrix (drop-in for ``spd_inverse``).

    Applies the same dtype-default Newton refinement as ``spd_inverse``
    (1 step in f32 — load-bearing for DI accuracy, see solve/cholesky.py);
    with a mesh the refinement matmuls are row-sharded over it.
    """
    from gaussdca_tpu.solve.cholesky import newton_refine

    L = blocked_cholesky(C, block=block, mesh=mesh, axes=axes)
    X = tri_inverse_apply(L, mesh=mesh, axes=axes)
    if refine_iters is None:
        refine_iters = 0 if C.dtype == jnp.float64 else 1
    if refine_iters:
        constrain = None
        if mesh is not None:
            names = tuple(axes) if axes is not None else \
                tuple(mesh.axis_names)
            spec = jax.sharding.NamedSharding(mesh, P(names, None))
            constrain = lambda x: jax.lax.with_sharding_constraint(x, spec)
        X = newton_refine(C, X, refine_iters, constrain=constrain)
    return X
