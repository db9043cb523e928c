"""Storage-sharded SPD inverse: no device ever holds a full matrix.

The reference's L5 is a one-line replicated LAPACK inverse
(/root/reference/src/GaussDCA.jl:34). The mesh-blocked path in
solve/blocked.py distributes the trailing-update *compute* but keeps C,
L, and the inverse replicated per device, so per-device HBM still caps
N*s exactly as on one chip. This module removes that cap: every stage —
factorization, triangular inversion, the Gram product, and Newton
refinement — runs inside one ``shard_map`` on 1-D row-sharded slabs of
``[n/ndev, n]``, so per-device memory is O(n^2/ndev + n*b).

Design (all collectives explicit; GSPMD never sees a full-matrix op it
could replicate):

- layout: device r of d holds rows [r*w, (r+1)*w) of every matrix
  (w = npad/d). npad pads n up so that the factorization block b divides
  w (identity tail — block-diag([C, I]) factors/inverts blockwise, so
  the top-left corner is exactly inv(C)).
- ``_chol_local``: right-looking blocked Cholesky. Per step k: all
  devices all-gather the current b-wide column block (the only
  communication, npad*b per step), redundantly factor the b x b
  diagonal block and form the panel, keep their own rows, and apply the
  rank-b trailing update to their local slab. Rows above the pivot are
  zeroed in the panel so already-factored rows are never touched
  (bounded junk, exact L on exit).
- ``_tri_inv_local``: W = inv(L) by block-row forward substitution.
  Per step i: psum-broadcast L's block row from its owner, contract it
  against the locally-held rows of W (rows >= i*b are still zero, so no
  masking is needed), psum the partial products, and let the owner
  solve the b x b triangular system and keep the row.
- ``_syrk_local``: X = W^T W by broadcasting one device's W slab per
  step (psum of a masked slab — a broadcast with psum cost) and
  accumulating [w, (s+1)*w] partials; W's triangularity statically
  truncates each step's columns.
- ``_newton_local``: the f32 Newton refinement X <- X + X(I - C X)
  with the same broadcast-matmul pattern — residual at HIGHEST,
  correction at DEFAULT, mirroring solve/cholesky.newton_refine — plus
  a broadcast transpose for the per-step symmetrization.

Numerics: f64 agrees with the replicated ``spd_inverse`` to
factorization round-off (~1e-13 rel); f32 relies on the Newton step for
accuracy exactly like the single-chip doubling path (the factorization
matmuls run at HIGH — 3-pass bf16 ~ f32 — because a 1-pass-bf16 start
is unrecoverable on ill-conditioned covariances; see
solve/cholesky._spd_inverse_doubling). Validated against the replicated
path and NumPy in tests/test_distributed_solve.py, including a
compiled-memory-analysis assertion that per-device footprint scales as
1/ndev.

Known inefficiency (documented, not accidental): each device updates
all w of its local rows every step, including rows already factored
(their panel entries are zeroed, so the update is a no-op add of 0) —
a 3x flop overhead over the ideal npad^3/(3*ndev). A block-cyclic row
permutation with super-steps would make the active row set shrink
statically; left for a measured follow-up since the solve is Newton-
dominated in f32 anyway.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.scipy.linalg import solve_triangular
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_HIGH = jax.lax.Precision.HIGH
_HIGHEST = jax.lax.Precision.HIGHEST
_DEFAULT = jax.lax.Precision.DEFAULT


def plan_padding(n: int, ndev: int, block: int) -> Tuple[int, int, int]:
    """(npad, w, b): pad n to ndev*w with b | w and b <= block."""
    w0 = -(-n // ndev)
    b = max(1, min(block, w0))
    w = -(-w0 // b) * b
    return ndev * w, w, b


def _flat_index(names: Sequence[str], sizes: Sequence[int]):
    """Flattened device index matching P((a1, a2), ...) row-major order."""
    idx = jnp.int32(0)
    for name, size in zip(names, sizes):
        idx = idx * size + jax.lax.axis_index(name)
    # default int dtype so dynamic_slice start tuples are homogeneous
    # (Python-int starts become int64 under jax_enable_x64)
    return idx.astype(jnp.result_type(int))


def _bcast(x, aidx, src: int, names):
    """Broadcast device ``src``'s value of x to all devices (psum of a
    masked slab — all other contributions are zero)."""
    return jax.lax.psum(jnp.where(aidx == src, x, jnp.zeros_like(x)),
                        names)


def _chol_local(A, aidx, *, npad: int, w: int, b: int, names, prec):
    """My rows of L = chol(C) from my rows of C. A: [w, npad]."""
    nb = npad // b
    eye_b = jnp.eye(b, dtype=A.dtype)
    for k in range(nb):
        kb = k * b
        colk = A[:, kb:kb + b]                               # [w, b]
        col_full = jax.lax.all_gather(colk, names, axis=0,
                                      tiled=True)            # [npad, b]
        Akk = col_full[kb:kb + b]
        Lkk = jnp.linalg.cholesky(0.5 * (Akk + Akk.T))
        Winv = solve_triangular(Lkk, eye_b, lower=True)      # inv(Lkk)
        parts = [jnp.zeros((kb, b), A.dtype), Lkk]
        if kb + b < npad:
            below = col_full[kb + b:]
            # panel = A[below, k-block] @ inv(Lkk)^T, replicated (cheap:
            # npad*b^2); rows above the pivot are zero so the trailing
            # update never touches factored rows
            parts.append(jnp.matmul(below, Winv.T, precision=prec))
        Lcol = jnp.concatenate(parts, axis=0)                # [npad, b]
        mine = jax.lax.dynamic_slice(Lcol, (aidx * w, 0), (w, b))
        A = A.at[:, kb:kb + b].set(mine)
        if kb + b < npad:
            upd = jnp.matmul(mine, Lcol[kb + b:].T, precision=prec)
            A = A.at[:, kb + b:].add(-upd)
    return A


def _tri_inv_local(L, aidx, *, npad: int, w: int, b: int, names, prec):
    """My rows of W = inv(L) from row-sharded lower-triangular L."""
    nb = npad // b
    W = jnp.zeros((w, npad), L.dtype)
    eye_b = jnp.eye(b, dtype=L.dtype)
    for i in range(nb):
        ib = i * b
        # block row L[ib:ib+b, :] lives on exactly one device (b | w)
        own = (aidx * w <= ib) & (ib < aidx * w + w)
        off = jnp.clip(ib - aidx * w, 0, w - b)
        Lrow = jax.lax.dynamic_slice(L, (off, 0), (b, npad))
        Lrow = jnp.where(own, Lrow, jnp.zeros_like(Lrow))
        Lrow = jax.lax.psum(Lrow, names)                     # [b, npad]
        Lii = Lrow[:, ib:ib + b]
        if i:
            # W rows >= ib are still zero, so the local contraction
            # needs no row masking; W's triangularity bounds cols at ib
            Lmine = jax.lax.dynamic_slice(Lrow, (0, aidx * w), (b, w))
            part = jnp.matmul(Lmine, W[:, :ib], precision=prec)
            S = jax.lax.psum(part, names)                    # [b, ib]
            rhs = jnp.concatenate([-S, eye_b], axis=1)
        else:
            rhs = eye_b
        Wrow = solve_triangular(Lii, rhs, lower=True)        # [b, ib+b]
        Wrow = jnp.pad(Wrow, ((0, 0), (0, npad - ib - b)))
        upd = jax.lax.dynamic_update_slice(W, Wrow, (off, 0))
        W = jnp.where(own, upd, W)
    return W


def _syrk_local(W, aidx, *, npad: int, w: int, ndev: int, names, prec):
    """My rows of X = W^T W from row-sharded lower-triangular W."""
    X = jnp.zeros((w, npad), W.dtype)
    for src in range(ndev):
        Ws = _bcast(W, aidx, src, names)                     # [w, npad]
        hi = (src + 1) * w
        # cols of Ws at my output-row range; W rows src*w..hi have
        # nonzero cols only up to hi (lower triangular)
        Wsc = jax.lax.dynamic_slice(Ws, (0, aidx * w), (w, w))
        part = jnp.matmul(Wsc.T, Ws[:, :hi], precision=prec)
        X = X.at[:, :hi].add(part)
    return X


def _transpose_local(X, aidx, *, w: int, ndev: int, names):
    """My rows of X^T from row-sharded X (broadcast transpose)."""
    Xt = jnp.zeros_like(X)
    for src in range(ndev):
        Xs = _bcast(X, aidx, src, names)
        blk = jax.lax.dynamic_slice(Xs, (0, aidx * w), (w, w))
        Xt = jax.lax.dynamic_update_slice(Xt, blk.T, (0, src * w))
    return Xt


def _newton_local(C, X, aidx, *, npad: int, w: int, ndev: int, names,
                  iters: int):
    """Row-sharded Newton refinement X <- X + X (I - C X), symmetrized.

    Residual at HIGHEST, correction at DEFAULT — the accuracy split
    measured in solve/cholesky.newton_refine."""
    rows_g = aidx * w + jnp.arange(w)
    eye_mine = (rows_g[:, None] == jnp.arange(npad)[None, :]).astype(
        C.dtype)
    for _ in range(iters):
        R = eye_mine
        for src in range(ndev):
            Xs = _bcast(X, aidx, src, names)
            R = R - jnp.matmul(C[:, src * w:(src + 1) * w], Xs,
                               precision=_HIGHEST)
        D = jnp.zeros_like(X)
        for src in range(ndev):
            Rs = _bcast(R, aidx, src, names)
            D = D + jnp.matmul(X[:, src * w:(src + 1) * w], Rs,
                               precision=_DEFAULT)
        X = X + D
        X = 0.5 * (X + _transpose_local(X, aidx, w=w, ndev=ndev,
                                        names=names))
    return X


def spd_inverse_dist(C: jax.Array, *, mesh: Mesh, block: int = 1024,
                     axes: Optional[Sequence[str]] = None,
                     refine_iters: Optional[int] = None) -> jax.Array:
    """Storage-sharded drop-in for ``spd_inverse``: per-device memory
    O(n^2/ndev + n*block); the result stays row-sharded over ``axes``
    (default: all mesh axes).

    ``refine_iters=None`` picks the dtype default (1 Newton step in
    f32, 0 in f64), matching ``spd_inverse``.
    """
    names = tuple(axes) if axes is not None else tuple(mesh.axis_names)
    sizes = tuple(int(mesh.shape[a]) for a in names)
    ndev = int(np.prod(sizes))
    n = C.shape[0]
    npad, w, b = plan_padding(n, ndev, block)
    if refine_iters is None:
        refine_iters = 0 if C.dtype == jnp.float64 else 1
    rs = NamedSharding(mesh, P(names, None))

    if npad != n:
        Cp = jnp.zeros((npad, npad), C.dtype)
        Cp = Cp.at[:n, :n].set(C)
        Cp = Cp.at[jnp.arange(n, npad), jnp.arange(n, npad)].set(1.0)
    else:
        Cp = C
    Cp = jax.lax.with_sharding_constraint(Cp, rs)

    def local(Cl):
        aidx = _flat_index(names, sizes)
        L = _chol_local(Cl, aidx, npad=npad, w=w, b=b, names=names,
                        prec=_HIGH)
        W = _tri_inv_local(L, aidx, npad=npad, w=w, b=b, names=names,
                           prec=_HIGH)
        X = _syrk_local(W, aidx, npad=npad, w=w, ndev=ndev, names=names,
                        prec=_HIGH)
        if refine_iters:
            X = _newton_local(Cl, X, aidx, npad=npad, w=w, ndev=ndev,
                              names=names, iters=refine_iters)
        else:
            X = 0.5 * (X + _transpose_local(X, aidx, w=w, ndev=ndev,
                                            names=names))
        return X

    X = shard_map(local, mesh=mesh, in_specs=P(names, None),
                  out_specs=P(names, None), check_vma=False)(Cp)
    if npad != n:
        # no re-constraint on the sliced result: n need not divide the
        # device count; downstream constraints decide its layout
        X = X[:n, :n]
    return X
