"""Pseudocount shrinkage and covariance assembly.

Implements DCAUtils ``add_pseudocount`` as consumed at
/root/reference/src/GaussDCA.jl:30 and ``compute_C`` (src/GaussDCA.jl:76):

- ``Pi = (1-pc) * Pi_true + pc/q``
- off-diagonal site blocks: ``Pij = (1-pc) * Pij_true + pc/q^2``
- diagonal site blocks:     ``Pij = (1-pc) * Pij_true + delta_ab * pc/q``
- ``C = Pij - Pi Pi^T``  (dimension N*s with s = q-1)

All elementwise — XLA fuses the whole stage into the covariance assembly.

N-bucketed batch mode (``n_true`` < N, a traced scalar): positions
>= n_true are token-0 padding whose true frequencies are exactly zero.
The pseudocount is applied to REAL positions only and the padding block
of C is set to the identity, decoupled from the real block — so C is
block-diagonal [[C_real, 0], [0, I]], its Cholesky/inverse preserve the
structure exactly, pad couplings are exactly zero, and the real-block
scores are bit-wise independent of the bucket width (up to summation
order). One compiled program then serves every family in an
(M-bucket, N-bucket) shape class.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def add_pseudocount(Pi_true: jax.Array, Pij_true: jax.Array,
                    pc, q: int, n_true=None) -> Tuple[jax.Array, jax.Array]:
    dtype = Pi_true.dtype
    pc = jnp.asarray(pc, dtype)
    s = q - 1
    Ns = Pi_true.shape[0]
    pcq = pc / q

    site = jnp.arange(Ns) // s
    if n_true is None:
        real1 = None
        Pi = (1 - pc) * Pi_true + pcq
    else:
        real1 = (site < jnp.asarray(n_true)).astype(dtype)
        Pi = ((1 - pc) * Pi_true + pcq) * real1

    same_site = site[:, None] == site[None, :]
    Pij = (1 - pc) * Pij_true + jnp.where(same_site, 0.0, pcq / q)
    Pij = Pij + pcq * jnp.eye(Ns, dtype=dtype)
    if real1 is not None:
        Pij = Pij * (real1[:, None] * real1[None, :])
    return Pi, Pij


def compute_C(Pi: jax.Array, Pij: jax.Array,
              n_true=None, q: Optional[int] = None) -> jax.Array:
    """Covariance C = Pij - Pi Pi^T (src/GaussDCA.jl:76).

    With ``n_true`` (+ static q), padding positions get identity diagonal
    blocks so C stays SPD and block-diagonal (see module docstring).
    """
    C = Pij - jnp.outer(Pi, Pi)
    if n_true is not None:
        s = q - 1
        Ns = C.shape[0]
        site = jnp.arange(Ns) // s
        padmask = (site >= jnp.asarray(n_true)).astype(C.dtype)
        C = C + jnp.diag(padmask)
    return C
