"""Pseudocount shrinkage and covariance assembly.

Implements DCAUtils ``add_pseudocount`` as consumed at
/root/reference/src/GaussDCA.jl:30 and ``compute_C`` (src/GaussDCA.jl:76):

- ``Pi = (1-pc) * Pi_true + pc/q``
- off-diagonal site blocks: ``Pij = (1-pc) * Pij_true + pc/q^2``
- diagonal site blocks:     ``Pij = (1-pc) * Pij_true + delta_ab * pc/q``
- ``C = Pij - Pi Pi^T``  (dimension N*s with s = q-1)

All elementwise — XLA fuses the whole stage into the covariance assembly.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def add_pseudocount(Pi_true: jax.Array, Pij_true: jax.Array,
                    pc, q: int) -> Tuple[jax.Array, jax.Array]:
    dtype = Pi_true.dtype
    pc = jnp.asarray(pc, dtype)
    s = q - 1
    Ns = Pi_true.shape[0]
    pcq = pc / q

    Pi = (1 - pc) * Pi_true + pcq

    site = jnp.arange(Ns) // s
    same_site = site[:, None] == site[None, :]
    Pij = (1 - pc) * Pij_true + jnp.where(same_site, 0.0, pcq / q)
    Pij = Pij + pcq * jnp.eye(Ns, dtype=dtype)
    return Pi, Pij


def compute_C(Pi: jax.Array, Pij: jax.Array) -> jax.Array:
    """Covariance C = Pij - Pi Pi^T (src/GaussDCA.jl:76)."""
    return Pij - jnp.outer(Pi, Pi)
