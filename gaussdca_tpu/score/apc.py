"""Average-Product Correction.

Exact reimplementation of the reference's ``correct_APC``
(/root/reference/src/GaussDCA.jl:78-86): with Si the column sums, Sj the
row sums and Sa = sum(S) * (1 - 1/N),  ``S -= (Sj Si) / Sa``. Applied to
both score types (src/GaussDCA.jl:42). Assumes S symmetric with zero
diagonal (then this equals the standard APC  S_ij - mean_i mean_j / mean).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def correct_apc(S: jax.Array, n_true=None) -> jax.Array:
    """APC; ``n_true`` (traced) is the real position count when S carries
    N-bucket padding — pad rows/cols are exactly zero, so only the
    1 - 1/N normalization needs the true N."""
    N = S.shape[0] if n_true is None else jnp.asarray(n_true, S.dtype)
    Si = jnp.sum(S, axis=0, keepdims=True)   # [1, N]
    Sj = jnp.sum(S, axis=1, keepdims=True)   # [N, 1]
    Sa = jnp.sum(S) * (1.0 - 1.0 / N)
    # identically-zero scores (e.g. q=2, where the zero-sum gauge
    # annihilates the single reduced coupling) would make this 0/0
    safe = jnp.where(Sa == 0, 1.0, Sa)
    return S - (Sj * Si) / safe
