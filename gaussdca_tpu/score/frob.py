"""Frobenius-norm coupling scores.

Implements the contract of DCAUtils ``compute_FN(mJ, q)`` as consumed at
/root/reference/src/GaussDCA.jl:39: for each position pair (i, j) take the
s x s block J_ij of the coupling matrix mJ (s = q - 1), move it to the
zero-sum gauge, and score the pair by the Frobenius norm of the gauged
block. Output is the symmetric N x N score matrix with zero diagonal
(APC at src/GaussDCA.jl:42 assumes it).

Gauge convention (pinned against the golden file small.FNRout.txt, which
fixes every constant to ~8 significant digits): means are taken over the
s x s reduced block itself — with R_a = sum_b J_ab, Cl_b = sum_a J_ab,
T = sum_ab J_ab:

  K_ab = J_ab - R_a/s - Cl_b/s + T/s^2 ;   FN_ij = ||K||_F over s x s.

(The alternative q-extended-gauge convention was tested against the golden
file and rejected.) Computed row-chunked (see utils/chunked.py) so peak
memory is O(chunk * N * s^2), not O((N*s)^2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gaussdca_tpu.utils.chunked import map_rows


def _fn_row(Jrow: jax.Array, q: int) -> jax.Array:
    """Frobenius scores of one row of blocks. Jrow: [s, N, s] -> [N]."""
    s = q - 1
    Jb = jnp.transpose(Jrow, (1, 0, 2))  # [N, s, s]
    rm = jnp.mean(Jb, axis=2)            # [N, s] row means
    cm = jnp.mean(Jb, axis=1)            # [N, s] col means
    mm = jnp.mean(rm, axis=1)            # [N] grand mean
    K = Jb - rm[:, :, None] - cm[:, None, :] + mm[:, None, None]
    return jnp.sqrt(jnp.sum(K * K, axis=(1, 2)))


def frob_score(mJ: jax.Array, q: int, *, row_chunk: int = 16) -> jax.Array:
    """S [N, N]: zero-sum-gauge Frobenius norm per position pair."""
    s = q - 1
    Ns = mJ.shape[0]
    N = Ns // s
    J4 = mJ.reshape(N, s, N, s)
    S = map_rows(lambda row: _fn_row(row, q), J4, N, chunk=row_chunk)
    S = S * (1.0 - jnp.eye(N, dtype=mJ.dtype))
    return S
