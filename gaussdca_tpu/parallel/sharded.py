"""Multi-chip sharded gDCA pipeline (pjit / GSPMD).

Scale-out design (new — the reference is single-process, SURVEY.md 2.9):

- sequences (M) are DATA-parallel: the one-hot expansion, all-pairs
  identity matmul, weights, and the frequency-matmul contraction are
  sharded over the ``data`` mesh axis; GSPMD turns the contractions over
  M into local matmuls + reduce-scatter/all-reduce over ICI,
- the N*s statistical dimension is MODEL-parallel: two-site frequencies,
  pseudocount/covariance assembly, coupling blocks and per-pair scores are
  row-sharded over the ``model`` axis,
- the dense Cholesky solve replicates below ``solve_min_dim`` (XLA has no
  distributed Cholesky) and switches to the mesh-blocked factorization +
  column-sharded triangular solves of solve/blocked.py above it.

Everything is one jitted program; collectives are inserted by XLA from
sharding constraints, never hand-written.
"""

from __future__ import annotations

import functools
from typing import Union

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gaussdca_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
from gaussdca_tpu.score.apc import correct_apc
from gaussdca_tpu.score.di import di_score
from gaussdca_tpu.score.frob import _fn_row
from gaussdca_tpu.solve.blocked import spd_inverse_blocked
from gaussdca_tpu.solve.cholesky import spd_inverse
from gaussdca_tpu.stats import reweight
from gaussdca_tpu.stats.frequencies import one_hot_reduced
from gaussdca_tpu.stats.pseudocount import add_pseudocount, compute_C


def _constrain(x, spec):
    return jax.lax.with_sharding_constraint(x, spec)


def sharded_scores_fn(mesh: Mesh, *, q: int, score: str,
                      theta_is_auto: bool, dtype, m_true: int = None,
                      solve_min_dim: int = 4096, solve_block: int = 1024):
    """Build the jitted sharded pipeline for a fixed mesh/config.

    Returns ``fn(Z, pc, theta_value) -> (S, theta, Meff)`` with Z expected
    row-sharded over the ``data`` axis (any layout works — GSPMD will
    reshard as declared). ``m_true`` is the unpadded sequence count when Z
    carries token-0 padding rows (they match no state, so their only
    footprint — a spurious unit weight — is masked out here).
    ``solve_min_dim``: N*s at or above which the covariance inverse uses
    the mesh-blocked distributed solve instead of the replicated one.
    """
    data2 = NamedSharding(mesh, P(DATA_AXIS, None))
    data1 = NamedSharding(mesh, P(DATA_AXIS))
    model2 = NamedSharding(mesh, P(MODEL_AXIS, None))
    repl = NamedSharding(mesh, P())

    def fn(Z, pc, theta_value):
        # HIGHEST matmul precision throughout: the TPU f32 default is
        # single-pass bf16, which costs ~3 digits through the solve.
        with jax.default_matmul_precision("highest"):
            return _fn_body(Z, pc, theta_value)

    def _fn_body(Z, pc, theta_value):
        M, N = Z.shape
        Mt = M if m_true is None else m_true

        # --- reweighting: DP over sequences ------------------------------
        states = jnp.arange(1, q + 1, dtype=Z.dtype)
        E_full = (Z[:, :, None] == states).astype(dtype).reshape(M, N * q)
        E_full = _constrain(E_full, data2)
        # contraction over N*q: local matmul per data shard of rows
        D = _constrain(
            jnp.einsum("ak,bk->ab", E_full, E_full,
                       preferred_element_type=dtype),
            data2)
        if theta_is_auto:
            # padded rows contribute no matches (incl. their diagonal), so
            # only the pair count needs the true M
            total = jnp.sum(D, dtype=dtype) - Mt * N
            mfi = (total / 2.0) / (N * (Mt * (Mt - 1) / 2.0))
            th = jnp.minimum(jnp.asarray(0.5, dtype),
                             reweight.AUTO_THETA_COEFF / mfi)
        else:
            th = jnp.asarray(theta_value, dtype)
        W, _ = reweight.weights_from_matches(D, N, th, dtype)
        if m_true is not None and m_true != M:
            W = W * (jnp.arange(M) < m_true).astype(dtype)
        Meff = jnp.sum(W)
        W = _constrain(W, data1)

        # --- weighted frequencies: contraction over sharded M ------------
        s = q - 1
        E = one_hot_reduced(Z, q, dtype)
        E = _constrain(E, data2)
        Pi = jnp.einsum("m,mx->x", W, E) / Meff          # psum over data
        Pij = _constrain(
            jnp.einsum("mx,my->xy", E * W[:, None], E) / Meff,
            model2)                                       # rows over model

        # --- pseudocount + covariance: model-sharded elementwise ---------
        Pi, Pij = add_pseudocount(Pi, Pij, pc, q)
        C = _constrain(compute_C(Pi, Pij), model2)

        # --- solve: replicated below the threshold, mesh-blocked above ---
        Crep = _constrain(C, repl)
        Ns = C.shape[0]
        if Ns >= solve_min_dim:
            blk = min(solve_block, Ns)
            mJ = spd_inverse_blocked(Crep, block=blk, mesh=mesh)
        else:
            mJ = spd_inverse(Crep)

        # --- scores: rows sharded over model ------------------------------
        J4 = _constrain(mJ.reshape(N, s, N, s),
                        NamedSharding(mesh, P(MODEL_AXIS, None, None, None)))
        if score == "DI":
            S = di_score(mJ, Crep, q)
        else:
            S = jax.vmap(lambda row: _fn_row(row, q))(J4)
            S = S * (1.0 - jnp.eye(N, dtype=dtype))
        S = correct_apc(S)
        return _constrain(S, repl), th, Meff

    return jax.jit(
        fn,
        in_shardings=(data2, repl, repl),
        out_shardings=(repl, repl, repl),
    )


def run_sharded(mesh: Mesh, Z, pc: float, theta: Union[str, float], *,
                q: int, score: str = "frob", dtype=jnp.float32,
                solve_min_dim: int = 4096, solve_block: int = 1024):
    """Convenience wrapper: pad/place Z on the mesh and run one step."""
    theta_is_auto = isinstance(theta, str)
    Z = jnp.asarray(Z)
    M = Z.shape[0]
    dp = mesh.shape[DATA_AXIS]
    Mp = -(-M // dp) * dp
    fn = sharded_scores_fn(mesh, q=q, score=score,
                           theta_is_auto=theta_is_auto, dtype=dtype,
                           m_true=M if Mp != M else None,
                           solve_min_dim=solve_min_dim,
                           solve_block=solve_block)
    if Mp != M:
        Z = jnp.concatenate(
            [Z, jnp.zeros((Mp - M, Z.shape[1]), Z.dtype)], axis=0)
    Zs = jax.device_put(Z, NamedSharding(mesh, P(DATA_AXIS, None)))
    pc_a = jnp.asarray(pc, dtype)
    th_a = jnp.asarray(0.0 if theta_is_auto else float(theta), dtype)
    return fn(Zs, pc_a, th_a)
