#!/usr/bin/env python
"""Diagnose the round-5 on-chip tiled/local storage-sharded DI
disagreement (chip_sessions/tpu_session_r5/di_shard1200_*.rc = 9).

Runs the EXACT preflight comparison from scripts/tpu_ab.py
leg_di_sharded (same synthetic inputs, same 1x1 mesh, HIGHEST matmul
precision) and, unlike the preflight, triangulates against the
golden-validated single-chip mapped formulation (score/di.
di_score_bm_mapped) on the SAME inputs — so a failure names the body
that is wrong instead of just flagging the pair. CPU at this config
agrees to max rel 6.6e-6 (round-5 session log), so any chip-side
excursion beyond ~1e-5 is chip-specific.

    python scripts/diag_sharded_chip.py [N] [q]
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp


def _hi(f):
    def g(*a):
        with jax.default_matmul_precision("highest"):
            return f(*a)
    return g


def stats(name, a, ref):
    d = np.abs(a - ref)
    am = np.abs(ref)
    sel = am > 1e-5
    rel = d[sel] / am[sel]
    print(f"{name}: max|d|={d.max():.3e} "
          f"(at |ref|~{am.flat[d.argmax()]:.3e}), "
          f"max rel={rel.max() if rel.size else float('nan'):.3e}, "
          f"n>tol={int((~np.isclose(a, ref, rtol=1e-4, atol=1e-5)).sum())}"
          f"/{a.size}")


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 1200
    q = int(sys.argv[2]) if len(sys.argv) > 2 else 9
    s = q - 1
    ns = N * s
    from gaussdca_tpu.parallel import mesh as meshlib
    from gaussdca_tpu.parallel.sharded import (_di_sharded_local,
                                               _di_sharded_tiled)
    from gaussdca_tpu.score import di

    print("backend:", jax.default_backend())
    m = meshlib.make_mesh(1, shape=(1, 1))

    @jax.jit
    def _make(key):
        ka, km = jax.random.split(key)
        A = (0.3 / ns**0.5) * jax.random.normal(ka, (ns, ns), jnp.float32)
        C = A @ A.T + jnp.eye(ns, dtype=jnp.float32)
        mm = 0.05 * jax.random.normal(km, (ns, ns), jnp.float32)
        return C, mm + mm.T

    C, mJ = _make(jax.random.PRNGKey(7))
    float(np.asarray(C[0, 0]))

    S_t = np.asarray(jax.jit(_hi(
        lambda a, b: _di_sharded_tiled(m, a, b, q)))(mJ, C))
    S_l = np.asarray(jax.jit(_hi(
        lambda a, b: _di_sharded_local(m, a, b, q,
                                       use_pallas=True)))(mJ, C))
    # the golden-validated single-chip default on the same inputs
    S_m = np.asarray(jax.jit(_hi(
        lambda a, b: di.di_score_bm_mapped(
            a.reshape(N, s, N, s), di.site_cholesky(b, q), N)))(mJ, C))

    print(f"N={N} q={q}  |S_m| max={np.abs(S_m).max():.3e} "
          f"mean={np.abs(S_m).mean():.3e}")
    stats("tiled  vs mapped", S_t, S_m)
    stats("local  vs mapped", S_l, S_m)
    stats("tiled  vs local ", S_t, S_l)


if __name__ == "__main__":
    main()
