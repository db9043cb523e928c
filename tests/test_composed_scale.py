"""Composed-at-scale mesh equivalence, PRODUCTION thresholds.

Earlier mesh tests either ran toy shapes (all gates closed) or forced
individual branches by lowering their thresholds. This test sizes one
realistic family so every scale mechanism engages simultaneously with
its *default* gate values — no monkeypatching:

- q=21, N=363 -> Ns = 7260 >= solve_min_dim (4096): the storage-sharded
  solve + local-gather DI path (solve/distributed.py),
- P = N(N-1)/2 = 65703 > pair_chunk (65536): the DI chunker splits the
  pair batch,
- theta='auto': the closed-form single-pass auto-theta + streaming
  reweighting (always-on M-axis streaming).

The 8-device mesh run must reproduce the single-device pipeline in f64.
This is the multi-device analog of the reference's optimized-vs-fallback
golden cross-check (/root/reference/test/runtests.jl:78-86).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussdca_tpu.core.config import GDCAConfig
from gaussdca_tpu.parallel import mesh as meshlib


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_composed_production_gates_mesh_vs_single():
    from gaussdca_tpu.api import scores_pipeline
    from gaussdca_tpu.parallel.sharded import run_sharded

    q, N, M = 21, 363, 512
    cfg = GDCAConfig()  # defaults only — the gates must open on their own
    Ns = N * (q - 1)
    P_ = N * (N - 1) // 2
    assert Ns >= cfg.solve_min_dim          # storage-sharded solve engages
    assert P_ > 65536                       # DI pair chunking engages

    rng = np.random.default_rng(42)
    # correlated columns so C is not near-identity (realistic cond)
    base = rng.integers(1, q + 1, size=(8, N), dtype=np.int8)
    Z = base[rng.integers(0, 8, size=M)]
    mut = rng.random((M, N)) < 0.35
    Z = np.where(mut, rng.integers(1, q + 1, size=(M, N)), Z).astype(np.int8)

    dtype = jnp.float64
    S0, th0, meff0 = scores_pipeline(
        jnp.asarray(Z), jnp.asarray(0.2, dtype), jnp.asarray(0.0, dtype),
        q=q, score="DI", theta_is_auto=True, dtype=dtype,
        use_pallas=False)

    m = meshlib.make_mesh(8, shape=(4, 2))
    S1, th1, meff1 = run_sharded(
        m, Z, 0.2, "auto", q=q, score="DI", dtype=dtype,
        solve_min_dim=cfg.solve_min_dim, solve_block=cfg.solve_block,
        use_pallas=False)

    assert float(th1) == pytest.approx(float(th0), rel=1e-12)
    assert float(meff1) == pytest.approx(float(meff0), rel=1e-12)
    S0 = np.asarray(S0)
    S1 = np.asarray(S1)
    scale = np.abs(S0).max()
    assert np.abs(S1 - S0).max() / scale < 1e-9
