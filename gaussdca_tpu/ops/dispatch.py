"""Kernel dispatch: TPU-optimized (Pallas/MXU) vs pure-jnp fallback.

Mirrors the reference's DCAUTILS_FORCE_FALLBACK pattern
(/root/reference/test/runtests.jl:78-86): every optimized kernel has a
pure-jnp twin and the two are cross-validated through the same golden
files. ``kernels()`` returns the optimized implementations when running on
a TPU backend, and the fallbacks elsewhere (CPU golden mode, interpreter).

Env overrides:
- ``GDCA_DISTANCE_IMPL`` in {"pallas", "asym", "pallas_full", "mxu",
  "fallback"} picks the all-pairs identity kernel explicitly (default:
  pallas on TPU — the symmetry-halved int8 row-stats kernel; "asym"
  selects the grouped-A asymmetric-tile variant; "pallas_full" the
  full-grid variant).
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Optional

import jax


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def kernels() -> Dict[str, Optional[Callable]]:
    """Mapping of injectable kernel implementations (None = jnp fallback).

    The returned ``match_counts_fn`` has signature ``fn(Z, q) -> [M, M]``
    int32 identity counts.
    """
    out: Dict[str, Optional[Callable]] = {"match_counts_fn": None,
                                          "row_stats_fn": None}
    impl = os.environ.get("GDCA_DISTANCE_IMPL", "").lower()
    if impl == "fallback":
        return out
    if impl not in ("pallas", "asym", "pallas_full", "mxu") \
            and not _on_tpu():
        return out
    from gaussdca_tpu.ops import distance
    if impl == "mxu":
        out["match_counts_fn"] = distance.match_counts_mxu
    elif impl == "pallas_full":
        out["match_counts_fn"] = distance.match_counts_pallas
        out["row_stats_fn"] = distance.row_stats_pallas
    elif impl == "asym":
        out["match_counts_fn"] = distance.match_counts_pallas
        out["row_stats_fn"] = distance.row_stats_asym_pallas
    else:
        out["match_counts_fn"] = distance.match_counts_pallas
        out["row_stats_fn"] = distance.row_stats_sym_pallas
    return out
