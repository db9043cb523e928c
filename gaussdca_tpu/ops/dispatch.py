"""Kernel dispatch: TPU-optimized (Pallas/MXU) vs pure-jnp fallback.

Mirrors the reference's DCAUTILS_FORCE_FALLBACK pattern
(/root/reference/test/runtests.jl:78-86): every optimized kernel has a
pure-jnp twin and the two are cross-validated through the same golden
files. ``kernels()`` returns the optimized implementations when running on
a TPU backend, and the fallbacks elsewhere (CPU golden mode, interpreter).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def kernels() -> Dict[str, Optional[Callable]]:
    """Mapping of injectable kernel implementations (None = jnp fallback)."""
    out: Dict[str, Optional[Callable]] = {"match_counts_fn": None}
    if not _on_tpu():
        return out
    try:
        from gaussdca_tpu.ops import distance
        out["match_counts_fn"] = distance.match_counts_mxu
    except ImportError:
        pass
    return out
