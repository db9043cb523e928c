"""Static FLOP accounting per pipeline stage.

The per-stage wall/TFLOP counters the reference lacks (SURVEY.md
section 5): costs are closed-form in (M, N, q), so the batch log can
report achieved TFLOP/s per family without any device instrumentation.
"""

from __future__ import annotations

from typing import Dict

DI_SQRTM_ITERS = 14  # typical Newton-Schulz iterations at f32 tolerance


def pipeline_flops(M: int, N: int, q: int, *, score: str = "frob",
                   auto_theta: bool = True,
                   solve_refine_iters: int = 1) -> Dict[str, float]:
    """Estimated FLOPs per stage for one family.

    Reweighting counts the one-hot-matmul formulation (2*M^2*N*q) for
    the ONE all-pairs pass the pipeline runs regardless of theta mode:
    since round 2, auto-theta is the closed-form histogram reduction
    (sum of squared per-column state counts, O(M*N*q) — see
    stats/reweight.total_matches_closed_form), not a second distance
    pass. The solve counts potrf+potri-equivalent (Ns)^3 plus
    4*(Ns)^3 per Newton refinement.
    """
    s = q - 1
    Ns = N * s
    auto_theta_flops = 3.0 * M * N * q if auto_theta else 0.0
    out = {
        "reweight": 2.0 * M * M * N * q + auto_theta_flops,
        "frequencies": 2.0 * M * Ns * Ns + 2.0 * M * Ns,
        "solve": (1.0 + 4.0 * solve_refine_iters) * Ns ** 3,
    }
    P = N * (N - 1) / 2
    if score == "DI":
        # per pair: 2 gauge matmuls + ~DI_SQRTM_ITERS Newton-Schulz steps
        # (3 matmuls each) + a Cholesky logdet, all s x s
        out["score"] = P * (2 + 3 * DI_SQRTM_ITERS + 1 / 3) * 2.0 * s ** 3
    else:
        out["score"] = P * 4.0 * s * s
    out["total"] = sum(out.values())
    return out
