"""Fused Newton-Schulz matrix-sqrt kernel for the DI score stage.

The Gaussian DI stage iterates ~14 coupled Newton-Schulz steps over a
batch of s x s SPD matrices (score/di.py). As XLA ops, each step is 3
batched tiny matmuls that run at ~0.18 TFLOP/s on TPU (the batched gemm
for 20 x 20 blocks is lowering-bound, not FLOP-bound); fusing the whole
iteration into one Pallas kernel that keeps the blocks in VMEM measured
~3.3x faster.

Precision: the in-kernel dots run at HIGHEST (multi-pass f32) — a
single-pass (bf16) variant with a HIGHEST polish outside the kernel was
tried and REJECTED: coupled NS is only first-order self-correcting
against non-commuting perturbations, so the polish cannot contract the
bf16 floor (measured 2.9e-2 golden DI error; see docs/ROADMAP.md). With
HIGHEST dots the kernel reproduces the golden envelope exactly (9.6e-5)
and compiles in ~67 s per shape class (rolled loop) — which is why it
is opt-in (GDCA_DI_FUSED=1), the XLA path compiling in seconds at only
~10% lower end-to-end throughput.

The iteration count is FIXED (no convergence monitor in-kernel); the
caller adds polish steps outside as insurance (score/di.py). The
pure-jnp twin is ``score.di.sqrtm_spd`` (used for f64/CPU and under
force_fallback).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _bdot(A, B):
    """Batched [T, s, s] x [T, s, s] matmul."""
    return jax.lax.dot_general(
        A, B, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


def _ns_kernel(g_ref, y_ref, z_ref, *, iters: int, s: int):
    """Trace-scaled coupled Newton-Schulz on a VMEM tile of SPD blocks.

    Y -> sqrt(G/c), Z -> (G/c)^{-1/2} with c = trace(G) per block; the
    caller rescales. All iterations stay in VMEM — one HBM read of G,
    two writes (Y, Z).
    """
    G = g_ref[:]
    tp = G.shape[0]
    # per-block trace via masked sum (diagonal extraction lowers poorly);
    # one axis at a time — Mosaic rejects multi-axis reductions here
    ii = jax.lax.broadcasted_iota(jnp.int32, (tp, s, s), 1)
    jj = jax.lax.broadcasted_iota(jnp.int32, (tp, s, s), 2)
    diag = (ii == jj).astype(jnp.float32)
    c = jnp.sum(jnp.sum(G * diag, axis=2, keepdims=True),
                axis=1, keepdims=True)            # [tp, 1, 1]
    eye = jnp.broadcast_to(diag, (tp, s, s))

    # rolled loop with the iterates carried in the OUTPUT refs (Mosaic
    # rejects 3-D array tuples as fori carries, and 14 statically
    # unrolled HIGHEST batched dots took ~5 minutes to compile)
    y_ref[:] = G / c
    z_ref[:] = eye

    def step(_, tok):
        Y = y_ref[:]
        Z = z_ref[:]
        T = 1.5 * eye - 0.5 * _bdot(Z, Y)
        y_ref[:] = _bdot(Y, T)
        z_ref[:] = _bdot(T, Z)
        return tok

    jax.lax.fori_loop(0, iters, step, 0, unroll=1)


@functools.partial(jax.jit, static_argnames=("iters", "tile_p",
                                             "interpret"))
def ns_sqrtm_pallas(G: jax.Array, *, iters: int = 18, tile_p: int = 128,
                    interpret: bool = False):
    """(Y, Z, c): Y ~ sqrt(G/c), Z ~ (G/c)^{-1/2}, c = per-block trace.

    G: [P, s, s] SPD batch. P is padded to the tile; padded blocks are
    processed as garbage and sliced away (the caller pads with identity
    if it wants finite values).
    """
    P, s, _ = G.shape
    Pp = -(-P // tile_p) * tile_p
    Gp = G
    if Pp != P:
        # identity padding keeps the iteration finite on pad blocks
        pad = jnp.broadcast_to(jnp.eye(s, dtype=G.dtype),
                               (Pp - P, s, s))
        Gp = jnp.concatenate([G, pad], axis=0)

    kernel = functools.partial(_ns_kernel, iters=iters, s=s)
    spec = pl.BlockSpec((tile_p, s, s), lambda i: (i, 0, 0))
    Y, Z = pl.pallas_call(
        kernel,
        grid=(Pp // tile_p,),
        in_specs=[spec],
        out_specs=(spec, spec),
        out_shape=(jax.ShapeDtypeStruct((Pp, s, s), jnp.float32),
                   jax.ShapeDtypeStruct((Pp, s, s), jnp.float32)),
        interpret=interpret,
    )(Gp.astype(jnp.float32))
    c = jnp.trace(G, axis1=-2, axis2=-1)[..., None, None]
    return Y[:P], Z[:P], c
