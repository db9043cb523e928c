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


def _bm_matmul(A, B, s: int):
    """Batch-minor product C[i,k,:] = sum_j A[i,j,:] * B[j,k,:].

    A, B: [s, s, tp] VMEM arrays with the pair batch on the LANE axis —
    every multiply-add is a full-width VPU vector op in exact f32 (no
    bf16 passes, so no HIGHEST multi-pass cost). The j loop is unrolled
    at trace time (s is tiny)."""
    acc = A[:, 0:1, :] * B[0:1, :, :]
    for j in range(1, s):
        acc = acc + A[:, j:j + 1, :] * B[j:j + 1, :, :]
    return acc


def _di_tail_kernel(jb_ref, li_ref, lj_ref, out_ref, *, iters: int, s: int):
    """One [s, s, tp] slab of pairs: rho -> G -> NS sqrt -> logdet -> DI.

    Everything stays in VMEM; HBM traffic is three slab reads and a
    [1, tp] write (the DI values themselves). All arithmetic is
    elementwise/VPU in native f32: the batched 20x20 matmuls that run at
    ~0.2 TF/s as XLA batched gemms (lowering-bound) become s^3-per-slab
    vector FMAs here.
    """
    Jb = jb_ref[:]
    Li = li_ref[:]
    Lj = lj_ref[:]
    tp = Jb.shape[2]

    # rho = Li^T J Lj  (batch-minor: transpose = index swap on dims 0/1)
    LiT = jnp.swapaxes(Li, 0, 1)
    rho = _bm_matmul(LiT, _bm_matmul(Jb, Lj, s), s)
    # G = I + 4 rho rho^T
    rhoT = jnp.swapaxes(rho, 0, 1)
    G = _bm_matmul(rho, rhoT, s)
    ii = jax.lax.broadcasted_iota(jnp.int32, (s, s, tp), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (s, s, tp), 1)
    eye = (ii == jj).astype(jnp.float32)
    G = 4.0 * G + eye

    # trace-scaled coupled Newton-Schulz: Y -> sqrt(G/c), Z -> inv(sqrt)
    c = jnp.sum(jnp.sum(G * eye, axis=1, keepdims=True), axis=0,
                keepdims=True)                     # [1, 1, tp]
    Y = G / c
    Z = eye
    for _ in range(iters):
        T = 1.5 * eye - 0.5 * _bm_matmul(Z, Y, s)
        Y, Z = _bm_matmul(Y, T, s), _bm_matmul(T, Z, s)
    S = Y * jnp.sqrt(c)

    # H = (I + S)/2, symmetrized; DI = 1/2 logdet H via unpivoted
    # elimination (H is SPD with spectrum >= 1 — pivots are safe)
    H = 0.5 * (S + eye)
    H = 0.5 * (H + jnp.swapaxes(H, 0, 1))
    acc = jnp.zeros((1, tp), jnp.float32)
    for k in range(s):
        pivot = H[k:k + 1, k, :]                   # [1, tp]
        acc = acc + jnp.log(pivot)
        col = H[:, k:k + 1, :] / pivot[:, None, :]  # [s, 1, tp]
        H = H - col * H[k:k + 1, :, :]
    out_ref[:] = 0.5 * acc


@functools.partial(jax.jit, static_argnames=("iters", "tile_p",
                                             "interpret"))
def di_pairs_fused_pallas(Jb: jax.Array, Li: jax.Array, Lj: jax.Array, *,
                          iters: int = 16, tile_p: int = 128,
                          interpret: bool = False) -> jax.Array:
    """DI of a flat pair batch, fully fused: [P, s, s] x3 -> [P].

    The batch-minor twin of ``score.di._di_pairs`` (the jnp fallback):
    one Pallas pass computes rho, G, the NS square root, and the
    elimination logdet per 128-pair lane slab. Native-f32 VPU
    arithmetic reproduces the golden DI envelope without any HIGHEST
    multi-pass dots, and the rolled-at-trace tiny loops compile in
    seconds (the earlier MXU-batched in-kernel variant took ~67 s).
    Pad blocks are identity-filled so every lane stays finite.
    """
    P, s, _ = Jb.shape
    Pp = -(-P // tile_p) * tile_p
    eye = jnp.broadcast_to(jnp.eye(s, dtype=jnp.float32), (Pp - P, s, s))

    def prep(x):
        x = x.astype(jnp.float32)
        if Pp != P:
            x = jnp.concatenate([x, eye], axis=0)
        return jnp.moveaxis(x, 0, -1)              # [s, s, Pp]

    Jm, Lim, Ljm = prep(Jb), prep(Li), prep(Lj)
    kernel = functools.partial(_di_tail_kernel, iters=iters, s=s)
    spec = pl.BlockSpec((s, s, tile_p), lambda i: (0, 0, i))
    out = pl.pallas_call(
        kernel,
        grid=(Pp // tile_p,),
        in_specs=[spec, spec, spec],
        out_specs=pl.BlockSpec((1, tile_p), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((1, Pp), jnp.float32),
        interpret=interpret,
    )(Jm, Lim, Ljm)
    return out[0, :P]


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
