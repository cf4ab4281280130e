"""Batched small-SPD Cholesky solves — the KKT-block kernel.

The SQP solver's per-iteration linear algebra is ``(H + lm I) dv = -g``
with H an N x N Gauss-Newton normal matrix (N = horizon <= 25), batched
over thousands of scenarios.  The reference hands the analogous KKT solve
to MA27/MUMPS (sparse, serial, per scenario — SURVEY.md section 2.9); on
TPU the right shape is the *batch*: tiny dense factorizations vectorized
across lanes.

Two implementations:

* :func:`chol_solve` — pure-jnp Cholesky-solve unrolled over the (static,
  small) N.  Every operation is elementwise over the batch, so XLA maps it
  onto the VPU with the batch in lanes — no LAPACK-style LU/pivoting path.
  Works on all backends, under vmap/jit/grad.
* :func:`chol_solve_pallas` — the same recurrence as an explicit Pallas
  TPU kernel with batch tiled into lanes (layout (N, N, B_tile)); used on
  TPU for large batches, validated in interpreter mode on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _chol_factor_rows(H):
    """Unrolled Cholesky of H (..., N, N) -> list of rows of L."""
    N = H.shape[-1]
    L = [[None] * N for _ in range(N)]
    for j in range(N):
        s = H[..., j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        d = jnp.sqrt(s)
        L[j][j] = d
        inv_d = 1.0 / d
        for i in range(j + 1, N):
            s = H[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv_d
    return L


def chol_solve(H, g):
    """Solve H x = g for SPD H (..., N, N), g (..., N); batched elementwise.

    Unrolled over N (static); O(N^3/3) fused elementwise ops, batch in
    lanes.  Preferred path for N <= 25.
    """
    N = H.shape[-1]
    L = _chol_factor_rows(H)
    # forward substitution L y = g
    y = [None] * N
    for i in range(N):
        s = g[..., i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    # back substitution L^T x = y
    x = [None] * N
    for i in reversed(range(N)):
        s = y[i]
        for k in range(i + 1, N):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x, axis=-1)


# ---------------------------------------------------------------------------
# Pallas TPU kernel: batch in lanes
# ---------------------------------------------------------------------------

def _chol_kernel(h_ref, g_ref, out_ref, *, N):
    """One batch tile: h (N*N, TB), g (N, TB) -> x (N, TB).

    The recurrence is unrolled in Python; every line is an elementwise op
    on (TB,)-shaped lane vectors, so the whole factorization stays in
    registers/VMEM with zero cross-lane traffic.
    """
    H = [[h_ref[i * N + j, :] for j in range(N)] for i in range(N)]
    g = [g_ref[i, :] for i in range(N)]

    L = [[None] * N for _ in range(N)]
    for j in range(N):
        s = H[j][j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        d = jnp.sqrt(s)
        L[j][j] = d
        inv_d = 1.0 / d
        for i in range(j + 1, N):
            s = H[i][j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv_d

    y = [None] * N
    for i in range(N):
        s = g[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * N
    for i in reversed(range(N)):
        s = y[i]
        for k in range(i + 1, N):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    for i in range(N):
        out_ref[i, :] = x[i]


@functools.partial(jax.jit, static_argnames=("tile_b", "interpret"))
def chol_solve_pallas(H, g, tile_b: int = 128, interpret: bool = False):
    """Pallas batched Cholesky solve.

    Args:
      H: (B, N, N) SPD batch.
      g: (B, N) right-hand sides.
      tile_b: lane tile (128 = native lane width).
      interpret: run in interpreter mode (CPU testing).

    Returns x (B, N) with H x = g.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N, _ = H.shape
    pad = (-B) % tile_b
    if pad:
        eye = jnp.broadcast_to(jnp.eye(N, dtype=H.dtype), (pad, N, N))
        H = jnp.concatenate([H, eye], axis=0)
        g = jnp.concatenate([g, jnp.zeros((pad, N), g.dtype)], axis=0)
    Bp = H.shape[0]

    # lanes-last layout
    Ht = jnp.transpose(H, (1, 2, 0)).reshape(N * N, Bp)
    gt = jnp.transpose(g, (1, 0))

    out = pl.pallas_call(
        functools.partial(_chol_kernel, N=N),
        grid=(Bp // tile_b,),
        in_specs=[
            pl.BlockSpec((N * N, tile_b), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N, tile_b), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((N, tile_b), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, Bp), H.dtype),
        interpret=interpret,
    )(Ht, gt)

    x = jnp.transpose(out, (1, 0))
    return x[:B]
