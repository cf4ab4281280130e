"""Fused Pallas TPU kernel for the stacked-LSTM surrogate forward pass.

One `pallas_call` runs the ENTIRE window — all timesteps x all layers x
readout — per batch tile: the weights load into VMEM once and stay
resident while the time loop runs in-kernel, instead of the `lax.scan`
path's per-timestep HBM traffic and kernel launches.  Semantics are
identical to ``nn/lstm.apply`` (torch gate order (i, f, g, o), bias-free
cells, zero initial state, last-timestep readout with optional bias;
reference: ``Unsupervised Learning/Model_NN/Functions.py:255-339``) —
pinned by tests/test_ops.py equivalence tests.

Shapes: hidden 50 and 4*50=200 gate lanes pad to the (8, 128) f32 tile,
so the MXU runs at partial utilization by construction; the win over XLA
comes from fusion/residency, not peak FLOPs.  Forward/inference only
(surrogate shadow rollouts, teacher-forced eval); training keeps the jnp
path for autodiff.  Measured TPU numbers: docs/RESULTS.md.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(num_layers, *refs):
    x_ref = refs[0]
    layer_refs = refs[1:1 + 2 * num_layers]
    w_out_ref, b_out_ref = refs[1 + 2 * num_layers: 3 + 2 * num_layers]
    out_ref = refs[-1]

    TB, T, _ = x_ref.shape
    H = layer_refs[1].shape[0]
    f32 = jnp.float32

    h = [jnp.zeros((TB, H), f32) for _ in range(num_layers)]
    c = [jnp.zeros((TB, H), f32) for _ in range(num_layers)]
    for t in range(T):                      # static window length: unrolled
        inp = x_ref[:, t, :]
        for l in range(num_layers):
            w_ih, w_hh = layer_refs[2 * l], layer_refs[2 * l + 1]
            gates = (
                jnp.dot(inp, w_ih[:], preferred_element_type=f32)
                + jnp.dot(h[l], w_hh[:], preferred_element_type=f32))
            gi = jax.nn.sigmoid(gates[:, :H])
            gf = jax.nn.sigmoid(gates[:, H:2 * H])
            gg = jnp.tanh(gates[:, 2 * H:3 * H])
            go = jax.nn.sigmoid(gates[:, 3 * H:])
            c[l] = gf * c[l] + gi * gg
            h[l] = go * jnp.tanh(c[l])
            inp = h[l]
    out_ref[:] = (jnp.dot(h[-1], w_out_ref[:], preferred_element_type=f32)
                  + b_out_ref[:])


def apply_pallas(params, x, *, block_b: int = 512, interpret: bool = False):
    """Fused-forward twin of ``nn.lstm.apply`` for (B, T, I) inputs.

    Batch is tiled into ``block_b`` rows per grid step (padded up); every
    weight rides along as a full VMEM block.  ``interpret=True`` runs the
    Mosaic interpreter (CPU tests)."""
    layers = params["layers"]
    num_layers = len(layers)
    B, T, I = x.shape
    H = layers[0]["w_hh"].shape[0]
    O = params["w_out"].shape[1]
    dtype = x.dtype

    TB = min(block_b, max(B, 8))
    Bp = -(-B // TB) * TB
    if Bp != B:
        x = jnp.concatenate(
            [x, jnp.zeros((Bp - B, T, I), dtype)], axis=0)

    b_out = params.get("b_out")
    if b_out is None:
        b_out = jnp.zeros((O,), dtype)

    full = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    in_specs = [pl.BlockSpec((TB, T, I), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)]
    args = [x]
    for l in layers:
        in_specs += [full(l["w_ih"].shape), full(l["w_hh"].shape)]
        args += [l["w_ih"], l["w_hh"]]
    in_specs += [full(params["w_out"].shape), full((1, O))]
    args += [params["w_out"], b_out[None, :]]

    out = pl.pallas_call(
        functools.partial(_kernel, num_layers),
        grid=(Bp // TB,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((TB, O), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, O), dtype),
        interpret=interpret,
    )(*args)
    return out[:B]
