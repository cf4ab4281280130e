"""LSTM plant surrogate.

Reimplements ``LSTMModel`` (``Unsupervised Learning/Model_NN/Functions.py:
255-339``): stacked LSTM, input 5 ([y_dot, p1, p2, z, u], scaled), hidden
50, 3 layers, **no biases**, zero initial (h, c) per sequence, linear
readout of the last timestep -> 4 next-step outputs ([y_dot, p1, p2, z]).

Gate packing follows torch's (i, f, g, o) so recorded reference
hyperparameters translate 1:1.  Time iteration is `lax.scan`; the batch
and hidden axes land on the MXU via the gate matmuls — this is the hot op
of MPC-loss training.  A fused whole-window Pallas forward kernel exists
in ops/lstm_pallas.py (equivalence-pinned in tests/test_ops.py); the jnp
path remains the default everywhere — it is required for training
(autodiff) and the measured MPC-loss trainer is already host-sync-free
(docs/RESULTS.md) — and the kernel's on-TPU A/B is blocked this round by
a Mosaic compile hang in the remote-compile environment (any
pallas_call, including a minimal 128x128 matmul, hangs; see
docs/RESULTS.md "Pallas status").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def init(key, input_dim=5, hidden_dim=50, num_layers=3, output_dim=4,
         dtype=jnp.float32, readout_bias=True):
    """torch-default uniform(-1/sqrt(H), 1/sqrt(H)) init.

    The LSTM cells are bias-free (reference: ``bias=False``,
    Model_NN/Functions.py:286) but the readout nn.Linear keeps its default
    bias (``:289``); ``readout_bias=False`` opts out."""
    keys = jax.random.split(key, 2 * num_layers + 2)
    bound = 1.0 / jnp.sqrt(jnp.asarray(hidden_dim, dtype))
    layers = []
    for l in range(num_layers):
        in_dim = input_dim if l == 0 else hidden_dim
        w_ih = jax.random.uniform(keys[2 * l], (in_dim, 4 * hidden_dim),
                                  dtype, -bound, bound)
        w_hh = jax.random.uniform(keys[2 * l + 1], (hidden_dim, 4 * hidden_dim),
                                  dtype, -bound, bound)
        layers.append({"w_ih": w_ih, "w_hh": w_hh})
    w_out = jax.random.uniform(keys[-1], (hidden_dim, output_dim),
                               dtype, -bound, bound)
    params = {"layers": layers, "w_out": w_out}
    if readout_bias:
        params["b_out"] = jax.random.uniform(keys[-2], (output_dim,),
                                             dtype, -bound, bound)
    return params


def _cell(x, h, c, layer):
    """One LSTM cell step, torch gate order (i, f, g, o), no biases."""
    gates = x @ layer["w_ih"] + h @ layer["w_hh"]
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return h_new, c_new


def apply(params, x):
    """Forward pass.

    Args:
      x: (..., T, input_dim) window (batch_first like the reference).

    Returns (..., output_dim): readout of the last timestep.
    """
    num_layers = len(params["layers"])
    batch_shape = x.shape[:-2]
    H = params["layers"][0]["w_hh"].shape[0]
    h0 = jnp.zeros((num_layers,) + batch_shape + (H,), x.dtype)
    c0 = jnp.zeros_like(h0)

    def step(carry, x_t):
        h, c = carry
        inp = x_t
        hs, cs = [], []
        for l, layer in enumerate(params["layers"]):
            h_new, c_new = _cell(inp, h[l], c[l], layer)
            hs.append(h_new)
            cs.append(c_new)
            inp = h_new
        return (jnp.stack(hs), jnp.stack(cs)), None

    xt = jnp.moveaxis(x, -2, 0)  # (T, ..., input_dim)
    (h, _), _ = jax.lax.scan(step, (h0, c0), xt)
    out = h[-1] @ params["w_out"]
    # The reference's readout nn.Linear carries a bias (Model_NN/
    # Functions.py:289) even though the LSTM layers are bias-free; support
    # it as an optional key so recorded reference weights load exactly.
    if "b_out" in params:
        out = out + params["b_out"]
    return out
