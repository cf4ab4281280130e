"""Feed-forward NN controller.

Reimplements ``FNNModel`` (``Supervised Learning/Functions.py:113-178``) as
a plain JAX pytree: input 3 ([y_dot, z, ref], scaled) -> hidden 50 ReLU ->
output 1, with the reference's exact quirks:

* Xavier-*normal* weight init, zero bias init;
* a single weight-shared intermediate layer applied ``width_dim - 1``
  times (the reference reuses ``fc_int`` in a loop, Functions.py:168);
* **no bias on the output layer**;
* Hardtanh output clamp to [-1, 1] — actuator saturation in scaled units.

Parameters are a dict pytree so `optax` and `jax.grad` apply directly; the
forward is a couple of small matmuls that XLA fuses into the surrounding
closed-loop or training program (vs the reference's per-step
torch-on-CPU inference).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def init(key, input_dim=3, hidden_dim=50, output_dim=1, width_dim=1,
         dtype=jnp.float32):
    """Xavier-normal weights, zero biases, no output bias."""
    k_in, k_int, k_out = jax.random.split(key, 3)

    def xavier(k, fan_in, fan_out):
        std = jnp.sqrt(2.0 / (fan_in + fan_out)).astype(dtype)
        return jax.random.normal(k, (fan_in, fan_out), dtype) * std

    params = {
        "w_in": xavier(k_in, input_dim, hidden_dim),
        "b_in": jnp.zeros((hidden_dim,), dtype),
        "w_int": xavier(k_int, hidden_dim, hidden_dim),
        "b_int": jnp.zeros((hidden_dim,), dtype),
        "w_out": xavier(k_out, hidden_dim, output_dim),
    }
    return params, {"width_dim": width_dim}


def apply(params, x, width_dim=1):
    """Forward pass; x shape (..., input_dim) -> (..., output_dim) in [-1, 1]."""
    h = jax.nn.relu(x @ params["w_in"] + params["b_in"])
    for _ in range(width_dim - 1):  # weight-shared intermediate layer
        h = jax.nn.relu(h @ params["w_int"] + params["b_int"])
    out = h @ params["w_out"]
    return jnp.clip(out, -1.0, 1.0)  # nn.Hardtanh()


def init_simulator(key, input_dim, hidden_dim, output_dim, width_dim=1,
                   bias=False, dtype=jnp.float32):
    """General-purpose FNN head, parity with ``FNNSimulator``
    (``Unsupervised Learning/Model_NN/Functions.py:186-249``): Tanh
    activations, bias-free by default, no output clamp, weight-shared
    intermediate layer.  torch's default Linear init (Kaiming-uniform
    U(-1/sqrt(fan_in), 1/sqrt(fan_in)))."""
    ks = jax.random.split(key, 6)

    def kaiming_uniform(k, fan_in, shape):
        bound = 1.0 / jnp.sqrt(jnp.asarray(fan_in, dtype))
        return jax.random.uniform(k, shape, dtype, -bound, bound)

    params = {
        "w_in": kaiming_uniform(ks[0], input_dim, (input_dim, hidden_dim)),
        "w_int": kaiming_uniform(ks[1], hidden_dim, (hidden_dim, hidden_dim)),
        "w_out": kaiming_uniform(ks[2], hidden_dim, (hidden_dim, output_dim)),
    }
    if bias:
        # torch Linear bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in)).
        params["b_in"] = kaiming_uniform(ks[3], input_dim, (hidden_dim,))
        params["b_int"] = kaiming_uniform(ks[4], hidden_dim, (hidden_dim,))
        params["b_out"] = kaiming_uniform(ks[5], hidden_dim, (output_dim,))
    return params, {"width_dim": width_dim}


def apply_simulator(params, x, width_dim=1):
    """Forward pass of the FNNSimulator head; no output constraint."""
    def lin(name, h):
        out = h @ params[f"w_{name}"]
        b = params.get(f"b_{name}")
        return out if b is None else out + b

    h = jnp.tanh(lin("in", x))
    for _ in range(width_dim - 1):  # weight-shared intermediate layer
        h = jnp.tanh(lin("int", h))
    return lin("out", h)


def make_policy(params, in_scaler, out_scaler, width_dim=1, lb=None, ub=None):
    """Closed-loop policy u = g(x_meas, ref, u_prev).

    Mirrors ``FeasibilityRecovery.NN_make_step`` (Supervised Learning/
    Functions.py:1014-1068): features [y_dot, z, ref] -> scale -> forward
    -> inverse-scale.  The only saturation is the Hardtanh in scaled units
    (effective bound ±max|u_train|): the reference declares LB_U/UB_U =
    ±0.2 (Main.py:122) but never applies them to the NN output — its
    recorded closed loops command u = -0.254 — and clipping at ±0.2 here
    costs ~0.05 closed-loop MAE on the deep-reference plateaus.  Pass
    lb/ub to opt into explicit saturation.
    """

    def policy(x_meas, ref, u_prev):
        feats = jnp.stack([x_meas[1], x_meas[4], ref])
        z = in_scaler.transform(feats)
        u_s = apply(params, z[None, :], width_dim)[0, 0]
        u = jnp.squeeze(out_scaler.inverse(u_s))
        if lb is not None or ub is not None:
            u = jnp.clip(u, lb, ub)
        return u

    return policy
