"""Differentiable MPC-inspired training loss.

Reimplements ``MPCLoss`` (``Unsupervised Learning/Functions.py:1336-1472``)
as a `lax.scan` unroll: the FNN controller and LSTM plant surrogate are
rolled out N steps from each training window, accumulating per step

    cost = (y_dot_hat - ref)^2                       # tracking
         + alpha * (u_prev - u_next)^2               # command variation
         + relu(-p1_hat) + relu(-p2_hat)             # lower pressure bounds
         + relu(p1_hat - 2.122366)                   # upper bounds, scaled
         + relu(p2_hat - 1.036233)                   #   units (~32 MPa)

and the loss is mean over the batch of (sum_k cost_k) / N.  Gradients flow
through all N x (FNN + LSTM) applications — the reference's hot training
loop (HOT LOOP #4 in SURVEY.md section 3.4) — here fused by XLA into one
program with the surrounding optimizer step.

Surrogate state layout (scaled): window (..., lookback, 5) over
[y_dot, p1, p2, z, u]; LSTM output (..., 4) = next [y_dot, p1, p2, z].
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import fnn, lstm

P1_UB_SCALED = 2.122366   # Unsupervised Learning/Functions.py:1411
P2_UB_SCALED = 1.036233


class MPCLossOutputs(NamedTuple):
    """Per-sample decomposition matching the reference's loss_features dict
    (Functions.py:1469-1470)."""

    loss: jax.Array        # (B,)
    command: jax.Array     # (B,)
    error: jax.Array       # (B,)
    prediction: jax.Array  # (B, N) commands over the unroll


def _constraint_cost(x0):
    return (jax.nn.relu(-x0[..., 1]) + jax.nn.relu(-x0[..., 2])
            + jax.nn.relu(x0[..., 1] - P1_UB_SCALED)
            + jax.nn.relu(x0[..., 2] - P2_UB_SCALED))


def mpc_loss(controller_params, surrogate_params, x_ctrl, u_ctrl, window,
             horizon=10, alpha=20.0, width_dim=1, noise_key=None,
             noise_std=0.01):
    """Compute (scalar loss, MPCLossOutputs).

    Args:
      controller_params: FNN pytree (trainable).
      surrogate_params: LSTM pytree (frozen in the reference run).
      x_ctrl: (B, 3) controller input [y_dot, z, ref], scaled.
      u_ctrl: (B, 1) controller output at the root step (forward-computed
        by the caller so its gradient participates, mirroring
        ``train_model``'s call shape, Functions.py:643-646).
      window: (B, lookback, 5) recurrent window [y_dot, p1, p2, z, u].
      noise_key: when set, adds N(0, noise_std) to surrogate predictions
        (enable_noise path, Functions.py:1400-1402).
    """
    B = x_ctrl.shape[0]
    ref = x_ctrl[:, -1]

    def surrogate(win, key):
        x0 = lstm.apply(surrogate_params, win)
        if key is not None:
            x0 = x0 + jax.random.normal(key, x0.shape, x0.dtype) * noise_std
        return x0

    keys = (jax.random.split(noise_key, horizon)
            if noise_key is not None else [None] * horizon)

    # Root step: replace the window's last command with the controller output.
    win = window.at[:, -1, -1].set(u_ctrl[:, 0])
    x0 = surrogate(win, keys[0])
    command0 = alpha * jnp.square(win[:, -2, -1] - win[:, -1, -1])
    error0 = jnp.square(x0[:, 0] - ref)
    cost0 = error0 + command0 + _constraint_cost(x0)

    u_next = u_ctrl

    def body(carry, key):
        win, x0, u_next, cost_acc, cmd_acc, err_acc, preds = carry
        x_in = jnp.stack([x0[:, 0], x0[:, 3], ref], axis=1)
        u0 = u_next
        u_next = fnn.apply(controller_params, x_in, width_dim)
        x_next = jnp.concatenate([x0, u_next], axis=1)[:, None, :]
        win = jnp.concatenate([win[:, 1:, :], x_next], axis=1)
        x0 = surrogate(win, key)
        err = jnp.square(x0[:, 0] - ref)
        cmd = alpha * jnp.square(u0[:, 0] - u_next[:, 0])
        cost = err + cmd + _constraint_cost(x0)
        preds = jnp.concatenate([preds, u_next], axis=1)
        return (win, x0, u_next, cost_acc + cost, cmd_acc + cmd,
                err_acc + err, preds), None

    carry = (win, x0, u_next, cost0, command0, error0, u_ctrl)
    # Python loop (horizon static, <= 25) so `preds` can grow; XLA unrolls.
    for j in range(horizon - 1):
        carry, _ = body(carry, keys[j + 1])
    _, _, _, cost_acc, cmd_acc, err_acc, preds = carry

    loss_vec = cost_acc / horizon
    out = MPCLossOutputs(
        loss=loss_vec,
        command=cmd_acc / horizon,
        error=err_acc / horizon,
        prediction=preds,
    )
    return jnp.mean(loss_vec), out
