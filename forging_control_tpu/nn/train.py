"""Training loops (supervised imitation + unsupervised MPC-loss).

Replaces ``NeuralNetwork.{train_model,validate_model,train_loop}``
(``Supervised Learning/Functions.py:368-630``; unsupervised variant
``Unsupervised Learning/Functions.py:594-923``).  Each epoch is a sequence
of jit-compiled update steps; the whole step (forward, loss, backward,
AdamW update) is one XLA program, so TPU training replaces the reference's
torch-CPU/CUDA loop wholesale.

Hyperparameter defaults mirror the reference USER SETTINGS:
supervised — L1 loss, AdamW lr=1e-3, bs=256, 20 epochs
(``Supervised Learning/Main.py:272-286``); unsupervised — MPCLoss(N=10,
alpha=20), AdamW lr=1e-4, validation against recorded MPC commands with
plain MSE (``Unsupervised Learning/Main.py:326-348``).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from . import datasets, fnn, mpc_loss


@dataclass
class TrainReport:
    train_losses: list = field(default_factory=list)
    val_losses: list = field(default_factory=list)
    cl_val_losses: list = field(default_factory=list)  # closed-loop val MAE
    wall_time_s: float = 0.0


def l1_loss(pred, target):
    return jnp.mean(jnp.abs(pred - target))


def mse_loss(pred, target):
    return jnp.mean(jnp.square(pred - target))


def train_supervised(params, x_train, y_train, x_val, y_val, *,
                     width_dim=1, lr=1e-3, weight_decay=1e-2, epochs=20,
                     batch_size=256, loss_fn=l1_loss, seed=0,
                     log_fn: Callable | None = None):
    """Supervised imitation trainer (FNN mimics recorded MPC commands)."""
    tx = optax.adamw(lr, weight_decay=weight_decay)
    opt_state = tx.init(params)

    @jax.jit
    def update(params, opt_state, xb, yb):
        def loss(p):
            return loss_fn(fnn.apply(p, xb, width_dim), yb)
        l, grads = jax.value_and_grad(loss)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, l

    @jax.jit
    def evaluate(params, xb, yb):
        return loss_fn(fnn.apply(params, xb, width_dim), yb)

    report = TrainReport()
    t0 = time.time()
    for epoch in range(epochs):
        losses = []
        for xb, yb in datasets.batch_iter((x_train, y_train), batch_size,
                                          key=seed + epoch):
            params, opt_state, l = update(params, opt_state,
                                          jnp.asarray(xb), jnp.asarray(yb))
            losses.append(float(l))
        vl = float(evaluate(params, jnp.asarray(x_val), jnp.asarray(y_val)))
        report.train_losses.append(float(np.mean(losses)))
        report.val_losses.append(vl)
        if log_fn:
            log_fn(epoch, report.train_losses[-1], vl)
    report.wall_time_s = time.time() - t0
    return params, report


def train_unsupervised(controller_params, surrogate_params,
                       x_train, u_train, z_train, x_val, u_val, *,
                       horizon=10, alpha=20.0, width_dim=1, lr=1e-4,
                       weight_decay=1e-2, epochs=20, batch_size=15,
                       enable_noise=False, noise_sigma=0.01, seed=0,
                       keep_best=True,
                       closed_loop_val_fn: Callable | None = None,
                       log_fn: Callable | None = None):
    """MPC-loss trainer: FNN trained through the frozen LSTM surrogate.

    Validation uses plain MSE against the recorded MPC commands, exactly
    like the reference (``Unsupervised Learning/Functions.py:868-888``).
    ``keep_best`` returns the parameters at the best validation epoch —
    training longer through an imperfect surrogate lets the controller
    exploit surrogate error (observed: val MAE improves while closed-loop
    tracking collapses), so the val-vs-recorded-MPC metric is the guard.

    ``closed_loop_val_fn(params) -> scalar`` optionally replaces that
    selection metric with a *true-plant* closed-loop tracking MAE — the
    guard the reference could not afford (its plant rollout costs minutes
    per candidate through CVODES; ours is one jitted batched scan costing
    milliseconds).  When provided, best-epoch selection uses it and the
    per-epoch values are recorded in ``TrainReport.cl_val_losses``.
    """
    tx = optax.adamw(lr, weight_decay=weight_decay)
    opt_state = tx.init(controller_params)

    @jax.jit
    def update(params, opt_state, xb, zb, key):
        def loss(p):
            u_ctrl = fnn.apply(p, xb, width_dim)
            l, _ = mpc_loss.mpc_loss(
                p, surrogate_params, xb, u_ctrl, zb,
                horizon=horizon, alpha=alpha, width_dim=width_dim,
                noise_key=key if enable_noise else None,
                noise_std=noise_sigma)
            return l
        l, grads = jax.value_and_grad(loss)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, l

    @jax.jit
    def validate(params, xb, ub):
        return mse_loss(fnn.apply(params, xb, width_dim), ub)

    report = TrainReport()
    key = jax.random.PRNGKey(seed)
    t0 = time.time()
    best_params, best_val = controller_params, float("inf")
    for epoch in range(epochs):
        losses = []
        for xb, ub, zb in datasets.batch_iter((x_train, u_train, z_train),
                                              batch_size, key=seed + epoch):
            key, sub = jax.random.split(key)
            controller_params, opt_state, l = update(
                controller_params, opt_state, jnp.asarray(xb),
                jnp.asarray(zb), sub)
            losses.append(float(l))
        vl = float(validate(controller_params, jnp.asarray(x_val),
                            jnp.asarray(u_val)))
        report.train_losses.append(float(np.mean(losses)))
        report.val_losses.append(vl)
        select = vl
        if closed_loop_val_fn is not None:
            select = float(closed_loop_val_fn(controller_params))
            report.cl_val_losses.append(select)
        if select < best_val:
            best_val = select
            best_params = jax.tree.map(lambda a: a.copy(), controller_params)
        if log_fn:
            log_fn(epoch, report.train_losses[-1], select)
    report.wall_time_s = time.time() - t0
    if keep_best:
        controller_params = best_params
    return controller_params, report


def train_surrogate(params, x_train, y_train, x_val, y_val, *, lr=1e-3,
                    weight_decay=1e-2, epochs=50, batch_size=256, seed=0,
                    log_fn: Callable | None = None):
    """LSTM surrogate trainer: teacher-forced next-step MSE
    (``Unsupervised Learning/Model_NN/Main.py:224-239``)."""
    from . import lstm as lstm_mod
    tx = optax.adamw(lr, weight_decay=weight_decay)
    opt_state = tx.init(params)

    @jax.jit
    def update(params, opt_state, xb, yb):
        def loss(p):
            return mse_loss(lstm_mod.apply(p, xb), yb)
        l, grads = jax.value_and_grad(loss)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, l

    @jax.jit
    def evaluate(params, xb, yb):
        return mse_loss(lstm_mod.apply(params, xb), yb)

    report = TrainReport()
    t0 = time.time()
    for epoch in range(epochs):
        losses = []
        for xb, yb in datasets.batch_iter((x_train, y_train), batch_size,
                                          key=seed + epoch):
            params, opt_state, l = update(params, opt_state,
                                          jnp.asarray(xb), jnp.asarray(yb))
            losses.append(float(l))
        vl = float(evaluate(params, jnp.asarray(x_val), jnp.asarray(y_val)))
        report.train_losses.append(float(np.mean(losses)))
        report.val_losses.append(vl)
        if log_fn:
            log_fn(epoch, report.train_losses[-1], vl)
    report.wall_time_s = time.time() - t0
    return params, report
