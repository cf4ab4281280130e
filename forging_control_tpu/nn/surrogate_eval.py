"""Surrogate (LSTM) rollout evaluation.

Two modes, matching the reference:

* :func:`teacher_forced` — windows are rebuilt each step from *simulator
  truth* plus the applied command, as in the Model_NN closed-loop shadow
  rollout (``Unsupervised Learning/Model_NN/Functions.py:1003-1019``).
  Vectorized: one window gather + one batched LSTM apply.
* :func:`free_running` — the LSTM's own predictions are fed back into the
  window (open-loop drift test), as in the unsupervised NN loop
  (``Unsupervised Learning/Functions.py:1195-1222``) — a `lax.scan`.

Surrogate feature layout (scaled): [y_dot, p1, p2, z, u]; outputs
[y_dot, p1, p2, z] at the next step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import datasets, lstm


def build_feature_track(telem_or_results, state_scaler, traj: int | None = None):
    """(T, 5) scaled surrogate features from telemetry/result arrays."""
    if isinstance(telem_or_results, dict):
        r = telem_or_results
        sel = slice(None) if traj is None else traj
        cols = np.stack([r["y_dot"][sel], r["p1"][sel], r["p2"][sel],
                         r["z"][sel], r["u"][sel]], axis=-1)
    else:
        t = telem_or_results
        x = np.asarray(t.x) if traj is None else np.asarray(t.x)[traj]
        u = np.asarray(t.u) if traj is None else np.asarray(t.u)[traj]
        cols = np.stack([x[..., 1], x[..., 2], x[..., 3], x[..., 4], u],
                        axis=-1)
    return np.asarray(state_scaler.transform(jnp.asarray(cols)))


def teacher_forced(params, track: np.ndarray, lookback: int = 10):
    """Predict every next step from truth windows; returns (T, 4) preds
    aligned so preds[t] estimates track[t+1, :4]."""
    win = track[datasets.window_indices(len(track), lookback)]
    return np.asarray(lstm.apply(params, jnp.asarray(win)))


def free_running(params, track: np.ndarray, lookback: int = 10):
    """Open-loop rollout: seed the window with the first `lookback` truth
    rows, then roll forward feeding predictions back, using the *recorded*
    command sequence.  Returns (T - lookback, 4) predictions aligned with
    track[lookback:, :4]."""
    track = jnp.asarray(track)
    T = track.shape[0]
    win0 = track[:lookback]
    us = track[lookback:, -1]

    def step(win, u_next):
        x_hat = lstm.apply(params, win)
        new_row = jnp.concatenate([x_hat, u_next[None]])
        win = jnp.concatenate([win[1:], new_row[None, :]], axis=0)
        return win, x_hat

    _, preds = jax.lax.scan(step, win0, us)
    return np.asarray(preds)


def fidelity_metrics(preds: np.ndarray, truth: np.ndarray) -> dict:
    """Per-state + overall MAE/RMSE/R2 (Model_NN/Main.py:250-281)."""
    from ..eval import metrics as m
    names = ["y_dot", "p1", "p2", "z"]
    out = {}
    for i, n in enumerate(names):
        out[f"MAE_{n}"] = float(m.mae(jnp.asarray(truth[:, i]),
                                      jnp.asarray(preds[:, i])))
        out[f"R2_{n}"] = float(m.r2(jnp.asarray(truth[:, i]),
                                    jnp.asarray(preds[:, i])))
    out["MAE"] = float(m.mae(jnp.asarray(truth), jnp.asarray(preds)))
    out["RMSE"] = float(m.rmse(jnp.asarray(truth), jnp.asarray(preds)))
    out["R2"] = float(m.r2(jnp.asarray(truth).ravel(),
                           jnp.asarray(preds).ravel()))
    return out
