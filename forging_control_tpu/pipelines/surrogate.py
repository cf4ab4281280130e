"""LSTM plant-surrogate pipeline.

Replaces ``Unsupervised Learning/Model_NN/Main.py``: train the LSTM
next-step predictor on multi-horizon MPC datasets, report teacher-forced
test fidelity, then run the MPC closed loop with a surrogate shadow
rollout and report closed-loop fidelity (call stack in SURVEY.md
section 3.3)."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..nn import datasets, lstm, scalers, surrogate_eval, train
from ..parallel import mesh as pmesh
from .config import SurrogateConfig

SURROGATE_FEATURES = ("y_dot", "p1", "p2", "z", "u")
SURROGATE_TARGETS = ("y_dot", "p1", "p2", "z")


@dataclasses.dataclass
class SurrogateArtifacts:
    params: dict
    state_scaler: scalers.Scaler
    test_metrics: dict
    train_report: train.TrainReport
    closed_loop_metrics: dict | None = None


def _flatten_datasets(results_list):
    """Concatenate per-horizon result dicts into one flat table
    (Model_NN/Main.py:104-128 concatenates all five horizon files)."""
    cols = {k: np.concatenate([r[k].ravel() for r in results_list])
            for k in SURROGATE_FEATURES}
    return np.stack([cols[k] for k in SURROGATE_FEATURES], axis=1)


def run(results_list, cfg: SurrogateConfig = SurrogateConfig(), *,
        seed: int = 0, eval_results: dict | None = None,
        dtype=jnp.float32) -> SurrogateArtifacts:
    table = _flatten_datasets(results_list).astype(np.float64)

    tr, va, te = datasets.split_603030(len(table))
    sc = scalers.fit("maxabs", table[tr])
    scaled = np.asarray(sc.transform(jnp.asarray(table)))

    def windows_for(sl, traj_len=300):
        x, y = datasets.windows(scaled[sl], scaled[sl][:, :4], cfg.lookback,
                                traj_len=traj_len)
        return x.astype(np.float32), y.astype(np.float32)

    xtr, ytr = windows_for(tr)
    xva, yva = windows_for(va)
    xte, yte = windows_for(te)

    params = lstm.init(jax.random.PRNGKey(seed), hidden_dim=cfg.hidden_dim,
                       num_layers=cfg.num_layers, dtype=dtype)
    if cfg.flags.enable_training:
        params, rep = train.train_surrogate(
            params, xtr, ytr, xva, yva, lr=cfg.lr, epochs=cfg.epochs,
            batch_size=cfg.batch_size, seed=seed,
            mesh=pmesh.default_mesh())
    else:
        rep = train.TrainReport()

    preds = np.asarray(lstm.apply(params, jnp.asarray(xte)))
    test_metrics = surrogate_eval.fidelity_metrics(preds, yte)
    test_metrics["Training_time"] = rep.wall_time_s

    art = SurrogateArtifacts(params, sc, test_metrics, rep)

    if eval_results is not None:
        # Closed-loop shadow fidelity: teacher-forced windows from the MPC
        # run's truth (Model_NN/Main.py:357-414).
        track = surrogate_eval.build_feature_track(eval_results, sc, traj=0)
        preds_cl = surrogate_eval.teacher_forced(params, track, cfg.lookback)
        truth_next = np.vstack([track[1:, :4], track[-1:, :4]])
        art.closed_loop_metrics = surrogate_eval.fidelity_metrics(
            preds_cl, truth_next)
    return art
