"""Unsupervised (MPC-loss) controller pipeline.

Replaces ``Unsupervised Learning/Main.py``: train the FNN controller
against the differentiable MPC-inspired loss unrolled through the frozen
LSTM surrogate, then evaluate in closed loop against the true plant with a
parallel free-running surrogate rollout (call stack in SURVEY.md
section 3.4)."""

from __future__ import annotations

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..eval import metrics
from ..loop import closed_loop as cl
from ..nn import datasets, fnn, scalers, surrogate_eval, train
from ..refgen import streams
from ..solver import feasibility, sqp
from .config import PROCESS_STD, UnsupervisedConfig
from .surrogate import SURROGATE_FEATURES


@dataclasses.dataclass
class UnsupervisedArtifacts:
    params: dict
    in_scaler: scalers.Scaler
    out_scaler: scalers.Scaler
    test_metrics: dict
    train_report: train.TrainReport
    nn_metrics: dict | None = None
    surrogate_drift: dict | None = None
    nn_telem: object = None


def fit_controller_scalers(results: dict, scaler_kind: str = "maxabs"):
    """Controller feature/command scalers exactly as :func:`prepare_data`
    fits them: per-column maxabs on the train split, with the reference
    signal scaled by the *y_dot* scaler (Unsupervised Learning/
    Main.py:235-261).  Returns ``(in_sc, u_sc)``; shared by the pipeline
    and the experiment scripts so the convention lives in one place."""
    y_dot = results["y_dot"].ravel()
    z = results["z"].ravel()
    u = results["u"].ravel()[:, None]
    tr, _, _ = datasets.split_603030(len(y_dot))
    ydot_sc = scalers.fit(scaler_kind, y_dot[tr, None])
    z_sc = scalers.fit(scaler_kind, z[tr, None])
    u_sc = scalers.fit(scaler_kind, u[tr])
    in_sc = scalers.Scaler(
        shift=jnp.concatenate([ydot_sc.shift[:1], z_sc.shift[:1],
                               ydot_sc.shift[:1]]),
        scale=jnp.concatenate([ydot_sc.scale[:1], z_sc.scale[:1],
                               ydot_sc.scale[:1]]))
    return in_sc, u_sc


def prepare_data(results: dict, state_scaler, cfg: UnsupervisedConfig,
                 scaler_kind: str = "maxabs"):
    """Controller features [y_dot, z, ref] (ref scaled with the *y_dot*
    scaler, Unsupervised Learning/Main.py:235-261), target u at t+1, and
    recurrent surrogate windows; every-N-th resampling (Main.py:282-309)."""
    y_dot = results["y_dot"].ravel()
    z = results["z"].ravel()
    ref = results["ref"].ravel()
    u = results["u"].ravel()[:, None]

    tr, va, te = datasets.split_603030(len(y_dot))

    ydot_sc = scalers.fit(scaler_kind, y_dot[tr, None])
    z_sc = scalers.fit(scaler_kind, z[tr, None])
    u_sc = scalers.fit(scaler_kind, u[tr])

    feats = np.stack([
        np.asarray(ydot_sc.transform(jnp.asarray(y_dot[:, None])))[:, 0],
        np.asarray(z_sc.transform(jnp.asarray(z[:, None])))[:, 0],
        np.asarray(ydot_sc.transform(jnp.asarray(ref[:, None])))[:, 0],
    ], axis=1)
    targ = np.asarray(u_sc.transform(jnp.asarray(u)))

    track = np.stack([results[k].ravel() for k in SURROGATE_FEATURES], axis=1)
    track_s = np.asarray(state_scaler.transform(jnp.asarray(track)))

    def triples(sl, traj_len=300):
        x, y, zz = datasets.unsupervised_triples(
            feats[sl], targ[sl], track_s[sl], cfg.lookback,
            traj_len=traj_len)
        keep = datasets.resample_every(len(x), cfg.horizon)
        return (x[keep].astype(np.float32), y[keep].astype(np.float32),
                zz[keep].astype(np.float32))

    in_sc = scalers.Scaler(
        shift=jnp.concatenate([ydot_sc.shift[:1], z_sc.shift[:1],
                               ydot_sc.shift[:1]]),
        scale=jnp.concatenate([ydot_sc.scale[:1], z_sc.scale[:1],
                               ydot_sc.scale[:1]]))
    return triples(tr), triples(va), triples(te), in_sc, u_sc


def _full_density(results: dict, in_sc, u_sc):
    """Full-density deployment-aligned pairs in scaled units, used as
    DAgger's round-0 imitation set (the every-Nth MPC-loss resampling
    starves it).

    Telemetry rows pair the POST-step state with the command that
    produced it (x row t = x_meas after u_t), so the pair a deployed
    policy actually faces — (pre-step state, current reference) ->
    command — is (y_dot[t], z[t], ref[t+1]) -> u[t+1], built strictly
    WITHIN each trajectory (no pair straddles a reset)."""
    y_dot = np.asarray(results["y_dot"])
    z = np.asarray(results["z"])
    ref = np.asarray(results["ref"])
    u = np.asarray(results["u"])
    feats = np.stack([y_dot[:, :-1], z[:, :-1], ref[:, 1:]],
                     axis=-1).reshape(-1, 3).astype(np.float32)
    targ = u[:, 1:].reshape(-1, 1).astype(np.float32)
    tr, va, _ = datasets.split_603030(len(feats))
    feats_s = np.asarray(in_sc.transform(jnp.asarray(feats)))
    targ_s = np.asarray(u_sc.transform(jnp.asarray(targ))).astype(np.float32)
    return feats_s[tr], targ_s[tr], feats_s[va], targ_s[va]


def make_closed_loop_val(in_sc, u_sc, *, n_traj: int = 8, t_traj: int = 300,
                         dtype=jnp.float32, seed: int = 0,
                         variant: str = "smooth",
                         process_std: tuple = (0.0,) * 5):
    """True-plant validation rollout (see nn/train.make_closed_loop_val)."""
    return train.make_closed_loop_val(
        in_sc, u_sc, n_traj=n_traj, t_traj=t_traj, dtype=dtype, seed=seed,
        variant=variant, ref_variant="unsupervised", process_std=process_std)


def run(results: dict, surrogate_params, state_scaler,
        cfg: UnsupervisedConfig = UnsupervisedConfig(), *, seed: int = 0,
        closed_loop_eval: bool = True, dtype=jnp.float32,
        t_traj: int = 300, n_traj_eval: int = 2,
        out_dir: str | None = None) -> UnsupervisedArtifacts:
    (xtr, utr, ztr), (xva, uva, _), (xte, ute, _), in_sc, u_sc = prepare_data(
        results, state_scaler, cfg)

    params, _ = fnn.init(jax.random.PRNGKey(seed), dtype=dtype)
    if cfg.flags.enable_training:
        cl_val_fn = None
        if cfg.closed_loop_val:
            # Validate under the deployment noise protocol: selection on
            # clean rollouts misranks policies when evaluation is noisy.
            cl_val_fn = make_closed_loop_val(
                in_sc, u_sc, n_traj=cfg.closed_loop_val_traj,
                t_traj=t_traj, dtype=dtype, seed=seed,
                process_std=(PROCESS_STD if cfg.flags.enable_noise
                             else (0.0,) * 5))

        def train_one(s):
            p0, _ = fnn.init(jax.random.PRNGKey(s), dtype=dtype)
            if cfg.train_mode == "dagger":
                make = {"default": sqp.MPCConfig, "fast": sqp.MPCConfig.fast,
                        "ipopt_compat": sqp.MPCConfig.ipopt_compat}[
                    cfg.solver_preset]
                mpc_cfg = make(horizon=cfg.horizon, variant="smooth")
                # Round-0 imitation uses the FULL-density dataset (the
                # supervised pipeline's 14.4k rows, not the every-Nth
                # MPC-loss resampling): measured eval 0.0499 vs 0.052+
                # from the resampled seed (scripts/unsup_win_exp.py).
                xf, uf, xvf, uvf = _full_density(results, in_sc, u_sc)
                p1, rep1 = train.train_dagger(
                    p0, in_sc, u_sc, xf, uf, xvf, uvf, mpc_cfg=mpc_cfg,
                    rounds=cfg.dagger_rounds, n_traj=cfg.dagger_n_traj,
                    t_steps=t_traj, epochs=cfg.dagger_epochs, seed=s,
                    backend=cl.resolve_backend("auto", cfg.horizon),
                    process_std=(PROCESS_STD if cfg.flags.enable_noise
                                 else (0.0,) * 5),
                    closed_loop_val_fn=cl_val_fn)
                if cfg.dagger_plant_finetune:
                    p2, rep2 = train.train_plant_in_loop(
                        p1, in_sc, u_sc, t_steps=t_traj,
                        n_traj=cfg.plant_n_traj, steps=cfg.plant_steps,
                        lr=cfg.plant_lr, rterm=0.02, seed=s,
                        process_std=(PROCESS_STD if cfg.flags.enable_noise
                                     else (0.0,) * 5),
                        closed_loop_val_fn=cl_val_fn)
                    # Keep whichever stage validated best on the shared
                    # panel (the fine-tune starts from p1 but can wander).
                    keep_p1 = (cl_val_fn is not None and rep1.cl_val_losses
                               and rep2.cl_val_losses
                               and min(rep1.cl_val_losses)
                               < min(rep2.cl_val_losses))
                    rep2.train_losses = rep1.train_losses + rep2.train_losses
                    rep2.cl_val_losses = (rep1.cl_val_losses
                                          + rep2.cl_val_losses)
                    rep2.wall_time_s += rep1.wall_time_s
                    return (p1 if keep_p1 else p2), rep2
                return p1, rep1
            if cfg.train_mode == "plant":
                if cfg.plant_pretrain:
                    # Imitation pretrain on the FULL-density teacher data
                    # (the every-Nth resampling starves it — same fix as
                    # the dagger branch), then refine through the true
                    # plant (see UnsupervisedConfig notes: from-scratch
                    # plant training plateaus well above the
                    # imitation-initialized optimum).
                    xf, uf, xvf, uvf = _full_density(results, in_sc, u_sc)
                    p0, _ = train.train_supervised(
                        p0, xf, uf, xvf, uvf,
                        epochs=cfg.plant_pretrain_epochs, seed=s)
                return train.train_plant_in_loop(
                    p0, in_sc, u_sc, t_steps=t_traj,
                    n_traj=cfg.plant_n_traj, steps=cfg.plant_steps,
                    lr=cfg.plant_lr, rterm=0.02, seed=s,
                    process_std=(PROCESS_STD if cfg.flags.enable_noise
                                 else (0.0,) * 5),
                    closed_loop_val_fn=cl_val_fn)
            bs = max(cfg.batch_size, 1)
            lr = cfg.lr
            if cfg.lr_schedule == "cosine":
                import optax
                lr = optax.cosine_decay_schedule(
                    cfg.lr, max(1, len(xtr) // bs) * cfg.epochs)
            return train.train_unsupervised(
                p0, surrogate_params, xtr, utr, ztr, xva, uva,
                horizon=cfg.horizon, alpha=cfg.alpha, lr=lr,
                epochs=cfg.epochs, batch_size=bs,
                enable_noise=cfg.flags.enable_noise, seed=s,
                closed_loop_val_fn=cl_val_fn)

        # Multi-seed selection by true-plant closed-loop val MAE (the
        # reference's 10 "sim" replicas; see UnsupervisedConfig.n_seeds).
        best = None
        for k in range(max(1, cfg.n_seeds)):
            s = seed + 1000 * k
            p_k, rep_k = train_one(s)
            score = (float(cl_val_fn(p_k)) if cl_val_fn is not None
                     and cfg.n_seeds > 1 else 0.0)
            if best is None or score < best[0]:
                best = (score, s, p_k, rep_k)
        _, sel_seed, params, rep = best
        rep.selected_seed = sel_seed
    else:
        rep = train.TrainReport()

    pred = fnn.apply(params, jnp.asarray(xte))
    test_metrics = {
        "MAE": float(metrics.mae(jnp.asarray(ute), pred)),
        "RMSE": float(metrics.rmse(jnp.asarray(ute), pred)),
        "R2": float(metrics.r2(jnp.asarray(ute), pred)),
        "Training_time": rep.wall_time_s,
    }
    art = UnsupervisedArtifacts(params, in_sc, u_sc, test_metrics, rep)
    if not closed_loop_eval:
        return art

    policy = fnn.make_policy(params, in_sc, u_sc)
    if cfg.flags.enable_feasibility:
        policy = feasibility.make_recovering_policy(
            policy, feasibility.FeasibilityConfig())
    ctrl = cl.FunctionController(policy)
    loop_cfg = cl.LoopConfig(
        t_steps=t_traj, variant="smooth",
        process_std=PROCESS_STD if cfg.flags.enable_noise else (0.0,) * 5)
    refs = jnp.asarray(streams.reference_table(n_traj_eval, "unsupervised",
                                               t_traj), dtype)
    x0 = jnp.tile(jnp.asarray(cl.press.X0_REFERENCE, dtype), (n_traj_eval, 1))
    run_fn = jax.jit(lambda x, r, k: cl.run_batch(loop_cfg, ctrl, x, r, k))
    _, telem = run_fn(x0, refs, jax.random.PRNGKey(seed + 1))
    telem.u.block_until_ready()
    t0 = time.perf_counter()
    _, telem = run_fn(x0, refs, jax.random.PRNGKey(seed + 1))
    telem.u.block_until_ready()
    per_step_ms = (time.perf_counter() - t0) / t_traj * 1e3

    ref = np.asarray(telem.ref).ravel()
    y_dot = np.asarray(telem.x[..., 1]).ravel()
    nn_metrics = {k: float(v) for k, v in metrics.tracking_metrics(
        jnp.asarray(ref), jnp.asarray(y_dot)).items()}
    nn_metrics["Command"] = float(np.abs(np.asarray(telem.u)).mean())
    if cfg.latency_profile:
        # Local-CPU stepper for the reference-format latency columns;
        # remote-dispatch mean as Tunnel_time (round-3 verdict item 4).
        nn_metrics.update(cl.controller_latency_metrics(
            loop_cfg, ctrl, refs[0], dtype=dtype))
    else:
        nn_metrics["Mean_time"] = per_step_ms
    nn_metrics["Amortized_time"] = per_step_ms
    art.nn_metrics = nn_metrics
    art.nn_telem = telem

    # Parallel free-running surrogate rollout vs truth
    # (Unsupervised Learning/Functions.py:1014-1289)
    track = surrogate_eval.build_feature_track(telem, state_scaler, traj=0)
    preds = surrogate_eval.free_running(surrogate_params, track, cfg.lookback)
    art.surrogate_drift = surrogate_eval.fidelity_metrics(
        preds[:-1], track[cfg.lookback + 1:, :4])

    if out_dir:
        write_artifacts(art, cfg, out_dir)
    return art


def write_artifacts(art: UnsupervisedArtifacts, cfg: UnsupervisedConfig,
                    out_dir: str) -> None:
    """Reference-format artifacts (Unsupervised Learning/Main.py:895-934).

    Tables go under ``<out>/Unsupervised/Tables/`` — the reference keeps
    each experiment's tables in its own directory with identical
    filenames (``Supervised Learning/Tables`` vs ``Unsupervised
    Learning/Tables``); writing both into one Tables/ dir would clobber
    the supervised rows."""
    from ..eval import report
    sfx = f"N_{cfg.horizon}" + ("_noise" if cfg.flags.enable_noise else "")
    sub = "Feasibility" if cfg.flags.enable_feasibility else "Normal"
    base = f"{out_dir}/Unsupervised/Tables/{sub}"
    report.show_tabulate(art.test_metrics,
                         f"{base}/test_results_{sfx}.csv", echo=False)
    report.show_tabulate(art.nn_metrics,
                         f"{base}/NN_results_{sfx}.csv", echo=False)
    report.dump_dataframe(f"{out_dir}/results/Unsupervised_dataframe.txt",
                          art.nn_telem)
    # Shipped-controller checkpoint, mirroring the reference's
    # torch.save -> results/NN_controller_N_10_{sim}.pt
    # (Unsupervised Learning/Main.py); reloadable by the wide-panel
    # evaluation script without retraining.
    from ..utils import checkpoint
    checkpoint.save(
        f"{out_dir}/results/NN_controller_unsupervised_{sfx}.npz",
        {"params": art.params,
         "in_scaler": (art.in_scaler.shift, art.in_scaler.scale),
         "out_scaler": (art.out_scaler.shift, art.out_scaler.scale)},
        meta={"train_mode": cfg.train_mode, "pipeline": "unsupervised"})
