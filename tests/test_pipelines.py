"""End-to-end pipeline tests at reduced scale (CPU-friendly).

Exercises the full L8-equivalent workflows: dataset generation ->
supervised imitation -> surrogate training -> unsupervised MPC-loss
training, mirroring the reference call stacks (SURVEY.md section 3)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from forging_control_tpu.pipelines import (config, generate_data, supervised,
                                           surrogate, unsupervised)


@pytest.fixture(scope="module")
def small_dataset():
    cfg = config.GenerateConfig(
        n_traj=4, t_traj=60, horizon=5,
        flags=config.Flags(enable_noise=True))
    telem, results = generate_data.run(cfg, seed=0, dtype=jnp.float64)
    return cfg, telem, results


def test_generate_dataset(small_dataset, tmp_path):
    cfg, telem, results = small_dataset
    assert results["u"].shape == (4, 60)
    assert results["w"].std() > 0          # noise actually injected
    summ = generate_data.summarize(results)
    assert np.isfinite(summ["MAE"]) and summ["MAE"] < 0.5
    assert summ["inf_pr_max"] < 0.1
    p = generate_data.dataset_path(str(tmp_path), cfg.horizon)
    generate_data.save(results, p)
    loaded = generate_data.load(p)
    np.testing.assert_array_equal(loaded["u"], results["u"])


def test_supervised_pipeline(small_dataset, tmp_path):
    _, _, results = small_dataset
    cfg = config.SupervisedConfig(
        horizon=5, n_traj_eval=1, t_traj=30, epochs=3, batch_size=32)
    art = supervised.run(results, cfg, seed=0, closed_loop_eval=True,
                         out_dir=str(tmp_path), dtype=jnp.float64)
    assert np.isfinite(art.test_metrics["MAE"])
    assert art.mpc_metrics is not None and art.nn_metrics is not None
    assert np.isfinite(art.nn_metrics["MAE"])
    # artifacts written in the reference layout
    assert (tmp_path / "Tables/Normal/test_results_N_5.csv").exists()
    assert (tmp_path / "results/MPC_dataframe.txt").exists()
    rows = np.loadtxt(tmp_path / "results/MPC_dataframe.txt", skiprows=1)
    assert rows.shape == (30, 8)


def test_supervised_dagger_mode(small_dataset):
    """train_mode="dagger" (round-5 item 2): iterated imitation with
    MPC-teacher relabeling runs end to end and returns finite metrics;
    the slot stays pure imitation (no plant fine-tune stage)."""
    _, _, results = small_dataset
    cfg = config.SupervisedConfig(
        horizon=5, n_traj_eval=1, t_traj=60, train_mode="dagger",
        dagger_rounds=1, dagger_n_traj=2, dagger_epochs=2, n_seeds=1,
        latency_profile=False)
    art = supervised.run(results, cfg, seed=0, closed_loop_eval=True,
                         dtype=jnp.float64)
    assert np.isfinite(art.test_metrics["MAE"])
    assert np.isfinite(art.nn_metrics["MAE"])
    # DAgger aggregates teacher-labeled rollout states each round
    assert art.train_report.cl_val_losses, "round scores recorded"


def test_surrogate_pipeline(small_dataset):
    _, _, results = small_dataset
    cfg = config.SurrogateConfig(lookback=10, epochs=3, batch_size=32)
    art = surrogate.run([results], cfg, seed=0, eval_results=results)
    assert np.isfinite(art.test_metrics["MAE"])
    assert art.closed_loop_metrics is not None
    assert np.isfinite(art.closed_loop_metrics["MAE"])


def test_unsupervised_pipeline(small_dataset):
    _, _, results = small_dataset
    s_cfg = config.SurrogateConfig(epochs=2, batch_size=32)
    s_art = surrogate.run([results], s_cfg, seed=0)
    u_cfg = config.UnsupervisedConfig(horizon=5, epochs=2)
    art = unsupervised.run(results, s_art.params, s_art.state_scaler, u_cfg,
                           seed=0, closed_loop_eval=True, t_traj=30,
                           n_traj_eval=1)
    assert np.isfinite(art.test_metrics["MAE"])
    assert art.nn_metrics is not None and np.isfinite(art.nn_metrics["MAE"])
    assert art.surrogate_drift is not None
    # closed-loop model selection ran: one true-plant val MAE per epoch
    assert len(art.train_report.cl_val_losses) == u_cfg.epochs
    assert all(np.isfinite(v) for v in art.train_report.cl_val_losses)


def test_unsupervised_plant_mode_with_pretrain(small_dataset):
    """train_mode="plant" imitation-pretrains then fine-tunes through the
    true plant; selection runs on the noise-matched validation rollout."""
    _, _, results = small_dataset
    s_cfg = config.SurrogateConfig(epochs=1, batch_size=32)
    s_art = surrogate.run([results], s_cfg, seed=0)
    u_cfg = config.UnsupervisedConfig(
        horizon=5, train_mode="plant", plant_steps=3, plant_n_traj=2,
        plant_pretrain=True, plant_pretrain_epochs=2,
        closed_loop_val_traj=2, flags=config.Flags(enable_noise=True))
    art = unsupervised.run(results, s_art.params, s_art.state_scaler, u_cfg,
                           seed=0, closed_loop_eval=True, t_traj=30,
                           n_traj_eval=1)
    assert np.isfinite(art.test_metrics["MAE"])
    assert art.nn_metrics is not None and np.isfinite(art.nn_metrics["MAE"])
    assert art.train_report.cl_val_losses  # selection rollouts ran
    assert all(np.isfinite(v) for v in art.train_report.cl_val_losses)


def test_flags_disable_training(small_dataset):
    _, _, results = small_dataset
    cfg = dataclasses.replace(
        config.SupervisedConfig(horizon=5, epochs=1),
        flags=config.Flags(enable_training=False))
    art = supervised.run(results, cfg, closed_loop_eval=False)
    assert art.train_report.train_losses == []


def test_supervised_multi_seed_selection(small_dataset):
    """n_seeds > 1 trains replicas and returns the one with the best
    true-plant closed-loop validation MAE (the reference's "sim" replica
    protocol with principled selection)."""
    _, _, results = small_dataset
    cfg = config.SupervisedConfig(
        horizon=5, n_traj_eval=1, t_traj=30, epochs=2, batch_size=32,
        n_seeds=2)
    art = supervised.run(results, cfg, seed=0, closed_loop_eval=False,
                         dtype=jnp.float64)
    assert art.train_report.selected_seed in (0, 1000)
    assert np.isfinite(art.test_metrics["MAE"])


def test_config_bundle_round_trip(tmp_path):
    """save_config/load_config: the Save_Network_Data-equivalent
    hyperparameter bundle round-trips exactly (reference pickles a record
    to results/NN_model_data.bin, Model_NN/Functions.py:1076-1114, whose
    load path broke across library versions)."""
    cfgs = [
        config.GenerateConfig(horizon=15, solver_preset="fast"),
        config.SupervisedConfig(epochs=3, n_seeds=2,
                                flags=config.Flags(enable_noise=True)),
        config.SurrogateConfig(horizons=(5, 10)),
        config.UnsupervisedConfig(train_mode="plant", lr=5e-4),
    ]
    for i, cfg in enumerate(cfgs):
        p = tmp_path / f"bundle_{i}.json"
        config.save_config(str(p), cfg)
        assert config.load_config(str(p)) == cfg


def test_backend_auto_resolution():
    """GenerateConfig/SupervisedConfig backend="auto" resolves to the
    measured-best solver per horizon (VERDICT r2 task 2)."""
    from forging_control_tpu.loop import closed_loop as cl
    from forging_control_tpu.solver import sqp as sqp_mod

    assert cl.resolve_backend("auto", 10) == "sqp"
    assert cl.resolve_backend("auto", 12) == "sqp"
    assert cl.resolve_backend("auto", 13) == "ilqr"
    assert cl.resolve_backend("auto", 25) == "ilqr"
    assert cl.resolve_backend("ilqr", 5) == "ilqr"
    ctrl = cl.MPCController(sqp_mod.MPCConfig(horizon=25), backend="auto")
    assert ctrl.backend == "ilqr" and ctrl.supports_batch
    ctrl = cl.MPCController(sqp_mod.MPCConfig(horizon=10), backend="auto")
    assert ctrl.backend == "sqp"


def test_supervised_pipeline_feasibility_variant(small_dataset, tmp_path):
    """enable_feasibility threads the recovery projection through the NN
    closed loop and writes the Tables/Feasibility/ layout (the reference's
    do_feasibility switch, Supervised Learning/Main.py:62-80)."""
    _, _, results = small_dataset
    cfg = config.SupervisedConfig(
        horizon=5, n_traj_eval=1, t_traj=30, epochs=2, batch_size=32,
        latency_profile=False,
        flags=config.Flags(enable_feasibility=True))
    art = supervised.run(results, cfg, seed=0, closed_loop_eval=True,
                         out_dir=str(tmp_path), dtype=jnp.float64)
    assert np.isfinite(art.nn_metrics["MAE"])
    assert (tmp_path / "Tables/Feasibility/NN_results_N_5.csv").exists()
