"""CLI sweep + multi-host launcher helper tests."""

import os

import jax
import numpy as np

from forging_control_tpu import cli
from forging_control_tpu.parallel import launcher, mesh as pmesh


def test_cli_sweep(tmp_path):
    cli.main(["sweep", "--horizons", "5", "10", "--n-traj", "2",
              "--t-traj", "6", "--out", str(tmp_path)])
    assert (tmp_path / "forging_mult_traj_process_noise_N_5.npz").exists()
    assert (tmp_path / "forging_mult_traj_process_noise_N_10.npz").exists()


def test_launcher_single_process_noop():
    launcher.initialize(num_processes=1)  # must not raise / not distribute
    m = launcher.global_scenario_mesh()
    assert m.devices.size == jax.device_count()


def test_host_local_batch_to_global():
    m = launcher.global_scenario_mesh()
    x = np.arange(16, dtype=np.float32).reshape(16, 1)
    arr = launcher.host_local_batch_to_global(m, x)
    assert arr.shape == (16, 1)
    np.testing.assert_allclose(np.asarray(arr), x)


def test_cli_supervised_multi_seed(tmp_path):
    """--seeds trains replicas and selects by closed-loop validation MAE."""
    cli.main(["generate", "--n-traj", "2", "--t-traj", "8", "--horizon", "5",
              "--out", str(tmp_path)])
    data = str(tmp_path / "forging_mult_traj_process_noise_N_5.npz")
    cli.main(["supervised", "--data", data, "--horizon", "5", "--epochs", "1",
              "--seeds", "2", "--no-eval", "--out", str(tmp_path)])
