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


def test_two_process_distributed_closed_loop(tmp_path):
    """REAL multi-process execution: two jax.distributed CPU processes
    (localhost coordinator, gloo collectives), each owning 2 devices of a
    4-device global mesh, run launcher.initialize +
    host_local_batch_to_global + the scenario-sharded closed-loop MPC +
    psum metrics — and must agree with each other and with a
    single-process run of the identical batch."""
    import json
    import socket
    import subprocess
    import sys

    import jax.numpy as jnp

    from forging_control_tpu.loop import closed_loop as cl
    from forging_control_tpu.solver import sqp

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    worker = os.path.join(os.path.dirname(__file__), "mp_worker.py")
    outs = [str(tmp_path / f"proc{i}.json") for i in range(2)]
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    procs = [subprocess.Popen(
        [sys.executable, worker, str(i), "2", str(port), outs[i]], env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)]
    logs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for p, log_text in zip(procs, logs):
        assert p.returncode == 0, log_text[-3000:]

    r0, r1 = [json.load(open(o)) for o in outs]
    assert r0["process_count"] == 2 and r0["global_devices"] == 4
    # Replicated results agree across processes bitwise — including the
    # fused iLQR batch path and the data-parallel training step.
    for k in ("MAE", "RMSE", "R2", "u_checksum", "u_checksum_ilqr",
              "dp_loss", "dp_param_checksum"):
        assert r0[k] == r1[k], (k, r0[k], r1[k])

    # Single-process reference run of the identical global batch.
    cfg = sqp.MPCConfig(horizon=5, variant="smooth", gn_iters=2, al_iters=1)
    loop_cfg = cl.LoopConfig(t_steps=6, variant="smooth")
    ctrl = cl.MPCController(cfg)
    x0 = jnp.tile(jnp.asarray(cl.press.X0_REFERENCE, jnp.float64), (4, 1))
    refs = jnp.linspace(-0.6, 0.6, 4, dtype=jnp.float64)[:, None] \
        * jnp.ones((1, 6), jnp.float64)
    _, telem = jax.jit(lambda x, r, k: cl.run_batch(loop_cfg, ctrl, x, r, k))(
        x0, refs, jax.random.PRNGKey(0))
    mae = float(jnp.mean(jnp.abs(telem.ref - telem.x[..., 1])))
    np.testing.assert_allclose(r0["MAE"], mae, rtol=1e-9)
    np.testing.assert_allclose(r0["u_checksum"], float(jnp.sum(telem.u)),
                               rtol=1e-9)

    # Fused iLQR batch path: single-process reference of the same batch.
    ctrl_i = cl.MPCController(cfg, backend="ilqr")
    _, telem_i = jax.jit(lambda x, r, k: cl.run_batch(
        loop_cfg, ctrl_i, x, r, k))(x0, refs, jax.random.PRNGKey(0))
    np.testing.assert_allclose(r0["u_checksum_ilqr"],
                               float(jnp.sum(telem_i.u)), rtol=1e-9)
