"""Closed-loop engine tests, including closed-loop golden comparison."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from forging_control_tpu.eval import metrics
from forging_control_tpu.loop import closed_loop as cl
from forging_control_tpu.physics import press
from forging_control_tpu.refgen import streams
from forging_control_tpu.solver import sqp


def _mpc_controller(**kw):
    cfg = sqp.MPCConfig(horizon=10, variant="smooth", **kw)
    return cl.MPCController(cfg)


@pytest.fixture(scope="module")
def golden_closed_loop(golden_mpc_rows):
    """Run our full MPC closed loop on the recorded reference streams."""
    loop_cfg = cl.LoopConfig(t_steps=300, variant="smooth")
    ctrl = _mpc_controller(gn_iters=10, al_iters=2)
    refs = jnp.array(golden_mpc_rows[:, 1].reshape(2, 300))
    x0 = jnp.tile(cl.default_x0(), (2, 1))

    run = jax.jit(lambda x, r, k: cl.run_batch(loop_cfg, ctrl, x, r, k))
    _, telem = run(x0, refs, jax.random.PRNGKey(0))
    return telem, golden_mpc_rows


def test_closed_loop_tracking_matches_reference(golden_closed_loop):
    """Closed-loop speed tracking must match the reference MPC's recorded
    quality (MPC_results_N_10.csv: MAE 0.045209, R2 0.906169) within a
    few percent — the solver differences at the cavitation transient
    (see test_solver) shift it slightly."""
    telem, rows = golden_closed_loop
    ref = np.array(telem.ref).ravel()
    y_dot = np.array(telem.x[..., 1]).ravel()
    m = {k: float(v) for k, v in metrics.tracking_metrics(ref, y_dot).items()}
    assert abs(m["MAE"] - 0.045209) < 0.01
    assert m["R2"] > 0.88


def test_closed_loop_commands_close_to_golden(golden_closed_loop):
    """Command trajectories stay close to the recorded IPOPT closed loop
    outside the transient windows."""
    telem, rows = golden_closed_loop
    u = np.array(telem.u).reshape(-1)
    ugold = rows[:, 7]
    # overall: mean abs deviation small; >=90% of steps within 2e-3
    err = np.abs(u - ugold)
    assert err.mean() < 5e-3
    assert np.mean(err < 2e-3) > 0.9


def test_telemetry_schema(golden_closed_loop):
    telem, _ = golden_closed_loop
    assert telem.x.shape == (2, 300, 5)
    assert telem.u.shape == (2, 300)
    assert telem.ref.shape == (2, 300)
    assert telem.Fd.shape == (2, 300)
    assert telem.w.shape == (2, 300, 5)
    assert telem.diag.iters.shape == (2, 300)
    assert np.all(np.isfinite(np.array(telem.x)))


def test_process_noise_injection():
    """With process noise the trajectories diverge across seeds and the
    noise record is nonzero (Generate Data/Main.py:49-58 config)."""
    loop_cfg = cl.LoopConfig(
        t_steps=40, variant="smooth",
        process_std=(5e-1, 2e0, 5e7, 5e7, 2e0))
    ctrl = _mpc_controller(gn_iters=6, al_iters=1)
    refs = jnp.array(streams.reference_table(1, "supervised")[:, :40])
    x0 = cl.default_x0()[None]

    run = jax.jit(lambda x, r, k: cl.run_batch(loop_cfg, ctrl, x, r, k))
    _, t1 = run(x0, refs, jax.random.PRNGKey(1))
    _, t2 = run(x0, refs, jax.random.PRNGKey(2))
    assert float(np.abs(np.array(t1.w)).max()) > 0
    assert not np.allclose(np.array(t1.x), np.array(t2.x))
    assert np.all(np.isfinite(np.array(t1.x)))


def test_function_controller_loop():
    """NN-style stateless policy in the same engine (NeuralNetwork.loop
    analogue): a proportional law tracks crudely but runs."""
    loop_cfg = cl.LoopConfig(t_steps=60, variant="smooth")

    def policy(x_meas, ref, u_prev):
        return jnp.clip(0.2 * (ref - x_meas[1]) + u_prev, -0.2, 0.2)

    ctrl = cl.FunctionController(policy)
    refs = jnp.array(streams.reference_table(1, "supervised")[:, :60])
    _, telem = jax.jit(lambda x, r, k: cl.run_batch(loop_cfg, ctrl, x, r, k))(
        cl.default_x0()[None], refs, jax.random.PRNGKey(0))
    assert np.all(np.abs(np.array(telem.u)) <= 0.2 + 1e-9)
    assert np.all(np.isfinite(np.array(telem.x)))


def test_batch_vmap_consistency():
    """A batch of identical scenarios without noise must produce identical
    trajectories (pure-function engine)."""
    loop_cfg = cl.LoopConfig(t_steps=25, variant="smooth")
    ctrl = _mpc_controller(gn_iters=6, al_iters=1)
    refs = jnp.tile(jnp.array(streams.reference_table(1, "supervised")[:, :25]), (3, 1))
    x0 = jnp.tile(cl.default_x0(), (3, 1))
    _, telem = jax.jit(lambda x, r, k: cl.run_batch(loop_cfg, ctrl, x, r, k))(
        x0, refs, jax.random.PRNGKey(0))
    u = np.array(telem.u)
    np.testing.assert_allclose(u[0], u[1], rtol=0, atol=1e-12)
    np.testing.assert_allclose(u[0], u[2], rtol=0, atol=1e-12)


def test_ipopt_compat_closed_loop_bit_parity(golden_mpc_rows):
    """MPCConfig.ipopt_compat reproduces the *recorded* IPOPT closed loop
    through the cavitation transient (where the recorded iterates violate
    p >= 0 by ~5e6 Pa): tracking MAE within 1e-3 of the recording and
    mean command deviation < 5e-4 (measured 0.04554 vs 0.04521, 1.4e-4 —
    scripts/ipopt_compat_exp.py)."""
    loop_cfg = cl.LoopConfig(t_steps=300, variant="smooth")
    ctrl = cl.MPCController(sqp.MPCConfig.ipopt_compat(horizon=10,
                                                       variant="smooth"))
    refs = jnp.array(golden_mpc_rows[:, 1].reshape(2, 300))
    x0 = jnp.tile(cl.default_x0(), (2, 1))
    _, telem = jax.jit(lambda x, r, k: cl.run_batch(loop_cfg, ctrl, x, r, k))(
        x0, refs, jax.random.PRNGKey(0))
    y_dot = np.array(telem.x[..., 1]).ravel()
    ref = np.array(telem.ref).ravel()
    golden_mae = np.abs(golden_mpc_rows[:, 3] - golden_mpc_rows[:, 1]).mean()
    assert abs(np.abs(y_dot - ref).mean() - golden_mae) < 1e-3
    u_dev = np.abs(np.array(telem.u).ravel() - golden_mpc_rows[:, 7])
    assert u_dev.mean() < 5e-4


def test_fused_batch_matches_vmap_path():
    """run_batch's fused explicit-batch body (MPCController.linsolve set)
    reproduces the vmap path exactly: same per-trajectory RNG streams,
    same solves, to float64 tolerance — with process noise on."""
    loop_cfg = cl.LoopConfig(t_steps=20, variant="smooth",
                             process_std=(5e-1, 2e0, 5e7, 5e7, 2e0))
    cfg = sqp.MPCConfig(horizon=5, variant="smooth", gn_iters=4, al_iters=1)
    refs = jnp.array(streams.reference_table(3, "supervised")[:, :20])
    x0 = jnp.tile(cl.default_x0(), (3, 1))
    key = jax.random.PRNGKey(7)

    _, t_vmap = jax.jit(lambda x, r, k: cl.run_batch(
        loop_cfg, cl.MPCController(cfg), x, r, k))(x0, refs, key)
    _, t_fused = jax.jit(lambda x, r, k: cl.run_batch(
        loop_cfg, cl.MPCController(cfg, linsolve="unrolled"), x, r, k))(
        x0, refs, key)

    np.testing.assert_allclose(np.array(t_fused.u), np.array(t_vmap.u),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.array(t_fused.x), np.array(t_vmap.x),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.array(t_fused.w), np.array(t_vmap.w),
                               rtol=0, atol=0)


def test_single_stream_stepper():
    """make_stepper (donated-carry B=1 deployment path) reproduces
    run_trajectory's scan exactly: same controller warm-start evolution,
    same RNG stream, same commands."""
    loop_cfg = cl.LoopConfig(t_steps=8, variant="smooth",
                             process_std=(5e-1, 2e0, 5e7, 5e7, 2e0))
    cfg = sqp.MPCConfig(horizon=5, variant="smooth", gn_iters=3, al_iters=1)
    ctrl = cl.MPCController(cfg)
    refs = jnp.full((8,), 0.3, jnp.float64)
    key = jax.random.PRNGKey(7)
    x0 = jnp.asarray(cl.press.X0_REFERENCE, jnp.float64)

    _, telem = jax.jit(lambda x, r, k: cl.run_trajectory(
        loop_cfg, ctrl, x, r, k))(x0, refs, key)

    step, carry = cl.make_stepper(loop_cfg, ctrl, x0=x0, key=key,
                                  dtype=jnp.float64, aot=False)
    us = []
    for t in range(8):
        carry, u = step(carry, refs[t])
        us.append(float(u))
    np.testing.assert_allclose(np.array(us), np.array(telem.u), rtol=1e-12,
                               atol=1e-12)


def test_controller_latency_metrics_cpu_columns():
    """Reference-format latency columns come from the local-CPU stepper
    (controller compute, not transport); on a CPU-only default backend
    there is no Tunnel_time column (round-3 verdict item 4)."""
    loop_cfg = cl.LoopConfig(t_steps=6, variant="smooth")
    ctrl = cl.FunctionController(
        lambda x, ref, u_prev: jnp.clip(0.05 * (ref - x[1]), -0.2, 0.2))
    refs = jnp.full((6,), 0.3, jnp.float32)
    m = cl.controller_latency_metrics(loop_cfg, ctrl, refs)
    for k in ("Mean_time", "Std_time", "Median_time", "25_perc", "75_perc"):
        assert k in m and np.isfinite(m[k]) and m[k] >= 0
    assert "Tunnel_time" not in m  # tests pin the default backend to CPU
