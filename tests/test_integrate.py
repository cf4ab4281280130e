"""Integrator tests, including the CVODES golden-parity replay."""

import jax
import jax.numpy as jnp
import numpy as np

from forging_control_tpu.integrate.rk4 import make_stepper, rk4_step
from forging_control_tpu.physics import press


def test_rk4_linear_exactness():
    # dx/dt = A x has exact solution; RK4 should be ~O(h^5) accurate.
    A = jnp.array([[0.0, 1.0], [-4.0, -0.4]])
    f = lambda x, u: x @ A.T
    x0 = jnp.array([1.0, 0.0])
    x1 = rk4_step(f, x0, 0.0, 0.01, substeps=1)
    import scipy.linalg
    want = scipy.linalg.expm(np.array(A) * 0.01) @ np.array(x0)
    np.testing.assert_allclose(np.array(x1), want, rtol=1e-7)


def test_disturbance_is_additive():
    f = lambda x, u: -x
    x0 = jnp.array([1.0])
    w = jnp.array([2.0])
    # dx/dt = -x + 2 -> fixed point at 2
    x = x0
    for _ in range(2000):
        x = rk4_step(f, x, 0.0, 0.01, substeps=1, disturbance=w)
    np.testing.assert_allclose(np.array(x), [2.0], rtol=1e-6)


def test_single_step_golden_parity(golden_mpc_rows):
    """One-control-period RK4 from each recorded state must reproduce the
    CVODES next state to <=1e-3 relative error wherever the full state is
    observable (p > 0; at p = 0 the recording is the floored measurement of
    a hidden negative pressure — see test_open_loop below which covers it)."""
    rows = golden_mpc_rows[:300]
    f = lambda x, u: press.rhs(x, u, variant="smooth")
    xs = jnp.array(rows[:-1, 2:7])
    us = jnp.array(rows[1:, 7])
    step = jax.jit(jax.vmap(lambda x, u: rk4_step(f, x, u, 0.001, 4)))
    meas = jax.vmap(lambda x: press.measure(x, variant="smooth"))
    pred = np.array(meas(step(xs, us)))
    gold = rows[1:, 2:7]
    mask = (rows[:-1, 4] > 1) & (rows[:-1, 5] > 1) & (rows[1:, 4] > 1) & (rows[1:, 5] > 1)
    rel = np.abs(pred - gold)[mask] / np.maximum(np.abs(gold)[mask], 1e-2)
    assert rel.max() < 1e-3, rel.max(axis=0)


def test_open_loop_replay_golden_parity(golden_mpc_rows):
    """Replay the full recorded input sequence of both golden trajectories
    through RK4 from the reference initial state: the measured outputs must
    track the CVODES recording over all 300 steps (catches drift,
    stiffness, and the hidden cavitated-pressure transient)."""
    f = lambda x, u: press.rhs(x, u, variant="smooth")

    @jax.jit
    def rollout(x0, us):
        def step(x, u):
            xn = rk4_step(f, x, u, 0.001, 4)
            return xn, press.measure(xn, variant="smooth")
        _, ys = jax.lax.scan(step, x0, us)
        return ys

    for traj in range(2):
        rows = golden_mpc_rows[traj * 300:(traj + 1) * 300]
        ys = np.array(rollout(jnp.array(press.X0_REFERENCE), jnp.array(rows[:, 7])))
        gold = rows[:, 2:7]
        err = np.abs(ys - gold)
        # Tolerances by state: y [m], y_dot [m/s], p [Pa], z [-].  Open-loop
        # error accumulates through the hidden cavitated-pressure transient
        # around the work->return switch (~2.6% worst-case on p2 for traj 1);
        # the single-step test above enforces the tight <1e-3 bound.
        assert err[:, 0].max() < 1e-4
        assert err[:, 1].max() < 1e-2
        assert err[:, 2].max() < 1e6
        assert err[:, 3].max() < 1e6
        assert err[:, 4].max() < 1e-4


def test_make_stepper_closure():
    f = lambda x, u: press.rhs(x, u, variant="raw")
    step = make_stepper(f, 1e-3, 4)
    x1 = step(jnp.array(press.X0_REFERENCE), 0.03)
    assert np.all(np.isfinite(np.array(x1)))
