"""AL-iLQR backend tests: cross-validation against the condensed SQP."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from forging_control_tpu.physics import press
from forging_control_tpu.solver import riccati, sqp

CFG = sqp.MPCConfig(horizon=10, variant="smooth", gn_iters=12, al_iters=3)


def _solve_both(x, ref, u_prev):
    st_s = sqp.init_state(CFG, jnp.float64)
    u_s, _, d_s = sqp.solve(CFG, jnp.asarray(x, jnp.float64), ref, u_prev, st_s)
    st_r = riccati.init_state(CFG, jnp.float64)
    u_r, _, d_r = riccati.solve(CFG, jnp.asarray(x, jnp.float64), ref, u_prev,
                                st_r)
    return float(u_s), float(u_r), d_s, d_r


@pytest.mark.parametrize("ref,u_prev", [(0.578157, 0.0), (-0.4, -0.05),
                                        (0.2, 0.1)])
def test_backends_agree_from_x0(ref, u_prev):
    u_s, u_r, d_s, d_r = _solve_both(np.array(press.X0_REFERENCE), ref, u_prev)
    assert abs(u_s - u_r) < 2e-4, (u_s, u_r)
    assert abs(float(d_s.obj) - float(d_r.obj)) < 1e-3 * (1 + float(d_s.obj))


def test_backends_agree_midtrajectory(golden_mpc_rows):
    rows = golden_mpc_rows
    for t in (50, 100, 250):
        x = rows[t - 1, 2:7]
        u_s, u_r, _, _ = _solve_both(x, rows[t, 1], rows[t - 1, 7])
        assert abs(u_s - u_r) < 5e-4, (t, u_s, u_r)


def test_riccati_ipopt_parity(golden_mpc_rows):
    """The independent backend must also reproduce the recorded IPOPT
    commands away from the cavitation transient."""
    rows = golden_mpc_rows[:150]   # pre-transient window
    states = np.vstack([press.X0_REFERENCE, rows[:-1, 2:7]])
    uprev = np.concatenate([[0.0], rows[:-1, 7]])

    @jax.jit
    def batch(xs, rs, ups):
        def one(x, r, up):
            u0, _, _ = riccati.solve(CFG, x, r, up,
                                     riccati.init_state(CFG, jnp.float64))
            return u0
        return jax.vmap(one)(xs, rs, ups)

    u0 = np.array(batch(jnp.array(states), jnp.array(rows[:, 1]),
                        jnp.array(uprev)))
    rel = np.abs(u0 - rows[:, 7]) / np.maximum(np.abs(rows[:, 7]), 1e-2)
    assert np.median(rel) < 1e-3
    assert np.mean(rel < 1e-2) > 0.95


def test_constraint_activation():
    cfg = CFG
    x = jnp.asarray([0.08, 0.3, 0.0, 9e6, 0.07], jnp.float64)
    st = riccati.init_state(cfg, jnp.float64)
    u0, stn, d = riccati.solve(cfg, x, -0.5, 0.05, st)
    assert float(d.inf_pr) < 5e-3
    assert np.isfinite(float(u0))


def test_warm_start_and_shift():
    st = riccati.ILQRState(v=jnp.arange(5.0), lam=jnp.zeros((5, 2)))
    sh = riccati.shift_state(st)
    np.testing.assert_allclose(np.array(sh.v), [1, 2, 3, 4, 4])


def test_ilqr_controller_in_loop():
    """The iLQR backend drives the closed-loop engine and tracks."""
    from forging_control_tpu.loop import closed_loop as cl
    cfg = sqp.MPCConfig(horizon=5, variant="smooth", gn_iters=6, al_iters=1)
    ctrl = cl.MPCController(cfg, backend="ilqr")
    refs = jnp.full((1, 60), 0.5)
    x0 = cl.default_x0()[None]
    _, telem = jax.jit(lambda x, r, k: cl.run_batch(
        cl.LoopConfig(t_steps=60, variant="smooth"), ctrl, x, r, k))(
            x0, refs, jax.random.PRNGKey(0))
    err = np.abs(np.array(telem.x[0, 45:, 1]) - 0.5)
    assert err.mean() < 0.03
