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


def test_solve_batch_matches_vmap_solve():
    """The explicit-batch path is semantically vmap(solve)."""
    cfg = sqp.MPCConfig(horizon=8, variant="smooth", gn_iters=4, al_iters=2)
    B = 5
    key = jax.random.PRNGKey(0)
    x0 = jnp.tile(jnp.asarray(press.X0_REFERENCE, jnp.float64), (B, 1))
    x0 = x0 + 0.01 * jax.random.normal(key, x0.shape, jnp.float64) * x0
    ref = jnp.linspace(-0.7, 0.7, B, dtype=jnp.float64)
    up = jnp.linspace(-0.05, 0.05, B, dtype=jnp.float64)
    st = riccati.ILQRState(
        v=jnp.zeros((B, cfg.horizon), jnp.float64),
        lam=jnp.zeros((B, cfg.horizon, 2), jnp.float64))

    u_b, st_b, d_b = jax.jit(
        lambda *a: riccati.solve_batch(cfg, *a))(x0, ref, up, st)

    def one(x, r, u, v, lam):
        return riccati.solve(cfg, x, r, u, riccati.ILQRState(v, lam))

    u_v, st_v, d_v = jax.jit(jax.vmap(one))(x0, ref, up, st.v, st.lam)
    np.testing.assert_allclose(np.array(u_b), np.array(u_v), rtol=1e-12,
                               atol=1e-14)
    np.testing.assert_allclose(np.array(st_b.v), np.array(st_v.v),
                               rtol=1e-12, atol=1e-14)
    np.testing.assert_array_equal(np.array(d_b.iters), np.array(d_v.iters))


def test_convergence_masking_and_inf_du():
    """Extra iterations are no-ops once converged: iters stops counting,
    inf_du is a real dual-infeasibility measure that shrinks, and the
    command is unchanged."""
    x = jnp.asarray(press.X0_REFERENCE, jnp.float64)
    cfg_a = sqp.MPCConfig(horizon=10, variant="smooth", gn_iters=8,
                          al_iters=2)
    cfg_b = sqp.MPCConfig(horizon=10, variant="smooth", gn_iters=30,
                          al_iters=2)
    u_a, _, d_a = riccati.solve(cfg_a, x, 0.578157, 0.0,
                                riccati.init_state(cfg_a, jnp.float64))
    u_b, _, d_b = riccati.solve(cfg_b, x, 0.578157, 0.0,
                                riccati.init_state(cfg_b, jnp.float64))
    # masked iteration count: far fewer than the 30-iteration budget
    assert int(d_b.iters) < 30
    assert float(d_b.inf_du) < 1e-5
    np.testing.assert_allclose(float(u_a), float(u_b), rtol=1e-9, atol=1e-12)


def test_n25_scipy_crosscheck(golden_mpc_rows):
    """Generate-Data flagship horizon (N=25, template_mpc.py:20): the
    batched Riccati backend must match an independent NLP solver (scipy
    trust-constr on the same condensed NLP) to <= 1e-3 relative command
    error, cold start, f64.  Full 8-point sweep: scripts/riccati_parity25.py
    (measured max_rel 1.4e-7)."""
    from scipy.optimize import NonlinearConstraint, minimize

    from forging_control_tpu.physics.scaling import U_SCALE

    cfg = sqp.MPCConfig(horizon=25, variant="raw", gn_iters=8, al_iters=2)
    rows = golden_mpc_rows[:300]
    states = np.vstack([press.X0_REFERENCE, rows[:299, 2:7]])
    uprev = np.concatenate([[0.0], rows[:299, 7]])

    obj_g = jax.jit(jax.value_and_grad(
        lambda v, x0, r, up: sqp._objective_only(cfg, x0, r, up / U_SCALE, v)))
    con = jax.jit(lambda v, x0: sqp._constraints(cfg, sqp._rollout(cfg, x0, v)))
    con_j = jax.jit(jax.jacfwd(con, argnums=0))

    for i in (40, 120, 260):  # plateau, transient, return stroke
        x0 = jnp.array(states[i])
        ref, up = float(rows[i, 1]), float(uprev[i])
        u0, _, _ = riccati.solve(cfg, x0, ref, up,
                                 riccati.init_state(cfg, jnp.float64))
        nlc = NonlinearConstraint(
            lambda v: np.array(con(jnp.array(v), x0)), 0.0, np.inf,
            jac=lambda v: np.array(con_j(jnp.array(v), x0)))
        res = minimize(
            lambda v: tuple(map(np.array, obj_g(jnp.array(v), x0, ref, up))),
            np.zeros(cfg.horizon), jac=True, method="trust-constr",
            constraints=[nlc],
            options={"gtol": 1e-10, "xtol": 1e-12, "maxiter": 600})
        u0_sp = res.x[0] * U_SCALE
        assert abs(float(u0) - u0_sp) / max(abs(u0_sp), 1e-2) < 1e-3, (
            f"step {i}: ilqr {float(u0)} vs scipy {u0_sp}")
