"""Feasibility-recovery projection tests."""

import jax
import jax.numpy as jnp
import numpy as np

from forging_control_tpu.physics import press
from forging_control_tpu.solver import feasibility

CFG = feasibility.FeasibilityConfig()


def test_feasible_command_unchanged():
    """A command whose lookahead stays inside the pressure box must pass
    through (the projection objective pulls u to u_NN)."""
    x0 = jnp.asarray(press.X0_REFERENCE)
    res = feasibility.recover(CFG, jnp.asarray(0.03), x0)
    assert abs(float(res.u) - 0.03) < 1e-6
    assert float(res.violation) < 1e-6


def test_infeasible_command_projected():
    """From a near-cavitation state, a hard negative command must be pulled
    back until the 2-step lookahead keeps p1 >= 0."""
    x0 = jnp.asarray([0.08, 0.15, 2e5, 9e6, 0.05])
    u_nn = jnp.asarray(-0.2)
    base = feasibility._lookahead_constraints(CFG, x0, u_nn)
    assert float(jnp.min(base)) < 0  # genuinely infeasible input
    res = feasibility.recover(CFG, u_nn, x0)
    assert float(res.violation) < 2e-3     # scaled by 32e6 => < ~6e4 Pa
    assert float(res.changed) > 1e-3       # command actually moved
    c = feasibility._lookahead_constraints(CFG, x0, res.u)
    assert float(jnp.min(c)) > -2e-3


def test_projection_minimality():
    """The recovered command should be the *closest* feasible command:
    nudging it further from u_NN while feasible means suboptimal, and
    nudging toward u_NN must break feasibility."""
    x0 = jnp.asarray([0.08, 0.15, 2e5, 9e6, 0.05])
    u_nn = jnp.asarray(-0.2)
    res = feasibility.recover(CFG, u_nn, x0)
    toward = res.u + 0.7 * (u_nn - res.u)
    c = feasibility._lookahead_constraints(CFG, x0, toward)
    assert float(jnp.min(c)) < -1e-3


def test_vmap_and_jit():
    x0 = jnp.tile(jnp.asarray(press.X0_REFERENCE), (4, 1))
    u = jnp.asarray([0.05, -0.2, 0.1, 0.0])
    f = jax.jit(jax.vmap(lambda uu, xx: feasibility.recover(CFG, uu, xx).u))
    out = f(u, x0)
    assert out.shape == (4,)
    assert np.all(np.isfinite(np.array(out)))


def test_warm_start_carry_matches_cold_on_feasible():
    """Warm-started projection agrees with the cold multi-start path on a
    feasible command and carries the solution forward (reference semantics:
    Supervised Learning/Functions.py:986-994)."""
    x0 = jnp.asarray(press.X0_REFERENCE)
    warm = feasibility.init_warm(CFG)
    res, warm2 = feasibility.recover_warm(CFG, jnp.asarray(0.03), x0, warm)
    assert abs(float(res.u) - 0.03) < 1e-6
    assert float(res.violation) < 1e-6
    # carry holds the solution, not zeros
    assert abs(float(warm2.u) - 0.03) < 1e-6


def test_warm_start_failure_fallback():
    """On failure the reference applies the *previous* command and resets
    the warm start to zeros (Functions.py:1004-1008).  Force the failure
    branch via the tolerance and check both behaviors."""
    x0 = jnp.asarray(press.X0_REFERENCE)
    warm = feasibility.WarmStart(
        u=jnp.asarray(0.123), lam=jnp.ones((4 * CFG.lookahead,)))
    res, warm2 = feasibility.recover_warm(
        CFG, jnp.asarray(0.05), x0, warm, fail_tol=-1.0)
    assert abs(float(res.u) - 0.123) < 1e-12      # previous command applied
    assert float(jnp.max(jnp.abs(warm2.lam))) == 0.0  # warm start reset
    assert float(warm2.u) == 0.0


def test_warm_carry_closed_loop_matches_cold():
    """RecoveringController (warm carry threaded through the episode) vs
    the cold multi-start policy wrapper over a short closed loop: both stay
    feasible and agree on most steps.  (Exact agreement is not expected:
    the 2-step pressure landscape is nonconvex in u, and warm seeding vs a
    multi-start grid can settle different basins on transient steps — the
    measured A/B lives in scripts/feasibility_ab.py.)"""
    from forging_control_tpu.loop import closed_loop as cl

    base = lambda x, r, up: jnp.clip(4.0 * (r - x[1]), -0.25, 0.25)
    loop_cfg = cl.LoopConfig(t_steps=40, variant="raw")
    x0 = jnp.asarray(press.X0_REFERENCE)
    refs = jnp.where(jnp.arange(40) < 20, 0.35, -0.35)
    key = jax.random.PRNGKey(0)

    warm_ctrl = feasibility.RecoveringController(base, CFG)
    _, t_warm = jax.jit(lambda x, r, k: cl.run_trajectory(
        loop_cfg, warm_ctrl, x, r, k))(x0, refs, key)

    cold_ctrl = cl.FunctionController(
        feasibility.make_recovering_policy(base, CFG))
    _, t_cold = jax.jit(lambda x, r, k: cl.run_trajectory(
        loop_cfg, cold_ctrl, x, r, k))(x0, refs, key)

    u_w, u_c = np.array(t_warm.u), np.array(t_cold.u)
    assert np.all(np.isfinite(u_w))
    # majority of steps agree; disagreements are basin-level, bounded
    assert np.mean(np.abs(u_w - u_c) < 5e-3) > 0.7
    assert np.abs(u_w - u_c).max() < 0.5
    # the warm run's applied commands keep the lookahead feasible
    x_pre = np.vstack([np.array(press.measure(
        x0, loop_cfg.params, loop_cfg.variant))[None], np.array(t_warm.x)[:-1]])
    c = jax.vmap(lambda xx, uu: feasibility._lookahead_constraints(
        CFG, xx, uu))(jnp.array(x_pre), t_warm.u)
    assert float(jnp.min(c)) > -2e-2


def test_recover_warm_vmap():
    x0 = jnp.tile(jnp.asarray(press.X0_REFERENCE), (3, 1))
    u = jnp.asarray([0.05, -0.2, 0.1])
    warm = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (3,) + a.shape),
        feasibility.init_warm(CFG))
    f = jax.jit(jax.vmap(
        lambda uu, xx, ww: feasibility.recover_warm(CFG, uu, xx, ww)[0].u))
    out = f(u, x0, warm)
    assert out.shape == (3,)
    assert np.all(np.isfinite(np.array(out)))


def test_recovering_policy_wrapper():
    base = lambda x, r, up: jnp.asarray(-0.2)
    pol = feasibility.make_recovering_policy(base, CFG)
    x0 = jnp.asarray([0.08, 0.15, 2e5, 9e6, 0.05])
    u = pol(x0, -0.5, 0.0)
    assert -0.2 <= float(u) <= 0.2
    c = feasibility._lookahead_constraints(CFG, x0, u)
    assert float(jnp.min(c)) > -2e-3
