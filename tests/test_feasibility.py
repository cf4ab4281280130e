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


def test_recovering_policy_wrapper():
    base = lambda x, r, up: jnp.asarray(-0.2)
    pol = feasibility.make_recovering_policy(base, CFG)
    x0 = jnp.asarray([0.08, 0.15, 2e5, 9e6, 0.05])
    u = pol(x0, -0.5, 0.0)
    assert -0.2 <= float(u) <= 0.2
    c = feasibility._lookahead_constraints(CFG, x0, u)
    assert float(jnp.min(c)) > -2e-3
