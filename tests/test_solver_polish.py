"""Round-2 solver additions: per-iteration trace + active-set polish."""

import jax
import jax.numpy as jnp
import numpy as np

from forging_control_tpu.physics import press
from forging_control_tpu.solver import sqp

X0 = jnp.asarray(press.X0_REFERENCE, jnp.float64)


def _solve(cfg, x=X0, ref=0.578157, up=0.0):
    return jax.jit(lambda: sqp.solve(cfg, x, ref, up,
                                     sqp.init_state(cfg, jnp.float64)))()


def test_record_trace_schema():
    """Diagnostics.trace: (al*gn, len(TRACE_COLS)) per-iteration history,
    finite, with the true objective decreasing over the run (the analogue
    of the per-iteration IPOPT arrays, Generate Data/Functions.py:366-372)."""
    cfg = sqp.MPCConfig(horizon=6, variant="smooth", gn_iters=5, al_iters=2,
                        record_trace=True)
    _, _, d = _solve(cfg)
    tr = np.asarray(d.trace)
    assert tr.shape == (10, len(sqp.TRACE_COLS))
    assert np.isfinite(tr).all()
    obj = tr[:, sqp.TRACE_COLS.index("obj")]
    assert obj[-1] <= obj[0] + 1e-12
    mu = tr[:, sqp.TRACE_COLS.index("mu")]
    assert mu[-1] > mu[0]  # AL penalty grows between rounds

    # trace off -> None (empty pytree leaf, no telemetry overhead)
    cfg_off = sqp.MPCConfig(horizon=6, variant="smooth", gn_iters=5,
                            al_iters=2)
    _, _, d_off = _solve(cfg_off)
    assert d_off.trace is None


def test_trace_flows_through_closed_loop():
    from forging_control_tpu.loop import closed_loop as cl
    cfg = sqp.MPCConfig(horizon=5, variant="smooth", gn_iters=3, al_iters=1,
                        record_trace=True)
    ctrl = cl.MPCController(cfg)
    loop_cfg = cl.LoopConfig(t_steps=4, variant="smooth")
    refs = jnp.full((2, 4), 0.3, jnp.float64)
    x0 = jnp.tile(X0, (2, 1))
    _, telem = jax.jit(lambda x, r, k: cl.run_batch(loop_cfg, ctrl, x, r, k))(
        x0, refs, jax.random.PRNGKey(0))
    assert telem.diag.trace.shape == (2, 4, 3, len(sqp.TRACE_COLS))
    assert np.isfinite(np.asarray(telem.diag.trace)).all()


def test_polish_is_noop_at_full_strength():
    """A converged AL iterate must not drift: polish accepts only
    merit-non-increasing steps at float-eps tolerance."""
    for ref in (0.578157, -0.4):
        cfg0 = sqp.MPCConfig(horizon=8, variant="smooth", gn_iters=12,
                             al_iters=3)
        cfg1 = sqp.MPCConfig(horizon=8, variant="smooth", gn_iters=12,
                             al_iters=3, polish_iters=2)
        u0, _, _ = _solve(cfg0, ref=ref)
        u1, _, _ = _solve(cfg1, ref=ref)
        assert abs(float(u0) - float(u1)) < 5e-7, (ref, float(u0), float(u1))


def test_polish_recovers_cheap_config():
    """On a constraint-active state, a cheap config + polish approaches the
    full-strength solution."""
    x = jnp.asarray([0.08, 0.3, 0.0, 9e6, 0.07], jnp.float64)
    ref, up = -0.5, 0.05
    cfg_full = sqp.MPCConfig(horizon=8, variant="smooth", gn_iters=15,
                             al_iters=3)
    cfg_cheap = sqp.MPCConfig(horizon=8, variant="smooth", gn_iters=4,
                              al_iters=1)
    cfg_pol = sqp.MPCConfig(horizon=8, variant="smooth", gn_iters=4,
                            al_iters=1, polish_iters=2)
    u_full, _, _ = _solve(cfg_full, x=x, ref=ref, up=up)
    u_cheap, _, _ = _solve(cfg_cheap, x=x, ref=ref, up=up)
    u_pol, _, _ = _solve(cfg_pol, x=x, ref=ref, up=up)
    e_cheap = abs(float(u_cheap) - float(u_full))
    e_pol = abs(float(u_pol) - float(u_full))
    assert e_pol <= e_cheap + 1e-12
    assert e_pol < 5e-4, (e_cheap, e_pol)


def test_polish_feasibility_guard():
    """Polish never worsens feasibility beyond the AL iterate."""
    x = jnp.asarray([0.08, 0.3, 0.0, 9e6, 0.07], jnp.float64)
    cfg = sqp.MPCConfig(horizon=8, variant="smooth", gn_iters=6, al_iters=2,
                        polish_iters=3)
    cfg0 = sqp.MPCConfig(horizon=8, variant="smooth", gn_iters=6, al_iters=2)
    _, _, d1 = _solve(cfg, x=x, ref=-0.5, up=0.05)
    _, _, d0 = _solve(cfg0, x=x, ref=-0.5, up=0.05)
    assert float(d1.inf_pr) <= float(d0.inf_pr) + 1e-3
