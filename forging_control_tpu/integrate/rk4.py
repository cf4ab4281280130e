"""Fixed-step explicit integrators under XLA.

The reference integrates the plant with SUNDIALS CVODES (adaptive implicit,
``Generate Data/template_simulator.py:19-28``) and propagates
feasibility-recovery constraints with a hand-built RK4 with 4 substeps
(``Supervised Learning/Functions.py:1201-1237``).  On TPU both roles are
served by a fixed-step RK4: the plant's fastest linearized mode
(pressure-velocity oscillation, ~360 rad/s) gives omega*h ~= 0.09 at
1 ms / 4 substeps, comfortably inside RK4's stability region; accuracy vs
CVODES is validated by the golden-trajectory tests (tests/test_integrate.py
single-step + replay parity, tests/test_refgen.py recorded-stream replay).

Substep count is static, so the loop unrolls into one fused XLA computation;
`vmap` batches it over scenarios and `jacfwd` differentiates through it for
the solver.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp


def rk4_step(f: Callable, x, u, dt: float, substeps: int = 4, disturbance=None):
    """Integrate dx/dt = f(x, u) + w over one control period.

    Args:
      f: RHS with signature f(x, u) -> xdot, broadcasting over batch axes.
      x: state, shape (..., n).
      u: input held constant over the step (zero-order hold), shape (...,).
      dt: control period (e.g. 1 ms).
      substeps: RK4 substeps per period (static; reference uses 4).
      disturbance: optional additive process noise w, constant over the step
        — matches do-mpc's ``make_step(u0, w0=...)`` semantics where w
        enters the ODE additively.

    Returns the state after ``dt``.
    """
    h = dt / substeps
    if disturbance is None:
        g = f
    else:
        def g(xx, uu):
            return f(xx, uu) + disturbance

    for _ in range(substeps):
        k1 = g(x, u)
        k2 = g(x + 0.5 * h * k1, u)
        k3 = g(x + 0.5 * h * k2, u)
        k4 = g(x + h * k3, u)
        x = x + (h / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)
    return x


def make_stepper(f: Callable, dt: float, substeps: int = 4) -> Callable:
    """Bind f/dt/substeps into a step(x, u[, w]) closure for scan bodies."""

    def step(x, u, disturbance=None):
        return rk4_step(f, x, u, dt, substeps=substeps, disturbance=disturbance)

    return step
