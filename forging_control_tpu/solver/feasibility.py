"""Feasibility recovery — safety projection of NN commands.

Reimplements the reference's feasibility-recovery NLP
(``Supervised Learning/Main.py:519-605`` + ``FeasibilityRecovery.
feasibility_recover``, ``Supervised Learning/Functions.py:933-1011``):
project the NN command ``u_NN`` onto the set of commands whose 2-step RK4
lookahead (raw model, 1 ms steps, 4 substeps — ``Ruge_Kuta``,
Functions.py:1201-1237) keeps both chamber pressures inside [0, 32e6] Pa:

    min_u  (1/0.2) * (u_NN - u)^2   s.t.  p1, p2 in [0, PS] at both steps

(The reference also declares two slack variables with a 1e4 penalty, but
never couples them to the constraints — their optimum is identically 0, so
the effective NLP is the hard-constrained projection above; we drop them.)

Solved with the same augmented-Lagrangian Gauss-Newton scheme as the MPC
(scalar decision variable, so the "linear solve" is a division) — fully
jit/vmap-able, replacing the per-step IPOPT/MA27 round trip.  On failure
(violation not reducible), the reference falls back to the warm-start
command (supervised, Functions.py:988-1009) or clips into [-0.2, 0.2]
(unsupervised, ``Unsupervised Learning/Functions.py:1537-1549``); here the
AL result is always defined, and we expose the final violation so callers
can apply the same fallback policy.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..integrate.rk4 import rk4_step
from ..physics import press

_U_SCALE = 0.2     # scaling_factors['u'] = 1/0.2 (Main.py:542)
_P_SCALE = 32e6    # scaling_factors['p1'] = 1/32e6


@dataclasses.dataclass(frozen=True)
class FeasibilityConfig:
    dt: float = 1e-3
    substeps: int = 4
    lookahead: int = 2            # F applied twice (Main.py:575-576)
    p_lo: float = 0.0
    p_hi: float = 32e6
    params: press.PressParams = press.DEFAULT_PARAMS
    variant: press.Variant = "raw"   # forging_model is the raw ODE
    iters: int = 10
    al_iters: int = 3
    mu0: float = 1e2
    mu_factor: float = 10.0


class FeasibilityResult(NamedTuple):
    u: jax.Array          # recovered command
    violation: jax.Array  # max scaled constraint violation at the solution
    changed: jax.Array    # |u - u_NN|


class WarmStart(NamedTuple):
    """Cross-step warm-start state, the reference's ``warm_start`` dict
    (``Supervised Learning/Functions.py:957-1011``): previous primal
    (here the scalar command; the reference also carries two decoupled
    slacks whose optimum is 0) and the constraint multipliers."""

    u: jax.Array    # previous recovered command (scalar)
    lam: jax.Array  # (4 * lookahead,) AL multipliers (reference: lam_g)


def init_warm(cfg: FeasibilityConfig, dtype=jnp.float32) -> WarmStart:
    """Zero warm start — ``warm_start = {'u': np.zeros(3), 'lam_g':
    np.zeros(6)}`` (Supervised Learning/Main.py:607-608)."""
    return WarmStart(u=jnp.zeros((), dtype),
                     lam=jnp.zeros((4 * cfg.lookahead,), dtype))


def _lookahead_constraints(cfg: FeasibilityConfig, x0, u):
    def f(x, uu):
        return press.rhs(x, uu, cfg.params, cfg.variant)

    cons = []
    x = x0
    for _ in range(cfg.lookahead):
        x = rk4_step(f, x, u, cfg.dt, cfg.substeps)
        for i in (2, 3):
            cons.append((x[i] - cfg.p_lo) / _P_SCALE)
            cons.append((cfg.p_hi - x[i]) / _P_SCALE)
    return jnp.stack(cons)


def _al_core(cfg: FeasibilityConfig, u_nn, x0, dtype):
    """Build the AL residual/iteration machinery shared by the cold
    (multi-start) and warm-start entry points."""
    w_obj = 1.0 / _U_SCALE

    def al_residual(u, lam, mu):
        c = _lookahead_constraints(cfg, x0, u)
        r_obj = jnp.sqrt(w_obj) * (u - u_nn)
        r_con = jnp.sqrt(mu / 2.0) * jnp.maximum(lam / mu - c, 0.0)
        return jnp.concatenate([r_obj[None], r_con]), c

    def gn_iter(carry, _):
        u, lam, mu = carry
        (r, _), = (al_residual(u, lam, mu),)
        J = jax.jacfwd(lambda uu: al_residual(uu, lam, mu)[0])(u)
        g = jnp.dot(J, r)
        h = jnp.dot(J, J) + 1e-8
        du = -g / h
        # backtracking ladder, branch-free
        def cost_at(alpha):
            r_try, _ = al_residual(u + alpha * du, lam, mu)
            return 0.5 * jnp.dot(r_try, r_try)
        alphas = jnp.array([1.0, 0.5, 0.1], dtype)
        costs = jnp.stack([cost_at(a) for a in (1.0, 0.5, 0.1)])
        best = jnp.argmin(costs)
        cost0 = 0.5 * jnp.dot(r, r)
        u_new = jnp.where(costs[best] < cost0, u + alphas[best] * du, u)
        return (u_new, lam, mu), None

    def al_round(carry, _):
        carry, _ = jax.lax.scan(gn_iter, carry, None, length=cfg.iters)
        u, lam, mu = carry
        _, c = al_residual(u, lam, mu)
        lam = jnp.maximum(lam - mu * c, 0.0)
        return (u, lam, mu * cfg.mu_factor), None

    def run(u_init, lam0):
        mu_init = jnp.asarray(cfg.mu0, dtype)
        (u, lam, _), _ = jax.lax.scan(
            al_round, (u_init, lam0, mu_init), None, length=cfg.al_iters)
        return u, lam

    return al_residual, run


def recover(cfg: FeasibilityConfig, u_nn, x0):
    """Project u_nn onto the feasible set; returns FeasibilityResult.

    jit/vmap-compatible; a scalar AL-GN iteration (division instead of a
    linear solve).
    """
    dtype = jnp.result_type(u_nn)
    n_con = 4 * cfg.lookahead
    lam0 = jnp.zeros((n_con,), dtype)
    al_residual, run = _al_core(cfg, u_nn, x0, dtype)

    # Multi-start: the valve-flow sign flip at z = 0 makes the 2-step
    # pressure landscape nonconvex in u, so a single GN descent from u_nn
    # can land in the wrong basin.  Seed from a small branch-free grid
    # around u_nn and keep the best AL cost (all candidates evaluated in
    # one fused batch; IPOPT in the reference instead fails and falls back,
    # Functions.py:988-1009).
    mu_init = jnp.asarray(cfg.mu0, dtype)
    seeds = jnp.asarray(u_nn, dtype) + jnp.asarray(
        [0.0, 0.1, -0.1, 0.2, -0.2, 0.3, 0.4], dtype)
    seed_costs = jax.vmap(
        lambda s: 0.5 * jnp.sum(al_residual(s, lam0, mu_init)[0] ** 2))(seeds)
    u_init = seeds[jnp.argmin(seed_costs)]

    u, _lam = run(u_init, lam0)

    c = _lookahead_constraints(cfg, x0, u)
    return FeasibilityResult(
        u=u,
        violation=jnp.maximum(jnp.max(-c), 0.0),
        changed=jnp.abs(u - u_nn),
    )


def recover_warm(cfg: FeasibilityConfig, u_nn, x0, warm: WarmStart,
                 fail_tol: float = 1e-2):
    """Warm-started projection with the reference's stateful carry and
    failure-fallback semantics (``Supervised Learning/Functions.py:
    957-1011``): seed the primal and the multipliers from the previous
    step's solution; on failure (here: the AL result still violates the
    scaled constraints by more than ``fail_tol``), apply the *previous*
    command and reset the warm start to zeros.

    Returns ``(FeasibilityResult, WarmStart)``.  jit/vmap-compatible.
    The cold path (:func:`recover`) instead multi-starts every call —
    see scripts/feasibility_ab.py for the measured A/B.
    """
    dtype = jnp.result_type(u_nn)
    _al_residual, run = _al_core(cfg, u_nn, x0, dtype)

    wu = jnp.asarray(warm.u, dtype)
    u, lam = run(wu, jnp.asarray(warm.lam, dtype))
    c = _lookahead_constraints(cfg, x0, u)
    violation = jnp.maximum(jnp.max(-c), 0.0)

    failed = violation > fail_tol
    u_out = jnp.where(failed, wu, u)
    zero = init_warm(cfg, dtype)
    new_warm = WarmStart(
        u=jnp.where(failed, zero.u, u),
        lam=jnp.where(failed, zero.lam, lam),
    )
    res = FeasibilityResult(
        u=u_out,
        violation=violation,
        changed=jnp.abs(u_out - u_nn),
    )
    return res, new_warm


@dataclasses.dataclass(frozen=True)
class RecoveringController:
    """Closed-loop controller (loop.Controller protocol) wrapping a policy
    with *warm-started* feasibility recovery — the stateful composition the
    reference runs in ``NeuralNetwork.loop`` (``Supervised Learning/
    Functions.py:673-885``): the warm start is threaded through the episode
    as controller state, exactly like the ``warm_start`` dict the loop
    carries between ``NN_make_step`` calls.

    ``base_policy(x_meas, ref, u_prev) -> u_nn``; lb/ub optionally apply
    the reference's declared (never-enforced) +-0.2 saturation.
    """

    base_policy: object
    cfg: FeasibilityConfig = FeasibilityConfig()
    lb: float | None = None
    ub: float | None = None
    fail_tol: float = 1e-2

    def init_carry(self, dtype):
        return init_warm(self.cfg, dtype)

    def step(self, carry, x_meas, ref, u_prev):
        from . import sqp  # local import; sibling module
        u_nn = self.base_policy(x_meas, ref, u_prev)
        res, warm = recover_warm(self.cfg, u_nn, x_meas, carry,
                                 fail_tol=self.fail_tol)
        u = res.u
        if self.lb is not None or self.ub is not None:
            u = jnp.clip(u, self.lb, self.ub)
        return u, warm, sqp.Diagnostics.zeros(jnp.result_type(x_meas))


def make_recovering_policy(base_policy, cfg: FeasibilityConfig,
                           lb=None, ub=None):
    """Wrap a policy with feasibility recovery, the
    ``NN_make_step(..., feasibility_variables)`` composition
    (Supervised Learning/Functions.py:1014-1068).  The reference clips to
    [-0.2, 0.2] only in its solver-failure fallback
    (Unsupervised Learning/Functions.py:1537-1549); pass lb/ub to apply
    saturation unconditionally."""

    def policy(x_meas, ref, u_prev):
        u_nn = base_policy(x_meas, ref, u_prev)
        res = recover(cfg, u_nn, x_meas)
        u = res.u
        if lb is not None or ub is not None:
            u = jnp.clip(u, lb, ub)
        return u

    return policy
