"""Batched Gauss-Newton SQP with augmented-Lagrangian constraints.

This is the TPU-native replacement for the reference's L0/L2 solver stack
(do-mpc multiple-shooting NLP -> CasADi -> IPOPT -> MA27/MUMPS; see
``Generate Data/template_mpc.py`` and SURVEY.md section 2.2).  Design:

* **Condensed single shooting.**  The decision vector is the scaled input
  trajectory ``v in R^N`` (N = horizon, N <= 25).  States are eliminated by
  an RK4 rollout, so there is no sparse KKT system to factor — the
  Gauss-Newton normal equations are a dense N x N solve, trivially batched
  over thousands of scenarios (the reference instead factors a
  ~(6N)-variable sparse KKT matrix with MA27 per scenario, serially).
* **Gauss-Newton on residuals.**  The do-mpc objective
  ``sum_k (y_dot_k - ref)^2 + mterm + 0.02 * sum_k (du_k / u_scale)^2``
  (template_mpc.py:44-50; rterm acts on *scaled* inputs) is an exact
  least-squares form; Jacobians come from one `jax.jacfwd` through the
  rollout.
* **Augmented Lagrangian** for the pressure bounds ``p1, p2 >= 0``
  (template_mpc.py:53-54) and the optional ``p <= 32e6`` box
  (Supervised Learning/template_mpc.py:57-64), with multiplier updates
  between fixed-size inner GN rounds.
* **Fixed iteration structure.**  No data-dependent Python control flow:
  `lax.scan` over a fixed iteration count with convergence masking, so one
  XLA program serves the whole vmapped batch and compiles once per
  (horizon, config).
* **Warm starting** by shifting the previous solution one step
  (:func:`shift_state`), mirroring IPOPT's warm start across
  ``make_step`` calls.
* **IPOPT-style diagnostics** (iteration count, objective, primal/dual
  infeasibility, regularization, step norm, penalty mu) are carried in the
  solve and returned per step, matching the stats record the reference
  consumes (``Generate Data/Functions.py:366-372``).

Line search: each GN iteration evaluates a small ladder of damped step
sizes in one batched rollout and keeps the best — branch-free, so the whole
solve vectorizes across scenarios on the VPU with no divergence penalty.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..integrate.rk4 import rk4_step
from ..ops.smallchol import chol_solve, chol_solve_pallas
from ..physics import press
from ..physics.scaling import U_SCALE

_P_SCALE = 1e7  # pressure scaling inside the NLP (template_mpc.py:34-35)


@dataclasses.dataclass(frozen=True)
class MPCConfig:
    """Static solver configuration (hashable; closed over by jit)."""

    horizon: int = 10
    dt: float = 1e-3                 # t_step (template_mpc.py:23)
    substeps: int = 4                # RK4 substeps of the *prediction model*
                                     # (the plant keeps its own; lowering this
                                     # trades prediction accuracy for a 4x
                                     # cheaper rollout+Jacobian — see
                                     # tests/test_solver.py parity bounds)
    variant: press.Variant = "smooth"
    rterm: float = 0.02              # set_rterm(u=0.02) on scaled du
    p_min: float = 0.0               # lower pressure bound [Pa]
    p_max: float | None = None       # upper bound 32e6 when do_feasibility
    params: press.PressParams = press.DEFAULT_PARAMS

    # Iteration structure.  Defaults sit on the quality/cost frontier
    # measured against the recorded IPOPT closed loop (see tests + docs):
    # 5 GN x 2 AL with a 2-step ladder matches the 8x2/4-step ladder
    # closed-loop tracking exactly at ~55% of the rollout cost.
    gn_iters: int = 5                # inner Gauss-Newton iterations per AL round
    al_iters: int = 2                # augmented-Lagrangian rounds
    mu0: float = 1e2                 # initial AL penalty
    mu_factor: float = 10.0
    tol_grad: float = 1e-7           # dual-infeasibility stop (scaled units)
    lm_reg: float = 1e-8             # base Levenberg damping
    step_ladder: tuple = (1.0, 0.25)
    # Record a fixed-size per-iteration trace (obj, inf_pr, inf_du, d_norm,
    # alpha, mu) in Diagnostics.trace — the analogue of the per-iteration
    # IPOPT history the reference stores per step (mu/obj/regularization_
    # size/d_norm/inf_du/inf_pr, ``Generate Data/Functions.py:366-372``)
    # and plots on its optimizer-diagnostics page (``Generate Data/
    # Main.py:211-262``).  Off by default: the trace adds (al*gn, 6) floats
    # per solve to the telemetry pytree.
    record_trace: bool = False
    # Active-set polish after AL convergence: Newton iterations on the
    # equality-constrained QP of the estimated active set (Schur-complement
    # solve, masked to fixed shapes), removing the residual AL smoothing
    # error.  Guarded: the polished point is kept only if it does not
    # worsen feasibility/objective.  Used by the parity presets; off in
    # throughput configs (the closed loop's warm-started AL is already at
    # tracking accuracy).
    polish_iters: int = 0
    polish_act_tol: float = 1e-3     # |c| threshold for the active estimate
    polish_reg: float = 1e-9
    # lax.scan unroll factor for the horizon rollout (True = full unroll,
    # None = auto).  Fully unrolling removes the sequential scan dispatches
    # that dominate the per-iteration cost on TPU: measured 3.6x closed-loop
    # throughput at N=10 (28k -> 100k solves/s at B=4096; fast preset 248k).
    # Auto resolves to full unroll on TPU for horizon <= 12 and to a plain
    # scan otherwise — at N=25 the unrolled program (25 stages x 4 RK4
    # substeps through jacfwd and the candidate ladder) blows up XLA compile
    # time, and on CPU (the f64 validation/test path) compile time dominates
    # any dispatch savings.
    scan_unroll: int | bool | None = None
    # Unroll the AL x GN *iteration* scans (identical numerics — lax.scan
    # unrolling is a scheduling choice).  Purpose: XLA's static cost model
    # counts a scan body ONCE regardless of trip count, so FLOP counts of
    # the rolled program are ~al_iters*gn_iters-fold lower bounds; lowering
    # the same config with iter_unroll=True yields the exact executed FLOP
    # count (bench.py's flops_per_solve vs flops_per_solve_lb).
    iter_unroll: bool = False

    @property
    def n_con(self) -> int:
        per_stage = 2 if self.p_max is None else 4
        return per_stage * self.horizon

    @classmethod
    def fast(cls, **kw):
        """Throughput preset family for warm-started closed-loop use: fewer
        fixed iterations and a short step ladder.

        The QUALIFIED configuration is ``fast(gn_iters=5)`` ("fast_5x1"):
        non-inferior to the 6x2 teacher default on a 256-rollout paired
        wide panel (diff -0.0005, one-sided 95% bound +0.0001 < the
        pre-registered +0.001 MAE margin; scripts/fast_requalify.py,
        docs/RESULTS-parity.json fast_preset_ab).  The bare 4x1 form
        FAILED that bar at panel power (+0.0008, upper bound +0.0015) and
        is kept only as a labeled bulk-data mode.  CAUTION: do not raise
        ``al_iters`` on this preset — with mu0=1e4 the AL escalation
        reaches mu=1e5, measured to destabilize closed-loop tracking on
        one of 256 f32 panel trajectories (MAE ~6e5; the requalification
        robustness gate exists because of exactly this)."""
        defaults = dict(gn_iters=4, al_iters=1, mu0=1e4,
                        step_ladder=(1.0, 0.25))
        defaults.update(kw)
        return cls(**defaults)

    @classmethod
    def ipopt_compat(cls, **kw):
        """Bit-parity preset matching the *recorded* IPOPT closed loop.

        Through the work->return cavitation transient the recorded IPOPT
        iterates violate their own p >= 0 bounds by ~5e6 Pa (verified by
        evaluating the recorded sequences' constraint residuals under the
        model dynamics) and track the reference better there; the default
        config stays feasible and brakes instead.  This preset reproduces
        the recorded behavior — p_min relaxed by the observed violation
        and a soft constant AL penalty — measured closed-loop tracking MAE
        0.04554 vs the recorded 0.04521 (default config: 0.0508) and mean
        command deviation vs the golden trajectories 1.4e-4
        (scripts/ipopt_compat_exp.py sweep).  Use for parity with the
        reference's artifacts; prefer the default for actual feasibility.
        """
        defaults = dict(p_min=-5e6, mu0=1.0, mu_factor=1.0)
        defaults.update(kw)
        return cls(**defaults)


class SolverState(NamedTuple):
    """Warm-start carry across closed-loop steps (cf. IPOPT warm start)."""

    v: jax.Array     # (N,) scaled input trajectory
    lam: jax.Array   # (n_con,) AL multipliers


TRACE_COLS = ("obj", "inf_pr", "inf_du", "d_norm", "alpha", "mu")


class Diagnostics(NamedTuple):
    """Per-solve stats mirroring the IPOPT record the reference stores
    (iter_count/obj/inf_pr/inf_du/regularization/d_norm/mu,
    ``Generate Data/Functions.py:366-372``).

    ``trace``: per-iteration history, shape (al_iters * gn_iters,
    len(TRACE_COLS)) when the config sets ``record_trace``, else None
    (an empty pytree node, so untraced programs carry zero overhead) —
    the per-iteration IPOPT arrays the reference keeps per step."""

    iters: jax.Array
    obj: jax.Array
    inf_pr: jax.Array
    inf_du: jax.Array
    reg: jax.Array
    d_norm: jax.Array
    mu: jax.Array
    alpha: jax.Array   # last accepted step size (IPOPT alpha_pr analogue)
    trace: jax.Array | None = None

    @classmethod
    def zeros(cls, dtype):
        z = jnp.zeros((), dtype)
        return cls(iters=jnp.zeros((), jnp.int32), obj=z, inf_pr=z,
                   inf_du=z, reg=z, d_norm=z, mu=z, alpha=z)


def init_state(cfg: MPCConfig, dtype=jnp.float32) -> SolverState:
    return SolverState(
        v=jnp.zeros((cfg.horizon,), dtype=dtype),
        lam=jnp.zeros((cfg.n_con,), dtype=dtype),
    )


def shift_state(state: SolverState) -> SolverState:
    """Shift the previous solution one control period (warm start)."""
    v = jnp.concatenate([state.v[1:], state.v[-1:]])
    return SolverState(v=v, lam=state.lam)


def _resolve_unroll(cfg: MPCConfig):
    """Resolve scan_unroll=None to the measured-best value per backend.

    TPU: full unroll for short horizons (N <= 12); partial unroll 5 for
    long ones — at N=25 the fully unrolled program blows up XLA compile
    time, but unroll=5 compiles in the same time as the plain scan and
    runs 1.9x faster (2.2k -> 4.1k solves/s at B=256,
    scripts/fused_bench.py --unroll).  CPU (the f64 validation/test path):
    plain scan, where compile time dominates any dispatch savings."""
    if cfg.scan_unroll is not None:
        return cfg.scan_unroll
    if jax.default_backend() == "tpu":
        return True if cfg.horizon <= 12 else 5
    return 1


def _rollout(cfg: MPCConfig, x0, v):
    """States x_1..x_N (physical units) for scaled inputs v."""

    def f(x, u):
        return press.rhs(x, u, cfg.params, cfg.variant)

    def step(x, vk):
        x_next = rk4_step(f, x, vk * U_SCALE, cfg.dt, cfg.substeps)
        return x_next, x_next

    _, xs = jax.lax.scan(step, x0, v, unroll=_resolve_unroll(cfg))
    return xs  # (N, 5)


def _constraints(cfg: MPCConfig, xs):
    """Inequalities c(v) >= 0 in scaled pressure units, stages 1..N."""
    p1 = xs[:, 2] / _P_SCALE
    p2 = xs[:, 3] / _P_SCALE
    lo = cfg.p_min / _P_SCALE
    cons = [p1 - lo, p2 - lo]
    if cfg.p_max is not None:
        hi = cfg.p_max / _P_SCALE
        cons += [hi - p1, hi - p2]
    return jnp.concatenate(cons)


def _residuals(cfg: MPCConfig, x0, ref, u_prev_s, lam, mu, v):
    """Stacked least-squares residuals of the AL-regularized objective.

    Layout: [tracking (N), sqrt(rterm)*du (N), sqrt(mu/2)*active-constraint (n_con)].
    """
    xs = _rollout(cfg, x0, v)
    r_track = xs[:, 1] - ref                       # lterm k=1..N-1 + mterm k=N
    dv = jnp.diff(jnp.concatenate([jnp.array([u_prev_s], dtype=v.dtype), v]))
    r_du = jnp.sqrt(cfg.rterm) * dv
    c = _constraints(cfg, xs)
    # AL term: (mu/2) * max(0, lam/mu - c)^2  (classic Rockafellar form)
    r_con = jnp.sqrt(mu / 2.0) * jnp.maximum(lam / mu - c, 0.0)
    return jnp.concatenate([r_track, r_du, r_con]), c


def _objective_only(cfg: MPCConfig, x0, ref, u_prev_s, v):
    """True (non-AL) objective value, for diagnostics."""
    xs = _rollout(cfg, x0, v)
    r_track = xs[:, 1] - ref
    dv = jnp.diff(jnp.concatenate([jnp.array([u_prev_s], dtype=v.dtype), v]))
    return jnp.sum(r_track**2) + cfg.rterm * jnp.sum(dv**2)


def _obj_res_con(cfg: MPCConfig, x0, ref, u_prev_s, v):
    """Objective-only least-squares residuals + raw constraint values."""
    xs = _rollout(cfg, x0, v)
    r_track = xs[:, 1] - ref
    dv = jnp.diff(jnp.concatenate([jnp.array([u_prev_s], dtype=v.dtype), v]))
    return jnp.concatenate([r_track, jnp.sqrt(cfg.rterm) * dv]), \
        _constraints(cfg, xs)


def polish(cfg: MPCConfig, x0, ref, u_prev_s, v, lam):
    """Active-set Newton polish of an AL-converged iterate.

    The augmented Lagrangian solves the inequality-constrained NLP only up
    to the penalty smoothing (exact complementarity is reached in the
    mu -> inf limit); this removes the residual by solving the
    equality-constrained Gauss-Newton QP on the *estimated active set*
    exactly, via a masked Schur complement:

        [H      J_A^T] [dv]   [-g ]          S nu = J_A H^-1 g - c_A
        [J_A      0  ] [nu] = [-c_A]   with  dv   = H^-1 (J_A^T nu - g)

    All shapes are static: inactive constraints keep their slot with an
    identity row in S (nu_i = 0).  The active estimate starts from the AL
    multipliers and is re-estimated each iteration from the polished
    multipliers (dropping nu < 0, adding newly violated constraints).  The
    polished point is accepted only if it does not worsen feasibility or
    objective — the AL iterate is already excellent and the equality QP
    can misstep when the active-set estimate is wrong.

    This is the analogue of IPOPT's final accept/polish phase; it is what
    closes the last ~1e-2 tail between the AL solution and the true NLP
    optimum on hard steps (see scripts/diag_n5_tail.py and docs/PARITY.md).
    """
    dtype = v.dtype
    N = cfg.horizon
    n_obj = 2 * N
    eye = jnp.eye(N, dtype=dtype)

    def lin(vv):
        out, jvp = jax.linearize(
            lambda w: jnp.concatenate(_obj_res_con(cfg, x0, ref, u_prev_s, w)),
            vv)
        J = jax.vmap(jvp)(eye)                     # (N, n_obj + n_con)
        return out[:n_obj], out[n_obj:], J[:, :n_obj], J[:, n_obj:]

    r0, c0, _, _ = lin(v)
    obj0 = jnp.dot(r0, r0)
    infeas0 = jnp.maximum(jnp.max(-c0), 0.0)

    # Initial active estimate from the AL multipliers.
    m = jnp.logical_or(c0 < cfg.polish_act_tol, lam > 0).astype(dtype)

    def body(carry, _):
        v, m = carry
        r, c, Jr, Jc = lin(v)                      # Jc: (N, n_con)
        g = Jr @ r
        H = Jr @ Jr.T + cfg.polish_reg * eye
        nc = c.shape[0]
        # H^-1 [Jc | g] via the lane-batched Cholesky (one factor per rhs
        # lane; elementwise over the rhs axis).
        rhs = jnp.concatenate([Jc.T, g[None, :]], axis=0)      # (nc+1, N)
        sol = chol_solve(jnp.broadcast_to(H, (nc + 1, N, N)), rhs)
        HiJc, Hig = sol[:nc].T, sol[nc]
        S = m[:, None] * m[None, :] * (Jc.T @ HiJc) \
            + jnp.diag(1.0 - m) + 1e-10 * jnp.eye(nc, dtype=dtype)
        nu = chol_solve(S, m * (Jc.T @ Hig - c))
        dv = HiJc @ (m * nu) - Hig
        v_new = v + dv
        # Re-estimate: drop nu <= 0, add (newly) violated constraints.
        c_lin = c + dv @ Jc
        m_new = jnp.logical_or(
            jnp.logical_and(m > 0, nu > 0),
            c_lin < -cfg.polish_act_tol).astype(dtype)
        return (v_new, m_new), None

    (v_p, _), _ = jax.lax.scan(body, (v, m), None, length=cfg.polish_iters,
                               unroll=cfg.polish_iters if cfg.iter_unroll else 1)

    r1, c1 = _obj_res_con(cfg, x0, ref, u_prev_s, v_p)
    obj1 = jnp.dot(r1, r1)
    infeas1 = jnp.maximum(jnp.max(-c1), 0.0)
    # Exact-penalty merit: enforcing the active constraints exactly may
    # raise the objective of a slightly-infeasible AL iterate, so accept
    # on the merit function, not the raw objective.  The tolerance is
    # float-eps-scale: an already-optimal AL iterate must NOT drift.
    w = jnp.asarray(1e3, dtype)
    merit0 = obj0 + w * infeas0
    merit1 = obj1 + w * infeas1
    tol = 64 * jnp.finfo(dtype).eps * (1.0 + merit0)
    ok = jnp.logical_and(jnp.isfinite(merit1), merit1 <= merit0 + tol)
    return jnp.where(ok, v_p, v)


def solve(cfg: MPCConfig, x0, ref, u_prev, state: SolverState):
    """One MPC solve (the `make_step` equivalent).

    Args:
      cfg: static config.
      x0: current (measured) state, physical units, shape (5,).
      ref: speed reference for the horizon (scalar; the reference holds it
        constant over the horizon, template_mpc.py:68-82).
      u_prev: previously applied input (physical), for the first du penalty.
      state: warm start from the previous step (already shifted).

    Returns (u0, new_state, Diagnostics); u0 is the physical first input.
    Fully jit/vmap compatible; no data-dependent shapes.
    """
    dtype = state.v.dtype
    x0 = x0.astype(dtype)
    ref = jnp.asarray(ref, dtype)
    u_prev_s = jnp.asarray(u_prev, dtype) / U_SCALE

    res_fn = lambda v, lam, mu: _residuals(cfg, x0, ref, u_prev_s, lam, mu, v)

    n_res = 2 * cfg.horizon + cfg.n_con

    def gn_round(carry, _):
        v, lam, mu, it_used, reg, d_norm, inf_du, alpha_last = carry

        # One linearized rollout gives the primal residual (and the raw
        # constraint values, for diagnostics) for free with the Jacobian
        # transpose (rows = J @ e_i).
        out, jvp = jax.linearize(
            lambda vv: jnp.concatenate(res_fn(vv, lam, mu)), v)
        Jt_full = jax.vmap(jvp)(jnp.eye(cfg.horizon, dtype=dtype))
        r, c = out[:n_res], out[n_res:]
        Jt = Jt_full[:, :n_res]                                # (N, n_res)
        g = Jt @ r
        H = Jt @ Jt.T

        cost0 = 0.5 * jnp.dot(r, r)
        gnorm = jnp.max(jnp.abs(g))
        converged = gnorm < cfg.tol_grad

        # Candidate steps: the three damping levels are ONE batched (3,N,N)
        # Cholesky solve (the unrolled kernel in ops/smallchol.py is
        # elementwise over leading axes, so the damping axis rides the same
        # lanes as the scenario batch), and the whole candidate ladder is
        # ONE vmapped rollout — per-iteration op count stays flat as the
        # ladder grows.
        eye = jnp.eye(cfg.horizon, dtype=dtype)
        regs = jnp.asarray([cfg.lm_reg, cfg.lm_reg + 1e-2, cfg.lm_reg + 1.0],
                           dtype)
        Hs = H[None, :, :] + regs[:, None, None] * eye[None, :, :]
        dvs = -chol_solve(Hs, jnp.broadcast_to(g, (3, cfg.horizon)))

        alphas = jnp.asarray(list(cfg.step_ladder) + [1.0, 1.0], dtype)
        dirs = jnp.concatenate(
            [jnp.broadcast_to(dvs[0], (len(cfg.step_ladder), cfg.horizon)),
             dvs[1:]], axis=0)
        vs = v[None, :] + alphas[:, None] * dirs
        r_try = jax.vmap(lambda vt: res_fn(vt, lam, mu)[0])(vs)
        costs = 0.5 * jnp.sum(r_try * r_try, axis=-1)
        dns = jnp.linalg.norm(alphas[:, None] * dirs, axis=-1)
        best = jnp.argmin(costs)
        improved = costs[best] < cost0
        take = jnp.logical_and(improved, jnp.logical_not(converged))

        v_new = jnp.where(take, vs[best], v)
        d_new = jnp.where(take, dns[best], 0.0)
        a_new = jnp.where(take, alphas[best], alpha_last)
        it_new = it_used + jnp.where(converged, 0, 1)
        ys = None
        if cfg.record_trace:
            # per-iteration record at the incoming iterate (layout
            # TRACE_COLS): true objective, primal/dual infeasibility,
            # accepted step norm/size, AL penalty
            ys = jnp.stack([jnp.dot(r[:2 * cfg.horizon], r[:2 * cfg.horizon]),
                            jnp.maximum(jnp.max(-c), 0.0), gnorm, d_new,
                            a_new, mu])
        return (v_new, lam, mu, it_new, reg, d_new, gnorm, a_new), ys

    def al_round(carry, _):
        carry, tr = jax.lax.scan(gn_round, carry, None, length=cfg.gn_iters,
                                 unroll=cfg.gn_iters if cfg.iter_unroll else 1)
        v, lam, mu, it_used, reg, d_norm, inf_du, alpha_last = carry
        _, c = res_fn(v, lam, mu)
        lam_new = jnp.maximum(lam - mu * c, 0.0)
        mu_new = mu * cfg.mu_factor
        return (v, lam_new, mu_new, it_used, reg, d_norm, inf_du,
                alpha_last), tr

    mu0 = jnp.asarray(cfg.mu0, dtype)
    init = (state.v, state.lam, mu0, jnp.zeros((), jnp.int32),
            jnp.asarray(cfg.lm_reg, dtype), jnp.zeros((), dtype),
            jnp.zeros((), dtype), jnp.zeros((), dtype))
    (v, lam, mu, iters, reg, d_norm, inf_du, alpha), traces = jax.lax.scan(
        al_round, init, None, length=cfg.al_iters,
        unroll=cfg.al_iters if cfg.iter_unroll else 1)

    if cfg.polish_iters > 0:
        v = polish(cfg, x0, ref, u_prev_s, v, lam)

    xs = _rollout(cfg, x0, v)
    c = _constraints(cfg, xs)
    diag = Diagnostics(
        iters=iters,
        obj=_objective_only(cfg, x0, ref, u_prev_s, v),
        inf_pr=jnp.maximum(jnp.max(-c), 0.0),
        inf_du=inf_du,
        reg=reg,
        d_norm=d_norm,
        mu=mu,
        alpha=alpha,
        trace=(traces.reshape(-1, len(TRACE_COLS))
               if cfg.record_trace else None),
    )
    u0 = v[0] * U_SCALE
    return u0, SolverState(v=v, lam=lam), diag


def solve_batch(cfg: MPCConfig, x0, ref, u_prev, state: SolverState, *,
                linsolve: str = "unrolled"):
    """Explicitly batched MPC solve — B scenarios in one program.

    Semantically equivalent to ``jax.vmap(solve)`` (pinned by
    tests/test_solver.py) but with the per-iteration linear algebra hoisted
    to the batch level: the gradient/normal-matrix contractions become
    (B, N, n_res) batched matmuls on the MXU, and the (B, 3, N, N) damped
    normal solves run as one fused kernel — either the unrolled
    elementwise Cholesky (``linsolve="unrolled"``) or the Pallas
    lane-batched TPU kernel (``linsolve="pallas"``,
    ops/smallchol.chol_solve_pallas).  This is the ROADMAP "hoist the
    batch axis to the kernel level" path.

    Args:
      x0: (B, 5) measured states; ref/u_prev: (B,); state: batched
        SolverState (v (B, N), lam (B, n_con)).
    Returns (u0 (B,), SolverState, Diagnostics) with leading batch axes.
    """
    dtype = state.v.dtype
    B, N = state.v.shape
    x0 = x0.astype(dtype)
    ref = jnp.asarray(ref, dtype)
    u_prev_s = jnp.asarray(u_prev, dtype) / U_SCALE
    eye = jnp.eye(N, dtype=dtype)

    def res_single(x0_i, ref_i, up_i, lam_i, mu, v_i):
        return _residuals(cfg, x0_i, ref_i, up_i, lam_i, mu, v_i)[0]

    def res_and_jac(x0_i, ref_i, up_i, lam_i, mu, v_i):
        r, jvp = jax.linearize(
            lambda vv: res_single(x0_i, ref_i, up_i, lam_i, mu, vv), v_i)
        Jt = jax.vmap(jvp)(eye)  # (N, n_res)
        return r, Jt

    batched_rj = jax.vmap(res_and_jac, in_axes=(0, 0, 0, 0, None, 0))
    batched_res = jax.vmap(res_single, in_axes=(0, 0, 0, 0, None, 0))
    # candidate axis rides a second vmap (only v varies along it)
    cand_res = jax.vmap(batched_res, in_axes=(None, None, None, None, None, 1),
                        out_axes=1)
    batched_rollout = jax.vmap(lambda xi, vi: _rollout(cfg, xi, vi))

    if linsolve == "pallas":
        interpret = jax.default_backend() != "tpu"  # CPU tests: interpreter

        def lin(Hs, gs):
            x = chol_solve_pallas(Hs.reshape(-1, N, N), gs.reshape(-1, N),
                                  interpret=interpret)
            return x.reshape(B, 3, N)
    elif linsolve == "unrolled":
        lin = chol_solve
    else:
        raise ValueError(f"unknown linsolve {linsolve!r}")

    n_lad = len(cfg.step_ladder)
    alphas = jnp.asarray(list(cfg.step_ladder) + [1.0, 1.0], dtype)
    regs = jnp.asarray([cfg.lm_reg, cfg.lm_reg + 1e-2, cfg.lm_reg + 1.0],
                       dtype)
    bidx = jnp.arange(B)

    def gn_round(carry, _):
        v, lam, mu, it_used, d_norm, inf_du, alpha_last = carry
        r, Jt = batched_rj(x0, ref, u_prev_s, lam, mu, v)
        g = jnp.einsum("bnr,br->bn", Jt, r)
        H = jnp.einsum("bnr,bmr->bnm", Jt, Jt)

        cost0 = 0.5 * jnp.sum(r * r, axis=-1)
        gnorm = jnp.max(jnp.abs(g), axis=-1)
        converged = gnorm < cfg.tol_grad

        Hs = H[:, None] + regs[None, :, None, None] * eye
        dvs = -lin(Hs, jnp.broadcast_to(g[:, None, :], (B, 3, N)))

        dirs = jnp.concatenate(
            [jnp.broadcast_to(dvs[:, :1], (B, n_lad, N)), dvs[:, 1:]], axis=1)
        vs = v[:, None, :] + alphas[None, :, None] * dirs
        r_try = cand_res(x0, ref, u_prev_s, lam, mu, vs)
        costs = 0.5 * jnp.sum(r_try * r_try, axis=-1)      # (B, C)
        dns = jnp.linalg.norm(alphas[None, :, None] * dirs, axis=-1)
        best = jnp.argmin(costs, axis=1)
        take = jnp.logical_and(costs[bidx, best] < cost0,
                               jnp.logical_not(converged))

        v_new = jnp.where(take[:, None], vs[bidx, best], v)
        d_new = jnp.where(take, dns[bidx, best], 0.0)
        a_new = jnp.where(take, alphas[best], alpha_last)
        it_new = it_used + jnp.where(converged, 0, 1)
        ys = None
        if cfg.record_trace:
            # Per-iteration record at the incoming iterate (TRACE_COLS
            # layout, matching solve's trace).  Raw constraint values need
            # one extra (Jacobian-free) rollout; only paid when tracing.
            c = jax.vmap(lambda xs: _constraints(cfg, xs))(
                batched_rollout(x0, v))
            r_obj = r[:, :2 * N]
            ys = jnp.stack(
                [jnp.sum(r_obj * r_obj, axis=-1),
                 jnp.maximum(jnp.max(-c, axis=-1), 0.0), gnorm, d_new,
                 a_new, jnp.broadcast_to(jnp.asarray(mu, dtype), (B,))],
                axis=-1)
        return (v_new, lam, mu, it_new, d_new, gnorm, a_new), ys

    def al_round(carry, _):
        carry, tr = jax.lax.scan(gn_round, carry, None, length=cfg.gn_iters,
                                 unroll=cfg.gn_iters if cfg.iter_unroll else 1)
        v, lam, mu, it_used, d_norm, inf_du, alpha_last = carry
        c = jax.vmap(lambda xs: _constraints(cfg, xs))(batched_rollout(x0, v))
        lam_new = jnp.maximum(lam - mu * c, 0.0)
        return (v, lam_new, mu * cfg.mu_factor, it_used, d_norm, inf_du,
                alpha_last), tr

    zb = jnp.zeros((B,), dtype)
    init = (state.v, state.lam, jnp.asarray(cfg.mu0, dtype),
            jnp.zeros((B,), jnp.int32), zb, zb, zb)
    (v, lam, mu, iters, d_norm, inf_du, alpha), traces = jax.lax.scan(
        al_round, init, None, length=cfg.al_iters,
        unroll=cfg.al_iters if cfg.iter_unroll else 1)

    if cfg.polish_iters > 0:
        v = jax.vmap(lambda xi, ri, ui, vi, li: polish(
            cfg, xi, ri, ui, vi, li))(x0, ref, u_prev_s, v, lam)

    xs = batched_rollout(x0, v)
    c = jax.vmap(lambda x: _constraints(cfg, x))(xs)
    r_track = xs[:, :, 1] - ref[:, None]
    dv = jnp.diff(jnp.concatenate([u_prev_s[:, None], v], axis=1), axis=1)
    obj = jnp.sum(r_track**2, axis=-1) + cfg.rterm * jnp.sum(dv**2, axis=-1)
    diag = Diagnostics(
        iters=iters,
        obj=obj,
        inf_pr=jnp.maximum(jnp.max(-c, axis=-1), 0.0),
        inf_du=inf_du,
        reg=jnp.full((B,), cfg.lm_reg, dtype),
        d_norm=d_norm,
        mu=jnp.full((B,), mu, dtype),
        alpha=alpha,
        # (al, gn, B, C) -> (B, al*gn, C), matching solve's layout.
        trace=(jnp.moveaxis(traces, 2, 0).reshape(
            B, cfg.al_iters * cfg.gn_iters, len(TRACE_COLS))
            if cfg.record_trace else None),
    )
    return v[:, 0] * U_SCALE, SolverState(v=v, lam=lam), diag
