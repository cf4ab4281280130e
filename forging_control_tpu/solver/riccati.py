"""AL-iLQR solver backend — batched Riccati-structured MPC.

Second, independent solver backend beside the condensed GN-SQP
(``solver/sqp.py``).  Same NLP (do-mpc objective + pressure bounds; see
sqp.py for the reference citations), different linear algebra: a
time-structured LQR backward (Riccati) sweep over 6x6 blocks instead of a
dense N x N condensed solve — the classic iLQR factorization of the same
KKT system the reference hands to MA27/MUMPS.

Why keep both:
* cross-validation — two independent solvers agreeing on the recorded
  IPOPT sequences is a strong correctness signal (tests/test_riccati.py);
* scaling — the Riccati recursion is O(N) per iteration in 6x6 blocks vs
  the condensed solver's O(N^2) Jacobian rollout, so it owns the long
  horizons: this backend is what makes the Generate-Data flagship config
  (N=25, ``/root/reference/Generate Data/template_mpc.py:20``) run at TPU
  throughput instead of the condensed path's compile-bound crawl.

Exact formulation (no approximation of the du coupling): augmented state
``z = [x (5), w]`` with ``w`` = previously applied *scaled* input, control
``v_k`` = scaled input.  Dynamics ``z+ = [F(x, v), v]``; stage cost

    l_k(z, v) = rterm (v - w)^2 + [k>=1] ((y_dot - ref)^2 + AL(c(x)))
    lf(z_N)   = (y_dot - ref)^2 + AL(c(x))

which reproduces the do-mpc objective exactly (lterm over stages 1..N-1,
mterm at N, rterm on scaled du including the u_prev link;
``Generate Data/template_mpc.py:44-50``).  Gauss-Newton (iLQR)
quadraticization from stage residuals, augmented Lagrangian for the
pressure bounds, branch-free forward line search, shift warm start.

Everything is written explicit-batch (:func:`solve_batch`): the scans run
over the horizon only, every per-stage operation carries the full scenario
batch, so the batch axis lands on the VPU lanes and the 6x6 block algebra
runs as batched contractions.  The per-iteration structure avoids repeated
rollouts entirely: the accepted line-search trajectory is carried to the
next iteration's linearization, so one iteration costs one linearization
sweep (7 tangents) plus one multi-alpha forward sweep — no separate
rollout or cost evaluation passes.  Convergence is masked per scenario
(fixed iteration count, no-op once the dual infeasibility ``max_k |Q_v|``
drops below ``cfg.tol_grad``), matching the condensed solver's semantics.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..integrate.rk4 import rk4_step
from ..physics import press
from ..physics.scaling import U_SCALE
from .sqp import TRACE_COLS, Diagnostics, MPCConfig, _P_SCALE, polish

# Forward line-search ladder on the feedforward term.  Small trailing
# alphas matter near the cavitation transient where the Gauss-Newton model
# is locally poor; measured on the golden recordings (tests/test_riccati.py).
_ALPHAS = (1.0, 0.5, 0.1, 0.02)


class ILQRState(NamedTuple):
    v: jax.Array     # (..., N) scaled input trajectory (warm start)
    lam: jax.Array   # (..., N, nc) AL multipliers, stage-major


def _nc(cfg: MPCConfig) -> int:
    return 2 if cfg.p_max is None else 4


def init_state(cfg: MPCConfig, dtype=jnp.float32) -> ILQRState:
    return ILQRState(v=jnp.zeros((cfg.horizon,), dtype),
                     lam=jnp.zeros((cfg.horizon, _nc(cfg)), dtype))


def shift_state(state: ILQRState) -> ILQRState:
    return ILQRState(
        v=jnp.concatenate([state.v[..., 1:], state.v[..., -1:]], axis=-1),
        lam=state.lam)


def _plant_step(cfg: MPCConfig, x, v_k):
    """One control period of the prediction model; broadcasts over batch."""
    def f(xx, uu):
        return press.rhs(xx, uu, cfg.params, cfg.variant)
    return rk4_step(f, x, v_k * U_SCALE, cfg.dt, cfg.substeps)


def _aug_step(cfg: MPCConfig, z, v_k):
    """Augmented dynamics z+ = [F(x, v), v], shapes (..., 6) / (...,)."""
    x_next = _plant_step(cfg, z[..., :5], v_k)
    return jnp.concatenate([x_next, v_k[..., None]], axis=-1)


def _constraints(cfg: MPCConfig, x):
    """Pressure inequalities c(x) >= 0 in scaled units, shape (..., nc)."""
    lo = cfg.p_min / _P_SCALE
    cons = [x[..., 2] / _P_SCALE - lo, x[..., 3] / _P_SCALE - lo]
    if cfg.p_max is not None:
        hi = cfg.p_max / _P_SCALE
        cons += [hi - x[..., 2] / _P_SCALE, hi - x[..., 3] / _P_SCALE]
    return jnp.stack(cons, axis=-1)


def _stage_res(cfg: MPCConfig, z, v, ref, lam_k, mu):
    """Stage residual [sqrt(rterm) du, (y_dot - ref), AL constraint terms],
    broadcasting over leading axes; the k=0 mask is applied by callers."""
    c = _constraints(cfg, z[..., :5])
    du = jnp.sqrt(cfg.rterm) * (v - z[..., 5])
    tr = z[..., 1] - ref
    rc = jnp.sqrt(mu / 2.0) * jnp.maximum(lam_k / mu - c, 0.0)
    return jnp.concatenate([du[..., None], tr[..., None], rc], axis=-1)


def _terminal_res(cfg: MPCConfig, z, ref, lam_k, mu):
    c = _constraints(cfg, z[..., :5])
    tr = z[..., 1] - ref
    rc = jnp.sqrt(mu / 2.0) * jnp.maximum(lam_k / mu - c, 0.0)
    return jnp.concatenate([tr[..., None], rc], axis=-1)


def _res_mask(cfg: MPCConfig, dtype):
    """Stage-0 mask: only the du residual is live (no tracking/constraint
    terms at the (fixed) initial state)."""
    return jnp.concatenate([jnp.ones((1,), dtype),
                            jnp.zeros((1 + _nc(cfg),), dtype)])


def _rollout_batch(cfg: MPCConfig, x0, u_prev_s, v):
    """Departure states z_0..z_{N-1} (B, N, 6) and terminal z_N (B, 6)."""
    z0 = jnp.concatenate([x0, u_prev_s[:, None]], axis=-1)

    def body(z, v_k):
        return _aug_step(cfg, z, v_k), z

    zN, zs = jax.lax.scan(body, z0, jnp.moveaxis(v, 0, 1))
    return jnp.moveaxis(zs, 0, 1), zN


def _lam_dep(lam):
    """Multipliers for stage-k departure constraints: stage k >= 1 uses
    lam[k-1] (constraints at the arrival of step k-1); k=0 is masked."""
    B, N, nc = lam.shape
    return jnp.concatenate([jnp.zeros((B, 1, nc), lam.dtype), lam[:, :-1]],
                           axis=1)


def solve_batch(cfg: MPCConfig, x0, ref, u_prev, state: ILQRState):
    """B scenarios of one MPC solve via AL-iLQR, in one program.

    Args:
      x0: (B, 5) measured states (physical units).
      ref: (B,) speed references (held over the horizon).
      u_prev: (B,) previously applied inputs (physical units).
      state: warm start; ``v`` (B, N), ``lam`` (B, N, nc).

    Returns (u0 (B,), new ILQRState, Diagnostics with (B,) leaves).
    Semantically ``jax.vmap(solve)`` (pinned by tests/test_riccati.py);
    the batch is explicit so every 6x6 block contraction and line-search
    sweep runs batch-wide on the VPU.
    """
    dtype = state.v.dtype
    B, N = state.v.shape
    nc = _nc(cfg)
    x0 = x0.astype(dtype)
    ref = jnp.asarray(ref, dtype)
    u_prev_s = jnp.asarray(u_prev, dtype) / U_SCALE
    alphas = jnp.asarray(_ALPHAS, dtype)
    A_n = len(_ALPHAS)
    mask0 = _res_mask(cfg, dtype)
    eye7 = jnp.eye(7, dtype=dtype)

    def stage_lin(z, v_k, ref_i, lam_k, mu):
        """Primal + full Jacobian of (dynamics, residual) in one 7-tangent
        linearization sweep."""
        def g(zv):
            zz, vv = zv[:6], zv[6]
            z_next = _aug_step(cfg, zz, vv)
            r = _stage_res(cfg, zz, vv, ref_i, lam_k, mu)
            return jnp.concatenate([z_next, r])

        out, jvp = jax.linearize(g, jnp.concatenate([z, v_k[None]]))
        Jrows = jax.vmap(jvp)(eye7)        # row i = dg/d zv_i, shape (7, 6+nr)
        A = Jrows[:6, :6].T                # dz+/dz (6, 6)
        Bv = Jrows[6, :6]                  # dz+/dv (6,)
        Jz = Jrows[:6, 6:].T               # dr/dz (nr, 6)
        Jv = Jrows[6, 6:]                  # dr/dv (nr,)
        return out[6:], A, Bv, Jz, Jv

    lin_all = jax.vmap(jax.vmap(stage_lin, in_axes=(0, 0, None, 0, None)),
                       in_axes=(0, 0, 0, 0, None))

    def term_lin(zN, ref_i, lam_N, mu):
        def gT(zz):
            return _terminal_res(cfg, zz, ref_i, lam_N, mu)
        rN, jvp = jax.linearize(gT, zN)
        Jrows = jax.vmap(jvp)(jnp.eye(6, dtype=dtype))  # (6, 1+nc)
        return rN, Jrows.T                               # JzN (1+nc, 6)

    term_all = jax.vmap(term_lin, in_axes=(0, 0, 0, None))

    def gn_iter(carry, _):
        v, zs, zN, lam, mu, it_used, d_norm, inf_du, alpha_l = carry
        ld = _lam_dep(lam)

        r, Amat, Bv, Jz, Jv = lin_all(zs, v, ref, ld, mu)   # (B,N,...)
        # Stage-0 mask: zero the tracking/constraint residual rows (and
        # their Jacobians) at k=0.
        m = jnp.concatenate([mask0[None], jnp.ones((N - 1, r.shape[-1]),
                                                   dtype)])  # (N, nr)
        r = r * m
        Jz = Jz * m[None, :, :, None]
        Jv = Jv * m[None]

        rN, JzN = term_all(zN, ref, lam[:, -1], mu)
        cost0 = jnp.sum(r * r, axis=(1, 2)) + jnp.sum(rN * rN, axis=1)

        # Gauss-Newton blocks per (b, k).
        lz = 2.0 * jnp.einsum("bkri,bkr->bki", Jz, r)
        lv = 2.0 * jnp.einsum("bkr,bkr->bk", Jv, r)
        Lzz = 2.0 * jnp.einsum("bkri,bkrj->bkij", Jz, Jz)
        Lvv = 2.0 * jnp.einsum("bkr,bkr->bk", Jv, Jv)
        Lvz = 2.0 * jnp.einsum("bkr,bkri->bki", Jv, Jz)
        VzN = 2.0 * jnp.einsum("bri,br->bi", JzN, rN)
        VzzN = 2.0 * jnp.einsum("bri,brj->bij", JzN, JzN)

        # Backward Riccati sweep (stage-major scan; batch stays in lanes).
        def backward(c_, inp):
            Vz, Vzz, qmax = c_
            A_k, B_k, lz_k, lv_k, Lzz_k, Lvv_k, Lvz_k = inp
            Qz = lz_k + jnp.einsum("bji,bj->bi", A_k, Vz)
            Qv = lv_k + jnp.einsum("bj,bj->b", B_k, Vz)
            T = jnp.einsum("bji,bjk->bik", A_k, Vzz)
            Qzz = Lzz_k + jnp.einsum("bik,bkl->bil", T, A_k)
            VB = jnp.einsum("bjk,bk->bj", Vzz, B_k)
            Qvv = Lvv_k + jnp.einsum("bj,bj->b", B_k, VB) + cfg.lm_reg
            Qvz = Lvz_k + jnp.einsum("bj,bji->bi", VB, A_k)
            kg = -Qv / Qvv
            Kg = -Qvz / Qvv[:, None]
            Vz_n = Qz + Kg * Qv[:, None] + Qvz * kg[:, None] \
                + Kg * (Qvv * kg)[:, None]
            Vzz_n = Qzz + Kg[:, :, None] * Qvz[:, None, :] \
                + Qvz[:, :, None] * Kg[:, None, :] \
                + Qvv[:, None, None] * Kg[:, :, None] * Kg[:, None, :]
            return (Vz_n, Vzz_n, jnp.maximum(qmax, jnp.abs(Qv))), (kg, Kg)

        sm = lambda a: jnp.moveaxis(a, 1, 0)  # (B, N, ...) -> (N, B, ...)
        (_, _, qmax), (kgs, Kgs) = jax.lax.scan(
            backward, (VzN, VzzN, jnp.zeros((B,), dtype)),
            (sm(Amat), sm(Bv), sm(lz), sm(lv), sm(Lzz), sm(Lvv), sm(Lvz)),
            reverse=True)  # kgs (N, B), Kgs (N, B, 6)

        converged = qmax < cfg.tol_grad

        # Forward pass: all alphas in one sweep, costs accumulated in-line.
        ks = jnp.arange(N)

        def forward(c_, inp):
            z, cost = c_                       # z (A, B, 6), cost (A, B)
            v_k, kg, Kg, z_nom, ld_k, k = inp
            v_new = v_k[None] + alphas[:, None] * kg[None] \
                + jnp.einsum("bi,abi->ab", Kg, z - z_nom[None])
            r_k = _stage_res(cfg, z, v_new, ref[None], ld_k[None], mu)
            r_k = jnp.where(k == 0, r_k * mask0, r_k)
            cost = cost + jnp.sum(r_k * r_k, axis=-1)
            z_next = _aug_step(cfg, z, v_new)
            return (z_next, cost), (v_new, z)

        z0 = jnp.concatenate([x0, u_prev_s[:, None]], axis=-1)
        z0a = jnp.broadcast_to(z0[None], (A_n, B, 6))
        (z_fin, costs), (v_cand, z_cand) = jax.lax.scan(
            forward, (z0a, jnp.zeros((A_n, B), dtype)),
            (sm(v), kgs, Kgs, sm(zs), sm(ld), ks))
        rNc = _terminal_res(cfg, z_fin, ref[None], lam[None, :, -1], mu)
        costs = costs + jnp.sum(rNc * rNc, axis=-1)        # (A, B)

        best = jnp.argmin(costs, axis=0)                   # (B,)
        bidx = jnp.arange(B)
        v_best = jnp.moveaxis(v_cand[:, best, bidx], 0, -1)       # (B, N)
        zs_best = jnp.moveaxis(z_cand[:, best, bidx], 0, 1)       # (B, N, 6)
        zN_best = z_fin[best, bidx]                               # (B, 6)
        c_best = costs[best, bidx]

        take = jnp.logical_and(c_best < cost0, jnp.logical_not(converged))
        tk = take[:, None]
        v_n = jnp.where(tk, v_best, v)
        zs_n = jnp.where(tk[:, :, None], zs_best, zs)
        zN_n = jnp.where(tk, zN_best, zN)
        d_n = jnp.where(take, jnp.linalg.norm(v_best - v, axis=-1), 0.0)
        a_n = jnp.where(take, alphas[best], alpha_l)
        it_n = it_used + jnp.where(converged, 0, 1)
        ys = None
        if cfg.record_trace:
            # Per-iteration record at the incoming iterate (TRACE_COLS
            # layout, matching sqp.solve's trace): true objective and
            # primal infeasibility from the carried trajectory, dual
            # infeasibility max|Q_v|, accepted step norm/size, AL penalty.
            arr_t = jnp.concatenate([zs[:, 1:, :5], zN[:, None, :5]], axis=1)
            cs_t = _constraints(cfg, arr_t)
            tr_t = jnp.concatenate([zs[:, 1:, 1], zN[:, 1:2]],
                                   axis=1) - ref[:, None]
            dv_t = v - zs[:, :, 5]
            obj_t = jnp.sum(tr_t * tr_t, axis=1) \
                + cfg.rterm * jnp.sum(dv_t * dv_t, axis=1)
            ys = jnp.stack(
                [obj_t, jnp.maximum(jnp.max(-cs_t, axis=(1, 2)), 0.0),
                 qmax, d_n, a_n,
                 jnp.broadcast_to(jnp.asarray(mu, dtype), (B,))], axis=-1)
        return (v_n, zs_n, zN_n, lam, mu, it_n, d_n, qmax, a_n), ys

    def al_round(carry, _):
        carry, tr = jax.lax.scan(gn_iter, carry, None, length=cfg.gn_iters,
                                 unroll=cfg.gn_iters if cfg.iter_unroll else 1)
        v, zs, zN, lam, mu, it_used, d_norm, inf_du, alpha_l = carry
        # Constraints at the arrival states x_1..x_N.
        arr = jnp.concatenate([zs[:, 1:, :5], zN[:, None, :5]], axis=1)
        cs = _constraints(cfg, arr)                        # (B, N, nc)
        lam_new = jnp.maximum(lam - mu * cs, 0.0)
        return (v, zs, zN, lam_new, mu * cfg.mu_factor, it_used, d_norm,
                inf_du, alpha_l), tr

    zs0, zN0 = _rollout_batch(cfg, x0, u_prev_s, state.v)
    init = (state.v, zs0, zN0, state.lam, jnp.asarray(cfg.mu0, dtype),
            jnp.zeros((B,), jnp.int32), jnp.zeros((B,), dtype),
            jnp.zeros((B,), dtype), jnp.zeros((B,), dtype))
    (v, zs, zN, lam, mu, iters, d_norm, inf_du, alpha), traces = jax.lax.scan(
        al_round, init, None, length=cfg.al_iters,
        unroll=cfg.al_iters if cfg.iter_unroll else 1)

    if cfg.polish_iters > 0:
        # Active-set Newton polish (sqp.polish): same NLP, same decision
        # vector v, so the condensed polish applies verbatim per scenario.
        # The stage-major (N, nc) multipliers map to the condensed solver's
        # type-major layout (concat over constraint types of all stages).
        lam_flat = jnp.swapaxes(lam, 1, 2).reshape(B, -1)
        v = jax.vmap(lambda xi, ri, ui, vi, li: polish(
            cfg, xi, ri, ui, vi, li))(x0, ref, u_prev_s, v, lam_flat)
        zs, zN = _rollout_batch(cfg, x0, u_prev_s, v)

    arr = jnp.concatenate([zs[:, 1:, :5], zN[:, None, :5]], axis=1)
    cs = _constraints(cfg, arr)
    # True (non-AL) objective from the carried trajectory.
    tr = jnp.concatenate([zs[:, 1:, 1], zN[:, 1:2]], axis=1) - ref[:, None]
    dv = v - zs[:, :, 5]
    obj = jnp.sum(tr * tr, axis=1) + cfg.rterm * jnp.sum(dv * dv, axis=1)
    diag = Diagnostics(
        iters=iters,
        obj=obj,
        inf_pr=jnp.maximum(jnp.max(-cs, axis=(1, 2)), 0.0),
        inf_du=inf_du,
        reg=jnp.full((B,), cfg.lm_reg, dtype),
        d_norm=d_norm,
        mu=jnp.full((B,), mu, dtype),
        alpha=alpha,
        # (al, gn, B, C) -> (B, al*gn, C), matching sqp.solve's layout.
        trace=(jnp.moveaxis(traces, 2, 0).reshape(
            B, cfg.al_iters * cfg.gn_iters, len(TRACE_COLS))
            if cfg.record_trace else None))
    return v[:, 0] * U_SCALE, ILQRState(v=v, lam=lam), diag


def solve(cfg: MPCConfig, x0, ref, u_prev, state: ILQRState):
    """One MPC solve via AL-iLQR.  Mirrors sqp.solve's signature; thin
    B=1 wrapper over :func:`solve_batch`."""
    dtype = state.v.dtype
    u0, st, diag = solve_batch(
        cfg, jnp.asarray(x0)[None], jnp.asarray(ref, dtype)[None],
        jnp.asarray(u_prev, dtype)[None],
        ILQRState(v=state.v[None], lam=state.lam[None]))
    sq = lambda a: jnp.squeeze(a, axis=0)
    return sq(u0), ILQRState(v=sq(st.v), lam=sq(st.lam)), \
        jax.tree.map(sq, diag)
