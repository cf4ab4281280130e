"""AL-iLQR solver backend — Riccati-structured MPC.

Second, independent solver backend beside the condensed GN-SQP
(``solver/sqp.py``).  Same NLP (do-mpc objective + pressure bounds; see
sqp.py for the reference citations), different linear algebra: a
time-structured LQR backward (Riccati) sweep over 6x6 blocks instead of a
dense N x N condensed solve — the classic iLQR factorization of the same
KKT system the reference hands to MA27/MUMPS.

Why keep both:
* cross-validation — two independent solvers agreeing on the recorded
  IPOPT sequences is a strong correctness signal (tests/test_riccati.py);
* scaling — the Riccati recursion is O(N) in 6x6 blocks, the natural
  shape for long horizons and parallel-scan extensions; the condensed
  solver wins at N <= 25.

Exact formulation (no approximation of the du coupling): augmented state
``z = [x (5), w]`` with ``w`` = previously applied *scaled* input, control
``v_k`` = scaled input.  Dynamics ``z+ = [F(x, v), v]``; stage cost

    l_k(z, v) = rterm (v - w)^2 + [k>=1] ((y_dot - ref)^2 + AL(c(x)))
    lf(z_N)   = (y_dot - ref)^2 + AL(c(x))

which reproduces the do-mpc objective exactly (lterm over stages 1..N-1,
mterm at N, rterm on scaled du including the u_prev link).  Gauss-Newton
(iLQR) quadraticization from stage residuals, augmented Lagrangian for the
pressure bounds, branch-free forward line search, shift warm start.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..integrate.rk4 import rk4_step
from ..physics import press
from ..physics.scaling import U_SCALE
from .sqp import Diagnostics, MPCConfig, _P_SCALE


class ILQRState(NamedTuple):
    v: jax.Array     # (N,) scaled input trajectory (warm start)
    lam: jax.Array   # (N, nc) AL multipliers, stage-major


def _nc(cfg: MPCConfig) -> int:
    return 2 if cfg.p_max is None else 4


def init_state(cfg: MPCConfig, dtype=jnp.float32) -> ILQRState:
    return ILQRState(v=jnp.zeros((cfg.horizon,), dtype),
                     lam=jnp.zeros((cfg.horizon, _nc(cfg)), dtype))


def shift_state(state: ILQRState) -> ILQRState:
    return ILQRState(v=jnp.concatenate([state.v[1:], state.v[-1:]]),
                     lam=state.lam)


def _plant_step(cfg: MPCConfig, x, v_k):
    def f(xx, uu):
        return press.rhs(xx, uu, cfg.params, cfg.variant)
    return rk4_step(f, x, v_k * U_SCALE, cfg.dt, cfg.substeps)


def _aug_step(cfg: MPCConfig, z, v_k):
    x_next = _plant_step(cfg, z[:5], v_k)
    return jnp.concatenate([x_next, v_k[None]])


def _constraints(cfg: MPCConfig, x):
    lo = cfg.p_min / _P_SCALE
    cons = [x[2] / _P_SCALE - lo, x[3] / _P_SCALE - lo]
    if cfg.p_max is not None:
        hi = cfg.p_max / _P_SCALE
        cons += [hi - x[2] / _P_SCALE, hi - x[3] / _P_SCALE]
    return jnp.stack(cons)


def _stage_res(cfg: MPCConfig, z, v, ref, lam_k, mu, tracked: bool):
    """GN residual vector of l_k at (z, v); ``tracked`` statically gates
    the k>=1 tracking/constraint terms."""
    parts = [jnp.sqrt(cfg.rterm) * (v - z[5])[None]]
    if tracked:
        parts.append((z[1] - ref)[None])
        c = _constraints(cfg, z[:5])
        parts.append(jnp.sqrt(mu / 2.0) * jnp.maximum(lam_k / mu - c, 0.0))
    return jnp.concatenate(parts)


def _terminal_res(cfg: MPCConfig, z, ref, lam_k, mu):
    c = _constraints(cfg, z[:5])
    return jnp.concatenate([
        (z[1] - ref)[None],
        jnp.sqrt(mu / 2.0) * jnp.maximum(lam_k / mu - c, 0.0)])


def _rollout(cfg: MPCConfig, x0, u_prev_s, v):
    z0 = jnp.concatenate([x0, u_prev_s[None]])

    def body(z, v_k):
        z_next = _aug_step(cfg, z, v_k)
        return z_next, z

    zN, zs = jax.lax.scan(body, z0, v)
    return zs, zN  # departure states z_0..z_{N-1}, terminal z_N


def _total_cost(cfg: MPCConfig, x0, ref, u_prev_s, v, lam, mu):
    zs, zN = _rollout(cfg, x0, u_prev_s, v)

    def stage_cost(k, z, v_k, lam_k):
        r0 = _stage_res(cfg, z, v_k, ref, lam_k, mu, tracked=True)
        r_untracked = _stage_res(cfg, z, v_k, ref, lam_k, mu, tracked=False)
        full = jnp.sum(r0**2)
        duonly = jnp.sum(r_untracked**2)
        return jnp.where(k == 0, duonly, full)

    ks = jnp.arange(cfg.horizon)
    lam_dep = jnp.concatenate([jnp.zeros((1, _nc(cfg)), lam.dtype), lam[:-1]])
    costs = jax.vmap(stage_cost)(ks, zs, v, lam_dep)
    rN = _terminal_res(cfg, zN, ref, lam[-1], mu)
    return jnp.sum(costs) + jnp.sum(rN**2)


def solve(cfg: MPCConfig, x0, ref, u_prev, state: ILQRState):
    """One MPC solve via AL-iLQR.  Mirrors sqp.solve's signature."""
    dtype = state.v.dtype
    x0 = x0.astype(dtype)
    ref = jnp.asarray(ref, dtype)
    u_prev_s = jnp.asarray(u_prev, dtype) / U_SCALE
    N = cfg.horizon
    nc = _nc(cfg)
    eye6 = jnp.eye(6, dtype=dtype)

    # Multipliers for stage-k departure constraints: stage k >= 1 uses
    # lam[k-1] (constraints at arrival of step k-1); terminal uses lam[N-1].
    def lam_dep(lam):
        return jnp.concatenate([jnp.zeros((1, nc), dtype), lam[:-1]])

    def ilqr_iter(carry, _):
        v, lam, mu, it_used, d_norm = carry

        zs, zN = _rollout(cfg, x0, u_prev_s, v)
        ld = lam_dep(lam)

        # Per-stage linearization (vmapped): dynamics + GN cost blocks.
        def stage_blocks(k, z, v_k, lam_k):
            A = jax.jacfwd(lambda zz: _aug_step(cfg, zz, v_k))(z)      # (6,6)
            B = jax.jacfwd(lambda vv: _aug_step(cfg, z, vv))(v_k)      # (6,)

            def res_tracked(zz, vv):
                return _stage_res(cfg, zz, vv, ref, lam_k, mu, True)

            def res_plain(zz, vv):
                full = _stage_res(cfg, zz, vv, ref, lam_k, mu, True)
                # zero out tracked terms for k = 0 (same shape, masked)
                mask = jnp.concatenate([
                    jnp.ones((1,), dtype),
                    jnp.zeros((1 + nc,), dtype)])
                return full * mask

            r_t = res_tracked(z, v_k)
            r_p = res_plain(z, v_k)
            Jz_t = jax.jacfwd(res_tracked, 0)(z, v_k)
            Jv_t = jax.jacfwd(res_tracked, 1)(z, v_k)
            Jz_p = jax.jacfwd(res_plain, 0)(z, v_k)
            Jv_p = jax.jacfwd(res_plain, 1)(z, v_k)
            is0 = (k == 0)
            r = jnp.where(is0, r_p, r_t)
            Jz = jnp.where(is0, Jz_p, Jz_t)
            Jv = jnp.where(is0, Jv_p, Jv_t)
            return A, B, (2 * Jz.T @ r, 2 * jnp.dot(Jv, r),
                          2 * Jz.T @ Jz, 2 * jnp.dot(Jv, Jv), 2 * Jv @ Jz)

        ks = jnp.arange(N)
        As, Bs, (lzs, lvs, Lzzs, Lvvs, Lvzs) = jax.vmap(stage_blocks)(
            ks, zs, v, ld)

        # Terminal value model from terminal residuals.
        rN = _terminal_res(cfg, zN, ref, lam[-1], mu)
        JzN = jax.jacfwd(lambda zz: _terminal_res(cfg, zz, ref, lam[-1], mu))(zN)
        VzN = 2 * JzN.T @ rN
        VzzN = 2 * JzN.T @ JzN

        cost0 = _total_cost(cfg, x0, ref, u_prev_s, v, lam, mu)

        # Backward Riccati sweep.
        def backward(carry_, inp):
            Vz, Vzz = carry_
            A, B, lz, lv, Lzz, Lvv, Lvz = inp
            Qz = lz + A.T @ Vz
            Qv = lv + jnp.dot(B, Vz)
            Qzz = Lzz + A.T @ Vzz @ A
            Qvv = Lvv + jnp.dot(B, Vzz @ B) + cfg.lm_reg
            Qvz = Lvz + B @ Vzz @ A
            k_g = -Qv / Qvv
            K_g = -Qvz / Qvv
            Vz_new = Qz + K_g * Qv + Qvz * k_g + K_g * (Qvv * k_g)
            Vzz_new = Qzz + jnp.outer(K_g, Qvz) + jnp.outer(Qvz, K_g) \
                + Qvv * jnp.outer(K_g, K_g)
            return (Vz_new, Vzz_new), (k_g, K_g)

        (_, _), (kgs, Kgs) = jax.lax.scan(
            backward, (VzN, VzzN),
            (As, Bs, lzs, lvs, Lzzs, Lvvs, Lvzs), reverse=True)

        # Forward pass with step-size ladder on the feedforward term.
        def forward(alpha):
            def fwd(z, inp):
                v_k, k_g, K_g, z_nom = inp
                v_new = v_k + alpha * k_g + K_g @ (z - z_nom)
                z_next = _aug_step(cfg, z, v_new)
                return z_next, v_new

            z0 = jnp.concatenate([x0, u_prev_s[None]])
            _, v_new = jax.lax.scan(fwd, z0, (v, kgs, Kgs, zs))
            return _total_cost(cfg, x0, ref, u_prev_s, v_new, lam, mu), v_new

        pairs = [forward(a) for a in (1.0, 0.5, 0.1, 0.02)]
        costs = jnp.stack([c for c, _ in pairs])
        vs_new = jnp.stack([vv for _, vv in pairs])
        best = jnp.argmin(costs)
        take = costs[best] < cost0
        v_new = jnp.where(take, vs_new[best], v)
        d_new = jnp.where(take, jnp.linalg.norm(v_new - v), 0.0)
        return (v_new, lam, mu, it_used + 1, d_new), None

    def al_round(carry, _):
        carry, _ = jax.lax.scan(ilqr_iter, carry, None, length=cfg.gn_iters)
        v, lam, mu, it_used, d_norm = carry
        zs, zN = _rollout(cfg, x0, u_prev_s, v)
        arr = jnp.concatenate([zs[1:, :5], zN[None, :5]], axis=0)  # x_1..x_N
        cs = jax.vmap(lambda xx: _constraints(cfg, xx))(arr)
        lam_new = jnp.maximum(lam - mu * cs, 0.0)
        return (v, lam_new, mu * cfg.mu_factor, it_used, d_norm), None

    init = (state.v, state.lam, jnp.asarray(cfg.mu0, dtype),
            jnp.zeros((), jnp.int32), jnp.zeros((), dtype))
    (v, lam, mu, iters, d_norm), _ = jax.lax.scan(
        al_round, init, None, length=cfg.al_iters)

    zs, zN = _rollout(cfg, x0, u_prev_s, v)
    arr = jnp.concatenate([zs[1:, :5], zN[None, :5]], axis=0)
    cs = jax.vmap(lambda xx: _constraints(cfg, xx))(arr)
    zero = jnp.zeros((), dtype)
    diag = Diagnostics(
        iters=iters,
        # true objective: AL terms vanish at lam=0, mu->0
        obj=_total_cost(cfg, x0, ref, u_prev_s, v,
                        jnp.zeros_like(lam), jnp.asarray(1e-12, dtype)),
        inf_pr=jnp.maximum(jnp.max(-cs), 0.0),
        inf_du=zero, reg=jnp.asarray(cfg.lm_reg, dtype),
        d_norm=d_norm, mu=mu, alpha=zero)
    return v[0] * U_SCALE, ILQRState(v=v, lam=lam), diag
