"""Diagnose the N=5 clamp-recording parity tail: for steps where our
solver disagrees with the recorded IPOPT command by >1e-3, is the recorded
command the true optimum (scipy agrees with the recording -> our
convergence error, polish can fix) or not (IPOPT non-converged there)?
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np
from scipy.optimize import NonlinearConstraint, minimize

from forging_control_tpu.physics import press
from forging_control_tpu.physics.scaling import U_SCALE
from forging_control_tpu.solver import sqp
from forging_control_tpu.utils import dompc_pickle

mnn = dompc_pickle.load(
    "/root/reference/Unsupervised Learning/Model_NN/results/"
    "MPC_simulation.pkl")["simulator"]
xm, um, tvpm = mnn["_x"], mnn["_u"][:, 0], mnn["_tvp"][:, 0]

cfg = sqp.MPCConfig(horizon=5, variant="clamp", gn_iters=15, al_iters=3)
states = np.vstack([press.X0_REFERENCE, xm[:2999]])
states[::300] = press.X0_REFERENCE
uprev = np.concatenate([[0.0], um[:2999]])
uprev[::300] = 0.0


@jax.jit
def batch(xs, rs, ups):
    def one(x, r, up):
        u0, st, d = sqp.solve(cfg, x, r, up, sqp.init_state(cfg, jnp.float64))
        return u0, d.inf_pr
    return jax.vmap(one)(xs, rs, ups)


u0, inf_pr = batch(jnp.array(states), jnp.array(tvpm), jnp.array(uprev))
u0 = np.array(u0)
rel = np.abs(u0 - um) / np.maximum(np.abs(um), 1e-2)
bad = np.where(rel > 1e-3)[0]
print(f"failing steps: {len(bad)}/{len(rel)} "
      f"(frac ok {np.mean(rel < 1e-3):.3f})")

obj_g = jax.jit(jax.value_and_grad(
    lambda v, x0, r, up: sqp._objective_only(cfg, x0, r, up / U_SCALE, v)))
con = jax.jit(lambda v, x0: sqp._constraints(cfg, sqp._rollout(cfg, x0, v)))
con_j = jax.jit(jax.jacfwd(con, argnums=0))

rng = np.random.default_rng(0)
sel = rng.choice(bad, size=min(25, len(bad)), replace=False)
ours_err, rec_err = [], []
for i in sel:
    x0 = jnp.array(states[i])
    ref, up = float(tvpm[i]), float(uprev[i])
    nlc = NonlinearConstraint(
        lambda v: np.array(con(jnp.array(v), x0)), 0.0, np.inf,
        jac=lambda v: np.array(con_j(jnp.array(v), x0)))
    res = minimize(
        lambda v: tuple(map(np.array, obj_g(jnp.array(v), x0, ref, up))),
        np.zeros(cfg.horizon), jac=True, method="trust-constr",
        constraints=[nlc], options={"gtol": 1e-10, "xtol": 1e-12,
                                    "maxiter": 600})
    u_sp = res.x[0] * U_SCALE
    denom = max(abs(u_sp), 1e-2)
    ours_err.append(abs(u0[i] - u_sp) / denom)
    rec_err.append(abs(um[i] - u_sp) / denom)
    print(f"step {i:4d}: ours {u0[i]:+.6f} rec {um[i]:+.6f} "
          f"scipy {u_sp:+.6f}  d_ours {ours_err[-1]:.2e} "
          f"d_rec {rec_err[-1]:.2e}")

print(f"\nvs scipy optimum: ours median {np.median(ours_err):.2e} "
      f"recorded median {np.median(rec_err):.2e}")
print(f"ours within 1e-3 of scipy: {np.mean(np.array(ours_err) < 1e-3):.2f}; "
      f"recorded within 1e-3 of scipy: {np.mean(np.array(rec_err) < 1e-3):.2f}")
