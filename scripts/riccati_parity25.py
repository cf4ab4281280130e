"""Cold-start N=25 command parity: AL-iLQR vs scipy trust-constr (f64, CPU).

Sweeps iteration settings to pick the bench/default config for the
Generate-Data flagship horizon.
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
from forging_control_tpu.solver import riccati, sqp

rows = np.loadtxt(
    "/root/reference/Supervised Learning/results/MPC_dataframe.txt",
    skiprows=1)
states = np.vstack([press.X0_REFERENCE, rows[:299, 2:7]])
uprev = np.concatenate([[0.0], rows[:299, 7]])
idx = [10, 40, 80, 120, 160, 200, 260, 290]

cfg_ref = sqp.MPCConfig(horizon=25, variant="raw", gn_iters=1, al_iters=1)
obj_g = jax.jit(jax.value_and_grad(
    lambda v, x0, r, up: sqp._objective_only(cfg_ref, x0, r, up / U_SCALE, v)))
con = jax.jit(lambda v, x0: sqp._constraints(
    cfg_ref, sqp._rollout(cfg_ref, x0, v)))
con_j = jax.jit(jax.jacfwd(con, argnums=0))


def scipy_solve(x0, ref, up):
    nlc = NonlinearConstraint(
        lambda v: np.array(con(jnp.array(v), x0)), 0.0, np.inf,
        jac=lambda v: np.array(con_j(jnp.array(v), x0)))
    res = minimize(
        lambda v: tuple(map(np.array, obj_g(jnp.array(v), x0, ref, up))),
        np.zeros(cfg_ref.horizon), jac=True, method="trust-constr",
        constraints=[nlc],
        options={"gtol": 1e-10, "xtol": 1e-12, "maxiter": 600})
    return res.x[0] * U_SCALE


sp = {}
for i in idx:
    sp[i] = scipy_solve(jnp.array(states[i]), float(rows[i, 1]),
                        float(uprev[i]))
    print(f"scipy step {i}: u0 = {sp[i]:+.8f}")

for gn, al in [(8, 2), (12, 3), (20, 3), (30, 4)]:
    cfg = sqp.MPCConfig(horizon=25, variant="raw", gn_iters=gn, al_iters=al)
    rels = []
    for i in idx:
        u0, _, d = jax.jit(
            lambda x, r, up: riccati.solve(
                cfg, x, r, up, riccati.init_state(cfg, jnp.float64))
        )(jnp.array(states[i]), float(rows[i, 1]), float(uprev[i]))
        rel = abs(float(u0) - sp[i]) / max(abs(sp[i]), 1e-2)
        rels.append(rel)
    print(f"gn={gn} al={al}: max_rel={max(rels):.2e} "
          f"median={np.median(rels):.2e} "
          f"n>1e-3: {sum(r > 1e-3 for r in rels)}/{len(rels)}")
