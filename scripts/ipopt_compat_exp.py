"""Sweep soft-constraint solver settings against the recorded IPOPT loop.

The default solver stays feasible (p >= 0) through the work->return
cavitation transient where the recorded IPOPT iterates violate p >= 0 by
~5e6 Pa and track the reference better (docs/RESULTS.md).  This sweep
measures which relaxation of the augmented-Lagrangian pressure handling
reproduces the recorded closed-loop behavior.

Usage: JAX_PLATFORMS=cpu python scripts/ipopt_compat_exp.py
"""

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_fct")

import jax.numpy as jnp
import numpy as np

GOLDEN = "/root/reference/Supervised Learning/results/MPC_dataframe.txt"


def main():
    from forging_control_tpu.loop import closed_loop as cl
    from forging_control_tpu.solver import sqp

    rows = np.loadtxt(GOLDEN, skiprows=1)
    refs = jnp.array(rows[:, 1].reshape(2, 300))
    x0 = jnp.tile(cl.default_x0(), (2, 1))
    loop_cfg = cl.LoopConfig(t_steps=300, variant="smooth")
    golden_mae = float(np.abs(rows[:, 3] - rows[:, 1]).mean())

    base = sqp.MPCConfig(horizon=10, variant="smooth")
    sweep = {
        "default": {},
        "mu_nogrow": dict(mu_factor=1.0),
        "mu10_nogrow": dict(mu0=1e1, mu_factor=1.0),
        "mu1_nogrow": dict(mu0=1e0, mu_factor=1.0),
        "mu01_nogrow": dict(mu0=1e-1, mu_factor=1.0),
        "pmin_relaxed": dict(p_min=-5e6),
        "pmin_relaxed_mu1": dict(p_min=-5e6, mu0=1e0, mu_factor=1.0),
    }

    out = {"golden_MAE": golden_mae}
    for name, kw in sweep.items():
        cfg = dataclasses.replace(base, **kw)
        ctrl = cl.MPCController(cfg)
        _, telem = jax.jit(
            lambda x, r, k, c=ctrl: cl.run_batch(loop_cfg, c, x, r, k))(
                x0, refs, jax.random.PRNGKey(0))
        y_dot = np.array(telem.x[..., 1]).ravel()
        u = np.array(telem.u).ravel()
        out[name] = {
            "tracking_MAE": float(np.abs(y_dot - np.array(telem.ref).ravel())
                                  .mean()),
            "u_dev_vs_golden": float(np.abs(u - rows[:, 7]).mean()),
            "max_inf_pr": float(np.array(telem.diag.inf_pr).max()),
        }
        print(json.dumps({name: out[name]}), flush=True)

    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
