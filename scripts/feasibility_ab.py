"""A/B: feasibility-recovery warm-start carry vs cold multi-start.

The reference threads a warm-start dict (primal + lam_g) through the NN
closed loop and falls back to the previous command when IPOPT fails
(``Supervised Learning/Functions.py:957-1011``).  Round 1 replaced that
with a stateless multi-start projection; this script measures both modes
over the same closed-loop episodes (aggressive proportional policy that
regularly commands into the pressure constraints) and reports:

  * command agreement between modes,
  * worst-case scaled constraint violation along the loop,
  * mean |u_recovered - u_nn| (how much projection bites),
  * wall time per episode batch (warm carry solves 1 seed/step, cold
    evaluates a 7-seed grid).

Usage: python scripts/feasibility_ab.py [batch] [steps]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from forging_control_tpu.loop import closed_loop as cl
from forging_control_tpu.physics import press
from forging_control_tpu.refgen import streams
from forging_control_tpu.solver import feasibility


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 300
    cfg = feasibility.FeasibilityConfig()
    loop_cfg = cl.LoopConfig(t_steps=T, variant="raw")

    # Aggressive proportional tracker: commands beyond the +-0.2 envelope,
    # so the projection is exercised on the work->return transients.
    base = lambda x, r, up: jnp.clip(4.0 * (r - x[1]), -0.3, 0.3)

    key = jax.random.PRNGKey(0)
    refs = streams.sample_references(key, B, "supervised", t_steps=T,
                                     dtype=jnp.float32)
    x0 = jnp.tile(jnp.asarray(press.X0_REFERENCE, jnp.float32), (B, 1))

    def run(ctrl):
        f = jax.jit(lambda x, r, k: cl.run_batch(loop_cfg, ctrl, x, r, k))
        _, telem = f(x0, refs, key)          # compile + warm
        telem.u.block_until_ready()
        t0 = time.perf_counter()
        _, telem = f(x0, refs, jax.random.PRNGKey(1))
        telem.u.block_until_ready()
        return telem, time.perf_counter() - t0

    warm_ctrl = feasibility.RecoveringController(base, cfg)
    cold_ctrl = cl.FunctionController(
        feasibility.make_recovering_policy(base, cfg))

    t_warm, dt_warm = run(warm_ctrl)
    t_cold, dt_cold = run(cold_ctrl)

    u_w, u_c = np.asarray(t_warm.u), np.asarray(t_cold.u)

    # Post-hoc violation + projection bite per mode (recompute constraints
    # at the applied command from the measured pre-step state).
    def stats(telem):
        x_pre = np.concatenate(
            [np.tile(np.asarray(press.measure(
                jnp.asarray(press.X0_REFERENCE, jnp.float32),
                loop_cfg.params, loop_cfg.variant))[None, None], (B, 1, 1)),
             np.asarray(telem.x[:, :-1])], axis=1)
        con = jax.jit(jax.vmap(jax.vmap(
            lambda xx, uu: feasibility._lookahead_constraints(cfg, xx, uu))))
        c = np.asarray(con(jnp.asarray(x_pre), jnp.asarray(telem.u)))
        u_nn = np.asarray(jax.vmap(jax.vmap(base, in_axes=(0, 0, None)),
                                   in_axes=(0, 0, None))(
            jnp.asarray(x_pre), jnp.asarray(telem.ref), 0.0))
        return float(np.maximum(-c, 0).max()), float(
            np.abs(np.asarray(telem.u) - u_nn).mean())

    viol_w, bite_w = stats(t_warm)
    viol_c, bite_c = stats(t_cold)

    out = {
        "batch": B, "steps": T,
        "command_agreement_max_abs_diff": float(np.abs(u_w - u_c).max()),
        "command_agreement_mean_abs_diff": float(np.abs(u_w - u_c).mean()),
        "warm": {"max_violation_scaled": viol_w, "mean_projection_bite": bite_w,
                 "wall_s": round(dt_warm, 4)},
        "cold_multistart": {"max_violation_scaled": viol_c,
                            "mean_projection_bite": bite_c,
                            "wall_s": round(dt_cold, 4)},
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
