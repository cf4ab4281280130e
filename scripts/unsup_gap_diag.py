"""Diagnose the unsupervised closed-loop gap (VERDICT r2 task 1).

Measures, on the unsupervised evaluation protocol (2 traj x 300 steps,
CPython-exact 'unsupervised' reference streams, process noise):
  (a) the MPC teacher's closed-loop MAE (compat + default presets) — the
      floor a student policy is chasing;
  (b) the noise-realization spread of that MAE across eval keys — how much
      of the reference-vs-us difference is eval luck vs policy quality.

Usage: python scripts/unsup_gap_diag.py
"""

import json
import os
import sys

if os.environ.get("FCT_CPU"):
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_fct")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import jax.numpy as jnp
    import numpy as np

    from forging_control_tpu.eval import metrics
    from forging_control_tpu.loop import closed_loop as cl
    from forging_control_tpu.refgen import streams
    from forging_control_tpu.solver import sqp

    PROCESS_STD = (5e-1, 2e0, 5e7, 5e7, 2e0)
    t_traj, n_traj = 300, 2
    refs = jnp.asarray(streams.reference_table(n_traj, "unsupervised", t_traj),
                       jnp.float32)
    x0 = jnp.tile(jnp.asarray(cl.press.X0_REFERENCE, jnp.float32),
                  (n_traj, 1))

    out = {}
    for preset in ("ipopt_compat", "default"):
        make = {"default": sqp.MPCConfig,
                "ipopt_compat": sqp.MPCConfig.ipopt_compat}[preset]
        ctrl = cl.MPCController(make(horizon=10, variant="smooth"))
        loop_cfg = cl.LoopConfig(t_steps=t_traj, variant="smooth",
                                 process_std=PROCESS_STD)
        run_fn = jax.jit(lambda x, r, k: cl.run_batch(loop_cfg, ctrl, x, r, k))
        maes = []
        for s in range(8):
            # s=0 with seed protocol PRNGKey(seed+1)=PRNGKey(1) is the
            # pipeline's exact eval draw.
            _, telem = run_fn(x0, refs, jax.random.PRNGKey(1 + s))
            mae = float(metrics.mae(jnp.asarray(telem.ref),
                                    jnp.asarray(telem.x[..., 1])))
            maes.append(mae)
            print(json.dumps({"preset": preset, "key": 1 + s, "MAE": mae}),
                  flush=True)
        out[preset] = {"eval_key_mae": maes[0], "mean": float(np.mean(maes)),
                       "std": float(np.std(maes)), "min": float(np.min(maes)),
                       "max": float(np.max(maes))}
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
