"""Experiment: train the FNN controller through the TRUE RK4 plant.

Validates the analytic-policy-gradient trainer (nn/train.py:
train_plant_in_loop) — gradient health, convergence speed, and final
closed-loop tracking on the reference evaluation streams.

Usage: JAX_PLATFORMS=cpu python scripts/plant_train_exp.py [--steps 200]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="results_repro")
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--n-traj", type=int, default=16)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--noise", action="store_true",
                    help="process noise during training rollouts")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_fct")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import jax.numpy as jnp
    import numpy as np

    from forging_control_tpu.eval import metrics
    from forging_control_tpu.loop import closed_loop as cl
    from forging_control_tpu.nn import datasets, fnn, scalers, train
    from forging_control_tpu.pipelines import generate_data, unsupervised
    from forging_control_tpu.refgen import streams

    results = generate_data.load(generate_data.dataset_path(args.out, 10))

    # Scalers exactly as the unsupervised pipeline fits them (train split).
    y_dot = results["y_dot"].ravel()
    z = results["z"].ravel()
    u = results["u"].ravel()[:, None]
    tr, _, _ = datasets.split_603030(len(y_dot))
    ydot_sc = scalers.fit("maxabs", y_dot[tr, None])
    z_sc = scalers.fit("maxabs", z[tr, None])
    u_sc = scalers.fit("maxabs", u[tr])
    in_sc = scalers.Scaler(
        shift=jnp.concatenate([ydot_sc.shift[:1], z_sc.shift[:1],
                               ydot_sc.shift[:1]]),
        scale=jnp.concatenate([ydot_sc.scale[:1], z_sc.scale[:1],
                               ydot_sc.scale[:1]]))

    cl_val = unsupervised.make_closed_loop_val(in_sc, u_sc, n_traj=8, seed=0)

    params, _ = fnn.init(jax.random.PRNGKey(0), dtype=jnp.float32)
    process_std = (5e-1, 2e0, 5e7, 5e7, 2e0) if args.noise else (0.0,) * 5

    def log_fn(step, tl, sel):
        print(json.dumps({"step": step, "train": tl, "cl_val": sel}),
              flush=True)

    t0 = time.time()
    params, rep = train.train_plant_in_loop(
        params, in_sc, u_sc, steps=args.steps, n_traj=args.n_traj,
        lr=args.lr, process_std=process_std, seed=0,
        closed_loop_val_fn=cl_val, log_fn=log_fn)
    wall = time.time() - t0

    # Final eval on the CPython-exact evaluation streams (2 traj), the same
    # protocol the unsupervised pipeline reports NN closed-loop metrics on.
    refs = jnp.asarray(streams.reference_table(2, "unsupervised", 300),
                       jnp.float32)
    x0 = jnp.tile(jnp.asarray(cl.press.X0_REFERENCE, jnp.float32), (2, 1))
    ctrl = cl.FunctionController(fnn.make_policy(params, in_sc, u_sc))
    loop_cfg = cl.LoopConfig(t_steps=300, variant="smooth")
    _, telem = jax.jit(lambda x, r, k: cl.run_batch(loop_cfg, ctrl, x, r, k))(
        x0, refs, jax.random.PRNGKey(1))
    ref = jnp.asarray(np.asarray(telem.ref).ravel())
    yd = jnp.asarray(np.asarray(telem.x[..., 1]).ravel())
    final = {k: float(v)
             for k, v in metrics.tracking_metrics(ref, yd).items()}
    final["Command"] = float(np.abs(np.asarray(telem.u)).mean())
    print(json.dumps({"final": final, "wall_s": wall,
                      "best_cl_val": min(rep.cl_val_losses)}), flush=True)


if __name__ == "__main__":
    main()
