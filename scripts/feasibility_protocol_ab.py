"""Feasibility-recovery A/B at the reference protocol (VERDICT r3 #6).

Warm-start carry (reference semantics: seed primal+multipliers from the
previous step, fall back to the previous command on failure —
``Supervised Learning/Functions.py:957-1011``) vs cold multi-start
(round-1 design), driven by a REAL trained supervised FNN through the
batched closed-loop engine at the reference's evaluation scale:
15 trajectories x 300 steps, process noise, p in [0, 32e6]
(``Supervised Learning/Main.py:610-646``).

Reports per mode: closed-loop tracking MAE, worst scaled constraint
violation along the loop, mean projection bite |u_rec - u_nn|, command
divergence between modes, wall time.

Usage: JAX_PLATFORMS=cpu python scripts/feasibility_protocol_ab.py \
           [--data results_repro_compat/forging_mult_traj_process_noise_N_10.npz]
"""

import argparse
import json
import os
import sys
import time

# FCT_CPU=1 forces the CPU backend BEFORE jax initializes (the axon
# sitecustomize otherwise attaches the TPU regardless of JAX_PLATFORMS —
# see .claude/skills/verify/SKILL.md gotchas).
if os.environ.get("FCT_CPU"):
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data",
                    default="results_repro_compat/"
                            "forging_mult_traj_process_noise_N_10.npz")
    ap.add_argument("--n-traj", type=int, default=15)
    ap.add_argument("--t-traj", type=int, default=300)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_fct")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import jax.numpy as jnp
    import numpy as np

    from forging_control_tpu.eval import metrics
    from forging_control_tpu.loop import closed_loop as cl
    from forging_control_tpu.nn import fnn, train
    from forging_control_tpu.pipelines import generate_data, unsupervised
    from forging_control_tpu.pipelines.config import PROCESS_STD
    from forging_control_tpu.refgen import streams
    from forging_control_tpu.solver import feasibility

    # Train the supervised FNN exactly like the pipeline (fused trainer;
    # scaler/pairing convention owned by pipelines/unsupervised.py).
    results = generate_data.load(args.data)
    in_sc, u_sc = unsupervised.fit_controller_scalers(results)
    xtr, utr, xva, uva = unsupervised._full_density(results, in_sc, u_sc)
    params, _ = fnn.init(jax.random.PRNGKey(0), dtype=jnp.float32)
    params, _ = train.train_supervised(params, xtr, utr, xva, uva,
                                       epochs=20, seed=0)

    base = fnn.make_policy(params, in_sc, u_sc)
    fcfg = feasibility.FeasibilityConfig()
    B, T = args.n_traj, args.t_traj
    loop_cfg = cl.LoopConfig(t_steps=T, variant="smooth",
                             process_std=PROCESS_STD)
    refs = jnp.asarray(streams.reference_table(B, "supervised", T),
                       jnp.float32)
    x0 = jnp.tile(jnp.asarray(cl.press.X0_REFERENCE, jnp.float32), (B, 1))
    key = jax.random.PRNGKey(1)

    ctrls = {
        "plain_nn": cl.FunctionController(base),
        "warm_carry": feasibility.RecoveringController(base, fcfg),
        "cold_multistart": cl.FunctionController(
            feasibility.make_recovering_policy(base, fcfg)),
    }

    telems, walls = {}, {}
    for name, ctrl in ctrls.items():
        run = jax.jit(lambda x, r, k, c=ctrl: cl.run_batch(
            loop_cfg, c, x, r, k))
        _, t_ = run(x0, refs, key)
        t_.u.block_until_ready()
        t0 = time.perf_counter()
        _, t_ = run(x0, refs, key)
        t_.u.block_until_ready()
        walls[name] = time.perf_counter() - t0
        telems[name] = t_

    # Post-hoc: constraints at the applied command from the pre-step
    # measured state; NN raw command for the projection bite.
    x_meas0 = np.asarray(cl.press.measure(
        jnp.asarray(cl.press.X0_REFERENCE, jnp.float32), loop_cfg.params,
        loop_cfg.variant))
    con = jax.jit(jax.vmap(jax.vmap(
        lambda xx, uu: feasibility._lookahead_constraints(fcfg, xx, uu))))
    pol = jax.jit(jax.vmap(jax.vmap(base, in_axes=(0, 0, None)),
                           in_axes=(0, 0, None)))

    out = {"n_traj": B, "t_traj": T, "noise": True}
    for name, t_ in telems.items():
        x_pre = np.concatenate(
            [np.tile(x_meas0[None, None], (B, 1, 1)),
             np.asarray(t_.x[:, :-1])], axis=1)
        c = np.asarray(con(jnp.asarray(x_pre), jnp.asarray(t_.u)))
        u_nn = np.asarray(pol(jnp.asarray(x_pre), jnp.asarray(t_.ref), 0.0))
        mae = float(metrics.mae(jnp.asarray(t_.ref),
                                jnp.asarray(t_.x[..., 1])))
        out[name] = {
            "MAE": mae,
            "max_violation_scaled": float(np.maximum(-c, 0).max()),
            "mean_violation_scaled": float(np.maximum(-c, 0).mean()),
            "mean_projection_bite": float(np.abs(np.asarray(t_.u) - u_nn)
                                          .mean()),
            "wall_s": round(walls[name], 2),
        }
    u_w = np.asarray(telems["warm_carry"].u)
    u_c = np.asarray(telems["cold_multistart"].u)
    out["command_divergence"] = {
        "max_abs": float(np.abs(u_w - u_c).max()),
        "mean_abs": float(np.abs(u_w - u_c).mean()),
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
