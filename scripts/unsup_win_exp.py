"""Experiment: win the MPC-loss controller closed-loop row (VERDICT r3 #1).

Target: unsupervised NN closed-loop MAE <= 0.0559 (reference
``Unsupervised Learning/Tables/Normal/NN_results_N_10_noise.csv``) on the
eval protocol (2 CPython-exact 'unsupervised' streams, 300 steps, process
noise, PRNGKey(1)).  Diagnosed floor (scripts/unsup_gap_diag.py): the
compat MPC teacher scores ~0.0506-0.0516 there, so the student must land
within ~0.0045 of its teacher; round-2's best student sat at +0.0104.

Candidates (all same FNN 3->50->1 architecture / deployment path):
  dagger        iterated imitation, batched-MPC relabeling of the
                student's own states (nn/train.train_dagger)
  dagger+plant  DAgger then analytic-policy-gradient fine-tune through
                the true RK4 plant
  plant         imitation pretrain + plant fine-tune (round-2 mode)

Usage: JAX_PLATFORMS=cpu python scripts/unsup_win_exp.py \
           [--data results_repro_compat/forging_mult_traj_process_noise_N_10.npz]
           [--modes dagger,dagger_plant] [--seeds 0 1 2]
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
    ap.add_argument("--modes", default="dagger,dagger_plant")
    ap.add_argument("--seeds", type=int, nargs="+", default=[0])
    ap.add_argument("--teacher", default="ipopt_compat")
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--dagger-traj", type=int, default=16)
    ap.add_argument("--dagger-epochs", type=int, default=30)
    ap.add_argument("--plant-steps", type=int, default=300)
    ap.add_argument("--plant-lr", type=float, default=1e-4)
    ap.add_argument("--val-traj", type=int, default=16)
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
    from forging_control_tpu.solver import sqp

    results = generate_data.load(args.data)

    # Scalers + deployment-aligned full-density pairs: one convention,
    # owned by the pipeline (pipelines/unsupervised.py).
    in_sc, u_sc = unsupervised.fit_controller_scalers(results)
    xtr, utr, xva, uva = unsupervised._full_density(results, in_sc, u_sc)

    cl_val = train.make_closed_loop_val(
        in_sc, u_sc, n_traj=args.val_traj, t_traj=300, seed=0,
        process_std=PROCESS_STD)

    # Exact eval protocol (pipeline's nn_metrics path, seed=0).
    refs_eval = jnp.asarray(streams.reference_table(2, "unsupervised", 300),
                            jnp.float32)
    x0_eval = jnp.tile(jnp.asarray(cl.press.X0_REFERENCE, jnp.float32),
                       (2, 1))
    loop_eval = cl.LoopConfig(t_steps=300, variant="smooth",
                              process_std=PROCESS_STD)

    def eval_protocol(params):
        ctrl = cl.FunctionController(fnn.make_policy(params, in_sc, u_sc))
        _, telem = jax.jit(lambda x, r, k: cl.run_batch(
            loop_eval, ctrl, x, r, k))(x0_eval, refs_eval,
                                       jax.random.PRNGKey(1))
        m = {k: float(v) for k, v in metrics.tracking_metrics(
            jnp.asarray(telem.ref), jnp.asarray(telem.x[..., 1])).items()}
        m["Command"] = float(jnp.abs(telem.u).mean())
        return m

    make = {"default": sqp.MPCConfig, "fast": sqp.MPCConfig.fast,
            "ipopt_compat": sqp.MPCConfig.ipopt_compat}[args.teacher]
    mpc_cfg = make(horizon=10, variant="smooth")

    def log_fn(tag, s):
        def f(step, tl, sel):
            print(json.dumps({"mode": tag, "seed": s, "step": step,
                              "train": tl, "cl_val": sel}), flush=True)
        return f

    modes = args.modes.split(",")
    for s in args.seeds:
        for mode in modes:
            t0 = time.time()
            p0, _ = fnn.init(jax.random.PRNGKey(s), dtype=jnp.float32)
            if mode in ("dagger", "dagger_plant"):
                params, rep = train.train_dagger(
                    p0, in_sc, u_sc, xtr, utr, xva, uva, mpc_cfg=mpc_cfg,
                    rounds=args.rounds, n_traj=args.dagger_traj,
                    t_steps=300, epochs=args.dagger_epochs, seed=s,
                    process_std=PROCESS_STD,
                    closed_loop_val_fn=cl_val, log_fn=log_fn(mode, s))
            else:
                params, rep = train.train_supervised(
                    p0, xtr, utr, xva, uva, epochs=20, seed=s)
            if mode.endswith("plant"):
                params, rep2 = train.train_plant_in_loop(
                    params, in_sc, u_sc, t_steps=300, n_traj=32,
                    steps=args.plant_steps, lr=args.plant_lr, rterm=0.02,
                    seed=s, process_std=PROCESS_STD,
                    closed_loop_val_fn=cl_val, log_fn=log_fn(mode, s))
            m = eval_protocol(params)
            out = {"mode": mode, "seed": s, "eval": m,
                   "cl_val_best": (min(rep.cl_val_losses)
                                   if rep.cl_val_losses else None),
                   "wall_s": round(time.time() - t0, 1)}
            print(json.dumps(out), flush=True)
            np.savez(f"/tmp/unsup_win_{mode}_s{s}.npz",
                     **{k: np.asarray(v) for k, v in params.items()})


if __name__ == "__main__":
    main()
