"""Reproduce the reference's four experiments at reference scale.

Runs the full chain on the available accelerator and writes metrics +
artifacts under results_repro/:

  1. dataset generation: 80 trajectories x 300 steps, N=10 MPC, process
     noise (Generate Data/Main.py config, horizon from --horizon)
  2. supervised FNN imitation + closed-loop MPC-vs-NN A/B
     (Supervised Learning/Main.py)
  3. LSTM surrogate training + closed-loop fidelity
     (Unsupervised Learning/Model_NN/Main.py)
  4. MPC-loss controller + closed-loop eval + free-running surrogate drift
     (Unsupervised Learning/Main.py)

Usage: python scripts/reproduce_reference.py [--out results_repro]
       [--horizon 10] [--noise] [--epochs-scale 1.0]
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
    ap.add_argument("--horizon", type=int, default=10)
    ap.add_argument("--noise", action="store_true")
    ap.add_argument("--epochs-scale", type=float, default=1.0)
    ap.add_argument("--n-traj", type=int, default=80)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from forging_control_tpu.pipelines import (config, generate_data,
                                               supervised, surrogate,
                                               unsupervised)
    from forging_control_tpu.eval import report

    os.makedirs(args.out, exist_ok=True)
    summary = {}
    flags = config.Flags(enable_noise=args.noise)

    def save_json(name, obj):
        with open(os.path.join(args.out, name), "w") as f:
            json.dump(obj, f, indent=2, default=float)

    # 1. dataset generation ------------------------------------------------
    t0 = time.time()
    gcfg = config.GenerateConfig(
        n_traj=args.n_traj, t_traj=300, horizon=args.horizon,
        variant_model="smooth", ref_variant="supervised", flags=flags)
    telem, results = generate_data.run(gcfg, seed=0)
    gen_s = time.time() - t0
    generate_data.save(results, generate_data.dataset_path(args.out, args.horizon))
    summary["generate"] = {**generate_data.summarize(results),
                           "wall_s": gen_s,
                           "solves": args.n_traj * 300}
    print(json.dumps({"stage": "generate", **summary["generate"]}), flush=True)

    # 2. supervised --------------------------------------------------------
    scfg = config.SupervisedConfig(
        horizon=args.horizon, epochs=max(1, int(20 * args.epochs_scale)),
        flags=flags)
    s_art = supervised.run(results, scfg, seed=0, closed_loop_eval=True,
                           out_dir=args.out)
    summary["supervised"] = {"test": s_art.test_metrics,
                             "mpc": s_art.mpc_metrics,
                             "nn": s_art.nn_metrics}
    print(json.dumps({"stage": "supervised", **summary["supervised"]}),
          flush=True)

    # 3. surrogate ---------------------------------------------------------
    gcfg_list = [results]
    ucfg_s = config.SurrogateConfig(
        epochs=max(1, int(50 * args.epochs_scale)), flags=flags)
    g_art = surrogate.run(gcfg_list, ucfg_s, seed=0, eval_results=results)
    summary["surrogate"] = {"test": g_art.test_metrics,
                            "closed_loop": g_art.closed_loop_metrics}
    print(json.dumps({"stage": "surrogate", **summary["surrogate"]}),
          flush=True)

    # 4. unsupervised ------------------------------------------------------
    # 60 epochs: the MPC-loss optimization plateaus later than the
    # reference's 20 under our init/seed (test MAE 0.044 -> 0.027).
    ucfg = config.UnsupervisedConfig(
        horizon=args.horizon, epochs=max(1, int(60 * args.epochs_scale)),
        flags=flags)
    u_art = unsupervised.run(results, g_art.params, g_art.state_scaler, ucfg,
                             seed=0, closed_loop_eval=True)
    summary["unsupervised"] = {"test": u_art.test_metrics,
                               "nn": u_art.nn_metrics,
                               "surrogate_drift": u_art.surrogate_drift}
    print(json.dumps({"stage": "unsupervised", **summary["unsupervised"]}),
          flush=True)

    save_json("summary.json", summary)
    print(json.dumps({"stage": "done", "out": args.out}), flush=True)


if __name__ == "__main__":
    main()
