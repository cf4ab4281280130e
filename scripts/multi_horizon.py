"""Multi-horizon dataset sweep + full-data surrogate + MPC-loss controller.

BASELINE config 5 (N = 5/10/15/20/25 dataset generation at scale) plus the
reference's actual surrogate protocol: the LSTM trains on ALL horizon
datasets concatenated (Unsupervised Learning/Model_NN/Main.py:104-128),
then the MPC-loss controller trains against it on the N=10 dataset.

Usage: python scripts/multi_horizon.py [--out results_repro] [--noise]
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
    ap.add_argument("--noise", action="store_true")
    ap.add_argument("--horizons", type=int, nargs="+",
                    default=[5, 10, 15, 20, 25])
    ap.add_argument("--n-traj", type=int, default=80)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_fct")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from forging_control_tpu.pipelines import (config, generate_data,
                                               surrogate, unsupervised)

    flags = config.Flags(enable_noise=args.noise)
    results_by_h = {}
    for h in args.horizons:
        path = generate_data.dataset_path(args.out, h)
        if os.path.exists(path):
            results_by_h[h] = generate_data.load(path)
            print(json.dumps({"stage": "load", "horizon": h, "path": path}),
                  flush=True)
            continue
        t0 = time.time()
        gcfg = config.GenerateConfig(
            n_traj=args.n_traj, t_traj=300, horizon=h,
            variant_model="smooth", ref_variant="supervised", flags=flags)
        _, results = generate_data.run(gcfg, seed=h)
        generate_data.save(results, path)
        results_by_h[h] = results
        print(json.dumps({"stage": "generate", "horizon": h,
                          "wall_s": time.time() - t0,
                          **generate_data.summarize(results)}), flush=True)

    # Surrogate on ALL horizons (the reference's 5-file concat).
    # Checkpointed: reruns (e.g. controller-selection experiments) reuse it.
    from forging_control_tpu.utils import checkpoint as ckpt

    scfg = config.SurrogateConfig(epochs=50, flags=flags)
    suffix = "_noise" if args.noise else ""
    ckpt_path = os.path.join(args.out, f"surrogate_all{suffix}.npz")
    if os.path.exists(ckpt_path):
        s_art = surrogate.run(list(results_by_h.values()),
                              config.SurrogateConfig(epochs=0, flags=flags),
                              seed=0)
        s_art.params = ckpt.load(ckpt_path, s_art.params)
        print(json.dumps({"stage": "surrogate_load", "path": ckpt_path}),
              flush=True)
    else:
        s_art = surrogate.run(list(results_by_h.values()), scfg, seed=0,
                              eval_results=results_by_h[args.horizons[0]])
        ckpt.save(ckpt_path, s_art.params)
        print(json.dumps({"stage": "surrogate_all", "test": s_art.test_metrics,
                          "closed_loop": s_art.closed_loop_metrics},
                         default=float), flush=True)

    # MPC-loss controller on the N=10 dataset against the full-data surrogate.
    ucfg = config.UnsupervisedConfig(horizon=10, epochs=20, flags=flags)
    u_art = unsupervised.run(results_by_h[10], s_art.params,
                             s_art.state_scaler, ucfg, seed=0,
                             closed_loop_eval=True)
    print(json.dumps({"stage": "unsupervised_fullsurrogate",
                      "test": u_art.test_metrics, "nn": u_art.nn_metrics,
                      "surrogate_drift": u_art.surrogate_drift},
                     default=float), flush=True)

    with open(os.path.join(args.out, "multi_horizon_summary.json"), "w") as f:
        json.dump({"surrogate": s_art.test_metrics,
                   "unsupervised_nn": u_art.nn_metrics,
                   "unsupervised_test": u_art.test_metrics}, f, indent=2,
                  default=float)
    print(json.dumps({"stage": "done"}), flush=True)


if __name__ == "__main__":
    main()
