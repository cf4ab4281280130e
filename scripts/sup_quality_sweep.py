"""Sweep supervised imitation training to close the closed-loop gap.

Measured context: the reference's shipped noise-trained supervised
controllers score 0.0555-0.0582 closed-loop MAE in OUR engine under OUR
noise realization (scripts/reference_weights_eval.py --noise), while our
trained controllers score 0.067-0.071 — the gap is training quality, not
the engine.  This sweep varies schedule/epochs for the reference's
architecture (3->50->1, L1, AdamW) and reports, per (config, seed):
test imitation MAE (scaled), noisy 16-stream closed-loop val MAE, and
clean closed-loop val MAE.

Usage: python scripts/sup_quality_sweep.py [--data ...npz] [--configs ...]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="results_repro_compat/"
                    "forging_mult_traj_process_noise_N_10.npz")
    ap.add_argument("--configs", nargs="+",
                    default=["base", "long", "cos60", "cos60_3e3"])
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1000, 2000])
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_fct")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import jax.numpy as jnp
    import optax

    from forging_control_tpu.eval import metrics
    from forging_control_tpu.nn import fnn, train
    from forging_control_tpu.pipelines import config, generate_data, supervised
    from forging_control_tpu.pipelines.config import PROCESS_STD

    results = generate_data.load(args.data)
    scfg = config.SupervisedConfig()
    (xtr, ytr), (xva, yva), (xte, yte), in_sc, out_sc = \
        supervised.prepare_data(results, scfg)

    cl_val_noisy = train.make_closed_loop_val(
        in_sc, out_sc, n_traj=16, seed=0, ref_variant="supervised",
        process_std=PROCESS_STD)
    cl_val_clean = train.make_closed_loop_val(
        in_sc, out_sc, n_traj=16, seed=0, ref_variant="supervised")

    steps_per_epoch = max(1, len(xtr) // scfg.batch_size)

    def sched(peak, epochs):
        return optax.cosine_decay_schedule(peak, steps_per_epoch * epochs)

    configs = {
        "base": dict(epochs=20, lr=1e-3),
        "long": dict(epochs=60, lr=1e-3),
        "cos60": dict(epochs=60, lr=sched(1e-3, 60)),
        "cos60_3e3": dict(epochs=60, lr=sched(3e-3, 60)),
        "cos120_3e3": dict(epochs=120, lr=sched(3e-3, 120)),
        "mse": dict(epochs=20, lr=1e-3, loss_fn=train.mse_loss),
    }

    for name in args.configs:
        kw = dict(configs[name])
        epochs = kw.pop("epochs")
        for seed in args.seeds:
            p0, _ = fnn.init(jax.random.PRNGKey(seed), dtype=jnp.float32)
            params, rep = train.train_supervised(
                p0, xtr, ytr, xva, yva, epochs=epochs, seed=seed, **kw)
            pred = fnn.apply(params, jnp.asarray(xte))
            print(json.dumps({
                "cfg": name, "seed": seed,
                "test_MAE": float(metrics.mae(jnp.asarray(yte), pred)),
                "cl_noisy_MAE": float(cl_val_noisy(params)),
                "cl_clean_MAE": float(cl_val_clean(params)),
                "wall_s": rep.wall_time_s,
            }), flush=True)


if __name__ == "__main__":
    main()
