"""Diagnose the MPC-loss controller's closed-loop gap.

Logs per-epoch (MPC-loss, val MSE vs recorded u, TRUE-plant closed-loop
MAE) for several training configurations, reusing the cached multi-horizon
datasets and surrogate checkpoint.  Output: one JSON line per epoch.

Usage: python scripts/unsup_diag.py [--epochs 60] [--configs base noise ...]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="results_repro")
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--configs", nargs="+",
                    default=["base", "noise1", "noise3", "short"])
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_fct")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import jax.numpy as jnp

    from forging_control_tpu.nn import fnn, train
    from forging_control_tpu.pipelines import (config, generate_data,
                                               surrogate, unsupervised)
    from forging_control_tpu.utils import checkpoint as ckpt

    flags = config.Flags(enable_noise=True)
    results = generate_data.load(generate_data.dataset_path(args.out, 10))
    all_results = [generate_data.load(generate_data.dataset_path(args.out, h))
                   for h in (5, 10, 15, 20, 25)]

    s_art = surrogate.run(all_results,
                          config.SurrogateConfig(epochs=0, flags=flags),
                          seed=0)
    s_art.params = ckpt.load(
        os.path.join(args.out, "surrogate_all_noise.npz"), s_art.params)

    ucfg = config.UnsupervisedConfig(horizon=10, flags=flags)
    (xtr, utr, ztr), (xva, uva, _), (xte, ute, _), in_sc, u_sc = \
        unsupervised.prepare_data(results, s_art.state_scaler, ucfg)
    cl_val = unsupervised.make_closed_loop_val(in_sc, u_sc, n_traj=8, seed=0)

    variants = {
        # enable_noise: surrogate-prediction noise during the unroll
        # (Unsupervised Learning/Functions.py:1400-1402, sigma=0.01).
        "base": dict(enable_noise=False, horizon=10),
        "noise1": dict(enable_noise=True, horizon=10),   # sigma default
        "noise3": dict(enable_noise=True, horizon=10, noise_sigma=0.03),
        "short": dict(enable_noise=False, horizon=5),
    }

    for name in args.configs:
        kw = dict(variants[name])
        sigma = kw.pop("noise_sigma", None)
        horizon = kw.pop("horizon")

        def log_fn(epoch, tl, sel, _name=name):
            print(json.dumps({"cfg": _name, "epoch": epoch,
                              "train": tl, "select": sel}), flush=True)

        params, _ = fnn.init(jax.random.PRNGKey(0), dtype=jnp.float32)
        extra = {}
        if sigma is not None:
            extra["noise_sigma"] = sigma
        params, rep = train.train_unsupervised(
            params, s_art.params, xtr, utr, ztr, xva, uva,
            horizon=horizon, alpha=ucfg.alpha, lr=ucfg.lr,
            epochs=args.epochs, batch_size=max(ucfg.batch_size, 1),
            seed=0, closed_loop_val_fn=cl_val, log_fn=log_fn, **kw, **extra)
        pred = fnn.apply(params, jnp.asarray(xte))
        from forging_control_tpu.eval import metrics
        print(json.dumps({
            "cfg": name, "final": True,
            "test_MAE": float(metrics.mae(jnp.asarray(ute), pred)),
            "best_cl": min(rep.cl_val_losses),
            "val": rep.val_losses, "cl": rep.cl_val_losses}), flush=True)


if __name__ == "__main__":
    main()
