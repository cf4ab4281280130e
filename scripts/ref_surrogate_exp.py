"""Train our MPC-loss controller through the REFERENCE'S trained LSTM.

Disentangles the unsupervised closed-loop gap: our full protocol with our
surrogate plateaus at ~0.13 closed-loop MAE while the reference's shipped
controllers reach 0.055-0.071 (scripts/reference_weights_eval.py shows our
loop replays their weights exactly).  If training through THEIR surrogate
(Unsupervised Learning/Model_NN/results/model_NN_noise.pt) recovers their
quality, the difference is surrogate fidelity; if not, it is the training
protocol.

Usage: python scripts/ref_surrogate_exp.py [--epochs 60]
"""

import argparse
import json
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference"


def load_ref_lstm(path):
    from forging_control_tpu.nn import torch_compat
    return torch_compat.lstm_from_torch(path)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="results_repro")
    ap.add_argument("--epochs", type=int, default=60)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_fct")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import jax.numpy as jnp
    import numpy as np

    from forging_control_tpu.eval import metrics
    from forging_control_tpu.nn import fnn, scalers, train
    from forging_control_tpu.pipelines import (config, generate_data,
                                               unsupervised)

    s_params = load_ref_lstm(
        f"{REF}/Unsupervised Learning/Model_NN/results/model_NN_noise.pt")
    with open(f"{REF}/Unsupervised Learning/Model_NN/results/"
              "scaler_model_input_noise.pkl", "rb") as f:
        sk = pickle.load(f)
    state_scaler = scalers.Scaler(jnp.zeros(5),
                                  jnp.asarray(np.asarray(sk.max_abs_, float),
                                              jnp.float32))
    print(json.dumps({"state_scaler_max_abs":
                      np.asarray(sk.max_abs_, float).tolist()}), flush=True)

    results = generate_data.load(generate_data.dataset_path(args.out, 10))
    flags = config.Flags(enable_noise=True)
    ucfg = config.UnsupervisedConfig(horizon=10, epochs=args.epochs,
                                     flags=flags)
    (xtr, utr, ztr), (xva, uva, _), (xte, ute, _), in_sc, u_sc = \
        unsupervised.prepare_data(results, state_scaler, ucfg)
    cl_val = unsupervised.make_closed_loop_val(in_sc, u_sc, n_traj=8, seed=0)

    def log_fn(epoch, tl, sel):
        print(json.dumps({"epoch": epoch, "train": tl, "select": sel}),
              flush=True)

    params, _ = fnn.init(jax.random.PRNGKey(0), dtype=jnp.float32)
    params, rep = train.train_unsupervised(
        params, s_params, xtr, utr, ztr, xva, uva,
        horizon=10, alpha=ucfg.alpha, lr=ucfg.lr, epochs=args.epochs,
        batch_size=max(ucfg.batch_size, 1), seed=0,
        closed_loop_val_fn=cl_val, log_fn=log_fn)

    pred = fnn.apply(params, jnp.asarray(xte))
    print(json.dumps({
        "final": True,
        "test_MAE": float(metrics.mae(jnp.asarray(ute), pred)),
        "best_cl": float(min(rep.cl_val_losses)),
        "cl": rep.cl_val_losses}), flush=True)


if __name__ == "__main__":
    main()
