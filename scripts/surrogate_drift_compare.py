"""Free-running surrogate drift: our LSTM vs the reference's shipped LSTM.

The reference computes free-running (open-loop) LSTM drift in its
unsupervised loop (``Unsupervised Learning/Functions.py:1195-1222``) but
never persists those metrics, so there is no recorded artifact to golden-
test against (ROADMAP item 10).  The next-best evidence: load the
reference's own trained LSTM (``Unsupervised Learning/Model_NN/results/
model_NN_noise.pt`` + its sklearn scaler) and our surrogate checkpoint
(results_repro/surrogate_params.npz), roll BOTH open-loop on the same
recorded trajectory with the same harness, and compare drift.  If the
reference's own model drifts comparably, our surrogate's open-loop
degradation is a property of the 10-step-window LSTM task, not a defect.

Usage: JAX_PLATFORMS=cpu python scripts/surrogate_drift_compare.py
       [--data results_repro/forging_mult_traj_process_noise_N_10.npz]
"""

import argparse
import json
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

REF = "/root/reference"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data",
                    default="results_repro/forging_mult_traj_process_noise_N_10.npz")
    ap.add_argument("--ckpt", default="results_repro/surrogate_params.npz")
    ap.add_argument("--traj", type=int, default=0)
    ap.add_argument("--lookback", type=int, default=10)
    args = ap.parse_args()

    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_surrogate_exp",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "ref_surrogate_exp.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    load_ref_lstm = mod.load_ref_lstm

    from forging_control_tpu.nn import lstm, scalers, surrogate_eval
    from forging_control_tpu.pipelines import generate_data
    from forging_control_tpu.utils import checkpoint

    results = generate_data.load(args.data)

    out = {}

    # --- our surrogate + our scaler (from the repro checkpoint) ----------
    like = {"params": lstm.init(jax.random.PRNGKey(0)),
            "scaler": (jnp.zeros((5,)), jnp.ones((5,)))}
    loaded = checkpoint.load(args.ckpt, like)
    ours_sc = scalers.Scaler(shift=loaded["scaler"][0],
                             scale=loaded["scaler"][1])
    track = surrogate_eval.build_feature_track(results, ours_sc,
                                               traj=args.traj)
    preds = surrogate_eval.free_running(loaded["params"], track,
                                        args.lookback)
    out["ours_free_running"] = surrogate_eval.fidelity_metrics(
        preds[:-1], track[args.lookback + 1:, :4])
    tf = surrogate_eval.teacher_forced(loaded["params"], track,
                                       args.lookback)
    out["ours_teacher_forced"] = surrogate_eval.fidelity_metrics(
        tf[:-1], track[1:len(tf), :4])

    # --- reference's shipped LSTM + its sklearn scaler --------------------
    ref_params = load_ref_lstm(
        f"{REF}/Unsupervised Learning/Model_NN/results/model_NN_noise.pt")
    with open(f"{REF}/Unsupervised Learning/Model_NN/results/"
              "scaler_model_input_noise.pkl", "rb") as f:
        sk = pickle.load(f)
    ref_sc = scalers.Scaler(jnp.zeros(5),
                            jnp.asarray(np.asarray(sk.max_abs_, float)))
    track_r = surrogate_eval.build_feature_track(results, ref_sc,
                                                 traj=args.traj)
    preds_r = surrogate_eval.free_running(ref_params, track_r, args.lookback)
    out["reference_free_running"] = surrogate_eval.fidelity_metrics(
        preds_r[:-1], track_r[args.lookback + 1:, :4])
    tf_r = surrogate_eval.teacher_forced(ref_params, track_r, args.lookback)
    out["reference_teacher_forced"] = surrogate_eval.fidelity_metrics(
        tf_r[:-1], track_r[1:len(tf_r), :4])

    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
