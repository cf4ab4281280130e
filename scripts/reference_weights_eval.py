"""Run the REFERENCE'S OWN trained controllers inside this framework.

The reference repo ships its trained FNN controller state_dicts
(``Supervised Learning/results/NN_controller_N_10_{sim}.pt``,
``Unsupervised Learning/results/NN_controller_N_10_{sim}.pt``) and the
supervised sklearn scalers.  Loading those weights into our FNN and
rolling them in OUR closed-loop engine on the same seeded reference
streams is an end-to-end cross-validation of the plant + integrator +
loop: if the recorded closed-loop metrics reproduce, every difference in
our own trained controllers is attributable to training, not simulation.

Recorded baselines (no noise): supervised NN MAE 0.053904, unsupervised
NN MAE 0.070924 (Tables/Normal/NN_results_N_10.csv).

Usage: JAX_PLATFORMS=cpu python scripts/reference_weights_eval.py [--noise]

--noise rolls the shipped controllers under the dataset-generation process
noise (Generate Data/Main.py:49-58) with the SAME loop engine and PRNG key
(PRNGKey(1)) the repro pipelines use for their closed-loop NN evals, so
the resulting MAEs are directly comparable to results_repro/summary.json:
identical noise realization, only the controller differs.
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
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_fct")

import jax.numpy as jnp
import numpy as np

REF = "/root/reference"


def load_fnn_state(path):
    from forging_control_tpu.nn import torch_compat
    return torch_compat.fnn_from_torch(path, dtype=jnp.float64)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--noise", action="store_true")
    args = ap.parse_args()

    from forging_control_tpu.eval import metrics
    from forging_control_tpu.loop import closed_loop as cl
    from forging_control_tpu.nn import fnn, scalers
    from forging_control_tpu.pipelines.config import PROCESS_STD
    from forging_control_tpu.refgen import streams

    with open(f"{REF}/Supervised Learning/results/scaler_input.pkl", "rb") as f:
        sk_in = pickle.load(f)
    with open(f"{REF}/Supervised Learning/results/scaler_output.pkl", "rb") as f:
        sk_out = pickle.load(f)
    in_scale = np.asarray(sk_in.max_abs_, float)      # [y_dot, z, ref]
    out_scale = np.asarray(sk_out.max_abs_, float)    # [u]

    sup_in = scalers.Scaler(jnp.zeros(3), jnp.asarray(in_scale))
    # unsupervised: ref is scaled with the y_dot scaler
    # (Unsupervised Learning/Main.py:235-261)
    uns_in = scalers.Scaler(
        jnp.zeros(3), jnp.asarray([in_scale[0], in_scale[1], in_scale[0]]))
    out_sc = scalers.Scaler(jnp.zeros(1), jnp.asarray(out_scale))

    loop_cfg = cl.LoopConfig(
        t_steps=300, variant="smooth",
        process_std=PROCESS_STD if args.noise else (0.0,) * 5)
    # PRNGKey(1) = the repro pipelines' eval key (seed 0 + 1), so --noise
    # reproduces their exact noise realization.
    eval_key = jax.random.PRNGKey(1 if args.noise else 0)
    out = {"noise": args.noise,
           "scaler_max_abs": {"input": in_scale.tolist(),
                              "output": out_scale.tolist()}}

    def run_policy(params, in_sc, ref_variant):
        policy = fnn.make_policy(params, in_sc, out_sc)
        ctrl = cl.FunctionController(policy)
        refs = jnp.asarray(streams.reference_table(2, ref_variant, 300))
        x0 = jnp.tile(cl.default_x0(), (2, 1))
        _, telem = jax.jit(
            lambda x, r, k: cl.run_batch(loop_cfg, ctrl, x, r, k))(
                x0, refs, eval_key)
        ref = np.asarray(telem.ref).ravel()
        y_dot = np.asarray(telem.x[..., 1]).ravel()
        m = {k: float(v) for k, v in
             metrics.tracking_metrics(jnp.asarray(ref),
                                      jnp.asarray(y_dot)).items()}
        m["Command"] = float(np.abs(np.asarray(telem.u)).mean())
        return m, np.asarray(telem.u)

    # Recorded closed-loop MAEs from Tables/Normal/NN_results_N_10*.csv
    # (their own noise realization for the _noise variants).
    rec_sup = 0.058627 if args.noise else 0.053904
    rec_uns = 0.055926 if args.noise else 0.070924
    for name, d, in_sc, rv, recorded in [
            ("supervised", f"{REF}/Supervised Learning/results", sup_in,
             "supervised", rec_sup),
            ("unsupervised", f"{REF}/Unsupervised Learning/results", uns_in,
             "unsupervised", rec_uns)]:
        maes = []
        for sim in range(10):
            # The reference ships separate weights per noise config:
            # supervised NN_controller_process_noise_N_10_{sim}.pt,
            # unsupervised NN_controller_N_10_{sim}_noise.pt.
            if args.noise:
                cands = [f"NN_controller_process_noise_N_10_{sim}.pt",
                         f"NN_controller_N_10_{sim}_noise.pt"]
            else:
                cands = [f"NN_controller_N_10_{sim}.pt"]
            p = next((os.path.join(d, c) for c in cands
                      if os.path.exists(os.path.join(d, c))), None)
            if p is None:
                continue
            params = load_fnn_state(p)
            m, u = run_policy(params, in_sc, rv)
            maes.append(m["MAE"])
            print(json.dumps({"which": name, "sim": sim, **m}), flush=True)
        out[name] = {"MAE_mean": float(np.mean(maes)),
                     "MAE_min": float(np.min(maes)),
                     "MAE_max": float(np.max(maes)),
                     "recorded_reference_MAE": recorded}

    # supervised: also compare command trajectories against the recorded
    # NN closed loop (Supervised_dataframe.txt)
    rows = np.loadtxt(f"{REF}/Supervised Learning/results/"
                      "Supervised_dataframe.txt", skiprows=1)
    best = None
    for sim in range(10):
        params = load_fnn_state(
            f"{REF}/Supervised Learning/results/NN_controller_N_10_{sim}.pt")
        _, u = run_policy(params, sup_in, "supervised")
        dev = float(np.abs(u.ravel() - rows[:, 7]).mean())
        if best is None or dev < best[1]:
            best = (sim, dev)
    out["supervised_recorded_trajectory"] = {
        "closest_sim": best[0], "u_mean_abs_dev": best[1],
        "recorded_MAE": float(np.abs(rows[:, 3] - rows[:, 1]).mean())}

    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
