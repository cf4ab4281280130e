"""Parity of solver commands vs the *independent optimum* (scipy
trust-constr) on the recordings where parity vs the RECORDED IPOPT command
has a tail (N=5 clamp, and the two process-noise recordings).

Motivation (measured, scripts/diag_n5_tail.py): on the steps where our
command differs from the recording by >1e-3, the recorded IPOPT command
itself misses the independent optimum by a median ~4e-3 (25/25 sampled
steps >1e-3 off), while ours sits at ~2e-6.  The recording is not a
converged reference on those steps, so this script scores both solvers
against scipy trust-constr (f64, cold start, gtol 1e-10) on a stratified
sample (failing steps + random steps) and appends the results to
docs/RESULTS-parity.json under ``<key>_vs_optimum``.

Runtime ~10-30 min (scipy solves).  CPU/f64:
  python scripts/parity_vs_optimum.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_fct")

import jax.numpy as jnp
import numpy as np
from scipy.optimize import NonlinearConstraint, minimize

from forging_control_tpu.physics import press
from forging_control_tpu.physics.scaling import U_SCALE
from forging_control_tpu.solver import sqp
from forging_control_tpu.utils import dompc_pickle

OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "docs", "RESULTS-parity.json")

RECORDINGS = [
    ("model_nn_N5_clamp",
     "/root/reference/Unsupervised Learning/Model_NN/results/"
     "MPC_simulation.pkl", 5, "clamp"),
    ("noise_config_N10",
     "/root/reference/Supervised Learning/results/"
     "forging_MPC_process_noise_N_10.pkl", 10, "smooth"),
    ("model_nn_N5_clamp_noise",
     "/root/reference/Unsupervised Learning/Model_NN/results/"
     "MPC_simulation_noise.pkl", 5, "clamp"),
]

N_FAIL, N_RAND = 25, 15
# Round-4: adjudicate the DIVERGENT population per recording (verdict
# item 3) — larger failing sample, with per-step who-is-closer counts.
N_FAIL_ADJ = 60


def scipy_solve(cfg, obj_g, con, con_j, x0, ref, up):
    nlc = NonlinearConstraint(
        lambda v: np.array(con(jnp.array(v), x0)), 0.0, np.inf,
        jac=lambda v: np.array(con_j(jnp.array(v), x0)))
    res = minimize(
        lambda v: tuple(map(np.array, obj_g(jnp.array(v), x0, ref, up))),
        np.zeros(cfg.horizon), jac=True, method="trust-constr",
        constraints=[nlc],
        options={"gtol": 1e-10, "xtol": 1e-12, "maxiter": 600})
    return res.x[0] * U_SCALE


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--keys", default=None,
                    help="comma-separated recording keys (default: all)")
    ap.add_argument("--n-fail", type=int, default=N_FAIL_ADJ)
    args = ap.parse_args()
    keys = set(args.keys.split(",")) if args.keys else None

    out = json.load(open(OUT)) if os.path.exists(OUT) else {}
    rng = np.random.default_rng(0)
    for key, path, horizon, var in RECORDINGS:
        if keys is not None and key not in keys:
            continue
        rec = dompc_pickle.load(path)["simulator"]
        xn, un, tvpn = rec["_x"], rec["_u"][:, 0], rec["_tvp"][:, 0]
        Tn = xn.shape[0]
        states = np.vstack([press.X0_REFERENCE, xn[:Tn - 1]])
        states[::300] = press.X0_REFERENCE
        uprev = np.concatenate([[0.0], un[:Tn - 1]])
        uprev[::300] = 0.0

        cfg = sqp.MPCConfig(horizon=horizon, variant=var,
                            gn_iters=15, al_iters=3, polish_iters=2)

        @jax.jit
        def batch(xs, rs, ups):
            def one(x, r, up):
                return sqp.solve(cfg, x, r, up,
                                 sqp.init_state(cfg, jnp.float64))[0]
            return jax.vmap(one)(xs, rs, ups)

        u0 = np.array(batch(jnp.array(states), jnp.array(tvpn),
                            jnp.array(uprev)))
        rel_rec = np.abs(u0 - un) / np.maximum(np.abs(un), 1e-2)
        bad = np.where(rel_rec > 1e-3)[0]
        sel_f = rng.choice(bad, min(args.n_fail, len(bad)), replace=False)
        sel_r = rng.choice(Tn, N_RAND, replace=False)
        sel = np.unique(np.concatenate([sel_f, sel_r]))
        fail_set = set(sel_f.tolist())

        obj_g = jax.jit(jax.value_and_grad(
            lambda v, x0, r, up: sqp._objective_only(cfg, x0, r,
                                                     up / U_SCALE, v)))
        con = jax.jit(lambda v, x0: sqp._constraints(
            cfg, sqp._rollout(cfg, x0, v)))
        con_j = jax.jit(jax.jacfwd(con, argnums=0))

        ours_err, rec_err, is_fail = [], [], []
        for i in sel:
            u_sp = scipy_solve(cfg, obj_g, con, con_j, jnp.array(states[i]),
                               float(tvpn[i]), float(uprev[i]))
            d = max(abs(u_sp), 1e-2)
            ours_err.append(abs(u0[i] - u_sp) / d)
            rec_err.append(abs(un[i] - u_sp) / d)
            is_fail.append(i in fail_set)
        ours_err, rec_err = np.array(ours_err), np.array(rec_err)
        is_fail = np.array(is_fail)
        of, rf = ours_err[is_fail], rec_err[is_fail]
        adjudication = {
            "divergent_steps_total": int(len(bad)),
            "divergent_frac_of_recording": float(len(bad) / Tn),
            "divergent_sampled": int(is_fail.sum()),
            "ours_closer_to_optimum_frac": float(np.mean(of < rf)),
            "recording_closer_to_optimum_frac": float(np.mean(rf < of)),
            "ours_median_rel_on_divergent": float(np.median(of)),
            "recorded_median_rel_on_divergent": float(np.median(rf)),
            "ours_frac_within_1e-3_on_divergent": float(np.mean(of < 1e-3)),
            "recorded_frac_within_1e-3_on_divergent": float(
                np.mean(rf < 1e-3)),
        }
        entry = {
            "divergent_adjudication": adjudication,
            "sampled_steps": int(len(sel)),
            "of_which_failing_vs_recording": int(len(sel_f)),
            "ours_vs_optimum_median": float(np.median(ours_err)),
            "ours_vs_optimum_frac_within_1e-3": float(
                np.mean(ours_err < 1e-3)),
            "recorded_vs_optimum_median": float(np.median(rec_err)),
            "recorded_vs_optimum_frac_within_1e-3": float(
                np.mean(rec_err < 1e-3)),
            "note": ("scored against scipy trust-constr optima on a "
                     "failing-step-weighted sample; the recorded IPOPT "
                     "commands are not converged on the tail (see "
                     "docs/PARITY.md)"),
        }
        out[key + "_vs_optimum"] = entry
        print(key, json.dumps(entry, indent=1), flush=True)
        json.dump(out, open(OUT, "w"), indent=1)


if __name__ == "__main__":
    main()
