"""Generate the IPOPT/CVODES parity report against the golden recordings.

Produces docs/RESULTS-parity.json with:
  * single-step and open-loop integrator parity vs the CVODES recording
  * cold-start solver command parity vs the recorded IPOPT sequence
  * closed-loop tracking metrics vs the reference's recorded run

CPU/f64 (the validation mode).  Usage:
  JAX_PLATFORMS=cpu python scripts/parity_report.py
"""

import json
import os
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

GOLDEN = "/root/reference/Supervised Learning/results/MPC_dataframe.txt"


def main():
    from forging_control_tpu.integrate.rk4 import rk4_step
    from forging_control_tpu.loop import closed_loop as cl
    from forging_control_tpu.physics import press
    from forging_control_tpu.solver import sqp

    rows = np.loadtxt(GOLDEN, skiprows=1)
    out = {}

    # --- integrator parity -------------------------------------------------
    f = lambda x, u: press.rhs(x, u, variant="smooth")
    xs = jnp.array(rows[:299, 2:7])
    us = jnp.array(rows[1:300, 7])
    step = jax.jit(jax.vmap(lambda x, u: rk4_step(f, x, u, 0.001, 4)))
    meas = jax.vmap(lambda x: press.measure(x, variant="smooth"))
    pred = np.array(meas(step(xs, us)))
    mask = (rows[:299, 4] > 1) & (rows[:299, 5] > 1) & \
           (rows[1:300, 4] > 1) & (rows[1:300, 5] > 1)
    rel = np.abs(pred - rows[1:300, 2:7])[mask] / np.maximum(
        np.abs(rows[1:300, 2:7])[mask], 1e-2)
    out["integrator_single_step"] = {
        "max_rel": float(rel.max()),
        "median_rel": float(np.median(rel)),
        "steps": int(mask.sum()),
    }

    # --- cold-start solver parity -----------------------------------------
    cfg = sqp.MPCConfig(horizon=10, variant="smooth", gn_iters=15, al_iters=3)
    states = np.vstack([press.X0_REFERENCE, rows[:299, 2:7]])
    uprev = np.concatenate([[0.0], rows[:299, 7]])

    def make_solve_batch(cfg):
        @jax.jit
        def solve_batch(xs, rs, ups):
            def one(x, r, up):
                u0, _, d = sqp.solve(cfg, x, r, up,
                                     sqp.init_state(cfg, jnp.float64))
                return u0, d.inf_pr
            return jax.vmap(one)(xs, rs, ups)
        return solve_batch

    u0, inf_pr = make_solve_batch(cfg)(
        jnp.array(states), jnp.array(rows[:300, 1]), jnp.array(uprev))
    u0 = np.array(u0)
    relu = np.abs(u0 - rows[:300, 7]) / np.maximum(np.abs(rows[:300, 7]), 1e-2)
    out["solver_command_parity"] = {
        "median_rel": float(np.median(relu)),
        "p95_rel": float(np.percentile(relu, 95)),
        "frac_within_1e-3": float(np.mean(relu < 1e-3)),
        "max_inf_pr_scaled": float(np.array(inf_pr).max()),
        "note": ("divergent steps are the cavitation transient where the "
                 "recorded IPOPT iterates violate their own p>=0 bounds "
                 "under the model dynamics"),
    }

    # --- cold-start parity, ipopt_compat preset ----------------------------
    # (reproduces the recorded transient where IPOPT's own iterates violate
    # p >= 0; see sqp.MPCConfig.ipopt_compat)
    cfg_c = sqp.MPCConfig.ipopt_compat(horizon=10, variant="smooth",
                                       gn_iters=15, al_iters=3)
    u0c, _ = make_solve_batch(cfg_c)(
        jnp.array(states), jnp.array(rows[:300, 1]), jnp.array(uprev))
    reluc = np.abs(np.array(u0c) - rows[:300, 7]) / np.maximum(
        np.abs(rows[:300, 7]), 1e-2)
    out["solver_command_parity_ipopt_compat"] = {
        "median_rel": float(np.median(reluc)),
        "p95_rel": float(np.percentile(reluc, 95)),
        "frac_within_1e-3": float(np.mean(reluc < 1e-3)),
    }

    # --- Model_NN golden recording: N=5, clamp variant, MA27 ---------------
    # (Unsupervised Learning/Model_NN/results/MPC_simulation.pkl — 10
    # trajectories of the horizon-5 MPC with the hard-clamp model; loaded
    # without do-mpc via utils/dompc_pickle)
    from forging_control_tpu.utils import dompc_pickle
    mnn = dompc_pickle.load(
        "/root/reference/Unsupervised Learning/Model_NN/results/"
        "MPC_simulation.pkl")["simulator"]
    xm = mnn["_x"]
    um = mnn["_u"][:, 0]
    tvpm = mnn["_tvp"][:, 0]

    fm = lambda x, u: press.rhs(x, u, variant="clamp")
    stepm = jax.jit(jax.vmap(lambda x, u: rk4_step(fm, x, u, 0.001, 4)))
    measm = jax.vmap(lambda x: press.measure(x, variant="clamp"))
    predm = np.array(measm(stepm(jnp.array(xm[:2999]), jnp.array(um[1:3000]))))
    maskm = ((xm[:2999, 2] > 1) & (xm[:2999, 3] > 1)
             & (xm[1:3000, 2] > 1) & (xm[1:3000, 3] > 1)
             & (np.arange(1, 3000) % 300 != 0))  # exclude traj resets
    relm = np.abs(predm - xm[1:3000])[maskm] / np.maximum(
        np.abs(xm[1:3000])[maskm], 1e-2)
    cfg5 = sqp.MPCConfig(horizon=5, variant="clamp", gn_iters=15, al_iters=3)
    states5 = np.vstack([press.X0_REFERENCE, xm[:2999]])
    states5[::300] = press.X0_REFERENCE          # per-trajectory reset
    uprev5 = np.concatenate([[0.0], um[:2999]])
    uprev5[::300] = 0.0
    u05, _ = make_solve_batch(cfg5)(
        jnp.array(states5), jnp.array(tvpm), jnp.array(uprev5))
    relu5 = np.abs(np.array(u05) - um) / np.maximum(np.abs(um), 1e-2)
    cfg5c = sqp.MPCConfig.ipopt_compat(horizon=5, variant="clamp",
                                       gn_iters=15, al_iters=3)
    u05c, _ = make_solve_batch(cfg5c)(
        jnp.array(states5), jnp.array(tvpm), jnp.array(uprev5))
    relu5c = np.abs(np.array(u05c) - um) / np.maximum(np.abs(um), 1e-2)
    out["model_nn_N5_clamp"] = {
        "integrator_median_rel": float(np.median(relm)),
        "integrator_p99_rel": float(np.percentile(relm, 99)),
        "solver_median_rel": float(np.median(relu5)),
        "solver_p95_rel": float(np.percentile(relu5, 95)),
        "solver_frac_within_1e-3": float(np.mean(relu5 < 1e-3)),
        "solver_median_rel_ipopt_compat": float(np.median(relu5c)),
        "solver_frac_within_1e-3_ipopt_compat": float(np.mean(relu5c < 1e-3)),
        "note": ("second golden recording: horizon 5, hard-clamp model "
                 "variant, MA27 linear solver, 10 trajectories"),
    }

    # --- feasibility-config golden recording: N=10, p in [0, 32e6] ---------
    # (forging_MPC_N_10_feasible.pkl — 15 trajectories of the
    # do_feasibility MPC with upper pressure bounds,
    # Supervised Learning/template_mpc.py:57-64)
    feas = dompc_pickle.load(
        "/root/reference/Supervised Learning/results/"
        "forging_MPC_N_10_feasible.pkl")["simulator"]
    xf = feas["_x"]
    uf = feas["_u"][:, 0]
    tvpf = feas["_tvp"][:, 0]
    Tf = xf.shape[0]
    cfgf = sqp.MPCConfig(horizon=10, variant="smooth", p_max=32e6,
                         gn_iters=15, al_iters=3)
    statesf = np.vstack([press.X0_REFERENCE, xf[:Tf - 1]])
    statesf[::300] = press.X0_REFERENCE
    uprevf = np.concatenate([[0.0], uf[:Tf - 1]])
    uprevf[::300] = 0.0
    u0f, inf_f = make_solve_batch(cfgf)(
        jnp.array(statesf), jnp.array(tvpf), jnp.array(uprevf))
    reluf = np.abs(np.array(u0f) - uf) / np.maximum(np.abs(uf), 1e-2)
    out["feasibility_config_N10"] = {
        "solver_median_rel": float(np.median(reluf)),
        "solver_p95_rel": float(np.percentile(reluf, 95)),
        "solver_frac_within_1e-3": float(np.mean(reluf < 1e-3)),
        "max_inf_pr_scaled": float(np.max(np.array(inf_f))),
        "recorded_p2_max_Pa": float(xf[:, 3].max()),
        "note": ("third golden recording: upper pressure bounds active "
                 "(recorded p2 peaks at 30.2 MPa of the 32 MPa cap), "
                 "15 trajectories"),
    }

    # --- noise-config golden recordings -------------------------------------
    # The dataset-generation configs run with process noise; the recorded
    # states embed the noise draws, so per-step cold-start replay (feed the
    # recorded pre-step state, compare the command) is exact in its inputs
    # even though the noise itself is not stored.
    for key, path, cfg_n, n_horizon, var in [
            ("noise_config_N10",
             "/root/reference/Supervised Learning/results/"
             "forging_MPC_process_noise_N_10.pkl", None, 10, "smooth"),
            ("model_nn_N5_clamp_noise",
             "/root/reference/Unsupervised Learning/Model_NN/results/"
             "MPC_simulation_noise.pkl", None, 5, "clamp"),
    ]:
        rec = dompc_pickle.load(path)["simulator"]
        xn = rec["_x"]
        un = rec["_u"][:, 0]
        tvpn = rec["_tvp"][:, 0]
        Tn = xn.shape[0]
        cfg_n = sqp.MPCConfig(horizon=n_horizon, variant=var,
                              gn_iters=15, al_iters=3)
        statesn = np.vstack([press.X0_REFERENCE, xn[:Tn - 1]])
        statesn[::300] = press.X0_REFERENCE
        uprevn = np.concatenate([[0.0], un[:Tn - 1]])
        uprevn[::300] = 0.0
        u0n, inf_n = make_solve_batch(cfg_n)(
            jnp.array(statesn), jnp.array(tvpn), jnp.array(uprevn))
        relun = np.abs(np.array(u0n) - un) / np.maximum(np.abs(un), 1e-2)
        out[key] = {
            "solver_median_rel": float(np.median(relun)),
            "solver_p95_rel": float(np.percentile(relun, 95)),
            "solver_frac_within_1e-3": float(np.mean(relun < 1e-3)),
            "solver_frac_within_1e-2": float(np.mean(relun < 1e-2)),
            "max_inf_pr_scaled": float(np.max(np.array(inf_n))),
            "min_recorded_pressure_Pa": float(min(xn[:, 2].min(),
                                                  xn[:, 3].min())),
            "steps": int(Tn),
            "note": f"process-noise recording, horizon {n_horizon}, "
                    f"{var} variant; the +-5e7 Pa process-noise kicks drive "
                    f"recorded pressures far below the p>=0 bound, so many "
                    f"steps start infeasible and the recorded IPOPT command "
                    f"reflects its restoration behavior rather than a "
                    f"well-posed optimum",
        }

    # --- independent-solver cross-check at N=15/20/25 ----------------------
    # No recordings survive for the longer Generate-Data horizons (the
    # Data/*.pkl blobs are stripped), so validate those horizons against an
    # independent NLP solver: scipy trust-constr (interior-point-like) on
    # the *same* condensed NLP in f64, cold-started, sampled over recorded
    # states.  Disagreement would expose a horizon-dependent solver defect
    # that the N=5/10 recordings cannot.
    from scipy.optimize import NonlinearConstraint, minimize

    from forging_control_tpu.physics.scaling import U_SCALE
    sample = slice(0, 300, 8)  # 38 states across the golden trajectory
    xs_s = states[sample]
    refs_s = rows[:300, 1][sample]
    ups_s = uprev[sample]
    out["independent_crosscheck"] = {}
    for Nh in (15, 20, 25):
        cfg_h = sqp.MPCConfig(horizon=Nh, variant="raw",
                              gn_iters=15, al_iters=3)

        def obj(v, x0_i, ref_i, up_i, cfg_h=cfg_h):
            # _objective_only takes the SCALED previous input
            return sqp._objective_only(cfg_h, jnp.array(x0_i),
                                       ref_i, up_i / U_SCALE, jnp.array(v))

        obj_g = jax.jit(jax.value_and_grad(obj, argnums=0),
                        static_argnames=())
        con = jax.jit(lambda v, x0_i, cfg_h=cfg_h: sqp._constraints(
            cfg_h, sqp._rollout(cfg_h, jnp.array(x0_i), jnp.array(v))))
        con_j = jax.jit(jax.jacfwd(con, argnums=0))

        solve_ours = make_solve_batch(cfg_h)
        u0_ours, _ = solve_ours(jnp.array(xs_s), jnp.array(refs_s),
                                jnp.array(ups_s))
        u0_ours = np.array(u0_ours)

        u0_sp = []
        for i in range(xs_s.shape[0]):
            x0_i, ref_i, up_i = xs_s[i], float(refs_s[i]), float(ups_s[i])
            nlc = NonlinearConstraint(
                lambda v, x0_i=x0_i: np.array(con(v, x0_i)),
                0.0, np.inf,
                jac=lambda v, x0_i=x0_i: np.array(con_j(v, x0_i)))
            res = minimize(
                lambda v: tuple(map(np.array, obj_g(v, x0_i, ref_i, up_i))),
                np.zeros(Nh), jac=True, method="trust-constr",
                constraints=[nlc],
                options={"gtol": 1e-10, "xtol": 1e-12, "maxiter": 400})
            u0_sp.append(res.x[0] * U_SCALE)
        u0_sp = np.array(u0_sp)
        relx = np.abs(u0_ours - u0_sp) / np.maximum(np.abs(u0_sp), 1e-2)
        out["independent_crosscheck"][f"N{Nh}"] = {
            "median_rel": float(np.median(relx)),
            "p95_rel": float(np.percentile(relx, 95)),
            "frac_within_1e-3": float(np.mean(relx < 1e-3)),
            "samples": int(xs_s.shape[0]),
        }
    out["independent_crosscheck"]["note"] = (
        "scipy trust-constr on the same condensed NLP (f64, cold start), "
        "Generate-Data config (raw variant, p>=0); covers the horizons "
        "whose reference recordings were stripped")

    # --- closed-loop metrics ----------------------------------------------
    loop_cfg = cl.LoopConfig(t_steps=300, variant="smooth")
    refs = jnp.array(rows[:, 1].reshape(2, 300))
    x0 = jnp.tile(cl.default_x0(), (2, 1))
    out["closed_loop"] = {}
    for name, mcfg in [
            ("default", sqp.MPCConfig(horizon=10, variant="smooth")),
            ("ipopt_compat",
             sqp.MPCConfig.ipopt_compat(horizon=10, variant="smooth"))]:
        ctrl = cl.MPCController(mcfg)
        _, telem = jax.jit(
            lambda x, r, k, c=ctrl: cl.run_batch(loop_cfg, c, x, r, k))(
                x0, refs, jax.random.PRNGKey(0))
        mae = float(np.abs(np.array(telem.x[..., 1]).ravel()
                           - np.array(telem.ref).ravel()).mean())
        out["closed_loop"][name] = {
            "tracking_MAE": mae,
            "command_mean_abs_dev_vs_golden": float(
                np.abs(np.array(telem.u).ravel() - rows[:, 7]).mean()),
        }
    out["closed_loop"]["reference_tracking_MAE"] = 0.045209
    out["closed_loop"]["recorded_golden_MAE"] = float(
        np.abs(rows[:, 3] - rows[:, 1]).mean())

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "RESULTS-parity.json")
    with open(path, "w") as fjson:
        json.dump(out, fjson, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
