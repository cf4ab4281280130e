"""Quality-qualify the `fast` solver preset (round-4 verdict item 5).

The fast preset (MPCConfig.fast: 4 GN x 1 AL, mu0=1e4) doubles closed-loop
throughput (248k vs 123k solves/s at N=10/B=4096, docs/ROADMAP.md) but has
never had a parity row, so it could not be shipped as a default anywhere.
This script measures, on the headline golden recording
(/root/reference/Supervised Learning/results/MPC_dataframe.txt):

  1. cold-start command parity vs the recorded IPOPT sequence (the same
     protocol as solver_command_parity; fast is a warm-start preset, so
     this is its worst case — reported for honesty);
  2. closed-loop tracking MAE + command deviation vs the golden
     trajectories with warm starts (deployment semantics — the context
     the preset is FOR);
  3. the same closed loop under process noise vs the default preset on
     identical noise draws (paired, 16 fresh streams x 300 steps).

Appends solver_command_parity_fast + closed_loop.fast + fast_preset_ab
to docs/RESULTS-parity.json.  CPU/f64.  Usage:
  python scripts/fast_preset_parity.py
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
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np

GOLDEN = "/root/reference/Supervised Learning/results/MPC_dataframe.txt"
OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "docs", "RESULTS-parity.json")


def main():
    from forging_control_tpu.loop import closed_loop as cl
    from forging_control_tpu.physics import press
    from forging_control_tpu.refgen import streams
    from forging_control_tpu.solver import sqp

    rows = np.loadtxt(GOLDEN, skiprows=1)
    out = json.load(open(OUT)) if os.path.exists(OUT) else {}

    cfg_fast = sqp.MPCConfig.fast(horizon=10, variant="smooth")
    cfg_def = sqp.MPCConfig(horizon=10, variant="smooth")

    # 1. cold-start command parity (fast's worst case: it relies on the
    # warm-start carry for convergence depth)
    states = np.vstack([press.X0_REFERENCE, rows[:299, 2:7]])
    uprev = np.concatenate([[0.0], rows[:299, 7]])

    @jax.jit
    def solve_cold(xs, rs, ups):
        def one(x, r, up):
            return sqp.solve(cfg_fast, x, r, up,
                             sqp.init_state(cfg_fast, jnp.float64))[0]
        return jax.vmap(one)(xs, rs, ups)

    u0 = np.array(solve_cold(jnp.array(states), jnp.array(rows[:300, 1]),
                             jnp.array(uprev)))
    relu = np.abs(u0 - rows[:300, 7]) / np.maximum(np.abs(rows[:300, 7]), 1e-2)
    out["solver_command_parity_fast"] = {
        "median_rel": float(np.median(relu)),
        "p95_rel": float(np.percentile(relu, 95)),
        "frac_within_1e-3": float(np.mean(relu < 1e-3)),
        "note": ("COLD-start parity — fast (4 GN x 1 AL) is a warm-start "
                 "closed-loop preset; see closed_loop.fast for its "
                 "deployment-semantics qualification"),
    }
    print(json.dumps({"solver_command_parity_fast":
                      out["solver_command_parity_fast"]}), flush=True)

    # 2. warm-started closed loop on the golden streams (no noise)
    loop_cfg = cl.LoopConfig(t_steps=300, variant="smooth")
    refs = jnp.array(rows[:, 1].reshape(2, 300))
    x0 = jnp.tile(cl.default_x0(), (2, 1))
    ctrl = cl.MPCController(cfg_fast)
    _, telem = jax.jit(lambda x, r, k: cl.run_batch(loop_cfg, ctrl, x, r, k))(
        x0, refs, jax.random.PRNGKey(0))
    out.setdefault("closed_loop", {})["fast"] = {
        "tracking_MAE": float(np.abs(np.array(telem.x[..., 1]).ravel()
                                     - np.array(telem.ref).ravel()).mean()),
        "command_mean_abs_dev_vs_golden": float(
            np.abs(np.array(telem.u).ravel() - rows[:, 7]).mean()),
    }
    print(json.dumps({"closed_loop.fast": out["closed_loop"]["fast"]}),
          flush=True)

    # 3. paired noisy closed loop: fast vs default on identical streams
    # and noise draws (16 fresh streams)
    B = 16
    loop_n = cl.LoopConfig(t_steps=300, variant="smooth",
                           process_std=(5e-1, 2e0, 5e7, 5e7, 2e0))
    refs_n = jnp.asarray(streams.sample_references(
        jax.random.PRNGKey(11), B, "supervised", 300), jnp.float64)
    x0n = jnp.tile(cl.default_x0(), (B, 1))
    res = {}
    for name, c in (("fast", cfg_fast), ("default", cfg_def)):
        ctl = cl.MPCController(c)
        _, tl = jax.jit(lambda x, r, k, _c=ctl: cl.run_batch(
            loop_n, _c, x, r, k))(x0n, refs_n, jax.random.PRNGKey(5))
        mae = np.abs(np.array(tl.ref) - np.array(tl.x[..., 1])).mean(axis=1)
        res[name] = {"per_traj_mae": mae, "u": np.array(tl.u)}
    d = res["fast"]["per_traj_mae"] - res["default"]["per_traj_mae"]
    out["fast_preset_ab"] = {
        "n_streams": B,
        "fast_MAE_mean": float(res["fast"]["per_traj_mae"].mean()),
        "default_MAE_mean": float(res["default"]["per_traj_mae"].mean()),
        "paired_diff_mean": float(d.mean()),
        "paired_diff_ci95": float(1.96 * d.std(ddof=1) / np.sqrt(len(d))),
        "command_dev_mean": float(
            np.abs(res["fast"]["u"] - res["default"]["u"]).mean()),
        "note": ("paired noisy closed loop, identical streams + noise "
                 "draws; qualifies fast for warm-started closed-loop/"
                 "throughput use when the CI contains 0"),
    }
    print(json.dumps({"fast_preset_ab": out["fast_preset_ab"]}), flush=True)

    json.dump(out, open(OUT, "w"), indent=2)
    print("written", OUT)


if __name__ == "__main__":
    main()
