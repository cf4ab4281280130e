"""Re-qualify the throughput solver preset at wide-panel power (round-5 item 1).

Round 4 qualified the ``fast`` preset (4 GN x 1 AL) for the N=10 bench
headline on a 16-stream paired A/B whose 95% CI (+-0.0022) barely covered
its own point estimate (+0.0020) — "CI contains 0" claimed equivalence
from absence of evidence (ADVICE.md, round-4 verdict weak item 1).  This
script redoes the qualification the pre-registered way:

* **Power**: the repo's standard wide panel — 64 fresh plateau streams x
  4 independent process-noise realizations (n=256 paired trajectories),
  identical streams AND noise draws across presets (eval/wide_panel.py).
* **Test**: one-sided NON-INFERIORITY at alpha=0.05 against a
  pre-registered margin of **+0.001 closed-loop MAE** (~2% of the
  0.05-0.07 panel MAE scale, about a quarter of the smallest margin any
  headline comparison here has decided on (0.0038), and ~2x the panel's
  paired sem, so the test is decidable): qualified iff the upper bound
  of the one-sided 95% CI of the paired per-trajectory MAE difference
  (candidate - default) is below +0.001.  Non-inferiority, not TOST
  symmetric equivalence, is the correct criterion for a *throughput*
  preset: a candidate that tracks BETTER than the default by more than
  the margin must not be rejected for it (the first 64-stream run showed
  exactly that case: 5 GN x 1 AL at -0.0002 +- 0.0009 failed symmetric
  TOST only on its lower bound).  Symmetric-TOST verdicts are reported
  alongside for transparency.  "CI95 contains 0" is reported but does
  NOT qualify — that was round 4's mistake.
* **Robustness gate**: a candidate is disqualified outright if any
  panel trajectory diverges (per-trajectory MAE non-finite or > 10x the
  default panel's worst trajectory).  This gate caught a real landmine:
  4 GN x 2 AL (mu0=1e4, so mu=1e5 in round 2) blows up in f32 on one
  reporting-panel stream while passing the 256-trajectory selection
  panel clean.
* **Selection vs confirmation**: cheaper candidate presets
  (4x1, 5x1, 4x2) are screened on a *selection* panel with distinct
  stream/noise keys; only the fastest candidate that passes there is
  confirmed on the reporting panel (stream_key=7/noise_key=101, the
  round-4 standard) — the reported confirmation is the candidate's first
  look at that data.

The comparison baseline is the chain default (6 GN x 2 AL — the teacher
configuration every chain ships, pipelines/supervised.py), i.e. the same
``mpc_default`` panel wide_panel.py reports.

Writes ``fast_preset_ab`` (confirmation stats) and
``fast_preset_selection`` into docs/RESULTS-parity.json; bench.py's
preset default + quality string follow this artifact.

Runs on the default device (TPU if attached; FCT_CPU=1 forces CPU), f32
— the deployment dtype of the throughput path.  Usage:
  python scripts/fast_requalify.py [--streams 64] [--reps 4]
"""

import argparse
import dataclasses
import json
import os
import sys

if os.environ.get("FCT_CPU"):
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "docs", "RESULTS-parity.json")

MARGIN = 0.001    # pre-registered equivalence margin (MAE, see docstring)


def paired_stats(d, margin, cand_mae, default_mae):
    """Non-inferiority (primary) + TOST (reported) + robustness gate."""
    import numpy as np
    n = d.size
    mean = float(d.mean())
    sem = float(d.std(ddof=1) / np.sqrt(n))
    ci90 = 1.645 * sem
    # one-sided 95% upper bound of (candidate - default)
    upper95 = mean + 1.645 * sem
    worst_default = float(np.max(default_mae))
    robust = bool(np.isfinite(cand_mae).all()
                  and float(np.max(cand_mae)) < 10.0 * worst_default)
    return {
        "n": int(n),
        "paired_diff_mean": mean,
        "sem": sem,
        "ci95": 1.96 * sem,
        "ci90": ci90,
        "margin": margin,
        "noninferior_upper95": upper95,
        "robust": robust,
        "worst_traj_mae": float(np.max(cand_mae)),
        "qualified": bool(upper95 < margin and robust),
        "tost_equivalent": bool(mean - ci90 > -margin
                                and mean + ci90 < margin),
        "ci95_contains_0": bool(abs(mean) < 1.96 * sem),
        "win_rate_candidate": float((d < 0).mean()),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=64)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--out", default=OUT)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_fct")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import jax.numpy as jnp  # noqa: F401
    import numpy as np

    from forging_control_tpu.eval import wide_panel as wp
    from forging_control_tpu.loop import closed_loop as cl
    from forging_control_tpu.solver import sqp

    # Candidates in descending-throughput order (cost ~ gn*al rollouts;
    # measured: 4x1 = 299.7k solves/s, 6x2 default = 123k at N=10/B=4096).
    candidates = [
        ("fast", sqp.MPCConfig.fast(horizon=10, variant="smooth")),
        ("fast_5x1", sqp.MPCConfig.fast(horizon=10, variant="smooth",
                                        gn_iters=5)),
        ("fast_4x2", sqp.MPCConfig.fast(horizon=10, variant="smooth",
                                        al_iters=2)),
    ]
    default_cfg = sqp.MPCConfig(horizon=10, variant="smooth",
                                gn_iters=6, al_iters=2)

    def run_panel(spec, cfg):
        return wp.run_controller(spec, cl.MPCController(cfg))

    def spec(stream_key, noise_key):
        return wp.PanelSpec(n_streams=args.streams, n_noise_reps=args.reps,
                            ref_variant="supervised",
                            stream_key=stream_key, noise_key=noise_key)

    out = json.load(open(args.out)) if os.path.exists(args.out) else {}

    # ---- selection panel (distinct keys; screening only) ----
    sel_spec = spec(stream_key=13, noise_key=211)
    sel_default = run_panel(sel_spec, default_cfg)
    selection = {"margin": MARGIN, "spec": dataclasses.asdict(sel_spec),
                 "default_MAE_mean": float(sel_default.mae.mean()),
                 "candidates": {}}
    chosen = None
    for name, cfg in candidates:
        res = run_panel(sel_spec, cfg)
        d = (res.mae - sel_default.mae).ravel()
        t = paired_stats(d, MARGIN, res.mae, sel_default.mae)
        t["MAE_mean"] = float(res.mae.mean())
        selection["candidates"][name] = t
        print(json.dumps({"selection": name, **t}), flush=True)
        if chosen is None and t["qualified"]:
            chosen = (name, cfg)
    selection["chosen"] = chosen[0] if chosen else "default"
    out["fast_preset_selection"] = selection

    # ---- confirmation on the reporting panel (round-4 standard keys) ----
    rep_spec = spec(stream_key=7, noise_key=101)
    rep_default = run_panel(rep_spec, default_cfg)
    if chosen is not None:
        name, cfg = chosen
        res = run_panel(rep_spec, cfg)
        d = (res.mae - rep_default.mae).ravel()
        conf = paired_stats(d, MARGIN, res.mae, rep_default.mae)
        conf.update({
            "preset": name,
            "iters": f"{cfg.gn_iters} GN x {cfg.al_iters} AL",
            "candidate_MAE_mean": float(res.mae.mean()),
            "default_MAE_mean": float(rep_default.mae.mean()),
            "n_streams": args.streams,
            "n_noise_reps": args.reps,
            "note": ("paired one-sided non-inferiority (+0.001 MAE "
                     "pre-registered margin) + robustness gate on the "
                     "64-stream x 4-rep reporting panel (identical "
                     "streams + noise draws); candidate chosen on a "
                     "disjoint selection panel (stream_key=13). Replaces "
                     "round 4's underpowered 16-stream A/B."),
        })
    else:
        conf = {"preset": "default", "n_streams": args.streams,
                "qualified": False,
                "note": ("no candidate qualified on the selection panel; "
                         "bench headline reverts to the default preset")}
    out["fast_preset_ab"] = conf
    print(json.dumps({"confirmation": conf}), flush=True)

    json.dump(out, open(args.out, "w"), indent=2)
    print("written", args.out)


if __name__ == "__main__":
    main()
