"""Qualify speed presets at every bench horizon, not just N=10.

Round 5 qualified ``fast_5x1`` for the N=10 headline by one-sided
non-inferiority at wide-panel power (scripts/fast_requalify.py).  The
multi-horizon bench sweep (bench.py BENCH_MULTI=1), however, still runs
the 6x2 teacher default at N in {5,15,20,25} because "fast is
N=10-qualified only" — leaving ~1.5-2x measured throughput on the table
at the other horizons IF a reduced-iteration preset is non-inferior
there too.  Whether it is cannot be assumed from the N=10 result: longer
horizons carry more constraints per solve and the warm-started AL may
genuinely need the second round.  So: run the same pre-registered
protocol per horizon.

Protocol (identical to fast_requalify.py, applied per horizon):
* default = 6 GN x 2 AL at that horizon (the teacher configuration the
  chains ship, pipelines/supervised.py), same backend the bench uses at
  that horizon (sqp for N=5, Riccati/ilqr for N>=10 — bench.py).
* candidates screened in descending-throughput order on a *selection*
  panel (stream_key=13/noise_key=211, disjoint from reporting); the
  fastest qualifier gets ONE confirmation look at the reporting panel
  (stream_key=7/noise_key=101, the round-4 standard).
* qualified iff the one-sided 95% upper bound of the paired
  per-trajectory MAE difference (candidate - default) is below the
  pre-registered +0.001 margin AND no trajectory diverges (non-finite or
  >10x the default panel's worst — the gate that caught fast_4x2's f32
  blowup at N=10).

Writes ``fast_preset_by_horizon`` into docs/RESULTS-parity.json; the
bench sweep's per-horizon preset + quality string follow this artifact
(bench.py _preset_default).

Usage:  python scripts/preset_requalify_horizons.py [--streams 64]
        [--reps 4] [--horizons 5,15,20,25]
"""

import argparse
import dataclasses
import json
import os
import sys

if os.environ.get("FCT_CPU"):
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    os.environ["JAX_PLATFORMS"] = "cpu"

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

from fast_requalify import MARGIN, paired_stats  # noqa: E402

OUT = os.path.join(os.path.dirname(_HERE), "docs", "RESULTS-parity.json")


def candidates_for(N, sqp):
    """Speed candidates in descending-throughput order (cost ~ gn*al).

    Two families: ``fast_*`` (mu0=1e4, single AL round, short ladder —
    the N=10 headline family) and ``lean_*`` (default mu0=1e2 AL
    escalation, fewer GN iterations).  The first sweep showed the fast
    family failing qualification beyond N=10 (+0.0007..+0.0015 paired at
    N=5/15) — the second AL round carries real tracking quality at those
    horizons — so the lean family keeps the default's AL schedule and
    cuts only GN work (1.2-1.5x fewer rollouts)."""
    mk = sqp.MPCConfig.fast
    return [
        ("fast", mk(horizon=N, variant="smooth")),                  # cost 4
        ("fast_5x1", mk(horizon=N, variant="smooth", gn_iters=5)),  # cost 5
        ("fast_6x1", mk(horizon=N, variant="smooth", gn_iters=6)),  # cost 6
        ("lean_4x2", sqp.MPCConfig(horizon=N, variant="smooth",
                                   gn_iters=4, al_iters=2)),        # cost 8
        ("fast_8x1", mk(horizon=N, variant="smooth", gn_iters=8)),  # cost 8
        ("lean_5x2", sqp.MPCConfig(horizon=N, variant="smooth",
                                   gn_iters=5, al_iters=2)),        # cost 10
    ]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=64)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--horizons", default="5,15,20,25")
    ap.add_argument("--candidates", default=None,
                    help="comma list of candidate names to screen (default "
                         "all); screening results MERGE into an existing "
                         "fast_preset_by_horizon record, so a second pass "
                         "can extend a sweep without redoing it")
    ap.add_argument("--out", default=OUT)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_fct")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from forging_control_tpu.eval import wide_panel as wp
    from forging_control_tpu.loop import closed_loop as cl
    from forging_control_tpu.solver import sqp

    def spec(stream_key, noise_key):
        return wp.PanelSpec(n_streams=args.streams, n_noise_reps=args.reps,
                            ref_variant="supervised",
                            stream_key=stream_key, noise_key=noise_key)

    out = json.load(open(args.out)) if os.path.exists(args.out) else {}
    by_h = out.setdefault("fast_preset_by_horizon", {})

    for N in [int(h) for h in args.horizons.split(",")]:
        backend = "ilqr" if N >= 10 else "sqp"   # bench.py's per-horizon rule
        default_cfg = sqp.MPCConfig(horizon=N, variant="smooth",
                                    gn_iters=6, al_iters=2)

        def run_panel(s, cfg):
            return wp.run_controller(s, cl.MPCController(cfg, backend=backend))

        # ---- selection (screening) panel: disjoint keys ----
        sel_spec = spec(stream_key=13, noise_key=211)
        sel_default = run_panel(sel_spec, default_cfg)
        prev = by_h.get(f"N={N}", {}).get("selection", {})
        selection = {"margin": MARGIN, "backend": backend,
                     "spec": dataclasses.asdict(sel_spec),
                     "default_MAE_mean": float(sel_default.mae.mean()),
                     "candidates": dict(prev.get("candidates", {}))}
        screen = (set(args.candidates.split(","))
                  if args.candidates else None)
        chosen = None
        prev_conf = by_h.get(f"N={N}", {})
        conf_failed = (prev_conf.get("preset")
                       if prev_conf.get("qualified") is False else None)
        for name, cfg in candidates_for(N, sqp):
            if name == conf_failed:
                continue   # already failed a reporting-panel confirmation
            if screen is not None and name not in screen:
                # keep an earlier pass's qualifier if it came cheaper
                t_prev = selection["candidates"].get(name)
                if (chosen is None and t_prev
                        and t_prev.get("qualified")):
                    chosen = (name, cfg)
                    break
                continue
            res = run_panel(sel_spec, cfg)
            d = (res.mae - sel_default.mae).ravel()
            t = paired_stats(d, MARGIN, res.mae, sel_default.mae)
            t["MAE_mean"] = float(res.mae.mean())
            selection["candidates"][name] = t
            print(json.dumps({"N": N, "selection": name, **t}), flush=True)
            if t["qualified"]:
                chosen = (name, cfg)
                break   # descending-throughput order: first qualifier wins

        # ---- confirmation on the reporting panel ----
        rep_spec = spec(stream_key=7, noise_key=101)
        if chosen is not None:
            rep_default = run_panel(rep_spec, default_cfg)
            name, cfg = chosen
            res = run_panel(rep_spec, cfg)
            d = (res.mae - rep_default.mae).ravel()
            conf = paired_stats(d, MARGIN, res.mae, rep_default.mae)
            conf.update({
                "preset": name,
                "iters": f"{cfg.gn_iters} GN x {cfg.al_iters} AL",
                "backend": backend,
                "candidate_MAE_mean": float(res.mae.mean()),
                "default_MAE_mean": float(rep_default.mae.mean()),
                "n_streams": args.streams,
                "n_noise_reps": args.reps,
                "note": ("paired one-sided non-inferiority (+0.001 MAE "
                         "pre-registered margin) + robustness gate vs the "
                         "6x2 teacher default at this horizon, same "
                         "protocol as fast_preset_ab (N=10); candidate "
                         "chosen on a disjoint selection panel."),
            })
        else:
            conf = {"preset": "default", "qualified": False,
                    "backend": backend, "n_streams": args.streams,
                    "note": ("no speed candidate qualified on the selection "
                             "panel at this horizon; bench stays on the "
                             "teacher default")}
        conf["selection"] = selection
        by_h[f"N={N}"] = conf
        print(json.dumps({"N": N, "confirmation":
                          {k: v for k, v in conf.items()
                           if k != "selection"}}), flush=True)
        json.dump(out, open(args.out, "w"), indent=2)   # checkpoint per N

    print("written", args.out)


if __name__ == "__main__":
    main()
