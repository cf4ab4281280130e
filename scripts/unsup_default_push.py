"""Push the default chain's unsupervised slot past the reference's best sim.

The last losing learned-control row (round-5 wide panel): the default
(feasible-teacher) chain's unsupervised DAgger controller sits at panel
MAE 0.0697 vs the reference's best unsupervised sim 0.0665 (+0.0032
paired).  DAgger anchors the student to its teacher (panel 0.0733), but
the plant-BPTT fine-tune stage does NOT need a teacher — it optimizes
closed-loop tracking directly through the differentiable RK4 plant.
This experiment extends that stage from the shipped controller:

  1. load the shipped default-chain unsupervised checkpoint;
  2. continue plant-BPTT fine-tuning (fresh counter-based streams per
     step, noisy protocol, gradient-norm clipping) with selection by a
     32-stream noisy closed-loop validation panel (PRNG chains disjoint
     from the reporting panel);
  3. paired wide-panel comparison (reporting spec, 64x4) of
     {shipped, fine-tuned} vs the reference's best unsupervised sim.

Prints one JSON line per stage; writes nothing into the chain — if the
result clears the bar it is wired into the chain protocol separately
(config plant_steps / re-run), keeping artifact provenance clean.

Usage: python scripts/unsup_default_push.py [--steps 900] [--lr 3e-4]
"""

import argparse
import json
import os
import sys

if os.environ.get("FCT_CPU"):
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="results_repro/results/"
                    "NN_controller_unsupervised_N_10_noise.npz")
    ap.add_argument("--init-ckpt", default=None,
                    help="start fine-tuning from this checkpoint instead"
                         " of --ckpt (staged anneal); scalers still come"
                         " from --ckpt's chain")
    ap.add_argument("--skip-panel", action="store_true",
                    help="validation-only run (candidate screening):"
                         " no look at the reporting panel")
    ap.add_argument("--steps", type=int, default=900)
    ap.add_argument("--n-traj", type=int, default=32)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--rterm", type=float, default=0.02,
                    help="command-increment weight of the fine-tune "
                         "objective (the panel metric is tracking MAE "
                         "only; command_mean is reported alongside)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--ship", action="store_true",
                    help="save the tuned controller as a labeled chain "
                         "checkpoint + summary entry (provenance: this "
                         "script's config)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_fct")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import jax.numpy as jnp
    import numpy as np

    from forging_control_tpu.eval import wide_panel as wp
    from forging_control_tpu.loop import closed_loop as cl
    from forging_control_tpu.nn import fnn, scalers, torch_compat, train
    from forging_control_tpu.pipelines.config import PROCESS_STD
    from forging_control_tpu.utils import checkpoint

    dtype = jnp.float32
    like = {"params": fnn.init(jax.random.PRNGKey(0))[0],
            "in_scaler": (jnp.zeros(3), jnp.ones(3)),
            "out_scaler": (jnp.zeros(1), jnp.ones(1))}
    d = checkpoint.load(args.ckpt, like)
    params_ship = params0 = d["params"]   # --ckpt params: the "shipped" row
    in_sc = scalers.Scaler(*d["in_scaler"])
    u_sc = scalers.Scaler(*d["out_scaler"])
    if args.init_ckpt:
        params0 = checkpoint.load(args.init_ckpt, like)["params"]

    cl_val = train.make_closed_loop_val(
        in_sc, u_sc, n_traj=32, t_traj=300, dtype=dtype, seed=args.seed,
        ref_variant="unsupervised", process_std=PROCESS_STD)
    base_val = float(cl_val(params0))
    print(json.dumps({"shipped_val_mae": base_val}), flush=True)

    params1, rep = train.train_plant_in_loop(
        params0, in_sc, u_sc, t_steps=300, n_traj=args.n_traj,
        steps=args.steps, lr=args.lr, rterm=args.rterm,
        process_std=PROCESS_STD, seed=args.seed + 17,
        closed_loop_val_fn=cl_val)
    tuned_val = min(rep.cl_val_losses) if rep.cl_val_losses else None
    print(json.dumps({"tuned_val_mae": tuned_val,
                      "wall_s": rep.wall_time_s}), flush=True)
    if args.skip_panel:
        ck = "/tmp/unsup_push_candidate_%d_%g_%d_n%d_r%g.npz" % (
            args.steps, args.lr, args.seed, args.n_traj, args.rterm)
        checkpoint.save(ck, {"params": params1,
                             "in_scaler": (in_sc.shift, in_sc.scale),
                             "out_scaler": (u_sc.shift, u_sc.scale)})
        print(json.dumps({"candidate": ck, "val": tuned_val}), flush=True)
        return

    # ---- wide-panel paired comparison (reporting spec) ----
    spec = wp.PanelSpec(n_streams=64, n_noise_reps=4,
                        ref_variant="supervised", process_std=PROCESS_STD)

    def eval_nn(p, isc, osc):
        pol = fnn.make_policy(
            jax.tree.map(lambda a: jnp.asarray(a, dtype), p), isc, osc)
        return wp.run_controller(spec, cl.FunctionController(pol),
                                 dtype=dtype)

    # reference's best unsupervised sim on this panel is sim4 (round-4/5
    # wide_panel.json); evaluate it fresh so the comparison is paired.
    import pickle
    with open(f"{REF}/Supervised Learning/results/scaler_input.pkl",
              "rb") as f:
        in_scale = np.asarray(pickle.load(f).max_abs_, float)
    with open(f"{REF}/Supervised Learning/results/scaler_output.pkl",
              "rb") as f:
        out_scale = np.asarray(pickle.load(f).max_abs_, float)
    uns_in = scalers.Scaler(jnp.zeros(3), jnp.asarray(
        [in_scale[0], in_scale[1], in_scale[0]]))
    ref_out = scalers.Scaler(jnp.zeros(1), jnp.asarray(out_scale))
    best = (None, None)
    for sim in (4, 1, 2):     # panel's historical top refs, best first
        p = (f"{REF}/Unsupervised Learning/results/"
             f"NN_controller_N_10_{sim}_noise.pt")
        if not os.path.exists(p):
            continue
        r = eval_nn(torch_compat.fnn_from_torch(p, dtype=dtype),
                    uns_in, ref_out)
        if best[1] is None or r.mae.mean() < best[1].mae.mean():
            best = (sim, r)
    ref_sim, ref_res = best

    out = {"ref_best_sim": ref_sim,
           "ref_panel_mean": float(ref_res.mae.mean())}
    for name, p in (("shipped", params_ship), ("tuned", params1)):
        res = eval_nn(p, in_sc, u_sc)
        c = wp.compare(res, ref_res)
        out[name] = {"panel_mean": float(res.mae.mean()),
                     "paired_vs_ref": c}
        print(json.dumps({name: out[name]}), flush=True)

    art = "docs/artifacts/unsup_default_push.json"
    os.makedirs(os.path.dirname(art), exist_ok=True)
    json.dump(out, open(art, "w"), indent=2)
    print("written", art)

    if args.ship:
        out_dir = os.path.dirname(os.path.dirname(args.ckpt))
        ck = (f"{out_dir}/results/"
              "NN_controller_unsupervised_N_10_noise_plantpush.npz")
        checkpoint.save(ck, {
            "params": params1,
            "in_scaler": (in_sc.shift, in_sc.scale),
            "out_scaler": (u_sc.shift, u_sc.scale)},
            meta={"protocol": "extended plant-BPTT fine-tune from the "
                              "shipped DAgger controller; "
                              "scripts/unsup_default_push.py",
                  "steps": args.steps, "lr": args.lr, "seed": args.seed,
                  "n_traj": args.n_traj, "rterm": args.rterm,
                  "init_ckpt": args.init_ckpt or "",
                  "val_panel_mae": tuned_val})
        sp = f"{out_dir}/summary.json"
        with open(sp) as f:
            summary = json.load(f)
        summary["unsupervised_plantpush"] = {
            "checkpoint": ck,
            "config": {"steps": args.steps, "lr": args.lr,
                       "seed": args.seed},
            "val_panel_mae": tuned_val,
            "wide_panel": out["tuned"],
            "note": ("candidate selected by the 32-stream noisy "
                     "validation panel among fine-tune configs; the "
                     "wide-panel comparison is its first look at the "
                     "reporting panel"),
        }
        with open(sp, "w") as f:
            json.dump(summary, f, indent=2, default=float)
        print(json.dumps({"shipped": ck}), flush=True)


if __name__ == "__main__":
    main()
