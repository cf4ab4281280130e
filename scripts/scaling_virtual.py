"""Scaling curve of the scenario-parallel closed loop on a virtual mesh.

Round-3 verdict item 7: MULTICHIP_r0N.json proves the sharded programs
compile and execute correctly, but records no performance curve.  This
script produces one on the 8-device virtual CPU mesh
(``--xla_force_host_platform_device_count``), so that when real
multi-chip hardware appears there is a baseline curve and a ready
harness, not just a boolean.

What a VIRTUAL mesh can honestly measure on a 2-core host: **SPMD
sharding overhead at constant total compute** — all virtual devices
share the same host CPU pool, so total FLOP throughput is fixed and any
slowdown at higher device counts is partitioning/collective overhead,
not lost parallelism.  We therefore report, for the fused batched MPC
closed loop (the framework's scaling unit, SURVEY.md section 2.10):

* strong form: fixed total batch B, sharded over n in {1,2,4,8} devices
  (and per-device throughput).  efficiency(n) = t(1)/t(n); the
  scenario axis has zero per-step communication, so this should sit
  near 1.0.
* weak form: B = b0 * n (per-device work fixed): t(n)/t(1) tracks the
  oversubscription of the 2 physical cores, reported for completeness.

Writes docs/artifacts/scaling_virtual.json.

Usage: python scripts/scaling_virtual.py [--batch 128] [--t-traj 50]
"""

import argparse
import json
import os
import sys
import time

os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_fct")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np


def time_run(run, x0, refs, key, reps=3):
    _, telem = run(x0, refs, key)
    telem.u.block_until_ready()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _, telem = run(x0, refs, key)
        telem.u.block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--t-traj", type=int, default=50)
    ap.add_argument("--horizon", type=int, default=10)
    ap.add_argument("--out", default="docs/artifacts/scaling_virtual.json")
    args = ap.parse_args()

    from forging_control_tpu.loop import closed_loop as cl
    from forging_control_tpu.parallel import mesh as pmesh
    from forging_control_tpu.refgen import streams
    from forging_control_tpu.solver import sqp

    dtype = jnp.float32
    ctrl = cl.MPCController(sqp.MPCConfig(
        horizon=args.horizon, variant="smooth", gn_iters=4, al_iters=2))
    loop_cfg = cl.LoopConfig(t_steps=args.t_traj, variant="smooth",
                             process_std=(5e-1, 2e0, 5e7, 5e7, 2e0))
    key = jax.random.PRNGKey(0)

    def inputs(B):
        refs = jnp.asarray(streams.sample_references(
            jax.random.PRNGKey(3), B, "supervised", args.t_traj), dtype)
        x0 = jnp.tile(jnp.asarray(cl.press.X0_REFERENCE, dtype), (B, 1))
        return x0, refs

    out = {"n_physical_cores": os.cpu_count(),
           "config": {"batch": args.batch, "t_traj": args.t_traj,
                      "horizon": args.horizon,
                      "solves_per_run": args.batch * args.t_traj},
           "strong": [], "weak": []}

    for n in (1, 2, 4, 8):
        mesh = pmesh.make_mesh(n)
        run = pmesh.sharded_closed_loop(loop_cfg, ctrl, mesh)
        # strong: fixed total batch
        x0, refs = inputs(args.batch)
        x0, refs = pmesh.shard_scenarios(mesh, (x0, refs))
        t = time_run(run, x0, refs, key)
        out["strong"].append({
            "devices": n, "batch": args.batch, "wall_s": t,
            "solves_per_s": args.batch * args.t_traj / t})
        # weak: fixed per-device batch
        Bw = (args.batch // 8) * n
        x0, refs = inputs(Bw)
        x0, refs = pmesh.shard_scenarios(mesh, (x0, refs))
        tw = time_run(run, x0, refs, key)
        out["weak"].append({
            "devices": n, "batch": Bw, "wall_s": tw,
            "solves_per_s_per_device": Bw * args.t_traj / tw / n})
        print(json.dumps({"devices": n, "strong_s": t, "weak_s": tw}),
              flush=True)

    t1 = out["strong"][0]["wall_s"]
    for row in out["strong"]:
        row["efficiency_vs_1dev"] = t1 / row["wall_s"]
    out["note"] = (
        "virtual CPU mesh on a shared host pool: strong-form efficiency "
        "isolates SPMD sharding overhead (scenario axis has no per-step "
        "collectives); real multi-chip speedup requires real chips — this "
        "artifact is the harness + baseline for that measurement.")
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({"done": args.out,
                      "efficiency_8dev":
                          out["strong"][-1]["efficiency_vs_1dev"]}))


if __name__ == "__main__":
    main()
