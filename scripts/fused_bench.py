"""Closed-loop throughput A/B: per-scenario vmap vs explicit-batch solver.

Measures what ROADMAP item 5 asked for — hoisting the batch axis to the
kernel level.  Three run_batch paths over the same scenarios:

  * vmap       — jax.vmap(solve) per scenario (current default)
  * unrolled   — sqp.solve_batch with the elementwise unrolled Cholesky
  * pallas     — sqp.solve_batch with ops/smallchol.chol_solve_pallas

Usage: python scripts/fused_bench.py [--horizons 10 25] [--batches 1024 4096]
       [--steps 300] [--preset default|fast]
Prints one JSON line per (horizon, batch, path).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_fct")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def measure(horizon, batch, steps, preset, linsolve, reps=3, unroll=None):
    from forging_control_tpu.loop import closed_loop as cl
    from forging_control_tpu.refgen import streams
    from forging_control_tpu.solver import sqp

    dtype = jnp.float32
    make = sqp.MPCConfig.fast if preset == "fast" else sqp.MPCConfig
    kw = {} if unroll is None else {"scan_unroll": unroll}
    ctrl = cl.MPCController(make(horizon=horizon, variant="smooth", **kw),
                            linsolve=linsolve)
    loop_cfg = cl.LoopConfig(t_steps=steps, variant="smooth")
    refs = streams.sample_references(jax.random.PRNGKey(0), batch,
                                     "supervised", steps, dtype)
    x0 = jnp.tile(jnp.asarray(cl.press.X0_REFERENCE, dtype), (batch, 1))
    run = jax.jit(lambda x, r, k: cl.run_batch(loop_cfg, ctrl, x, r, k))
    t0 = time.perf_counter()
    _, telem = run(x0, refs, jax.random.PRNGKey(0))
    telem.u.block_until_ready()
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for i in range(reps):
        t0 = time.perf_counter()
        _, telem = run(x0, refs, jax.random.PRNGKey(i + 1))
        float(telem.u.sum())
        best = min(best, time.perf_counter() - t0)
    solves_s = batch * steps / best
    return {"horizon": horizon, "batch": batch, "path": linsolve or "vmap",
            "unroll": unroll, "preset": preset, "wall_s": round(best, 4),
            "solves_per_s": round(solves_s, 1),
            "compile_s": round(compile_s, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--horizons", type=int, nargs="+", default=[10, 25])
    ap.add_argument("--batches", type=int, nargs="+", default=[4096])
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--preset", default="default")
    ap.add_argument("--paths", nargs="+",
                    default=["vmap", "unrolled", "pallas"])
    ap.add_argument("--unroll", type=int, default=None,
                    help="override MPCConfig.scan_unroll (horizon rollout)")
    args = ap.parse_args()

    for N in args.horizons:
        for B in args.batches:
            for path in args.paths:
                linsolve = None if path == "vmap" else path
                rec = measure(N, B, args.steps, args.preset, linsolve,
                              unroll=args.unroll)
                print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
