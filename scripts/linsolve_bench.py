"""Measure closed-loop throughput of the three solver batching paths on TPU.

Paths (loop/closed_loop.MPCController.linsolve):
  * None       — per-scenario jax.vmap of sqp.solve (current bench default)
  * "unrolled" — sqp.solve_batch with the unrolled elementwise Cholesky
  * "pallas"   — sqp.solve_batch with the Pallas lane-batched kernel

Also sweeps scan_unroll for N=25 (roadmap: full unroll blows up compile
there; try partial factors).

Usage: python scripts/linsolve_bench.py [--horizon 10] [--batch 4096]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_fct")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np

from forging_control_tpu.loop import closed_loop as cl
from forging_control_tpu.refgen import streams
from forging_control_tpu.solver import sqp


def bench_one(label, loop_cfg, ctrl, x0, refs, reps=3):
    run = jax.jit(lambda x, r, k: cl.run_batch(loop_cfg, ctrl, x, r, k))
    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    _, telem = run(x0, refs, key)
    telem.u.block_until_ready()
    compile_s = time.perf_counter() - t0
    assert bool(np.isfinite(np.asarray(telem.u)).all()), f"{label}: non-finite"
    best = float("inf")
    for i in range(reps):
        t0 = time.perf_counter()
        _, telem = run(x0, refs, jax.random.PRNGKey(i + 1))
        float(telem.u.sum())
        best = min(best, time.perf_counter() - t0)
    B, T = refs.shape
    sps = B * T / best
    print(f"{label:50s} {sps:12,.0f} solves/s  (best {best:.3f}s, "
          f"compile {compile_s:.1f}s)", flush=True)
    return sps, np.asarray(telem.u)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--horizon", type=int, default=10)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--sweep-n25", action="store_true")
    args = ap.parse_args()

    N, B, T = args.horizon, args.batch, args.steps
    dtype = jnp.float32
    loop_cfg = cl.LoopConfig(t_steps=T, variant="smooth")
    key = jax.random.PRNGKey(0)
    refs = streams.sample_references(key, B, "supervised", t_steps=T,
                                     dtype=dtype)
    x0 = jnp.tile(jnp.asarray(cl.press.X0_REFERENCE, dtype), (B, 1))

    print(f"backend={jax.default_backend()} N={N} B={B} T={T}")

    results = {}
    u_ref = None
    for linsolve in (None, "unrolled", "pallas"):
        cfg = sqp.MPCConfig(horizon=N, variant="smooth")
        ctrl = cl.MPCController(cfg, linsolve=linsolve)
        label = f"linsolve={linsolve}"
        sps, u = bench_one(label, loop_cfg, ctrl, x0, refs)
        results[str(linsolve)] = sps
        if u_ref is None:
            u_ref = u
        else:
            diff = float(np.max(np.abs(u - u_ref)))
            print(f"  max |u - u(vmap)| = {diff:.2e}")

    if args.sweep_n25:
        print("--- N=25 scan_unroll sweep (vmap path) ---")
        for unroll in (1, 5, 25):
            cfg = sqp.MPCConfig(horizon=25, variant="smooth",
                                scan_unroll=unroll)
            ctrl = cl.MPCController(cfg)
            bench_one(f"N=25 scan_unroll={unroll}", loop_cfg, ctrl, x0, refs)


if __name__ == "__main__":
    main()
