"""Measure closed-loop throughput of solver backends at long horizons (N=25).

Usage: python scripts/riccati_bench.py [--backend ilqr|sqp] [--batch 256]
       [--steps 50] [--horizon 25] [--gn 8] [--al 2]

Prints compile time and solves/s so backend/iteration tuning for the
Generate-Data flagship config (N=25, 80x300 solves) is measured, not guessed.
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", default="ilqr")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--horizon", type=int, default=25)
    ap.add_argument("--gn", type=int, default=8)
    ap.add_argument("--al", type=int, default=2)
    ap.add_argument("--linsolve", default=None)
    args = ap.parse_args()

    dtype = jnp.float32
    cfg = sqp.MPCConfig(horizon=args.horizon, variant="smooth",
                        gn_iters=args.gn, al_iters=args.al)
    ctrl = cl.MPCController(cfg, backend=args.backend, linsolve=args.linsolve)
    loop_cfg = cl.LoopConfig(t_steps=args.steps, variant="smooth")

    B, T = args.batch, args.steps
    key = jax.random.PRNGKey(0)
    refs = streams.sample_references(key, B, "generate", t_steps=T, dtype=dtype)
    x0 = jnp.tile(jnp.asarray(cl.press.X0_REFERENCE, dtype), (B, 1))

    run = jax.jit(lambda x, r, k: cl.run_batch(loop_cfg, ctrl, x, r, k))

    t0 = time.perf_counter()
    _, telem = run(x0, refs, key)
    telem.u.block_until_ready()
    t_compile = time.perf_counter() - t0
    assert bool(np.isfinite(np.asarray(telem.u)).all()), "non-finite commands"

    best = float("inf")
    for i in range(3):
        t0 = time.perf_counter()
        _, telem = run(x0, refs, jax.random.PRNGKey(i + 1))
        float(telem.u.sum())
        best = min(best, time.perf_counter() - t0)

    print(f"backend={args.backend} N={args.horizon} B={B} T={T} "
          f"gn={args.gn} al={args.al} linsolve={args.linsolve}")
    print(f"compile+first: {t_compile:.1f}s  steady: {best:.3f}s  "
          f"solves/s: {B * T / best:,.0f}")


if __name__ == "__main__":
    main()
