"""Per-step latency benchmark — the 1 ms real-time budget.

The reference's IPOPT MPC misses the 1 ms control budget by 3-15x at the
median (BASELINE.md); its NN policies meet it (0.2-0.7 ms on CPU).  Here
the whole closed loop is one compiled scan, so the honest per-step number
is whole-episode wall time divided by steps, measured at batch 1 (true
sequential latency) and at large batch (amortized throughput latency).

Usage: python scripts/latency_bench.py [--horizons 5 10 25] [--steps 300]
Prints one JSON line per configuration.

For the TRUE dispatch-per-step single-stream path (donated-carry AOT
stepper, one control period per call) use scripts/single_stream_bench.py —
the B=1 number here amortizes the whole-episode scan instead.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def measure(horizon: int, steps: int, batch: int, preset: str) -> dict:
    from forging_control_tpu.loop import closed_loop as cl
    from forging_control_tpu.refgen import streams
    from forging_control_tpu.solver import sqp

    dtype = jnp.float32
    make = sqp.MPCConfig.fast if preset == "fast" else sqp.MPCConfig
    ctrl = cl.MPCController(make(horizon=horizon, variant="smooth"))
    loop_cfg = cl.LoopConfig(t_steps=steps, variant="smooth")
    refs = streams.sample_references(jax.random.PRNGKey(0), batch,
                                     "supervised", steps, dtype)
    x0 = jnp.tile(jnp.asarray(cl.press.X0_REFERENCE, dtype), (batch, 1))
    run = jax.jit(lambda x, r, k: cl.run_batch(loop_cfg, ctrl, x, r, k))
    _, telem = run(x0, refs, jax.random.PRNGKey(0))
    telem.u.block_until_ready()
    best = float("inf")
    for i in range(3):
        # Never reuse the warmup key (identical-argument executions can be
        # served from cache), and time through a forced host transfer so
        # async execution layers cannot return early.
        t0 = time.perf_counter()
        _, telem = run(x0, refs, jax.random.PRNGKey(i + 1))
        float(telem.u.sum())
        best = min(best, time.perf_counter() - t0)
    per_step_ms = best / steps * 1e3
    return {
        "metric": f"per-step closed-loop MPC latency (N={horizon}, B={batch}, {preset})",
        "value": round(per_step_ms, 4),
        "unit": "ms/step",
        "budget_ms": 1.0,
        "meets_budget": per_step_ms < 1.0,
        "solves_per_s": round(batch * steps / best, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--horizons", type=int, nargs="+", default=[5, 10, 25])
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--batches", type=int, nargs="+", default=[1, 1024])
    ap.add_argument("--preset", default="default", choices=["default", "fast"])
    args = ap.parse_args()
    for h in args.horizons:
        for b in args.batches:
            print(json.dumps(measure(h, args.steps, b, args.preset)),
                  flush=True)


if __name__ == "__main__":
    main()
