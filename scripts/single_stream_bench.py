"""Honest single-stream (B=1) per-step MPC latency on the attached TPU.

Uses loop.make_stepper: one AOT-compiled control period (solver + RK4
plant + noise) with a donated, device-resident carry — the deployment
shape of the reference's `make_step` loop (Generate Data/
Functions.py:335-349), minus all host round trips of the state.

Reports per-step wall-time percentiles over T sequential steps (each step
REQUIRES the previous one's carry, so this is a genuinely serial
dependency chain; the reference's IPOPT runs the same chain at p50
15.4 ms, BASELINE.md).

Usage: python -m scripts.single_stream_bench [N] [steps] [backend]
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from forging_control_tpu.loop import closed_loop as cl
from forging_control_tpu.solver import sqp


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 300
    backend = sys.argv[3] if len(sys.argv) > 3 else "sqp"

    loop_cfg = cl.LoopConfig(t_steps=T, variant="smooth")
    ctrl = cl.MPCController(sqp.MPCConfig(horizon=N, variant="smooth"),
                            backend=backend)

    t0 = time.perf_counter()
    step, carry = cl.make_stepper(loop_cfg, ctrl, dtype=jnp.float32)
    compile_s = time.perf_counter() - t0

    # Reference stream: alternate every 150 steps like the recorded loops.
    refs = np.where((np.arange(T) // 150) % 2 == 0, 0.35, -0.35).astype(
        np.float32)

    # Warmup (donated carry: keep the returned one).
    carry, u = step(carry, jnp.asarray(refs[0]))
    u.block_until_ready()

    times = np.empty(T)
    for t in range(T):
        r = jnp.asarray(refs[t])
        t1 = time.perf_counter()
        carry, u = step(carry, r)
        u.block_until_ready()
        times[t] = time.perf_counter() - t1

    ms = times * 1e3
    out = {
        "horizon": N, "steps": T, "backend": backend,
        "device": str(jax.devices()[0]),
        "compile_s": round(compile_s, 2),
        "p50_ms": round(float(np.percentile(ms, 50)), 3),
        "p25_ms": round(float(np.percentile(ms, 25)), 3),
        "p75_ms": round(float(np.percentile(ms, 75)), 3),
        "mean_ms": round(float(ms.mean()), 3),
        "min_ms": round(float(ms.min()), 3),
        "reference_ipopt_p50_ms": 15.402,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
