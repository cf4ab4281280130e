"""Headline benchmark: MPC solves/s/chip at the N=10 horizon.

Runs the full closed-loop MPC engine (SQP solve + RK4 plant + telemetry,
one compiled scan) over a scenario batch on the available accelerator and
reports throughput in closed-loop MPC solves per second per chip.

Baseline: the reference's IPOPT MPC at N=10 runs at ~64.9 solves/s/core
(median per-step latency 15.402 ms, no-noise config —
``Supervised Learning/Tables/Normal/MPC_results_N_10.csv``; see
BASELINE.md).  vs_baseline = ours / 64.9.

Output: ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Env knobs: BENCH_BATCH (default 4096), BENCH_STEPS (default 300),
BENCH_HORIZON (default 10), BENCH_REPS (default 3), BENCH_BACKEND
("ilqr" default — the explicit-batch Riccati path, solver/riccati.py;
"sqp" for the condensed GN path), BENCH_PRESET (default "fast", the
quality-qualified warm-start preset — paired noisy A/B vs the default
preset is +0.0020 ± 0.0022 MAE, CI contains zero, and golden tracking
is within 0.0011; scripts/fast_preset_parity.py, fields
solver_command_parity_fast / closed_loop.fast / fast_preset_ab in
docs/RESULTS-parity.json.  Set BENCH_PRESET=default for the shipped
teacher-preset configuration, 123k solves/s).
"""

import json
import os
import sys
import time

# FCT_CPU=1 forces the CPU backend before jax initializes (see
# .claude/skills/verify/SKILL.md gotchas); the driver runs this on TPU.
if os.environ.get("FCT_CPU"):
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    os.environ["JAX_PLATFORMS"] = "cpu"


def main():
    import jax

    # Persistent compilation cache: the closed-loop program is large and the
    # remote-attach compile is slow; cache hits make repeat runs start fast.
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_fct")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import jax.numpy as jnp
    import numpy as np

    from forging_control_tpu.loop import closed_loop as cl
    from forging_control_tpu.refgen import streams
    from forging_control_tpu.solver import sqp

    B = int(os.environ.get("BENCH_BATCH", 4096))
    T = int(os.environ.get("BENCH_STEPS", 300))
    N = int(os.environ.get("BENCH_HORIZON", 10))
    reps = int(os.environ.get("BENCH_REPS", 3))
    # fast is quality-qualified at the N=10 headline config only
    # (scripts/fast_preset_parity.py); other horizons default to the
    # shipped teacher preset.
    preset = os.environ.get("BENCH_PRESET", "fast" if N == 10 else "default")
    backend = os.environ.get("BENCH_BACKEND", "ilqr")
    dtype = jnp.float32

    loop_cfg = cl.LoopConfig(t_steps=T, variant="smooth")
    make = sqp.MPCConfig.fast if preset == "fast" else sqp.MPCConfig
    ctrl = cl.MPCController(make(horizon=N, variant="smooth"),
                            backend=backend)

    key = jax.random.PRNGKey(0)
    refs = streams.sample_references(key, B, "supervised", t_steps=T,
                                    dtype=dtype)
    x0 = jnp.tile(jnp.asarray(cl.press.X0_REFERENCE, dtype), (B, 1))

    run = jax.jit(lambda x, r, k: cl.run_batch(loop_cfg, ctrl, x, r, k))

    # Warmup / compile
    _, telem = run(x0, refs, key)
    telem.u.block_until_ready()
    assert bool(np.isfinite(np.asarray(telem.u)).all()), "non-finite commands"

    # XLA's static cost model -> MFU.  Analyzed on ONE batched solve
    # program (not the 300-step scan: XLA's cost analysis counts a scan
    # body once, undercounting the rollout ~T-fold).  This workload is
    # tiny-tensor VPU work by construction (6x6 blocks, N<=25 horizons),
    # so %-of-peak is intrinsically small; solves/s vs the IPOPT baseline
    # is the governing metric.  Reported so the framework states its own
    # roofline position (docs/RESULTS.md).
    def analyze(c):
        state0 = c.init_carry_batch(B, dtype)
        prog = jax.jit(lambda s, x, r, u: c.step_batch(s, x, r, u))
        ca = prog.lower(state0, x0, refs[:, 0],
                        jnp.zeros((B,), dtype)).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        return float(ca["flops"]) / B if ca and "flops" in ca else None

    flops_per_solve = flops_exact = None
    try:
        flops_per_solve = analyze(ctrl)
        # Exact executed count: same program with the AL x GN iteration
        # scans unrolled (identical numerics; MPCConfig.iter_unroll), so
        # XLA's cost model sees every iteration body instead of one.
        import dataclasses as _dc
        ctrl_u = cl.MPCController(
            _dc.replace(ctrl.cfg, iter_unroll=True), backend=backend)
        flops_exact = analyze(ctrl_u)
    except Exception:
        pass
    peak = float(os.environ.get("BENCH_PEAK_FLOPS", 1.97e14))  # v5e bf16

    best = float("inf")
    for i in range(reps):
        # Distinct keys (identical-arg executions can be cache-served) and
        # forced host transfer (async layers may ack block_until_ready early).
        t0 = time.perf_counter()
        _, telem = run(x0, refs, jax.random.PRNGKey(i + 1))
        float(telem.u.sum())
        best = min(best, time.perf_counter() - t0)

    solves_per_s = (B * T) / best
    baseline = 64.9  # reference IPOPT solves/s (median), BASELINE.md
    rec = {
        "metric": f"closed-loop MPC solves/s/chip (N={N}, batch={B})",
        "value": round(solves_per_s, 1),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / baseline, 2),
        "preset": preset,
        "quality": "fast preset quality-qualified: paired noisy A/B vs "
                   "default +0.0020 +-0.0022 MAE (CI contains 0); "
                   "docs/RESULTS-parity.json fast_preset_ab",
    }
    if flops_per_solve:
        # lb: XLA's model counts each lax.scan body once (iteration scans
        # undercounted ~al*gn-fold).  The exact figures re-lower the same
        # config with the iteration scans unrolled, so every executed body
        # is counted — closing round 3's known undercount.  Either way the
        # conclusion stands: tiny-tensor VPU work at <0.1% MFU by
        # construction; solves/s vs the IPOPT baseline is the metric.
        rec["flops_per_solve_lb"] = round(flops_per_solve, 1)
        rec["flops_per_s_lb"] = round(flops_per_solve * solves_per_s, 1)
        rec["mfu_pct_lb"] = round(100.0 * rec["flops_per_s_lb"] / peak, 4)
    if flops_exact:
        rec["flops_per_solve"] = round(flops_exact, 1)
        rec["flops_per_s"] = round(flops_exact * solves_per_s, 1)
        rec["mfu_pct"] = round(100.0 * rec["flops_per_s"] / peak, 4)
    print(json.dumps(rec))


if __name__ == "__main__":
    sys.exit(main())
