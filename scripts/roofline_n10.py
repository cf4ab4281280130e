"""Profiler-grounded roofline for the N=10 headline bench (round-5 item 4).

Round 4 reported "0.154% MFU" against the v5e bf16 matmul peak — a
meaningless denominator for a program that is VPU/elementwise work by
construction (6x6 blocks, N<=25 horizons, no matmul large enough to tile
onto the MXU).  This script states utilization against the *binding*
resources, measured on this chip:

1. **Measured ceilings** (microbenchmarks, not datasheet numbers):
   - HBM bandwidth: saturating streaming copy / triad on large f32 arrays;
   - VPU throughput: deep fused multiply-add chain on a resident array
     (compute-bound by construction: ~1024 flops touched per byte).
2. **Program placement**: the bench's exact per-solve FLOPs and bytes
   (XLA cost model with the iteration scans unrolled so every executed
   body is counted — MPCConfig.iter_unroll, bit-identical numerics) give
   arithmetic intensity; with the measured solves/s this yields achieved
   FLOP/s and bytes/s as fractions of the measured ceilings.
3. **Dispatch/scan overhead**: the closed-loop scan's wall time per step
   vs the isolated batched-solve program's wall time separates
   solver compute from plant+telemetry+scan overhead.
4. **One measured attempt to move it** (the verdict's ask): the condensed
   GN solve_batch path whose linear algebra is batch-level einsums
   (ops/smallchol unrolled kernel) vs the per-scenario vmap default, at
   N=10 on the TPU — does batching the linear algebra into MXU-shaped
   einsums beat the explicit-batch Riccati sweep?  (Answer from round 3:
   no — recorded here with this round's numbers.)

Writes docs/artifacts/roofline_n10.json.  Usage:
  python scripts/roofline_n10.py [--batch 4096] [--steps 300]
"""

import argparse
import json
import os
import sys
import time

if os.environ.get("FCT_CPU"):
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed_best(fn, variants, reps=3):
    """Best-of amortized wall time over K staged input variants.

    The remote-attach tunnel costs ~25 ms per forced host transfer, so a
    single timed execution of a 10-20 ms kernel would be transport-
    dominated (the first draft of this script measured "5.6 GB/s HBM" for
    exactly that reason).  K distinct executions are enqueued back to
    back on the in-order device stream and only the last result is
    forced, amortizing the transfer K-fold (same pattern as
    utils/profiling.solver_phase_breakdown)."""
    import jax

    def force(o):
        return float(o[-1]) if isinstance(o, tuple) else float(o)

    for v in variants:
        jax.tree.map(lambda a: a.block_until_ready()
                     if hasattr(a, "block_until_ready") else a, v)
    force(fn(*variants[0]))         # warmup + compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        outs = [fn(*v) for v in variants]
        force(outs[-1])
        best = min(best, (time.perf_counter() - t0) / len(variants))
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default="docs/artifacts/roofline_n10.json")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_fct")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from forging_control_tpu.loop import closed_loop as cl
    from forging_control_tpu.refgen import streams
    from forging_control_tpu.solver import sqp

    B, T, N = args.batch, args.steps, 10
    dtype = jnp.float32
    out = {"device": str(jax.devices()[0]), "batch": B, "steps": T,
           "horizon": N}

    # ---- 1. measured ceilings -------------------------------------------
    # HBM: 256 MiB f32 array (too large for VMEM residency), R serialized
    # passes inside one program — the acc dependence prevents algebraic
    # hoisting of the reduction, so every pass re-streams from HBM.
    M_HBM = 256 * 1024 * 1024 // 4
    R = 16
    xb = jnp.arange(M_HBM, dtype=dtype) * 1e-9

    @jax.jit
    def hbm_fn(x):
        def body(i, acc):
            return acc + jnp.sum(jnp.abs(x + acc * 1e-30))
        return jax.lax.fori_loop(0, R, body, jnp.zeros((), dtype))

    variants = [xb * (1.0 + 1e-6 * i) for i in range(6)]
    t_hbm = timed_best(hbm_fn, [(v,) for v in variants])
    hbm_red_bytes_per_s = 4.0 * M_HBM * R / t_hbm

    # second pattern: streaming scale (read 4B + write 4B per element) —
    # stores help saturate the memory system where a pure reduction
    # cannot; the ceiling is the max over patterns.  The scalar force
    # goes through a tiny slice-sum so timed_best's float() works.
    @jax.jit
    def hbm_copy(x):
        y = x * 1.0001
        # y is a program OUTPUT, so it must be fully materialized (no
        # DCE of the store); only the scalar is transferred to host.
        return y, y[:128].sum()

    t_copy = timed_best(hbm_copy, [(v,) for v in variants])
    hbm_copy_bytes_per_s = 8.0 * M_HBM / t_copy
    hbm_bytes_per_s = max(hbm_red_bytes_per_s, hbm_copy_bytes_per_s)

    # VPU: deep fused fma chain on a VMEM-resident-scale array; 2 flops
    # per element per iteration, one HBM pass total.
    M_VPU = 16 * 1024 * 1024 // 4
    K = 8192
    xv = jnp.arange(M_VPU, dtype=dtype) * 1e-9

    @jax.jit
    def vpu_chain(x):
        def body(i, acc):
            return acc * 1.0000001 + 0.9999
        return jnp.sum(jax.lax.fori_loop(0, K, body, x))

    vvars = [xv * (1.0 + 1e-6 * i) for i in range(4)]
    t_vpu = timed_best(vpu_chain, [(v,) for v in vvars])
    vpu_flops_per_s = 2.0 * K * M_VPU / t_vpu

    out["ceilings_measured"] = {
        "hbm_bytes_per_s": hbm_bytes_per_s,
        "hbm_reduction_bytes_per_s": hbm_red_bytes_per_s,
        "hbm_copy_bytes_per_s": hbm_copy_bytes_per_s,
        "vpu_flops_per_s": vpu_flops_per_s,
        "hbm_spec_bytes_per_s": 819e9,
        "note": ("microbenchmarks on this chip, amortized-transfer "
                 "timing: 16 serialized 256 MiB streaming-reduction "
                 "passes and a 256 MiB read+write scale (HBM; ceiling = "
                 "max of patterns, spec ~819 GB/s for v5e), plus an "
                 "8192-deep fused fma chain on 16 MiB (VPU; a VMEM-"
                 "bandwidth-limited pattern, so a lower bound on the "
                 "raw flop peak); datasheet bf16 MXU peak 1.97e14 "
                 "FLOP/s is NOT the relevant ceiling for this "
                 "elementwise program"),
    }
    print(json.dumps(out["ceilings_measured"]), flush=True)

    # ---- 2. bench program placement -------------------------------------
    preset = os.environ.get("BENCH_PRESET", "default")
    makers = {"default": sqp.MPCConfig, "fast": sqp.MPCConfig.fast,
              "fast_5x1": lambda **kw: sqp.MPCConfig.fast(gn_iters=5, **kw)}
    ctrl = cl.MPCController(makers[preset](horizon=N, variant="smooth"),
                            backend="ilqr")
    loop_cfg = cl.LoopConfig(t_steps=T, variant="smooth")
    refs = streams.sample_references(jax.random.PRNGKey(0), B, "supervised",
                                     t_steps=T, dtype=dtype)
    x0 = jnp.tile(jnp.asarray(cl.press.X0_REFERENCE, dtype), (B, 1))
    run = jax.jit(lambda x, r, k: cl.run_batch(loop_cfg, ctrl, x, r, k))
    _, telem = run(x0, refs, jax.random.PRNGKey(0))
    telem.u.block_until_ready()
    best = float("inf")
    for i in range(args.reps):
        t0 = time.perf_counter()
        _, telem = run(x0, refs, jax.random.PRNGKey(i + 1))
        float(telem.u.sum())
        best = min(best, time.perf_counter() - t0)
    solves_per_s = B * T / best

    # exact executed FLOPs/bytes per solve (iteration scans unrolled)
    ctrl_u = cl.MPCController(dataclasses.replace(ctrl.cfg, iter_unroll=True),
                              backend="ilqr")
    state0 = ctrl_u.init_carry_batch(B, dtype)
    prog = jax.jit(lambda s, x, r, u: ctrl_u.step_batch(s, x, r, u))
    compiled = prog.lower(state0, x0, refs[:, 0],
                          jnp.zeros((B,), dtype)).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    flops_per_solve = float(ca["flops"]) / B
    bytes_per_solve = float(ca.get("bytes accessed", 0.0)) / B

    # isolated batched-solve wall time (dispatch/scan overhead split);
    # amortized over staged variants like the ceilings — a single forced
    # call would include one full tunnel round trip (~25 ms).
    state0b = ctrl.init_carry_batch(B, dtype)
    solve_fn = jax.jit(
        lambda s, x, r, u: ctrl.step_batch(s, x, r, u)[0].sum())
    r0 = refs[:, 0]
    svars = [(state0b, x0, r0, jnp.full((B,), 1e-6 * i, dtype))
             for i in range(8)]
    t_solve = timed_best(solve_fn, svars, reps=args.reps)

    achieved_flops = flops_per_solve * solves_per_s
    achieved_bytes = bytes_per_solve * solves_per_s
    out["bench_placement"] = {
        "preset": preset,
        "solves_per_s": solves_per_s,
        "us_per_step_per_batch": best / T * 1e6,
        "flops_per_solve_exact": flops_per_solve,
        "bytes_per_solve": bytes_per_solve,
        "arithmetic_intensity_flops_per_byte":
            flops_per_solve / bytes_per_solve if bytes_per_solve else None,
        "achieved_flops_per_s": achieved_flops,
        "achieved_bytes_per_s": achieved_bytes,
        "pct_of_measured_vpu": 100.0 * achieved_flops / vpu_flops_per_s,
        "pct_of_measured_hbm": 100.0 * achieved_bytes / hbm_bytes_per_s,
        "isolated_solve_us_per_step": t_solve * 1e6,
        "scan_step_us": best / T * 1e6,
        "solver_share_of_step":
            (t_solve * T / best) if best else None,
        # speed-of-light cross-check: wall time per solve vs the time the
        # HBM (spec) needs to move the program's cost-model traffic.
        "us_per_solve": 1e6 / solves_per_s,
        "hbm_lower_bound_us_per_solve": bytes_per_solve / 819e9 * 1e6,
        "pct_of_hbm_speed_of_light":
            100.0 * (bytes_per_solve / 819e9) * solves_per_s,
    }
    print(json.dumps(out["bench_placement"]), flush=True)

    # ---- 4. the measured MXU-path attempt -------------------------------
    attempts = {}
    for label, mk in (
            ("sqp_vmap", lambda: cl.MPCController(
                makers[preset](horizon=N, variant="smooth"), backend="sqp")),
            ("sqp_batch_unrolled", lambda: cl.MPCController(
                makers[preset](horizon=N, variant="smooth"), backend="sqp",
                linsolve="unrolled"))):
        c = mk()
        runc = jax.jit(lambda x, r, k, _c=c: cl.run_batch(loop_cfg, _c, x, r, k))
        try:
            _, tl = runc(x0, refs, jax.random.PRNGKey(0))
            tl.u.block_until_ready()
            tb = float("inf")
            for i in range(args.reps):
                t0 = time.perf_counter()
                _, tl = runc(x0, refs, jax.random.PRNGKey(i + 1))
                float(tl.u.sum())
                tb = min(tb, time.perf_counter() - t0)
            attempts[label] = {"solves_per_s": B * T / tb}
        except Exception as e:            # pragma: no cover
            attempts[label] = {"error": str(e)[:200]}
        print(json.dumps({label: attempts[label]}), flush=True)
    attempts["ilqr_default"] = {"solves_per_s": solves_per_s}
    out["backend_ab"] = attempts

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    json.dump(out, open(args.out, "w"), indent=2)
    print("written", args.out)


if __name__ == "__main__":
    main()
