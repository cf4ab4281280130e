"""Quickstart: batched MPC rollouts, NN training, native deployment.

Run: python examples/quickstart.py        (CPU or TPU)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from forging_control_tpu.loop import closed_loop as cl
    from forging_control_tpu.nn import fnn
    from forging_control_tpu.pipelines import config, generate_data, supervised
    from forging_control_tpu.refgen import streams
    from forging_control_tpu.solver import sqp

    # 1. Batched closed-loop MPC: 8 trajectories, one compiled program.
    ctrl = cl.MPCController(sqp.MPCConfig(horizon=10, variant="smooth"))
    loop_cfg = cl.LoopConfig(t_steps=100, variant="smooth")
    refs = jnp.asarray(streams.reference_table(8, "supervised")[:, :100],
                       jnp.float32)
    x0 = jnp.tile(cl.default_x0(jnp.float32), (8, 1))
    _, telem = jax.jit(lambda x, r, k: cl.run_batch(loop_cfg, ctrl, x, r, k))(
        x0, refs, jax.random.PRNGKey(0))
    mae = float(jnp.mean(jnp.abs(telem.x[..., 1] - telem.ref)))
    print(f"MPC closed loop: tracking MAE {mae:.4f}, "
          f"mean solver iters {float(jnp.mean(telem.diag.iters)):.1f}")

    # 2. Generate a small dataset and clone the MPC into an FNN.
    gcfg = config.GenerateConfig(n_traj=8, t_traj=100, horizon=10,
                                 variant_model="smooth",
                                 ref_variant="supervised")
    _, results = generate_data.run(gcfg, seed=0)
    scfg = config.SupervisedConfig(horizon=10, epochs=5)
    art = supervised.run(results, scfg, closed_loop_eval=False)
    print(f"supervised clone: test MAE {art.test_metrics['MAE']:.4f} (scaled)")

    # 3. Long horizons ride the Riccati (iLQR) backend automatically, and
    #    per-iteration solver traces feed the diagnostics dashboards.
    ctrl25 = cl.MPCController(
        sqp.MPCConfig(horizon=25, variant="smooth", record_trace=True),
        backend="auto")  # auto -> "ilqr" for N > 12
    lc = cl.LoopConfig(t_steps=20, variant="smooth")
    _, t25 = jax.jit(lambda x, r, k: cl.run_batch(lc, ctrl25, x, r, k))(
        x0[:2], refs[:2, :20], jax.random.PRNGKey(0))
    print(f"N=25 via {ctrl25.backend}: trace shape {t25.diag.trace.shape} "
          f"(steps x iterations x stats)")

    # 4. DAgger: improve the clone by relabeling its own closed-loop
    #    states with the batched MPC teacher (seconds per round here;
    #    hours of serial IPOPT in the reference's stack).
    from forging_control_tpu.nn import train as train_mod
    d_refs = streams.sample_references(jax.random.PRNGKey(3), 4,
                                       "supervised", 50, dtype=jnp.float32)
    feats, labels = train_mod.dagger_rollout(
        art.params, art.in_scaler, art.out_scaler,
        sqp.MPCConfig(horizon=10, variant="smooth"), d_refs,
        jax.random.PRNGKey(4))
    print(f"DAgger labeling pass: {labels.size} teacher labels on the "
          f"student's own states")

    # 5. Deploy natively (C++ executor) if a toolchain is available.
    try:
        from forging_control_tpu import runtime
        ex = runtime.RealtimeExecutor()
        ex.load_fnn_policy(art.params, art.in_scaler, art.out_scaler)
        xs, us, lat = ex.run_episode(np.array(cl.press.X0_REFERENCE),
                                     np.asarray(refs[0], np.float64))
        print(f"native NN policy: p50 latency {np.percentile(lat, 50)/1e3:.1f} us")
        mpc = runtime.NativeMPC(horizon=10, gn_iters=3, al_iters=1)
        xs, us, lat = mpc.run_episode(np.array(cl.press.X0_REFERENCE),
                                      np.asarray(refs[0], np.float64))
        print(f"native MPC: p50 latency {np.percentile(lat, 50)/1e6:.3f} ms "
              f"(budget 1 ms)")
    except Exception as e:  # noqa: BLE001 - toolchain optional
        print(f"native runtime unavailable: {e}")


if __name__ == "__main__":
    main()
