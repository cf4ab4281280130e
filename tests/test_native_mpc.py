"""Native C++ GN-SQP MPC tests: JAX parity, golden quality, real-time budget."""

import subprocess

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from forging_control_tpu import runtime
from forging_control_tpu.physics import press
from forging_control_tpu.solver import sqp


@pytest.fixture(scope="module")
def lib():
    try:
        runtime.build()
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        pytest.skip(f"g++ unavailable: {e}")
    return runtime.load()


def test_single_solve_matches_jax(lib):
    """Cold-start native solve vs the JAX solver (same config) on the
    reference initial state."""
    cfg = sqp.MPCConfig(horizon=10, variant="smooth")
    x0 = np.array(press.X0_REFERENCE)
    for ref in (0.578157, -0.4, 0.2):
        st = sqp.init_state(cfg, jnp.float64)
        u_jax, _, _ = sqp.solve(cfg, jnp.array(x0), ref, 0.0, st)
        mpc = runtime.NativeMPC(horizon=10)
        # fc_mpc_step shifts first; from a zero state shift is a no-op.
        u_nat, stats = mpc.step(x0, ref, 0.0)
        assert abs(float(u_jax) - u_nat) < 2e-4, (ref, float(u_jax), u_nat)
        assert stats["inf_pr"] < 1e-2


def test_closed_loop_golden_quality(lib, golden_mpc_rows):
    """Native closed loop on the recorded reference stream must match the
    reference MPC's tracking quality."""
    rows = golden_mpc_rows[:300]
    mpc = runtime.NativeMPC(horizon=10)
    xs, us, lat = mpc.run_episode(np.array(press.X0_REFERENCE), rows[:, 1])
    mae = np.abs(xs[:, 1] - rows[:, 1]).mean()
    golden = np.abs(rows[:, 3] - rows[:, 1]).mean()
    assert abs(mae - golden) < 0.01
    assert np.abs(us - rows[:, 7]).mean() < 5e-3


def test_realtime_budget(lib, golden_mpc_rows):
    """The headline deployment claim: warm-started native solves meet the
    1 ms control budget at the median (IPOPT: 15.4 ms median,
    BASELINE.md)."""
    rows = golden_mpc_rows[:300]
    mpc = runtime.NativeMPC(horizon=10, gn_iters=3, al_iters=1)
    xs, us, lat = mpc.run_episode(np.array(press.X0_REFERENCE), rows[:, 1])
    p50_ms = np.percentile(lat, 50) / 1e6
    assert p50_ms < 1.0, f"native MPC p50 {p50_ms:.3f} ms exceeds budget"
    # quality preserved at the fast setting
    assert np.abs(xs[:, 1] - rows[:, 1]).mean() < 0.06


def test_horizon_sweep(lib):
    refs = np.concatenate([np.full(30, 0.4), np.full(30, -0.4)])
    for N in (5, 10, 25):
        mpc = runtime.NativeMPC(horizon=N)
        xs, us, _ = mpc.run_episode(np.array(press.X0_REFERENCE), refs)
        assert np.all(np.isfinite(xs)) and np.all(np.isfinite(us))
