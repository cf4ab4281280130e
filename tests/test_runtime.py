"""Native C++ runtime tests: build, physics parity, policy parity, latency."""

import subprocess

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from forging_control_tpu import runtime
from forging_control_tpu.integrate.rk4 import rk4_step
from forging_control_tpu.nn import fnn, scalers
from forging_control_tpu.physics import press


@pytest.fixture(scope="module")
def lib():
    try:
        runtime.build()
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        pytest.skip(f"g++ unavailable: {e}")
    return runtime.load()


STATES = [
    np.array(press.X0_REFERENCE),
    np.array([0.05, 0.5, 7.5e6, 5.3e6, 0.17]),
    np.array([0.08, -0.3, 1.2e7, 2.9e7, -0.12]),
    np.array([0.1, -0.6, -2.0e6, 3.5e7, -0.05]),
]


@pytest.mark.parametrize("variant", ["raw", "smooth", "clamp"])
def test_native_rhs_matches_jax(lib, variant):
    for x in STATES:
        for u in (0.0, 0.05, -0.15):
            want = np.array(press.rhs(jnp.array(x), u, variant=variant))
            got = runtime.rhs(x, u, variant)
            np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-8)


def test_native_rk4_matches_jax(lib):
    f = lambda x, u: press.rhs(x, u, variant="smooth")
    for x in STATES[:2]:
        want = np.array(rk4_step(f, jnp.array(x), 0.03, 1e-3, 4))
        got = runtime.rk4(x, 0.03, 1e-3, 4, "smooth")
        np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-8)


@pytest.fixture(scope="module")
def trained_policy():
    params, _ = fnn.init(jax.random.PRNGKey(0), dtype=jnp.float64)
    in_sc = scalers.Scaler(jnp.zeros(3), jnp.asarray([0.9, 0.2, 0.9]))
    out_sc = scalers.Scaler(jnp.zeros(1), jnp.asarray([0.2]))
    return params, in_sc, out_sc


def test_native_policy_matches_jax(lib, trained_policy):
    params, in_sc, out_sc = trained_policy
    ex = runtime.RealtimeExecutor()
    ex.load_fnn_policy(params, in_sc, out_sc)
    policy = fnn.make_policy(params, in_sc, out_sc)
    rng = np.random.RandomState(0)
    for _ in range(20):
        x = rng.randn(5) * [0.05, 0.4, 1e7, 1e7, 0.1]
        ref = rng.uniform(-0.9, 0.9)
        want = float(policy(jnp.array(x), ref, 0.0))
        ex._lib.fc_reset(ex._h, runtime._dp(np.ascontiguousarray(x)))
        lat = np.zeros(1, np.int64)
        got = ex._lib.fc_step(ex._h, ref, None, None,
                              lat.ctypes.data_as(
                                  runtime.ctypes.POINTER(runtime.ctypes.c_int64)))
        np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12)


def test_native_episode_and_latency(lib, trained_policy):
    """Full native episode: finite trajectories and policy latency far
    inside the 1 ms budget the reference's NN barely met (0.2-0.7 ms,
    BASELINE.md)."""
    params, in_sc, out_sc = trained_policy
    ex = runtime.RealtimeExecutor()
    ex.load_fnn_policy(params, in_sc, out_sc)
    refs = np.concatenate([np.full(150, 0.5), np.full(150, -0.5)])
    xs, us, lat = ex.run_episode(np.array(press.X0_REFERENCE), refs)
    assert np.all(np.isfinite(xs)) and np.all(np.isfinite(us))
    assert np.all(np.abs(us) <= 0.2 + 1e-12)
    p50_us = np.percentile(lat, 50) / 1e3
    assert p50_us < 1000.0, f"policy p50 {p50_us} us exceeds 1 ms"


def test_native_episode_matches_jax_loop(lib, trained_policy):
    """The native executor and the JAX closed loop must produce the same
    trajectory for the same policy (no-noise, f64)."""
    from forging_control_tpu.loop import closed_loop as cl
    params, in_sc, out_sc = trained_policy
    ex = runtime.RealtimeExecutor()
    ex.load_fnn_policy(params, in_sc, out_sc)
    refs = np.concatenate([np.full(30, 0.4), np.full(30, -0.4)])
    xs, us, _ = ex.run_episode(np.array(press.X0_REFERENCE), refs)

    ctrl = cl.FunctionController(fnn.make_policy(params, in_sc, out_sc))
    loop_cfg = cl.LoopConfig(t_steps=60, variant="smooth")
    _, telem = jax.jit(lambda x, r, k: cl.run_batch(loop_cfg, ctrl, x, r, k))(
        jnp.array(press.X0_REFERENCE)[None], jnp.asarray(refs)[None],
        jax.random.PRNGKey(0))
    np.testing.assert_allclose(us, np.array(telem.u)[0], rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(xs, np.array(telem.x)[0], rtol=1e-6, atol=1e-6)
