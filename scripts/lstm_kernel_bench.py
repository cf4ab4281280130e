"""TPU A/B: fused Pallas LSTM forward vs the jnp lax.scan path, at the
surrogate's shapes (hidden 50, 3 layers, lookback 10), plus the MPC-loss
training step time (jnp path; the kernel is forward-only).  Writes the
numbers quoted in docs/RESULTS.md."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_fct")

import jax.numpy as jnp
import numpy as np

from forging_control_tpu.nn import fnn, lstm, mpc_loss
from forging_control_tpu.ops import lstm_pallas


def timeit(f, *args, reps=20):
    out = jax.block_until_ready(f(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        best = min(best, time.perf_counter() - t0)
    return best, out


params = lstm.init(jax.random.PRNGKey(0), dtype=jnp.float32)
for B in (256, 4096, 24576):
    x = jax.random.normal(jax.random.PRNGKey(1), (B, 10, 5), jnp.float32)
    t_jnp, o1 = timeit(jax.jit(lambda p, xx: lstm.apply(p, xx)), params, x)
    t_pal, o2 = timeit(jax.jit(
        lambda p, xx: lstm_pallas.apply_pallas(p, xx)), params, x)
    err = float(jnp.max(jnp.abs(o1 - o2)))
    print(f"B={B:6d}: jnp {t_jnp*1e6:8.1f} us  pallas {t_pal*1e6:8.1f} us "
          f"({t_jnp/t_pal:.2f}x)  max|diff| {err:.2e}")

# MPC-loss training step (jnp path), reference protocol shapes: bs=15
cp, _ = fnn.init(jax.random.PRNGKey(2))
for bs in (15, 150):
    xb = jax.random.uniform(jax.random.PRNGKey(3), (bs, 3), jnp.float32,
                            -1, 1)
    zb = jax.random.uniform(jax.random.PRNGKey(4), (bs, 10, 5), jnp.float32,
                            -1, 1)

    @jax.jit
    def step(p, xb, zb):
        def loss(pp):
            u = fnn.apply(pp, xb)
            l, _ = mpc_loss.mpc_loss(pp, params, xb, u, zb, horizon=10,
                                     alpha=20.0)
            return l
        return jax.value_and_grad(loss)(p)

    t_step, _ = timeit(step, cp, xb, zb)
    print(f"MPC-loss train step (jnp, bs={bs}): {t_step*1e6:.1f} us")
