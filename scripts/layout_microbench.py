"""Micro-benchmark: batched tiny-matrix sweeps, (B,6,6) einsum vs lane-major
(6,6,B) unrolled elementwise — decides the Riccati backward-sweep layout."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

B, N, ITERS = 4096, 25, 16


def einsum_sweep(As, Vzz0):
    def body(V, A):
        T = jnp.einsum("bji,bjk->bik", A, V)
        V2 = jnp.einsum("bik,bkl->bil", T, A)
        return V2 + 1e-6 * jnp.eye(6, dtype=V.dtype), None

    V, _ = jax.lax.scan(body, Vzz0, As)
    return V


def lane_sweep(As, Vzz0):
    # As (N, 6, 6, B), Vzz0 (6, 6, B)
    def body(V, A):
        # T[i,k] = sum_j A[j,i] V[j,k]; V2[i,l] = sum_k T[i,k] A[k,l]
        T = jnp.stack([
            jnp.stack([sum(A[j, i] * V[j, k] for j in range(6))
                       for k in range(6)]) for i in range(6)])
        V2 = jnp.stack([
            jnp.stack([sum(T[i, k] * A[k, l] for k in range(6))
                       for l in range(6)]) for i in range(6)])
        eye = jnp.eye(6, dtype=V.dtype)[:, :, None]
        return V2 + 1e-6 * eye, None

    V, _ = jax.lax.scan(body, Vzz0, As)
    return V


def timeit(f, *args):
    g = jax.jit(f)
    t0 = time.perf_counter()
    g(*args)[0].block_until_ready() if isinstance(g(*args), tuple) else None
    r = g(*args)
    jax.block_until_ready(r)
    tc = time.perf_counter() - t0
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(g(*args))
        best = min(best, time.perf_counter() - t0)
    return tc, best


key = jax.random.PRNGKey(0)
As_b = jax.random.normal(key, (N, B, 6, 6), jnp.float32) * 0.1
V0_b = jnp.eye(6, dtype=jnp.float32) + jnp.zeros((B, 6, 6), jnp.float32)
tc, t = timeit(lambda a, v: einsum_sweep(a, v), As_b, V0_b)
print(f"einsum (B,6,6): compile {tc:.2f}s steady {t*1e3:.2f} ms")

As_l = jnp.moveaxis(As_b, 1, -1)
V0_l = jnp.moveaxis(V0_b, 0, -1)
tc, t = timeit(lambda a, v: lane_sweep(a, v), As_l, V0_l)
print(f"lane  (6,6,B): compile {tc:.2f}s steady {t*1e3:.2f} ms")
