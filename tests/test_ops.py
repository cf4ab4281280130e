"""Tests for the batched small-Cholesky KKT kernel."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from forging_control_tpu.ops import smallchol


def _random_spd(rng, B, N):
    A = rng.randn(B, N, N)
    H = A @ np.transpose(A, (0, 2, 1)) + N * np.eye(N)
    g = rng.randn(B, N)
    return jnp.asarray(H), jnp.asarray(g)


@pytest.mark.parametrize("N", [5, 10, 25])
def test_unrolled_matches_linalg(N):
    rng = np.random.RandomState(0)
    H, g = _random_spd(rng, 64, N)
    want = jnp.linalg.solve(H, g[..., None])[..., 0]
    got = smallchol.chol_solve(H, g)
    np.testing.assert_allclose(np.array(got), np.array(want), rtol=1e-9,
                               atol=1e-10)


def test_unrolled_vmap_grad():
    rng = np.random.RandomState(1)
    H, g = _random_spd(rng, 8, 6)

    def f(H, g):
        return jnp.sum(smallchol.chol_solve(H, g) ** 2)

    grads = jax.grad(f, argnums=(0, 1))(H, g)
    assert all(np.all(np.isfinite(np.array(gr))) for gr in grads)


@pytest.mark.parametrize("B", [32, 128, 300])
def test_pallas_kernel_interpret(B):
    """Pallas kernel in interpreter mode (CPU) vs reference solve,
    including non-multiple-of-tile batch sizes (padding path)."""
    rng = np.random.RandomState(2)
    H, g = _random_spd(rng, B, 10)
    want = jnp.linalg.solve(H, g[..., None])[..., 0]
    got = smallchol.chol_solve_pallas(H, g, interpret=True)
    np.testing.assert_allclose(np.array(got), np.array(want), rtol=1e-8,
                               atol=1e-9)
