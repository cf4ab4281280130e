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


def test_lstm_pallas_matches_jnp():
    """Fused Pallas LSTM forward == nn.lstm.apply (interpreter on CPU),
    including batch padding and the optional readout bias."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from forging_control_tpu.nn import lstm
    from forging_control_tpu.ops import lstm_pallas

    params = lstm.init(jax.random.PRNGKey(0), dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (37, 10, 5), jnp.float32)
    want = lstm.apply(params, x)
    got = lstm_pallas.apply_pallas(params, x, block_b=16, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-6)

    # bias-free readout path
    p2 = {k: v for k, v in params.items() if k != "b_out"}
    want2 = lstm.apply(p2, x)
    got2 = lstm_pallas.apply_pallas(p2, x, block_b=16, interpret=True)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2),
                               rtol=2e-5, atol=2e-6)
