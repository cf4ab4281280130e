"""Unit tests for the plant physics (forging_control_tpu.physics.press)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from forging_control_tpu.physics import press
from forging_control_tpu.physics.scaling import X_SCALE, scale_x, unscale_x


def _numpy_rhs_raw(x, u, p=press.DEFAULT_PARAMS):
    """Independent NumPy transcription of Generate Data/template_model.py."""
    y, y_dot, p1, p2, z = x
    A1 = np.pi * p.D1**2 / 4
    A2 = np.pi * p.D2**2 / 4
    A = 0.14 + 0.36 * (p.B0 / p.W0) - 0.054 * (p.B0 / p.W0) ** 2

    if y > 0 and y_dot >= 0:
        h1 = p.H0 - y
        w1 = p.W0 * (p.H0 / h1) ** A
        b1 = p.B0 * (1 + 0.67 * (p.H0 / h1 * p.W0 / w1 - 1))
        Kd = p.K * (1 + p.MU * b1 / (2 * y) + y / (4 * b1))
        Ad = w1 * b1
        e = np.log(p.H0 / (p.H0 - y))
        e_dot = y_dot / (p.H0 - y)
        Fd = Kd * Ad * p.M0 * np.exp(p.M1 * p.T) * e**p.M2 * e_dot**p.M3 * np.exp(p.M4 / e)
    else:
        Fd = 0.0

    def orifice(dp):
        return np.sqrt(2 / p.RHO * abs(dp)) * np.sign(dp)

    coeff = np.pi * p.D * p.CD * z
    if z >= 0:
        qvPB = coeff * orifice(p.PS - p1)
        qvAT = coeff * orifice(p2 - p.PT)
    else:
        qvPB = coeff * orifice(p1 - p.PT)
        qvAT = coeff * orifice(p.PS - p2)

    V1 = p.V1_0 / 2 + A1 * y
    V2 = p.V2_0 / 2 - A2 * y
    Ft = p.FT * y_dot / 0.5 if abs(y_dot) <= 0.5 else p.FT

    return np.array([
        y_dot,
        (3 * np.pi * p.D1**2 * p1 / 4 - np.pi * p.D2**2 * p2 / 2
         - p.B * y_dot - Ft - Fd) / p.M + p.G,
        p.KB / V1 * (qvPB / 3 - A1 * y_dot - p.KL_1 * p1),
        p.KB / V2 * (-qvAT / 2 + A2 * y_dot - p.KL_2 * p2),
        (-z + u) / p.T1,
    ])


STATES = [
    np.array([0.0, 0.0, 2156275.6, 2961363.8, 0.0]),
    np.array([0.05, 0.5, 7.5e6, 5.3e6, 0.17]),
    np.array([0.08, -0.3, 1.2e7, 2.9e7, -0.12]),
    np.array([0.02, 0.9, 3.0e7, 1.0e5, 0.2]),
    np.array([0.1, -0.6, -2.0e6, 3.5e7, -0.05]),  # cavitated p1
]
INPUTS = [0.0, 0.03, -0.08, 0.2, -0.2]


@pytest.mark.parametrize("x,u", list(zip(STATES, INPUTS)))
def test_rhs_matches_numpy_transcription(x, u):
    got = np.array(press.rhs(jnp.array(x), u, variant="raw"))
    want = _numpy_rhs_raw(x, u)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-9)


def test_variants_agree_for_positive_pressure():
    x = jnp.array(STATES[1])
    for v in ("raw", "smooth", "clamp"):
        out = press.rhs(x, 0.03, variant=v)
        np.testing.assert_allclose(
            np.array(out), _numpy_rhs_raw(STATES[1], 0.03), rtol=1e-6)


def test_clamp_variant_floors_pressure():
    x = jnp.array(STATES[4])  # p1 < 0
    raw = press.rhs(x, -0.05, variant="raw")
    clamp = press.rhs(x, -0.05, variant="clamp")
    assert not np.allclose(np.array(raw), np.array(clamp))
    # clamp RHS equals raw RHS evaluated at p1 = 0
    x0 = x.at[2].set(0.0)
    np.testing.assert_allclose(
        np.array(clamp)[1:4], np.array(press.rhs(x0, -0.05, variant="raw"))[1:4],
        rtol=1e-12)


def test_smooth_measurement_floors_pressures():
    x = jnp.array(STATES[4])
    y = press.measure(x, variant="smooth")
    assert float(y[2]) >= 0.0
    assert float(y[2]) < 1.0  # smooth_relu(-2e6) ~ eps
    np.testing.assert_allclose(np.array(y)[[0, 1, 4]], np.array(x)[[0, 1, 4]])


def test_forging_force_gating():
    # no contact / negative velocity => exactly zero
    assert float(press.forging_force(jnp.array(-0.01), jnp.array(0.5))) == 0.0
    assert float(press.forging_force(jnp.array(0.05), jnp.array(-0.1))) == 0.0
    assert float(press.forging_force(jnp.array(0.05), jnp.array(0.5))) > 0.0


def test_rhs_gradients_finite_everywhere():
    """jacfwd through the RHS must be NaN-free, including at the gated
    singularities (y=0, y_dot=0, cavitation) the solver differentiates
    through (SURVEY.md section 7 'hard parts')."""
    hard_states = STATES + [
        np.array([0.0, 0.0, 0.0, 0.0, 0.0]),
        np.array([1e-9, 1e-9, 1e3, 1e3, 1e-6]),
        np.array([0.05, 0.0, 3.2e7, 101325.0, 0.0]),
    ]
    for variant in ("raw", "smooth", "clamp"):
        for x in hard_states:
            J = jax.jacfwd(lambda xx: press.rhs(xx, 0.01, variant=variant))(jnp.array(x))
            assert np.all(np.isfinite(np.array(J))), (variant, x)


def test_rhs_vmaps():
    xs = jnp.array(np.stack(STATES))
    us = jnp.array(INPUTS)
    out = jax.vmap(lambda x, u: press.rhs(x, u, variant="smooth"))(xs, us)
    assert out.shape == (5, 5)
    assert np.all(np.isfinite(np.array(out)))


def test_scaling_roundtrip():
    x = jnp.array(STATES[1])
    np.testing.assert_allclose(np.array(unscale_x(scale_x(x))), STATES[1], rtol=1e-12)
    assert np.all(np.abs(np.array(scale_x(x))) < 20)  # O(1) in scaled units


def test_rhs_float32_nan_free_near_zero_strain():
    """f32 regression: with y just below/above 0, the gated Fd branch must
    not produce NaN (eps_y must stay resolvable against H0 in float32 —
    at eps_y=1e-12 the f32 strain rounds to log(1)=0 and 0**M2 = inf
    poisons the masked branch)."""
    for y in (-1.6e-4, -1e-9, 0.0, 1e-9, 1e-7):
        x = jnp.asarray([y, 0.165, 1.03e7, 2.29e6, 0.0689], jnp.float32)
        out = press.rhs(x, jnp.float32(0.2), variant="smooth")
        assert np.all(np.isfinite(np.array(out))), (y, out)
    # and through a noisy RK4 step like the failing dataset trajectory
    from forging_control_tpu.integrate.rk4 import rk4_step
    w = jnp.asarray([-0.1, -0.2, 4e7, 6.3e7, 3.2], jnp.float32)
    f = lambda xx, uu: press.rhs(xx, uu, variant="smooth")
    x = jnp.asarray([-1.58e-4, 0.165, 1.03e7, 2.29e6, 0.0689], jnp.float32)
    xn = rk4_step(f, x, jnp.float32(0.22), 1e-3, 4, disturbance=w)
    assert np.all(np.isfinite(np.array(xn)))
