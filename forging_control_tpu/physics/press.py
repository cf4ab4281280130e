"""Hydraulic-press plant physics, pure JAX.

TPU-native reimplementation of the open-die forging press model.  The state
vector is ``x = [y, y_dot, p1, p2, z]``:

* ``y``      die displacement (deformation) [m]
* ``y_dot``  die velocity [m/s]
* ``p1``     working-chamber pressure [Pa]
* ``p2``     return-chamber pressure [Pa]
* ``z``      servo-valve spool position [m]

with a single input ``u`` (servo-valve tension, dimensionless).

Reference parity: the constants and equations mirror
``Generate Data/template_model.py:20-133`` of marcowus/forging-control; the
smooth pressure-floor variant mirrors ``Supervised Learning/template_model.py:
104-153`` and the hard-clamp variant ``Unsupervised Learning/Model_NN/
template_model.py:128-136``.  Unlike the reference (CasADi symbolic graphs
lowered through C++ codegen), everything here is a plain JAX function of
arrays: `vmap` batches it over thousands of scenarios, `jacfwd` provides the
solver derivatives, and XLA fuses the whole RHS into the surrounding
integrator/solver program.

Shape convention: ``x`` has shape ``(..., 5)`` and ``u`` shape ``(...,)``;
every function broadcasts over leading batch axes so the same code serves the
single-trajectory CPU path and the sharded multi-chip batch path.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Literal

import jax.numpy as jnp

Variant = Literal["raw", "smooth", "clamp"]

_SMOOTH_EPS = 1e-6  # C1 softplus epsilon (Supervised Learning/template_model.py:107)


@dataclasses.dataclass(frozen=True)
class PressParams:
    """Physical constants of the press.

    Defaults replicate ``Generate Data/template_model.py:20-62`` exactly.
    The dataclass is static configuration (hashable), not a traced pytree:
    jitted functions close over it.
    """

    # Mechanical
    M: float = 90000.0        # moving mass [kg]
    B: float = 25000.0        # viscous damping [Ns/m]
    FT: float = 200000.0      # sliding friction force [N]
    D1: float = 0.6           # working plunger diameter [m]
    D2: float = 0.5           # return plunger diameter [m]
    G: float = 9.81           # gravity [m/s^2]

    # Hydraulic
    KB: float = 22e9          # bulk modulus [Pa]
    V1_0: float = 0.3         # working chamber volume [m^3]
    V2_0: float = 0.1         # return chamber volume [m^3]
    KL_1: float = 8e-13       # working-cylinder leakage coeff
    KL_2: float = 14e-14      # return-cylinder leakage coeff
    CD: float = 0.63          # valve discharge coefficient
    RHO: float = 858.0        # oil density [kg/m^3]
    D: float = 0.006          # control-valve hole diameter [m]
    PS: float = 32e6          # supply pressure [Pa]
    PT: float = 101325.0      # return pressure [Pa]
    T1: float = 0.005         # servo-valve time constant [s]

    # Forging geometry (Generate Data/template_model.py:48-59)
    MU: float = 0.3           # friction-stress coefficient
    K: float = 1.115          # deformation strengthening indicator
    W0: float = 0.2           # original width [m]
    H0: float = 0.5           # original height [m]
    B0: float = 0.1           # original bite length [m]
    H1: float = 0.35          # deformed height [m]
    T: float = 900.0          # deformation temperature [K]

    # C45 steel material constants (Generate Data/template_model.py:88-92)
    M0: float = 1200e6
    M1: float = -0.0025
    M2: float = -0.0587
    M3: float = 0.1165
    M4: float = -0.0065

    # Numerical guards (no reference counterpart; keep tiny so the guarded
    # branch value is unchanged wherever the reference evaluates it).
    # Clip for y -> 0+ inside the gated Fd branch.  Must stay resolvable
    # against H0 in float32: with 1e-12 the f32 strain log(H0/(H0-y)) rounds
    # to exactly 0 and 0**M2 = inf poisons the (masked) branch with NaN.
    eps_y: float = 1e-6
    eps_q: float = 1e-2       # |dp| kink-smoothing threshold [Pa] in orifice sqrt

    @property
    def A1(self) -> float:
        return math.pi * self.D1 ** 2 / 4.0

    @property
    def A2(self) -> float:
        return math.pi * self.D2 ** 2 / 4.0

    @property
    def A_spread(self) -> float:
        """Tomlinson–Stringer spreading coefficient (template_model.py:56)."""
        r = self.B0 / self.W0
        return 0.14 + 0.36 * r - 0.054 * r ** 2


DEFAULT_PARAMS = PressParams()


def _smooth_relu(x, eps=_SMOOTH_EPS):
    """C1 softplus-like max(x, 0) ~= 0.5*(x + sqrt(x^2 + eps)).

    Mirrors ``Supervised Learning/template_model.py:107-108``.
    """
    return 0.5 * (x + jnp.sqrt(x * x + eps))


def effective_pressures(p1, p2, variant: Variant, params: PressParams = DEFAULT_PARAMS):
    """Pressure floor per model variant.

    raw    -> identity (Generate Data)
    smooth -> P_MIN + smooth_relu(p - P_MIN), P_MIN = 0
              (Supervised Learning/template_model.py:104-112)
    clamp  -> hard max(p, 0) (Model_NN/template_model.py:128-136)
    """
    if variant == "raw":
        return p1, p2
    if variant == "smooth":
        return _smooth_relu(p1), _smooth_relu(p2)
    if variant == "clamp":
        return jnp.maximum(p1, 0.0), jnp.maximum(p2, 0.0)
    raise ValueError(f"unknown variant: {variant!r}")


def forging_force(y, y_dot, params: PressParams = DEFAULT_PARAMS):
    """Deformation force ``Fd_article``.

    Replicates ``Generate Data/template_model.py:74-99``:
    gated to 0 unless (y > 0 and y_dot >= 0).  The gated branch is evaluated
    with clipped arguments (double-`where` guard) so forward values, `vmap`
    batches, and `jacfwd` tangents stay NaN-free at the y -> 0+ singularity
    of Kd ~ 1/y and of e**M2 (M2 < 0).
    """
    H0, W0, B0 = params.H0, params.W0, params.B0
    A = params.A_spread

    gate = jnp.logical_and(y > 0.0, y_dot >= 0.0)

    # Clip into the open region where every sub-expression is finite.
    y_s = jnp.clip(y, params.eps_y, H0 * (1.0 - 1e-9))
    yd_s = jnp.maximum(y_dot, 0.0)

    h1 = H0 - y_s
    w1 = W0 * (H0 / h1) ** A
    b1 = B0 * (1.0 + 0.67 * (H0 / h1 * W0 / w1 - 1.0))

    Kd = params.K * (1.0 + params.MU * b1 / (2.0 * y_s) + y_s / (4.0 * b1))
    Ad = w1 * b1

    # strain; > 0 on the clipped domain (floor keeps 0**M2 = inf out of the
    # masked branch even if the log rounds to 0 at low precision)
    e = jnp.maximum(jnp.log(H0 / (H0 - y_s)), 1e-12)
    e_dot = yd_s / (H0 - y_s)                  # strain rate; >= 0
    # e_dot**M3 has an infinite slope at 0; floor it inside the gated branch
    # (the factor exp(M4/e) already drives Fd -> 0 as y -> 0+).
    e_dot_s = jnp.maximum(e_dot, 1e-30)

    Fd = (
        Kd
        * Ad
        * params.M0
        * jnp.exp(params.M1 * params.T)
        * e ** params.M2
        * e_dot_s ** params.M3
        * jnp.exp(params.M4 / e)
    )
    return jnp.where(gate, Fd, 0.0)


def _orifice(dp, params: PressParams):
    """Signed orifice-flow kernel sqrt(2/RHO*|dp|)*sign(dp).

    Mirrors the four flow expressions at ``Generate Data/template_model.py:
    104-109``.  The sqrt has infinite slope at dp = 0 (reachable when a
    chamber hits PS or PT), which would poison `jacfwd` tangents in the
    solver; below ``eps_q`` [Pa] the magnitude is blended linearly so the
    derivative stays bounded.  Values are exact for |dp| > eps_q (1e-2 Pa),
    so CVODES golden parity is unaffected.
    """
    m = jnp.abs(dp)
    eps = params.eps_q
    s = 2.0 / params.RHO
    in_kink = m <= eps
    lin = s * m / jnp.sqrt(s * eps)
    mag = jnp.where(in_kink, lin, jnp.sqrt(s * jnp.where(in_kink, 1.0, m)))
    return mag * jnp.sign(dp)


def valve_flows(p1, p2, z, params: PressParams = DEFAULT_PARAMS):
    """Servo-valve flows (qvPB, qvAT).

    Work/return selection by spool sign, ``Generate Data/template_model.py:
    104-113``.
    """
    coeff = math.pi * params.D * params.CD
    qvPB_work = coeff * z * _orifice(params.PS - p1, params)
    qvAT_work = coeff * z * _orifice(p2 - params.PT, params)
    qvPB_return = coeff * z * _orifice(p1 - params.PT, params)
    qvAT_return = coeff * z * _orifice(params.PS - p2, params)
    work = z >= 0.0
    qvPB = jnp.where(work, qvPB_work, qvPB_return)
    qvAT = jnp.where(work, qvAT_work, qvAT_return)
    return qvPB, qvAT


def friction(y_dot, params: PressParams = DEFAULT_PARAMS):
    """Coulomb friction with linear deadband.

    Bug-compatible with ``Generate Data/template_model.py:126``: outside the
    deadband the force is +FT regardless of the sign of y_dot.
    """
    return jnp.where(jnp.abs(y_dot) <= 0.5, params.FT * y_dot / 0.5, params.FT)


def rhs(x, u, params: PressParams = DEFAULT_PARAMS, variant: Variant = "raw"):
    """Continuous-time plant RHS f(x, u) -> dx/dt, shape (..., 5).

    Replicates ``Generate Data/template_model.py:129-133`` (raw) and the
    variant substitutions of the other template_model copies.  ``variant``
    is static; `vmap`/`jacfwd`/`jit` compose freely.
    """
    y = x[..., 0]
    y_dot = x[..., 1]
    p1 = x[..., 2]
    p2 = x[..., 3]
    z = x[..., 4]
    u = jnp.asarray(u)

    p1e, p2e = effective_pressures(p1, p2, variant, params)

    Fd = forging_force(y, y_dot, params)
    Ft = friction(y_dot, params)
    qvPB, qvAT = valve_flows(p1e, p2e, z, params)

    V1 = params.V1_0 / 2.0 + params.A1 * y
    V2 = params.V2_0 / 2.0 - params.A2 * y

    dy = y_dot
    dy_dot = (
        3.0 * math.pi * params.D1 ** 2 * p1e / 4.0
        - math.pi * params.D2 ** 2 * p2e / 2.0
        - params.B * y_dot
        - Ft
        - Fd
    ) / params.M + params.G
    dp1 = params.KB / V1 * (qvPB / 3.0 - params.A1 * y_dot - params.KL_1 * p1e)
    dp2 = params.KB / V2 * (-qvAT / 2.0 + params.A2 * y_dot - params.KL_2 * p2e)
    dz = (-z + u) / params.T1

    return jnp.stack([dy, dy_dot, dp1, dp2, dz], axis=-1)


def measure(x, params: PressParams = DEFAULT_PARAMS, variant: Variant = "raw"):
    """Measurement map h(x).

    Identity for raw/clamp; the smooth variant measures the floored
    pressures (``Supervised Learning/template_model.py:148-153``).  The
    closed loop feeds h(x) + v back to the controller, matching do-mpc's
    ``simulator.make_step`` return value.
    """
    if variant == "smooth":
        p1e, p2e = effective_pressures(x[..., 2], x[..., 3], "smooth", params)
        return jnp.stack([x[..., 0], x[..., 1], p1e, p2e, x[..., 4]], axis=-1)
    return x


# Initial state used by every reference entry script
# (Generate Data/Main.py:68-74).
X0_REFERENCE = (0.0, 0.0, 2156275.6006012624, 2961363.827545376, 0.0)
