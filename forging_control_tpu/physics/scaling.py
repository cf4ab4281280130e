"""State/input scaling used inside the solver.

The reference MPC formulates its NLP in scaled variables
(``Generate Data/template_mpc.py:32-37``):

    y: 0.1,  y_dot: 0.1,  p1: 1e7,  p2: 1e7,  z: 0.01,  u: 0.01

Working in these units keeps every solver quantity O(1), which is what makes
float32 on TPU sufficient where the reference leaned on float64 IPOPT.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

X_SCALE = np.array([0.1, 0.1, 1e7, 1e7, 0.01])
U_SCALE = 0.01

# Feasibility-recovery NLP scaling (Supervised Learning/Main.py:541-548).
FEAS_U_SCALE = 0.2
FEAS_X_SCALE = np.array([0.02, 0.4, 32e6, 32e6, 0.15])


def scale_x(x):
    return x / jnp.asarray(X_SCALE, dtype=jnp.result_type(x))


def unscale_x(xs):
    return xs * jnp.asarray(X_SCALE, dtype=jnp.result_type(xs))


def scale_u(u):
    return u / U_SCALE


def unscale_u(us):
    return us * U_SCALE
