"""forging-control-tpu: TPU-native nonlinear MPC framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
marcowus/forging-control (data-driven MPC of an open-die forging press).
See README.md for the overview and docs/PARITY.md for the component map.
"""

__version__ = "0.1.0"

from . import physics, integrate, refgen, solver, loop, nn, eval, parallel, ops, utils  # noqa: F401
