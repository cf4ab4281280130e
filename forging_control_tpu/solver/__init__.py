from . import feasibility, riccati, sqp  # noqa: F401
from .sqp import Diagnostics, MPCConfig, SolverState  # noqa: F401
