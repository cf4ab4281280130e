from . import smallchol  # noqa: F401
from .smallchol import chol_solve, chol_solve_pallas  # noqa: F401
