from . import press, scaling  # noqa: F401
from .press import DEFAULT_PARAMS, PressParams, X0_REFERENCE, rhs, measure, forging_force  # noqa: F401
