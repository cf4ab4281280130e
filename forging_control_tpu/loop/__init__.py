from . import closed_loop  # noqa: F401
from .closed_loop import (FunctionController, LoopConfig, MPCController,  # noqa: F401
                          Telemetry, run_batch, run_trajectory)
