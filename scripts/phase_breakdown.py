"""Write the per-phase solver cost-breakdown artifact.

The reference records IPOPT's per-phase wall timers
``t_wall_nlp_{f,g,grad,grad_f,jac_g}`` in its feasibility path
(``Supervised Learning/Functions.py:848-853``).  On TPU the solve is one
fused XLA program, so the equivalent consumable is produced by compiling
and timing each NLP phase in isolation (amortized over a scenario batch)
plus XLA's static FLOP/byte cost model — see
``utils.profiling.solver_phase_breakdown``.

Usage: python scripts/phase_breakdown.py [N] [batch] [out.json]
"""

import json
import sys

from forging_control_tpu.solver import sqp
from forging_control_tpu.utils import profiling


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    out_path = sys.argv[3] if len(sys.argv) > 3 else "phase_breakdown.json"

    rec = profiling.solver_phase_breakdown(sqp.MPCConfig(horizon=N), batch=B)
    with open(out_path, "w") as f:
        json.dump(rec, f, indent=2)
    print(json.dumps(rec, indent=2))


if __name__ == "__main__":
    main()
