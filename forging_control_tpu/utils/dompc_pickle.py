"""Load the reference's pickled do-mpc result files WITHOUT do-mpc.

The reference persists closed-loop runs via ``do_mpc.data.save_results``
(pickled dicts of ``do_mpc.data.Data`` objects — ``Supervised
Learning/Main.py:408``, ``Generate Data/Main.py:92-94``) and ships several
in its results directories.  Unpickling them normally requires do-mpc,
CasADi and their exact versions; this loader instead substitutes a blank
class for every unimportable type and extracts the plain-numpy telemetry
arrays, so users migrating from the reference can read their existing
``Data/*.pkl`` datasets and ``results/*.pkl`` recordings directly.

Array semantics (do-mpc Data, verified against the shipped recordings):
``_time`` (T,1) seconds; ``_x`` (T,5) = [y, y_dot, p1, p2, z] in declaration
order (``Generate Data/template_model.py:65-69``); ``_u`` (T,1) servo
tension; ``_tvp`` (T,1) speed reference; ``_aux`` (T,2) = [default,
Fd_article] (do-mpc prepends a 'default' aux expression; ``Fd_article`` is
set at ``template_model.py:123``).
"""

from __future__ import annotations

import pickle

import numpy as np

_FIELDS = ("_time", "_x", "_y", "_u", "_z", "_tvp", "_p", "_aux")


class _Blank:
    def __init__(self, *args, **kwargs):
        pass


class _StubUnpickler(pickle.Unpickler):
    """Resolve importable classes normally; stub everything else."""

    def find_class(self, module, name):
        try:
            return super().find_class(module, name)
        except Exception:
            return type(name, (_Blank,), {"__module__": module})


def load(path: str) -> dict:
    """{key: {field: np.ndarray}} for each do-mpc Data object in the file.

    Keys are the reference's save names ('mpc', 'simulator', ...); fields
    are the recorded telemetry arrays (_time/_x/_u/_tvp/_aux/...).
    """
    with open(path, "rb") as f:
        raw = _StubUnpickler(f).load()
    out = {}
    for key, data in raw.items():
        rec = {}
        for field in _FIELDS:
            arr = getattr(data, field, None)
            if isinstance(arr, np.ndarray) and arr.size:
                rec[field] = np.asarray(arr)
        out[key] = rec
    return out


def to_results(rec: dict, t_traj: int = 300) -> dict:
    """Convert one Data record to this framework's results-dict schema
    (``pipelines/generate_data.run``): y/y_dot/p1/p2/z/ref/u/F_d shaped
    (n_traj, t_traj).  The reference's files hold n_traj back-to-back
    trajectories of t_traj steps (``Generate Data/Main.py:45-46``)."""
    x = rec["_x"]
    total = x.shape[0]
    if total % t_traj:
        raise ValueError(f"{total} rows not divisible by t_traj={t_traj}")
    n_traj = total // t_traj

    def col(a, j=0):
        return a[:, j].reshape(n_traj, t_traj).astype(np.float64)

    results = {
        "y": col(x, 0), "y_dot": col(x, 1), "p1": col(x, 2),
        "p2": col(x, 3), "z": col(x, 4),
        "ref": col(rec["_tvp"]),
        "u": col(rec["_u"]),
    }
    if "_aux" in rec and rec["_aux"].shape[1]:
        results["F_d"] = col(rec["_aux"], rec["_aux"].shape[1] - 1)
    return results
