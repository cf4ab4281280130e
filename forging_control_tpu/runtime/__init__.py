"""Native realtime runtime — ctypes bindings.

C++ closed-loop executor (policy + plant at the 1 ms period) built from
``runtime/src`` with g++ on first use.  See ``src/executor.cpp`` for the
design rationale; this module exposes:

* :func:`build` / :func:`load` — compile/load ``libforging_rt.so``
* :class:`RealtimeExecutor` — episode runner with per-step latency capture
* :func:`rhs` / :func:`rk4` — native physics hooks for parity tests
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_SRC_DIR = os.path.join(os.path.dirname(__file__), "src")
_LIB_PATH = os.path.join(os.path.dirname(__file__), "libforging_rt.so")

VARIANTS = {"raw": 0, "smooth": 1, "clamp": 2}

_lib: Optional[ctypes.CDLL] = None


def build(force: bool = False) -> str:
    """Compile the runtime shared library (g++ -O3)."""
    src = os.path.join(_SRC_DIR, "executor.cpp")
    if force or not os.path.exists(_LIB_PATH) or (
            os.path.getmtime(_LIB_PATH) < max(
                os.path.getmtime(os.path.join(_SRC_DIR, f))
                for f in os.listdir(_SRC_DIR))):
        subprocess.run(
            ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
             src, "-o", _LIB_PATH],
            check=True, capture_output=True)
    return _LIB_PATH


def load() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(build())
        D = ctypes.c_double
        P = ctypes.POINTER(D)
        I64P = ctypes.POINTER(ctypes.c_int64)
        lib.fc_create.restype = ctypes.c_void_p
        lib.fc_create.argtypes = [ctypes.c_int, D, ctypes.c_int]
        lib.fc_destroy.argtypes = [ctypes.c_void_p]
        lib.fc_reset.argtypes = [ctypes.c_void_p, P]
        lib.fc_load_policy.restype = ctypes.c_int
        lib.fc_load_policy.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            P, P, P, P, P, P, P, D, D, D, D]
        lib.fc_plant_step.argtypes = [ctypes.c_void_p, D, P, P]
        lib.fc_step.restype = D
        lib.fc_step.argtypes = [ctypes.c_void_p, D, P, P, I64P]
        lib.fc_run_episode.argtypes = [
            ctypes.c_void_p, P, P, ctypes.c_int, P, P, I64P]
        lib.fc_rhs.argtypes = [ctypes.c_int, P, D, P]
        lib.fc_rk4.argtypes = [ctypes.c_int, P, D, D, ctypes.c_int]
        lib.fc_mpc_create.restype = ctypes.c_void_p
        lib.fc_mpc_create.argtypes = [ctypes.c_int, D, ctypes.c_int,
                                      ctypes.c_int, ctypes.c_int, D]
        lib.fc_mpc_create_ex.restype = ctypes.c_void_p
        lib.fc_mpc_create_ex.argtypes = [ctypes.c_int, D, ctypes.c_int,
                                         ctypes.c_int, ctypes.c_int, D, D,
                                         D, D]
        lib.fc_mpc_destroy.argtypes = [ctypes.c_void_p]
        lib.fc_mpc_reset.argtypes = [ctypes.c_void_p]
        lib.fc_mpc_step.restype = D
        lib.fc_mpc_step.argtypes = [ctypes.c_void_p, P, D, D, P]
        lib.fc_mpc_run_episode.argtypes = [
            ctypes.c_void_p, P, P, ctypes.c_int, P, P, I64P]
        lib.fc_mpc_run_batch.restype = ctypes.c_int
        lib.fc_mpc_run_batch.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_int, P, P, ctypes.c_int,
            ctypes.c_int, P, P, ctypes.c_char_p]
        _lib = lib
    return _lib


def _dp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def rhs(x, u, variant="smooth") -> np.ndarray:
    lib = load()
    x = np.ascontiguousarray(x, np.float64)
    out = np.empty(5)
    lib.fc_rhs(VARIANTS[variant], _dp(x), float(u), _dp(out))
    return out


def rk4(x, u, dt=1e-3, substeps=4, variant="smooth") -> np.ndarray:
    lib = load()
    x = np.ascontiguousarray(np.array(x, np.float64, copy=True))
    lib.fc_rk4(VARIANTS[variant], _dp(x), float(u), float(dt), int(substeps))
    return x


class NativeMPC:
    """Native single-stream GN-SQP MPC (see src/sqp_solver.h).

    The real-time deployment path: warm-started solves at the 1 ms control
    period on a CPU — the budget the reference's IPOPT misses 3-15x.
    """

    def __init__(self, horizon=10, dt=1e-3, substeps=4, gn_iters=5,
                 al_iters=2, p_max=None, p_min=0.0, mu0=1e2, mu_factor=10.0,
                 preset=None):
        """preset="ipopt_compat" applies the recorded-IPOPT parity settings
        (p_min=-5e6, mu0=1, mu_factor=1 — sqp.MPCConfig.ipopt_compat)."""
        if preset == "ipopt_compat":
            p_min, mu0, mu_factor = -5e6, 1.0, 1.0
        elif preset is not None:
            raise ValueError(f"unknown preset {preset!r}")
        self._lib = load()
        self._h = self._lib.fc_mpc_create_ex(
            horizon, dt, substeps, gn_iters, al_iters,
            -1.0 if p_max is None else float(p_max), float(p_min),
            float(mu0), float(mu_factor))
        if not self._h:
            raise ValueError(
                f"fc_mpc_create failed (horizon must be 1..25, got {horizon})")

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.fc_mpc_destroy(self._h)
            self._h = None

    def reset(self):
        self._lib.fc_mpc_reset(self._h)

    def step(self, x_meas, ref, u_prev):
        """One warm-started solve; returns (u0, stats dict)."""
        x = np.ascontiguousarray(x_meas, np.float64)
        stats = np.zeros(4)
        u = self._lib.fc_mpc_step(self._h, _dp(x), float(ref),
                                  float(u_prev), _dp(stats))
        return u, {"iters": int(stats[0]), "obj": stats[1],
                   "inf_pr": stats[2], "inf_du": stats[3]}

    def run_episode(self, x0, refs):
        """Native closed loop (solver + RK4 plant).  Returns
        (xs (T,5) measurements, us (T,), solve latency ns (T,))."""
        refs = np.ascontiguousarray(refs, np.float64)
        x0 = np.ascontiguousarray(x0, np.float64)
        T = len(refs)
        xs = np.empty((T, 5))
        us = np.empty(T)
        lat = np.empty(T, np.int64)
        self._lib.fc_mpc_run_episode(
            self._h, _dp(x0), _dp(refs), T, _dp(xs), _dp(us),
            lat.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        return xs, us, lat


def mpc_generate_batch(x0, refs, horizon=10, gn_iters=5, al_iters=2,
                       store_path=None):
    """OpenMP-parallel native MPC dataset generation (one solver/thread).

    Args:
      x0: (5,) initial state shared by all trajectories.
      refs: (n_traj, T) reference streams.
      store_path: optional trajectory-store file (see TrajStore).

    Returns (xs (n_traj, T, 5) measurements, us (n_traj, T)).
    """
    lib = load()
    refs = np.ascontiguousarray(refs, np.float64)
    x0 = np.ascontiguousarray(x0, np.float64)
    n, T = refs.shape
    xs = np.empty((n, T, 5))
    us = np.empty((n, T))
    done = lib.fc_mpc_run_batch(
        horizon, gn_iters, al_iters, _dp(x0), _dp(refs), n, T, _dp(xs),
        _dp(us), store_path.encode() if store_path else None)
    if done != n:
        raise RuntimeError(f"batch generation failed: {done}/{n}")
    return xs, us


class TrajStore:
    """Zero-copy reader for the native trajectory store (trajstore.h)."""

    HEADER = 4 + 4 * 4
    NAMELEN = 16

    def __init__(self, path):
        self.path = path
        with open(path, "rb") as f:
            magic = f.read(4)
            if magic != b"FCTS":
                raise ValueError(f"bad magic {magic!r}")
            import struct
            ver, n, t, c = struct.unpack("<4I", f.read(16))
            if ver != 1:
                raise ValueError(f"unsupported version {ver}")
            self.n_traj, self.t_steps, self.n_cols = n, t, c
            self.columns = []
            for _ in range(c):
                raw = f.read(self.NAMELEN)
                self.columns.append(raw.split(b"\0", 1)[0].decode())
        offset = self.HEADER + self.n_cols * self.NAMELEN
        self.data = np.memmap(path, dtype=np.float64, mode="r",
                              offset=offset,
                              shape=(self.n_traj, self.t_steps, self.n_cols))

    def column(self, name):
        return self.data[..., self.columns.index(name)]

    def to_results_dict(self):
        """Reference result-dict schema (Generate Data/Functions.py:381-390)."""
        return {c: np.asarray(self.column(c)) for c in self.columns}


class RealtimeExecutor:
    """Native closed-loop runner for a trained FNN policy."""

    def __init__(self, variant="smooth", dt=1e-3, substeps=4):
        self._lib = load()
        self._h = self._lib.fc_create(VARIANTS[variant], dt, substeps)
        if not self._h:
            raise MemoryError("fc_create failed")

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.fc_destroy(self._h)
            self._h = None

    def load_fnn_policy(self, params, in_scaler, out_scaler, width_dim=1,
                        lb=None, ub=None):
        """Load JAX FNN params + scalers (nn/fnn.py layout).  lb/ub None
        means no explicit saturation (hardtanh x out-scale is the only
        bound, matching the reference — see nn/fnn.make_policy)."""
        lb = -1e30 if lb is None else lb
        ub = 1e30 if ub is None else ub
        w_in = np.ascontiguousarray(params["w_in"], np.float64)
        b_in = np.ascontiguousarray(params["b_in"], np.float64)
        w_int = np.ascontiguousarray(params["w_int"], np.float64)
        b_int = np.ascontiguousarray(params["b_int"], np.float64)
        w_out = np.ascontiguousarray(params["w_out"], np.float64).ravel()
        hid = w_in.shape[1]
        in_shift = np.ascontiguousarray(
            np.broadcast_to(np.asarray(in_scaler.shift, np.float64), (3,)))
        in_scale = np.ascontiguousarray(
            np.broadcast_to(np.asarray(in_scaler.scale, np.float64), (3,)))
        out_shift = float(np.asarray(out_scaler.shift).ravel()[0])
        out_scale = float(np.asarray(out_scaler.scale).ravel()[0])
        rc = self._lib.fc_load_policy(
            self._h, 3, hid, width_dim, _dp(w_in), _dp(b_in), _dp(w_int),
            _dp(b_int), _dp(w_out), _dp(in_shift), _dp(in_scale),
            out_shift, out_scale, lb, ub)
        if rc != 0:
            raise ValueError(f"fc_load_policy failed: {rc}")

    def run_episode(self, x0, refs):
        """Run T closed-loop steps natively.

        Returns (xs (T,5) measurements, us (T,), latency_ns (T,))."""
        refs = np.ascontiguousarray(refs, np.float64)
        x0 = np.ascontiguousarray(x0, np.float64)
        T = len(refs)
        xs = np.empty((T, 5))
        us = np.empty(T)
        lat = np.empty(T, np.int64)
        self._lib.fc_run_episode(
            self._h, _dp(x0), _dp(refs), T, _dp(xs), _dp(us),
            lat.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        return xs, us, lat
