"""Dataset generation pipeline.

Replaces ``Generate Data/Main.py``: run the MPC in closed loop over
``n_traj`` trajectories with process noise and record the full telemetry.
Where the reference performs 24,000 *serial* IPOPT solves (one Python ->
C++ round trip each), this runs the entire batch as one XLA program —
every trajectory in parallel, every step fused.

Datasets are stored as ``.npz`` with the reference result-dict schema
(y/y_dot/p1/p2/z/ref/u/F_d/w, ``Generate Data/Functions.py:381-390``)
plus solver diagnostics.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..eval import metrics
from ..loop import closed_loop as cl
from ..refgen import streams
from ..solver import sqp
from .config import GenerateConfig


def run(cfg: GenerateConfig = GenerateConfig(), *, seed: int = 0,
        exact_reference_streams: bool = True, dtype=jnp.float32):
    """Generate a dataset; returns (telemetry, results_dict).

    exact_reference_streams=True uses the CPython-parity seeded streams
    (replayable against the reference); False draws counter-based
    jax.random streams for arbitrary scale.
    """
    make = {"default": sqp.MPCConfig, "fast": sqp.MPCConfig.fast,
            "ipopt_compat": sqp.MPCConfig.ipopt_compat}[cfg.solver_preset]
    mpc_cfg = make(
        horizon=cfg.horizon,
        variant="raw" if cfg.variant_model == "raw" else "smooth",
        record_trace=cfg.record_trace)
    loop_cfg = cl.LoopConfig(
        t_steps=cfg.t_traj, variant=mpc_cfg.variant,
        process_std=cfg.process_std if cfg.flags.enable_noise else (0.0,) * 5,
        meas_std=cfg.meas_std)
    ctrl = cl.MPCController(mpc_cfg, backend=cfg.backend)

    key = jax.random.PRNGKey(seed)
    if exact_reference_streams:
        refs = jnp.asarray(
            streams.reference_table(cfg.n_traj, cfg.ref_variant, cfg.t_traj),
            dtype)
    else:
        key, sub = jax.random.split(key)
        refs = streams.sample_references(sub, cfg.n_traj, cfg.ref_variant,
                                         cfg.t_traj, dtype)

    x0 = jnp.tile(jnp.asarray(cl.press.X0_REFERENCE, dtype), (cfg.n_traj, 1))
    run_fn = jax.jit(lambda x, r, k: cl.run_batch(loop_cfg, ctrl, x, r, k))
    _, telem = run_fn(x0, refs, key)

    results = {
        "y": np.asarray(telem.x[..., 0]),
        "y_dot": np.asarray(telem.x[..., 1]),
        "p1": np.asarray(telem.x[..., 2]),
        "p2": np.asarray(telem.x[..., 3]),
        "z": np.asarray(telem.x[..., 4]),
        "ref": np.asarray(telem.ref),
        "u": np.asarray(telem.u),
        "F_d": np.asarray(telem.Fd),
        "w": np.asarray(telem.w),
        "iter": np.asarray(telem.diag.iters),
        "obj": np.asarray(telem.diag.obj),
        "inf_pr": np.asarray(telem.diag.inf_pr),
        "inf_du": np.asarray(telem.diag.inf_du),
    }
    return telem, results


def dataset_path(root: str, horizon: int) -> str:
    """forging_mult_traj_process_noise_N_{H} naming (Generate Data/Main.py:97)."""
    return os.path.join(root, f"forging_mult_traj_process_noise_N_{horizon}.npz")


def save(results: dict, path: str) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(path, **results)


def load(path: str) -> dict:
    """Load a dataset: our ``.npz`` or a reference do-mpc ``.pkl``.

    ``.pkl`` paths are the reference's pickled result dicts
    (``Data/forging_mult_traj_*.pkl``, ``README.md:85-90``) — read without
    do-mpc via utils/dompc_pickle and converted to the same schema, so
    existing reference datasets drop straight into the training pipelines.
    """
    if path.endswith(".pkl"):
        from ..utils import dompc_pickle
        recs = dompc_pickle.load(path)
        key = "mpc" if "mpc" in recs else next(iter(recs))
        return dompc_pickle.to_results(recs[key])
    with np.load(path) as f:
        return {k: f[k] for k in f.files}


def summarize(results: dict) -> dict:
    """Tracking metrics + solver health, the Main.py:104-115 log block."""
    ref = results["ref"].ravel()
    y_dot = results["y_dot"].ravel()
    out = {k: float(v) for k, v in
           metrics.tracking_metrics(jnp.asarray(ref), jnp.asarray(y_dot)).items()}
    out["Command"] = float(np.abs(results["u"]).mean())
    out["iters_mean"] = float(results["iter"].mean())
    out["inf_pr_max"] = float(results["inf_pr"].max())
    return out
