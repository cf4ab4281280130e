"""Wide-panel closed-loop evaluation with confidence intervals.

The reference's headline closed-loop comparisons rest on a 2-trajectory x
300-step panel (``Supervised Learning/Main.py:610-646``: N_traj=2 seeded
reference streams), and our own diagnosis measured the per-realization
eval spread on that protocol at roughly +-0.0005 MAE
(scripts/unsup_gap_diag.py) — larger than several of the margins the
headline table used to decide "beats"/"loses".  This module puts every
such comparison on statistical footing: it rolls a controller over a
**wide panel** of fresh reference streams x independent noise
realizations in ONE batched closed-loop program (seconds on the fused
engine — the reference would need hours of serial IPOPT for the same
panel) and reports mean +- 95% CI over per-trajectory MAEs.

Because the loop engine draws process/measurement noise from a
per-trajectory PRNG chain that does not depend on the control sequence
(loop/closed_loop.py:188-190), two controllers evaluated with the same
:class:`PanelSpec` face **identical plateau streams and identical noise
realizations**, so :func:`compare` is a genuinely paired design: the CI
on the per-trajectory MAE *difference* is far tighter than the CI on
either mean.

Per-trajectory MAE is the replication unit.  The panel-wide pooled MAE
(the reference's metric, mean over all raveled steps) equals the mean of
per-trajectory MAEs exactly (equal trajectory lengths), so the reported
``mean`` is directly comparable with reference-style table rows.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..loop import closed_loop as cl
from ..physics import press
from ..refgen import streams

# Dataset-generation process noise (Generate Data/Main.py:49-58) — the
# noisy eval rows' plant disturbance.
PROCESS_STD = (5e-1, 2e0, 5e7, 5e7, 2e0)


@dataclasses.dataclass(frozen=True)
class PanelSpec:
    """A reproducible evaluation panel.

    ``n_streams`` fresh plateau streams are drawn from the reference
    variant's plateau distribution (counter-based, refgen.streams.
    sample_references) and each is rolled under ``n_noise_reps``
    independent process-noise realizations: the batch is
    ``n_streams * n_noise_reps`` trajectories in one fused program.
    """

    n_streams: int = 64
    n_noise_reps: int = 4
    t_traj: int = 300
    ref_variant: str = "supervised"
    variant: str = "smooth"
    process_std: tuple = PROCESS_STD
    stream_key: int = 7       # PRNG key for the plateau draws
    noise_key: int = 101      # base PRNG key for the noise chains
    include_protocol_streams: bool = False  # prepend the 2 CPython streams

    @property
    def n_traj(self) -> int:
        base = self.n_streams + (2 if self.include_protocol_streams else 0)
        return base * self.n_noise_reps


def panel_refs(spec: PanelSpec, dtype=jnp.float32):
    """(S, T) plateau streams for the panel (before noise replication)."""
    fresh = streams.sample_references(
        jax.random.PRNGKey(spec.stream_key), spec.n_streams,
        spec.ref_variant, spec.t_traj, dtype=dtype)
    if spec.include_protocol_streams:
        exact = jnp.asarray(streams.reference_table(
            2, spec.ref_variant, spec.t_traj), dtype)
        fresh = jnp.concatenate([exact, fresh], axis=0)
    return fresh


@dataclasses.dataclass
class PanelResult:
    """Per-trajectory tracking errors over the panel.

    ``mae`` has shape (n_noise_reps, S): replication r of stream s used
    the (r * S + s)-th subkey of split(noise_key, R * S) — identical
    across controllers for a fixed spec."""

    spec: PanelSpec
    mae: np.ndarray          # (R, S) per-trajectory MAE
    rmse: np.ndarray         # (R, S)
    command: np.ndarray      # (R, S) mean |u|

    def summarize(self) -> dict:
        x = self.mae.ravel()
        n = x.size
        sem = float(x.std(ddof=1) / np.sqrt(n)) if n > 1 else 0.0
        return {
            "mean": float(x.mean()),
            "std": float(x.std(ddof=1)) if n > 1 else 0.0,
            "sem": sem,
            "ci95": 1.96 * sem,
            "n": int(n),
            "rmse_mean": float(self.rmse.mean()),
            "command_mean": float(self.command.mean()),
        }


def run_controller(spec: PanelSpec, controller, *, dtype=jnp.float32,
                   run_fn=None) -> PanelResult:
    """Roll ``controller`` over the whole panel in one batched program.

    ``run_fn`` overrides the loop engine (signature of
    ``cl.run_batch(loop_cfg, controller, x0, refs, key)`` already bound
    to a loop config) — used by tests to substitute tiny engines.
    """
    refs_s = panel_refs(spec, dtype)
    S = refs_s.shape[0]
    R = spec.n_noise_reps
    refs = jnp.tile(refs_s, (R, 1))                       # (R*S, T)
    x0 = jnp.tile(jnp.asarray(press.X0_REFERENCE, dtype), (R * S, 1))

    loop_cfg = cl.LoopConfig(t_steps=spec.t_traj, variant=spec.variant,
                             process_std=spec.process_std)
    if run_fn is None:
        run_fn = jax.jit(
            lambda x, r, k: cl.run_batch(loop_cfg, controller, x, r, k))
    _, telem = run_fn(x0, refs, jax.random.PRNGKey(spec.noise_key))

    ref = np.asarray(telem.ref)                            # (R*S, T)
    y_dot = np.asarray(telem.x[..., 1])
    u = np.asarray(telem.u)
    mae = np.abs(ref - y_dot).mean(axis=1).reshape(R, S)
    rmse = np.sqrt(((ref - y_dot) ** 2).mean(axis=1)).reshape(R, S)
    command = np.abs(u).mean(axis=1).reshape(R, S)
    return PanelResult(spec=spec, mae=mae, rmse=rmse, command=command)


def compare(a: PanelResult, b: PanelResult) -> dict:
    """Paired comparison of two controllers run on the SAME spec.

    Returns the mean per-trajectory MAE difference (a - b) with its 95%
    CI and a verdict: "a_beats_b" / "b_beats_a" when the CI excludes
    zero, else "tie".  Negative mean_diff favors ``a``.
    """
    if a.spec != b.spec:
        raise ValueError("paired comparison requires identical PanelSpecs")
    d = (a.mae - b.mae).ravel()
    n = d.size
    sem = float(d.std(ddof=1) / np.sqrt(n)) if n > 1 else 0.0
    mean = float(d.mean())
    ci = 1.96 * sem
    if mean + ci < 0:
        verdict = "a_beats_b"
    elif mean - ci > 0:
        verdict = "b_beats_a"
    else:
        verdict = "tie"
    return {"mean_diff": mean, "sem": sem, "ci95": ci, "n": int(n),
            "win_rate_a": float((d < 0).mean()), "verdict": verdict}


def verdict_vs_scalar(result: PanelResult, recorded: float) -> dict:
    """Judge a panel mean against a recorded scalar baseline.

    The recorded reference numbers are single draws (one noise
    realization on 2 streams), so this is NOT a paired test — the panel
    CI only bounds *our* estimator's uncertainty.  A "beats" verdict
    therefore additionally requires the margin to exceed the panel's
    own 95% CI, the same bar the round-3 verdict asked for."""
    s = result.summarize()
    margin = s["mean"] - recorded    # negative = we are better
    if margin + s["ci95"] < 0:
        verdict = "beats"
    elif margin - s["ci95"] > 0:
        verdict = "loses"
    else:
        verdict = "tie"
    return {**s, "recorded": recorded, "margin": float(margin),
            "verdict": verdict}
