"""Wide-panel CI evaluation (eval/wide_panel.py).

Pins the statistical machinery the round-4 headline table rests on:
panel determinism, the paired-noise property (two controllers see the
identical noise realizations for one spec), and the verdict logic.
"""

import jax
import jax.numpy as jnp
import numpy as np

from forging_control_tpu.eval import wide_panel as wp
from forging_control_tpu.loop import closed_loop as cl


SMALL = wp.PanelSpec(n_streams=4, n_noise_reps=2, t_traj=12,
                     process_std=(1e-2, 1e-1, 1e5, 1e5, 1e-1))


def _policy(gain):
    # Tiny proportional policy: enough to track loosely, cheap to roll.
    return cl.FunctionController(
        lambda x, ref, u_prev: jnp.clip(gain * (ref - x[1]), -0.2, 0.2))


def test_panel_shapes_and_determinism():
    r1 = wp.run_controller(SMALL, _policy(0.05))
    r2 = wp.run_controller(SMALL, _policy(0.05))
    assert r1.mae.shape == (2, 4)
    np.testing.assert_array_equal(r1.mae, r2.mae)
    s = r1.summarize()
    assert s["n"] == 8
    assert s["ci95"] >= 0 and np.isfinite(s["mean"])
    # pooled MAE == mean of per-trajectory MAEs (equal lengths)
    assert abs(s["mean"] - r1.mae.mean()) < 1e-12


def test_protocol_streams_prepended():
    spec = wp.PanelSpec(n_streams=3, n_noise_reps=1, t_traj=10,
                        include_protocol_streams=True)
    refs = wp.panel_refs(spec)
    assert refs.shape == (5, 10)
    from forging_control_tpu.refgen import streams
    exact = streams.reference_table(2, spec.ref_variant, 10)
    np.testing.assert_allclose(np.asarray(refs[:2]), exact, rtol=1e-6)


def test_paired_noise_realizations():
    """Two different controllers must face identical disturbance draws."""
    spec = SMALL
    telems = {}
    for g in (0.02, 0.1):
        refs_s = wp.panel_refs(spec)
        refs = jnp.tile(refs_s, (spec.n_noise_reps, 1))
        x0 = jnp.tile(jnp.asarray(cl.press.X0_REFERENCE, jnp.float32),
                      (refs.shape[0], 1))
        loop_cfg = cl.LoopConfig(t_steps=spec.t_traj, variant=spec.variant,
                                 process_std=spec.process_std)
        _, telem = cl.run_batch(loop_cfg, _policy(g), x0, refs,
                                jax.random.PRNGKey(spec.noise_key))
        telems[g] = np.asarray(telem.w)
    np.testing.assert_array_equal(telems[0.02], telems[0.1])


def test_compare_detects_separation_and_tie():
    good = wp.run_controller(SMALL, _policy(0.1))
    bad = wp.run_controller(SMALL, _policy(0.005))
    c = wp.compare(good, bad)
    assert c["verdict"] == "a_beats_b" and c["mean_diff"] < 0
    self_c = wp.compare(good, wp.run_controller(SMALL, _policy(0.1)))
    assert self_c["verdict"] == "tie" and self_c["mean_diff"] == 0.0


def test_verdict_vs_scalar():
    res = wp.run_controller(SMALL, _policy(0.1))
    s = res.summarize()
    assert wp.verdict_vs_scalar(res, s["mean"] + 10 * s["ci95"] + 1e-9)[
        "verdict"] == "beats"
    assert wp.verdict_vs_scalar(res, s["mean"] - 10 * s["ci95"] - 1e-9)[
        "verdict"] == "loses"
    assert wp.verdict_vs_scalar(res, s["mean"])["verdict"] == "tie"


def test_compare_requires_same_spec():
    import pytest
    a = wp.run_controller(SMALL, _policy(0.1))
    other = wp.PanelSpec(n_streams=4, n_noise_reps=2, t_traj=12,
                         process_std=(0.0,) * 5)
    b = wp.run_controller(other, _policy(0.1))
    with pytest.raises(ValueError):
        wp.compare(a, b)
