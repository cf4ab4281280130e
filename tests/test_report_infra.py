"""Tests for reporting, plotting, checkpointing, logging, CLI."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from forging_control_tpu.eval import report
from forging_control_tpu.utils import checkpoint
from forging_control_tpu.utils.timer import Timer


def _tiny_telem():
    from forging_control_tpu.loop import closed_loop as cl
    from forging_control_tpu.solver import sqp
    ctrl = cl.MPCController(sqp.MPCConfig(horizon=5, variant="smooth",
                                          gn_iters=2, al_iters=1))
    loop_cfg = cl.LoopConfig(t_steps=6, variant="smooth")
    refs = jnp.full((2, 6), 0.4)
    x0 = jnp.tile(cl.default_x0(), (2, 1))
    _, telem = jax.jit(lambda x, r, k: cl.run_batch(loop_cfg, ctrl, x, r, k))(
        x0, refs, jax.random.PRNGKey(0))
    return telem


def test_show_tabulate_tsv(tmp_path):
    d = {"MAE": 0.0452, "RMSE": 0.15, "R2": 0.906}
    f = str(tmp_path / "Tables/Normal/MPC_results_N_10.csv")
    text = report.show_tabulate(d, f, echo=False)
    assert "MAE" in text
    lines = open(f).read().splitlines()
    assert lines[0].split("\t") == ["MAE", "RMSE", "R2"]
    assert float(lines[1].split("\t")[0]) == 0.0452


def test_show_tabulate_label_column(tmp_path):
    """Non-numeric label columns (e.g. Time_impl: native_cpp_sqp in the
    chains' MPC latency rows) pass through the TSV and console renderers."""
    d = {"Median_time": 0.21, "Time_impl": "native_cpp_sqp"}
    f = str(tmp_path / "Tables/Normal/MPC_results_N_10.csv")
    text = report.show_tabulate(d, f, echo=False)
    assert "native_cpp_sqp" in text
    lines = open(f).read().splitlines()
    assert lines[1].split("\t") == ["0.21", "native_cpp_sqp"]


def test_dump_dataframe_roundtrip(tmp_path):
    telem = _tiny_telem()
    path = str(tmp_path / "results/MPC_dataframe.txt")
    report.dump_dataframe(path, telem)
    rows = report.load_dataframe(path)
    assert rows.shape == (12, 8)
    header = open(path).readline().strip().split("\t")
    assert header == list(report.DATAFRAME_COLUMNS)
    # per-trajectory time restarts at 0 (reference format)
    assert rows[0, 0] == 0.0 and rows[6, 0] == 0.0
    np.testing.assert_allclose(rows[:6, 7], np.asarray(telem.u)[0], atol=1e-6)


def test_plots_render(tmp_path):
    from forging_control_tpu.eval import plots
    telem = _tiny_telem()
    p1 = str(tmp_path / "Images/closed_loop.png")
    p2 = str(tmp_path / "Images/solver.png")
    plots.plot_closed_loop(telem, 0, p1)
    plots.plot_solver_diagnostics(telem, 0, p2)
    assert os.path.getsize(p1) > 1000 and os.path.getsize(p2) > 1000


def test_checkpoint_roundtrip(tmp_path):
    from forging_control_tpu.nn import fnn, scalers
    params, _ = fnn.init(jax.random.PRNGKey(0))
    sc = scalers.Scaler(jnp.zeros(3), jnp.ones(3) * 2)
    tree = {"params": params, "scaler": sc}
    path = str(tmp_path / "ckpt.npz")
    checkpoint.save(path, tree, meta={"horizon": 10})
    like = {"params": jax.tree.map(jnp.zeros_like, params),
            "scaler": scalers.Scaler(jnp.zeros(3), jnp.zeros(3))}
    loaded = checkpoint.load(path, like)
    np.testing.assert_allclose(np.array(loaded["params"]["w_in"]),
                               np.array(params["w_in"]))
    np.testing.assert_allclose(np.array(loaded["scaler"].scale), 2.0)
    assert checkpoint.load_meta(path)["horizon"] == 10


def test_checkpoint_orbax_roundtrip(tmp_path):
    from forging_control_tpu.nn import fnn, scalers
    params, _ = fnn.init(jax.random.PRNGKey(0))
    sc = scalers.Scaler(jnp.zeros(3), jnp.ones(3) * 2)
    tree = {"params": params, "scaler": sc}
    path = str(tmp_path / "ckpt_orbax")
    checkpoint.save_orbax(path, tree, meta={"horizon": 10})
    like = {"params": jax.tree.map(jnp.zeros_like, params),
            "scaler": scalers.Scaler(jnp.zeros(3), jnp.zeros(3))}
    loaded = checkpoint.load_orbax(path, like)
    np.testing.assert_allclose(np.array(loaded["params"]["w_in"]),
                               np.array(params["w_in"]))
    np.testing.assert_allclose(np.array(loaded["scaler"].scale), 2.0)
    assert checkpoint.load_meta(path)["horizon"] == 10


def test_timer_stats():
    t = Timer()
    for _ in range(5):
        t.tic()
        t.toc()
    s = t.stats_ms()
    assert set(s) == {"Mean_time", "Std_time", "Median_time",
                      "25_perc", "75_perc"}


def test_cli_generate(tmp_path, capsys):
    from forging_control_tpu import cli
    cli.main(["generate", "--n-traj", "2", "--t-traj", "8", "--horizon", "5",
              "--out", str(tmp_path)])
    files = os.listdir(tmp_path)
    assert "forging_mult_traj_process_noise_N_5.npz" in files


def test_html_dashboard(tmp_path):
    """Self-contained interactive dashboard: valid HTML, embeds all
    trajectories' data, includes slider + hover machinery, zero deps."""
    from forging_control_tpu.eval import html_dash
    telem = _tiny_telem()
    p = str(tmp_path / "Images/dashboard.html")
    html_dash.dashboard_from_telemetry(telem, p, title="test run")
    text = open(p).read()
    assert text.startswith("<!DOCTYPE html>")
    assert "test run" in text and "slider" in text and "mousemove" in text
    data = json.loads(text.split("const DATA = ", 1)[1].split(";\n", 1)[0])
    assert len(data) == 2                       # one entry per trajectory
    assert data[0][0]["title"] == "speed tracking"
    ref_series = data[0][0]["series"][0]
    np.testing.assert_allclose(ref_series["y"], np.asarray(telem.ref)[0],
                               atol=1e-6)

    p2 = str(tmp_path / "Images/solver.html")
    html_dash.solver_dashboard_from_telemetry(telem, p2)
    assert "iterations" in open(p2).read()


def test_notify(tmp_path):
    """Completion notification (notifypy analog, Generate Data/Main.py:267-270):
    logs the event and appends a JSON line to the events file."""
    from forging_control_tpu.utils import notify
    events = str(tmp_path / "events.jsonl")
    ev = notify.notify("Experiment over", "closed loop done",
                       events_file=events)
    assert ev["title"] == "Experiment over"
    rec = json.loads(open(events).read().strip())
    assert rec["message"] == "closed loop done" and "ts" in rec


def test_solver_dashboard_with_trace(tmp_path):
    """record_trace=True telemetry adds per-iteration convergence panels
    (history the reference's optimizer-diagnostics page discards — it only
    keeps the last iteration per step, Generate Data/Functions.py:366-372)."""
    import jax
    import jax.numpy as jnp

    from forging_control_tpu.eval import html_dash
    from forging_control_tpu.loop import closed_loop as cl
    from forging_control_tpu.solver import sqp

    cfg = sqp.MPCConfig(horizon=5, variant="smooth", gn_iters=3, al_iters=1,
                        record_trace=True)
    ctrl = cl.MPCController(cfg)
    refs = jnp.full((2, 4), 0.3, jnp.float64)
    x0 = jnp.tile(jnp.asarray(cl.press.X0_REFERENCE, jnp.float64), (2, 1))
    _, telem = jax.jit(lambda x, r, k: cl.run_batch(
        cl.LoopConfig(t_steps=4, variant="smooth"), ctrl, x, r, k))(
            x0, refs, jax.random.PRNGKey(0))
    p = str(tmp_path / "solver_trace.html")
    html_dash.solver_dashboard_from_telemetry(telem, p)
    text = open(p).read()
    assert "per-iteration convergence" in text
    assert "barrier / AL penalty mu" in text
    data = json.loads(text.split("const DATA = ", 1)[1].split(";\n", 1)[0])
    per_iter = [pnl for pnl in data[0]
                if "per-iteration" in pnl["title"]]
    assert len(per_iter) == 2
    assert len(per_iter[0]["series"][0]["y"]) == 3  # gn_iters * al_iters


def test_solver_phase_breakdown(tmp_path):
    """Per-phase NLP cost artifact (t_wall_nlp_{f,g,grad_f,jac_g} analogue,
    Supervised Learning/Functions.py:848-853): all phases present with
    positive isolated wall times and XLA FLOP counts."""
    from forging_control_tpu.solver import sqp
    from forging_control_tpu.utils import profiling

    rec = profiling.solver_phase_breakdown(
        sqp.MPCConfig(horizon=5, gn_iters=2, al_iters=1), batch=8, reps=1)
    assert set(rec["phases"]) == {"f", "g", "grad_f", "jac_g", "linsolve",
                                  "total"}
    for name, ph in rec["phases"].items():
        assert ph["t_wall_s"] > 0, name
        assert ph["t_wall_per_solve_us"] > 0, name
    # derivative phases cost more FLOPs than their primal evals
    p = rec["phases"]
    assert p["grad_f"]["flops"] > p["f"]["flops"]
    assert p["jac_g"]["flops"] > p["g"]["flops"]
    json.dumps(rec)  # JSON-ready


def test_progress_bar_non_tty():
    """ProgressBar degrades to plain line logging off-TTY (the alive_bar
    role, Supervised Learning/Functions.py:592-600) and epoch_log_fn plugs
    into the trainers' log_fn hook."""
    import io

    from forging_control_tpu.utils import progress

    buf = io.StringIO()
    bar = progress.ProgressBar(total=4, label="t", stream=buf,
                               min_interval_s=0.0)
    for _ in range(4):
        bar.update()
    bar.close()
    out = buf.getvalue()
    assert "4/4 (100%)" in out

    buf2 = io.StringIO()
    log = progress.epoch_log_fn(2, stream=buf2)
    log(0, 0.5, 0.6)
    log(1, 0.4, 0.5)
    assert "loss 0.40000" in buf2.getvalue()


def test_dompc_pickle_round_trip(tmp_path):
    """Writer emits the reference's do_mpc.data.save_results format; our
    own do-mpc-free loader reads it back to the identical results dict
    (VERDICT r2 task 9)."""
    import numpy as np

    from forging_control_tpu.utils import dompc_pickle

    rng = np.random.default_rng(0)
    n, t = 3, 50
    results = {k: rng.normal(size=(n, t)) for k in
               ("y", "y_dot", "p1", "p2", "z", "ref", "u", "F_d")}
    path = str(tmp_path / "forging_test_N_10.pkl")
    dompc_pickle.save(path, results)

    recs = dompc_pickle.load(path)
    assert set(recs) == {"mpc", "simulator"}
    assert recs["mpc"]["_x"].shape == (n * t, 5)
    assert recs["mpc"]["_aux"].shape == (n * t, 2)
    # per-trajectory clock restarts at 0
    tcol = recs["mpc"]["_time"][:, 0]
    assert tcol[0] == 0.0 and tcol[t] == 0.0 and tcol[1] == 1e-3

    back = dompc_pickle.to_results(recs["mpc"], t_traj=t)
    for k in results:
        np.testing.assert_allclose(back[k], results[k], rtol=0, atol=0)


def test_bench_preset_resolution_follows_artifact():
    """bench.py's per-horizon preset default follows the qualification
    artifacts (fast_preset_ab for N=10, fast_preset_by_horizon for the
    sweep horizons) and never invents an unqualified preset."""
    import importlib.util
    import json as _json

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "bench_mod", os.path.join(root, "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    parity = _json.load(open(os.path.join(root, "docs",
                                          "RESULTS-parity.json")))
    known = {"default", "fast", "fast_5x1", "fast_6x1", "fast_8x1",
             "fast_4x2", "lean_4x2", "lean_5x2", "teacher_6x2",
             "ipopt_compat"}
    for n in (5, 10, 15, 20, 25):
        preset, quality = bench._preset_default(n)
        assert preset in known and quality
        rec = (parity.get("fast_preset_ab") if n == 10 else
               parity.get("fast_preset_by_horizon", {}).get(f"N={n}"))
        if rec is None or not rec.get("qualified"):
            # no qualified record at this horizon -> the 6x2 teacher
            # configuration itself (the qualification baseline)
            assert preset == "teacher_6x2"
        else:
            assert preset == rec["preset"]
            # the quality string carries the qualification evidence
            assert "non-inferior" in quality
