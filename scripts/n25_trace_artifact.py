"""Produce the N=25 per-iteration trace artifact on the Riccati backend.

VERDICT r3 task 3 done-criterion: ``MPCController(backend="ilqr")`` with
``record_trace=True`` produces the per-iteration dashboard, demonstrated
at the N=25 flagship horizon.  Writes:

  docs/artifacts/solver_trace_N25_ilqr.html   interactive dashboard
  docs/artifacts/solver_trace_N25_ilqr.json   summary (shapes + last-step
                                              convergence history)

Usage: python scripts/n25_trace_artifact.py   (TPU or FCT_CPU=1)
"""

import json
import os
import sys

if os.environ.get("FCT_CPU"):
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_fct")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import jax.numpy as jnp
    import numpy as np

    from forging_control_tpu.eval import html_dash
    from forging_control_tpu.loop import closed_loop as cl
    from forging_control_tpu.refgen import streams
    from forging_control_tpu.solver import sqp

    cfg = sqp.MPCConfig(horizon=25, variant="raw", record_trace=True)
    ctrl = cl.MPCController(cfg, backend="ilqr")
    T, B = 300, 2
    loop_cfg = cl.LoopConfig(t_steps=T, variant="raw")
    refs = jnp.asarray(streams.reference_table(B, "generate", T),
                       jnp.float32)
    x0 = jnp.tile(jnp.asarray(cl.press.X0_REFERENCE, jnp.float32), (B, 1))
    _, telem = jax.jit(lambda x, r, k: cl.run_batch(loop_cfg, ctrl, x, r, k))(
        x0, refs, jax.random.PRNGKey(0))
    tr = np.asarray(telem.diag.trace)   # (B, T, al*gn, C)
    assert np.isfinite(tr).all()

    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "artifacts")
    os.makedirs(out_dir, exist_ok=True)
    html = os.path.join(out_dir, "solver_trace_N25_ilqr.html")
    html_dash.solver_dashboard_from_telemetry(
        telem, html, title="N=25 AL-iLQR per-iteration trace")

    cols = list(sqp.TRACE_COLS)
    rec = {
        "backend": "ilqr", "horizon": 25, "variant": "raw",
        "trace_shape": list(tr.shape), "trace_cols": cols,
        "device": str(jax.devices()[0]),
        # convergence history of the hardest step (max first-iter inf_pr)
        "hardest_step": None,
    }
    ip = tr[:, :, 0, cols.index("inf_pr")]
    b, t = np.unravel_index(np.argmax(ip), ip.shape)
    rec["hardest_step"] = {
        "traj": int(b), "step": int(t),
        "history": {c: [float(x) for x in tr[b, t, :, i]]
                    for i, c in enumerate(cols)},
    }
    with open(os.path.join(out_dir, "solver_trace_N25_ilqr.json"), "w") as f:
        json.dump(rec, f, indent=2)
    print(json.dumps({"html": html, "trace_shape": rec["trace_shape"],
                      "hardest": (int(b), int(t))}))


if __name__ == "__main__":
    main()
