"""Profiling hooks.

The reference brackets every controller step with ``do_mpc.tools.Timer``
and stores IPOPT wall-time phases (SURVEY.md section 5).  On TPU, per-step
host timing is meaningless (the loop lives in one device program), so:

* solver-iteration counters ride the scan carry (`sqp.Diagnostics`);
* whole-program traces come from the standard JAX profiler, wrapped here.
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """Capture a profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside jitted code (shows up in traces)."""
    return jax.profiler.TraceAnnotation(name)


def solver_phase_breakdown(cfg, batch: int = 256, reps: int = 3,
                           dtype=None, key=None):
    """Per-phase solver cost breakdown — the consumable analogue of the
    reference's ``t_wall_nlp_{f,g,grad,grad_f,jac_g}`` IPOPT phase timers
    (``Supervised Learning/Functions.py:848-853``).

    On TPU the real solve is ONE fused XLA program, so per-phase wall time
    cannot be observed inside it; instead each NLP phase is compiled and
    timed *in isolation* over a scenario batch (amortized per solve), plus
    XLA's own static cost model (FLOPs / bytes accessed) per phase:

      f       objective evaluation (rollout + tracking/rterm cost)
      g       constraint evaluation (rollout + scaled pressure bounds)
      grad_f  objective gradient (reverse-mode through the rollout)
      jac_g   constraint Jacobian (forward-mode through the rollout)
      linsolve  Gauss-Newton normal-equations Cholesky solve (N x N)
      total   the full production solve (all phases fused; less than the
              sum of parts because XLA shares the rollout subgraphs)

    Returns a JSON-ready dict; see scripts/phase_breakdown.py for the
    artifact writer.
    """
    import time

    import jax.numpy as jnp
    import numpy as np

    from ..physics import press
    from ..solver import sqp

    dtype = dtype or jnp.float32
    key = key if key is not None else jax.random.PRNGKey(0)
    N = cfg.horizon

    k1, k2, k3 = jax.random.split(key, 3)
    x0 = jnp.tile(jnp.asarray(press.X0_REFERENCE, dtype), (batch, 1))
    x0 = x0 * (1.0 + 0.01 * jax.random.normal(k1, x0.shape, dtype))
    ref = jax.random.uniform(k2, (batch,), dtype, -0.9, 0.9)
    v = 0.05 * jax.random.normal(k3, (batch, N), dtype)
    u_prev = jnp.zeros((batch,), dtype)

    def obj(x, r, up, vv):
        return sqp._objective_only(cfg, x, r, up, vv)

    def con(x, vv):
        return sqp._constraints(cfg, sqp._rollout(cfg, x, vv))

    # Each phase reduces its output to a scalar on-device, and timing goes
    # through a forced host transfer of that scalar: on the remote-attach
    # TPU path block_until_ready can ack before execution completes (same
    # reason bench.py times through float(sum)), and transferring the raw
    # phase outputs would instead measure the tunnel.
    def scalarized(fn):
        return jax.jit(lambda *a: jax.tree.reduce(
            lambda acc, x: acc + jnp.sum(x), fn(*a), jnp.zeros((), dtype)))

    phases = {
        "f": scalarized(jax.vmap(obj)),
        "g": scalarized(jax.vmap(con, in_axes=(0, 0))),
        "grad_f": scalarized(jax.vmap(jax.grad(obj, argnums=3))),
        "jac_g": scalarized(jax.vmap(jax.jacfwd(con, argnums=1))),
    }
    args = {
        "f": (x0, ref, u_prev, v), "g": (x0, v),
        "grad_f": (x0, ref, u_prev, v), "jac_g": (x0, v),
    }

    # Linear solve phase on a representative GN normal matrix.
    from ..ops.smallchol import chol_solve
    J = jax.vmap(jax.jacfwd(con, argnums=1))(x0, v)       # (B, n_con, N)
    H = jnp.einsum("bci,bcj->bij", J, J) + 1e-6 * jnp.eye(N, dtype=dtype)
    g_rhs = jnp.einsum("bci,bc->bi", J, jax.vmap(con)(x0, v))
    phases["linsolve"] = scalarized(chol_solve)
    args["linsolve"] = (H, g_rhs)

    # The full production solve for reference.
    state = jax.vmap(lambda _: sqp.init_state(cfg, dtype))(jnp.arange(batch))
    phases["total"] = scalarized(jax.vmap(
        lambda x, r, up, s: sqp.solve(cfg, x, r, up, s)[0]))
    args["total"] = (x0, ref, u_prev, state)

    out = {"horizon": N, "batch": batch, "backend": jax.default_backend(),
           "phases": {}}
    for name, fn in phases.items():
        lowered = fn.lower(*args[name])
        compiled = lowered.compile()
        cost = {}
        try:
            ca = compiled.cost_analysis()
            ca = ca[0] if isinstance(ca, list) else ca
            cost = {k: ca[k] for k in ("flops", "bytes accessed")
                    if ca and k in ca}
        except Exception:
            pass
        # Pre-stage distinct argument variants on device (identical-argument
        # executions can be cache-served on the remote-attach path).  The
        # forced scalar transfer that makes timing honest costs ~25 ms on
        # the remote tunnel, so each measurement enqueues all K variants
        # back-to-back (single in-order device stream: forcing the last
        # result forces them all) and amortizes the transfer across K.
        K = max(reps, 10)
        variants = []
        for i in range(K):
            va = jax.tree.map(lambda a: a * (1.0 + 1e-6 * i), args[name])
            jax.tree.map(lambda a: a.block_until_ready(), va)
            variants.append(va)
        float(fn(*args[name]))  # warmup/compile
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            runs = [fn(*va) for va in variants]
            float(runs[-1])
            best = min(best, (time.perf_counter() - t0) / K)
        out["phases"][name] = {
            "t_wall_s": best,
            "t_wall_per_solve_us": best / batch * 1e6,
            **{k.replace(" ", "_"): float(vv) for k, vv in cost.items()},
        }
    total = out["phases"]["total"]["t_wall_s"]
    for name, rec in out["phases"].items():
        rec["fraction_of_total"] = rec["t_wall_s"] / total if total else None
    return out
