"""Training loops (supervised imitation + unsupervised MPC-loss).

Replaces ``NeuralNetwork.{train_model,validate_model,train_loop}``
(``Supervised Learning/Functions.py:368-630``; unsupervised variant
``Unsupervised Learning/Functions.py:594-923``).  Training is fully
device-resident: the dataset lives on device, and the *entire run* —
per-epoch shuffle, `lax.scan` over batches, forward/loss/backward/AdamW
update, per-epoch validation — is one XLA program (scan over epochs x
scan over batches).  The host syncs once, at the end, to fetch the loss
curves; there is no per-batch (or even per-epoch) host round-trip.  The
one exception is closed-loop validation (`closed_loop_val_fn`), which is
its own jitted program and forces a per-epoch sync when requested.

Batches are drawn by per-epoch `jax.random.permutation`; the trailing
``n mod batch_size`` rows of each epoch's permutation are dropped so batch
shapes stay static (every row still trains — the permutation changes per
epoch).  Pass ``mesh`` to shard each batch over devices: XLA SPMD splits
the forward/backward and inserts the gradient psum automatically (the
`shard_map`-based step in ``parallel.data_parallel_update`` is the
equivalent single-step API).

Hyperparameter defaults mirror the reference USER SETTINGS:
supervised — L1 loss, AdamW lr=1e-3, bs=256, 20 epochs
(``Supervised Learning/Main.py:272-286``); unsupervised — MPCLoss(N=10,
alpha=20), AdamW lr=1e-4, validation against recorded MPC commands with
plain MSE (``Unsupervised Learning/Main.py:326-348``).
"""

from __future__ import annotations

import functools
import time
from dataclasses import dataclass, field
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from . import fnn, mpc_loss


@dataclass
class TrainReport:
    train_losses: list = field(default_factory=list)
    val_losses: list = field(default_factory=list)
    cl_val_losses: list = field(default_factory=list)  # closed-loop val MAE
    wall_time_s: float = 0.0
    selected_seed: int | None = None  # set by multi-seed pipeline selection


def l1_loss(pred, target):
    return jnp.mean(jnp.abs(pred - target))


def mse_loss(pred, target):
    return jnp.mean(jnp.square(pred - target))


def _batch_sharding(mesh):
    """NamedSharding for the batch axis of a training micro-batch."""
    if mesh is None:
        return None
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.mesh import SCENARIO_AXIS
    return NamedSharding(mesh, P(SCENARIO_AXIS))


def _shard_batch(tree, sharding):
    if sharding is None:
        return tree

    def constrain(a):
        if a.shape[0] % sharding.mesh.size:  # indivisible batch: keep local
            return a
        return jax.lax.with_sharding_constraint(a, sharding)

    return jax.tree.map(constrain, tree)


def _epoch_perm(key, n, batch_size):
    """(n_batches, batch_size) shuffled index table; static shapes."""
    bs = min(batch_size, n)
    nb = n // bs
    return jax.random.permutation(key, n)[: nb * bs].reshape(nb, bs)


# The compiled training programs are cached at module level (keyed on the
# static hyperparameters) so multi-seed selection loops reuse one
# executable instead of re-tracing per seed; jit's own cache then handles
# distinct dataset shapes.

@functools.cache
def _supervised_program(lr, weight_decay, loss_fn, width_dim, epochs,
                        batch_size, sharding):
    tx = optax.adamw(lr, weight_decay=weight_decay)

    @jax.jit
    def run(params, opt_state, xt, yt, xv, yv, key):
        n = xt.shape[0]

        def epoch(carry, ek):
            p, o = carry

            def body(c, idx):
                p, o = c
                xb, yb = _shard_batch((xt[idx], yt[idx]), sharding)
                l, grads = jax.value_and_grad(
                    lambda pp: loss_fn(fnn.apply(pp, xb, width_dim), yb))(p)
                updates, o = tx.update(grads, o, p)
                return (optax.apply_updates(p, updates), o), l

            (p, o), ls = jax.lax.scan(
                body, (p, o), _epoch_perm(ek, n, batch_size))
            vl = loss_fn(fnn.apply(p, xv, width_dim), yv)
            return (p, o), (jnp.mean(ls), vl)

        keys = jax.random.split(key, epochs)
        (p, _), (tl, vl) = jax.lax.scan(epoch, (params, opt_state), keys)
        return p, tl, vl

    return tx, run


@functools.cache
def _unsupervised_program(horizon, alpha, width_dim, lr, weight_decay,
                          epochs, batch_size, enable_noise, noise_sigma):
    tx = optax.adamw(lr, weight_decay=weight_decay)

    def epoch_body(p, o, surrogate_params, xt, zt, xv, uv, ek):
        n = xt.shape[0]
        perm = _epoch_perm(ek, n, batch_size)
        bkeys = jax.random.split(jax.random.fold_in(ek, 1), perm.shape[0])

        def body(c, inp):
            p, o = c
            idx, bk = inp
            xb, zb = xt[idx], zt[idx]

            def loss(pp):
                u_ctrl = fnn.apply(pp, xb, width_dim)
                l, _ = mpc_loss.mpc_loss(
                    pp, surrogate_params, xb, u_ctrl, zb,
                    horizon=horizon, alpha=alpha, width_dim=width_dim,
                    noise_key=bk if enable_noise else None,
                    noise_std=noise_sigma)
                return l

            l, grads = jax.value_and_grad(loss)(p)
            updates, o = tx.update(grads, o, p)
            return (optax.apply_updates(p, updates), o), l

        (p, o), ls = jax.lax.scan(body, (p, o), (perm, bkeys))
        vl = mse_loss(fnn.apply(p, xv, width_dim), uv)
        return p, o, jnp.mean(ls), vl

    @jax.jit
    def run(params, opt_state, surrogate_params, xt, zt, xv, uv, key):
        """Fused whole-run program; best-val params selected inside."""
        def epoch(carry, ek):
            p, o, best_p, best_v = carry
            p, o, tl, vl = epoch_body(p, o, surrogate_params, xt, zt,
                                      xv, uv, ek)
            better = vl < best_v
            best_p = jax.tree.map(
                lambda a, b: jnp.where(better, a, b), p, best_p)
            best_v = jnp.minimum(vl, best_v)
            return (p, o, best_p, best_v), (tl, vl)

        keys = jax.random.split(key, epochs)
        init = (params, opt_state, params, jnp.asarray(jnp.inf, uv.dtype))
        (p, _, best_p, _), (tl, vl) = jax.lax.scan(epoch, init, keys)
        return p, best_p, tl, vl

    return tx, run, jax.jit(epoch_body)


@functools.cache
def _surrogate_program(lr, weight_decay, epochs, batch_size, sharding):
    from . import lstm as lstm_mod
    tx = optax.adamw(lr, weight_decay=weight_decay)

    @jax.jit
    def run(params, opt_state, xt, yt, xv, yv, key):
        n = xt.shape[0]

        def epoch(carry, ek):
            p, o = carry

            def body(c, idx):
                p, o = c
                xb, yb = _shard_batch((xt[idx], yt[idx]), sharding)
                l, grads = jax.value_and_grad(
                    lambda pp: mse_loss(lstm_mod.apply(pp, xb), yb))(p)
                updates, o = tx.update(grads, o, p)
                return (optax.apply_updates(p, updates), o), l

            (p, o), ls = jax.lax.scan(
                body, (p, o), _epoch_perm(ek, n, batch_size))
            vl = mse_loss(lstm_mod.apply(p, xv), yv)
            return (p, o), (jnp.mean(ls), vl)

        keys = jax.random.split(key, epochs)
        (p, _), (tl, vl) = jax.lax.scan(epoch, (params, opt_state), keys)
        return p, tl, vl

    return tx, run


def make_closed_loop_val(in_scaler, u_scaler, *, n_traj: int = 8,
                         t_traj: int = 300, dtype=jnp.float32, seed: int = 0,
                         variant: str = "smooth",
                         ref_variant: str = "unsupervised",
                         width_dim: int = 1,
                         process_std: tuple = (0.0,) * 5):
    """Jitted true-plant validation rollout: params -> tracking MAE.

    Rolls a candidate FNN controller in closed loop against the RK4 plant
    on counter-based validation reference streams (distinct from the
    CPython-exact evaluation streams, so model selection never sees the
    test references).  One batched scan — milliseconds per call — which is
    what makes closed-loop model selection affordable here when it was not
    for the reference (CVODES rollouts cost minutes per candidate).
    Used both for per-epoch checkpoint selection and for multi-seed
    selection (the reference's "sim" replicas, Supervised Learning/Main.py).

    ``process_std`` injects plant process noise into the validation
    rollouts.  When the deployment protocol is noisy, selecting on
    noise-free rollouts mismatches the objective (a policy tuned hard to
    the clean plant can rank above a more robust one); pass the deployment
    noise so model selection optimizes what evaluation measures."""
    from ..eval import metrics
    from ..loop import closed_loop as cl
    from ..refgen import streams

    loop_cfg = cl.LoopConfig(t_steps=t_traj, variant=variant,
                             process_std=process_std)
    refs = streams.sample_references(
        jax.random.PRNGKey(seed + 9000), n_traj, ref_variant, t_traj,
        dtype=dtype)
    x0 = jnp.tile(jnp.asarray(cl.press.X0_REFERENCE, dtype), (n_traj, 1))
    key = jax.random.PRNGKey(seed + 9001)

    @jax.jit
    def val(params):
        ctrl = cl.FunctionController(
            fnn.make_policy(params, in_scaler, u_scaler, width_dim))
        _, telem = cl.run_batch(loop_cfg, ctrl, x0, refs, key)
        return metrics.mae(telem.ref, telem.x[..., 1])

    return val


def train_supervised(params, x_train, y_train, x_val, y_val, *,
                     width_dim=1, lr=1e-3, weight_decay=1e-2, epochs=20,
                     batch_size=256, loss_fn=l1_loss, seed=0,
                     log_fn: Callable | None = None, mesh=None):
    """Supervised imitation trainer (FNN mimics recorded MPC commands).

    The whole run is one XLA program (see module docstring); ``mesh``
    opts into data-parallel batch sharding."""
    tx, run = _supervised_program(lr, weight_decay, loss_fn, width_dim,
                                  epochs, batch_size, _batch_sharding(mesh))
    xt, yt = jnp.asarray(x_train), jnp.asarray(y_train)
    xv, yv = jnp.asarray(x_val), jnp.asarray(y_val)

    report = TrainReport()
    t0 = time.time()
    params, tl, vl = run(params, tx.init(params), xt, yt, xv, yv,
                         jax.random.PRNGKey(seed))
    jax.block_until_ready(params)
    report.wall_time_s = time.time() - t0
    report.train_losses = [float(x) for x in np.asarray(tl)]
    report.val_losses = [float(x) for x in np.asarray(vl)]
    if log_fn:
        for e in range(epochs):
            log_fn(e, report.train_losses[e], report.val_losses[e])
    return params, report


def train_unsupervised(controller_params, surrogate_params,
                       x_train, u_train, z_train, x_val, u_val, *,
                       horizon=10, alpha=20.0, width_dim=1, lr=1e-4,
                       weight_decay=1e-2, epochs=20, batch_size=15,
                       enable_noise=False, noise_sigma=0.01, seed=0,
                       keep_best=True,
                       closed_loop_val_fn: Callable | None = None,
                       log_fn: Callable | None = None):
    """MPC-loss trainer: FNN trained through the frozen LSTM surrogate.

    Validation uses plain MSE against the recorded MPC commands, exactly
    like the reference (``Unsupervised Learning/Functions.py:868-888``).
    ``keep_best`` returns the parameters at the best validation epoch —
    training longer through an imperfect surrogate lets the controller
    exploit surrogate error (observed: val MAE improves while closed-loop
    tracking collapses), so the val-vs-recorded-MPC metric is the guard.

    ``closed_loop_val_fn(params) -> scalar`` optionally replaces that
    selection metric with a *true-plant* closed-loop tracking MAE — the
    guard the reference could not afford (its plant rollout costs minutes
    per candidate through CVODES; ours is one jitted batched scan costing
    milliseconds).  When provided, best-epoch selection uses it and the
    per-epoch values are recorded in ``TrainReport.cl_val_losses``.
    """
    tx, run, epoch_fn = _unsupervised_program(
        horizon, alpha, width_dim, lr, weight_decay, epochs, batch_size,
        enable_noise, noise_sigma)
    xt, ut, zt = map(jnp.asarray, (x_train, u_train, z_train))
    xv, uv = jnp.asarray(x_val), jnp.asarray(u_val)

    report = TrainReport()
    t0 = time.time()
    opt_state = tx.init(controller_params)
    keys = jax.random.split(jax.random.PRNGKey(seed), epochs)

    if closed_loop_val_fn is None:
        controller_params, best_params, tl, vl = run(
            controller_params, opt_state, surrogate_params, xt, zt, xv, uv,
            jax.random.PRNGKey(seed))
        jax.block_until_ready(controller_params)
        report.train_losses = [float(x) for x in np.asarray(tl)]
        report.val_losses = [float(x) for x in np.asarray(vl)]
        if log_fn:
            for e in range(epochs):
                log_fn(e, report.train_losses[e], report.val_losses[e])
    else:
        # Closed-loop selection needs the candidate params on the host per
        # epoch (its own jitted rollout), so epochs stay host-stepped; the
        # inner batch loop is still one fused scan.
        best_params, best_val = controller_params, float("inf")
        for epoch in range(epochs):
            controller_params, opt_state, tl, vl = epoch_fn(
                controller_params, opt_state, surrogate_params, xt, zt,
                xv, uv, keys[epoch])
            report.train_losses.append(float(tl))
            report.val_losses.append(float(vl))
            select = float(closed_loop_val_fn(controller_params))
            report.cl_val_losses.append(select)
            if select < best_val:
                best_val = select
                best_params = jax.tree.map(lambda a: a.copy(),
                                           controller_params)
            if log_fn:
                log_fn(epoch, report.train_losses[-1], select)
    report.wall_time_s = time.time() - t0
    if keep_best:
        controller_params = best_params
    return controller_params, report


def train_plant_in_loop(params, in_scaler, u_scaler, *, width_dim=1,
                        t_steps=300, n_traj=32, steps=300, lr=1e-3,
                        weight_decay=1e-2, rterm=0.02, pressure_weight=1.0,
                        ref_variant="unsupervised", variant="smooth",
                        process_std=(0.0,) * 5, clip_norm=1.0, seed=0,
                        val_every=10, keep_best=True,
                        closed_loop_val_fn: Callable | None = None,
                        log_fn: Callable | None = None):
    """Analytic-policy-gradient trainer: FNN trained through the TRUE plant.

    The reference trains the controller through a learned LSTM surrogate
    because its plant lives behind CasADi/CVODES process boundaries that
    torch cannot differentiate (``Unsupervised Learning/Main.py:326-348``).
    Here the plant is the same pure-JAX RK4 rollout the closed loop runs,
    so the controller can be trained by direct backpropagation through
    full episodes of the true dynamics — no surrogate-model bias to
    exploit.  The objective mirrors the MPC's own (template_mpc.py:44-50):

        mean_t (y_dot_t - ref_t)^2 + rterm * mean_t (du_t / U_SCALE)^2
        + pressure_weight * mean_t relu-barrier(p / P_SCALE)

    Each step draws a fresh batch of counter-based reference streams, so
    the policy never overfits a fixed dataset.  ``closed_loop_val_fn``
    (params -> tracking MAE on held-out streams) selects the returned
    parameters every ``val_every`` steps.
    """
    from ..loop import closed_loop as cl
    from ..physics.scaling import U_SCALE
    from ..refgen import streams as ref_streams
    from . import fnn as fnn_mod

    dtype = jnp.result_type(*jax.tree.leaves(params))
    # state_clip: keep training episodes finite when a candidate policy
    # excites the stiff pressure dynamics (evaluation paths never clip).
    loop_cfg = cl.LoopConfig(t_steps=t_steps, variant=variant,
                             process_std=process_std,
                             state_clip=(1.0, 10.0, 1e9, 1e9, 1.0))
    x0 = jnp.tile(jnp.asarray(cl.press.X0_REFERENCE, dtype), (n_traj, 1))

    # BPTT through the stiff pressure dynamics can spike (the cavitation
    # region has huge local sensitivities): clip the gradient norm, decay
    # the step size, and reject non-finite updates outright (measured: an
    # unguarded run diverged to NaN at ~step 1200 after reaching its best
    # closed-loop MAE).
    sched = optax.cosine_decay_schedule(lr, max(steps, 1), alpha=0.05)
    tx = optax.apply_if_finite(
        optax.chain(optax.clip_by_global_norm(clip_norm),
                    optax.adamw(sched, weight_decay=weight_decay)),
        max_consecutive_errors=1000)
    opt_state = tx.init(params)

    def episode_cost(p, refs, key):
        ctrl = cl.FunctionController(
            fnn_mod.make_policy(p, in_scaler, u_scaler, width_dim))
        _, telem = cl.run_batch(loop_cfg, ctrl, x0, refs, key)
        # Saturate the per-step tracking cost: an aggressive candidate
        # policy can excite the stiff pressure dynamics into blow-up, and
        # one diverged episode's squared error (~1e6) would otherwise own
        # the whole batch gradient (measured: unsaturated runs reach their
        # best closed-loop MAE then oscillate and diverge).  y_dot spans
        # roughly [-0.9, 0.9], so a cap of 4 only clips pathologies.
        err2 = jnp.square(telem.x[..., 1] - telem.ref)
        track = jnp.mean(jnp.minimum(err2, 4.0))
        du = jnp.diff(telem.u, axis=-1, prepend=jnp.zeros_like(telem.u[:, :1]))
        smooth = rterm * jnp.mean(jnp.square(du / U_SCALE))
        p_scaled = telem.x[..., 2:4] / 1e7
        barrier = pressure_weight * jnp.mean(jnp.minimum(
            jax.nn.relu(-p_scaled) + jax.nn.relu(p_scaled - 3.2), 10.0))
        return track + smooth + barrier

    @jax.jit
    def update(p, opt_state, refs, key):
        # Full f32 matmul precision: TPU dots default to bf16 inputs, which
        # is fine for the forward closed loop but degrades 300-step BPTT
        # gradients enough to stall training (measured: loss plateaus at
        # ~0.3 on TPU vs steady descent on CPU with identical settings).
        with jax.default_matmul_precision("highest"):
            l, grads = jax.value_and_grad(episode_cost)(p, refs, key)
        updates, opt_state = tx.update(grads, opt_state, p)
        return optax.apply_updates(p, updates), opt_state, l

    report = TrainReport()
    key = jax.random.PRNGKey(seed)
    best_params, best_val = params, float("inf")
    best_train = float("inf")
    snap = (jax.tree.map(lambda a: a.copy(), params),
            jax.tree.map(lambda a: a.copy(), opt_state), float("inf"))
    t0 = time.time()
    for step in range(steps):
        key, k_ref, k_noise = jax.random.split(key, 3)
        refs = ref_streams.sample_references(k_ref, n_traj, ref_variant,
                                             t_steps, dtype=dtype)
        params, opt_state, l = update(params, opt_state, refs, k_noise)
        l = float(l)
        # Rewind on divergence: one over-eager step can drop the policy
        # off a cliff (episode blow-up) from which gradients don't recover
        # (measured).  Restore the best-loss snapshot and continue — the
        # decayed lr takes a smaller step past the cliff next time.
        if not np.isfinite(l) or (np.isfinite(best_train)
                                  and l > 4.0 * max(best_train, 1e-3)):
            params, opt_state = (jax.tree.map(lambda a: a.copy(), snap[0]),
                                 jax.tree.map(lambda a: a.copy(), snap[1]))
            l = snap[2]
        elif l < best_train:
            best_train = l
            snap = (jax.tree.map(lambda a: a.copy(), params),
                    jax.tree.map(lambda a: a.copy(), opt_state), l)
        report.train_losses.append(l)
        if closed_loop_val_fn is not None and (
                step % val_every == val_every - 1 or step == steps - 1):
            sel = float(closed_loop_val_fn(params))
            report.cl_val_losses.append(sel)
            if sel < best_val:
                best_val = sel
                best_params = jax.tree.map(lambda a: a.copy(), params)
            if log_fn:
                log_fn(step, report.train_losses[-1], sel)
        elif log_fn:
            log_fn(step, report.train_losses[-1], None)
    report.wall_time_s = time.time() - t0
    if keep_best and closed_loop_val_fn is not None:
        params = best_params
    return params, report


def dagger_rollout(params, in_scaler, u_scaler, mpc_cfg, refs, key, *,
                   width_dim=1, variant="smooth", process_std=(0.0,) * 5,
                   backend="sqp", beta=0.0, dtype=jnp.float32):
    """Roll the student policy in closed loop while shadow-labeling every
    visited state with the MPC teacher — the DAgger data-collection pass.

    The teacher MPC solves at each state the *student* visits (warm-started
    along the student's trajectory via the usual shift), but its command is
    NOT applied (``beta=0``; set beta>0 to blend teacher action into the
    applied command, the classic DAgger mixing schedule).  This queries
    the expert on the learner's own state distribution — the fix for
    imitation covariate shift (Ross et al., AISTATS 2011) that the
    reference structurally could not afford: each labeling pass is
    n_traj x t_steps extra IPOPT solves for them (minutes-hours), one
    fused batched program here (milliseconds-seconds).

    Returns ``(feats (B, T, 3), u_teacher (B, T))`` in raw physical units
    (features [y_dot, z, ref], the supervised controller inputs).
    """
    from ..integrate.rk4 import rk4_step
    from ..loop import closed_loop as cl
    from ..solver import riccati, sqp as sqp_mod
    from . import fnn as fnn_mod

    mod = riccati if backend == "ilqr" else sqp_mod
    refs = jnp.asarray(refs, dtype)
    B, T = refs.shape
    loop_cfg = cl.LoopConfig(t_steps=T, variant=variant,
                             process_std=process_std)
    policy = jax.vmap(fnn_mod.make_policy(params, in_scaler, u_scaler,
                                          width_dim))
    p_std = jnp.asarray(process_std, dtype)

    def f(x, u):
        return cl.press.rhs(x, u, loop_cfg.params, loop_cfg.variant)

    def solve_b(x, r, up, st):
        return mod.solve_batch(mpc_cfg, x, r, up, st)

    split2 = jax.vmap(lambda k: jax.random.split(k, 2))
    normal5 = jax.vmap(lambda k: jax.random.normal(k, (5,), dtype))

    def body(carry, ref):
        x_true, x_meas, mpc_state, u_prev, keys = carry
        shifted = jax.vmap(mod.shift_state)(mpc_state)
        u_teach, mpc_state, _ = solve_b(x_meas, ref, u_prev, shifted)
        u_stud = jnp.asarray(policy(x_meas, ref, u_prev), dtype)
        u0 = (1.0 - beta) * u_stud + beta * u_teach.astype(dtype)

        ks = split2(keys)
        w = normal5(ks[:, 1]) * p_std
        x_next = rk4_step(f, x_true, u0, loop_cfg.dt, loop_cfg.substeps,
                          disturbance=w)
        x_meas_next = cl.press.measure(x_next, loop_cfg.params,
                                       loop_cfg.variant)
        feats = jnp.stack([x_meas[:, 1], x_meas[:, 4], ref], axis=-1)
        return (x_next, x_meas_next, mpc_state, u0, ks[:, 0]), \
            (feats, u_teach)

    x0 = jnp.tile(jnp.asarray(cl.press.X0_REFERENCE, dtype), (B, 1))
    st0 = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (B,) + a.shape),
        mod.init_state(mpc_cfg, dtype))
    init = (x0, cl.press.measure(x0, loop_cfg.params, loop_cfg.variant),
            st0, jnp.zeros((B,), dtype), jax.random.split(key, B))
    _, (feats, u_teach) = jax.lax.scan(body, init, refs.T)
    return jnp.moveaxis(feats, 0, 1), jnp.moveaxis(u_teach, 0, 1)


def train_dagger(params, in_scaler, u_scaler, x_init, u_init, x_val, u_val,
                 *, mpc_cfg, rounds=3, n_traj=16, t_steps=300,
                 ref_variant="unsupervised", width_dim=1, lr=1e-3,
                 epochs=20, batch_size=256, process_std=(0.0,) * 5,
                 backend="sqp", seed=0, variant="smooth",
                 closed_loop_val_fn: Callable | None = None,
                 log_fn: Callable | None = None):
    """DAgger: iterated imitation with expert relabeling on the student's
    own closed-loop distribution.

    Starts from the recorded teacher dataset (``x_init``/``u_init``,
    scaled units — the supervised pipeline's arrays), then alternates:
    train on the aggregate -> roll the student on fresh reference streams
    -> label every visited state with the batched MPC teacher ->
    aggregate.  Candidate parameters after each round are scored by
    ``closed_loop_val_fn`` (true-plant noisy validation MAE) and the best
    round's parameters are returned — so adding rounds can only help.

    This is the framework-native answer to the student-over-teacher gap
    (docs/RESULTS.md): the reference's one-shot imitation learns on the
    teacher's states but is evaluated on its own, and its closed-loop MAE
    pays for the mismatch.
    """
    import numpy as _np

    from ..refgen import streams as ref_streams

    report = TrainReport()
    t0 = time.time()
    X = [_np.asarray(x_init, _np.float32)]
    U = [_np.asarray(u_init, _np.float32)]
    best_params, best_val = None, float("inf")
    key = jax.random.PRNGKey(seed + 77)
    for r in range(rounds):
        xt = _np.concatenate(X, axis=0)
        ut = _np.concatenate(U, axis=0)
        params, rep = train_supervised(
            params, xt, ut, x_val, u_val, width_dim=width_dim, lr=lr,
            epochs=epochs, batch_size=batch_size, seed=seed + r)
        report.train_losses.extend(rep.train_losses)
        report.val_losses.extend(rep.val_losses)
        if closed_loop_val_fn is not None:
            sel = float(closed_loop_val_fn(params))
            report.cl_val_losses.append(sel)
            if sel < best_val:
                best_val = sel
                best_params = jax.tree.map(lambda a: a.copy(), params)
            if log_fn:
                log_fn(r, rep.train_losses[-1], sel)
        if r == rounds - 1:
            break
        key, k_ref, k_roll = jax.random.split(key, 3)
        refs = ref_streams.sample_references(k_ref, n_traj, ref_variant,
                                             t_steps, dtype=jnp.float32)
        feats, labels = dagger_rollout(
            params, in_scaler, u_scaler, mpc_cfg, refs, k_roll,
            width_dim=width_dim, variant=variant, process_std=process_std,
            backend=backend)
        feats = _np.asarray(feats).reshape(-1, 3)
        labels = _np.asarray(labels).reshape(-1, 1)
        X.append(_np.asarray(in_scaler.transform(jnp.asarray(feats)),
                             _np.float32))
        U.append(_np.asarray(u_scaler.transform(jnp.asarray(labels)),
                             _np.float32))
    report.wall_time_s = time.time() - t0
    if best_params is not None:
        params = best_params
    return params, report


def train_surrogate(params, x_train, y_train, x_val, y_val, *, lr=1e-3,
                    weight_decay=1e-2, epochs=50, batch_size=256, seed=0,
                    log_fn: Callable | None = None, mesh=None):
    """LSTM surrogate trainer: teacher-forced next-step MSE
    (``Unsupervised Learning/Model_NN/Main.py:224-239``).  One fused XLA
    program for the whole run (see module docstring)."""
    tx, run = _surrogate_program(lr, weight_decay, epochs, batch_size,
                                 _batch_sharding(mesh))
    xt, yt = jnp.asarray(x_train), jnp.asarray(y_train)
    xv, yv = jnp.asarray(x_val), jnp.asarray(y_val)

    report = TrainReport()
    t0 = time.time()
    params, tl, vl = run(params, tx.init(params), xt, yt, xv, yv,
                         jax.random.PRNGKey(seed))
    jax.block_until_ready(params)
    report.wall_time_s = time.time() - t0
    report.train_losses = [float(x) for x in np.asarray(tl)]
    report.val_losses = [float(x) for x in np.asarray(vl)]
    if log_fn:
        for e in range(epochs):
            log_fn(e, report.train_losses[e], report.val_losses[e])
    return params, report
