"""Device-mesh scaling of scenario batches.

The reference has zero parallelism (single Python process, 24,000 serial
IPOPT solves per dataset — SURVEY.md section 2.10).  Trajectories are
embarrassingly parallel, so the TPU-native scaling story is data-parallel
sharding of the scenario axis over a 1-D mesh:

* the closed-loop batch engine (`loop.run_batch`) is jit-compiled with
  `NamedSharding` on the batch axis — XLA SPMD splits the vmapped scan
  across devices with **zero** per-step communication;
* metric reductions and gradient averaging ride `psum` over ICI
  (`shard_map`-based helpers below);
* multi-host extends the same mesh over DCN (jax.distributed), unchanged
  code.

Validated on an 8-device virtual CPU mesh in tests and via
``__graft_entry__.dryrun_multichip``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SCENARIO_AXIS = "scenario"


def make_mesh(n_devices: int | None = None, axis: str = SCENARIO_AXIS) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def default_mesh(axis: str = SCENARIO_AXIS) -> Mesh | None:
    """Mesh over all local devices, or None on a single device.  The
    trainers/pipelines treat None as 'no sharding', so single-chip runs
    pay zero mesh overhead while multi-device runs go data-parallel."""
    return make_mesh(axis=axis) if jax.device_count() > 1 else None


def shard_scenarios(mesh: Mesh, tree, axis: str = SCENARIO_AXIS):
    """Place each leaf with its leading (batch) dim sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def sharded_closed_loop(loop_cfg, controller, mesh: Mesh,
                        axis: str = SCENARIO_AXIS):
    """jit the batched closed loop with scenario-sharded inputs/outputs.

    Returns run(x0, refs, key) -> (x_final, Telemetry), with x0 (B, 5) and
    refs (B, T) sharded on B.  B must be divisible by the mesh size.
    """
    from ..loop import closed_loop as cl

    batch_sh = NamedSharding(mesh, P(axis))
    rep_sh = NamedSharding(mesh, P())

    def run(x0, refs, key):
        return cl.run_batch(loop_cfg, controller, x0, refs, key)

    return jax.jit(
        run,
        in_shardings=(batch_sh, batch_sh, rep_sh),
    )


def all_mean(tree, axis: str = SCENARIO_AXIS):
    """psum-backed mean across the mesh (inside shard_map)."""
    n = jax.lax.psum(1, axis)
    return jax.tree.map(lambda x: jax.lax.psum(x, axis) / n, tree)


def data_parallel_update(mesh: Mesh, loss_fn, tx, axis: str = SCENARIO_AXIS):
    """Build a psum-gradient data-parallel training step.

    loss_fn(params, batch) -> scalar.  Parameters/optimizer state are
    replicated; the batch is scenario-sharded; gradients are psum-averaged
    over ICI before the optax update — the canonical DP recipe.
    """

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(), P(), P(axis)), out_specs=(P(), P(), P()),
             check_vma=False)
    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        grads = all_mean(grads, axis)
        loss = all_mean(loss, axis)
        updates, opt_state = tx.update(grads, opt_state, params)
        import optax
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(step)


def sharded_metrics(mesh: Mesh, axis: str = SCENARIO_AXIS):
    """Tracking metrics with cross-shard psum reductions: each device
    reduces its scenario shard locally, then one scalar psum completes the
    global MAE/RMSE/R2 — the reference's metric pass without ever
    materializing the full batch on one host."""

    @partial(jax.shard_map, mesh=mesh, in_specs=(P(axis), P(axis)),
             out_specs=P(), check_vma=False)
    def compute(ref, y_dot):
        n = jax.lax.psum(jnp.asarray(ref.size, ref.dtype), axis)
        s_abs = jax.lax.psum(jnp.sum(jnp.abs(ref - y_dot)), axis)
        s_sq = jax.lax.psum(jnp.sum((ref - y_dot) ** 2), axis)
        s_ref = jax.lax.psum(jnp.sum(ref), axis)
        s_ref2 = jax.lax.psum(jnp.sum(ref ** 2), axis)
        mean_ref = s_ref / n
        ss_tot = s_ref2 - n * mean_ref**2
        return jnp.stack([s_abs / n, jnp.sqrt(s_sq / n), 1.0 - s_sq / ss_tot])

    def metrics(ref, y_dot):
        out = jax.jit(compute)(ref, y_dot)
        return {"MAE": out[0], "RMSE": out[1], "R2": out[2]}

    return metrics
