"""Worker process for the 2-process jax.distributed test.

Each process owns 2 CPU devices; the pair forms one 4-device global mesh.
Runs the framework's real multi-host leg end-to-end: launcher.initialize
-> global_scenario_mesh -> host_local_batch_to_global -> scenario-sharded
closed-loop MPC -> psum metrics; dumps the replicated results as JSON.

Usage: python tests/mp_worker.py <process_id> <num_processes> <port> <out>
"""

import json
import os
import sys

os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.config.update("jax_num_cpu_devices", 2)
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    pid, nproc, port, out = (int(sys.argv[1]), int(sys.argv[2]),
                             int(sys.argv[3]), sys.argv[4])

    import jax.numpy as jnp
    import numpy as np

    from forging_control_tpu.loop import closed_loop as cl
    from forging_control_tpu.parallel import launcher, mesh as pmesh
    from forging_control_tpu.solver import sqp

    launcher.initialize(coordinator_address=f"localhost:{port}",
                        num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc
    mesh = launcher.global_scenario_mesh()
    n_global = mesh.devices.size
    assert n_global == nproc * 2

    cfg = sqp.MPCConfig(horizon=5, variant="smooth", gn_iters=2, al_iters=1)
    loop_cfg = cl.LoopConfig(t_steps=6, variant="smooth")
    ctrl = cl.MPCController(cfg)

    # Host-local shard of the global scenario batch (1 traj per device).
    n_local = jax.local_device_count()
    lo = pid * n_local
    x0_all = np.tile(np.asarray(cl.press.X0_REFERENCE, np.float64),
                     (n_global, 1))
    refs_all = np.linspace(-0.6, 0.6, n_global)[:, None] * np.ones(
        (1, loop_cfg.t_steps))
    x0_g, refs_g = launcher.host_local_batch_to_global(
        mesh, (x0_all[lo:lo + n_local], refs_all[lo:lo + n_local]))

    run = pmesh.sharded_closed_loop(loop_cfg, ctrl, mesh)
    _, telem = run(x0_g, refs_g, jax.random.PRNGKey(0))

    metrics = pmesh.sharded_metrics(mesh)(telem.ref, telem.x[..., 1])
    rep_sh = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    checksum = jax.jit(lambda u: jnp.sum(u), out_shardings=rep_sh)(telem.u)

    # (b) Fused explicit-batch path (AL-iLQR backend, solve_batch body)
    # across the same process boundary (VERDICT r2 task 7).
    ctrl_ilqr = cl.MPCController(cfg, backend="ilqr")
    _, telem_i = pmesh.sharded_closed_loop(loop_cfg, ctrl_ilqr, mesh)(
        x0_g, refs_g, jax.random.PRNGKey(0))
    checksum_i = jax.jit(lambda u: jnp.sum(u), out_shardings=rep_sh)(
        telem_i.u)

    # (c) One data-parallel training step: psum-averaged gradients across
    # the two processes, replicated parameter update.
    import optax

    from forging_control_tpu.nn import fnn, train as train_mod

    p0, _ = fnn.init(jax.random.PRNGKey(0), dtype=jnp.float64)
    tx = optax.adamw(1e-3)
    o0 = tx.init(p0)
    xb_all = np.linspace(-1.0, 1.0, 8 * 3).reshape(8, 3)
    yb_all = np.tanh(xb_all.sum(axis=1, keepdims=True))
    rows = 8 // nproc
    xb_g, yb_g = launcher.host_local_batch_to_global(
        mesh, (xb_all[pid * rows:(pid + 1) * rows],
               yb_all[pid * rows:(pid + 1) * rows]))
    p0_r, o0_r = jax.device_put((p0, o0), rep_sh)

    def loss_fn(params, batch):
        xb, yb = batch
        return train_mod.l1_loss(fnn.apply(params, xb), yb)

    step = pmesh.data_parallel_update(mesh, loss_fn, tx)
    p1, _, loss = step(p0_r, o0_r, (xb_g, yb_g))
    grad_checksum = float(jax.jit(
        lambda t: sum(jnp.sum(l) for l in jax.tree.leaves(t)),
        out_shardings=rep_sh)(p1))

    json.dump({"process_id": pid,
               "process_count": jax.process_count(),
               "global_devices": int(n_global),
               "MAE": float(metrics["MAE"]),
               "RMSE": float(metrics["RMSE"]),
               "R2": float(metrics["R2"]),
               "u_checksum": float(checksum),
               "u_checksum_ilqr": float(checksum_i),
               "dp_loss": float(loss),
               "dp_param_checksum": grad_checksum},
              open(out, "w"))


if __name__ == "__main__":
    main()
