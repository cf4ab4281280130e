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
    checksum = jax.jit(
        lambda u: jnp.sum(u),
        out_shardings=jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec()))(telem.u)
    json.dump({"process_id": pid,
               "process_count": jax.process_count(),
               "global_devices": int(n_global),
               "MAE": float(metrics["MAE"]),
               "RMSE": float(metrics["RMSE"]),
               "R2": float(metrics["R2"]),
               "u_checksum": float(checksum)},
              open(out, "w"))


if __name__ == "__main__":
    main()
