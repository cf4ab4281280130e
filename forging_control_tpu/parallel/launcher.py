"""Multi-host launch helpers.

The reference is single-process (SURVEY.md section 2.10).  Scaling this
framework to a multi-host TPU slice is the standard JAX recipe: call
:func:`initialize` on every host, build one global mesh over all devices,
and feed per-host shards through `jax.make_array_from_process_local_data`.
The closed-loop engine and trainers are already written against global
meshes (parallel/mesh.py), so no compute code changes across 1 chip ->
1 host -> N hosts; scenario batches shard over ICI within a host group and
DCN across hosts, with psum only in metric/gradient reductions.

Single-host fallback is automatic, so this module is safe to call
everywhere (and is exercised that way in tests).
"""

from __future__ import annotations

import jax
import numpy as np


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """jax.distributed.initialize wrapper; no-op for single-process runs."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)


def global_scenario_mesh(axis: str = "scenario"):
    """One 1-D mesh over every device of every process."""
    from jax.sharding import Mesh
    return Mesh(np.array(jax.devices()), (axis,))


def host_local_batch_to_global(mesh, local_batch, axis: str = "scenario"):
    """Assemble a global sharded array from per-host local shards."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        local_batch)
