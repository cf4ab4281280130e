"""Test harness configuration.

Tests run on CPU with float64 (the validation mode called for by SURVEY.md
section 7) and an 8-device virtual mesh so multi-chip sharding paths compile
and execute without TPU hardware.  The axon sitecustomize may have imported
jax already, so we configure via jax.config (which works until a backend is
actually initialized) rather than env vars alone.
"""

import os

os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the golden closed-loop programs are large;
# caching makes suite reruns compile-free.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_fct")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np
import pytest

GOLDEN_DATAFRAME = "/root/reference/Supervised Learning/results/MPC_dataframe.txt"


@pytest.fixture(scope="session")
def golden_mpc_rows():
    """Recorded closed-loop MPC trajectory (smooth model, N=10, no noise).

    Columns: time, ref, y, y_dot, p1, p2, z, u — 600 rows (2 trajectories
    x 300 steps), written by the reference's dataframe dump
    (Supervised Learning/Main.py:832-859).  Serves as the CVODES/IPOPT
    golden fixture.
    """
    return np.loadtxt(GOLDEN_DATAFRAME, skiprows=1)
