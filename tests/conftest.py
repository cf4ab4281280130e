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


# ---------------------------------------------------------------- test tiers
# Two tiers (round-2 VERDICT item: sub-60 s iteration loop):
#   pytest -m smoke   — fast tier: unit/property tests, small compiles
#   pytest            — full tier: golden-parity + compile-heavy programs
# Tests named below measured >2 s on the reference CPU box (full run
# 31:45 wall; durations captured 2026-08); everything else is smoke.
SLOW_TESTS = {
    "test_backends_agree_from_x0", "test_backends_agree_midtrajectory",
    "test_batch_vmap_consistency", "test_cli_generate",
    "test_cli_supervised_multi_seed", "test_cli_sweep",
    "test_closed_loop_tracking_matches_reference",
    "test_constraint_activation", "test_convergence_masking_and_inf_du",
    "test_data_parallel_update_runs_and_syncs",
    "test_dump_dataframe_roundtrip", "test_feasible_command_unchanged",
    "test_float32_solve", "test_fnn_matches_torch",
    "test_fused_batch_matches_vmap_path", "test_generate_dataset",
    "test_horizon_sweep_compiles_and_solves", "test_html_dashboard",
    "test_ilqr_controller_in_loop", "test_independent_scipy_crosscheck",
    "test_infeasible_command_projected", "test_ipopt_command_parity",
    "test_ipopt_compat_closed_loop_bit_parity", "test_maxabs_matches_sklearn",
    "test_mpc_loss_decomposition_consistent",
    "test_mpc_loss_runs_and_differentiates", "test_n25_scipy_crosscheck",
    "test_plant_in_loop_training_step_runs", "test_plots_render",
    "test_polish_feasibility_guard", "test_polish_is_noop_at_full_strength",
    "test_polish_recovers_cheap_config", "test_process_noise_injection",
    "test_projection_minimality", "test_record_trace_schema",
    "test_recovering_policy_wrapper", "test_rhs_gradients_finite_everywhere",
    "test_riccati_ipopt_parity", "test_scan_unroll_equivalence",
    "test_sharded_closed_loop_matches_single_device",
    "test_single_solve_matches_jax", "test_solve_batch_matches_vmap",
    "test_solve_batch_matches_vmap_solve",
    "test_supervised_multi_seed_selection", "test_supervised_pipeline",
    "test_surrogate_pipeline", "test_surrogate_training_reduces_loss",
    "test_trace_flows_through_closed_loop",
    "test_two_process_distributed_closed_loop",
    "test_unsupervised_pipeline", "test_unsupervised_plant_mode_with_pretrain",
    "test_unsupervised_training_step_runs", "test_upper_bound_config",
    "test_vmap_and_jit", "test_warm_start_reduces_iterations",
    "test_solutions_feasible", "test_closed_loop_commands_close_to_golden",
    "test_flags_disable_training", "test_solver_dashboard_with_trace",
    "test_mesh_sharded_training_matches_unsharded",
    "test_lstm_pallas_matches_jnp",
    "test_warm_start_carry_matches_cold_on_feasible",
    "test_warm_start_failure_fallback",
    "test_warm_carry_closed_loop_matches_cold",
    "test_recover_warm_vmap",
    "test_solver_phase_breakdown",
    "test_single_stream_stepper",
    "test_solve_batch_trace_matches_vmap", "test_solve_batch_polish_matches_vmap",
    "test_riccati_trace_schema", "test_riccati_polish_approaches_full_sqp",
    "test_riccati_trace_flows_through_closed_loop",
    "test_dagger_trainer_runs_and_labels",
    "test_supervised_pipeline_feasibility_variant",
    "test_virtual_mesh_scaling_efficiency",
    "test_supervised_dagger_mode",
    "test_native_latency_harness_beats_reference_noisy_row",
}


def pytest_configure(config):
    config.addinivalue_line("markers", "smoke: fast tier (<60 s total)")
    config.addinivalue_line("markers", "slow: compile-heavy/golden tier")
    config.addinivalue_line(
        "markers", "golden: f64 reference-recording replays + independent "
        "optimizer cross-checks (the numerically heaviest verification; "
        "run per-round / after solver, integrator, or physics changes — "
        "docs/RESULTS.md test-tier section)")


# Session/module fixtures that compile large golden programs: every test
# requesting one belongs to the slow tier (the fixture cost lands on the
# first requester, whichever that is).
HEAVY_FIXTURES = {"parity_solves", "golden_closed_loop", "golden_mpc_rows",
                  "results", "dataset"}

# Golden tier: verification against the reference's recorded artifacts
# (the golden fixtures) plus the independent scipy optimizer cross-checks.
# These are embarrassingly parallel f64 numerical replays — the dominant
# cost of the full tier on a small-core box — and they only change meaning
# when solver/integrator/physics code changes, so they run as their own
# tier: `pytest -m golden` per round (and after touching those layers),
# `pytest -m "not golden"` as the regular full tier.
GOLDEN_FIXTURES = {"parity_solves", "golden_closed_loop", "golden_mpc_rows"}
GOLDEN_TESTS = {"test_independent_scipy_crosscheck",
                "test_n25_scipy_crosscheck"}


def pytest_collection_modifyitems(config, items):
    for item in items:
        base = item.name.split("[")[0]
        fixtures = set(getattr(item, "fixturenames", ()))
        if base in SLOW_TESTS or (HEAVY_FIXTURES & fixtures):
            item.add_marker(pytest.mark.slow)
        else:
            item.add_marker(pytest.mark.smoke)
        if base in GOLDEN_TESTS or (GOLDEN_FIXTURES & fixtures):
            item.add_marker(pytest.mark.golden)
