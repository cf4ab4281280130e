"""Tests for reference-stream generation (refgen.streams)."""

import random

import jax
import numpy as np
import pytest

from forging_control_tpu.refgen import streams


@pytest.mark.parametrize("variant", list(streams._VARIANTS))
@pytest.mark.parametrize("traj", [0, 1, 7, 79])
def test_cpython_parity(variant, traj):
    """reference_pair must be bit-identical to the CPython random streams of
    the tvp_fun in each template_mpc.py variant."""
    wb, rb, gain, off = streams._VARIANTS[variant]
    random.seed(traj + wb)
    want_w = gain * random.random() + off
    random.seed(traj + rb)
    want_r = -(gain * random.random() + off)
    got_w, got_r = streams.reference_pair(traj, variant)
    assert got_w == want_w
    assert got_r == want_r


def test_float_seed_equivalence():
    """The reference seeds with integral floats (t//T_REF + bias); CPython
    hashes those back to the same int, so int-seed parity is sufficient."""
    random.seed(153.0)
    a = random.random()
    random.seed(153)
    assert random.random() == a


def test_reference_table_shape_and_halves():
    tab = streams.reference_table(4, "generate")
    assert tab.shape == (4, 300)
    for k in range(4):
        assert np.all(tab[k, :150] == tab[k, 0])
        assert np.all(tab[k, 150:] == tab[k, 150])
        assert tab[k, 0] > 0 and tab[k, 150] < 0


def test_reference_table_supervised_bounds():
    tab = streams.reference_table(10, "supervised")
    assert np.all(tab[:, :150] >= 0.1) and np.all(tab[:, :150] <= 0.9)
    assert np.all(tab[:, 150:] <= -0.1) and np.all(tab[:, 150:] >= -0.9)


def test_golden_refs_match_recorded(golden_mpc_rows):
    """The recorded dataframe's ref column must equal our CPython-exact
    supervised-variant streams for trajectories 0 and 1."""
    tab = streams.reference_table(2, "supervised")
    rec = golden_mpc_rows[:, 1].reshape(2, 300)
    np.testing.assert_allclose(tab, rec, rtol=0, atol=5e-7)  # file has 6 decimals


def test_sample_references_distribution():
    key = jax.random.PRNGKey(0)
    tab = np.array(streams.sample_references(key, 64, "supervised"))
    assert tab.shape == (64, 300)
    assert np.all(tab[:, :150] >= 0.1) and np.all(tab[:, :150] <= 0.9)
    assert np.all(tab[:, 150:] <= -0.1)
    # distinct trajectories get distinct draws
    assert len(np.unique(tab[:, 0])) > 60


MODEL_NN_RECORDING = ("/root/reference/Unsupervised Learning/Model_NN/"
                      "results/MPC_simulation.pkl")


def test_model_nn_refs_match_recorded_pickle():
    """The Model_NN variant streams (seeds +250 / +10^6+100, 0.8r+0.1 —
    Model_NN/template_mpc.py:74-80) must be bit-identical to the _tvp
    column of the shipped MPC_simulation.pkl recording, loaded through
    the do-mpc-free pickle reader."""
    from forging_control_tpu.utils import dompc_pickle

    recs = dompc_pickle.load(MODEL_NN_RECORDING)
    tvp = recs["simulator"]["_tvp"].reshape(10, 300)
    tab = streams.reference_table(10, "model_nn")
    np.testing.assert_array_equal(tab, tvp)


def test_dompc_pickle_to_results_schema():
    """Reference pickles convert to the generate_data results schema and
    load through pipelines.generate_data.load directly."""
    from forging_control_tpu.pipelines import generate_data

    results = generate_data.load(MODEL_NN_RECORDING)
    assert set(results) >= {"y", "y_dot", "p1", "p2", "z", "ref", "u", "F_d"}
    for k, v in results.items():
        assert v.shape == (10, 300), k
    # trajectory 0 starts from the reference X0
    assert results["y"][0, 0] == 0.0
    assert abs(results["p1"][0, 0] - 2156275.6006012624) < 1e-6
    assert np.isfinite(results["F_d"]).all()
