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
