"""NN stack tests: scalers, FNN, LSTM, datasets, MPC loss, training."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from forging_control_tpu.nn import datasets, fnn, lstm, mpc_loss, scalers, train


# ---------------------------------------------------------------- scalers

def test_maxabs_matches_sklearn():
    rng = np.random.RandomState(0)
    x = rng.randn(100, 3) * [1.0, 10.0, 0.1]
    sc = scalers.fit("maxabs", x)
    from sklearn.preprocessing import MaxAbsScaler
    want = MaxAbsScaler().fit_transform(x)
    np.testing.assert_allclose(np.array(sc.transform(jnp.array(x))), want, rtol=1e-12)
    np.testing.assert_allclose(
        np.array(sc.inverse(sc.transform(jnp.array(x)))), x, rtol=1e-12)


@pytest.mark.parametrize("kind,cls", [
    ("minmax", "MinMaxScaler"), ("standard", "StandardScaler"),
    ("robust", "RobustScaler")])
def test_other_scalers_match_sklearn(kind, cls):
    import sklearn.preprocessing as skp
    rng = np.random.RandomState(1)
    x = rng.randn(200, 4) * [1, 5, 50, 0.01] + [0, 1, -3, 0]
    sc = scalers.fit(kind, x)
    want = getattr(skp, cls)().fit_transform(x)
    np.testing.assert_allclose(np.array(sc.transform(jnp.array(x))), want,
                               rtol=1e-9, atol=1e-12)


# ---------------------------------------------------------------- FNN

def test_fnn_shapes_and_clamp():
    params, meta = fnn.init(jax.random.PRNGKey(0))
    x = jnp.array(np.random.RandomState(0).randn(32, 3) * 10)
    out = fnn.apply(params, x)
    assert out.shape == (32, 1)
    assert float(jnp.max(jnp.abs(out))) <= 1.0  # Hardtanh


def test_fnn_matches_torch():
    """Forward parity against a torch replica of FNNModel
    (Supervised Learning/Functions.py:113-178)."""
    torch = pytest.importorskip("torch")
    torch.manual_seed(0)
    params, _ = fnn.init(jax.random.PRNGKey(0), dtype=jnp.float64)

    fc_in = torch.nn.Linear(3, 50).double()
    fc_out = torch.nn.Linear(50, 1, bias=False).double()
    with torch.no_grad():
        fc_in.weight.copy_(torch.tensor(np.array(params["w_in"]).T))
        fc_in.bias.copy_(torch.tensor(np.array(params["b_in"])))
        fc_out.weight.copy_(torch.tensor(np.array(params["w_out"]).T))
    x = np.random.RandomState(1).randn(16, 3)
    with torch.no_grad():
        want = torch.nn.Hardtanh()(fc_out(torch.relu(fc_in(torch.tensor(x)))))
    got = fnn.apply(params, jnp.array(x))
    np.testing.assert_allclose(np.array(got), want.numpy(), rtol=1e-6, atol=1e-7)


def test_fnn_width_dim_weight_sharing():
    params, _ = fnn.init(jax.random.PRNGKey(2))
    x = jnp.ones((4, 3))
    o1 = fnn.apply(params, x, width_dim=1)
    o3 = fnn.apply(params, x, width_dim=3)
    assert o1.shape == o3.shape
    assert not np.allclose(np.array(o1), np.array(o3))


def test_fnn_simulator_matches_torch():
    """Forward parity against a torch replica of FNNSimulator
    (Unsupervised Learning/Model_NN/Functions.py:186-249): Tanh,
    bias=False, weight-shared intermediate layer, no output clamp."""
    torch = pytest.importorskip("torch")
    params, _ = fnn.init_simulator(
        jax.random.PRNGKey(3), 5, 32, 4, dtype=jnp.float64)

    fc_in = torch.nn.Linear(5, 32, bias=False).double()
    fc_int = torch.nn.Linear(32, 32, bias=False).double()
    fc_out = torch.nn.Linear(32, 4, bias=False).double()
    with torch.no_grad():
        fc_in.weight.copy_(torch.tensor(np.array(params["w_in"]).T))
        fc_int.weight.copy_(torch.tensor(np.array(params["w_int"]).T))
        fc_out.weight.copy_(torch.tensor(np.array(params["w_out"]).T))
    x = np.random.RandomState(7).randn(16, 5)
    with torch.no_grad():
        h = torch.tanh(fc_in(torch.tensor(x)))
        h = torch.tanh(fc_int(h))
        h = torch.tanh(fc_int(h))
        want = fc_out(h)
    got = fnn.apply_simulator(params, jnp.array(x), width_dim=3)
    np.testing.assert_allclose(np.array(got), want.numpy(), rtol=1e-6,
                               atol=1e-7)
    # unconstrained output: values outside [-1, 1] must survive
    big = fnn.apply_simulator(
        {k: 10.0 * v for k, v in params.items()}, jnp.array(x))
    assert np.abs(np.array(big)).max() > 1.0


def test_fnn_simulator_bias_matches_torch():
    """bias=True path: parity against torch Linear WITH bias, and init
    bounds match torch's U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    torch = pytest.importorskip("torch")
    params, _ = fnn.init_simulator(
        jax.random.PRNGKey(4), 5, 32, 4, bias=True, dtype=jnp.float64)
    assert params["b_in"].shape == (32,)
    assert np.abs(np.array(params["b_in"])).max() <= 1.0 / np.sqrt(5)
    assert np.abs(np.array(params["b_out"])).max() <= 1.0 / np.sqrt(32)

    fc_in = torch.nn.Linear(5, 32).double()
    fc_int = torch.nn.Linear(32, 32).double()
    fc_out = torch.nn.Linear(32, 4).double()
    with torch.no_grad():
        fc_in.weight.copy_(torch.tensor(np.array(params["w_in"]).T))
        fc_in.bias.copy_(torch.tensor(np.array(params["b_in"])))
        fc_int.weight.copy_(torch.tensor(np.array(params["w_int"]).T))
        fc_int.bias.copy_(torch.tensor(np.array(params["b_int"])))
        fc_out.weight.copy_(torch.tensor(np.array(params["w_out"]).T))
        fc_out.bias.copy_(torch.tensor(np.array(params["b_out"])))
    x = np.random.RandomState(11).randn(16, 5)
    with torch.no_grad():
        h = torch.tanh(fc_in(torch.tensor(x)))
        h = torch.tanh(fc_int(h))
        want = fc_out(h)
    got = fnn.apply_simulator(params, jnp.array(x), width_dim=2)
    np.testing.assert_allclose(np.array(got), want.numpy(), rtol=1e-6,
                               atol=1e-7)


# ---------------------------------------------------------------- LSTM

def test_lstm_matches_torch():
    """Forward parity against torch.nn.LSTM(bias=False, 3 layers) +
    last-step linear readout (Model_NN/Functions.py:255-339)."""
    torch = pytest.importorskip("torch")
    params = lstm.init(jax.random.PRNGKey(0), dtype=jnp.float64)
    tl = torch.nn.LSTM(5, 50, num_layers=3, bias=False, batch_first=True).double()
    with torch.no_grad():
        for l in range(3):
            getattr(tl, f"weight_ih_l{l}").copy_(
                torch.tensor(np.array(params["layers"][l]["w_ih"]).T))
            getattr(tl, f"weight_hh_l{l}").copy_(
                torch.tensor(np.array(params["layers"][l]["w_hh"]).T))
    ro = torch.nn.Linear(50, 4, bias=True).double()
    with torch.no_grad():
        ro.weight.copy_(torch.tensor(np.array(params["w_out"]).T))
        ro.bias.copy_(torch.tensor(np.array(params["b_out"])))
    x = np.random.RandomState(3).randn(8, 10, 5)
    with torch.no_grad():
        h, _ = tl(torch.tensor(x))
        want = ro(h[:, -1, :]).numpy()
    got = lstm.apply(params, jnp.array(x))
    np.testing.assert_allclose(np.array(got), want, rtol=1e-6, atol=1e-8)


def test_lstm_batch_free_and_vmap_agree():
    params = lstm.init(jax.random.PRNGKey(1))
    x = jnp.asarray(np.random.RandomState(0).randn(6, 10, 5), jnp.float32)
    batched = lstm.apply(params, x)
    single = jax.vmap(lambda xi: lstm.apply(params, xi))(x)
    np.testing.assert_allclose(np.array(batched), np.array(single),
                               rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------- datasets

def test_window_indices_padding():
    idx = datasets.window_indices(5, 3)
    np.testing.assert_array_equal(idx[0], [0, 0, 0])
    np.testing.assert_array_equal(idx[1], [0, 0, 1])
    np.testing.assert_array_equal(idx[4], [2, 3, 4])


def test_windows_match_reference_semantics():
    """CreateDataset parity: window ends at i (row-0 front padding),
    target is the value at i+1 (clamped at the trajectory end)."""
    feats = np.arange(12).reshape(6, 2).astype(float)
    targ = np.arange(6).astype(float) * 10
    x, y = datasets.windows(feats, targ, lookback=3)
    assert x.shape == (6, 3, 2)
    np.testing.assert_array_equal(x[0], [feats[0], feats[0], feats[0]])
    np.testing.assert_array_equal(x[2], [feats[0], feats[1], feats[2]])
    np.testing.assert_array_equal(y, [10, 20, 30, 40, 50, 50])


def test_split_trajectory_ordered():
    tr, va, te = datasets.split_603030(100)
    assert (tr.stop, va.stop, te.stop) == (60, 80, 100)


# ---------------------------------------------------------------- MPC loss

def test_mpc_loss_runs_and_differentiates():
    kc, ks = jax.random.split(jax.random.PRNGKey(0))
    cp, _ = fnn.init(kc)
    sp = lstm.init(ks)
    B, L = 8, 10
    rng = np.random.RandomState(0)
    x_ctrl = jnp.asarray(rng.randn(B, 3), jnp.float32) * 0.3
    window = jnp.asarray(rng.randn(B, L, 5), jnp.float32) * 0.3

    def loss(p):
        u = fnn.apply(p, x_ctrl)
        l, out = mpc_loss.mpc_loss(p, sp, x_ctrl, u, window, horizon=10,
                                   alpha=20.0)
        return l

    l, g = jax.value_and_grad(loss)(cp)
    assert np.isfinite(float(l))
    flat = jax.tree.leaves(jax.tree.map(lambda a: np.abs(np.array(a)).sum(), g))
    assert sum(flat) > 0  # gradients flow through the full unroll


def test_mpc_loss_decomposition_consistent():
    kc, ks = jax.random.split(jax.random.PRNGKey(1))
    cp, _ = fnn.init(kc)
    sp = lstm.init(ks)
    rng = np.random.RandomState(1)
    x_ctrl = jnp.asarray(rng.randn(4, 3), jnp.float32) * 0.2
    window = jnp.asarray(rng.randn(4, 10, 5), jnp.float32) * 0.2
    u = fnn.apply(cp, x_ctrl)
    l, out = mpc_loss.mpc_loss(cp, sp, x_ctrl, u, window, horizon=5, alpha=20.0)
    assert out.loss.shape == (4,)
    assert out.prediction.shape == (4, 5)
    np.testing.assert_allclose(float(l), float(np.mean(np.array(out.loss))),
                               rtol=1e-6)
    # error + command <= total (constraint cost is nonnegative)
    assert np.all(np.array(out.error + out.command) <= np.array(out.loss) + 1e-6)


# ---------------------------------------------------------------- training

def test_supervised_training_reduces_loss():
    rng = np.random.RandomState(0)
    x = rng.randn(2000, 3).astype(np.float32)
    w_true = np.array([[0.5], [-0.3], [0.1]], np.float32)
    y = np.tanh(x @ w_true).astype(np.float32)
    params, _ = fnn.init(jax.random.PRNGKey(0))
    params, report = train.train_supervised(
        params, x[:1600], y[:1600], x[1600:], y[1600:], epochs=20,
        batch_size=256)
    assert report.val_losses[-1] < report.val_losses[0]
    assert report.val_losses[-1] < 0.06


def test_surrogate_training_reduces_loss():
    rng = np.random.RandomState(0)
    x = rng.randn(600, 10, 5).astype(np.float32) * 0.3
    y = x[:, -1, :4] * 0.9  # learnable next-step map
    params = lstm.init(jax.random.PRNGKey(0))
    params, report = train.train_surrogate(
        params, x[:500], y[:500], x[500:], y[500:], epochs=40, batch_size=64)
    assert report.val_losses[-1] < report.val_losses[0] * 0.5


def test_unsupervised_training_step_runs():
    kc, ks = jax.random.split(jax.random.PRNGKey(0))
    cp, _ = fnn.init(kc)
    sp = lstm.init(ks)
    rng = np.random.RandomState(0)
    x = rng.randn(60, 3).astype(np.float32) * 0.3
    u = rng.randn(60, 1).astype(np.float32) * 0.1
    z = rng.randn(60, 10, 5).astype(np.float32) * 0.3
    cp, report = train.train_unsupervised(
        cp, sp, x[:45], u[:45], z[:45], x[45:], u[45:],
        horizon=5, epochs=2, batch_size=15)
    assert len(report.train_losses) == 2
    assert np.all(np.isfinite(report.train_losses))


def test_plant_in_loop_training_step_runs():
    """Analytic-policy-gradient trainer: gradients flow through the true
    RK4 plant rollout and produce finite, decreasing-ish losses."""
    cp, _ = fnn.init(jax.random.PRNGKey(0), dtype=jnp.float32)
    in_sc = scalers.Scaler(jnp.zeros(3), jnp.asarray([0.4, 0.15, 0.4]))
    u_sc = scalers.Scaler(jnp.zeros(1), jnp.asarray([0.2]))
    cp, report = train.train_plant_in_loop(
        cp, in_sc, u_sc, t_steps=20, n_traj=2, steps=3, lr=1e-3, seed=0)
    assert len(report.train_losses) == 3
    assert np.all(np.isfinite(report.train_losses))
    # parameters actually moved
    assert float(jnp.abs(cp["w_out"]).sum()) > 0


def test_per_trajectory_windows_no_boundary_crossing():
    """With traj_len set, windows are front-clamped at each trajectory
    start and next-step targets never peek across a reset (reference's
    per-trajectory get_individual_dataset semantics)."""
    n, L, lookback = 12, 4, 3
    feats = np.arange(n, dtype=float)[:, None]
    targ = np.arange(n, dtype=float)[:, None]
    rec = np.arange(n, dtype=float)[:, None]
    x, y, z = datasets.unsupervised_triples(feats, targ, rec, lookback,
                                            traj_len=L)
    # first row of trajectory 1 (i=4): window clamps to [4,4,4]
    np.testing.assert_allclose(z[4].ravel(), [4, 4, 4])
    # last row of trajectory 0 (i=3): target repeats its own last command
    assert y[3, 0] == 3.0
    assert y[2, 0] == 3.0
    # interior rows unchanged
    np.testing.assert_allclose(z[6].ravel(), [4, 5, 6])

    xw, yw = datasets.windows(rec, rec, lookback, traj_len=L)
    np.testing.assert_allclose(xw[8].ravel(), [8, 8, 8])
    assert yw[7, 0] == 7.0


def test_append_prediction_and_shift():
    """Data.append_prediction / shift_commands parity
    (Supervised Learning/Functions.py:240-331)."""
    import numpy as np

    from forging_control_tpu.nn import datasets

    table = {"u": np.array([1.0, 2.0, 3.0])}
    datasets.append_prediction(table, "u", np.array([[10.0], [20.0], [30.0]]))
    np.testing.assert_array_equal(table["NN(u)"], [10.0, 20.0, 30.0])
    datasets.append_prediction(table, "u_shift", np.array([10.0, 20.0, 30.0]),
                               shift=True, fill=0.0)
    np.testing.assert_array_equal(table["NN(u_shift)"], [0.0, 10.0, 20.0])


def test_torch_compat_fnn_reference_weights():
    """fnn_from_torch loads the reference's shipped controller state_dict
    and reproduces the torch forward pass exactly."""
    torch = pytest.importorskip("torch")
    from forging_control_tpu.nn import torch_compat

    path = ("/root/reference/Supervised Learning/results/"
            "NN_controller_N_10_0.pt")
    if not os.path.exists(path):
        pytest.skip("reference weights not present")
    params = torch_compat.fnn_from_torch(path, dtype=jnp.float64)
    sd = torch.load(path, map_location="cpu", weights_only=True)
    x = np.random.default_rng(0).uniform(-1, 1, (32, 3))

    # width_dim = 1 in the reference: fc_int is never applied in forward
    # (Supervised Learning/Functions.py:168-171 loops width_dim - 1 times)
    xt = torch.tensor(x, dtype=torch.float64)
    h = torch.relu(xt @ sd["fc_inp.weight"].double().T
                   + sd["fc_inp.bias"].double())
    expect = torch.clamp(h @ sd["fc_out.weight"].double().T, -1, 1).numpy()

    got = np.asarray(fnn.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, expect, rtol=0, atol=1e-12)


def test_torch_compat_lstm_reference_weights():
    """lstm_from_torch loads the reference's shipped surrogate and matches
    torch's LSTM forward (bias-free cells + biased readout)."""
    torch = pytest.importorskip("torch")
    from forging_control_tpu.nn import torch_compat

    path = ("/root/reference/Unsupervised Learning/Model_NN/results/"
            "model_NN.pt")
    if not os.path.exists(path):
        pytest.skip("reference weights not present")
    params = torch_compat.lstm_from_torch(path, dtype=jnp.float64)
    sd = torch.load(path, map_location="cpu", weights_only=True)

    net = torch.nn.LSTM(5, 50, 3, bias=False, batch_first=True).double()
    with torch.no_grad():
        for l in range(3):
            getattr(net, f"weight_ih_l{l}").copy_(
                sd[f"lstm.weight_ih_l{l}"].double())
            getattr(net, f"weight_hh_l{l}").copy_(
                sd[f"lstm.weight_hh_l{l}"].double())
    x = np.random.default_rng(1).uniform(-1, 1, (4, 10, 5))
    with torch.no_grad():
        h, _ = net(torch.tensor(x))
        expect = (h[:, -1] @ sd["fc.weight"].double().T
                  + sd["fc.bias"].double()).numpy()
    got = np.asarray(lstm.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, expect, rtol=0, atol=1e-10)


def test_scaler_from_sklearn_all_kinds():
    sk_pre = pytest.importorskip("sklearn.preprocessing")
    from forging_control_tpu.nn import torch_compat

    x = np.random.default_rng(2).normal(3.0, 2.0, (100, 4))
    for cls in (sk_pre.MaxAbsScaler, sk_pre.MinMaxScaler,
                sk_pre.StandardScaler, sk_pre.RobustScaler):
        sk = cls().fit(x)
        ours = torch_compat.scaler_from_sklearn(sk)
        np.testing.assert_allclose(np.asarray(ours.transform(jnp.asarray(x))),
                                   sk.transform(x), rtol=0, atol=1e-12)
        np.testing.assert_allclose(
            np.asarray(ours.inverse(ours.transform(jnp.asarray(x)))), x,
            rtol=0, atol=1e-9)


def test_dagger_trainer_runs_and_labels():
    """DAgger: the shadow MPC teacher labels the student's own closed-loop
    states (finite labels, correct shapes) and the aggregate-retrain loop
    returns usable parameters (VERDICT r3 task 1 machinery)."""
    from forging_control_tpu.solver import sqp

    cp, _ = fnn.init(jax.random.PRNGKey(0), dtype=jnp.float32)
    in_sc = scalers.Scaler(jnp.zeros(3), jnp.asarray([0.4, 0.15, 0.4]))
    u_sc = scalers.Scaler(jnp.zeros(1), jnp.asarray([0.2]))
    cfg = sqp.MPCConfig(horizon=4, variant="smooth", gn_iters=2, al_iters=1)

    refs = jnp.full((2, 6), 0.3, jnp.float32)
    feats, labels = train.dagger_rollout(
        cp, in_sc, u_sc, cfg, refs, jax.random.PRNGKey(1))
    assert feats.shape == (2, 6, 3) and labels.shape == (2, 6)
    assert np.all(np.isfinite(np.asarray(feats)))
    assert np.all(np.isfinite(np.asarray(labels)))
    # Labels are genuine solver output, not the student's own commands.
    stud = jax.vmap(jax.vmap(fnn.make_policy(cp, in_sc, u_sc),
                             in_axes=(0, 0, None)), in_axes=(0, 0, None))(
        jnp.zeros((2, 6, 5)), refs, 0.0)
    assert float(jnp.abs(labels - stud).max()) > 1e-6

    rng = np.random.default_rng(0)
    x0d = rng.normal(size=(32, 3)).astype(np.float32)
    u0d = np.tanh(x0d.sum(1, keepdims=True)).astype(np.float32)
    p2, rep = train.train_dagger(
        cp, in_sc, u_sc, x0d, u0d, x0d[:8], u0d[:8], mpc_cfg=cfg,
        rounds=2, n_traj=2, t_steps=6, epochs=2, batch_size=8, seed=0)
    assert np.all(np.isfinite(rep.train_losses))
    assert float(jnp.abs(p2["w_out"]).sum()) > 0
