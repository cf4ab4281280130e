"""Load the reference's trained torch weights and sklearn scalers.

Migration helpers: a user of the reference has ``results/*.pt`` state
dicts (``Supervised Learning/Main.py:280``,
``Unsupervised Learning/Model_NN/Main.py:242``) and pickled sklearn
scalers (``Supervised Learning/Main.py:230-231``).  These convert them
into this framework's pytrees so the shipped artifacts run unchanged in
our closed-loop engine (cross-validated by
``scripts/reference_weights_eval.py`` and
``scripts/surrogate_drift_compare.py``).

torch is an optional dependency here — only the loading path needs it.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .scalers import Scaler


def _state_dict(source):
    if isinstance(source, (str, bytes)):
        import torch
        return torch.load(source, map_location="cpu", weights_only=True)
    return source


def _np(t):
    return t.numpy() if hasattr(t, "numpy") else np.asarray(t)


def fnn_from_torch(source, dtype=jnp.float32):
    """FNNModel state_dict -> our fnn params.

    Layout per the reference (``Supervised Learning/Functions.py:113-178``):
    ``fc_inp`` -> ``fc_int`` (one weight-shared intermediate layer) ->
    ``fc_out`` (no bias).  ``source`` is a path or a loaded state dict.
    """
    sd = _state_dict(source)
    return {
        "w_in": jnp.asarray(_np(sd["fc_inp.weight"]).T, dtype),
        "b_in": jnp.asarray(_np(sd["fc_inp.bias"]), dtype),
        "w_int": jnp.asarray(_np(sd["fc_int.weight"]).T, dtype),
        "b_int": jnp.asarray(_np(sd["fc_int.bias"]), dtype),
        "w_out": jnp.asarray(_np(sd["fc_out.weight"]).T, dtype),
    }


def lstm_from_torch(source, num_layers: int = 3, dtype=jnp.float32):
    """LSTMModel state_dict -> our lstm params.

    The reference LSTM is bias-free in the cells but keeps the default
    bias on the linear readout (``Model_NN/Functions.py:286-289``); torch
    gate order (i, f, g, o) matches ``nn/lstm.py``.
    """
    sd = _state_dict(source)
    layers = [
        {"w_ih": jnp.asarray(_np(sd[f"lstm.weight_ih_l{l}"]).T, dtype),
         "w_hh": jnp.asarray(_np(sd[f"lstm.weight_hh_l{l}"]).T, dtype)}
        for l in range(num_layers)
    ]
    return {"layers": layers,
            "w_out": jnp.asarray(_np(sd["fc.weight"]).T, dtype),
            "b_out": jnp.asarray(_np(sd["fc.bias"]), dtype)}


def scaler_from_sklearn(sk) -> Scaler:
    """Fitted sklearn scaler object -> our affine :class:`Scaler`.

    Supports the four kinds the reference selects between
    (``Supervised Learning/Functions.py:204-237``): MaxAbsScaler,
    MinMaxScaler, StandardScaler, RobustScaler.
    """
    name = type(sk).__name__
    if name == "MaxAbsScaler":
        return Scaler(jnp.zeros_like(jnp.asarray(sk.max_abs_)),
                      jnp.asarray(np.asarray(sk.scale_, float)))
    if name == "MinMaxScaler":
        # sklearn: x * scale_ + min_  == (x - shift) / scale
        scale = 1.0 / np.asarray(sk.scale_, float)
        shift = -np.asarray(sk.min_, float) * scale
        return Scaler(jnp.asarray(shift), jnp.asarray(scale))
    if name == "StandardScaler":
        return Scaler(jnp.asarray(np.asarray(sk.mean_, float)),
                      jnp.asarray(np.asarray(sk.scale_, float)))
    if name == "RobustScaler":
        return Scaler(jnp.asarray(np.asarray(sk.center_, float)),
                      jnp.asarray(np.asarray(sk.scale_, float)))
    raise ValueError(f"unsupported sklearn scaler {name}")
