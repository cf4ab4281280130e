from . import datasets, fnn, lstm, mpc_loss, scalers, surrogate_eval, train  # noqa: F401
