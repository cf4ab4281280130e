"""Feature scalers as JAX pytrees.

Replaces the reference's sklearn scalers (selected via ``Data.get_scaler``,
``Supervised Learning/Functions.py:204-237``: maxabs / minmax / standard /
robust; MaxAbs is what every experiment actually uses).  A scaler is a
NamedTuple of arrays, so it jits into device programs (the reference
instead round-trips through sklearn on the host every control step).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class Scaler(NamedTuple):
    """Affine scaler: transform(x) = (x - shift) / scale."""

    shift: jnp.ndarray
    scale: jnp.ndarray

    def transform(self, x):
        return (x - self.shift) / self.scale

    def inverse(self, xs):
        return xs * self.scale + self.shift


def _nonzero(s):
    # sklearn semantics: zero scales are replaced by 1
    return np.where(np.asarray(s) == 0, 1.0, s)


def fit_maxabs(x) -> Scaler:
    x = np.asarray(x)
    scale = _nonzero(np.max(np.abs(x), axis=0))
    return Scaler(jnp.zeros_like(jnp.asarray(scale)), jnp.asarray(scale))


def fit_minmax(x, feature_range=(0.0, 1.0)) -> Scaler:
    x = np.asarray(x)
    lo, hi = np.min(x, axis=0), np.max(x, axis=0)
    a, b = feature_range
    scale = _nonzero((hi - lo) / (b - a))
    shift = lo - a * scale
    return Scaler(jnp.asarray(shift), jnp.asarray(scale))


def fit_standard(x) -> Scaler:
    x = np.asarray(x)
    return Scaler(jnp.asarray(np.mean(x, axis=0)),
                  jnp.asarray(_nonzero(np.std(x, axis=0))))


def fit_robust(x) -> Scaler:
    x = np.asarray(x)
    med = np.median(x, axis=0)
    q75, q25 = np.percentile(x, 75, axis=0), np.percentile(x, 25, axis=0)
    return Scaler(jnp.asarray(med), jnp.asarray(_nonzero(q75 - q25)))


FITTERS = {
    "maxabs": fit_maxabs,
    "minmax": fit_minmax,
    "standard": fit_standard,
    "robust": fit_robust,
}


def fit(kind: str, x) -> Scaler:
    """get_scaler equivalent (Supervised Learning/Functions.py:204-237)."""
    return FITTERS[kind](x)
