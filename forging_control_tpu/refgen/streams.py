"""Deterministic speed-reference streams.

The reference generates a piecewise-constant speed reference that flips sign
every half-trajectory (150 steps of 1 ms), drawing each plateau from CPython's
``random`` module with a seed derived from wall-clock trajectory index
(``Generate Data/template_mpc.py:57-84``).  Because the seed depends only on
``t_now // T_REF`` (the trajectory index) and the first draw after seeding,
the whole stream is a pure function of the trajectory index — so we
re-implement CPython's MT19937 ``init_by_array`` seeding + 53-bit double
recipe exactly (host-side NumPy, verified bit-identical against CPython) and
precompute reference arrays that feed the on-device `lax.scan` loops.

Two generators are provided:

* :func:`reference_table` — exact CPython-parity streams for the four
  reference variants (for golden-parity runs against recorded datasets).
* :func:`sample_references` — counter-based `jax.random` streams for new
  large-scale dataset generation (vmap/shard-friendly, no sequential seeding).

Variant seed/amplitude table (template_mpc.py of each experiment dir):

  generate    seeds k+150 / k+10**6        ref  0.9*r        / -0.9*r
  supervised  seeds k+300 / k+20**6        ref  0.8*r + 0.1  / -0.8*r - 0.1
  unsupervised  (same as supervised)
  model_nn    seeds k+250 / k+10**6+100    ref  0.8*r + 0.1  / -0.8*r - 0.1
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

T_TRAJ_STEPS = 300       # steps per trajectory (Generate Data/template_mpc.py:60)
HALF_STEPS = T_TRAJ_STEPS // 2

_VARIANTS = {
    # name: (work_bias, return_bias, gain, offset)
    "generate": (150, 10 ** 6, 0.9, 0.0),
    "supervised": (300, 20 ** 6, 0.8, 0.1),
    "unsupervised": (300, 20 ** 6, 0.8, 0.1),
    "model_nn": (150 + 100, 10 ** 6 + 100, 0.8, 0.1),
}


# ---------------------------------------------------------------------------
# Exact CPython MT19937 (init_by_array seeding + genrand_res53 first draw)
# ---------------------------------------------------------------------------

def _mt_init_genrand(s: int) -> np.ndarray:
    mt = np.empty(624, dtype=np.uint64)
    mt[0] = s & 0xFFFFFFFF
    for i in range(1, 624):
        mt[i] = (1812433253 * (mt[i - 1] ^ (mt[i - 1] >> np.uint64(30))) + i) & 0xFFFFFFFF
    return mt


def _mt_init_by_array(key) -> np.ndarray:
    mt = _mt_init_genrand(19650218)
    i, j = 1, 0
    for _ in range(max(624, len(key))):
        mt[i] = ((mt[i] ^ ((mt[i - 1] ^ (mt[i - 1] >> np.uint64(30))) * 1664525)) + key[j] + j) & 0xFFFFFFFF
        i += 1
        j += 1
        if i >= 624:
            mt[0] = mt[623]
            i = 1
        if j >= len(key):
            j = 0
    for _ in range(623):
        mt[i] = ((mt[i] ^ ((mt[i - 1] ^ (mt[i - 1] >> np.uint64(30))) * 1566083941)) - i) & 0xFFFFFFFF
        i += 1
        if i >= 624:
            mt[0] = mt[623]
            i = 1
    mt[0] = 0x80000000
    return mt


def cpython_first_random(seed: int) -> float:
    """Bit-exact ``random.seed(seed); random.random()`` for int seeds >= 0.

    CPython seeds MT19937 via init_by_array over the integer's 32-bit limbs
    and draws doubles with the 53-bit (a>>5, b>>6) recipe; both are
    replicated here so reference streams reproduce without CPython's global
    RNG.  (Float seeds in the reference are integral-valued, and CPython
    hashes them back to the same int.)
    """
    seed = int(seed)
    key = [seed & 0xFFFFFFFF]
    s = seed >> 32
    while s:
        key.append(s & 0xFFFFFFFF)
        s >>= 32
    mt = [int(v) for v in _mt_init_by_array(key)]

    # Twist + temper only outputs 0 and 1; both read pre-twist state at
    # indices < 399, so no sequential in-place update is needed.
    def twist_at(i):
        y = (mt[i] & 0x80000000) | (mt[i + 1] & 0x7FFFFFFF)
        return mt[i + 397] ^ (y >> 1) ^ (0x9908B0DF if y & 1 else 0)

    def temper(y):
        y ^= y >> 11
        y ^= (y << 7) & 0x9D2C5680
        y ^= (y << 15) & 0xEFC60000
        y ^= y >> 18
        return y & 0xFFFFFFFF

    a = temper(twist_at(0)) >> 5
    b = temper(twist_at(1)) >> 6
    return (a * 67108864.0 + b) * (1.0 / 9007199254740992.0)


def reference_pair(traj_idx: int, variant: str = "generate") -> tuple[float, float]:
    """(work_ref, return_ref) plateau values for one trajectory, CPython-exact."""
    wb, rb, gain, off = _VARIANTS[variant]
    r_work = cpython_first_random(traj_idx + wb)
    r_ret = cpython_first_random(traj_idx + rb)
    return gain * r_work + off, -(gain * r_ret + off)


def reference_table(n_traj: int, variant: str = "generate", t_steps: int = T_TRAJ_STEPS) -> np.ndarray:
    """(n_traj, t_steps) array of per-step references, CPython-exact.

    Step t < t_steps/2 uses the work plateau, the rest the return plateau —
    the `< T_REF/2` branch of ``Generate Data/template_mpc.py:68-82``.
    """
    out = np.empty((n_traj, t_steps))
    half = t_steps // 2
    for k in range(n_traj):
        w, r = reference_pair(k, variant)
        out[k, :half] = w
        out[k, half:] = r
    return out


# ---------------------------------------------------------------------------
# Counter-based JAX streams for at-scale dataset generation
# ---------------------------------------------------------------------------

def sample_references(key, n_traj: int, variant: str = "generate",
                      t_steps: int = T_TRAJ_STEPS, dtype=jnp.float32):
    """vmap-friendly reference batch from a counter-based PRNG.

    Same plateau distribution as the reference variant, but drawn from
    ``jax.random`` with per-trajectory fold_in — no sequential host seeding,
    so it shards cleanly over a scenario mesh.  Declared in config as the
    non-parity RNG (reference CPython streams can't be generated on-device).
    """
    _, _, gain, off = _VARIANTS[variant]
    kw, kr = jax.random.split(key)
    r_work = jax.random.uniform(kw, (n_traj,), dtype=dtype)
    r_ret = jax.random.uniform(kr, (n_traj,), dtype=dtype)
    work = gain * r_work + off
    ret = -(gain * r_ret + off)
    half = t_steps // 2
    step_is_work = (jnp.arange(t_steps) % t_steps) < half
    return jnp.where(step_is_work[None, :], work[:, None], ret[:, None])
