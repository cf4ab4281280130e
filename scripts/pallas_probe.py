"""One-command Pallas-on-TPU probe (round-5 item 8).

Compiles and runs a minimal 8x128 elementwise ``pallas_call`` on the
default device and prints ONE JSON line with the outcome.  Run under a
timeout — the historical failure mode in this environment is a HANG in
the remote-attach Mosaic compile service (not an exception):

  timeout 120 python scripts/pallas_probe.py; echo "rc=$?"

rc=124 (timeout) reproduces the documented block; rc=0 with
``{"ok": true}`` means Mosaic works again and the already-written
on-TPU A/Bs should be run (ops/smallchol.py chol_solve_pallas vs
unrolled, ops/lstm_pallas.py vs nn/lstm — see docs/RESULTS.md
"Pallas status").
"""

import json
import sys
import time


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...] * 2.0 + 1.0

    x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
    t0 = time.perf_counter()
    fn = jax.jit(lambda a: pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype))(a))
    y = fn(x)
    y.block_until_ready()
    ok = bool(jnp.allclose(y, x * 2.0 + 1.0))
    print(json.dumps({"ok": ok, "device": str(jax.devices()[0]),
                      "compile_plus_run_s": round(
                          time.perf_counter() - t0, 2)}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
