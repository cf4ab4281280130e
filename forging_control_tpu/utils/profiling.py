"""Profiling hooks.

The reference brackets every controller step with ``do_mpc.tools.Timer``
and stores IPOPT wall-time phases (SURVEY.md section 5).  On TPU, per-step
host timing is meaningless (the loop lives in one device program), so:

* solver-iteration counters ride the scan carry (`sqp.Diagnostics`);
* whole-program traces come from the standard JAX profiler, wrapped here.
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """Capture a profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside jitted code (shows up in traces)."""
    return jax.profiler.TraceAnnotation(name)
