from . import checkpoint, profiling, timer  # noqa: F401
