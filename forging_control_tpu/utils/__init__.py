from . import checkpoint, notify, profiling, timer  # noqa: F401
