from . import checkpoint, notify, profiling, progress, timer  # noqa: F401
