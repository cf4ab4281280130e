from . import metrics, report  # noqa: F401
