from . import launcher, mesh  # noqa: F401
