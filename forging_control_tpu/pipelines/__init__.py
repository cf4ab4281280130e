from . import config, generate_data, supervised, surrogate, unsupervised  # noqa: F401
