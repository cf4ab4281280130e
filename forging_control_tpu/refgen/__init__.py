from . import streams  # noqa: F401
from .streams import reference_table, sample_references  # noqa: F401
