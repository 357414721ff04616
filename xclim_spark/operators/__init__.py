from . import generic, missing, percentile, run_length  # noqa: F401
