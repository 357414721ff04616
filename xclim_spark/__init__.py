"""xclim_spark — a PySpark-native climate/time-series indicator engine.

A from-scratch re-expression of the capabilities of Ouranosinc/xclim
(reference studied read-only at /root/reference) on the Spark DataFrame
API: calendar-anchored resampling, threshold/run-length/spell statistics,
percentile climatologies, unit algebra, missing-data masks, distribution
fitting, ensemble statistics — plus large-scale training-data pipeline
operators (dedup, similarity search, text analysis).

Design stance (see SURVEY.md §7): long-format fact tables
``(time, cell..., var...)``; all metadata/unit logic in the driver;
executors run pure Column expressions, with Arrow-batched pandas UDFs
reserved for scipy-tier math and stateful kernels.
"""

__version__ = "0.3.0"

from . import analog, calendar, calendar360, dataflags, datachecks  # noqa: F401
from . import ensembles, options, stats, units  # noqa: F401
from .operators import agro, fire, generic, missing, percentile  # noqa: F401
from .operators import run_length  # noqa: F401
from .options import set_options  # noqa: F401  (reference: xclim.set_options)
from .session import session  # noqa: F401  (recommended Spark config)
