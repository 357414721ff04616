"""Scalar function library: thermodynamic/physical converters.

Pure Column-expression builders (JVM-side, whole-stage codegen) — the
Spark re-expression of ``src/xclim/indices/converters.py``.
"""

from .converters import *  # noqa: F401,F403
from .converters import __all__ as _conv_all

__all__ = list(_conv_all)
