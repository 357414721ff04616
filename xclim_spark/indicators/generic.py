"""Generic realm — statistical indicators (the reference's
``src/xclim/indicators/generic/_stats.py``: ``fit``, ``stats``,
``return_level``)."""

from __future__ import annotations

from .core import build_indicator_module

_SPECS = [
    dict(identifier="fit", realm="generic", compute="fit",
         title="Distribution parameters fitted over the time dimension",
         units="", long_name="{dist} distribution parameters",
         input={"data": "data"},
         parameters={"dist": {"default": "norm", "kind": "string"},
                     "method": {"default": "ML", "kind": "string"}},
         references="ref generic/_stats.py fit; index stats.py:115"),
    dict(identifier="stats", realm="generic", compute="resample_op",
         title="Statistic of the daily values for a given period",
         units="", long_name="{op} of the daily values ({freq})",
         input={"data": "data"},
         parameters={"op": {"default": "max", "kind": "string"},
                     "freq": {"default": "YS", "kind": "freq"}},
         references="ref generic/_stats.py stats; index generic.py:83"),
    dict(identifier="return_level", realm="generic", compute="return_level",
         title="Return level from frequency analysis", units="",
         long_name="{mode} return level for {t}-year return periods "
                   "({dist})",
         input={"data": "data"},
         parameters={"t": {"default": 20, "kind": "number"},
                     "dist": {"default": "gumbel_r", "kind": "string"},
                     "mode": {"default": "max", "kind": "string"},
                     "method": {"default": "PWM", "kind": "string"},
                     "freq": {"default": "YS", "kind": "freq"}},
         references="ref generic/_stats.py return_level; index "
                    "stats.py:429 frequency_analysis"),
]

generic = build_indicator_module("generic", _SPECS)
