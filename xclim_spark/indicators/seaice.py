"""Sea-ice realm named indicators (reference
``src/xclim/indicators/seaIce/_seaice.py``; indices
``_threshold.py:3058-3134``)."""

from __future__ import annotations

from .core import build_indicator_module

_SPECS = [
    dict(identifier="sea_ice_area", realm="seaIce",
         compute="weighted_domain_sum",
         title="Sea ice area", units="m2",
         long_name="Total area of ocean cells weighted by sea-ice "
                   "concentration where concentration {op} {thresh}",
         input={"data": "siconc", "weight": "areacello"},
         parameters={"thresh": {"default": 0.15, "kind": "number"},
                     "op": {"default": ">=", "kind": "string"},
                     "extent": {"default": False, "kind": "bool"},
                     "freq": {"default": "D", "kind": "freq"}},
         references="ref _threshold.py:3058 sea_ice_area"),
    dict(identifier="sea_ice_extent", realm="seaIce",
         compute="weighted_domain_sum",
         title="Sea ice extent", units="m2",
         long_name="Total area of ocean cells where sea-ice "
                   "concentration {op} {thresh}",
         input={"data": "siconc", "weight": "areacello"},
         parameters={"thresh": {"default": 0.15, "kind": "number"},
                     "op": {"default": ">=", "kind": "string"},
                     "extent": {"default": True, "kind": "bool"},
                     "freq": {"default": "D", "kind": "freq"}},
         references="ref _threshold.py:3097 sea_ice_extent"),
]

seaIce = build_indicator_module("seaIce", _SPECS)
