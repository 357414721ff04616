"""ICCLIM / ECA&D virtual module — indicators generated from YAML text,
exactly like the reference's ``src/xclim/data/icclim.yml`` virtual module
(built by ``build_indicator_module_from_yaml``, indicator.py:1761).

Most entries inherit a base spec from the atmos module and override
identifier/threshold/parameters, mirroring the reference's ``base:`` key.
"""

from __future__ import annotations

from .core import build_indicator_module_from_yaml
from . import atmos as _atmos  # noqa: F401  (registers base specs first)

_ICCLIM_YML = """
indicators:
  TG:
    base: tg_mean
    title: Mean of daily mean temperature
  TX:
    base: tg_mean
    input: {data: tasmax}
    title: Mean of daily maximum temperature
  TN:
    base: tg_mean
    input: {data: tasmin}
    title: Mean of daily minimum temperature
  TXx:
    base: tx_max
    title: Maximum of daily maximum temperature
  TNn:
    base: tn_min
    title: Minimum of daily minimum temperature
  SU:
    base: summer_days
    title: Summer days (tasmax > 25 degC)
  FD:
    base: frost_days
    title: Frost days (tasmin < 0 degC)
  ID:
    base: ice_days
    title: Ice days (tasmax < 0 degC)
  TR:
    base: tropical_nights
    title: Tropical nights (tasmin > 20 degC)
  GD4:
    base: growing_degree_days
    title: Growing degree days (sum of tas > 4 degC)
    parameters:
      thresh: "4.0 degC"
  HD17:
    base: heating_degree_days
    title: Heating degree days (sum of 17 degC - tas)
    parameters:
      thresh: "17.0 degC"
  CDD:
    base: maximum_consecutive_dry_days
    title: Maximum consecutive dry days (pr < 1 mm/d)
  CWD:
    base: maximum_consecutive_wet_days
    title: Maximum consecutive wet days (pr >= 1 mm/d)
  CSU:
    base: maximum_consecutive_wet_days
    identifier: CSU
    title: Maximum consecutive summer days (tasmax > 25 degC)
    input: {data: tasmax}
    parameters:
      thresh: {default: "25.0 degC", units: degC}
      op: ">"
  CFD:
    base: maximum_consecutive_dry_days
    identifier: CFD
    title: Maximum consecutive frost days (tasmin < 0 degC)
    input: {data: tasmin}
    parameters:
      thresh: {default: "0.0 degC", units: degC}
  RR1:
    base: wetdays
    title: Wet days (pr >= 1 mm/d)
  R10mm:
    base: wetdays
    title: Heavy precipitation days (pr >= 10 mm/d)
    parameters:
      thresh: "10.0 mm/d"
  R20mm:
    base: wetdays
    title: Very heavy precipitation days (pr >= 20 mm/d)
    parameters:
      thresh: "20.0 mm/d"
  SDII:
    base: daily_pr_intensity
    title: Simple daily intensity index
  RX1day:
    base: rx1day
    title: Highest 1-day precipitation amount
  RX5day:
    base: max_n_day_precipitation_amount
    title: Highest 5-day precipitation amount
    parameters:
      window: 5
  PRCPTOT:
    base: precip_accumulation
    title: Total precipitation on wet days
  ETR:
    base: extreme_temperature_range
    title: Extreme temperature range
  DTR:
    base: daily_temperature_range
    title: Mean diurnal temperature range
  vDTR:
    base: daily_temperature_range_variability
    title: Mean absolute day-to-day difference of DTR
"""

icclim = build_indicator_module_from_yaml("icclim", _ICCLIM_YML)
