"""ICCLIM / ECA&D virtual module — indicators generated from YAML text,
exactly like the reference's ``src/xclim/data/icclim.yml`` virtual module
(built by ``build_indicator_module_from_yaml``, indicator.py:1761).

Most entries inherit a base spec from the atmos module and override
identifier/threshold/parameters, mirroring the reference's ``base:`` key.
"""

from __future__ import annotations

from .core import build_indicator_module_from_yaml
from . import atmos as _atmos  # noqa: F401  (registers base specs first)
from . import land as _land  # noqa: F401  (SD/SD1/SD5cm/SD50cm bases)

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
  TGx:
    base: tg_max
    title: Maximum of daily mean temperature
  TGn:
    base: tg_min
    title: Minimum of daily mean temperature
  TXn:
    base: tx_min
    title: Minimum of daily maximum temperature
  TNx:
    base: tn_max
    title: Maximum of daily minimum temperature
  TG90p:
    base: tg90p
    title: Days with TG above the 90th percentile (warm days)
  TG10p:
    base: tg10p
    title: Days with TG below the 10th percentile (cold days)
  TX90p:
    base: tx90p
    title: Days with TX above the 90th percentile (warm day-times)
  TX10p:
    base: tx10p
    title: Days with TX below the 10th percentile (cold day-times)
  TN90p:
    base: tn90p
    title: Days with TN above the 90th percentile (warm nights)
  TN10p:
    base: tn10p
    title: Days with TN below the 10th percentile (cold nights)
  CSDI:
    base: cold_spell_duration_index
    title: Cold-spell duration index
    parameters:
      window: 6
  WSDI:
    base: warm_spell_duration_index
    title: Warm-spell duration index
    parameters:
      window: 6
  GSL:
    base: growing_season_length
    title: Growing season length
    parameters:
      thresh: "5.0 degC"
      window: 6
  HI:
    base: huglin_index
    title: Huglin heliothermal index
    parameters:
      thresh: "10 degC"
      start_date: "04-01"
      end_date: "11-01"
  BEDD:
    base: biologically_effective_degree_days
    title: Biologically effective growing degree days
    parameters:
      method: icclim
      thresh_tasmin: "10 degC"
      max_daily_degree_days: "9 degC"
      start_date: "04-01"
      end_date: "10-01"
      low_dtr: null
      high_dtr: null
  RR:
    base: prcptot
    title: Precipitation sum
  R75p:
    base: days_over_precip_thresh
    title: Days with precipitation over the 75th percentile of wet days
  R95p:
    base: days_over_precip_thresh
    title: Days with precipitation over the 95th percentile of wet days
  R99p:
    base: days_over_precip_thresh
    title: Days with precipitation over the 99th percentile of wet days
  R75pTOT:
    base: fraction_over_precip_thresh
    title: Precipitation fraction due to moderate wet days (>75th percentile)
  R95pTOT:
    base: fraction_over_precip_thresh
    title: Precipitation fraction due to very wet days (>95th percentile)
  R99pTOT:
    base: fraction_over_precip_thresh
    title: Precipitation fraction due to extremely wet days (>99th percentile)
  SD:
    base: snow_depth
    realm: land
    title: Mean of daily snow depth
  SD1:
    base: snd_season_length
    realm: land
    title: Snow days (SD >= 1 cm)
    parameters:
      thresh: "1 cm"
  SD5cm:
    base: snd_season_length
    realm: land
    title: Snow days (SD >= 5 cm)
    parameters:
      thresh: "5 cm"
  SD50cm:
    base: snd_season_length
    realm: land
    title: Snow days (SD >= 50 cm)
    parameters:
      thresh: "50 cm"
  CD:
    base: cold_and_dry_days
    title: Cold and dry days
  CW:
    base: cold_and_wet_days
    title: Cold and wet days
  WD:
    base: warm_and_dry_days
    title: Warm and dry days
  WW:
    base: warm_and_wet_days
    title: Warm and wet days
"""

icclim = build_indicator_module_from_yaml("icclim", _ICCLIM_YML)
