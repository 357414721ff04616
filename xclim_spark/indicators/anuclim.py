"""ANUCLIM virtual module — the reference's ``src/xclim/data/anuclim.yml``
(19 BIOCLIM indicators P1-P19, built by ``build_indicator_module_from_yaml``,
indicator.py:1761), backed by the quarter/seasonality kernels in
:mod:`xclim_spark.operators.anuclim`.

Spec table transcribed 1:1 from anuclim.yml: identifier, compute and the
warmest/coldest/wettest/driest parameter injections.  The reference's
``src_timestep`` weekly/monthly switch is fixed at monthly here (the
quarter kernels reduce daily input to months first — _anuclim.py:562).
"""

from __future__ import annotations

from .core import build_indicator_module

_T = {"data": "tas"}
_P = {"data": "pr"}
_FREQ = {"freq": {"default": "YS", "kind": "freq"}}


def _spec(ident, compute, input_, params, title, units=""):
    return {
        "identifier": ident,
        "compute": compute,
        "realm": "atmos",
        "title": title,
        "units": units,
        "long_name": title,
        "input": input_,
        "parameters": {**params, **_FREQ},
    }


_SPECS = [
    _spec("P1_AnnMeanTemp", "statistics", _T, {"reducer": {"default": "mean"}},
          "Annual Mean Temperature", "degC"),
    _spec("P2_MeanDiurnalRange", "diurnal_temperature_range",
          {"high_data": "tasmax", "low_data": "tasmin"},
          {"reducer": {"default": "mean"}}, "Mean Diurnal Range", "degC"),
    _spec("P3_Isothermality", "isothermality",
          {"low_data": "tasmin", "high_data": "tasmax"}, {},
          "Isothermality", "%"),
    _spec("P4_TempSeasonality", "temperature_seasonality", _T, {},
          "Temperature Seasonality (C of V)", "%"),
    _spec("P5_MaxTempWarmestPeriod", "period_extreme",
          {"data": "tasmax"},
          {"sub_op": {"default": "max"}, "select": {"default": "max"}},
          "Max Temperature of Warmest Period", "degC"),
    _spec("P6_MinTempColdestPeriod", "period_extreme",
          {"data": "tasmin"},
          {"sub_op": {"default": "min"}, "select": {"default": "min"}},
          "Min Temperature of Coldest Period", "degC"),
    _spec("P7_TempAnnualRange", "extreme_temperature_range",
          {"high_data": "tasmax", "low_data": "tasmin"}, {},
          "Temperature Annual Range", "degC"),
    _spec("P8_MeanTempWettestQuarter", "quarter_stat",
          {"data": "tas", "sel_data": "pr"},
          {"op": {"default": "mean"}, "sel_op": {"default": "sum"},
           "select": {"default": "max"}},
          "Mean Temperature of Wettest Quarter", "degC"),
    _spec("P9_MeanTempDriestQuarter", "quarter_stat",
          {"data": "tas", "sel_data": "pr"},
          {"op": {"default": "mean"}, "sel_op": {"default": "sum"},
           "select": {"default": "min"}},
          "Mean Temperature of Driest Quarter", "degC"),
    _spec("P10_MeanTempWarmestQuarter", "quarter_stat", _T,
          {"op": {"default": "mean"}, "select": {"default": "max"}},
          "Mean Temperature of Warmest Quarter", "degC"),
    _spec("P11_MeanTempColdestQuarter", "quarter_stat", _T,
          {"op": {"default": "mean"}, "select": {"default": "min"}},
          "Mean Temperature of Coldest Quarter", "degC"),
    _spec("P12_AnnualPrecip", "statistics", _P,
          {"reducer": {"default": "sum"}}, "Annual Precipitation", "mm"),
    _spec("P13_PrecipWettestPeriod", "period_extreme", _P,
          {"sub_op": {"default": "sum"}, "select": {"default": "max"}},
          "Precipitation of Wettest Period", "mm"),
    _spec("P14_PrecipDriestPeriod", "period_extreme", _P,
          {"sub_op": {"default": "sum"}, "select": {"default": "min"}},
          "Precipitation of Driest Period", "mm"),
    _spec("P15_PrecipSeasonality", "precip_seasonality", _P, {},
          "Precipitation Seasonality (C of V)", "%"),
    _spec("P16_PrecipWettestQuarter", "quarter_stat", _P,
          {"op": {"default": "sum"}, "sel_op": {"default": "sum"},
           "select": {"default": "max"}},
          "Precipitation of Wettest Quarter", "mm"),
    _spec("P17_PrecipDriestQuarter", "quarter_stat", _P,
          {"op": {"default": "sum"}, "sel_op": {"default": "sum"},
           "select": {"default": "min"}},
          "Precipitation of Driest Quarter", "mm"),
    _spec("P18_PrecipWarmestQuarter", "quarter_stat",
          {"data": "pr", "sel_data": "tas"},
          {"op": {"default": "sum"}, "sel_op": {"default": "mean"},
           "select": {"default": "max"}},
          "Precipitation of Warmest Quarter", "mm"),
    _spec("P19_PrecipColdestQuarter", "quarter_stat",
          {"data": "pr", "sel_data": "tas"},
          {"op": {"default": "sum"}, "sel_op": {"default": "mean"},
           "select": {"default": "min"}},
          "Precipitation of Coldest Quarter", "mm"),
]

anuclim = build_indicator_module("anuclim", _SPECS)
