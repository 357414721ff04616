"""CF / clix-meta virtual module — the reference's ``src/xclim/data/cf.yml``
(55 indicators built by ``build_indicator_module_from_yaml``,
indicator.py:1761).  Unlike the ICCLIM module these do not inherit from
atmos specs: each binds a *generic* compute (``statistics``,
``spell_length``, ``count_occurrences``, ``temperature_sum``,
``thresholded_statistics``, ``diurnal_temperature_range``,
``extreme_temperature_range``, ``interday_diurnal_temperature_range``)
with parameter injection, exactly as in the YAML.

The specs are generated from compact tables rather than a 900-line YAML
blob; identifiers, computes, inputs, ops, reducers, thresholds and default
frequencies are transcribed 1:1 from cf.yml (see per-family comments).
Indicators whose clix-meta name embeds a ``TT`` placeholder (e.g.
``ctmgeTT``) take a required ``threshold`` argument, as in the reference.
"""

from __future__ import annotations

from .core import build_indicator_module

_Q = {"kind": "quantified"}


def _spec(ident, compute, data, params, title, units="", freq="YS",
          extra_input=None):
    input_ = extra_input if extra_input else {"data": data}
    return {
        "identifier": ident,
        "compute": compute,
        "realm": "atmos",
        "title": title,
        "units": units,
        "long_name": title,
        "input": input_,
        "parameters": {**params, "freq": {"default": freq, "kind": "freq"}},
    }


_SPECS: list[dict] = []

# --- spell_length family (cf.yml:21-39 cdd, :319-337 cwd, :91-318 ct**TT) --
_SPECS += [
    _spec("cdd", "spell_length", "pr",
          {"op": "<", "reducer": "max",
           "threshold": {"default": "1 mm day-1", **_Q}},
          "Maximum consecutive dry days (Precip < 1mm)", "day"),
    _spec("cwd", "spell_length", "pr",
          {"op": ">", "reducer": "max",
           "threshold": {"default": "1 mm day-1", **_Q}},
          "Maximum consecutive wet days (Precip >= 1mm)", "day"),
]
# ct{m,n,x}{ge,gt,le,lt}TT — consecutive-day spell lengths vs a required
# threshold (cf.yml:91-318).  clix-meta maps both ge/gt -> '>' and
# le/lt -> '<' in its xclim bindings (op values transcribed from the yml).
for var, v in (("m", "tas"), ("n", "tasmin"), ("x", "tasmax")):
    for suf, op in (("ge", ">"), ("gt", ">"), ("le", "<"), ("lt", "<")):
        word = {"ge": ">=", "gt": ">", "le": "<=", "lt": "<"}[suf]
        _SPECS.append(_spec(
            f"ct{var}{suf}TT", "spell_length", v,
            {"op": op, "reducer": "max", "threshold": {"default": None, **_Q}},
            f"Maximum number of consecutive days with T{var} {word} "
            "{threshold}C", "day"))

# --- count_occurrences (cf.yml:57-90 cfd, csu) ----------------------------
_SPECS += [
    _spec("cfd", "count_occurrences", "tasmin",
          {"op": "<", "threshold": {"default": "0 degree_Celsius", **_Q}},
          "Maximum number of consecutive frost days (Tmin < 0 C)", "day"),
    _spec("csu", "count_occurrences", "tasmax",
          {"op": ">", "threshold": {"default": "25 degree_Celsius", **_Q}},
          "Maximum number of consecutive summer days (Tmax >25 C)", "day"),
]

# --- temperature_sum family (cf.yml:40-56, 338-371, 433-498) --------------
for ident, op, thr, title in (
    ("cddcoldTT", ">", None, "Cooling Degree Days (Tmean > {threshold}C)"),
    ("ddgtTT", ">", None, "Degree Days (Tmean > {threshold}C)"),
    ("ddltTT", "<", None, "Degree Days (Tmean < {threshold}C)"),
    ("gd4", ">", "4 degree_Celsius", "Growing degree days (sum of Tmean > 4 C)"),
    ("gddgrowTT", ">", None, "Annual Growing Degree Days (Tmean > {threshold}C)"),
    ("hd17", "<", "17 degree_Celsius", "Heating degree days (sum of Tmean < 17 C)"),
    ("hddheatTT", "<", None, "Heating Degree Days (Tmean < {threshold}C)"),
):
    _SPECS.append(_spec(
        ident, "temperature_sum", "tas",
        {"op": op, "threshold": {"default": thr, **_Q}},
        title, "degree_Celsius day"))

# --- statistics family (cf.yml:403-432, 515-575, 591-905) -----------------
_DEGC = "degree_Celsius"
for ident, data, red, freq, units, title in (
    ("fg", "sfcWind", "mean", "MS", "meter second-1",
     "Mean of daily mean wind strength"),
    ("fxx", "wsgsmax", "max", "MS", "meter second-1",
     "Maximum daily maximum wind gust strength"),
    ("pp", "psl", "mean", "MS", "hPa", "Mean of daily sea level pressure"),
    ("rh", "hurs", "mean", "MS", "%", "Mean of daily relative humidity"),
    ("sd", "snd", "mean", "MS", "cm", "Mean of daily snow depth"),
    ("ss", "sund", "sum", "MS", "hour", "Sunshine duration, sum"),
    ("tg", "tas", "mean", "MS", _DEGC, "Mean of daily mean temperature"),
    ("tmm", "tas", "mean", "YS", _DEGC, "Mean daily mean temperature"),
    ("tmmax", "tas", "max", "YS", _DEGC, "Maximum daily mean temperature"),
    ("tmmean", "tas", "mean", "YS", _DEGC, "Mean daily mean temperature"),
    ("tmmin", "tas", "min", "YS", _DEGC, "Minimum daily mean temperature"),
    ("tmn", "tas", "min", "YS", _DEGC, "Minimum daily mean temperature"),
    ("tmx", "tas", "max", "YS", _DEGC, "Maximum daily mean temperature"),
    ("tn", "tasmin", "mean", "MS", _DEGC, "Mean of daily minimum temperature"),
    ("tnm", "tasmin", "mean", "YS", _DEGC, "Mean daily minimum temperature"),
    ("tnmax", "tasmin", "max", "YS", _DEGC, "Maximum daily minimum temperature"),
    ("tnmean", "tasmin", "mean", "YS", _DEGC, "Mean daily minimum temperature"),
    ("tnmin", "tasmin", "min", "YS", _DEGC, "Minimum daily minimum temperature"),
    ("tnn", "tasmin", "min", "YS", _DEGC, "Minimum daily minimum temperature"),
    ("tnx", "tasmin", "max", "YS", _DEGC, "Maximum daily minimum temperature"),
    ("tx", "tasmax", "mean", "MS", _DEGC, "Mean of daily maximum temperature"),
    ("txm", "tasmax", "mean", "YS", _DEGC, "Mean daily maximum temperature"),
    ("txmax", "tasmax", "max", "YS", _DEGC, "Maximum daily maximum temperature"),
    ("txmean", "tasmax", "mean", "YS", _DEGC, "Mean daily maximum temperature"),
    ("txmin", "tasmax", "min", "YS", _DEGC, "Minimum daily maximum temperature"),
    ("txn", "tasmax", "min", "YS", _DEGC, "Minimum daily maximum temperature"),
    ("txx", "tasmax", "max", "YS", _DEGC, "Maximum of daily maximum temperature"),
):
    _SPECS.append(_spec(
        ident, "statistics", data, {"reducer": {"default": red}}, title,
        units=units, freq=freq))

# --- range / sdii (cf.yml:372-402, 560-590, 906-920) ----------------------
_RANGE_IN = {"high_data": "tasmax", "low_data": "tasmin"}
_SPECS += [
    _spec("dtr", "diurnal_temperature_range", None,
          {"reducer": {"default": "mean"}},
          "Mean Diurnal Temperature Range", "degree_Celsius", "MS",
          extra_input=_RANGE_IN),
    _spec("maxdtr", "diurnal_temperature_range", None,
          {"reducer": {"default": "max"}},
          "Maximum Diurnal Temperature Range", "degree_Celsius", "MS",
          extra_input=_RANGE_IN),
    _spec("etr", "extreme_temperature_range", None, {},
          "Intra-period extreme temperature range", "degree_Celsius", "MS",
          extra_input=_RANGE_IN),
    _spec("vdtr", "interday_diurnal_temperature_range", None, {},
          "Mean day-to-day variation in Diurnal Temperature Range",
          "degree_Celsius", "MS", extra_input=_RANGE_IN),
    _spec("sdii", "thresholded_statistics", "pr",
          {"op": ">", "reducer": {"default": "mean"},
           "threshold": {"default": "1 mm day-1", **_Q}},
          "Average precipitation during Wet Days (SDII)", "mm day-1"),
]

cf = build_indicator_module("cf", _SPECS)
