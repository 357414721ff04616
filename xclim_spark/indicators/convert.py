"""Convert realm — converter indicators (the reference's
``src/xclim/indicators/convert/_conversion.py``, 28 named indicators
wrapping :mod:`xclim.indices.converters`).  Here each spec binds the
``converter`` generic compute (or a dedicated staged compute for UTCI /
MRT / PET / water budget) to a Column builder in
:mod:`xclim_spark.functions.converters`; outputs keep the input's daily
time grain (no resample), so the missing-mask step does not apply.
"""

from __future__ import annotations

from .core import VARIABLES, build_indicator_module

# extra CMIP-style variables used only by the convert realm
VARIABLES.setdefault("tdps", {"canonical_units": "K",
                              "standard_name": "dew_point_temperature"})
VARIABLES.setdefault("uas", {"canonical_units": "m s-1",
                             "standard_name": "eastward_wind"})
VARIABLES.setdefault("vas", {"canonical_units": "m s-1",
                             "standard_name": "northward_wind"})
VARIABLES.setdefault("wind_from_dir", {"canonical_units": "degree"})
for _v in ("rsds", "rsus", "rlds", "rlus", "rss", "rls"):
    VARIABLES.setdefault(_v, {"canonical_units": "W m-2"})
VARIABLES.setdefault("evspsblpot", {"canonical_units": "mm/d",
                                    "standard_name":
                                    "water_potential_evapotranspiration_flux"})
VARIABLES.setdefault("lat", {"canonical_units": "degrees_north"})
VARIABLES.setdefault("mrt", {"canonical_units": "K"})


def _cspec(ident, fn, input_, args, title, units, params=None, outputs=None,
           ref=""):
    p = {"fn": {"default": fn, "kind": "string"},
         "args": {"default": list(args), "kind": "string"}}
    if outputs:
        p["outputs"] = {"default": list(outputs), "kind": "string"}
    p.update(params or {})
    return {
        "identifier": ident, "compute": "converter", "realm": "atmos",
        "title": title, "units": units, "long_name": title,
        "input": input_, "parameters": p,
        "references": ref or f"ref converters.py {fn}; indicator "
                             "convert/_conversion.py",
    }


_SPECS = [
    _cspec("humidex", "humidex", {"tas": "tas", "tdps": "tdps"},
           ["tas", "tdps"], "Humidex index", "degC"),
    _cspec("heat_index", "heat_index", {"tas": "tas", "hurs": "hurs"},
           ["tas", "hurs"], "Heat index", "degC"),
    _cspec("mean_temperature_from_max_and_min", "tas_from_tasmin_tasmax",
           {"tasmin": "tasmin", "tasmax": "tasmax"}, ["tasmin", "tasmax"],
           "Mean temperature from tasmin and tasmax", "degC"),
    _cspec("wind_speed_from_vector", "uas_vas_to_sfcwind",
           {"uas": "uas", "vas": "vas"}, ["uas", "vas"],
           "Wind speed and direction from components", "m s-1",
           outputs=["sfcWind", "sfcWindfromdir"]),
    _cspec("wind_vector_from_speed", "sfcwind_to_uas_vas",
           {"sfcWind": "sfcWind", "wind_from_dir": "wind_from_dir"},
           ["sfcWind", "wind_from_dir"],
           "Wind components from speed and direction", "m s-1",
           outputs=["uas", "vas"]),
    _cspec("wind_profile", "wind_profile", {"sfcWind": "sfcWind"},
           ["sfcWind", "h", "h_r"], "Wind speed at height h (power law)",
           "m s-1",
           params={"h": {"default": 100.0, "kind": "number"},
                   "h_r": {"default": 10.0, "kind": "number"}}),
    _cspec("wind_power_potential", "wind_power_potential",
           {"sfcWind": "sfcWind"}, ["sfcWind"],
           "Wind power potential (capacity factor)", "1"),
    _cspec("saturation_vapor_pressure", "saturation_vapor_pressure",
           {"tas": "tas"}, ["tas", "method"],
           "Saturation vapour pressure", "Pa",
           params={"method": {"default": "sonntag90", "kind": "string"}}),
    _cspec("vapor_pressure", "vapor_pressure",
           {"huss": "huss", "ps": "ps"}, ["huss", "ps"],
           "Vapour pressure", "Pa"),
    _cspec("vapor_pressure_deficit", "vapor_pressure_deficit",
           {"tas": "tas", "hurs": "hurs"}, ["tas", "hurs"],
           "Vapour pressure deficit", "Pa"),
    _cspec("relative_humidity", "relative_humidity",
           {"tas": "tas", "huss": "huss", "ps": "ps"},
           ["tas", "huss", "ps"], "Relative humidity from specific humidity",
           "%"),
    _cspec("relative_humidity_from_dewpoint", "relative_humidity_from_dewpoint",
           {"tas": "tas", "tdps": "tdps"}, ["tas", "tdps"],
           "Relative humidity from dewpoint", "%"),
    _cspec("specific_humidity", "specific_humidity",
           {"tas": "tas", "hurs": "hurs", "ps": "ps"},
           ["tas", "hurs", "ps"], "Specific humidity from relative humidity",
           "1"),
    _cspec("specific_humidity_from_dewpoint", "specific_humidity_from_dewpoint",
           {"tdps": "tdps", "ps": "ps"}, ["tdps", "ps"],
           "Specific humidity from dewpoint", "1"),
    _cspec("dewpoint_from_specific_humidity", "dewpoint_from_specific_humidity",
           {"huss": "huss", "ps": "ps"}, ["huss", "ps"],
           "Dewpoint temperature from specific humidity", "K"),
    _cspec("snowfall_approximation", "snowfall_approximation",
           {"pr": "pr", "tas": "tas"}, ["pr", "tas", "thresh", "method"],
           "Snowfall approximated from total precipitation", "mm/d",
           params={"thresh": {"default": 273.15, "kind": "number"},
                   "method": {"default": "binary", "kind": "string"}}),
    _cspec("rain_approximation", "rain_approximation",
           {"pr": "pr", "tas": "tas"}, ["pr", "tas", "thresh", "method"],
           "Rainfall approximated from total precipitation", "mm/d",
           params={"thresh": {"default": 273.15, "kind": "number"},
                   "method": {"default": "binary", "kind": "string"}}),
    # reference short identifiers (convert/_conversion.py) for the same
    # kernels — registry parity so users can call by either name
    _cspec("e_sat", "saturation_vapor_pressure",
           {"tas": "tas"}, ["tas", "method"],
           "Saturation vapour pressure", "Pa",
           params={"method": {"default": "sonntag90", "kind": "string"}},
           ref="ref convert/_conversion.py:181 e_sat"),
    _cspec("hurs_fromdewpoint", "relative_humidity_from_dewpoint",
           {"tas": "tas", "tdps": "tdps"}, ["tas", "tdps"],
           "Relative humidity from dewpoint", "%",
           ref="ref convert/_conversion.py:200 hurs_fromdewpoint"),
    _cspec("huss_fromdewpoint", "specific_humidity_from_dewpoint",
           {"tdps": "tdps", "ps": "ps"}, ["tdps", "ps"],
           "Specific humidity from dewpoint", "1",
           ref="ref convert/_conversion.py:284 huss_fromdewpoint"),
    _cspec("tdps_from_huss", "dewpoint_from_specific_humidity",
           {"huss": "huss", "ps": "ps"}, ["huss", "ps"],
           "Dewpoint temperature from specific humidity", "K",
           ref="ref convert/_conversion.py:299 tdps_from_huss"),
    _cspec("prlp", "rain_approximation",
           {"pr": "pr", "tas": "tas"}, ["pr", "tas", "thresh", "method"],
           "Rainfall approximated from total precipitation", "mm/d",
           params={"thresh": {"default": 273.15, "kind": "number"},
                   "method": {"default": "binary", "kind": "string"}},
           ref="ref convert/_conversion.py:380 prlp"),
    _cspec("snd_to_snw", "snd_to_snw", {"snd": "snd"}, ["snd"],
           "Snow amount from snow depth", "kg m-2"),
    _cspec("snw_to_snd", "snw_to_snd", {"snw": "snw"}, ["snw"],
           "Snow depth from snow amount", "m"),
    _cspec("wind_chill_index", "wind_chill_index",
           {"tas": "tas", "sfcWind": "sfcWind"},
           ["tas", "sfcWind", "method"], "Wind chill index", "degC",
           params={"method": {"default": "CAN", "kind": "string"}}),
    _cspec("longwave_upwelling_radiation_from_net_downwelling",
           "longwave_upwelling_radiation_from_net_downwelling",
           {"rls": "rls", "rlds": "rlds"}, ["rls", "rlds"],
           "Upwelling longwave radiation", "W m-2"),
    _cspec("shortwave_upwelling_radiation_from_net_downwelling",
           "shortwave_upwelling_radiation_from_net_downwelling",
           {"rss": "rss", "rsds": "rsds"}, ["rss", "rsds"],
           "Upwelling shortwave radiation", "W m-2"),
    _cspec("clearness_index", "clearness_index",
           {"lat": "lat", "rsds": "rsds"}, ["_time", "lat", "rsds"],
           "Clearness index", "1"),
    # staged / multi-column computes
    {"identifier": "universal_thermal_climate_index", "compute": "utci",
     "realm": "atmos", "title": "Universal Thermal Climate Index",
     "units": "degC", "long_name": "UTCI",
     "input": {"tas": "tas", "hurs": "hurs", "sfcWind": "sfcWind",
               "mrt": "mrt"},
     "parameters": {"mask_invalid": {"default": True, "kind": "bool"}},
     "references": "ref converters.py:2389 universal_thermal_climate_index"},
    {"identifier": "mean_radiant_temperature",
     "compute": "mean_radiant_temperature", "realm": "atmos",
     "title": "Mean radiant temperature", "units": "K",
     "long_name": "Mean radiant temperature",
     "input": {"lat": "lat", "rsds": "rsds", "rsus": "rsus",
               "rlds": "rlds", "rlus": "rlus"},
     "parameters": {"stat": {"default": "sunlit", "kind": "string"}},
     "references": "ref converters.py:2538 mean_radiant_temperature"},
    {"identifier": "potential_evapotranspiration",
     "compute": "potential_evapotranspiration", "realm": "atmos",
     "title": "Potential evapotranspiration", "units": "mm/d",
     "long_name": "Potential evapotranspiration ({method})",
     "input": {"lat": "lat", "tasmin": "tasmin", "tasmax": "tasmax"},
     "parameters": {"method": {"default": "hargreaves85",
                               "kind": "string"}},
     "references": "ref converters.py:1890 potential_evapotranspiration"},
    {"identifier": "water_budget", "compute": "water_budget",
     "realm": "atmos", "title": "Water budget (pr - PET)", "units": "mm/d",
     "long_name": "Precipitation minus potential evapotranspiration",
     "input": {"pr": "pr", "evspsblpot": "evspsblpot"},
     "parameters": {},
     "references": "ref converters.py water_budget"},
    {"identifier": "water_budget_from_tas", "compute": "water_budget",
     "realm": "atmos",
     "title": "Water budget from temperature", "units": "mm/d",
     "long_name": "Precipitation minus PET estimated from temperature",
     "input": {"pr": "pr", "lat": "lat", "tasmin": "tasmin",
               "tasmax": "tasmax"},
     "parameters": {"method": {"default": "baierrobertson65",
                               "kind": "string"}},
     "references": "ref converters.py water_budget (tas PET path)"},
]

convert = build_indicator_module("convert", _SPECS)

# reference short identifiers (convert/_conversion.py registers the
# converters under the CF variable names / short forms)
from .core import register_alias as _alias  # noqa: E402

_alias("hurs", "relative_humidity")
_alias("huss", "specific_humidity")
_alias("prsn", "snowfall_approximation")
_alias("wind_chill", "wind_chill_index")
_alias("utci", "universal_thermal_climate_index")
