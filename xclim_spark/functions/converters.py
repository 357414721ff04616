"""Thermodynamic / physical converters as pure Spark Column expressions.

Re-expresses the reference's converter tier
(``src/xclim/indices/converters.py``, 44 functions) as Column-expression
builders: every function takes Columns (plus plan-time scalars) and returns
a Column, so converters compose into any query and stay inside whole-stage
codegen — no UDFs, no Python in the hot path.

Unit convention: inputs are taken in the units stated per function
(driver code converts beforehand via
:func:`xclim_spark.units.convert_units_to`, which compiles to an affine
Column transform).  All formulas are standard published equations; the
reference citation (file:line) pins the exact variant used.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

from .solar import cosine_of_solar_zenith_angle, distance_from_sun

__all__ = [
    "humidex",
    "tas",
    "clausius_clapeyron_scaled_precipitation",
    "specific_humidity_from_dewpoint",
    "clearness_index",
    "shortwave_downwelling_radiation_from_clearness_index",
    "fao_allen98",
    "heat_index",
    "tas_from_tasmin_tasmax",
    "uas_vas_to_sfcwind",
    "sfcwind_to_uas_vas",
    "saturation_vapor_pressure",
    "vapor_pressure",
    "vapor_pressure_deficit",
    "relative_humidity",
    "relative_humidity_from_dewpoint",
    "specific_humidity",
    "dewpoint_from_specific_humidity",
    "snowfall_approximation",
    "rain_approximation",
    "snd_to_snw",
    "snw_to_snd",
    "prsn_to_prsnd",
    "prsnd_to_prsn",
    "longwave_upwelling_radiation_from_net_downwelling",
    "shortwave_upwelling_radiation_from_net_downwelling",
    "wind_chill_index",
    "water_budget",
    "potential_evapotranspiration",
    "wind_profile",
    "wind_power_potential",
    "mean_radiant_temperature",
    "universal_thermal_climate_index",
    "ESAT_FORMULAS_COEFFICIENTS",
    "UTCI_POLYNOMIAL_COEFFICIENTS",
]

_c = lambda x: x if isinstance(x, Column) else F.col(x)  # noqa: E731

# Magnus-form saturation vapour pressure coefficients (A [Pa], B, C [K-273.16
# offset]) — reference converters.py:390-396 (Tetens 1930 / WMO-2008 /
# Buck 1981 / Alduchov-Eskridge 1996 published values).
ESAT_FORMULAS_COEFFICIENTS = {
    "tetens30": {"water": (610.78, 17.269388, -35.86),
                 "ice": (610.78, 21.8745584, -7.66)},
    "wmo08": {"water": (611.2, 17.62, -30.04), "ice": (611.2, 22.46, -0.54)},
    "buck81": {"water": (611.21, 17.502, -32.19),
               "ice": (611.15, 22.542, 0.32)},
    "aerk96": {"water": (610.94, 17.625, -30.12),
               "ice": (611.21, 22.587, 0.7)},
}


# ---------------------------------------------------------------------------
# comfort indices
# ---------------------------------------------------------------------------

def humidex(tas_c, tdps_k=None, hurs_pct=None) -> Column:
    """Humidex (Masterton & Richardson 1979; reference converters.py:76-173).

    ``tas_c`` dry-bulb temperature in degC; vapour pressure from dewpoint
    (K) when given, else from relative humidity (%):
    ``e = h/100 * 6.112 * 10^(7.5 T/(T+237.7))``; humidex = T + 5/9 (e-10).
    """
    t = _c(tas_c)
    if tdps_k is not None:
        e = 6.112 * F.exp(5417.7530 * (1.0 / 273.16 - 1.0 / _c(tdps_k)))
    elif hurs_pct is not None:
        e = (_c(hurs_pct) / 100.0) * 6.112 * F.pow(
            F.lit(10.0), 7.5 * t / (t + 237.7)
        )
    else:
        raise ValueError("At least one of tdps_k or hurs_pct must be given.")
    return t + (5.0 / 9.0) * (e - 10.0)


def heat_index(tas_c, hurs_pct) -> Column:
    """NWS heat index, Rothfusz regression (reference converters.py:176-225);
    defined only above 20 degC (NULL below, as the reference masks)."""
    t = _c(tas_c)
    r = _c(hurs_pct)
    tv = F.when(t > 20.0, t)
    out = (
        -8.78469475556
        + 1.61139411 * tv
        + 2.33854883889 * r
        - 0.14611605 * tv * r
        - 0.012308094 * tv * tv
        - 0.0164248277778 * r * r
        + 0.002211732 * tv * tv * r
        + 0.00072546 * tv * r * r
        - 0.000003582 * tv * tv * r * r
    )
    return out


def tas_from_tasmin_tasmax(tasmin, tasmax) -> Column:
    """Daily mean as midpoint (reference converters.py:243-270)."""
    return (_c(tasmin) + _c(tasmax)) / 2.0


# ---------------------------------------------------------------------------
# wind
# ---------------------------------------------------------------------------

def uas_vas_to_sfcwind(uas, vas, calm_wind_thresh: float = 0.5):
    """(speed, direction) from wind components, meteorological convention
    (reference converters.py:273-335): calm (< thresh) -> 0°, northerly ->
    360°.  Returns a tuple of Columns (m/s, degrees)."""
    u, v = _c(uas), _c(vas)
    wind = F.hypot(u, v)
    # direction the wind blows FROM: atan2(u, v) rotated, in [0, 360)
    ang = F.degrees(F.atan2(u, v)) + 180.0
    direction = (
        F.when(wind < calm_wind_thresh, F.lit(0.0))
        .when(ang <= 0.0, ang + 360.0)  # defensive; ang in (-180,180]+180
        .otherwise(ang)
    )
    # northerly (ang == 0 after mod) reported as 360
    direction = F.when(
        (wind >= calm_wind_thresh) & (direction == 0.0), F.lit(360.0)
    ).otherwise(direction)
    return wind, direction


def sfcwind_to_uas_vas(sfcwind, wind_from_dir):
    """Inverse of :func:`uas_vas_to_sfcwind` (reference
    converters.py:337-408).  Returns (uas, vas) Columns."""
    w, d = _c(sfcwind), _c(wind_from_dir)
    rad = F.radians(d)
    return -w * F.sin(rad), -w * F.cos(rad)


def wind_profile(wind_speed, h: float, h_r: float, alpha: float = 1 / 7) -> Column:
    """Power-law vertical wind extrapolation (reference
    converters.py:2743-2803): ``v = v_r (h/h_r)^alpha``."""
    return _c(wind_speed) * float((h / h_r) ** alpha)


def wind_power_potential(wind_speed, cut_in: float = 3.5,
                         rated: float = 13.0, cut_out: float = 25.0) -> Column:
    """Wind power production potential in [0, 1] (reference
    converters.py:2804+; Tobin et al. 2018 piecewise cubic)."""
    v = _c(wind_speed)
    frac = (v ** 3 - cut_in ** 3) / (rated ** 3 - cut_in ** 3)
    return (
        F.when((v < cut_in) | (v >= cut_out), F.lit(0.0))
        .when(v >= rated, F.lit(1.0))
        .otherwise(frac)
    )


# ---------------------------------------------------------------------------
# humidity chain
# ---------------------------------------------------------------------------

def _esat_magnus(tas_k: Column, coeffs: tuple[float, float, float]) -> Column:
    A, B, C = coeffs
    return A * F.exp(B * (tas_k - 273.16) / (tas_k + C))


def saturation_vapor_pressure(
    tas_k, method: str = "sonntag90", ice_thresh_k: float | None = None
) -> Column:
    """Saturation vapour pressure e_sat [Pa] from temperature [K]
    (reference converters.py:410-604).

    Methods: sonntag90 (default), goffgratch46, its90, and the Magnus-form
    tetens30/wmo08/buck81/aerk96 ("ecmwf" = buck81 over water, aerk96 over
    ice).  ``ice_thresh_k`` switches to the over-ice fit at or below the
    threshold (binary transition — the interpolated variant is out of
    scope here).
    """
    t = _c(tas_k)

    def over(kind: str, m: str) -> Column:
        if m == "ecmwf":
            m = "buck81" if kind == "water" else "aerk96"
        if m in ESAT_FORMULAS_COEFFICIENTS:
            return _esat_magnus(t, ESAT_FORMULAS_COEFFICIENTS[m][kind])
        if m == "sonntag90":
            if kind == "water":
                return 100.0 * F.exp(
                    -6096.9385 / t + 16.635794 - 2.711193e-2 * t
                    + 1.673952e-5 * t * t + 2.433502 * F.log(t)
                )
            return 100.0 * F.exp(
                -6024.5282 / t + 24.7219 + 1.0613868e-2 * t
                - 1.3198825e-5 * t * t - 0.49382577 * F.log(t)
            )
        if m == "goffgratch46":
            if kind == "water":
                Tb, eb = 373.16, 101325.0
                return eb * F.pow(
                    F.lit(10.0),
                    -7.90298 * (Tb / t - 1.0)
                    + 5.02808 * F.log10(Tb / t)
                    - 1.3817e-7 * (F.pow(F.lit(10.0),
                                         11.344 * (1.0 - t / Tb)) - 1.0)
                    + 8.1328e-3 * (F.pow(F.lit(10.0),
                                         -3.49149 * (Tb / t - 1.0)) - 1.0),
                )
            Tp, ep = 273.16, 611.73
            return ep * F.pow(
                F.lit(10.0),
                -9.09718 * (Tp / t - 1.0)
                - 3.56654 * F.log10(Tp / t)
                + 0.876793 * (1.0 - t / Tp),
            )
        if m == "its90":
            if kind == "water":
                return F.exp(
                    -2836.5744 / (t * t) - 6028.076559 / t + 19.54263612
                    - 2.737830188e-2 * t + 1.6261698e-5 * t * t
                    + 7.0229056e-10 * t * t * t
                    - 1.8680009e-13 * t * t * t * t + 2.7150305 * F.log(t)
                )
            return F.exp(
                -5866.6426 / t + 22.32870244 + 1.39387003e-2 * t
                - 3.4262402e-5 * t * t + 2.7040955e-8 * t * t * t
                + 6.7063522e-1 * F.log(t)
            )
        raise ValueError(f"Unknown esat method {method!r}")

    if ice_thresh_k is None:
        return over("water", method)
    return F.when(t > ice_thresh_k, over("water", method)).otherwise(
        over("ice", method)
    )


def vapor_pressure(huss, ps) -> Column:
    """Actual vapour pressure [Pa] from specific humidity and pressure
    (reference converters.py:607-640): ``e = q p / (eps (1 + q(1/eps-1)))``
    with eps = 0.62198."""
    eps = 0.62198
    q, p = _c(huss), _c(ps)
    return q * p / (eps * (1.0 + q * (1.0 / eps - 1.0)))


def vapor_pressure_deficit(tas_k, hurs_pct, method: str = "sonntag90",
                           ice_thresh_k: float | None = None) -> Column:
    """VPD [Pa] = e_sat (1 - RH/100) (reference converters.py:642-693)."""
    return saturation_vapor_pressure(tas_k, method, ice_thresh_k) * (
        1.0 - _c(hurs_pct) / 100.0
    )


def relative_humidity_from_dewpoint(
    tas_k, tdps_k, method: str = "sonntag90",
    ice_thresh_k: float | None = None,
) -> Column:
    """RH [%] = 100 e_sat(Td)/e_sat(T) (reference converters.py:702-843)."""
    return 100.0 * saturation_vapor_pressure(tdps_k, method, ice_thresh_k) / \
        saturation_vapor_pressure(tas_k, method, ice_thresh_k)


def relative_humidity(tas_k, huss, ps, method: str = "sonntag90",
                      ice_thresh_k: float | None = None) -> Column:
    """RH [%] from specific humidity: 100 Pw / Pwsat
    (reference converters.py:702-843, WMO-2008 eq. 4.A.15)."""
    return 100.0 * vapor_pressure(huss, ps) / \
        saturation_vapor_pressure(tas_k, method, ice_thresh_k)


def specific_humidity(tas_k, hurs_pct, ps, method: str = "sonntag90",
                      ice_thresh_k: float | None = None) -> Column:
    """Specific humidity q from RH (reference converters.py:847-950):
    ``wsat = 0.622 esat/(P - esat); w = wsat RH/100; q = w/(1+w)``."""
    esat = saturation_vapor_pressure(tas_k, method, ice_thresh_k)
    wsat = 0.622 * esat / (_c(ps) - esat)
    w = wsat * _c(hurs_pct) / 100.0
    return w / (1.0 + w)


def dewpoint_from_specific_humidity(
    huss, ps, method: str = "buck81"
) -> Column:
    """Dewpoint [K] by inverting the Magnus form (reference
    converters.py:1025-1086): with ``e = vapor_pressure(q, p)`` and
    ``ln(e/A)/B = x``, ``Td = (-273.16 - C x) / (x - 1)``."""
    A, B, C = ESAT_FORMULAS_COEFFICIENTS[method]["water"]
    e = vapor_pressure(huss, ps)
    x = F.log(e / A) / B
    return (-273.16 - C * x) / (x - 1.0)


# ---------------------------------------------------------------------------
# precipitation phase / snow
# ---------------------------------------------------------------------------

def snowfall_approximation(
    pr, tas_k, thresh_k: float = 273.15, method: str = "binary"
) -> Column:
    """Solid-precipitation approximation (reference converters.py:1088-1253).

    binary: all solid at or below ``thresh_k``; brown: solid fraction
    falls linearly from 1 at the threshold to 0 at threshold+2 K (CLASS
    scheme); auer: degree-6 polynomial of the above-freezing excess
    (``100 + 4.6664 x - 15.038 x^2 - 1.5089 x^3 + 2.0399 x^4 - 0.366 x^5
    + 0.0202 x^6`` %, clipped to [0, 100], 1 below 0 K excess, 0 at/above
    6 K).
    """
    p, t = _c(pr), _c(tas_k)
    if method == "binary":
        return F.when(t <= thresh_k, p).otherwise(F.lit(0.0))
    if method == "brown":
        dt = t - thresh_k
        frac = F.greatest(F.lit(0.0), F.least(F.lit(1.0), 1.0 - dt / 2.0))
        return p * frac
    if method == "auer":
        dt = t - thresh_k
        poly = (
            100.0 + 4.6664 * dt - 15.038 * dt * dt
            - 1.5089 * F.pow(dt, 3.0) + 2.0399 * F.pow(dt, 4.0)
            - 0.366 * F.pow(dt, 5.0) + 0.0202 * F.pow(dt, 6.0)
        )
        frac = F.when(dt <= 0.0, F.lit(1.0)).when(
            dt >= 6.0, F.lit(0.0)
        ).otherwise(
            F.greatest(F.lit(0.0), F.least(F.lit(100.0), poly)) / 100.0
        )
        return p * frac
    raise ValueError(f"Unknown snowfall method {method!r}")


def rain_approximation(
    pr, tas_k, thresh_k: float = 273.15, method: str = "binary"
) -> Column:
    """Liquid fraction: pr - prsn (reference converters.py:1255-1375)."""
    return _c(pr) - snowfall_approximation(pr, tas_k, thresh_k, method)


def snd_to_snw(snd, snr: float = 312.0) -> Column:
    """Snow depth [m] -> amount [kg m-2] via bulk density (default
    312 kg/m3, Sturm et al.; reference converters.py:1377-1418)."""
    return _c(snd) * snr


def snw_to_snd(snw, snr: float = 312.0) -> Column:
    """Snow amount [kg m-2] -> depth [m] (reference converters.py:1420-1459)."""
    return _c(snw) / snr


def prsn_to_prsnd(prsn, snr: float = 100.0) -> Column:
    """Snowfall flux [kg m-2 s-1] -> rate [m s-1] (fresh-snow density
    100 kg/m3; reference converters.py:1461-1500)."""
    return _c(prsn) / snr


def prsnd_to_prsn(prsnd, snr: float = 100.0) -> Column:
    """Snowfall rate [m s-1] -> flux [kg m-2 s-1] (reference
    converters.py:1502-1541)."""
    return _c(prsnd) * snr


# ---------------------------------------------------------------------------
# radiation / misc
# ---------------------------------------------------------------------------

def longwave_upwelling_radiation_from_net_downwelling(rls, rlds) -> Column:
    """rlus = rlds - rls (reference converters.py:1543-1564)."""
    return _c(rlds) - _c(rls)


def shortwave_upwelling_radiation_from_net_downwelling(rss, rsds) -> Column:
    """rsus = rsds - rss (reference converters.py:1566-1587)."""
    return _c(rsds) - _c(rss)


def wind_chill_index(
    tas_c, sfcwind_kmh, method: str = "CAN", mask_invalid: bool = True
) -> Column:
    """Wind chill (reference converters.py:1663-1746; ECCC / NWS):
    ``W = 13.12 + 0.6125 T - 11.37 V^0.16 + 0.3965 T V^0.16`` with the
    Canadian slow-wind branch ``T + (-1.59 + 0.1345 T)/5 * V`` under
    5 km/h.  ``method='US'`` uses the NWS variant (inputs still degC /
    km/h here; masks T > 10 degC and V < 4.828032 km/h)."""
    t, v = _c(tas_c), _c(sfcwind_kmh)
    v16 = F.pow(v, 0.16)
    std = 13.12 + 0.6125 * t - 11.37 * v16 + 0.3965 * t * v16
    if method == "CAN":
        slow = t + (-1.59 + 0.1345 * t) / 5.0 * v
        out = F.when(v < 5.0, slow).otherwise(std)
        if mask_invalid:
            out = F.when(t <= 0.0, out)
        return out
    if method == "US":
        out = std
        if mask_invalid:
            out = F.when((t <= 10.0) & (v >= 3 * 1.609344), out)
        return out
    raise ValueError(f"Unknown wind chill method {method!r}")


def water_budget(pr, evspsblpot) -> Column:
    """Precipitation minus potential evapotranspiration (same units;
    reference converters.py:2652-2742)."""
    return _c(pr) - _c(evspsblpot)


def potential_evapotranspiration(
    time, lat_deg, *, tasmin_c=None, tasmax_c=None, tas_c=None,
    hurs_pct=None, sfcwind_10m_ms=None,
    rsds_wm2=None, rsus_wm2=None, rlds_wm2=None, rlus_wm2=None,
    method: str = "hargreaves85",
    peta: float = 0.00516409319477, petb: float = 0.0874972822289,
) -> Column:
    """Daily PET [mm/day] (reference converters.py:1890-2155).

    Daily elementwise methods: ``hargreaves85`` (``0.0023 * 0.408 Ra
    (tas+17.8) sqrt(tasmax-tasmin)``, Hargreaves & Samani 1985),
    ``baierrobertson65`` (Baier & Robertson 1965, degF and
    cal cm-2 day-1), ``mcguinnessbordne05`` (radiation over latent heat,
    UK-calibrated a/b from the reference), and ``allen98`` (FAO-56
    Penman-Monteith with standard pressure, needing hurs, 10 m wind and
    the four radiation components in W m-2).  ``Ra`` comes from
    :func:`~xclim_spark.functions.solar.extraterrestrial_solar_radiation`.
    The monthly-resample variants (thornthwaite48, droogersallen02) live
    in :mod:`xclim_spark.operators.agro` since they are DataFrame-level.
    """
    from .solar import (
        extraterrestrial_solar_radiation,
        wind_speed_height_conversion,
    )

    ra = extraterrestrial_solar_radiation(time, lat_deg)  # MJ m-2 day-1
    if method in ("hargreaves85", "HG85"):
        tmin, tmax = _c(tasmin_c), _c(tasmax_c)
        tm = _c(tas_c) if tas_c is not None else (tmin + tmax) / 2.0
        pet = 0.0023 * (ra * 0.408) * (tm + 17.8) * \
            F.sqrt(F.greatest(tmax - tmin, F.lit(0.0)))
        return F.greatest(pet, F.lit(0.0))
    if method in ("baierrobertson65", "BR65"):
        tmin_f = _c(tasmin_c) * 1.8 + 32.0
        tmax_f = _c(tasmax_c) * 1.8 + 32.0
        re = ra * 23.8845897  # MJ m-2 day-1 -> cal cm-2 day-1
        pet = 0.094 * (-87.03 + 0.928 * tmax_f
                       + 0.933 * (tmax_f - tmin_f) + 0.0486 * re)
        return F.greatest(pet, F.lit(0.0))
    if method in ("mcguinnessbordne05", "MB05"):
        tm = (_c(tas_c) if tas_c is not None
              else (_c(tasmin_c) + _c(tasmax_c)) / 2.0)
        tas_k = tm + 273.15
        # Ra with the reference's 1367 W m-2 solar constant, in J m-2 d-1
        ra_j = extraterrestrial_solar_radiation(
            time, lat_deg, solar_constant_wm2=1367.0) * 1e6
        latent_heat = 4185.5 * (751.78 - 0.5655 * tas_k)  # J/kg
        rad_div_lat = ra_j / latent_heat  # kg m-2 d-1 == mm/day
        return rad_div_lat * (peta * tm + petb)
    if method in ("allen98", "FAO_PM98"):
        tmin, tmax = _c(tasmin_c), _c(tasmax_c)
        tas_m = (tmin + tmax) / 2.0
        wa2 = wind_speed_height_conversion(sfcwind_10m_ms, 10.0, 2.0)
        # mean of min/max saturation pressure [kPa], then actual pressure
        es = 0.5 * (
            saturation_vapor_pressure(tmax + 273.15)
            + saturation_vapor_pressure(tmin + 273.15)
        ) / 1000.0
        ea = es * (_c(hurs_pct) / 100.0)
        delta = 4098.0 * es / F.pow(tas_m + 237.3, 2.0)  # kPa/degC
        rn = (_c(rsds_wm2) - _c(rsus_wm2)
              - (_c(rlus_wm2) - _c(rlds_wm2))) * 0.0864  # MJ m-2 d-1
        gamma = 0.665e-3 * 101.325  # kPa/degC at standard pressure
        num = (0.408 * delta * rn
               + gamma * 900.0 / (tas_m + 273.15) * wa2 * (es - ea))
        return num / (delta + gamma * (1.0 + 0.34 * wa2))
    raise ValueError(f"Unknown PET method {method!r}")


# ---------------------------------------------------------------------------
# UTCI / mean radiant temperature (reference converters.py:2156-2537)
# ---------------------------------------------------------------------------

# Published 6th-order polynomial coefficients of the UTCI operational
# procedure (Brode et al. 2012, UTCI_a002.f90, www.utci.org) keyed by
# exponents of (tas [degC], wind [m/s], mrt-tas delta [K], vapour
# pressure [kPa]).  These are public reference constants, not code.
UTCI_POLYNOMIAL_COEFFICIENTS = (
    # (tas_pow, wind_pow, dtmrt_pow, pa_pow, coefficient) -- Brode 2012
    (0, 0, 0, 0, 0.607562052),
    (0, 0, 0, 1, 5.12733497),
    (0, 0, 0, 2, -2.80626406),
    (0, 0, 0, 3, -0.0353874123),
    (0, 0, 0, 4, 0.614155345),
    (0, 0, 0, 5, 0.0882773108),
    (0, 0, 0, 6, 0.00148348065),
    (0, 0, 1, 0, 0.398374029),
    (0, 0, 1, 1, -0.0369476348),
    (0, 0, 1, 2, 0.0514507424),
    (0, 0, 1, 3, -0.00226921615),
    (0, 0, 1, 4, -0.00148526421),
    (0, 0, 1, 5, 0.000247090539),
    (0, 0, 2, 0, 0.00075504309),
    (0, 0, 2, 1, -0.00073246918),
    (0, 0, 2, 2, 0.000304788893),
    (0, 0, 2, 3, 0.000302122035),
    (0, 0, 2, 4, -9.77675906e-06),
    (0, 0, 3, 0, -1.21206673e-05),
    (0, 0, 3, 1, -3.59413173e-07),
    (0, 0, 3, 2, -4.36497725e-06),
    (0, 0, 3, 3, -4.09087898e-07),
    (0, 0, 4, 0, -1.30369025e-09),
    (0, 0, 4, 1, 3.94367674e-08),
    (0, 0, 4, 2, 3.23926897e-09),
    (0, 0, 5, 0, 6.62154879e-10),
    (0, 0, 5, 1, -1.15606447e-10),
    (0, 0, 6, 0, -4.73602469e-12),
    (0, 1, 0, 0, -2.2583652),
    (0, 1, 0, 1, 0.548050612),
    (0, 1, 0, 2, -0.308806365),
    (0, 1, 0, 3, 0.0453433455),
    (0, 1, 0, 4, 0.00355375387),
    (0, 1, 0, 5, 0.00104452989),
    (0, 1, 1, 0, -0.0200518269),
    (0, 1, 1, 1, 0.0086420339),
    (0, 1, 1, 2, -0.000266016305),
    (0, 1, 1, 3, -0.000796355448),
    (0, 1, 1, 4, -6.80434415e-06),
    (0, 1, 2, 0, 0.00015454725),
    (0, 1, 2, 1, 2.7786293e-05),
    (0, 1, 2, 2, 7.68023384e-06),
    (0, 1, 2, 3, 1.73825715e-06),
    (0, 1, 3, 0, 1.25006734e-06),
    (0, 1, 3, 1, -4.79768731e-07),
    (0, 1, 3, 2, 2.67489271e-08),
    (0, 1, 4, 0, -5.08220384e-09),
    (0, 1, 4, 1, 3.34678041e-10),
    (0, 1, 5, 0, 1.95087203e-12),
    (0, 2, 0, 0, -0.751269505),
    (0, 2, 0, 1, -0.0429223622),
    (0, 2, 0, 2, 0.00210787756),
    (0, 2, 0, 3, 0.00021750861),
    (0, 2, 0, 4, 0.000102449757),
    (0, 2, 1, 0, 0.000169992415),
    (0, 2, 1, 1, -3.59217476e-05),
    (0, 2, 1, 2, -0.000106823306),
    (0, 2, 1, 3, -6.31223658e-06),
    (0, 2, 2, 0, -1.56236307e-05),
    (0, 2, 2, 1, 2.53016723e-06),
    (0, 2, 2, 2, -3.5993791e-08),
    (0, 2, 3, 0, -3.3651463e-08),
    (0, 2, 3, 1, 1.62897058e-09),
    (0, 2, 4, 0, 1.17139133e-10),
    (0, 3, 0, 0, 0.158137256),
    (0, 3, 0, 1, -0.00125813502),
    (0, 3, 0, 2, 0.00041785659),
    (0, 3, 0, 3, 3.3321714e-05),
    (0, 3, 1, 0, 8.49242932e-05),
    (0, 3, 1, 1, -1.243823e-05),
    (0, 3, 1, 2, 2.29748967e-07),
    (0, 3, 2, 0, 6.51711721e-07),
    (0, 3, 2, 1, -3.95079398e-08),
    (0, 3, 3, 0, 4.1703262e-10),
    (0, 4, 0, 0, -0.0127762753),
    (0, 4, 0, 1, 0.000129735808),
    (0, 4, 0, 2, -3.04620472e-06),
    (0, 4, 1, 0, -4.99410301e-06),
    (0, 4, 1, 1, 2.20609296e-07),
    (0, 4, 2, 0, -1.00361113e-08),
    (0, 5, 0, 0, 0.000456306672),
    (0, 5, 0, 1, -2.28558686e-06),
    (0, 5, 1, 0, 8.15300114e-08),
    (0, 6, 0, 0, -5.91491269e-06),
    (1, 0, 0, 0, 0.9772287657000001),
    (1, 0, 0, 1, -0.312788561),
    (1, 0, 0, 2, 0.548712484),
    (1, 0, 0, 3, -0.22120119),
    (1, 0, 0, 4, -0.0616755931),
    (1, 0, 0, 5, -0.00301859306),
    (1, 0, 1, 0, 0.000183945314),
    (1, 0, 1, 1, 0.00162325322),
    (1, 0, 1, 2, -0.00432510997),
    (1, 0, 1, 3, 0.000380261982),
    (1, 0, 1, 4, -4.11469183e-05),
    (1, 0, 2, 0, -5.65095215e-05),
    (1, 0, 2, 1, -1.87381964e-05),
    (1, 0, 2, 2, -6.42070836e-05),
    (1, 0, 2, 3, -4.77403547e-06),
    (1, 0, 3, 0, -2.1820366e-07),
    (1, 0, 3, 1, 7.04388046e-07),
    (1, 0, 3, 2, 1.68737969e-07),
    (1, 0, 4, 0, 4.13908461e-10),
    (1, 0, 4, 1, -1.18566247e-09),
    (1, 0, 5, 0, 4.0386326e-13),
    (1, 1, 0, 0, 0.0880326035),
    (1, 1, 0, 1, -0.00330552823),
    (1, 1, 0, 2, 0.0116952364),
    (1, 1, 0, 3, -0.00432943862),
    (1, 1, 0, 4, -0.000513027851),
    (1, 1, 1, 0, 0.000892859837),
    (1, 1, 1, 1, -0.000687405181),
    (1, 1, 1, 2, 0.000263789586),
    (1, 1, 1, 3, 2.53458034e-05),
    (1, 1, 2, 0, 5.2411097e-06),
    (1, 1, 2, 1, -5.06004592e-06),
    (1, 1, 2, 2, -5.47446896e-07),
    (1, 1, 3, 0, -1.81584736e-09),
    (1, 1, 3, 1, 7.96079978e-09),
    (1, 1, 4, 0, -2.24730961e-11),
    (1, 2, 0, 0, -0.00408350271),
    (1, 2, 0, 1, 0.00500845667),
    (1, 2, 0, 2, -0.000698445738),
    (1, 2, 0, 3, -6.66724702e-05),
    (1, 2, 1, 0, -4.99204314e-05),
    (1, 2, 1, 1, 3.28696511e-05),
    (1, 2, 1, 2, 3.61341136e-06),
    (1, 2, 2, 0, -1.33895614e-07),
    (1, 2, 2, 1, -1.72857035e-08),
    (1, 2, 3, 0, 1.35908359e-10),
    (1, 3, 0, 0, -6.57263143e-05),
    (1, 3, 0, 1, -0.000179330391),
    (1, 3, 0, 2, -1.27043871e-05),
    (1, 3, 1, 0, 1.35191328e-06),
    (1, 3, 1, 1, -7.385844e-09),
    (1, 3, 2, 0, 1.94960053e-09),
    (1, 4, 0, 0, 9.66891875e-06),
    (1, 4, 0, 1, 1.2906487e-06),
    (1, 4, 1, 0, -1.89489258e-08),
    (1, 5, 0, 0, -1.74202546e-07),
    (2, 0, 0, 0, 0.000806470249),
    (2, 0, 0, 1, -0.0196701861),
    (2, 0, 0, 2, -0.0039942841),
    (2, 0, 0, 3, 0.0155126038),
    (2, 0, 0, 4, 0.00133374846),
    (2, 0, 1, 0, -0.00017375451),
    (2, 0, 1, 1, -3.1427968e-05),
    (2, 0, 1, 2, 8.99281156e-05),
    (2, 0, 1, 3, -5.45314314e-09),
    (2, 0, 2, 0, -4.52166564e-07),
    (2, 0, 2, 1, 4.80925239e-06),
    (2, 0, 2, 2, 1.16257971e-06),
    (2, 0, 3, 0, 7.51269482e-09),
    (2, 0, 3, 1, -1.89309167e-08),
    (2, 0, 4, 0, 9.22652254e-12),
    (2, 1, 0, 0, 0.00216844454),
    (2, 1, 0, 1, -0.0016411944),
    (2, 1, 0, 2, 0.000495271903),
    (2, 1, 0, 3, 0.000145389826),
    (2, 1, 1, 0, 3.45433048e-06),
    (2, 1, 1, 1, -9.13863872e-06),
    (2, 1, 1, 2, -7.01199003e-06),
    (2, 1, 2, 0, -8.75874982e-08),
    (2, 1, 2, 1, 1.14325367e-07),
    (2, 1, 3, 0, -3.52197671e-10),
    (2, 2, 0, 0, -5.21670675e-05),
    (2, 2, 0, 1, 1.00601257e-06),
    (2, 2, 0, 2, 2.30109073e-05),
    (2, 2, 1, 0, 2.47417178e-07),
    (2, 2, 1, 1, -7.10542454e-07),
    (2, 2, 2, 0, 2.49709824e-09),
    (2, 3, 0, 0, 2.22697524e-07),
    (2, 3, 0, 1, 2.34994441e-06),
    (2, 3, 1, 0, -6.21531254e-09),
    (2, 4, 0, 0, 2.52785852e-09),
    (3, 0, 0, 0, -0.000154271372),
    (3, 0, 0, 1, 0.00099969087),
    (3, 0, 0, 2, -0.000954009191),
    (3, 0, 0, 3, -0.000263917279),
    (3, 0, 1, 0, -7.60781159e-07),
    (3, 0, 1, 1, 2.59835559e-06),
    (3, 0, 1, 2, -7.14663943e-07),
    (3, 0, 2, 0, 2.46688878e-08),
    (3, 0, 2, 1, -8.7549204e-08),
    (3, 0, 3, 0, 9.79063848e-11),
    (3, 1, 0, 0, -1.53347087e-05),
    (3, 1, 0, 1, -5.16670694e-06),
    (3, 1, 0, 2, -1.90710882e-05),
    (3, 1, 1, 0, -3.77925774e-07),
    (3, 1, 1, 1, 5.15916806e-07),
    (3, 1, 2, 0, -1.50743064e-09),
    (3, 2, 0, 0, 1.94544667e-06),
    (3, 2, 0, 1, -1.81748644e-06),
    (3, 2, 1, 0, 1.07596466e-08),
    (3, 3, 0, 0, -4.16117031e-08),
    (4, 0, 0, 0, -3.24651735e-06),
    (4, 0, 0, 1, 9.51738512e-06),
    (4, 0, 0, 2, 1.93090978e-05),
    (4, 0, 1, 0, 3.77830287e-08),
    (4, 0, 1, 1, -4.77136523e-08),
    (4, 0, 2, 0, 2.42674348e-10),
    (4, 1, 0, 0, -5.72983704e-07),
    (4, 1, 0, 1, 9.52692432e-07),
    (4, 1, 1, 0, -1.69699377e-09),
    (4, 2, 0, 0, 1.14099531e-08),
    (5, 0, 0, 0, 7.32602852e-08),
    (5, 0, 0, 1, -4.66426341e-07),
    (5, 0, 1, 0, 5.43079673e-10),
    (5, 1, 0, 0, -2.55090145e-09),
    (6, 0, 0, 0, 1.35959073e-09),
)


def _fdir_ratio(time, csza, rsds) -> Column:
    """Direct-beam fraction of global horizontal irradiance (reference
    converters.py:2492-2537; Liljegren 2008 / Kong-Huber 2022)."""
    d = distance_from_sun(time)
    s_star = _c(rsds) / (1367.0 * csza * F.pow(d, -2.0))
    s_star = F.least(s_star, F.lit(0.85))
    ratio = F.exp(3.0 - 1.34 * s_star - 1.65 / s_star)
    ratio = F.least(ratio, F.lit(0.9))
    return F.when(
        (ratio <= 0.0) | (csza <= math.cos(89.5 / 180.0 * math.pi))
        | (_c(rsds) <= 0.0),
        0.0,
    ).otherwise(ratio)


def mean_radiant_temperature(
    time, lat_deg, rsds, rsus, rlds, rlus, stat: str = "sunlit"
) -> Column:
    """Mean radiant temperature [K] from the four radiation components
    (reference converters.py:2538-2640; Di Napoli 2020).  ``stat``:
    'sunlit' uses the sunlit-average cosine of the solar zenith angle
    (the reference default); 'instant' is subdaily-only and out of scope
    at daily grain."""
    if stat != "sunlit":
        raise NotImplementedError("daily grain supports stat='sunlit' only")
    csza = cosine_of_solar_zenith_angle(time, lat_deg, stat="average",
                                        sunlit=True)
    fdir = _fdir_ratio(time, csza, rsds)
    rsds_c = _c(rsds)
    direct = fdir * rsds_c
    diffuse = rsds_c - direct
    gamma = F.asin(csza)
    fp = 0.308 * F.cos(gamma * 0.988 - gamma * gamma / 50000.0)
    i_star = F.when(csza > 0.001, direct / csza).otherwise(0.0)
    stefan = 5.67e-8
    return F.pow(
        (1.0 / stefan) * (
            0.5 * _c(rlds) + 0.5 * _c(rlus)
            + (0.7 / 0.97) * (0.5 * diffuse + 0.5 * _c(rsus) + fp * i_star)
        ),
        0.25,
    )


_UTCI_UDF_CACHE: list = []


def _utci_polynomial_udf():
    """Arrow-vectorized evaluator of the Brode 2012 polynomial: per
    batch, the 6 powers of each of the 4 inputs are computed once and
    the 210 coefficient terms accumulate as numpy fused multiply-adds —
    all C loops, no JVM codegen involved.  Built lazily (pandas_udf at
    import time would touch the Spark session)."""
    if _UTCI_UDF_CACHE:
        return _UTCI_UDF_CACHE[0]
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    coefs = UTCI_POLYNOMIAL_COEFFICIENTS

    def _poly(t, v, d, p):
        arrs = {"t": t.to_numpy(dtype=float), "v": v.to_numpy(dtype=float),
                "d": d.to_numpy(dtype=float), "p": p.to_numpy(dtype=float)}
        pows = {}
        for nm, a in arrs.items():
            cur = a
            pows[(nm, 1)] = a
            for e in range(2, 7):
                cur = cur * a
                pows[(nm, e)] = cur
        acc = np.zeros_like(arrs["t"])
        for i, j, k, q, c in coefs:
            prod = None
            for nm, e in (("t", i), ("v", j), ("d", k), ("p", q)):
                if e:
                    prod = pows[(nm, e)] if prod is None \
                        else prod * pows[(nm, e)]
            acc += c if prod is None else c * prod
        return pd.Series(acc)

    # real type objects, not strings: `from __future__ import annotations`
    # would stringify inline hints and pyspark can't resolve them against
    # this local scope
    _poly.__annotations__ = {"t": pd.Series, "v": pd.Series,
                             "d": pd.Series, "p": pd.Series,
                             "return": pd.Series}
    udf = pandas_udf(_poly, returnType="double")
    _UTCI_UDF_CACHE.append(udf)
    return udf


def universal_thermal_climate_index(
    df, tas_c: str, hurs_pct: str, sfcwind_ms: str, mrt_k: str,
    *, out: str = "utci", wind_cap_min: bool = False,
    mask_invalid: bool = True,
):
    """UTCI [degC] (reference converters.py:2389-2491): appends column
    ``out`` to ``df`` from air temperature [degC], relative humidity
    [%], 10 m wind [m/s] and mean radiant temperature [K].

    This converter is DataFrame-level by design: the water-vapour
    partial pressure (ITS-90) and the four polynomial inputs are staged
    as real projected columns so each is evaluated once per row (the
    esat ``exp`` subtree must not replicate into every polynomial
    term); the polynomial itself runs in a vectorized Arrow pandas_udf
    (see the comment below for the measured JVM-codegen reasoning).

    ``mask_invalid`` NULLs outside the published validity range
    (-50<T<50, |delta|<30, 0.5<=v<17).
    """
    t = _c(tas_c)
    v = _c(sfcwind_ms)
    if wind_cap_min:
        v = F.greatest(v, F.lit(0.5))
    e_sat = saturation_vapor_pressure(t + 273.15, method="its90")  # Pa
    staged = (
        df.withColumn("_u_t", t)
        .withColumn("_u_v", v)
        .withColumn("_u_d", _c(mrt_k) - 273.15 - t)
        .withColumn("_u_p", (e_sat / 1000.0) * (_c(hurs_pct) / 100.0))
    )
    # The 210-term sum as ONE Column expression compiles into a single
    # generated Java method of ~30 kB bytecode — HotSpot silently
    # refuses to JIT anything past 8000 bytes (DontCompileHugeMethods),
    # so the hot loop ran INTERPRETED (~7 us/row, measured via
    # explain("codegen") maxMethodCodeSize).  Staged partial-sum
    # projections only help if whole-stage codegen is ALSO capped
    # (WSCG re-fuses consecutive Projects into one method), and capping
    # hugeMethodLimit session-wide regresses other queries.  A
    # vectorized Arrow pandas_udf sidesteps the JVM codegen limits
    # entirely: numpy evaluates the 210 fused multiply-adds in C over
    # each batch — measured 3.5x faster than the best JVM-expression
    # variant at sf0.1, and the per-batch power table is computed once.
    approx = _utci_polynomial_udf()(
        F.col("_u_t"), F.col("_u_v"), F.col("_u_d"), F.col("_u_p"))
    if mask_invalid:
        approx = F.when(
            (F.col("_u_t") > -50.0) & (F.col("_u_t") < 50.0)
            & (F.col("_u_d") > -30.0) & (F.col("_u_d") < 30.0)
            & (F.col("_u_v") >= 0.5) & (F.col("_u_v") < 17.0),
            approx,
        )
    drop = [c for c in staged.columns if c.startswith("_u_")]
    return staged.withColumn(out, approx).drop(*drop)


def tas(tasmin, tasmax) -> Column:
    """Deprecated alias of :func:`tas_from_tasmin_tasmax` (reference
    converters.py:226-240)."""
    return tas_from_tasmin_tasmax(tasmin, tasmax)


def clausius_clapeyron_scaled_precipitation(
    delta_tas_c, pr_baseline, cc_scale_factor: float = 1.07
) -> Column:
    """Scale baseline precipitation by the Clausius-Clapeyron relation:
    ``pr * factor**delta_T`` with delta_T in delta-degC (reference
    converters.py:1751-1797)."""
    return _c(pr_baseline) * F.pow(F.lit(float(cc_scale_factor)),
                                   _c(delta_tas_c))


def specific_humidity_from_dewpoint(
    tdps_k, ps, method: str = "sonntag90"
) -> Column:
    """Specific humidity [kg/kg] from dewpoint temperature [K] and air
    pressure [Pa]: ``q = eps*e / (p - e*(1-eps))`` with ``e`` the
    saturation vapour pressure at the dewpoint (reference
    converters.py:952-1026)."""
    eps = 0.62198  # molar weight ratio water / dry air
    e = saturation_vapor_pressure(tdps_k, method=method)
    return eps * e / (_c(ps) - e * (1.0 - eps))


def clearness_index(time, lat_deg, rsds) -> Column:
    """Clearness index: rsds over daily extraterrestrial radiation, 0 where
    rsds is 0 (reference converters.py:1589-1624).  ``time``/``lat_deg``
    feed the solar-geometry Columns; ``rsds`` must be in MJ m-2 d-1 to
    match :func:`xclim_spark.functions.solar.extraterrestrial_solar_radiation`
    output."""
    from .solar import extraterrestrial_solar_radiation

    rtop = extraterrestrial_solar_radiation(time, lat_deg)
    return F.when(_c(rsds) != 0, _c(rsds) / rtop).otherwise(F.lit(0.0))


def shortwave_downwelling_radiation_from_clearness_index(
    time, lat_deg, ci
) -> Column:
    """Inverse of :func:`clearness_index`: ``rsds = ci * rtop`` (reference
    converters.py:1627-1659)."""
    from .solar import extraterrestrial_solar_radiation

    return _c(ci) * extraterrestrial_solar_radiation(time, lat_deg)


def fao_allen98(net_radiation, tas_k, wind, es, ea, delta_svp, gamma,
                G: float = 0.0) -> Column:
    """FAO-56 Penman-Monteith reference evapotranspiration [mm/d] for the
    hypothetical short-grass surface (reference converters.py:1825-1874):
    net radiation [MJ m-2 d-1], air temperature [K], 2 m wind [m/s],
    saturation/actual vapour pressure and svp slope [kPa], psychrometric
    constant [kPa/degC]."""
    a1 = 0.408 * _c(delta_svp) * (_c(net_radiation) - F.lit(float(G)))
    a2 = _c(gamma) * 900.0 / _c(tas_k) * _c(wind) * (_c(es) - _c(ea))
    a3 = _c(delta_svp) + _c(gamma) * (1.0 + 0.34 * _c(wind))
    return (a1 + a2) / a3
