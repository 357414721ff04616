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

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "humidex",
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
    "ESAT_FORMULAS_COEFFICIENTS",
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
    method: str = "hargreaves85",
) -> Column:
    """Daily PET [mm/day] (reference converters.py:1890-2155).

    Methods here: ``hargreaves85`` (``0.0023 * 0.408 Ra (tas+17.8)
    sqrt(tasmax-tasmin)``, Hargreaves & Samani 1985) and
    ``baierrobertson65`` (Baier & Robertson 1965, temperatures in degF and
    Ra in cal cm-2 day-1).  ``Ra`` comes from
    :func:`~xclim_spark.functions.solar.extraterrestrial_solar_radiation`.
    The Penman-Monteith/Thornthwaite variants need additional inputs and
    are out of scope for the expression tier.
    """
    from .solar import extraterrestrial_solar_radiation

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
    raise ValueError(f"Unknown PET method {method!r}")
