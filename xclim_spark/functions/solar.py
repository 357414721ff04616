"""Solar geometry helpers as pure Column expressions
(reference ``src/xclim/indices/helpers.py:95-545``).

All formulas are the published Spencer (1971) Fourier series and the
standard sunset-hour-angle day-length relation (Kalogirou 2014) —
elementwise trig on (time, lat), fully codegen'd.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..calendar import is_leap_year

__all__ = ["day_angle", "solar_declination", "day_lengths",
           "extraterrestrial_solar_radiation", "make_hourly_temperature",
           "distance_from_sun", "cosine_of_solar_zenith_angle",
           "wind_speed_height_conversion",
           "huglin_day_length_latitude_coefficient",
           "gladstones_day_length_latitude_coefficient",
           "jones_day_length_latitude_coefficient"]

_PI = math.pi


def _c(x):
    return x if isinstance(x, Column) else F.col(x)


def day_angle(time) -> Column:
    """Fraction of the year as an angle [rad] (reference helpers.py:95:
    julian day fraction x 2 pi)."""
    t = _c(time)
    diy = F.when(is_leap_year(t), 366.0).otherwise(365.0)
    return (F.dayofyear(t) - 1).cast("double") / diy * (2.0 * _PI)


def solar_declination(time, method: str = "spencer") -> Column:
    """Solar declination angle [rad] (reference helpers.py:119-180):
    Spencer 1971 seven-term Fourier series, or the circular-orbit
    'simple' approximation."""
    da = day_angle(time)
    if method == "simple":
        return 0.4091 * F.sin(da - 1.39)
    if method == "spencer":
        return (
            0.006918
            - 0.399912 * F.cos(da) + 0.070257 * F.sin(da)
            - 0.006758 * F.cos(2 * da) + 0.000907 * F.sin(2 * da)
            - 0.002697 * F.cos(3 * da) + 0.001480 * F.sin(3 * da)
        )
    raise NotImplementedError("method must be 'simple' or 'spencer'")


def extraterrestrial_solar_radiation(
    time, lat_deg, method: str = "simple",
    solar_constant_wm2: float | None = None,
) -> Column:
    """Daily extraterrestrial radiation Ra [MJ m-2 day-1] (reference
    helpers.py:400-449; FAO-56 eq. 21): ``(24*60/pi) Gsc dr (ws sin(lat)
    sin(decl) + cos(lat) cos(decl) sin(ws))`` with Gsc = 0.0820
    MJ m-2 min-1 and inverse-distance factor dr.  Polar night clamps the
    sunset hour angle."""
    decl = solar_declination(time, method)
    lat = F.radians(_c(lat_deg) if not isinstance(lat_deg, (int, float))
                    else F.lit(float(lat_deg)))
    da = day_angle(time)
    dr = 1.0 + 0.033 * F.cos(da)
    tantan = -F.tan(lat) * F.tan(decl)
    ws = F.acos(F.greatest(F.lit(-1.0), F.least(F.lit(1.0), tantan)))
    # Gsc [MJ m-2 min-1]: FAO-56 0.0820 by default, or derived from an
    # explicit solar constant (reference uses 1367 W m-2 for MB05 PET).
    gsc = (0.0820 if solar_constant_wm2 is None
           else solar_constant_wm2 * 60.0 / 1e6)
    return (24.0 * 60.0 / _PI) * gsc * dr * (
        ws * F.sin(lat) * F.sin(decl) + F.cos(lat) * F.cos(decl) * F.sin(ws)
    )


def distance_from_sun(time) -> Column:
    """Sun-earth distance [AU] (reference helpers.py:65-94): two-term
    cosine series on the mean anomaly ``g = 357.528 + 0.9856003 d``
    (Astronomical Almanac via USNO)."""
    t = _c(time)
    days = (F.unix_timestamp(t).cast("double") / 86400.0
            - 10957.5)  # days since J2000 epoch 2000-01-01 12:00 UTC
    g = F.radians((357.528 + 0.9856003 * days) % 360.0)
    return 1.00014 - 0.01671 * F.cos(g) - 0.00014 * F.cos(2.0 * g)


def cosine_of_solar_zenith_angle(
    time, lat_deg, stat: str = "average", sunlit: bool = True,
) -> Column:
    """Daily statistic of the cosine of the solar zenith angle
    (reference helpers.py:241-400, Kalogirou 2014 eq. 2.12/2.15).

    For daily data the sunlit-average integral collapses to the closed
    form ``sin d sin l + cos d cos l sin(ws)/ws`` with ``ws`` the sunset
    hour angle; polar day reduces to ``sin d sin l`` and polar night to
    0.  ``stat='integral'`` returns the unnormalized hour-angle integral
    (multiply by 86400/2pi for seconds).  Subdaily intervals are out of
    scope — the engine treats daily grain as noon-centred, matching the
    reference's daily branch.
    """
    decl = solar_declination(time)
    lat = F.radians(_c(lat_deg) if not isinstance(lat_deg, (int, float))
                    else F.lit(float(lat_deg)))
    sinsin = F.sin(decl) * F.sin(lat)
    coscos = F.cos(decl) * F.cos(lat)
    if not sunlit:
        # whole-day average over [-pi, pi): the cos term integrates to ~0
        ws = F.lit(_PI - 1e-9)
    else:
        tantan = -F.tan(lat) * F.tan(decl)
        ws = F.acos(F.greatest(F.lit(-1.0), F.least(F.lit(1.0), tantan)))
        polar_night = tantan > 1.0
    integral = 2.0 * (sinsin * ws + coscos * F.sin(ws))
    avg = integral / (2.0 * ws)
    if sunlit:
        integral = F.when(polar_night, 0.0).otherwise(integral)
        # polar day: ws = pi, sin(ws) ~ 0 -> avg = sinsin, already right
        avg = F.when(polar_night, 0.0).otherwise(avg)
    if stat == "average":
        return avg
    if stat == "integral":
        return integral
    raise NotImplementedError("stat must be 'average' or 'integral'")


def wind_speed_height_conversion(
    sfcwind, h_source: float = 10.0, h_target: float = 2.0
) -> Column:
    """Logarithmic wind profile re-anchoring (reference
    helpers.py:809-870; FAO-56 eq. 47):
    ``u_t = u_s ln(67.8 h_t - 5.42) / ln(67.8 h_s - 5.42)``."""
    lo = 1.0 + 5.42 / 67.8
    if min(h_source, h_target) < lo:
        raise ValueError(f"heights must be > {lo:.3f} m for the log profile")
    return _c(sfcwind) * (
        math.log(67.8 * h_target - 5.42) / math.log(67.8 * h_source - 5.42)
    )


def day_lengths(
    time, lat_deg, method: str = "spencer",
    infill_polar_days: bool = False,
) -> Column:
    """Day length in hours from date + latitude (reference
    helpers.py:450-525): ``24/pi * arccos(-tan(lat) tan(decl))``;
    polar day/night yield NULL (or 24/0 with ``infill_polar_days``)."""
    decl = solar_declination(time, method)
    lat = F.radians(_c(lat_deg) if not isinstance(lat_deg, (int, float))
                    else F.lit(float(lat_deg)))
    tantan = -F.tan(lat) * F.tan(decl)
    hours = (24.0 / _PI) * F.acos(tantan)
    valid = F.abs(tantan) <= 1.0
    out = F.when(valid, hours)
    if infill_polar_days:
        polar_day = ~valid & (tantan < -1.0)
        out = F.when(valid, hours).when(polar_day, F.lit(24.0)) \
            .otherwise(F.lit(0.0))
    return out


def make_hourly_temperature(
    df, tasmin: str, tasmax: str, lat_deg, *,
    time: str = "time", cells=(),
):
    """Hourly temperature from daily min/max (reference
    ``make_hourly_temperature``, helpers.py:1059-1135): sinusoidal
    daytime profile (min at sunrise, max 2h before sunset via the
    ``daylength + 4`` stretch) and logarithmic nighttime cooling toward
    the NEXT day's minimum.

    Spark shape: one ``lead`` window for next-day tasmin (reuses the
    cell partitioning), then a map-side explode of 24 hour offsets —
    24x rows, zero extra shuffles.  Returns the input grain replaced by
    ``time`` (hourly timestamp) + ``tas``.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*cells).orderBy(time)
    dl = day_lengths(time, lat_deg, infill_polar_days=True)
    d = (
        df.withColumn("_dl", dl)
        .withColumn("_next_tn", F.coalesce(F.lead(tasmin).over(w),
                                           F.col(tasmin)))
    )
    # temperature at sunset = daytime profile evaluated at hour=daylength
    sunset = (F.col(tasmax) - F.col(tasmin)) * F.sin(
        (math.pi * F.col("_dl")) / (F.col("_dl") + 4.0)) + F.col(tasmin)
    d = d.withColumn("_sunset", sunset)
    d = d.withColumn("_h", F.explode(F.sequence(F.lit(0), F.lit(23))))
    h = F.col("_h").cast("double")
    day_t = (F.col(tasmax) - F.col(tasmin)) * F.sin(
        (math.pi * h) / (F.col("_dl") + 4.0)) + F.col(tasmin)
    nh = F.greatest(h + 1.0 - F.col("_dl"), F.lit(1.0))
    # the reference evaluates the night profile with daylength-1
    # (helpers.py:1117-1121), so the log denominator is 24-(dl-1)=25-dl
    night_t = F.col("_sunset") - (
        (F.col("_sunset") - F.col("_next_tn"))
        / F.log(25.0 - F.col("_dl"))
    ) * F.log(nh)
    tas = F.when(h < F.col("_dl"), day_t).otherwise(night_t)
    return (
        d.withColumn(
            "time_h",
            F.to_timestamp(F.col(time)) + F.make_interval(
                hours=F.col("_h")),
        )
        .withColumn("tas", tas)
        .drop("_dl", "_next_tn", "_sunset", "_h")
    )

def eccentricity_correction_factor(time, method: str = "spencer") -> Column:
    """Eccentricity correction factor of Earth's orbit — squared ratio of
    mean to instantaneous Earth-Sun distance (reference
    helpers.py:195-242: Spencer 1971 five-term Fourier series, or the
    Perrin de Brichambaut two-term 'simple' form)."""
    da = day_angle(time)
    if method == "simple":
        return 1.0 + 0.033 * F.cos(da)
    if method == "spencer":
        return (
            1.0001100
            + 0.034221 * F.cos(da) + 0.001280 * F.sin(da)
            + 0.000719 * F.cos(2 * da) + 0.000077 * F.sin(2 * da)
        )
    raise NotImplementedError("method must be 'simple' or 'spencer'")


def time_correction_for_solar_angle(time) -> Column:
    """Watch-time -> solar-time correction angle [rad], wrapped to
    (-pi, pi] (reference helpers.py:166-193; Di Napoli 2020).  The
    Fourier fit is evaluated in degrees then converted, exactly as the
    reference does."""
    da = day_angle(time)
    tc_deg = (
        0.004297 + 0.107029 * F.cos(da) - 1.837877 * F.sin(da)
        - 0.837378 * F.cos(2 * da) - 2.340475 * F.sin(2 * da)
    )
    # numpy's % is sign-of-divisor; Spark's % is sign-of-dividend, so the
    # wrap must use pmod to match _wrap_radians (helpers.py:88)
    return F.pmod(tc_deg * (_PI / 180.0) + _PI, F.lit(2.0 * _PI)) - _PI



# ---------------------------------------------------------------------------
# Viticulture day-length latitude coefficients
# (reference helpers.py:528-790: Huglin 1978 / Gladstones 1992 /
# Hall & Jones 2010)
# ---------------------------------------------------------------------------

def huglin_day_length_latitude_coefficient(
    lat_deg, method: str = "huglin", cap_value: float = float("nan"),
) -> Column:
    """Simple day-length latitude coefficient k (reference
    helpers.py:528-616): 'huglin' is the stepwise 1.0..1.06 table over
    |lat| 40..50 deg; 'interpolated' the smoothed
    ``1 + clip((|lat|-40)/10, 0) * 0.06``; beyond 50 deg both return
    ``cap_value`` (NaN by default, as the reference)."""
    al = F.abs(_c(lat_deg))
    if method in ("huglin", "icclim"):
        return (
            F.when(al <= 40.0, 1.0)
            .when(al <= 42.0, 1.02)
            .when(al <= 44.0, 1.03)
            .when(al <= 46.0, 1.04)
            .when(al <= 48.0, 1.05)
            .when(al <= 50.0, 1.06)
            .otherwise(F.lit(float(cap_value)))
        )
    if method == "interpolated":
        k = 1.0 + F.greatest((al - 40.0) / 10.0, F.lit(0.0)) * 0.06
        return F.when(al <= 50.0, k).otherwise(F.lit(float(cap_value)))
    raise NotImplementedError(
        "huglin_day_length_latitude_coefficient supports 'huglin' and "
        "'interpolated'")


def gladstones_day_length_latitude_coefficient(
    time, lat_deg, neutral_latitude: float = 40.0,
    constrain: float | None = None, day_length_method: str = "spencer",
) -> Column:
    """Daily Gladstones day-length coefficient (reference
    helpers.py:618-687): the ratio of the day length at ``lat`` to the
    day length at the hemisphere-matched neutral latitude (default
    40 deg).  ``constrain`` pins k to 1.0 inside +-constrain deg."""
    lat = _c(lat_deg)
    dl = day_lengths(time, lat, method=day_length_method)
    pn = day_lengths(time, abs(float(neutral_latitude)),
                     method=day_length_method)
    ps = day_lengths(time, -abs(float(neutral_latitude)),
                     method=day_length_method)
    if constrain is None:
        return F.when(lat >= 0.0, dl / pn).otherwise(dl / ps)
    c = abs(float(constrain))
    return (
        F.when(lat >= c, dl / pn)
        .when(lat <= -c, dl / ps)
        .otherwise(F.lit(1.0))
    )


def jones_day_length_latitude_coefficient(
    df, lat_deg, *, method: str = "jones", floor: bool = False,
    start_date: str = "04-01", end_date: str = "11-01",
    freq: str = "YS", time: str = "time", cells=(),
):
    """Season-aggregated Hall & Jones 2010 day-length coefficient
    (reference helpers.py:688-790): per (cells, year), the sum of
    spencer day lengths over [start_date, end_date) gives
    ``k_jones = 2.8311e-4 * sum + 0.30834``; the 'gladstones' variant is
    the published linear transform ``1.1135 k - 0.1352``.  Matching the
    reference's order of operations (helpers.py:770-806): the
    all-below-1 guard is evaluated on the RAW jones coefficient (a
    season where every cell's k_jones < 1.0 nulls out), THEN the
    gladstones transform is applied, THEN ``floor`` clamps to >= 1 —
    so with floor=True a guard-nulled season floors to 1.0 (xarray's
    ``where(k >= 1, 1.0)`` maps NaN to 1.0, as does Spark's
    null-condition ``otherwise``).  The reference additionally raises
    ValueError when every season nulls out; that is a data-dependent
    check this lazy builder cannot do at plan time — callers that need
    it should assert ``k.where("k is not null").head() is not None``.
    Returns a DataFrame of (cells, period, k) — dim-sized,
    broadcastable against the fact side."""
    from pyspark.sql import Window

    from ..calendar import period_start

    if freq not in ("YS", "YS-JAN", "YS-JUL"):
        raise NotImplementedError(
            "jones coefficient needs an annual freq (YS/YS-JAN/YS-JUL)")
    mmdd = F.date_format(F.col(time), "MM-dd")
    sel = (mmdd >= start_date) & (mmdd < end_date)
    dl = day_lengths(time, lat_deg, method="spencer")
    agg = (
        df.filter(sel)
        .groupBy(*cells, period_start(time, freq).alias("period"))
        .agg(F.sum(dl).alias("_sdl"))
    )
    if method not in ("jones", "gladstones"):
        raise NotImplementedError("method must be 'jones' or 'gladstones'")
    # Guard on the RAW jones coefficient (reference helpers.py:786-787),
    # then transform, then floor — in that order.
    agg = agg.withColumn("_k", 2.8311e-4 * F.col("_sdl") + 0.30834)
    w = Window.partitionBy("period")
    all_below = F.max("_k").over(w) < 1.0
    k = F.when(all_below, F.lit(None)).otherwise(F.col("_k"))
    if method == "gladstones":
        k = 1.1135 * k - 0.1352
    if floor:
        # null condition -> otherwise branch, so guard-nulls floor to
        # 1.0, matching xarray's where(k >= 1, 1.0) NaN behaviour.
        k = F.when(k >= 1.0, k).otherwise(F.lit(1.0))
    return agg.select(*cells, "period", k.alias("k"))
