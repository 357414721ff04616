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
           "extraterrestrial_solar_radiation", "make_hourly_temperature"]

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
    time, lat_deg, method: str = "simple"
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
    gsc = 0.0820
    return (24.0 * 60.0 / _PI) * gsc * dr * (
        ws * F.sin(lat) * F.sin(decl) + F.cos(lat) * F.cos(decl) * F.sin(ws)
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
    night_t = F.col("_sunset") - (
        (F.col("_sunset") - F.col("_next_tn"))
        / F.log(24.0 - F.col("_dl"))
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
