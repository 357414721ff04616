"""Non-standard calendars: 360_day and noleap (365_day) support.

Spark has no native cftime — the engine's dual representation (SURVEY
§1.1) encodes non-standard time as integer ``(year, doy)`` columns and
provides calendar-aware expression kernels for the pieces timestamps
usually give for free: month/day decoding, period keys for resampling,
and day-of-year conversion between calendars
(reference ``src/xclim/core/calendar.py:138-361``: ``get_calendar``,
``convert_doy``; month algebra per calendar).

Period keys are sortable ``year*10000 + month*100 + day`` integers
(synthetic dates like Feb 30 exist in 360_day and cannot be DATEs).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "CAL_DAYS_IN_YEAR",
    "month_from_doy",
    "day_from_doy",
    "period_key",
    "convert_doy_calendar",
]

# cumulative days at the END of each month, noleap calendar
_NOLEAP_CUM = [31, 59, 90, 120, 151, 181, 212, 243, 273, 304, 334, 365]
_NOLEAP_LEN = [31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31]

CAL_DAYS_IN_YEAR = {"360_day": 360, "noleap": 365, "365_day": 365}


def _norm(cal: str) -> str:
    if cal in ("365_day",):
        return "noleap"
    if cal not in ("360_day", "noleap"):
        raise ValueError(f"Unsupported calendar {cal!r}")
    return cal


def month_from_doy(doy: Column | str, calendar: str) -> Column:
    """Month (1-12) of an integer day-of-year in the given calendar."""
    d = F.col(doy) if isinstance(doy, str) else doy
    cal = _norm(calendar)
    if cal == "360_day":
        return ((d - 1) / 30).cast("int") + 1
    expr = F.lit(12)
    for m in range(11, 0, -1):
        expr = F.when(d <= _NOLEAP_CUM[m - 1], F.lit(m)).otherwise(expr)
    return expr


def day_from_doy(doy: Column | str, calendar: str) -> Column:
    """Day-of-month of an integer day-of-year in the given calendar."""
    d = F.col(doy) if isinstance(doy, str) else doy
    cal = _norm(calendar)
    if cal == "360_day":
        return ((d - 1) % 30) + 1
    expr = d  # January
    for m in range(2, 13):
        expr = F.when(
            month_from_doy(d, cal) == m, d - _NOLEAP_CUM[m - 2]
        ).otherwise(expr)
    return expr


def period_key(
    year: Column | str, doy: Column | str, freq: str, calendar: str
) -> Column:
    """Sortable integer period key (YYYYMMDD of the period start) for
    resampling (year, doy) series — the non-standard-calendar analogue of
    :func:`xclim_spark.calendar.period_start`.

    Supported freqs: YS, MS, QS (calendar quarters), D.
    """
    y = F.col(year) if isinstance(year, str) else year
    cal = _norm(calendar)
    m = month_from_doy(doy, cal)
    if freq == "YS":
        return y * 10000 + 101
    if freq == "MS":
        return y * 10000 + m * 100 + 1
    if freq == "QS":
        qm = ((m - 1) / 3).cast("int") * 3 + 1
        return y * 10000 + qm * 100 + 1
    if freq == "D":
        return y * 10000 + m * 100 + day_from_doy(doy, cal)
    raise ValueError(f"Unsupported freq {freq!r} for calendar {calendar!r}")


def convert_doy_calendar(
    doy: Column | str, source: str, target: str
) -> Column:
    """Map an integer day-of-year between calendars by decoding to
    (month, day) in the source and re-encoding in the target, clamping
    the day to the target month's length (reference ``convert_doy``,
    calendar.py:264-361, align_on='date' semantics).

    ``source``/``target`` are '360_day' or 'noleap'.
    """
    src, tgt = _norm(source), _norm(target)
    if src == tgt:
        return F.col(doy) if isinstance(doy, str) else doy
    m = month_from_doy(doy, src)
    d = day_from_doy(doy, src)
    if tgt == "360_day":
        dd = F.least(d, F.lit(30))
        return (m - 1) * 30 + dd
    # target noleap: cumulative start of month + clamped day
    start = F.lit(0)
    for mm in range(12, 1, -1):
        start = F.when(m == mm, F.lit(_NOLEAP_CUM[mm - 2])).otherwise(start)
    maxd = F.lit(31)
    for mm in range(12, 0, -1):
        maxd = F.when(m == mm, F.lit(_NOLEAP_LEN[mm - 1])).otherwise(maxd)
    return start + F.least(d, maxd)
