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
    "convert_calendar",
    "common_calendar",
    "decode_cf_offsets",
]

# cumulative days at the END of each month, noleap calendar
_NOLEAP_CUM = [31, 59, 90, 120, 151, 181, 212, 243, 273, 304, 334, 365]
_NOLEAP_LEN = [31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31]
# all_leap (366_day): February has 29 days every year
_ALLLEAP_CUM = [31, 60, 91, 121, 152, 182, 213, 244, 274, 305, 335, 366]
_ALLLEAP_LEN = [31, 29, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31]

CAL_DAYS_IN_YEAR = {"360_day": 360, "noleap": 365, "365_day": 365,
                    "all_leap": 366, "366_day": 366}


def _norm(cal: str) -> str:
    if cal in ("365_day",):
        return "noleap"
    if cal in ("366_day",):
        return "all_leap"
    if cal in ("gregorian", "proleptic_gregorian", "default"):
        return "standard"
    if cal not in ("360_day", "noleap", "all_leap", "standard"):
        raise ValueError(f"Unsupported calendar {cal!r}")
    return cal


def common_calendar(calendars, join: str = "outer") -> str:
    """Common calendar under the hierarchy 360_day < noleap < standard <
    all_leap (reference ``common_calendar``, calendar.py:183-236):
    'outer' picks the largest (no element lost on conversion, gaps
    possible), 'inner' the smallest (no gaps, elements dropped)."""
    ranks = {"360_day": 0, "noleap": 1, "standard": 2, "all_leap": 3}
    cals = sorted((_norm(c) for c in calendars), key=ranks.__getitem__)
    if join == "outer":
        return cals[-1]
    if join == "inner":
        return cals[0]
    raise ValueError(f"Unknown join criterion {join!r}")


def _cum(cal: str) -> list[int]:
    return _ALLLEAP_CUM if cal == "all_leap" else _NOLEAP_CUM


def _len(cal: str) -> list[int]:
    return _ALLLEAP_LEN if cal == "all_leap" else _NOLEAP_LEN


def _doy_tables(cal: str) -> tuple[list[int], list[int]]:
    """(month, day-of-month) for every doy of a 365/366-day calendar."""
    mlen = _len(cal)
    months, days = [], []
    for m, n in enumerate(mlen, start=1):
        months += [m] * n
        days += list(range(1, n + 1))
    return months, days


def month_from_doy(doy: Column | str, calendar: str) -> Column:
    """Month (1-12) of an integer day-of-year in the given calendar.

    Lookup-array literal indexed by doy, not a nested CASE chain: 12-deep
    conditional trees re-expand at every reference and push generated
    code past the JIT method limit (interpreted fallback, ~100x slower
    per row measured on the mixed-calendar ensemble query)."""
    d = F.col(doy) if isinstance(doy, str) else doy
    cal = _norm(calendar)
    if cal == "360_day":
        return ((d - 1) / 30).cast("int") + 1
    return F.element_at(F.lit(_doy_tables(cal)[0]), d.cast("int"))


def day_from_doy(doy: Column | str, calendar: str) -> Column:
    """Day-of-month of an integer day-of-year in the given calendar."""
    d = F.col(doy) if isinstance(doy, str) else doy
    cal = _norm(calendar)
    if cal == "360_day":
        return ((d - 1) % 30) + 1
    return F.element_at(F.lit(_doy_tables(cal)[1]), d.cast("int"))


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


def decode_cf_offsets(
    offsets: Column | str, units: str, calendar: str
) -> tuple[Column, Column]:
    """Decode CF integer day offsets in a NON-standard fixed-length
    calendar to the engine's dual ``(year, doy)`` representation — the
    end-to-end escape hatch the classic-NetCDF source's calendar gate
    names (io/netcdf3.py: noleap/360_day files must be ingested with
    ``decode_time=None`` and converted here; the reference decodes the
    same files via cftime, calendar.py:138-361).

    ``units`` must be ``'days since YYYY-MM-DD[...]'``; the epoch date
    is interpreted IN the target calendar (a 360_day file's
    'days since 1995-01-01' epoch is 360_day day 1).  Fixed-length
    calendars make this pure integer algebra — no UDF, no cftime:
    ``total = epoch_doy - 1 + offset``; ``year = y0 + floor(total/L)``;
    ``doy = total mod L + 1`` (floor semantics keep pre-epoch offsets
    exact).  Returns ``(year, doy)`` integer Columns.
    """
    import re

    m = re.match(r"\s*days?\s+since\s+(-?\d{1,4})-(\d{1,2})-(\d{1,2})",
                 units or "")
    if not m:
        raise ValueError(
            f"decode_cf_offsets needs 'days since YYYY-MM-DD' units, "
            f"got {units!r}")
    y0, m0, d0 = int(m.group(1)), int(m.group(2)), int(m.group(3))
    cal = _norm(calendar)
    if cal not in CAL_DAYS_IN_YEAR:
        raise ValueError(
            f"decode_cf_offsets supports fixed-length calendars "
            f"{sorted(CAL_DAYS_IN_YEAR)}; standard-calendar files "
            f"decode natively in the source (calendar {calendar!r})")
    L = CAL_DAYS_IN_YEAR[cal]
    if cal == "360_day":
        epoch_doy = (m0 - 1) * 30 + d0
    else:
        cum = _cum(cal)
        epoch_doy = ([0] + cum[:-1])[m0 - 1] + d0
    off = F.col(offsets) if isinstance(offsets, str) else offsets
    # floor, not cast: a midday-centred axis (…, -0.5, 0.5, …) must keep
    # floor-day semantics for pre-epoch samples (cast truncates toward 0)
    total = F.lit(epoch_doy - 1) + F.floor(off).cast("long")
    year = (F.lit(y0) + F.floor(total / F.lit(L))).cast("int")
    doy = (F.pmod(total, F.lit(L)) + 1).cast("int")
    return year, doy


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
    # target noleap / all_leap: cumulative start of month + clamped day
    cum, mlen = _cum(tgt), _len(tgt)
    start = F.element_at(F.lit([0] + cum[:-1]), m.cast("int"))
    maxd = F.element_at(F.lit(mlen), m.cast("int"))
    return start + F.least(d, maxd)


def _leap(y: Column) -> Column:
    return ((y % 4 == 0) & (y % 100 != 0)) | (y % 400 == 0)


def _days_in_year(y: Column, cal: str) -> Column:
    if cal == "standard":
        return F.when(_leap(y), 366).otherwise(365)
    return F.lit(CAL_DAYS_IN_YEAR[cal])


def _month_len(m: Column, y: Column, cal: str) -> Column:
    """Length of month ``m`` in calendar ``cal`` (year-dependent only for
    standard February).  Array-literal lookup, same rationale as
    :func:`month_from_doy`."""
    if cal == "360_day":
        return F.lit(30)
    mlen = _len("all_leap" if cal == "all_leap" else "noleap")
    base = F.element_at(F.lit(mlen), m.cast("int"))
    if cal == "standard":
        base = F.when((m == 2) & _leap(y), 29).otherwise(base)
    return base


def _doy_from_md(m: Column, d: Column, y: Column, cal: str) -> Column:
    if cal == "360_day":
        return (m - 1) * 30 + d
    cum = _cum("all_leap" if cal == "all_leap" else "noleap")
    start = F.element_at(F.lit([0] + cum[:-1]), m.cast("int"))
    doy = start + d
    if cal == "standard":
        doy = F.when((m > 2) & _leap(y), doy + 1).otherwise(doy)
    return doy


def convert_calendar(
    df,
    target: str,
    *,
    source: str | None = None,
    time: str = "time",
    year_col: str = "year",
    doy_col: str = "doy",
    align_on: str = "year",
    missing=None,
    cells: tuple = (),
):
    """Convert a DataFrame's time axis between CF calendars (reference
    ``convert_calendar``, calendar.py:138-361 — delegating, like the
    reference, to the xarray-documented semantics).

    Representation: the ``standard`` calendar is a DATE column named
    ``time``; non-standard calendars are integer ``(year_col, doy_col)``
    columns (synthetic dates like Feb 30 cannot be DATEs).

    Semantics:

    * conversions NOT involving ``360_day`` align on dates — dates
      missing from the target (Feb 29 -> noleap; Feb 29 of non-leap
      years <- all_leap) are dropped;
    * conversions involving ``360_day`` use ``align_on``: ``'year'``
      maps the day-of-year proportionally (``rint(doy * tgt/src)``,
      half-even — the xarray formula, so the same ~5 days per year are
      dropped going standard -> 360_day), ``'date'`` matches (month,
      day) pairs and drops days the target month lacks;
    * ``missing``: when given, the output is reindexed to the complete
      target axis per (cells, year) and gaps filled with this value
      (one extra left join; without it the conversion is a pure
      map-side projection — zero shuffles).
    """
    tgt = _norm(target)
    if source is None:
        source = "standard" if time in df.columns else None
    if source is None:
        raise ValueError("source calendar required for (year, doy) input")
    src = _norm(source)
    if src == tgt:
        return df

    if src == "standard":
        y = F.year(time)
        m = F.month(time)
        d = F.dayofmonth(time)
        sdoy = F.dayofyear(time)
    else:
        y = F.col(year_col)
        m = month_from_doy(F.col(doy_col), src)
        d = day_from_doy(F.col(doy_col), src)
        sdoy = F.col(doy_col)

    if "360_day" in (src, tgt) and align_on == "year":
        sd = _days_in_year(y, src)
        td = _days_in_year(y, tgt)

        def _rint(x):
            # Math.rint: round half to even (the xarray formula's rounding)
            fl = F.floor(x)
            frac = x - fl
            up = (frac > 0.5) | ((frac == 0.5) & (fl % 2 != 0))
            return (fl + F.when(up, 1).otherwise(0)).cast("int")

        tdoy = _rint(td * sdoy / sd)
        prev_r = _rint(td * (sdoy - 1) / sd)
        # duplicate target doys (downscaling) keep the first source day
        out = df.withColumn("_tdoy", tdoy) \
            .filter((sdoy == 1) | (tdoy != prev_r))
    else:
        # date alignment: drop (m, d) pairs the target month lacks
        valid = d <= _month_len(m, y, tgt)
        out = df.filter(valid).withColumn(
            "_tdoy", _doy_from_md(m, F.least(d, _month_len(m, y, tgt)),
                                  y, tgt))

    out = out.withColumn("_y", y)
    if tgt == "standard":
        res = out.withColumn(
            time,
            F.date_add(F.make_date("_y", F.lit(1), F.lit(1)),
                       F.col("_tdoy") - 1),
        ).drop("_tdoy", "_y")
        if src != "standard":
            res = res.drop(year_col, doy_col)
    else:
        res = out.withColumn(year_col, F.col("_y")) \
            .withColumn(doy_col, F.col("_tdoy")) \
            .drop("_tdoy", "_y")
        if src == "standard":
            res = res.drop(time)

    if missing is None:
        return res

    # reindex to the complete target axis and fill gaps
    keyed = [*cells]
    years = df.select(*keyed, y.alias("_y")).distinct()
    axis = years.withColumn(
        "_doy", F.explode(F.sequence(F.lit(1), _days_in_year(F.col("_y"),
                                                             tgt))))
    if tgt == "standard":
        axis = axis.withColumn(
            time, F.date_add(F.make_date("_y", F.lit(1), F.lit(1)),
                             F.col("_doy") - 1)).drop("_doy", "_y")
        joink = [*keyed, time]
    else:
        axis = axis.withColumnRenamed("_y", year_col) \
            .withColumnRenamed("_doy", doy_col)
        joink = [*keyed, year_col, doy_col]
    filled = axis.join(res, on=joink, how="left")
    for c in filled.columns:
        if c not in joink:
            filled = filled.withColumn(
                c, F.coalesce(F.col(c), F.lit(missing)))
    return filled
