"""Calendar / frequency algebra for the Spark engine.

Re-expresses the reference's offset handling (``parse_offset`` /
``construct_offset``, reference ``src/xclim/core/calendar.py:516-688``) and
temporal predicate helpers (``select_time``,
``src/xclim/core/calendar.py:1259-1376``) as Spark Column expressions.

Design: a frequency string (pandas-style offset alias: ``"D"``, ``"MS"``,
``"QS-DEC"``, ``"YS-JUL"``, ``"W"``, ``"3MS"`` ...) compiles to a *period
start* expression — a DATE column marking the calendar-anchored period each
row belongs to.  All resampling in the engine is
``groupBy(cells..., period_start)``; Catalyst turns that into a single
hash-aggregate with map-side partial aggregation, which is the scalable plan
(no driver-side loops over periods, no collect).

Every compiler here has a twin that emits the equivalent DuckDB SQL snippet
(used by the correctness oracle) so the Spark plan and the SQL oracle can
never drift apart.
"""

from __future__ import annotations

import re
from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "parse_offset",
    "construct_offset",
    "compare_offsets",
    "is_offset_divisor",
    "period_start",
    "period_start_sql",
    "select_time",
    "select_time_sql",
    "doy",
    "doy365",
    "doy365_sql",
    "is_leap_year",
    "time_bnds",
    "stack_periods",
    "unstack_periods",
    "doy_to_days_since",
    "days_since_to_doy",
    "doy_from_string",
    "build_climatology_bounds",
    "mask_between_doys",
    "within_bnds_doy",
    "climatological_mean_doy",
    "adjust_doy_calendar",
    "add_season_coord",
    "split_time_to_season_year",
    "SEASONS",
]

_MONTH_ABBR = {
    "JAN": 1, "FEB": 2, "MAR": 3, "APR": 4, "MAY": 5, "JUN": 6,
    "JUL": 7, "AUG": 8, "SEP": 9, "OCT": 10, "NOV": 11, "DEC": 12,
}
_ABBR_MONTH = {v: k for k, v in _MONTH_ABBR.items()}

# Months belonging to each meteorological season (reference
# src/xclim/core/calendar.py:1259-1376 uses the same DJF/MAM/JJA/SON split).
SEASONS = {
    "DJF": (12, 1, 2),
    "MAM": (3, 4, 5),
    "JJA": (6, 7, 8),
    "SON": (9, 10, 11),
}

_OFFSET_RE = re.compile(r"^(\d*)\s*([A-Za-z]+?)(S)?(?:-([A-Za-z]{3}))?$")

# Canonical base codes we support (pandas offset alias bases).
_BASES = {"D", "W", "M", "Q", "Y", "A", "H", "T", "MIN"}

# Approximate period length in days, for offset comparison.
_BASE_DAYS = {"H": 1 / 24, "T": 1 / 1440, "MIN": 1 / 1440, "D": 1, "W": 7,
              "M": 30, "Q": 90, "Y": 365, "A": 365}


@dataclass(frozen=True)
class Offset:
    """Parsed frequency offset: ``mult x base``, start-anchored or not.

    Mirrors the 4-tuple returned by the reference's ``parse_offset``
    (``src/xclim/core/calendar.py:516-557``).
    """

    mult: int
    base: str          # one of D W M Q Y H T
    start: bool        # True for "MS"/"QS"/"YS" (start-of-period labels)
    anchor: str | None  # month abbreviation for Q/Y anchors, else None

    @property
    def anchor_month(self) -> int:
        if self.anchor is None:
            # pandas: YS anchors JAN, QS anchors JAN, YE anchors DEC
            return 1 if self.start else 12
        return _MONTH_ABBR[self.anchor]


def parse_offset(freq: str) -> Offset:
    """Parse a pandas-style offset alias into an :class:`Offset`.

    Supports ``D W M Q Y H min`` bases, optional integer multiplier,
    optional ``S`` (start-anchored) suffix, and ``-MMM`` anchors
    (``"YS-JUL"``, ``"QS-DEC"``).
    """
    m = _OFFSET_RE.match(freq.strip())
    if not m:
        raise ValueError(f"Cannot parse frequency offset {freq!r}")
    mult_s, base, start_s, anchor = m.groups()
    base = base.upper()
    # Normalize pandas aliases: "A"->"Y", "AS"->"YS", "ME"->"M", "YE"->"Y"
    if base in ("A", "AS"):
        base = "Y"
    if base.endswith("E") and base[:-1] in ("M", "Q", "Y"):
        base = base[:-1]
    if base == "MIN":
        base = "T"
    if base not in ("D", "W", "M", "Q", "Y", "H", "T"):
        raise ValueError(f"Unsupported offset base in {freq!r}")
    start = bool(start_s) or base in ("D", "W", "H", "T")
    mult = int(mult_s) if mult_s else 1
    if anchor is not None:
        anchor = anchor.upper()
        if anchor not in _MONTH_ABBR:
            raise ValueError(f"Bad anchor month in {freq!r}")
    return Offset(mult=mult, base=base, start=start, anchor=anchor)


def construct_offset(mult: int, base: str, start: bool, anchor: str | None) -> str:
    """Inverse of :func:`parse_offset` (reference calendar.py:560-600)."""
    s = "S" if start and base in ("M", "Q", "Y") else ""
    a = f"-{anchor}" if anchor else ""
    m = str(mult) if mult != 1 else ""
    return f"{m}{base}{s}{a}"


def compare_offsets(freq_a: str, op: str, freq_b: str) -> bool:
    """Approximate length comparison of two freqs (calendar.py:601-640)."""
    a = parse_offset(freq_a)
    b = parse_offset(freq_b)
    da = a.mult * _BASE_DAYS[a.base]
    db = b.mult * _BASE_DAYS[b.base]
    import operator as _op

    ops = {">": _op.gt, "<": _op.lt, ">=": _op.ge, "<=": _op.le,
           "==": _op.eq, "!=": _op.ne}
    return ops[op](da, db)


def is_offset_divisor(divisor: str, offset: str) -> bool:
    """Can series at freq ``divisor`` be resampled to ``offset``?

    (reference calendar.py:641-688) — approximate: divisor must be <= and
    the bases nest (D|W into M/Q/Y; M into Q/Y; Q into Y).
    """
    d = parse_offset(divisor)
    o = parse_offset(offset)
    order = {"T": 0, "H": 1, "D": 2, "W": 3, "M": 4, "Q": 5, "Y": 6}
    if order[d.base] > order[o.base]:
        return False
    if d.base == "W" and o.base in ("M", "Q", "Y"):
        return False  # weeks don't nest into months
    return True


# ---------------------------------------------------------------------------
# Period-start expression compiler
# ---------------------------------------------------------------------------

def period_start(time: Column | str, freq: str) -> Column:
    """Spark DATE column: start of the ``freq`` period containing ``time``.

    This is the engine's replacement for the reference's
    ``da.resample(time=freq)`` grouper (``src/xclim/indices/generic.py:83-125``):
    resampling is ``groupBy(period_start(time, freq))``.

    Anchored years/quarters (``YS-JUL``, ``QS-DEC``) compile to
    ``add_months(trunc(add_months(t, -shift), unit), shift)`` — pure
    built-in expressions, fully codegen'd, no UDF.
    """
    t = F.col(time) if isinstance(time, str) else time
    off = parse_offset(freq)
    if off.mult != 1 and off.base not in ("D", "H", "T"):
        raise ValueError(f"Multiples only supported for D/H/min bases, got {freq!r}")

    if off.base == "D":
        if off.mult == 1:
            return F.to_date(t)
        # n-day bins anchored at the unix epoch (deterministic, data-independent)
        days = F.datediff(F.to_date(t), F.lit("1970-01-01"))
        return F.date_add(F.lit("1970-01-01").cast("date"),
                          (F.floor(days / off.mult) * off.mult).cast("int"))
    if off.base == "W":
        return F.trunc(t, "week")  # Monday, same as DuckDB date_trunc('week')
    if off.base == "M":
        return F.trunc(t, "month")
    if off.base == "Q":
        shift = (off.anchor_month - 1) % 3
        if shift == 0:
            return F.trunc(t, "quarter")
        return F.add_months(F.trunc(F.add_months(t, -shift), "quarter"), shift)
    if off.base == "Y":
        shift = off.anchor_month - 1
        if shift == 0:
            return F.trunc(t, "year")
        return F.add_months(F.trunc(F.add_months(t, -shift), "year"), shift)
    if off.base == "H":
        return F.date_trunc("hour", t)  # timestamp, not date
    if off.base == "T":
        return F.date_trunc("minute", t)
    raise ValueError(f"Unsupported freq {freq!r}")


def period_start_sql(time_expr: str, freq: str) -> str:
    """DuckDB SQL equivalent of :func:`period_start` (oracle twin)."""
    off = parse_offset(freq)
    if off.base == "D":
        if off.mult == 1:
            return f"CAST(date_trunc('day', {time_expr}) AS DATE)"
        n = off.mult
        return (
            f"CAST(DATE '1970-01-01' + INTERVAL (CAST(FLOOR("
            f"date_diff('day', DATE '1970-01-01', CAST({time_expr} AS DATE)) / {n}"
            f") AS INTEGER) * {n}) DAY AS DATE)"
        )
    if off.base == "W":
        return f"CAST(date_trunc('week', {time_expr}) AS DATE)"
    if off.base == "M":
        return f"CAST(date_trunc('month', {time_expr}) AS DATE)"
    if off.base in ("Q", "Y"):
        unit = "quarter" if off.base == "Q" else "year"
        shift = ((off.anchor_month - 1) % 3) if off.base == "Q" else (off.anchor_month - 1)
        if shift == 0:
            return f"CAST(date_trunc('{unit}', {time_expr}) AS DATE)"
        return (
            f"CAST(date_trunc('{unit}', {time_expr} - INTERVAL {shift} MONTH)"
            f" + INTERVAL {shift} MONTH AS DATE)"
        )
    if off.base == "H":
        return f"date_trunc('hour', {time_expr})"
    if off.base == "T":
        return f"date_trunc('minute', {time_expr})"
    raise ValueError(f"Unsupported freq {freq!r}")


def doy(time: Column | str) -> Column:
    """Day-of-year expression (1-366)."""
    t = F.col(time) if isinstance(time, str) else time
    return F.dayofyear(t)


def is_leap_year(time: Column | str) -> Column:
    """Gregorian leap-year predicate for the row's year."""
    t = F.col(time) if isinstance(time, str) else time
    y = F.year(t)
    return ((y % 4 == 0) & (y % 100 != 0)) | (y % 400 == 0)


def doy365(time: Column | str) -> Column:
    """Day-of-year mapped onto a 365-day axis (1-365).

    In leap years every day after Feb 28 shifts down by one, so Feb 29
    pools with Feb 28 and Mar 1 aligns with the non-leap Mar 1 — the same
    365-bucket alignment the reference gets by converting calendars before
    ``percentile_doy`` (reference calendar.py:396-494, convert_doy :264).
    Both the climatology build and the fact-side lookup must use this
    mapping so the doy join never produces NULLs for doy 366.
    """
    t = F.col(time) if isinstance(time, str) else time
    d = F.dayofyear(t)
    return d - (is_leap_year(t) & (d > 59)).cast("int")


def doy_to_days_since(
    doy: Column | str, year: Column | str, start: str = "01-01"
) -> Column:
    """Convert day-of-year values to days since ``start`` ('MM-DD') of the
    row's year (reference ``doy_to_days_since``, calendar.py:1004-1136):
    doys before the start wrap into the next cycle, so statistics across
    years behave near the year boundary."""
    d = F.col(doy) if isinstance(doy, str) else doy
    y = F.col(year) if isinstance(year, str) else year
    mm, dd = (int(x) for x in start.split("-"))
    start_doy = F.dayofyear(F.make_date(y, F.lit(mm), F.lit(dd)))
    diy = F.when(is_leap_year(F.make_date(y, F.lit(1), F.lit(1))), 366) \
        .otherwise(365)
    delta = d - start_doy
    return F.when(delta < 0, delta + diy).otherwise(delta)


def days_since_to_doy(
    days: Column | str, year: Column | str, start: str = "01-01"
) -> Column:
    """Inverse of :func:`doy_to_days_since`."""
    v = F.col(days) if isinstance(days, str) else days
    y = F.col(year) if isinstance(year, str) else year
    mm, dd = (int(x) for x in start.split("-"))
    start_doy = F.dayofyear(F.make_date(y, F.lit(mm), F.lit(dd)))
    diy = F.when(is_leap_year(F.make_date(y, F.lit(1), F.lit(1))), 366) \
        .otherwise(365)
    raw = v + start_doy
    return F.when(raw > diy, raw - diy).otherwise(raw)


def time_bnds(period: Column | str, freq: str) -> Column:
    """Interval bounds of a period-start column (reference ``time_bnds``,
    calendar.py:793-905): struct(start, end) where end is the last day of
    the period — ``next period start - 1 day``."""
    p = F.col(period) if isinstance(period, str) else period
    off = parse_offset(freq)
    if off.base in ("Y", "A"):
        nxt = F.add_months(p, 12 * off.mult)
    elif off.base == "Q":
        nxt = F.add_months(p, 3 * off.mult)
    elif off.base == "M":
        nxt = F.add_months(p, off.mult)
    elif off.base == "W":
        nxt = F.date_add(p, 7 * off.mult)
    elif off.base == "D":
        nxt = F.date_add(p, off.mult)
    else:
        raise ValueError(f"Unsupported freq {freq!r} for time_bnds")
    return F.struct(p.alias("start"), F.date_sub(nxt, 1).alias("end"))


def stack_periods(
    df, time: Column | str = "time", *, window: int = 30, stride: int = 10,
    min_length: int | None = None,
) -> "DataFrame":  # noqa: F821
    """Stack rolling multi-year windows (reference ``stack_periods``,
    calendar.py:1396-1731): each row is replicated into every
    ``window``-year period (stride ``stride``) that contains it, labelled
    by a ``period_label`` column (the period's first year).

    Map-side explode — the replication factor is ``window/stride`` and no
    shuffle happens here; downstream groupBys key on
    ``(cells..., period_label)``.

    ``min_length`` (default ``window``): windows overlapping the data's
    year extent by fewer than this many years are dropped, mirroring the
    reference's short-window pruning — a 30-year "normal" labelled before
    the data starts must not silently average 3 years.  The extent comes
    from a broadcast 1-row min/max aggregate (column-pruned scan of the
    time column), so the plan stays fully declarative.
    """
    t = F.col(time) if isinstance(time, str) else time
    y = F.year(t)
    # labels are years L = y0 + k*stride with L <= year <= L + window - 1
    # → k in [ceil((y - w + 1 - y0)/s), floor((y - y0)/s)]; y0 anchored at
    # the label grid origin 0 so L = any multiple of stride
    first = (F.ceil((y - window + 1).cast("double") / stride) * stride) \
        .cast("int")
    last = (F.floor(y.cast("double") / stride) * stride).cast("int")
    labels = F.sequence(first, last, F.lit(stride))
    out = df.withColumn("period_label", F.explode(labels))
    if min_length is None:
        min_length = window
    bounds = df.select(F.min(y).alias("_ymin"), F.max(y).alias("_ymax"))
    lbl = F.col("period_label")
    overlap = (
        F.least(lbl + (window - 1), F.col("_ymax"))
        - F.greatest(lbl, F.col("_ymin")) + 1
    )
    return (
        out.crossJoin(F.broadcast(bounds))
        .filter(overlap >= min_length)
        .drop("_ymin", "_ymax")
    )


def unstack_periods(
    df, time: Column | str = "time", *, window: int = 30, stride: int = 10,
    label: str = "period_label",
) -> "DataFrame":  # noqa: F821
    """Inverse of :func:`stack_periods` (reference ``unstack_periods``,
    calendar.py:1584-1731): map per-period rows back onto a single time
    axis.  With ``stride < window`` only the center-most stride of each
    window is kept, except the first/last periods which also contribute
    their leading/trailing sections — exactly the reference's
    non-ambiguous overlap rule (its slice table is reproduced by the
    ``sec`` arithmetic below).

    In the long-format model this is a **pure filter**: a row belongs to
    section ``sec = (year - period_label) // stride`` of its period, and
    is kept iff ``sec == mid`` (or ``sec <= mid`` / ``sec >= mid`` for the
    first / last period).  Zero shuffle — the only extra plan node is a
    broadcast of the 1-row min/max period-label aggregate.  The reference
    requires ``window/stride`` to be an odd integer for the same
    ambiguity reason; mirror that.
    """
    t = F.col(time) if isinstance(time, str) else time
    lbl = F.col(label)
    if window == stride:
        # Non-overlapping windows: every row sits in exactly one period.
        return df.drop(label)
    if window % stride != 0 or (window // stride) % 2 != 1:
        raise NotImplementedError(
            "`unstack_periods` can't work with strides that do not divide "
            f"the window into an odd number of parts. Got {window} / "
            f"{stride}.")
    nwin = window // stride
    mid = (nwin - 1) // 2
    sec = F.floor((F.year(t) - lbl).cast("double") / stride)
    bounds = df.select(F.min(lbl).alias("_lmin"), F.max(lbl).alias("_lmax"))
    keep = (
        F.when(lbl == F.col("_lmin"), sec <= mid)
        .when(lbl == F.col("_lmax"), sec >= mid)
        .otherwise(sec == mid)
    )
    return (
        df.crossJoin(F.broadcast(bounds))
        .filter(keep)
        .drop("_lmin", "_lmax", label)
    )


# cumulative days before each month, non-leap
_MONTH_CUMDAYS = (0, 31, 59, 90, 120, 151, 181, 212, 243, 273, 304, 334)


def doy_from_string(doy: str, year: int, calendar: str = "standard") -> int:
    """Day-of-year of an 'MM-DD' string in a given year and calendar
    (reference ``doy_from_string``, calendar.py:114-131) — a plan-build
    scalar, evaluated driver-side like all Quantified parsing."""
    mm, dd = (int(p) for p in doy.split("-"))
    if calendar in ("360_day",):
        return (mm - 1) * 30 + dd
    base = _MONTH_CUMDAYS[mm - 1] + dd
    leap = (year % 4 == 0 and year % 100 != 0) or year % 400 == 0
    if calendar in ("noleap", "365_day"):
        leap = False
    elif calendar in ("all_leap", "366_day"):
        leap = True
    return base + (1 if leap and mm > 2 else 0)


def build_climatology_bounds(df, time: str = "time") -> list:
    """['first date', 'last date'] of the time axis (reference
    ``build_climatology_bounds``, calendar.py:497-513) — a 1-row
    column-pruned min/max aggregate, collected driver-side (two scalars,
    the CF ``climatology_bounds`` attribute payload)."""
    row = df.select(
        F.date_format(F.min(time), "yyyy-MM-dd").alias("lo"),
        F.date_format(F.max(time), "yyyy-MM-dd").alias("hi"),
    ).collect()[0]
    return [row["lo"], row["hi"]]


def mask_between_doys(
    time: Column | str,
    doy_bounds: tuple,
    include_bounds: tuple = (True, True),
) -> Column:
    """Predicate Column: time inside the doy window (reference
    ``mask_between_doys``, calendar.py:1166-1240; wrap-around windows —
    start > end — span the year boundary).  Same kernel as
    ``select_time(doy_bounds=...)``; exposed under the reference's
    name."""
    return select_time(time, doy_bounds=tuple(doy_bounds),
                       include_bounds=tuple(include_bounds))


def climatological_mean_doy(
    df, var: str, *, window: int = 5, time: str = "time",
    cells: Sequence[str] = (),
) -> "DataFrame":  # noqa: F821
    """Per-(cell, doy365) climatological mean and std over a centered
    ``window``-day pool (reference ``climatological_mean_doy``,
    calendar.py:907-933).  The window pool is a map-side explode of the
    day offsets (same shape as ``percentile_doy``); one aggregation on
    (cells, doy) follows.  Returns ``cells..., dayofyear, clim_mean,
    clim_std``."""
    half = window // 2
    offs = F.array(*[F.lit(o) for o in range(-half, half + 1)])
    pooled = df.select(
        *cells, F.col(var).alias("_v"), doy365(time).alias("_d0"),
        F.explode(offs).alias("_off"),
    ).select(
        *cells, "_v",
        ((F.col("_d0") - 1 + F.col("_off") + 365) % 365 + 1)
        .alias("dayofyear"),
    )
    return pooled.groupBy(*cells, "dayofyear").agg(
        F.avg("_v").alias("clim_mean"),
        F.stddev_pop("_v").alias("clim_std"),
    )


def within_bnds_doy(
    df, var: str, bounds, *, time: str = "time",
    cells: Sequence[str] = (),
    low: str = "low", high: str = "high", alias: str = "within",
) -> "DataFrame":  # noqa: F821
    """Boolean per row: value within its day-of-year's [low, high] bounds
    (reference ``within_bnds_doy``, calendar.py:934-965).  ``bounds`` is
    a doy-keyed table (``cells..., dayofyear, low, high``) — dim-sized,
    broadcast onto the facts; the join key uses the same leap-safe
    doy365 axis as the climatology builders.  Bounds are strict
    (``low < v < high``), matching the reference's
    ``(low < arr) * (arr < high)`` — values exactly at a bound are
    flagged outside."""
    b = F.broadcast(bounds)
    j = df.withColumn("dayofyear", doy365(time)) \
        .join(b, on=[*cells, "dayofyear"], how="left")
    return j.withColumn(
        alias, (F.col(var) > F.col(low)) & (F.col(var) < F.col(high)))


def adjust_doy_calendar(
    source, target_max: int, *, source_max: int | None = None,
    doy_col: str = "dayofyear", cells: Sequence[str] = (),
) -> "DataFrame":  # noqa: F821
    """Linearly interpolate a doy-keyed table onto another doy range
    (reference ``adjust_doy_calendar``, calendar.py:729-786, e.g. a
    360-day climatology onto 365 days).  The target axis is generated
    with ``sequence`` + explode and each target doy joins its floor and
    ceil source rows — two broadcast joins of dim-sized tables, value
    columns interpolated as expressions."""
    from pyspark.sql import DataFrame as _DF

    assert isinstance(source, _DF)
    if source_max is None:
        source_max = source.agg(F.max(doy_col)).collect()[0][0]
    vals = [c for c in source.columns
            if c != doy_col and c not in cells]
    keys = list(cells)
    tgt = (source.select(*keys).distinct() if keys
           else source.limit(1).select(F.lit(1).alias("_one")))
    tgt = tgt.select(
        *keys, F.explode(F.sequence(F.lit(1), F.lit(int(target_max))))
        .alias(doy_col))
    # fractional source position of each target doy
    pos = (F.col(doy_col) - 1.0) / (target_max - 1.0) * (source_max - 1.0) \
        + 1.0
    lo_i = F.floor(pos).cast("int")
    tgt = tgt.withColumn("_pos", pos).withColumn("_lo", lo_i) \
        .withColumn("_hi", F.least(lo_i + 1, F.lit(int(source_max))))
    s_lo = source.select(
        *keys, F.col(doy_col).alias("_lo"),
        *[F.col(v).alias(f"_lo_{v}") for v in vals])
    s_hi = source.select(
        *keys, F.col(doy_col).alias("_hi"),
        *[F.col(v).alias(f"_hi_{v}") for v in vals])
    j = tgt.join(F.broadcast(s_lo), on=[*keys, "_lo"]) \
           .join(F.broadcast(s_hi), on=[*keys, "_hi"])
    g = F.col("_pos") - F.col("_lo")
    out_cols = [*keys, F.col(doy_col)] + [
        (F.col(f"_lo_{v}") + g * (F.col(f"_hi_{v}") - F.col(f"_lo_{v}")))
        .alias(v) for v in vals]
    return j.select(*out_cols)


_MONTH_INITIALS = "JFMAMJJASOND"


def add_season_coord(df, freq: str, *, time: str = "time") -> "DataFrame":  # noqa: F821
    """Add a ``season`` label column for a sub-yearly resampling freq
    (reference ``add_season_coord``, calendar.py:1732-1774): 'annual' for
    yearly freqs, the 3-letter month abbreviation for monthly, and the
    month-initial string ('DJF', 'JFM', …) for multi-month periods.  A
    plan-time CASE over the 12 months — no resample needed in long
    format (each row's season follows from its month and the freq
    anchor)."""
    off = parse_offset(freq)
    if off.base not in "YQM":
        raise ValueError(
            f"Only monthly or coarser freqs are supported. Got: {freq}.")
    if (off.base == "M" and 12 % off.mult != 0) or \
            (off.base == "Q" and off.mult not in (1, 2, 4)) or \
            (off.base == "Y" and off.mult > 1):
        raise ValueError(
            f"Only periods that divide the year evenly work. Got {freq}.")
    m = F.month(F.col(time) if isinstance(time, str) else time)
    if off.base == "Y":
        return df.withColumn("season", F.lit("annual"))
    n = off.mult * (3 if off.base == "Q" else 1)
    if n == 1:
        label = {i + 1: _ABBR_MONTH[i + 1] for i in range(12)}
    else:
        # periods anchor at month s = anchor + k*n; each month belongs to
        # the period starting at the anchored month at or before it
        anchor = off.anchor_month
        label = {}
        for k in range(12 // n):
            s = (anchor - 1 + k * n) % 12
            lab = "".join(_MONTH_INITIALS[(s + i) % 12] for i in range(n))
            for i in range(n):
                label[(s + i) % 12 + 1] = lab
    expr = F.lit(None).cast("string")
    for month, lab in label.items():
        expr = F.when(m == month, F.lit(lab)).otherwise(expr)
    return df.withColumn("season", expr)


def split_time_to_season_year(
    df, freq: str, *, time: str = "time",
) -> "DataFrame":  # noqa: F821
    """Split the time axis into (year, season) keys (reference
    ``split_time_to_season_year``, calendar.py:1775-1815): rows keep a
    ``season`` label plus the anchored ``year`` their period belongs to
    (months before the anchor roll back one year).  The reference's
    unstack-to-wide is the long format's groupBy on these keys."""
    off = parse_offset(freq)
    df = add_season_coord(df, freq, time=time)
    t = F.col(time) if isinstance(time, str) else time
    anchor = off.anchor_month if off.base != "Y" else 1
    year = F.when(F.month(t) < anchor, F.year(t) - 1).otherwise(F.year(t))
    return df.withColumn("year", year.cast("int"))


def doy365_sql(time_expr: str) -> str:
    """DuckDB twin of :func:`doy365`."""
    leap = (
        f"((year({time_expr}) % 4 = 0 AND year({time_expr}) % 100 <> 0)"
        f" OR year({time_expr}) % 400 = 0)"
    )
    return (
        f"(dayofyear({time_expr}) - CASE WHEN {leap}"
        f" AND dayofyear({time_expr}) > 59 THEN 1 ELSE 0 END)"
    )


# ---------------------------------------------------------------------------
# Temporal predicates — select_time (reference calendar.py:1259-1376)
# ---------------------------------------------------------------------------

def _doy_from_mmdd(s: str) -> tuple[int, int]:
    mm, dd = s.split("-")
    return int(mm), int(dd)


def select_time(
    time: Column | str,
    *,
    season: str | list[str] | None = None,
    month: int | list[int] | None = None,
    doy_bounds: tuple[int, int] | None = None,
    date_bounds: tuple[str, str] | None = None,
    include_bounds: bool | tuple[bool, bool] = True,
) -> Column:
    """Boolean Column implementing the reference's ``select_time`` indexer.

    The returned predicate is pushed into ``df.filter`` so Catalyst can push
    it to the parquet scan (temporal predicate pushdown — the reference does
    this by hand in ``IndexingIndicator``, indicator.py:1646-1654; here it is
    free).

    ``doy_bounds``/``date_bounds`` wrap around the year end when
    ``start > end`` (e.g. doy 300→50), matching the reference semantics.
    """
    t = F.col(time) if isinstance(time, str) else time
    preds = []
    if season is not None:
        seasons = [season] if isinstance(season, str) else list(season)
        months: list[int] = []
        for s in seasons:
            months.extend(SEASONS[s.upper()])
        preds.append(F.month(t).isin(months))
    if month is not None:
        months = [month] if isinstance(month, int) else list(month)
        preds.append(F.month(t).isin(months))
    if doy_bounds is not None:
        lo, hi = doy_bounds
        d = F.dayofyear(t)
        if lo <= hi:
            preds.append((d >= lo) & (d <= hi))
        else:  # wrap around year end
            preds.append((d >= lo) | (d <= hi))
    if date_bounds is not None:
        (m1, d1) = _doy_from_mmdd(date_bounds[0])
        (m2, d2) = _doy_from_mmdd(date_bounds[1])
        key = F.month(t) * 100 + F.dayofmonth(t)
        k1, k2 = m1 * 100 + d1, m2 * 100 + d2
        if k1 <= k2:
            preds.append((key >= k1) & (key <= k2))
        else:
            preds.append((key >= k1) | (key <= k2))
    if not preds:
        return F.lit(True)
    out = preds[0]
    for p in preds[1:]:
        out = out & p
    return out


def select_time_sql(
    time_expr: str,
    *,
    season: str | list[str] | None = None,
    month: int | list[int] | None = None,
    doy_bounds: tuple[int, int] | None = None,
    date_bounds: tuple[str, str] | None = None,
) -> str:
    """DuckDB SQL predicate equivalent of :func:`select_time` (oracle twin)."""
    preds = []
    if season is not None:
        seasons = [season] if isinstance(season, str) else list(season)
        months: list[int] = []
        for s in seasons:
            months.extend(SEASONS[s.upper()])
        preds.append(f"month({time_expr}) IN ({','.join(map(str, months))})")
    if month is not None:
        months = [month] if isinstance(month, int) else list(month)
        preds.append(f"month({time_expr}) IN ({','.join(map(str, months))})")
    if doy_bounds is not None:
        lo, hi = doy_bounds
        d = f"dayofyear({time_expr})"
        preds.append(f"({d} >= {lo} AND {d} <= {hi})" if lo <= hi
                     else f"({d} >= {lo} OR {d} <= {hi})")
    if date_bounds is not None:
        (m1, d1) = _doy_from_mmdd(date_bounds[0])
        (m2, d2) = _doy_from_mmdd(date_bounds[1])
        key = f"(month({time_expr})*100 + dayofmonth({time_expr}))"
        k1, k2 = m1 * 100 + d1, m2 * 100 + d2
        preds.append(f"({key} >= {k1} AND {key} <= {k2})" if k1 <= k2
                     else f"({key} >= {k1} OR {key} <= {k2})")
    return " AND ".join(preds) if preds else "TRUE"
