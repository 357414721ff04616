"""Data-quality flag suite (reference ``src/xclim/core/dataflags.py``).

Each check is a boolean Column builder (True = suspicious value); the
suite runner evaluates all requested checks in ONE pass over the table
(one projection + one aggregate — no per-check scans) and returns either
per-row flag columns or the aggregated any-violation summary the
reference's ``data_flags`` dataset produces (dataflags.py:581-748).
``ecad_compliant`` (:749) is the conjunction.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "REGISTRY",
    "register_flag",
    "tasmax_below_tasmin",
    "tas_exceeds_tasmax",
    "tas_below_tasmin",
    "temperature_extremely_low",
    "temperature_extremely_high",
    "negative_accumulation_values",
    "very_large_precipitation_events",
    "wind_values_outside_of_bounds",
    "percentage_values_outside_of_bounds",
    "values_repeating_for_n_or_more_days",
    "values_op_thresh_repeating_for_n_or_more_days",
    "specific_discharge_extremely_high",
    "outside_n_standard_deviations_of_climatology",
    "data_flags",
    "ecad_compliant",
]

REGISTRY: dict[str, object] = {}


def register_flag(fn):
    """Extension point mirroring ``register_methods``
    (reference dataflags.py:87-112)."""
    REGISTRY[fn.__name__] = fn
    return fn


_c = lambda x: x if isinstance(x, Column) else F.col(x)  # noqa: E731


@register_flag
def tasmax_below_tasmin(tasmax, tasmin) -> Column:
    """(reference dataflags.py:124-160)"""
    return _c(tasmax) < _c(tasmin)


@register_flag
def tas_exceeds_tasmax(tas, tasmax) -> Column:
    """(reference dataflags.py:161-197)"""
    return _c(tas) > _c(tasmax)


@register_flag
def tas_below_tasmin(tas, tasmin) -> Column:
    """(reference dataflags.py:198-231)"""
    return _c(tas) < _c(tasmin)


@register_flag
def temperature_extremely_low(da, thresh: float = -90.0) -> Column:
    """(reference dataflags.py:232-268; thresh in data units)"""
    return _c(da) < thresh


@register_flag
def temperature_extremely_high(da, thresh: float = 60.0) -> Column:
    """(reference dataflags.py:269-305)"""
    return _c(da) > thresh


@register_flag
def negative_accumulation_values(da) -> Column:
    """(reference dataflags.py:306-338)"""
    return _c(da) < 0


@register_flag
def very_large_precipitation_events(da, thresh: float = 300.0) -> Column:
    """(reference dataflags.py:339-374; thresh in mm/d)"""
    return _c(da) > thresh


@register_flag
def wind_values_outside_of_bounds(da, lower: float = 0.0,
                                  upper: float = 46.0) -> Column:
    """(reference dataflags.py:419-463; default upper 46 m/s)"""
    return (_c(da) < lower) | (_c(da) > upper)


@register_flag
def percentage_values_outside_of_bounds(da) -> Column:
    """(reference dataflags.py:552-580)"""
    return (_c(da) < 0.0) | (_c(da) > 100.0)


def values_repeating_for_n_or_more_days(
    df: DataFrame, var: str, n: int, *,
    time: str = "time", cells: Sequence[str] = (),
    flag_name: str | None = None,
) -> DataFrame:
    """Suspiciously constant stretches (reference dataflags.py:519-551):
    flag every row inside a run of >= n identical consecutive values.
    Sessionization on value-unchanged — one window over (cell, time)."""
    from .operators.run_length import with_run_id

    name = flag_name or f"values_repeating_for_{n}_or_more_days"
    # run of equal values: condition is "same as previous row"; the run id
    # groups consecutive equal values together with the first of the run
    w = Window.partitionBy(*cells).orderBy(time)
    chg = (
        F.lag(var).over(w).isNull() | (F.col(var) != F.lag(var).over(w))
    ).cast("long")
    df = df.withColumn(
        "_vrun", F.sum(chg).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    wrun = Window.partitionBy(*cells, "_vrun")
    df = df.withColumn(name, F.count(F.lit(1)).over(wrun) >= n)
    return df.drop("_vrun")


def values_op_thresh_repeating_for_n_or_more_days(
    df: DataFrame, var: str, n: int, thresh: float, *, op: str = "==",
    time: str = "time", cells: Sequence[str] = (),
    flag_name: str | None = None,
) -> DataFrame:
    """Values repeating AT a threshold for ``n``-plus days (reference
    dataflags.py:377-416, e.g. pr pinned at exactly 5 mm/d for 5 days —
    a typical gauge-encoding artifact): ``suspicious_run`` restricted to
    runs whose repeated value satisfies ``op thresh``."""
    from .operators.run_length import suspicious_run

    name = flag_name or (
        f"values_{op}_{thresh}_repeating_for_{n}_or_more_days")
    return suspicious_run(df, var, window=n, op=op, thresh=thresh,
                          time=time, cells=cells, alias=name)


@register_flag
def specific_discharge_extremely_high(da, thresh: float = 100.0) -> Column:
    """Specific discharge above ``thresh`` (reference
    dataflags.py:823-851; default 100 mm/d)."""
    return _c(da) > thresh


def outside_n_standard_deviations_of_climatology(
    df: DataFrame, var: str, n: float = 5.0, *, window: int = 5,
    time: str = "time", cells: Sequence[str] = (),
    flag_name: str | None = None,
) -> DataFrame:
    """Values beyond n sigma of the day-of-year climatology (reference
    dataflags.py:464-518): the climatology is the same doy-window pooled
    dim table as ``percentile_doy`` (mean/std instead of quantiles),
    joined back on the 365-day axis."""
    from .calendar import doy365

    name = flag_name or f"outside_{int(n)}_standard_deviations_of_climatology"
    half = window // 2
    offsets = F.sequence(F.lit(-half), F.lit(half))
    pooled = df.withColumn("_doy0", doy365(time)).withColumn(
        "_off", F.explode(offsets)
    )
    bucket = ((F.col("_doy0") - 1 + F.col("_off") + 365) % 365) + 1
    clim = pooled.withColumn("dayofyear", bucket).groupBy(
        *cells, "dayofyear"
    ).agg(F.avg(var).alias("_cmean"), F.stddev_pop(var).alias("_cstd"))
    fact = df.withColumn("dayofyear", doy365(time))
    j = fact.join(clim, on=[*cells, "dayofyear"], how="left")
    return j.withColumn(
        name, F.abs(F.col(var) - F.col("_cmean")) > n * F.col("_cstd")
    ).drop("_cmean", "_cstd", "dayofyear")


def data_flags(
    df: DataFrame, checks: dict[str, Column], *, per_row: bool = False
) -> DataFrame:
    """Run a suite of flag expressions in one pass (reference
    ``data_flags``, dataflags.py:581-748).

    ``checks`` maps flag name -> boolean Column.  ``per_row=True`` returns
    the table with one boolean column per check; otherwise the aggregated
    any-violation summary (one row, one boolean per check)."""
    if per_row:
        out = df
        for name, cond in checks.items():
            out = out.withColumn(name, cond)
        return out
    aggs = [
        F.max(F.coalesce(cond.cast("boolean"), F.lit(False))).alias(name)
        for name, cond in checks.items()
    ]
    return df.agg(*aggs)


def ecad_compliant(df: DataFrame, checks: dict[str, Column]) -> DataFrame:
    """Single conjunction verdict (reference ``ecad_compliant``,
    dataflags.py:749-822): True iff no check fires anywhere."""
    summary = data_flags(df, checks)
    cols = summary.columns
    verdict = F.lit(True)
    for c in cols:
        verdict = verdict & ~F.col(c)
    return summary.select(verdict.alias("ecad_qc_flag"))
