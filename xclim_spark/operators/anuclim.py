"""ANUCLIM BIO-set kernels (reference ``src/xclim/indices/_anuclim.py``).

The signature pattern is the rolling 3-month "quarter": monthly reduce →
3-month window per cell → per year select the quarter extremizing a
selector variable (``_to_quarter`` :562 + ``_from_other_arg`` :527).
All pure window/aggregate plans — the quarter selection is one
``max_by``/``min_by`` aggregate, no self-joins.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..calendar import period_start

__all__ = ["temperature_seasonality", "precip_seasonality",
           "isothermality", "quarter_stat"]


def temperature_seasonality(
    df: DataFrame, tas: str, freq: str = "YS", *,
    time: str = "time", cells: Sequence[str] = (),
    alias: str = "temperature_seasonality",
    kelvin_offset: float = 273.15,
) -> DataFrame:
    """BIO4: coefficient of variation of temperature, computed in Kelvin
    (reference _anuclim.py:105-160) — ``100 * std / mean``."""
    k = F.col(tas) + kelvin_offset
    d = df.withColumn("_k", k)
    return (
        d.withColumn("period", period_start(time, freq))
        .groupBy(*cells, "period")
        .agg((100.0 * F.stddev_pop("_k") / F.avg("_k")).alias(alias))
    )


def precip_seasonality(
    df: DataFrame, pr: str, freq: str = "YS", *,
    time: str = "time", cells: Sequence[str] = (),
    alias: str = "precip_seasonality",
) -> DataFrame:
    """BIO15: CV of precipitation (reference _anuclim.py:161-214; the
    reference adds 1 to weekly/monthly means to avoid zero division —
    applied to the mean here)."""
    return (
        df.withColumn("period", period_start(time, freq))
        .groupBy(*cells, "period")
        .agg((100.0 * F.stddev_pop(pr) / (F.avg(pr) + 1.0)).alias(alias))
    )


def isothermality(
    df: DataFrame, tasmin: str, tasmax: str, freq: str = "YS", *,
    time: str = "time", cells: Sequence[str] = (),
    alias: str = "isothermality",
) -> DataFrame:
    """BIO3: mean diurnal range over extreme annual range x 100
    (reference _anuclim.py:66-104) — one aggregate computes both."""
    rng = F.col(tasmax) - F.col(tasmin)
    d = df.withColumn("_rng", rng)
    return (
        d.withColumn("period", period_start(time, freq))
        .groupBy(*cells, "period")
        .agg((100.0 * F.avg("_rng") /
              (F.max(tasmax) - F.min(tasmin))).alias(alias))
    )


def quarter_stat(
    df: DataFrame, var: str, *, op: str = "mean", sel_var: str | None = None,
    sel_op: str = "mean", select: str = "max", freq: str = "YS",
    time: str = "time", cells: Sequence[str] = (), alias: str = "quarter",
) -> DataFrame:
    """Value of ``var`` over the rolling 3-month quarter extremizing
    ``sel_var`` (BIO8-BIO11, BIO16-BIO19 shapes; reference
    ``_to_quarter``/``_from_other_arg``, _anuclim.py:527-620).

    ``op``/``sel_op``: 'mean' or 'sum' over the quarter; ``select``:
    'max' (warmest/wettest) or 'min'.  Plan: monthly reduce (shuffle 1)
    -> 3-month rolling window (reuses cell partitioning) -> per-year
    ``max_by`` (shuffle 2 on cells x years).
    """
    monthly = (
        df.withColumn("_m", period_start(time, "MS"))
        .groupBy(*cells, "_m")
        .agg(F.avg(var).alias("_v"),
             F.avg(sel_var or var).alias("_s"),
             F.sum(var).alias("_vs"),
             F.sum(sel_var or var).alias("_ss"))
    )
    w = Window.partitionBy(*cells).orderBy("_m").rowsBetween(0, 2)
    val = {"mean": F.avg("_v"), "sum": F.sum("_vs")}[op].over(w)
    sel = {"mean": F.avg("_s"), "sum": F.sum("_ss")}[sel_op].over(w)
    cnt = F.count("_v").over(w)
    q = monthly.withColumn("_qv", F.when(cnt == 3, val)) \
        .withColumn("_qs", F.when(cnt == 3, sel))
    picker = F.max_by if select == "max" else F.min_by
    # tie-break deterministically on the quarter start month
    key = F.struct(F.col("_qs").alias("s"),
                   (-F.unix_date(F.col("_m"))).alias("m"))
    return (
        q.filter(F.col("_qv").isNotNull())
        .withColumn("period", period_start("_m", freq))
        .groupBy(*cells, "period")
        .agg(picker(F.col("_qv"), key).alias(alias))
    )
