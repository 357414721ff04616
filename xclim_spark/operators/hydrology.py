"""Hydrology kernels (reference ``src/xclim/indices/_hydrology.py``).

All pure window/aggregate plans except Sen's slope (pairwise-median,
per-cell ``applyInPandas``).
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..calendar import period_start
from ..util import repartition_for_apply

__all__ = ["base_flow_index", "rb_flashiness_index", "flow_index",
           "high_flow_frequency", "low_flow_frequency", "sen_slope"]


def base_flow_index(
    df: DataFrame, q: str, freq: str = "YS", *,
    time: str = "time", cells: Sequence[str] = (),
    alias: str = "base_flow_index",
) -> DataFrame:
    """min(centered 7-day mean) / mean flow per period (reference
    _hydrology.py:50-93).  One window + one aggregate computing both the
    numerator and denominator in the same groupBy — a single shuffle."""
    w = (Window.partitionBy(*cells).orderBy(time).rowsBetween(-3, 3))
    cma = F.when(F.count(q).over(w) >= 7, F.avg(q).over(w))
    d = df.withColumn("_cma7", cma)
    return (
        d.withColumn("period", period_start(time, freq))
        .groupBy(*cells, "period")
        .agg((F.min("_cma7") / F.avg(q)).alias(alias))
    )


def rb_flashiness_index(
    df: DataFrame, q: str, freq: str = "YS", *,
    time: str = "time", cells: Sequence[str] = (),
    alias: str = "rbi",
) -> DataFrame:
    """Richards-Baker flashiness: sum |day-to-day change| / total flow
    (reference _hydrology.py:94-135)."""
    w = Window.partitionBy(*cells).orderBy(time)
    diff = F.abs(F.col(q) - F.lag(q).over(w))
    d = df.withColumn("_ad", diff)
    return (
        d.withColumn("period", period_start(time, freq))
        .groupBy(*cells, "period")
        .agg((F.sum("_ad") / F.sum(q)).alias(alias))
    )


def flow_index(
    df: DataFrame, q: str, p: float = 0.95, *,
    cells: Sequence[str] = (), alias: str = "flow_index",
) -> DataFrame:
    """Qp/Q50: high-flow quantile over median (reference
    _hydrology.py:577-606)."""
    return df.groupBy(*cells).agg(
        (F.expr(f"percentile({q}, {p})") /
         F.expr(f"percentile({q}, 0.5)")).alias(alias)
    )


def high_flow_frequency(
    df: DataFrame, q: str, threshold_factor: float = 9.0,
    freq: str = "YS", *, time: str = "time", cells: Sequence[str] = (),
    alias: str = "high_flow_days",
) -> DataFrame:
    """Days with flow > factor x median, per period (reference
    _hydrology.py:607-639).  The per-cell median is a one-row-per-cell
    aggregate joined back (AQE broadcasts it)."""
    med = df.groupBy(*cells).agg(
        F.expr(f"percentile({q}, 0.5)").alias("_med"))
    j = df.join(med, on=list(cells))
    return (
        j.withColumn("period", period_start(time, freq))
        .groupBy(*cells, "period")
        .agg(F.sum((F.col(q) > threshold_factor * F.col("_med"))
                   .cast("long")).alias(alias))
    )


def low_flow_frequency(
    df: DataFrame, q: str, threshold_factor: float = 0.2,
    freq: str = "YS", *, time: str = "time", cells: Sequence[str] = (),
    alias: str = "low_flow_days",
) -> DataFrame:
    """Days with flow < factor x mean, per period (reference
    _hydrology.py:640-672)."""
    mean = df.groupBy(*cells).agg(F.avg(q).alias("_mean"))
    j = df.join(mean, on=list(cells))
    return (
        j.withColumn("period", period_start(time, freq))
        .groupBy(*cells, "period")
        .agg(F.sum((F.col(q) < threshold_factor * F.col("_mean"))
                   .cast("long")).alias(alias))
    )


def sen_slope(
    df: DataFrame, var: str, *, time: str = "time",
    cells: Sequence[str] = (), alias: str = "sen_slope",
) -> DataFrame:
    """Theil-Sen slope per cell [units/day] (reference
    _hydrology.py:894-940): median of all pairwise slopes — O(n^2) per
    cell, so one pandas task per cell (the same layout as the stats
    fits)."""
    fields = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    schema = ", ".join([f"{c} {fields[c]}" for c in cells]
                       + [f"{alias} DOUBLE"])

    def _sen(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(time)
        y = pdf[var].to_numpy(dtype=float)
        t = pd.to_datetime(pdf[time]).map(pd.Timestamp.toordinal) \
            .to_numpy(dtype=float)
        n = len(y)
        slopes = []
        for i in range(n - 1):
            dt_ = t[i + 1:] - t[i]
            ok = dt_ != 0
            slopes.append((y[i + 1:][ok] - y[i]) / dt_[ok])
        s = np.concatenate(slopes) if slopes else np.array([np.nan])
        out = {c: [pdf[c].iloc[0]] for c in cells}
        out[alias] = [float(np.median(s))]
        return pd.DataFrame(out)

    return repartition_for_apply(df, cells).groupBy(*cells) \
        .applyInPandas(_sen, schema=schema)
