"""Hydrology kernels (reference ``src/xclim/indices/_hydrology.py``).

All pure window/aggregate plans except Sen's slope / Mann-Kendall
(pairwise-median + sign test over period means, per-cell
``applyInPandas`` on the dim-sized period table).
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
           "high_flow_frequency", "low_flow_frequency", "sen_slope",
           "sen_slope_ratio"]


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


def _mk_kernel(x: np.ndarray) -> tuple[float, float]:
    """Mann-Kendall original test + Theil-Sen slope over the index, the
    pymannkendall ``original_test`` pair the reference wraps
    (_hydrology.py:925-929): S from pairwise signs, tie-corrected
    variance, continuity-corrected z, two-sided normal p; the slope is
    the median of ``(x_j - x_i)/(j - i)``.

    Missing values are dropped first with COMPRESSED indexing —
    pymannkendall's default ``missing_values_analysis('skip')``
    removes NaNs and re-indexes the remaining points consecutively, so
    one all-null period must not NaN out the whole (cell, season)."""
    import math

    x = x[~np.isnan(x)]
    n = len(x)
    if n < 2:
        return float("nan"), float("nan")
    idx = np.arange(n)
    iu = np.triu_indices(n, 1)
    d = (x[None, :] - x[:, None])[iu]
    s = float(np.sign(d).sum())
    _, t = np.unique(x, return_counts=True)
    var_s = (n * (n - 1) * (2 * n + 5)
             - float(np.sum(t * (t - 1) * (2 * t + 5)))) / 18.0
    if var_s > 0 and s != 0:
        z = (s - 1.0 if s > 0 else s + 1.0) / math.sqrt(var_s)
    else:
        z = 0.0
    p = math.erfc(abs(z) / math.sqrt(2.0))
    slope = float(np.median(d / (idx[None, :] - idx[:, None])[iu]))
    return slope, p


def _sen_slope_multi(
    df: DataFrame, variables: Sequence[str], *, freq: str = "YS",
    time: str = "time", cells: Sequence[str] = (),
    aliases: Sequence[str] = (), p_aliases: Sequence[str] = (),
) -> DataFrame:
    """Shared kernel behind :func:`sen_slope` / :func:`sen_slope_ratio`:
    one daily->period aggregation carrying every variable, then one
    pandas task per cell running the Mann-Kendall pair per season."""
    periods = (
        df.groupBy(*cells, period_start(time, freq).alias("_p"))
        .agg(*[F.avg(v).alias(f"_v{i}") for i, v in enumerate(variables)])
        .withColumn("_season", F.month("_p"))
    )
    fields = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    out_cols = [c for c in cells] + ["season"]
    schema = ", ".join(
        [f"{c} {fields[c]}" for c in cells] + ["season INT"]
        + [x for a, pa in zip(aliases, p_aliases)
           for x in (f"{a} DOUBLE", f"{pa} DOUBLE")]
    )

    def _calc(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for season, gg in pdf.groupby("_season"):
            gg = gg.sort_values("_p")
            row = {c: gg[c].iloc[0] for c in cells}
            row["season"] = int(season)
            for i, (a, pa) in enumerate(zip(aliases, p_aliases)):
                slope, p = _mk_kernel(gg[f"_v{i}"].to_numpy(dtype=float))
                row[a] = slope
                row[pa] = p
            rows.append(row)
        cols = out_cols + [x for a, pa in zip(aliases, p_aliases)
                           for x in (a, pa)]
        return pd.DataFrame(rows, columns=cols)

    return repartition_for_apply(periods, cells).groupBy(*cells) \
        .applyInPandas(_calc, schema=schema)


def sen_slope(
    df: DataFrame, var: str, *, freq: str = "YS", time: str = "time",
    cells: Sequence[str] = (), alias: str = "sen_slope",
    p_alias: str = "p_value",
) -> DataFrame:
    """Theil-Sen slope + Mann-Kendall p-value per cell and season
    (reference _hydrology.py:893-946): the series is averaged to
    ``freq`` periods, split into one yearly sequence per season anchor
    (the reference's ``split_time_to_season_year``; for YS-like
    frequencies there is a single season), and each sequence gets the
    pymannkendall ``original_test`` pair — the median pairwise slope
    over the period INDEX (units per period step) and the two-sided
    tie-corrected normal p-value.  Output: one row per (cells, season)
    with ``season`` the period anchor month."""
    return _sen_slope_multi(df, [var], freq=freq, time=time, cells=cells,
                            aliases=[alias], p_aliases=[p_alias])


def sen_slope_ratio(
    df: DataFrame, q: str, qsim: str, *, freq: str = "YS",
    time: str = "time", cells: Sequence[str] = (),
) -> DataFrame:
    """Observed-over-simulated Sen-slope robustness ratio (reference
    _hydrology.py:949-994): both series ride ONE period aggregation and
    one pandas pass, then ``ratio = sen_slope / sen_slope_sim``
    (acceptable within 0.5-2 per the reference's Sauquet-2025 note)."""
    out = _sen_slope_multi(
        df, [q, qsim], freq=freq, time=time, cells=cells,
        aliases=["sen_slope", "sen_slope_sim"],
        p_aliases=["p_value", "p_value_sim"])
    return out.withColumn(
        "ratio", F.col("sen_slope") / F.col("sen_slope_sim"))
