"""Percentile climatologies: percentile_doy + resample_doy lookup.

Re-expresses the reference's day-of-year percentile machinery
(``percentile_doy``, ``src/xclim/core/calendar.py:396-494``; ``resample_doy``,
``calendar.py:763-792``; Hyndman-Fan quantiles, ``src/xclim/core/utils.py:279-558``)
in Spark:

* the climatology is a **small dimension table** (<=366 rows per cell per
  percentile) produced by one groupBy over an exploded doy-window;
* applying it back to the fact table is a **broadcast equi-join** on
  ``dayofyear`` — never a shuffle join (the dim side is tiny by
  construction, we force ``F.broadcast``).

The doy window (each day's sample pool includes +-window//2 neighbouring
days across all years) is built by exploding each row into the (window)
doy-buckets it contributes to — a map-side explode followed by one
aggregation, instead of a self-join.  At 100 TB this multiplies the
aggregation input by `window` but keeps a single shuffle whose key space is
(cell x 366), which partial aggregation collapses early.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["percentile_doy", "resample_doy", "hyndman_fan_quantile_sql"]


def percentile_doy(
    df: DataFrame,
    var: str,
    per: float | Sequence[float],
    *,
    window: int = 5,
    time: str = "time",
    cells: Sequence[str] = (),
    alias: str = "per",
    exact: bool = True,
) -> DataFrame:
    """Climatological day-of-year percentile (reference calendar.py:396-494).

    Returns a dim table ``cells... , dayofyear, <alias>`` (one column per
    requested percentile when a list is given: ``<alias>_p90`` etc.).

    ``exact=True`` uses Spark's exact ``percentile`` (linear interpolation,
    Hyndman-Fan alpha=beta=1, i.e. numpy/DuckDB 'linear'); the reference
    defaults to alpha=beta=1/3 ('median_unbiased') — parity for that is
    provided driver-side in :mod:`xclim_spark.stats.quantile` and can be
    swapped in via a pandas UDF where bit-parity matters.  ``exact=False``
    uses ``approx_percentile`` for the cheap path at extreme scale.
    """
    pers = [per] if isinstance(per, (int, float)) else list(per)
    half = window // 2
    # Each row contributes to doy buckets [doy-half, doy+half], wrapping 1..365
    # (the reference maps all calendars onto 365 buckets and interpolates 366).
    d = F.dayofyear(time)
    offsets = F.sequence(F.lit(-half), F.lit(half))
    df = df.withColumn("_doy0", d).withColumn("_off", F.explode(offsets))
    bucket = ((F.col("_doy0") - 1 + F.col("_off") + 365) % 365) + 1
    df = df.withColumn("dayofyear", bucket)
    fn = "percentile" if exact else "approx_percentile"
    aggs = []
    for p in pers:
        name = alias if len(pers) == 1 else f"{alias}_p{int(round(p * 100))}"
        aggs.append(F.expr(f"{fn}({var}, {p})").alias(name))
    return df.groupBy(*cells, "dayofyear").agg(*aggs)


def resample_doy(
    df: DataFrame,
    per_df: DataFrame,
    *,
    time: str = "time",
    cells: Sequence[str] = (),
    on_cells: bool = True,
) -> DataFrame:
    """Broadcast-join the doy-indexed climatology onto the fact table
    (reference calendar.py:763-792).

    The dim table is <=366 x n_cells rows; we force a broadcast so the plan
    is a BroadcastHashJoin with no shuffle of the fact side — the only plan
    that survives 100 TB facts.
    """
    keys = ([*cells] if on_cells else []) + ["dayofyear"]
    fact = df.withColumn("dayofyear", F.dayofyear(time))
    return fact.join(F.broadcast(per_df), on=keys, how="left")


def hyndman_fan_quantile_sql(var: str, p: float) -> str:
    """DuckDB oracle twin for the exact linear-interpolation percentile:
    ``quantile_cont`` is Hyndman-Fan type 7 (alpha=beta=1), matching Spark's
    ``percentile``."""
    return f"quantile_cont({var}, {p})"
