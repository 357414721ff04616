"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from xclim_spark.queries import build_oracles, build_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: monthly mean of the daily
    series (tg_mean shape) — exercises the full resample-reduce skeleton."""
    from xclim_spark.queries import tg_mean_ms

    return tg_mean_ms(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return build_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twins for each query (omitted => rows-only check)."""
    return build_oracles()
