"""Dataset read/write API (reference ``src/xclim/cli.py:55-73,484-497``).

Layout convention for the 100 TB target: long-format Parquet partitioned
by ``year`` (temporal predicate pushdown -> partition pruning for
``select_time``/period filters) and optionally bucketed by the cell key
so repeated per-cell window operators shuffle zero bytes after the first
exchange.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["write_dataset", "read_dataset", "write_bucketed_table"]


def write_dataset(
    df: DataFrame,
    path: str,
    *,
    time: str = "time",
    partition_by_year: bool = True,
    extra_partitions: Sequence[str] = (),
    mode: str = "overwrite",
) -> None:
    """Write a long-format dataset as Parquet, partitioned by year (and
    any extra key columns) so later scans prune partitions from
    time-range predicates."""
    cols = list(extra_partitions)
    if partition_by_year:
        df = df.withColumn("year", F.year(time))
        cols = ["year", *cols]
    w = df.write.mode(mode)
    if cols:
        w = w.partitionBy(*cols)
    w.parquet(path)


def read_dataset(
    spark: SparkSession,
    path: str,
    *,
    columns: Sequence[str] | None = None,
    years: tuple[int, int] | None = None,
) -> DataFrame:
    """Read a dataset written by :func:`write_dataset`; ``years`` bounds
    compile to a partition-pruning filter, ``columns`` prunes the scan
    schema."""
    df = spark.read.parquet(path)
    if years is not None:
        df = df.filter(
            (F.col("year") >= years[0]) & (F.col("year") <= years[1])
        )
    if columns is not None:
        keep = [c for c in df.columns if c in set(columns) | {"year"}]
        df = df.select(*keep)
    return df


def write_bucketed_table(
    df: DataFrame,
    table: str,
    *,
    cells: Sequence[str] = ("cell",),
    time: str = "time",
    buckets: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Save as a managed table bucketed by the cell key and sorted by
    (cells, time).

    This is the zero-shuffle layout for this engine's dominant access
    pattern: every run-length / spell / rolling / resample operator
    windows or groups on the cell key, and a bucketed+sorted table feeds
    them with NO Exchange in the physical plan (verified in
    tests/test_io.py) — at 100 TB that deletes the per-query terabyte
    shuffle entirely; co-bucketed tables additionally join shuffle-free.
    ``buckets`` defaults to the session's shuffle partitions so the
    bucket width matches downstream parallelism.
    """
    if buckets is None:
        buckets = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
        )
    (
        df.write.mode(mode)
        .bucketBy(buckets, *cells)
        .sortBy(*cells, time)
        .saveAsTable(table)
    )
