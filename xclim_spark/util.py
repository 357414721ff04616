"""Small shared utilities."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def repartition_for_apply(df: DataFrame, cells: Sequence[str]) -> DataFrame:
    """Explicitly repartition by the group key before a grouped
    ``applyInPandas``.

    AQE sizes shuffle partitions by BYTES: the narrow aggregate feeding a
    pandas stage looks tiny, gets coalesced to one partition, and the
    Python compute — the actual cost — runs serially.  A user-specified
    repartition is exempt from AQE coalescing, so the pandas stage keeps
    cluster-width parallelism (observed 7x on the SPI fit at sf0.1).
    """
    if not cells:
        return df
    n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, *cells)
