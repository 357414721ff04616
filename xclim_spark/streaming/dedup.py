"""Streaming deduplication with BOUNDED state.

The complete-mode content-hash aggregation (gate ``stream_dedup_exact``)
keeps one state row per distinct key forever — correct for a finite
replay, unbounded for an always-on ingest service.  The production form
scopes dedup state to the event-time watermark: a key's state is
EVICTED once the watermark passes its event time plus the configured
delay, so state size is bounded by (arrival rate x delay window)
instead of corpus cardinality.  Spark ships this as
``dropDuplicatesWithinWatermark`` (SPARK-42931); this module wraps it
as the engine's operator so the semantics — including the re-emit
behaviour after eviction — are pinned by tests.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame

__all__ = ["streaming_dedup_keys"]


def streaming_dedup_keys(
    sdf: DataFrame, keys: Sequence[str], *,
    time: str = "ts", delay: str = "1 day",
) -> DataFrame:
    """Watermark-scoped streaming exact dedup: emit the first row seen
    per ``keys`` tuple; duplicates arriving while the key's state lives
    (watermark has not passed its event time + ``delay``) are dropped;
    a key RECURRING AFTER EVICTION is emitted again — the documented
    trade-off that buys bounded state.

    Within one micro-batch the surviving row of a duplicate group is
    engine-chosen; pipelines that need deterministic payloads should
    project the key columns (or pre-aggregate) downstream.
    """
    return (sdf.withWatermark(time, delay)
            .dropDuplicatesWithinWatermark(list(keys)))
