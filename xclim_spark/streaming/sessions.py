"""Streaming gap-based sessionization via native session windows.

The batch engine sessionizes with the run-id window pattern
(queries.user_sessions; the same sessionization the climate spells
use).  On a live feed the identical semantics come from Structured
Streaming's ``F.session_window``: per key, events closer than ``gap``
merge into one session whose window is ``[first event, last event +
gap)``; the streaming engine keeps one tiny (start, end, partial
aggregates) state per open session, merges sessions that bridge
micro-batches, and emits a session exactly once when the watermark
passes its end — no custom state code at all.

Scale shape: state is O(open sessions), the shuffle per micro-batch
carries only that batch's events hashed by key, and late data beyond
the watermark is dropped deterministically — the standard production
sessionization topology.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["streaming_sessionize"]


def streaming_sessionize(
    sdf: DataFrame,
    *,
    keys: Sequence[str],
    time: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
    value: str | None = None,
) -> DataFrame:
    """Sessionize a stream: one output row per closed session with
    ``keys..., sess_start, sess_end, n_events`` (+ ``total_value`` when
    ``value`` is given).  Append-mode compatible (sessions emit when
    the watermark passes their end)."""
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value is not None:
        aggs.append(F.sum(value).alias("total_value"))
    g = (
        sdf.withWatermark(time, watermark)
        .groupBy(*keys, F.session_window(time, gap).alias("sess"))
        .agg(*aggs)
    )
    return g.select(
        *keys,
        F.col("sess.start").alias("sess_start"),
        F.col("sess.end").alias("sess_end"),
        *(c for c in ("n_events", "total_value") if c in g.columns),
    )
