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

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["streaming_dedup_keys", "streaming_near_dedup"]


_DELAY_UNITS_US = {
    "second": 1_000_000, "seconds": 1_000_000,
    "minute": 60_000_000, "minutes": 60_000_000,
    "hour": 3_600_000_000, "hours": 3_600_000_000,
    "day": 86_400_000_000, "days": 86_400_000_000,
}


def _delay_us(delay: str) -> int:
    """Parse Spark's '<N> <unit>' watermark-delay strings to micros."""
    parts = delay.strip().split()
    if len(parts) != 2 or parts[1].lower() not in _DELAY_UNITS_US:
        raise ValueError(
            f"streaming_near_dedup: cannot parse delay {delay!r} "
            "(expected '<N> seconds|minutes|hours|days')")
    return int(parts[0]) * _DELAY_UNITS_US[parts[1].lower()]


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


def streaming_near_dedup(
    sdf: DataFrame, *,
    text_col: str = "text", id_col: str = "doc_id", time: str = "ts",
    delay: str = "1 day", threshold: float = 0.6,
    num_perm: int = 32, bands: int = 16, shingle_n: int = 3,
    seed: int = 7, max_bucket_size: int = 8192,
) -> DataFrame:
    """Streaming MinHash-banded NEAR-duplicate suppression — the
    bounded-state streaming twin of the batch
    :func:`~xclim_spark.llm.dedup.near_duplicates` pipeline.

    Each arriving document's word-``shingle_n``-gram hash set and
    MinHash band keys are computed map-side (the same
    ``word_shingles`` -> ``shingle_hashes`` -> ``minhash_signature`` ->
    ``lsh_band_buckets`` expressions as the batch path, so the two
    agree candidate-for-candidate).  State lives per (band, bucket):
    the (id, event-time, shingle hashes) of every in-window document
    that hashed there — the standard LSH memory layout (each document
    resides in ``bands`` buckets).  An arriving document is compared by
    EXACT Jaccard against its bucket's live entries only (never
    all-pairs), exactly like the batch verifier, so band collisions
    below ``threshold`` are rejected and the output is
    recall-limited only by the banding probability
    ``1-(1-J^rows)^bands``.

    **Bounded state**: an entry is evicted once the event-time
    watermark passes its event time + ``delay`` (the
    ``dropDuplicatesWithinWatermark`` contract), and a bucket idle past
    its newest entry + ``delay`` drops entirely via event-time timeout
    — state is O(arrival rate x window), not O(corpus).  A document
    recurring after eviction is emitted as kept again — the documented
    trade-off that buys the bound.  A bucket accumulating more than
    ``max_bucket_size`` live entries raises naming the bucket (a
    degenerate band key — e.g. a constant boilerplate corpus — would
    otherwise become a silent O(m^2) hot task; widen ``bands``/``rows``
    or shorten ``delay``).

    Ordering: rows inside a micro-batch are processed in
    (event-time, id) order, so the surviving exemplar of a same-batch
    duplicate group is the (ts, id)-minimum — deterministic, unlike
    raw ``dropDuplicatesWithinWatermark``.

    Returns one APPEND row per (document, band):
    ``id, time, band, dup_of`` — ``dup_of`` null where that band saw no
    qualifying earlier neighbour.  Fold to per-document decisions
    downstream (e.g. in a ``foreachBatch`` sink: a document's rows all
    live in its own micro-batch, so ``keep = every dup_of null``,
    ``dup_of = min(dup_of)`` per batch is exact).  Documents with fewer
    than ``shingle_n`` words carry no shingles and pass through as kept
    (``band = -1``).
    """
    from ..llm.dedup import (
        lsh_band_buckets,
        minhash_signature,
        shingle_hashes,
        word_shingles,
    )

    if num_perm % bands:
        raise ValueError(
            f"streaming_near_dedup: num_perm={num_perm} not divisible "
            f"by bands={bands}")
    rows = num_perm // bands
    d_us = _delay_us(delay)

    wm = sdf.withWatermark(time, delay)
    sh = shingle_hashes(word_shingles(F.col(text_col), shingle_n))
    base = wm.select(
        F.col(id_col).alias("_id"), F.col(time).alias("_ts"),
        F.array_sort(sh).alias("_sh"))
    empty = (base.filter(F.size("_sh") == 0)
             .select(F.col("_id").alias(id_col),
                     F.col("_ts").alias(time),
                     F.lit(-1).alias("band"),
                     F.lit(None).cast("long").alias("dup_of")))
    banded = (base.filter(F.size("_sh") > 0)
              .withColumn("_bb", F.explode(lsh_band_buckets(
                  minhash_signature(F.col("_sh"), num_perm, seed),
                  bands, rows)))
              .select("_id", "_ts", "_sh",
                      F.col("_bb.band").alias("band"),
                      F.col("_bb.bucket").alias("bucket")))

    out_schema = (f"{id_col} LONG, {time} TIMESTAMP, band INT, "
                  "dup_of LONG")
    # per-entry shingle arrays ride flattened (off[i]:off[i+1]) — the
    # state store schema stays flat arrays, no nested marshalling
    state_schema = ("ids ARRAY<LONG>, ts_us ARRAY<LONG>, "
                    "off ARRAY<INT>, hs ARRAY<LONG>")

    def _fn(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            # every entry is older than (newest + delay) < watermark
            state.remove()
            return
        batch = [p for p in pdfs if len(p)]
        if not batch:
            return
        pdf = pd.concat(batch).sort_values(["_ts", "_id"])
        wm_us = state.getCurrentWatermarkMs() * 1000

        entries: list[tuple[int, int, np.ndarray]] = []
        if state.exists:
            s_ids, s_ts, s_off, s_hs = state.get
            s_hs = np.asarray(s_hs, dtype=np.int64)
            for i in range(len(s_ids)):
                if int(s_ts[i]) + d_us >= wm_us:  # still in window
                    entries.append((int(s_ids[i]), int(s_ts[i]),
                                    s_hs[s_off[i]:s_off[i + 1]]))

        t_us = pd.DatetimeIndex(pdf["_ts"]).asi8 // 1000
        out_id, out_us, out_dup = [], [], []
        for (rid, rhs), rus in zip(zip(pdf["_id"], pdf["_sh"]), t_us):
            rhs = np.unique(np.asarray(rhs, dtype=np.int64))
            best = None
            for eid, _eus, ehs in entries:
                if eid == rid:
                    continue
                inter = np.intersect1d(
                    rhs, ehs, assume_unique=True).size
                if not inter:
                    continue
                j = inter / (rhs.size + ehs.size - inter)
                if j >= threshold and (best is None or eid < best):
                    best = eid
            out_id.append(int(rid))
            out_us.append(int(rus))
            out_dup.append(best)
            entries.append((int(rid), int(rus), rhs))
        if len(entries) > max_bucket_size:
            raise ValueError(
                f"streaming_near_dedup: bucket {tuple(key)} holds "
                f"{len(entries)} in-window entries "
                f"(max_bucket_size={max_bucket_size}) — a degenerate "
                "band key; widen bands/rows or shorten the delay")

        off = [0]
        for _eid, _eus, ehs in entries:
            off.append(off[-1] + ehs.size)
        state.update((
            [e[0] for e in entries],
            [e[1] for e in entries],
            off,
            np.concatenate([e[2] for e in entries]).tolist(),
        ))
        newest_ms = max(e[1] for e in entries) // 1000
        state.setTimeoutTimestamp(newest_ms + d_us // 1000 + 1)

        yield pd.DataFrame({
            id_col: np.asarray(out_id, dtype=np.int64),
            time: pd.to_datetime(np.asarray(out_us, dtype=np.int64),
                                 unit="us"),
            "band": np.full(len(out_id), int(pdf["band"].iloc[0]),
                            dtype=np.int32),
            "dup_of": pd.array(out_dup, dtype="Int64"),
        })

    dec = banded.groupBy("band", "bucket").applyInPandasWithState(
        _fn, out_schema, state_schema, "append",
        GroupStateTimeout.EventTimeTimeout)
    return dec.unionByName(empty)
