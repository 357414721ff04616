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
    num_blocks: int | None = None,
) -> DataFrame:
    """Streaming MinHash-banded NEAR-duplicate suppression — the
    bounded-state streaming twin of the batch
    :func:`~xclim_spark.llm.dedup.near_duplicates` pipeline.

    Each arriving document's word-``shingle_n``-gram hash set, MinHash
    signature and band keys are computed map-side in ONE Arrow
    ``mapInPandas`` stage (numpy: unique crc32 gram hashes, the same
    ``_perm_coeffs``-seeded universal-hash permutations as the batch
    path, polynomial band fold) — the nested-HOF
    ``minhash_signature`` expression is interpreted per element and
    measured minutes-slow at the 5k-doc rehearsal, the same defect
    class the batch ``near_duplicates`` avoids with explode+codegen
    aggregates.  State is keyed by a deterministic
    HASH BLOCK of (band, bucket) keys (``num_blocks``, default 2x
    parallelism — the same blocked layout as
    :func:`~xclim_spark.streaming.spells.streaming_spell_events`):
    LSH buckets are mostly singletons, so per-bucket state groups
    would pay one Python invocation + state-store access per BUCKET
    per micro-batch — measured ~3M group calls per batch at the
    50k-doc sf1 rehearsal, tens of minutes of pure overhead; blocking
    amortizes it to ``num_blocks`` calls.  Each block's state carries
    parallel entry arrays ((band, bucket), id, event-time, flattened
    shingle hashes) sorted by composite bucket key for
    ``searchsorted`` lookup.  An arriving document is compared by
    EXACT Jaccard against its bucket's live entries only (never
    all-pairs), exactly like the batch verifier, so band collisions
    below ``threshold`` are rejected and the output is
    recall-limited only by the banding probability
    ``1-(1-J^rows)^bands``.

    **Bounded state**: an entry is evicted once the event-time
    watermark passes its event time + ``delay`` (the
    ``dropDuplicatesWithinWatermark`` contract), and a block idle past
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
    from ..llm.dedup import _MERSENNE31, _perm_coeffs, _ws_tokens

    if num_perm % bands:
        raise ValueError(
            f"streaming_near_dedup: num_perm={num_perm} not divisible "
            f"by bands={bands}")
    rows = num_perm // bands
    d_us = _delay_us(delay)
    if num_blocks is None:
        # HALF the parallelism, not 2x: a doc's shingle set is stored
        # once per touched block, so duplication (and the per-batch
        # state blob rewrite that dominates wall-clock) grows ~
        # min(bands, num_blocks).  The r13 sf1 sweep (PLANS.md):
        # blocks 8/16/32/64/128 -> 29.2/24.0/33.6/41.3/38.0 s with
        # peak state 252/409/655/915/1116 MB — rewrite volume beats
        # task parallelism until blocks drop below ~cores/4
        num_blocks = max(
            sdf.sparkSession.sparkContext.defaultParallelism // 2, 2)

    # Arrow hands _fn tz-NAIVE timestamps rendered in the SESSION
    # timezone, while getCurrentWatermarkMs()/setTimeoutTimestamp()
    # speak true UTC epoch millis — with a non-UTC session the naive
    # asi8 epoch is offset by the zone, evicting state early (west of
    # UTC) or holding it past the documented delay (east).  Capture the
    # session zone here (driver side) and localize in the worker so the
    # two clocks agree; the output path converts back so emitted
    # timestamps still round-trip exactly.
    sess_tz = sdf.sparkSession.conf.get(
        "spark.sql.session.timeZone") or "UTC"

    coeffs = _perm_coeffs(num_perm, seed)
    A = np.array([c[0] for c in coeffs], dtype=np.int64)
    B = np.array([c[1] for c in coeffs], dtype=np.int64)
    P = _MERSENNE31
    band_base = np.arange(bands, dtype=np.int64) << 44
    mult = np.uint64(0x9E3779B97F4A7C15)  # splitmix64 block spreader

    def _prep(it):
        import zlib

        for pdf in it:
            ids, tss, shs, cks, blks = [], [], [], [], []
            for i, ts, t in zip(pdf[id_col], pdf[time],
                                pdf[text_col]):
                w = _ws_tokens(t) if t is not None else []
                if len(w) < shingle_n:
                    # shingle-less docs (null text / < n words) ride
                    # the SAME stateful path under the sentinel key
                    # [-1], spread across blocks by id — a separate
                    # pass-through branch would scan the source twice
                    # and union two streams
                    ids.append(i)
                    tss.append(ts)
                    shs.append(np.empty(0, dtype=np.int32))
                    cks.append(np.full(1, -1, dtype=np.int64))
                    blks.append(int(i) % num_blocks)
                    continue
                grams = {" ".join(w[j:j + shingle_n])
                         for j in range(len(w) - shingle_n + 1)}
                u = np.unique(np.fromiter(
                    (zlib.crc32(g.encode()) for g in grams),
                    dtype=np.int64) % P)
                # products < 2^62: u, A both < 2^31
                sig = ((u[:, None] * A[None, :] + B[None, :]) % P) \
                    .min(axis=0)
                bk = sig.reshape(bands, rows)
                h = np.zeros(bands, dtype=np.int64)
                for r in range(rows):
                    h = (h * 1_000_003 + bk[:, r]) % (1 << 44)
                ck = band_base + h
                blk = ((ck.astype(np.uint64) * mult)
                       >> np.uint64(33)).astype(np.int64) % num_blocks
                u32 = u.astype(np.int32)  # < 2^31: exact in int32
                # ONE row per (doc, touched block): the hash set ships
                # once per block, not once per band.  One argsort per
                # doc, not one boolean scan per touched block.
                order = np.argsort(blk, kind="stable")
                sb, sc = blk[order], ck[order]
                cuts = np.flatnonzero(
                    np.concatenate(([True], sb[1:] != sb[:-1])))
                for s, e in zip(cuts, np.append(cuts[1:], len(sb))):
                    ids.append(i)
                    tss.append(ts)
                    shs.append(u32)
                    cks.append(sc[s:e])
                    blks.append(int(sb[s]))
            yield pd.DataFrame(
                {"_id": ids, "_ts": tss, "_sh": shs, "_cks": cks,
                 "_blk": blks})

    # exactly ONE watermark node, AFTER the Arrow prep (the tag does
    # not survive mapInPandas, and applyInPandasWithState's event-time
    # timeout requires it on ITS input).  The repartition spreads the
    # compute-dense prep across cores — a one-file micro-batch (the
    # replay shape) is otherwise a single task doing all the hashing.
    banded = (sdf.select(id_col, time, text_col)
              .repartition(
                  sdf.sparkSession.sparkContext.defaultParallelism)
              .mapInPandas(_prep,
                           "_id long, _ts timestamp, "
                           "_sh array<int>, _cks array<long>, "
                           "_blk int")
              .withWatermark("_ts", delay))

    out_schema = (f"{id_col} LONG, {time} TIMESTAMP, band INT, "
                  "dup_of LONG")
    # one state group per BLOCK, two tables PACKED AS BINARY BLOBS
    # (little-endian numpy buffers — marshalling millions of state
    # values as Python ints measured seconds per batch at the sf1
    # rehearsal; six bytes objects are ~free): a DOC table (id,
    # event-time, offsets + flattened int32 hash sets — each doc's set
    # stored ONCE per block, d_id-sorted) and an ENTRY table
    # (composite bucket key -> doc id, e_ck-sorted for searchsorted)
    state_schema = ("d_id BINARY, d_ts BINARY, d_off BINARY, "
                    "d_hs BINARY, e_ck BINARY, e_doc BINARY, nb INT")

    def _nb_guard(snb):
        # same contract as streaming_spell_events/streaming_cffwis:
        # state is keyed by blk = hash(ck) % num_blocks, so a restart
        # under a different block count would probe blocks that do not
        # hold the carried entries and silently re-admit in-window
        # duplicates — raise instead
        if int(snb) != int(num_blocks):
            raise ValueError(
                "streaming_near_dedup: num_blocks changed across a "
                f"checkpoint restart (state written with {int(snb)}, "
                f"query configured with {int(num_blocks)}) — band "
                "buckets would silently remap to blocks that do not "
                "carry their state; keep num_blocks fixed for the "
                "life of a checkpoint")

    def _fn(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            # every doc is older than (newest + delay) < watermark;
            # still refuse to act on a mis-keyed store
            _nb_guard(state.get[6])
            state.remove()
            return
        batch = [p for p in pdfs if len(p)]
        if not batch:
            return
        pdf = pd.concat(batch).sort_values(["_ts", "_id"])
        wm_us = state.getCurrentWatermarkMs() * 1000

        # carried doc + entry tables, pruned behind the watermark
        if state.exists:
            bufs = state.get
            _nb_guard(bufs[6])
            d_id = np.frombuffer(bufs[0], dtype="<i8")
            d_ts = np.frombuffer(bufs[1], dtype="<i8")
            d_off = np.frombuffer(bufs[2], dtype="<i8")
            d_hs = np.frombuffer(bufs[3], dtype="<i4")
            e_ck = np.frombuffer(bufs[4], dtype="<i8")
            e_doc = np.frombuffer(bufs[5], dtype="<i8")
            live = d_ts + d_us >= wm_us
            if not live.all():
                sets = [d_hs[d_off[i]:d_off[i + 1]]
                        for i in np.flatnonzero(live)]
                d_id, d_ts = d_id[live], d_ts[live]
                emask = np.isin(e_doc, d_id)
                e_ck, e_doc = e_ck[emask], e_doc[emask]
            else:
                sets = [d_hs[d_off[i]:d_off[i + 1]]
                        for i in range(len(d_id))]
        else:
            d_id = d_ts = e_ck = e_doc = np.empty(0, dtype=np.int64)
            sets = []

        b_ids = pdf["_id"].to_numpy(dtype=np.int64)
        # true UTC epoch micros (asi8 of a tz-aware index is UTC);
        # DST-ambiguous wall times raise rather than guess
        b_idx = pd.DatetimeIndex(pdf["_ts"])
        if b_idx.tz is None:
            b_idx = b_idx.tz_localize(sess_tz)
        b_us = b_idx.asi8 // 1000
        b_cks = list(pdf["_cks"])
        # _prep already emits sorted-unique int32 hash sets
        b_hs = [np.asarray(h, dtype=np.int32) for h in pdf["_sh"]]

        def _verify(rhs, eid):
            # exact Jaccard of two sorted-unique int32 sets; counted
            # with one searchsorted (np.intersect1d re-sorts — 5-10x
            # slower, and it ran 36M times per replay before the
            # per-row memo below)
            ehs = batch_sets.get(eid)
            if ehs is None:
                ehs = sets[int(np.searchsorted(d_id, eid))]
            if rhs.size > ehs.size:
                rhs, ehs = ehs, rhs
            pos = np.searchsorted(ehs, rhs)
            pos[pos == ehs.size] = 0
            inter = int((ehs[pos] == rhs).sum())
            return (inter > 0
                    and inter / (rhs.size + ehs.size - inter)
                    >= threshold)

        batch_sets: dict[int, np.ndarray] = {}
        batch_buckets: dict[int, list[int]] = {}
        out_id, out_us, out_band, out_dup = [], [], [], []
        sent = np.fromiter((int(c[0]) == -1 for c in b_cks),
                           dtype=bool, count=len(b_cks))
        for r in range(len(b_ids)):
            rid, rus, rhs = int(b_ids[r]), int(b_us[r]), b_hs[r]
            if sent[r]:
                # shingle-less pass-through: kept, never in state
                out_id.append(rid)
                out_us.append(rus)
                out_band.append(-1)
                out_dup.append(None)
                continue
            verdict: dict[int, bool] = {}  # pair checked ONCE per row
            for ck in np.asarray(b_cks[r], dtype=np.int64):
                ck = int(ck)
                lo = int(np.searchsorted(e_ck, ck, side="left"))
                hi = int(np.searchsorted(e_ck, ck, side="right"))
                added = batch_buckets.get(ck, ())
                if hi - lo + len(added) + 1 > max_bucket_size:
                    raise ValueError(
                        f"streaming_near_dedup: bucket key {ck} holds "
                        f"{hi - lo + len(added) + 1} in-window entries "
                        f"(max_bucket_size={max_bucket_size}) — a "
                        "degenerate band key; widen bands/rows or "
                        "shorten the delay")
                best = None
                # ascending id order + break at the first hit == the
                # minimum matching id, but a clone-heavy bucket (the
                # sf10 rehearsal: 100 exact copies of every text) now
                # costs ONE verify per row instead of a full scan —
                # the previous all-entries sweep was measured >60 min
                # per sf10 replay (quadratic in clone count per bucket)
                for eid in sorted({*map(int, e_doc[lo:hi]), *added}):
                    if eid == rid:
                        continue
                    ok = verdict.get(eid)
                    if ok is None:
                        ok = verdict[eid] = _verify(rhs, eid)
                    if ok:
                        best = eid
                        break
                out_id.append(rid)
                out_us.append(rus)
                out_band.append(ck >> 44)
                out_dup.append(best)
                batch_buckets.setdefault(ck, []).append(rid)
            batch_sets[rid] = rhs

        # fold the batch (sentinel rows excluded) into the two tables
        kp = np.flatnonzero(~sent)
        n_ids = np.concatenate([d_id, b_ids[kp]])
        n_ts = np.concatenate([d_ts, b_us[kp]])
        n_sets = sets + [b_hs[i] for i in kp]
        if not len(n_ids):
            if state.exists:
                state.remove()
            # nothing carried: no timeout either
        else:
            ordr = np.argsort(n_ids, kind="stable")
            off = np.zeros(len(ordr) + 1, dtype=np.int64)
            szs = np.asarray([s.size for s in n_sets], dtype=np.int64)
            off[1:] = np.cumsum(szs[ordr])
            flat = (np.concatenate([n_sets[i] for i in ordr])
                    if len(ordr) else np.empty(0, dtype=np.int32))
            a_ck = np.concatenate(
                [e_ck] + [np.asarray(b_cks[i], dtype=np.int64)
                          for i in kp])
            a_doc = np.concatenate(
                [e_doc] + [np.full(len(b_cks[i]), b_ids[i],
                                   dtype=np.int64) for i in kp])
            eord = np.argsort(a_ck, kind="stable")
            state.update((
                n_ids[ordr].astype("<i8").tobytes(),
                n_ts[ordr].astype("<i8").tobytes(),
                off.astype("<i8").tobytes(),
                flat.astype("<i4").tobytes(),
                a_ck[eord].astype("<i8").tobytes(),
                a_doc[eord].astype("<i8").tobytes(),
                int(num_blocks),
            ))
            newest_ms = int(n_ts.max()) // 1000
            state.setTimeoutTimestamp(newest_ms + d_us // 1000 + 1)

        yield pd.DataFrame({
            id_col: np.asarray(out_id, dtype=np.int64),
            time: pd.to_datetime(np.asarray(out_us, dtype=np.int64),
                                 unit="us", utc=True)
            .tz_convert(sess_tz).tz_localize(None),
            "band": np.asarray(out_band, dtype=np.int32),
            "dup_of": pd.array(out_dup, dtype="Int64"),
        })

    return banded.groupBy("_blk").applyInPandasWithState(
        _fn, out_schema, state_schema, "append",
        GroupStateTimeout.EventTimeTimeout)
