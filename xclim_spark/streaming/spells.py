"""Streaming operators: windowed reductions + stateful spell detection.

Mappings from the batch operator algebra:

* ``select_resample_op``/``threshold_count`` -> tumbling ``F.window``
  aggregates with a watermark bounding late data (period keys become
  window structs; partial aggregation and state cleanup are handled by
  the streaming engine);
* the run-length/spell family -> ``applyInPandasWithState`` keyed by
  cell: the state is exactly the three numbers the batch sessionization
  derives per open run (current length, start, sum) — emitted as an
  event row when the run closes (the streaming twin of ``find_events``).
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["streaming_threshold_count", "streaming_resample_op",
           "streaming_spell_events"]

_FREQ_TO_WINDOW = {"D": "1 day", "H": "1 hour", "W": "7 days",
                   "MS": "30 days"}


def _window_str(freq: str) -> str:
    return _FREQ_TO_WINDOW.get(freq, freq)


def streaming_resample_op(
    sdf: DataFrame, var: str, op: str, freq: str, *,
    time: str = "time", cells: Sequence[str] = (),
    watermark: str = "1 day", alias: str | None = None,
) -> DataFrame:
    """Streaming twin of ``select_resample_op``: watermarked tumbling
    window + reducer."""
    red = {"mean": F.avg, "sum": F.sum, "min": F.min, "max": F.max,
           "count": F.count}[op]
    return (
        sdf.withWatermark(time, watermark)
        .groupBy(*cells, F.window(time, _window_str(freq)).alias("period"))
        .agg(red(F.col(var)).alias(alias or op))
    )


def streaming_threshold_count(
    sdf: DataFrame, var: str, op: str, thresh, freq: str, *,
    time: str = "time", cells: Sequence[str] = (),
    watermark: str = "1 day", alias: str = "count",
) -> DataFrame:
    """Streaming twin of ``threshold_count`` (tx_days_above on a live
    feed): per-window count of threshold exceedances."""
    from ..operators.generic import compare

    cond = compare(var, op, thresh)
    return (
        sdf.withWatermark(time, watermark)
        .groupBy(*cells, F.window(time, _window_str(freq)).alias("period"))
        .agg(F.sum(cond.cast("long")).alias(alias))
    )


def streaming_spell_events(
    sdf: DataFrame, var: str, op: str, thresh: float, *,
    min_length: int = 1,
    time: str = "time", cell: str = "cell",
    timeout_ms: int = 0,
    num_blocks: int | None = None,
    enforce_order: bool = True,
) -> DataFrame:
    """Streaming spell/event detection (batch twin: ``find_events``,
    reference run_length.py:1760-1901): per-cell state machine over
    ``applyInPandasWithState`` whose state is the open run's
    (length, start, sum); a closed run of >= ``min_length`` emits one
    event row ``cell, event_start, event_length, event_sum``.

    **Blocked state**: like :func:`~xclim_spark.streaming.fire.
    streaming_cffwis`, state is keyed by a deterministic HASH BLOCK of
    cells (``num_blocks``, default 2x parallelism — fixed for the life
    of a checkpoint, ENFORCED: state entries record their writer's
    ``num_blocks`` and a mismatched restart raises) carrying parallel
    arrays for the block's cells.
    Within a batch the block's rows sort once by (cell, time) and ONE
    vectorized boundary pass finds every cell's segments (cell-change
    OR flag-change breaks a run); only the per-cell seam merge touches
    the carried arrays.  A per-cell grouping pays one Arrow round trip
    + state-store access per cell per micro-batch — ~2-3x the total
    cost at the 10k-cell rehearsal scale.

    ``timeout_ms`` — idle-flush: with a positive value the state uses a
    processing-time timeout, and a block that receives NO data for that
    long emits its still-open runs (of >= ``min_length``) as closed
    events instead of holding them forever (the production answer to
    "the feed went quiet but the dashboard needs the event"; batch
    replays close final runs with a sentinel row instead).  A cell that
    resumes after a flush starts a NEW run — an idle flush is a
    provisional closure, the standard streaming trade-off.

    Rows inside each micro-batch are processed in timestamp order; state
    carries across batches — identical semantics to the batch
    sessionization when the input arrives in order per cell.  That
    ordering contract is ENFORCED by default: state carries each cell's
    last-seen timestamp (cells with no open run ride as zero-length
    entries just for this), and a micro-batch containing a row at or
    before it raises ``ValueError`` instead of silently corrupting the
    sessionization; duplicate (cell, time) rows inside one batch also
    raise.  The guard's cost is state that grows with ever-SEEN cell
    cardinality, not just open runs — the right default for bounded
    grids (the climate shape).  A churning unbounded key domain can
    pass ``enforce_order=False`` to carry only open runs (the old
    bounded-state behaviour) and accept that out-of-order input
    corrupts silently — source-level ordering becomes the contract.
    """
    from ..operators.generic import get_op

    cmp = get_op(op)
    if num_blocks is None:
        num_blocks = max(
            2 * sdf.sparkSession.sparkContext.defaultParallelism, 2)

    out_schema = (f"{cell} LONG, event_start TIMESTAMP, "
                  f"event_length INT, event_sum DOUBLE")
    # open-run starts ride as epoch micros: plain doubles round-trip
    # the state store without timestamp-object marshalling
    state_schema = ("cells ARRAY<LONG>, len ARRAY<INT>, "
                    "start_us ARRAY<LONG>, total ARRAY<DOUBLE>, "
                    "last_us ARRAY<LONG>, nb INT")

    def _fn(key, pdfs, state: GroupState):
        import numpy as np

        if timeout_ms and state.hasTimedOut:
            # idle flush: close every open run, keep cells (and their
            # last-seen timestamps — the ordering guard survives)
            st_cells, st_len, st_us, st_tot, st_last, snb = state.get
            if int(snb) != int(num_blocks):
                # same guard as the data path: a timeout must not
                # flush events from a block whose cells no longer map
                # to it under a changed block count
                raise ValueError(
                    "streaming_spell_events: num_blocks changed across "
                    f"a checkpoint restart (state written with "
                    f"{int(snb)}, query configured with "
                    f"{int(num_blocks)}) — keep num_blocks fixed for "
                    "the life of a checkpoint")
            st_len = np.asarray(st_len, dtype=np.int64)
            flush = st_len >= min_length
            state.update((
                list(st_cells),
                [0] * len(st_cells),
                [0] * len(st_cells),
                [0.0] * len(st_cells),
                list(st_last),
                int(snb),
            ))
            state.setTimeoutDuration(timeout_ms)
            if flush.any():
                st_us = np.asarray(st_us, dtype=np.int64)
                yield pd.DataFrame({
                    cell: np.asarray(st_cells,
                                     dtype=np.int64)[flush],
                    "event_start": pd.to_datetime(st_us[flush],
                                                  unit="us"),
                    "event_length": st_len[flush],
                    "event_sum": np.asarray(st_tot,
                                            dtype=float)[flush],
                })
            return

        batch = [p for p in pdfs if len(p)]
        if not batch:
            return  # state carries unchanged
        pdf = pd.concat(batch).sort_values([cell, time])
        c = pdf[cell].to_numpy()
        v = pdf[var].to_numpy(dtype=float)
        t_us = pd.DatetimeIndex(pdf[time]).asi8 // 1000  # epoch micros
        a = np.asarray(cmp(v, thresh), dtype=bool)
        n = len(c)

        # segment boundaries: row 0, any cell change, any flag change
        newcell = np.empty(n, dtype=bool)
        newcell[0] = True
        newcell[1:] = c[1:] != c[:-1]
        # rows are sorted by (cell, time), so a non-increasing step
        # inside a cell can only be a duplicate timestamp
        if n > 1 and np.any(~newcell[1:] & (t_us[1:] <= t_us[:-1])):
            raise ValueError(
                "streaming_spell_events: duplicate (cell, time) rows "
                "inside a micro-batch")
        cell_starts = np.flatnonzero(newcell)
        batch_first_us = t_us[cell_starts]
        batch_last_us = t_us[np.append(cell_starts[1:], n) - 1]
        achg = np.empty(n, dtype=bool)
        achg[0] = True
        achg[1:] = a[1:] != a[:-1]
        starts = np.flatnonzero(newcell | achg)
        ends = np.append(starts[1:], n) - 1  # inclusive
        cs = np.concatenate(([0.0], np.cumsum(np.where(a, v, 0.0))))
        seg_cell = c[starts]
        seg_true = a[starts]
        seg_len = (ends - starts + 1).astype(np.int64)
        seg_sum = cs[ends + 1] - cs[starts]
        seg_start = t_us[starts].copy()
        seg_first = newcell[starts]               # cell's first segment
        seg_last = np.empty(len(starts), dtype=bool)
        seg_last[:-1] = seg_cell[:-1] != seg_cell[1:]
        seg_last[-1] = True                       # cell's last segment

        # carried open runs, aligned to this batch's cells
        if state.exists:
            st_cells, st_len, st_us, st_tot, st_last, snb = state.get
            if int(snb) != int(num_blocks):
                raise ValueError(
                    "streaming_spell_events: num_blocks changed across "
                    f"a checkpoint restart (state written with "
                    f"{int(snb)}, query configured with "
                    f"{int(num_blocks)}) — cells would silently remap "
                    "to blocks that do not carry their state; keep "
                    "num_blocks fixed for the life of a checkpoint")
            st_cells = np.asarray(st_cells, dtype=np.int64)
            st_len = np.asarray(st_len, dtype=np.int64)
            st_us = np.asarray(st_us, dtype=np.int64)
            st_tot = np.asarray(st_tot, dtype=float)
            st_last = np.asarray(st_last, dtype=np.int64)
        else:
            st_cells = np.empty(0, dtype=np.int64)
            st_len = st_us = np.empty(0, dtype=np.int64)
            st_tot = np.empty(0, dtype=float)
            st_last = np.empty(0, dtype=np.int64)

        if len(st_cells) and enforce_order:
            # time-order guard: a batch row at or before a cell's
            # last-seen timestamp is out-of-order input (the documented
            # contract, enforced).  st_cells is stored sorted.
            bc = c[cell_starts]
            spos = np.minimum(np.searchsorted(st_cells, bc),
                              len(st_cells) - 1)
            hit = st_cells[spos] == bc
            late = hit & (batch_first_us <= st_last[spos])
            if late.any():
                offender = int(bc[np.flatnonzero(late)[0]])
                raise ValueError(
                    "streaming_spell_events: out-of-order input — "
                    f"cell {offender} received a row at or before its "
                    "last processed timestamp; rows must arrive in "
                    "time order per cell across micro-batches")

        events_c, events_s, events_l, events_t = [], [], [], []
        if len(st_cells):
            # carried runs whose cell appears in this batch: merge into
            # its first segment if that segment is True, else close
            bpos = np.searchsorted(seg_cell[seg_first],
                                   st_cells)  # index into first-segs
            first_idx = np.flatnonzero(seg_first)
            in_batch = (bpos < len(first_idx)) & np.isin(
                st_cells, seg_cell[first_idx])
            open_mask = st_len > 0
            for j in np.flatnonzero(open_mask & in_batch):
                si = first_idx[bpos[j]]
                if seg_true[si]:
                    seg_len[si] += st_len[j]
                    seg_sum[si] += st_tot[j]
                    seg_start[si] = st_us[j]
                elif st_len[j] >= min_length:
                    events_c.append(int(st_cells[j]))
                    events_s.append(int(st_us[j]))
                    events_l.append(int(st_len[j]))
                    events_t.append(float(st_tot[j]))

        # closed True segments emit; a cell's LAST True segment stays
        # open and becomes its carry
        open_seg = seg_true & seg_last
        closed = seg_true & ~seg_last & (seg_len >= min_length)
        events_c.extend(seg_cell[closed].tolist())
        events_s.extend(seg_start[closed].tolist())
        events_l.extend(seg_len[closed].tolist())
        events_t.extend(seg_sum[closed].tolist())

        # new carry: union of batch cells (their last segment, open or
        # not) and ALL carried cells absent from this batch — closed
        # cells ride as zero-length entries so their last-seen
        # timestamp keeps guarding the ordering contract
        batch_cells = seg_cell[seg_last]
        last_open = open_seg[seg_last]
        new_len = np.where(last_open, seg_len[seg_last], 0)
        new_us = np.where(last_open, seg_start[seg_last], 0)
        new_tot = np.where(last_open, seg_sum[seg_last], 0.0)
        new_last = batch_last_us  # same per-cell order as batch_cells
        if len(st_cells):
            # with the guard on, closed cells ride as zero-length
            # entries so their last_us keeps guarding; with it off,
            # carry only open runs (bounded by run count)
            keep = ~np.isin(st_cells, batch_cells)
            if not enforce_order:
                keep &= st_len > 0
            all_cells = np.concatenate([batch_cells, st_cells[keep]])
            new_len = np.concatenate([new_len, st_len[keep]])
            new_us = np.concatenate([new_us, st_us[keep]])
            new_tot = np.concatenate([new_tot, st_tot[keep]])
            new_last = np.concatenate([new_last, st_last[keep]])
        else:
            all_cells = batch_cells
        ordr = np.argsort(all_cells, kind="stable")
        state.update((
            [int(x) for x in all_cells[ordr]],
            [int(x) for x in new_len[ordr]],
            [int(x) for x in new_us[ordr]],
            [float(x) for x in new_tot[ordr]],
            [int(x) for x in new_last[ordr]],
            int(num_blocks),
        ))
        if timeout_ms:
            state.setTimeoutDuration(timeout_ms)

        if events_c:
            yield pd.DataFrame({
                cell: np.asarray(events_c, dtype=np.int64),
                "event_start": pd.to_datetime(
                    np.asarray(events_s, dtype=np.int64), unit="us"),
                "event_length": np.asarray(events_l, dtype=np.int64),
                "event_sum": np.asarray(events_t, dtype=float),
            })

    blocked = sdf.withColumn(
        "_blk", F.pmod(F.hash(cell), F.lit(num_blocks)))
    return blocked.groupBy("_blk").applyInPandasWithState(
        _fn, out_schema, state_schema, "append",
        GroupStateTimeout.ProcessingTimeTimeout if timeout_ms
        else GroupStateTimeout.NoTimeout,
    )
