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
) -> DataFrame:
    """Streaming spell/event detection (batch twin: ``find_events``,
    reference run_length.py:1760-1901): per-cell state machine over
    ``applyInPandasWithState`` whose state is the open run's
    (length, start, sum); a closed run of >= ``min_length`` emits one
    event row ``cell, event_start, event_length, event_sum``.

    Rows inside each micro-batch are processed in timestamp order; state
    carries across batches — identical semantics to the batch
    sessionization when the input arrives in order per cell.
    """
    from ..operators.generic import get_op

    cmp = get_op(op)

    out_schema = (f"{cell} LONG, event_start TIMESTAMP, "
                  f"event_length INT, event_sum DOUBLE")
    state_schema = "len INT, start TIMESTAMP, total DOUBLE"

    def _fn(key, pdfs, state: GroupState):
        # Vectorized within each micro-batch: numpy run-boundary diff
        # finds the in-batch segments in one pass; only the carry-in /
        # carry-out state is handled scalar (the cross-batch seam).
        import numpy as np

        events = []
        if state.exists:
            run_len, run_start, run_sum = state.get
        else:
            run_len, run_start, run_sum = 0, None, 0.0
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values(time)
            v = pdf[var].to_numpy(dtype=float)
            t = pdf[time].to_numpy()
            a = np.asarray(cmp(v, thresh), dtype=bool)
            pad = np.concatenate(([False], a, [False])).astype(np.int8)
            d = np.diff(pad)
            starts = np.flatnonzero(d == 1)
            ends = np.flatnonzero(d == -1) - 1  # inclusive
            cs = np.concatenate(([0.0], np.cumsum(np.where(a, v, 0.0))))
            seg_len = (ends - starts + 1).tolist()
            seg_sum = (cs[ends + 1] - cs[starts]).tolist()
            seg_start = [pd.Timestamp(t[i]) for i in starts]
            if run_len > 0:
                if len(starts) and starts[0] == 0:
                    # open run continues into the batch's first segment
                    seg_len[0] += run_len
                    seg_sum[0] += run_sum
                    seg_start[0] = run_start
                else:
                    if run_len >= min_length:
                        events.append((key[0], run_start, run_len,
                                       run_sum))
                run_len, run_start, run_sum = 0, None, 0.0
            open_tail = len(ends) and ends[-1] == len(a) - 1
            n_closed = len(seg_len) - (1 if open_tail else 0)
            for i in range(n_closed):
                if seg_len[i] >= min_length:
                    events.append((key[0], seg_start[i], int(seg_len[i]),
                                   float(seg_sum[i])))
            if open_tail:
                run_len = int(seg_len[-1])
                run_start = seg_start[-1]
                run_sum = float(seg_sum[-1])
        state.update((run_len, run_start, run_sum))
        if events:
            yield pd.DataFrame(
                events, columns=[cell, "event_start", "event_length",
                                 "event_sum"])

    return sdf.groupBy(cell).applyInPandasWithState(
        _fn, out_schema, state_schema, "append",
        GroupStateTimeout.NoTimeout,
    )
