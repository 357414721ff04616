"""Streaming CFFWIS: the Canadian Fire Weather Index System over a live
feed, keyed by cell (reference ``_fire_weather_calc``,
src/xclim/indices/fire/_cffwis.py:655-882 and the single-chunk-in-time
constraint at _cffwis.py:912).

The batch operator holds each cell's full series in one pandas task
because the moisture-code recursion is sequential in time.  On a stream
the same recursion becomes PER-CELL STATE carried across micro-batches
through ``applyInPandasWithState``:

* the three moisture codes (FFMC / DMC / DC),
* the season automaton's memory — the previous in-season bit plus the
  trailing ``temp_condition_days`` temperatures the WF93 window needs,
* the overwintering accumulator pair (stored fall DC, winter
  precipitation total),
* a day counter (the batch automaton forces the first
  ``temp_condition_days + 1`` days of a series off-season; the stream
  must count globally, not per batch).

Each micro-batch replays its rows in timestamp order, rebuilds the
season mask for exactly the days it carries (scalar WF93 automaton —
window EXCLUDES the current day, identical to
:func:`~xclim_spark.operators.fire.fire_season_mask_block`), then runs
the SAME vectorized kernel as the batch path
(:func:`~xclim_spark.operators.fire.cffwis_block`) resumed from the
stored state (``state0``/``return_state``) — so the chunked stream is
bit-identical to one full-series batch call, by construction rather
than by re-implementation.

Ordering contract: rows must arrive in time order per cell ACROSS
micro-batches (same contract as
:func:`~xclim_spark.streaming.spells.streaming_spell_events`); within a
batch they are sorted.  A production deployment feeds this from a
time-ordered source (kafka partition per cell region, or date-ordered
file drops) — out-of-order days would corrupt any day-over-day
recursion, streaming or batch.

Scale: state is O(1) doubles per cell (a 1M-cell grid carries ~50 MB of
state store), each micro-batch is one Arrow round-trip per state
partition, and cells are independent — the operator scales out exactly
like the batch ``applyInPandas`` tier.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["streaming_cffwis"]


def streaming_cffwis(
    sdf: DataFrame,
    *,
    tas: str, pr: str, hurs: str, ws: str,
    lat: float = 45.0,
    time: str = "time",
    cell: str = "cell",
    season_method: str | None = "WF93",
    overwintering: bool = True,
    temp_start_thresh: float = 12.0,
    temp_end_thresh: float = 5.0,
    temp_condition_days: int = 3,
    ffmc0: float = 85.0, dmc0: float = 6.0, dc0: float = 15.0,
) -> DataFrame:
    """Streaming twin of :func:`~xclim_spark.operators.fire.cffwis_indices`
    (WF93 season automaton + overwintered Drought Code, or the plain
    always-on system with ``season_method=None``).

    Emits one row per in-feed day:
    ``cell, <time>, ffmc, dmc, dc, isi, bui, fwi`` (off-season days carry
    NaN codes, exactly like the batch seasonal path).
    """
    if season_method not in (None, "WF93"):
        raise NotImplementedError(
            "streaming season automaton supports WF93 (temperature "
            "window); LA08/GFWED need a snow-depth feed in state")
    seasonal = season_method == "WF93"
    ncond = int(temp_condition_days)
    # the batch automaton's first possibly-ON index
    # (fire_season_mask_block starts its loop at temp_condition_days + 1)
    start_index = ncond + 1

    out_schema = (f"{cell} LONG, {time} TIMESTAMP, ffmc DOUBLE, "
                  f"dmc DOUBLE, dc DOUBLE, isi DOUBLE, bui DOUBLE, "
                  f"fwi DOUBLE")
    state_schema = ("f DOUBLE, dm DOUBLE, dc DOUBLE, ow_dc DOUBLE, "
                    "ow_dmc DOUBLE, winter_pr DOUBLE, prev INT, "
                    "days LONG, tbuf ARRAY<DOUBLE>")

    from ..operators.fire import cffwis_block

    def _fn(key, pdfs, state: GroupState):
        batch = [p for p in pdfs if len(p)]
        if not batch:
            # no rows this trigger: state carries unchanged
            return
        pdf = pd.concat(batch).sort_values(time)
        n = len(pdf)
        if state.exists:
            (f0, dm0, dcv0, owdc0, owdmc0, wpr0, prev0, days0,
             tbuf) = state.get
            tbuf = list(tbuf) if tbuf is not None else []
        else:
            f0 = dm0 = dcv0 = float("nan")
            owdc0 = float("nan") if (seasonal and overwintering) else dc0
            owdmc0, wpr0, prev0, days0, tbuf = dmc0, 0.0, 0, 0, []
            if not seasonal:
                f0, dm0, dcv0 = ffmc0, dmc0, dc0

        t = pdf[tas].to_numpy(dtype=float)
        p = pdf[pr].to_numpy(dtype=float)
        h = pdf[hurs].to_numpy(dtype=float)
        w = pdf[ws].to_numpy(dtype=float)
        ts = pd.DatetimeIndex(pd.to_datetime(pdf[time]))
        months = ts.month.to_numpy()

        mask = None
        prev_bit = int(prev0)
        if seasonal:
            # scalar WF93 automaton resumed from (tbuf, prev, days):
            # identical to fire_season_mask_block's matrix loop — day g's
            # window is the previous `ncond` temperatures (EXCLUDES g),
            # and days before global index start_index are forced off.
            mask = np.zeros(n, dtype=bool)
            for i in range(n):
                g = days0 + i
                if g >= start_index and len(tbuf) >= ncond:
                    win = tbuf[-ncond:]
                    start_up = all(v > temp_start_thresh for v in win)
                    shut_down = all(v < temp_end_thresh for v in win)
                    cur = 1 if ((prev_bit or start_up)
                                and not shut_down) else 0
                else:
                    cur = 0
                mask[i] = bool(cur)
                prev_bit = cur
                tbuf.append(float(t[i]))
            tbuf = tbuf[-ncond:]

        st0 = {"f": [f0], "dm": [dm0], "dc": [dcv0]}
        if seasonal:
            st0.update(ow_dc=[owdc0], ow_dmc=[owdmc0],
                       winter_pr=[wpr0], prev=[prev0])
        res, st = cffwis_block(
            t[:, None], p[:, None], h[:, None], w[:, None], months, lat,
            ffmc0=ffmc0, dmc0=dmc0, dc0=dc0,
            season_mask=mask[:, None] if seasonal else None,
            overwintering=overwintering, state0=st0, return_state=True)

        if seasonal:
            state.update((float(st["f"][0]), float(st["dm"][0]),
                          float(st["dc"][0]), float(st["ow_dc"][0]),
                          float(st["ow_dmc"][0]),
                          float(st["winter_pr"][0]), prev_bit,
                          days0 + n, [float(v) for v in tbuf]))
        else:
            state.update((float(st["f"][0]), float(st["dm"][0]),
                          float(st["dc"][0]), owdc0, owdmc0, wpr0,
                          prev_bit, days0 + n, []))

        yield pd.DataFrame({
            cell: np.full(n, key[0]),
            time: ts,
            "ffmc": res["ffmc"][:, 0], "dmc": res["dmc"][:, 0],
            "dc": res["dc"][:, 0], "isi": res["isi"][:, 0],
            "bui": res["bui"][:, 0], "fwi": res["fwi"][:, 0],
        })

    return sdf.groupBy(cell).applyInPandasWithState(
        _fn, out_schema, state_schema, "append",
        GroupStateTimeout.NoTimeout,
    )
