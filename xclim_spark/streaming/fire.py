"""Streaming CFFWIS: the Canadian Fire Weather Index System over a live
feed (reference ``_fire_weather_calc``,
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
* a per-cell day counter (the batch automaton forces the first
  ``temp_condition_days + 1`` days of a series off-season; the stream
  must count globally, not per batch).

**Blocked state, not per-cell tasks**: like the batch operator
(``cffwis_indices`` hashes cells into blocks so the day loop runs as
numpy vectors across a block's cells), the streaming state is keyed by
a deterministic HASH BLOCK of cells, and one state-store entry carries
parallel arrays for all of the block's cells.  A per-cell grouping
would pay one Arrow round-trip plus thousands of size-1 numpy ops per
cell per micro-batch — measured 20x slower at the 10k-cell scale
rehearsal.  Within a batch the block pivots to (days x cells) matrices,
the WF93 mask automaton advances vectorized across cells from the
carried window, and the SAME kernel as the batch path
(:func:`~xclim_spark.operators.fire.cffwis_block`) runs resumed from
the stored state (``state0``/``return_state``) — so the chunked stream
is bit-identical to one full-series batch call by construction rather
than re-implementation.

Ordering contract: rows must arrive in time order per cell ACROSS
micro-batches (same contract as
:func:`~xclim_spark.streaming.spells.streaming_spell_events`); within a
batch they are sorted.  A production deployment feeds this from a
time-ordered source — out-of-order days would corrupt any day-over-day
recursion, streaming or batch.  The contract is ENFORCED: state carries
each cell's last-seen timestamp and a micro-batch containing a row at
or before it raises ``ValueError`` instead of silently corrupting the
recursion; duplicate (cell, day) rows inside one batch also raise.

Scale: state is O(1) doubles per cell packed into O(cells/blocks)
arrays per state entry (a 1M-cell grid carries ~80 MB of state store),
each micro-batch is one Arrow round-trip per block, and blocks are
independent — the operator scales out exactly like the batch
``applyInPandas`` tier.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["streaming_cffwis"]


def streaming_cffwis(
    sdf: DataFrame,
    *,
    tas: str, pr: str, hurs: str, ws: str,
    snd: str | None = None,
    lat: float = 45.0,
    time: str = "time",
    cell: str = "cell",
    season_method: str | None = "WF93",
    overwintering: bool = True,
    temp_start_thresh: float = 12.0,
    temp_end_thresh: float = 5.0,
    temp_condition_days: int = 3,
    snow_condition_days: int = 3,
    snow_thresh: float = 0.01,
    ffmc0: float = 85.0, dmc0: float = 6.0, dc0: float = 15.0,
    num_blocks: int | None = None,
    outputs: tuple = ("ffmc", "dmc", "dc", "isi", "bui", "fwi"),
) -> DataFrame:
    """Streaming twin of :func:`~xclim_spark.operators.fire.cffwis_indices`
    (WF93 / LA08 / GFWED season automatons + overwintered Drought Code,
    or the plain always-on system with ``season_method=None``;
    LA08/GFWED need a snow-depth column ``snd`` — their windows ride
    the state as a second carried buffer).

    Emits one row per in-feed day:
    ``cell, <time>, ffmc, dmc, dc, isi, bui, fwi`` (off-season days
    carry NaN codes, exactly like the batch seasonal path).

    ``num_blocks`` — state-entry count (default 2x the session's
    parallelism).  It must stay FIXED for the life of a checkpoint:
    cells map to blocks by deterministic hash, and a block's state
    carries all of its cells' codes as parallel arrays.  ENFORCED:
    every state entry records the ``num_blocks`` it was written with,
    and resuming a checkpoint under a different value raises on the
    first batch that touches carried state (pass ``num_blocks``
    explicitly in production — the default tracks cluster parallelism,
    which can change between restarts).

    ``outputs`` — which of the six components to emit.  The recursion
    always computes all six (they feed each other), but a sink that
    only stores e.g. ``fwi`` should not ship six doubles per day
    through the stream (column pruning cannot reach inside a stateful
    operator, so the projection is a parameter).
    """
    if season_method not in (None, "WF93", "LA08", "GFWED"):
        raise NotImplementedError(
            f"season_method {season_method!r}")
    if season_method in ("LA08", "GFWED") and snd is None:
        raise ValueError(f"{season_method} requires a snow-depth "
                         "column (snd=)")
    seasonal = season_method is not None
    ncond = int(temp_condition_days)
    scd = int(snow_condition_days)
    # the batch automaton's first possibly-ON index
    # (fire_season_mask_block: WF93 windows EXCLUDE the current day and
    # start at temp_condition_days + 1; LA08/GFWED windows INCLUDE it
    # and start at max(temp_condition_days, snow_condition_days))
    start_index = ncond + 1 if season_method == "WF93" \
        else max(ncond, scd)
    sw = scd if season_method in ("LA08", "GFWED") else 1
    if num_blocks is None:
        num_blocks = max(
            2 * sdf.sparkSession.sparkContext.defaultParallelism, 2)

    outputs = tuple(outputs)
    bad = [o for o in outputs
           if o not in ("ffmc", "dmc", "dc", "isi", "bui", "fwi")]
    if bad:
        raise ValueError(f"unknown outputs: {bad}")
    out_schema = ", ".join(
        [f"{cell} LONG", f"{time} TIMESTAMP"]
        + [f"{o} DOUBLE" for o in outputs])
    state_schema = ("cells ARRAY<LONG>, f ARRAY<DOUBLE>, "
                    "dm ARRAY<DOUBLE>, dc ARRAY<DOUBLE>, "
                    "ow_dc ARRAY<DOUBLE>, ow_dmc ARRAY<DOUBLE>, "
                    "winter_pr ARRAY<DOUBLE>, prev ARRAY<INT>, "
                    "days ARRAY<LONG>, tbuf ARRAY<DOUBLE>, "
                    "sbuf ARRAY<DOUBLE>, last_us ARRAY<LONG>, nb INT")
    _NEVER = -(2**62)  # "cell never seen" sentinel for last_us

    from ..operators.fire import cffwis_block

    def _new_state(k):
        st = {
            "f": np.full(k, np.nan), "dm": np.full(k, np.nan),
            "dc": np.full(k, np.nan),
            "ow_dc": np.full(k, np.nan if overwintering else dc0),
            "ow_dmc": np.full(k, dmc0),
            "winter_pr": np.zeros(k),
            "prev": np.zeros(k, dtype=np.int16),
            "days": np.zeros(k, dtype=np.int64),
            "tbuf": np.full((k, ncond), np.nan),
            "sbuf": np.full((k, sw), np.nan),
            "last_us": np.full(k, _NEVER, dtype=np.int64),
        }
        if not seasonal:
            st["f"][:] = ffmc0
            st["dm"][:] = dmc0
            st["dc"][:] = dc0
        return st

    def _fn(key, pdfs, state: GroupState):
        batch = [p for p in pdfs if len(p)]
        if not batch:
            return  # state carries unchanged
        pdf = pd.concat(batch)

        # pivot to (days x cells) on the block's union time axis
        # (factorize, same reshape as the batch operator)
        ccodes, cols = pd.factorize(pdf[cell], sort=True)
        tcodes, times = pd.factorize(pdf[time], sort=True)
        n, k = len(times), len(cols)
        mats = {}
        for v in ((tas, pr, hurs, ws, snd) if snd is not None
                  else (tas, pr, hurs, ws)):
            m = np.full((n, k), np.nan)
            m[tcodes, ccodes] = pdf[v].to_numpy(dtype=float)
            mats[v] = m
        present = np.zeros((n, k), dtype=bool)
        present[tcodes, ccodes] = True
        months = pd.DatetimeIndex(pd.to_datetime(times)).month.to_numpy()

        # align carried state onto this batch's cell set (cells may
        # appear mid-stream; absent cells keep their slot and state)
        cols_arr = np.asarray(cols, dtype=np.int64)
        if state.exists:
            (sc_cells, sf, sdm, sdc, sowdc, sowdmc, swpr, sprev,
             sdays, stbuf, ssbuf, slast, snb) = state.get
            if int(snb) != int(num_blocks):
                raise ValueError(
                    "streaming_cffwis: num_blocks changed across a "
                    f"checkpoint restart (state written with "
                    f"{int(snb)}, query configured with "
                    f"{int(num_blocks)}) — cells would silently remap "
                    "to blocks that do not carry their state; keep "
                    "num_blocks fixed for the life of a checkpoint")
            sc_cells = np.asarray(sc_cells, dtype=np.int64)
            all_cells = np.union1d(sc_cells, cols_arr)
            ka = len(all_cells)
            st = _new_state(ka)
            old_pos = np.searchsorted(all_cells, sc_cells)
            st["f"][old_pos] = sf
            st["dm"][old_pos] = sdm
            st["dc"][old_pos] = sdc
            st["ow_dc"][old_pos] = sowdc
            st["ow_dmc"][old_pos] = sowdmc
            st["winter_pr"][old_pos] = swpr
            st["prev"][old_pos] = np.asarray(sprev, dtype=np.int16)
            st["days"][old_pos] = np.asarray(sdays, dtype=np.int64)
            st["tbuf"][old_pos] = np.asarray(
                stbuf, dtype=float).reshape(len(sc_cells), ncond)
            st["sbuf"][old_pos] = np.asarray(
                ssbuf, dtype=float).reshape(len(sc_cells), sw)
            st["last_us"][old_pos] = np.asarray(slast, dtype=np.int64)
        else:
            all_cells = cols_arr
            ka = k
            st = _new_state(ka)

        # scatter this batch's matrices onto the aligned cell axis
        pos = np.searchsorted(all_cells, cols_arr)
        def _scatter(m, fill=np.nan):
            out = np.full((n, ka), fill)
            out[:, pos] = m
            return out
        t_m = _scatter(mats[tas])
        p_m = _scatter(mats[pr])
        h_m = _scatter(mats[hurs])
        w_m = _scatter(mats[ws])
        s_m = _scatter(mats[snd]) if snd is not None else None
        pres = np.zeros((n, ka), dtype=bool)
        pres[:, pos] = present

        # ---- time-order guard: the documented contract, enforced ----
        # duplicate (cell, day) rows inside the batch would make the
        # pivot keep one arbitrarily
        if len(pdf) != int(present.sum()):
            raise ValueError(
                "streaming_cffwis: duplicate (cell, time) rows inside "
                "a micro-batch — the day-over-day recursion needs one "
                "row per cell per day")
        times_us = pd.DatetimeIndex(
            pd.to_datetime(times)).asi8 // 1000
        any_pres = pres.any(axis=0)
        first_idx = pres.argmax(axis=0)
        late = any_pres & (times_us[first_idx] <= st["last_us"])
        if late.any():
            offender = int(all_cells[np.flatnonzero(late)[0]])
            raise ValueError(
                "streaming_cffwis: out-of-order input — cell "
                f"{offender} received a row at or before its last "
                "processed timestamp; rows must arrive in time order "
                "per cell across micro-batches")
        last_idx = n - 1 - pres[::-1].argmax(axis=0)
        new_last = np.where(
            any_pres, times_us[last_idx], st["last_us"])

        mask = None
        prev_bit = st["prev"].copy()
        days = st["days"]
        tbuf = st["tbuf"]
        sbuf = st["sbuf"]
        if seasonal:
            # season automaton resumed from (tbuf, sbuf, prev, days),
            # advanced as numpy vectors across the block's cells over
            # the CELL'S OWN day sequence (gaps skipped), identical to
            # fire_season_mask_block on the compacted series: WF93
            # windows EXCLUDE the current day, LA08/GFWED windows
            # INCLUDE it; indices before start_index are forced off.
            # Absent slots carry the previous bit (the batch ffill).
            mask = np.zeros((n, ka), dtype=bool)
            for i in range(n):
                pr_i = pres[i]
                can = pr_i & (days >= start_index)
                with np.errstate(invalid="ignore"):
                    if season_method == "WF93":
                        win = tbuf  # last ncond temps, excludes today
                        start_up = np.all(win > temp_start_thresh,
                                          axis=1)
                        shut_down = np.all(win < temp_end_thresh,
                                           axis=1)
                    else:
                        twin = np.column_stack(
                            [tbuf[:, ncond - (ncond - 1):], t_m[i]]) \
                            if ncond > 1 else t_m[i][:, None]
                        swin = np.column_stack(
                            [sbuf[:, sw - (scd - 1):], s_m[i]]) \
                            if scd > 1 else s_m[i][:, None]
                        if season_method == "LA08":
                            start_up = np.all(swin <= snow_thresh,
                                              axis=1)
                            shut_down = (s_m[i] > snow_thresh) | np.all(
                                twin < temp_end_thresh, axis=1)
                        else:  # GFWED
                            mt = np.mean(twin, axis=1)
                            ms = np.mean(swin, axis=1)
                            start_up = (mt > temp_start_thresh) \
                                & (ms < snow_thresh)
                            shut_down = (ms >= snow_thresh) \
                                | (mt < temp_end_thresh)
                cur = np.where(
                    can,
                    ((prev_bit.astype(bool) | start_up) & ~shut_down)
                    .astype(np.int16),
                    np.where(pr_i, 0, prev_bit))
                mask[i] = cur.astype(bool)
                prev_bit = np.where(pr_i, cur, prev_bit).astype(np.int16)
                # roll the windows + count the day only where present
                tbuf = np.where(
                    pr_i[:, None],
                    np.column_stack([tbuf[:, 1:], t_m[i]]),
                    tbuf)
                if s_m is not None:
                    sbuf = np.where(
                        pr_i[:, None],
                        np.column_stack([sbuf[:, 1:], s_m[i]]),
                        sbuf)
                days = days + pr_i
        else:
            days = days + pres.sum(axis=0)

        st0 = {kk: st[kk] for kk in
               ("f", "dm", "dc", "ow_dc", "ow_dmc", "winter_pr", "prev")}
        res, out_state = cffwis_block(
            t_m, p_m, h_m, w_m, months, lat,
            ffmc0=ffmc0, dmc0=dmc0, dc0=dc0, present=pres,
            season_mask=mask if seasonal else None,
            overwintering=overwintering, state0=st0, return_state=True)

        new_prev = prev_bit if seasonal else st["prev"]
        state.update((
            [int(c) for c in all_cells],
            [float(v) for v in out_state["f"]],
            [float(v) for v in out_state["dm"]],
            [float(v) for v in out_state["dc"]],
            [float(v) for v in out_state.get("ow_dc", st["ow_dc"])],
            [float(v) for v in out_state.get("ow_dmc", st["ow_dmc"])],
            [float(v) for v in
             out_state.get("winter_pr", st["winter_pr"])],
            [int(v) for v in new_prev],
            [int(v) for v in days],
            [float(v) for v in tbuf.ravel()],
            [float(v) for v in sbuf.ravel()],
            [int(v) for v in new_last],
            int(num_blocks),
        ))

        flat = pres.ravel()
        out = {
            cell: np.tile(all_cells, n)[flat],
            time: np.repeat(np.asarray(times), ka)[flat],
        }
        for name in outputs:
            out[name] = res[name].ravel()[flat]
        yield pd.DataFrame(out)

    blocked = sdf.withColumn(
        "_blk", F.pmod(F.hash(cell), F.lit(num_blocks)))
    return blocked.groupBy("_blk").applyInPandasWithState(
        _fn, out_schema, state_schema, "append",
        GroupStateTimeout.NoTimeout,
    )
