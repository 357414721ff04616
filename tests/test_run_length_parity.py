"""Randomized parity: the window-trick fast paths vs a brute-force oracle.

The period-truncated implementations of windowed_run_count/-events,
first_run, last_run and runs_with_holes were rewritten from run-id
sessionization to forward/backward rolling hit tests; these tests pin
their semantics to a dumb-but-obviously-correct Python reference over
seeded random series (100 cells x 3 "years" of 40 days, p(True)=0.55,
plus NULL holes) for several window sizes.
"""

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from xclim_spark.operators import run_length as rl

N_CELLS = 40
DAYS_PER_PERIOD = 40
N_PERIODS = 3


def _runs(vals):
    """Brute-force maximal True runs of a bool/None sequence -> (start, length)."""
    out, start = [], None
    for i, v in enumerate(vals):
        if v is True and start is None:
            start = i
        elif v is not True and start is not None:
            out.append((start, i - start))
            start = None
    if start is not None:
        out.append((start, len(vals) - start))
    return out


@pytest.fixture(scope="module")
def series(spark):
    rng = np.random.RandomState(42)
    rows, truth = [], {}
    base = dt.date(2000, 1, 1)
    for c in range(N_CELLS):
        flags = []
        for i in range(DAYS_PER_PERIOD * N_PERIODS):
            v = bool(rng.rand() < 0.55)
            if rng.rand() < 0.05:
                v = None  # NULL breaks runs like the reference's NaN
            flags.append(v)
            rows.append((c, base + dt.timedelta(days=i),
                         None if v is None else float(v)))
        truth[c] = flags
    df = spark.createDataFrame(rows, "cell INT, time DATE, v DOUBLE")
    return df, truth


def _per_period(flags):
    for p in range(N_PERIODS):
        yield p, flags[p * DAYS_PER_PERIOD:(p + 1) * DAYS_PER_PERIOD]


@pytest.mark.parametrize("window", [1, 2, 3, 5])
def test_windowed_run_count_parity(spark, series, window):
    df, truth = series
    out = rl.windowed_run_count(df, F.col("v") > 0.5, window,
                                time="time", cells=["cell"])
    got = {r["cell"]: r["days"] for r in out.collect()}
    for c, flags in truth.items():
        want = sum(ln for _, ln in _runs(flags) if ln >= window)
        assert got[c] == want, (c, window)


@pytest.mark.parametrize("window", [1, 2, 3, 5])
def test_windowed_run_events_parity(spark, series, window):
    df, truth = series
    out = rl.windowed_run_events(df, F.col("v") > 0.5, window,
                                 time="time", cells=["cell"])
    got = {r["cell"]: r["events"] for r in out.collect()}
    for c, flags in truth.items():
        want = sum(1 for _, ln in _runs(flags) if ln >= window)
        assert got[c] == want, (c, window)


@pytest.mark.parametrize("window", [1, 2, 4])
def test_first_last_run_parity(spark, series, window):
    df, truth = series
    base = dt.date(2000, 1, 1)
    first = rl.first_run(df, F.col("v") > 0.5, window,
                         time="time", cells=["cell"])
    last = rl.last_run(df, F.col("v") > 0.5, window,
                       time="time", cells=["cell"])
    gf = {r["cell"]: r["first_run"] for r in first.collect()}
    gl = {r["cell"]: r["last_run"] for r in last.collect()}
    for c, flags in truth.items():
        qual = [(s, ln) for s, ln in _runs(flags) if ln >= window]
        wf = base + dt.timedelta(days=qual[0][0]) if qual else None
        wl = base + dt.timedelta(days=qual[-1][0] + qual[-1][1] - 1) \
            if qual else None
        assert gf[c] == wf, (c, window)
        assert gl[c] == wl, (c, window)


@pytest.mark.parametrize("window", [2, 3])
def test_windowed_run_count_monthly_parity(spark, series, window):
    """Same check with freq='MS': runs truncate at month bounds."""
    df, truth = series
    out = rl.windowed_run_count(df, F.col("v") > 0.5, window, freq="MS",
                                time="time", cells=["cell"])
    got = {(r["cell"], r["period"]): r["days"] for r in out.collect()}
    base = dt.date(2000, 1, 1)
    # slice truth by calendar month
    by_month = {}
    for c, flags in truth.items():
        for i, v in enumerate(flags):
            d = base + dt.timedelta(days=i)
            by_month.setdefault((c, d.replace(day=1)), []).append(v)
    for key, flags in by_month.items():
        want = sum(ln for _, ln in _runs(flags) if ln >= window)
        assert got[key] == want, (key, window)


def test_runs_with_holes_parity(spark, series):
    """State machine vs brute-force simulation (start w=2, stop w=3)."""
    df, truth = series
    ws, we = 2, 3
    out = rl.runs_with_holes(df, F.col("v") > 0.5, ws,
                             F.col("v") < 0.5, we,
                             time="time", cells=["cell"])
    got = {}
    for r in out.collect():
        got.setdefault(r["cell"], []).append((r["time"], r["in_event"]))
    for c, flags in truth.items():
        # brute force: signal per row from remaining-run lengths, ffill
        n = len(flags)
        start_runs = _runs(flags)
        stop_runs = _runs([None if v is None else (not v) for v in flags])
        sig = [None] * n
        for s, ln in start_runs:
            for i in range(s, s + ln):
                if (s + ln - i) >= ws:
                    sig[i] = 1
        for s, ln in stop_runs:  # stop wins on ties -> apply after
            for i in range(s, s + ln):
                if (s + ln - i) >= we:
                    sig[i] = 0
        state, want = 0, []
        for v in sig:
            if v is not None:
                state = v
            want.append(state == 1)
        series_got = [b for _, b in sorted(got[c])]
        assert series_got == want, c


def test_season_bounds_parity(spark, series):
    """Fused season automaton vs brute force (start w=3, end after doy 60)."""
    df, truth = series
    w = 3
    out = rl.season_bounds(df, F.col("v") > 0.5, w, mid_doy=61,
                           time="time", cells=["cell"], freq="YS")
    got = {r["cell"]: (r["season_start"], r["season_end"],
                       r["season_length"]) for r in out.collect()}
    base = dt.date(2000, 1, 1)
    for c, flags in truth.items():
        runs = [(s, ln) for s, ln in _runs(flags) if ln >= w]
        ws_ = base + dt.timedelta(days=runs[0][0]) if runs else None
        # end: first >=w anti-run starting at/after doy 61 (index 60)
        anti = [None if v is None else (not v) for v in flags]
        anti_late = [bool(a) and i >= 60 for i, a in enumerate(anti)]
        aruns = [(s, ln) for s, ln in _runs(anti_late) if ln >= w]
        we_ = base + dt.timedelta(days=aruns[0][0]) if aruns else None
        assert got[c][0] == ws_, c
        assert got[c][1] == we_, c
        if ws_ is not None and we_ is not None:
            assert got[c][2] == (we_ - ws_).days, c


def test_run_end_after_date_parity(spark, series):
    """Fused run_end_after_date vs brute force (w=2, date=Feb 15)."""
    df, truth = series
    w = 2
    out = rl.run_end_after_date(df, F.col("v") > 0.5, w, date="02-15",
                                freq="YS", time="time", cells=["cell"],
                                coord="date")
    got = {r["cell"]: r["run_end_after_date"] for r in out.collect()}
    base = dt.date(2000, 1, 1)
    mid_idx = (dt.date(2000, 2, 15) - base).days
    n = DAYS_PER_PERIOD * N_PERIODS
    for c, flags in truth.items():
        beg = [bool(v) and i < mid_idx for i, v in enumerate(flags)]
        begs = [(s, ln) for s, ln in _runs(beg) if ln >= w]
        anti = [(v is not None and not v) and i >= mid_idx
                for i, v in enumerate(flags)]
        ends = [(s, ln) for s, ln in _runs(anti) if ln >= w]
        if not begs:
            want = None
        elif not ends:
            want = base + dt.timedelta(days=n - 1)
        else:
            want = base + dt.timedelta(days=ends[0][0])
        assert got[c] == want, c


@pytest.mark.parametrize("window,reducer", [(1, "max"), (2, "mean"), (3, "sum")])
def test_rle_statistics_parity(spark, series, window, reducer):
    df, truth = series
    out = rl.rle_statistics(df, F.col("v") > 0.5, reducer, window,
                            time="time", cells=["cell"])
    got = {r["cell"]: r["rle_stat"] for r in out.collect()}
    for c, flags in truth.items():
        lens = [ln for _, ln in _runs(flags) if ln >= window]
        if reducer == "max":
            want = max(lens) if lens else 0
        elif reducer == "sum":
            want = sum(lens) if lens else 0
        else:
            want = sum(lens) / len(lens) if lens else 0
        assert got[c] == pytest.approx(want), (c, window, reducer)


def test_windowed_max_run_sum_parity(spark, series):
    df, truth = series
    w = 2
    out = rl.windowed_max_run_sum(df, F.col("v") > 0.5, w, "v",
                                  time="time", cells=["cell"])
    got = {r["cell"]: r["max_run_sum"] for r in out.collect()}
    for c, flags in truth.items():
        # v is 1.0 on True days, so a run's sum equals its length
        sums = [float(ln) for _, ln in _runs(flags) if ln >= w]
        want = max(sums) if sums else 0.0
        assert got[c] == pytest.approx(want), c
