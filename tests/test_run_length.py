"""Run-length compiler tests (mirrors reference tests/test_run_length.py)."""

import pytest
from pyspark.sql import functions as F

from xclim_spark.operators import run_length as rl
from xclim_spark.testing import timeseries


def _mask_series(spark, bits, start="2000-01-01"):
    return timeseries(spark, [float(b) for b in bits], start=start)


def _cond():
    return F.col("value") > 0.5


def test_longest_run(spark):
    df = _mask_series(spark, [1, 0, 0, 1, 1, 0, 1, 1, 1, 0, 1])
    out = rl.longest_run(df, _cond(), freq="YS", cells=["cell"]).collect()
    assert out[0]["longest_run"] == 3


def test_longest_run_no_true_rows(spark):
    df = _mask_series(spark, [0, 0, 0])
    out = rl.longest_run(df, _cond(), freq="YS", cells=["cell"]).collect()
    # scaffolded resample: every (cell, period) emits a row, zero-filled
    # (reference resample yields 0 for periods with no qualifying run)
    assert len(out) == 1 and out[0]["longest_run"] == 0


def test_windowed_run_count(spark):
    df = _mask_series(spark, [1, 1, 1, 0, 1, 1, 0, 1, 1, 1, 1])
    out = rl.windowed_run_count(df, _cond(), 3, freq="YS", cells=["cell"]).collect()
    assert out[0]["days"] == 7  # 3 + 4


def test_windowed_run_events(spark):
    df = _mask_series(spark, [1, 1, 1, 0, 1, 1, 0, 1, 1, 1, 1])
    out = rl.windowed_run_events(df, _cond(), 2, freq="YS", cells=["cell"]).collect()
    assert out[0]["events"] == 3


def test_first_run_doy(spark):
    bits = [0] * 10 + [1, 1, 1] + [0] * 5 + [1, 1, 1, 1]
    df = _mask_series(spark, bits)
    out = rl.first_run(df, _cond(), 3, freq="YS", cells=["cell"],
                       coord="doy", alias="d").collect()
    assert out[0]["d"] == 11


def test_rle_stamps_run_lengths(spark):
    df = _mask_series(spark, [1, 1, 0, 1, 1, 1])
    out = rl.rle(df, _cond(), cells=["cell"]).orderBy("time").collect()
    assert [r["run_length"] for r in out] == [2, 2, None, 3, 3, 3]


def test_run_crossing_period_boundary(spark):
    # run spans Dec 30 - Jan 2; with resample_before_rl=True it is split,
    # with False it belongs wholly to the year of its start.
    bits = [1, 1, 1, 1]
    df = _mask_series(spark, bits, start="2000-12-30")
    split = rl.longest_run(df, _cond(), freq="YS", cells=["cell"],
                           resample_before_rl=True).collect()
    by_year = {str(r["period"]): r["longest_run"] for r in split}
    assert by_year == {"2000-01-01": 2, "2001-01-01": 2}
    whole = rl.longest_run(df, _cond(), freq="YS", cells=["cell"],
                           resample_before_rl=False).collect()
    assert {str(r["period"]): r["longest_run"] for r in whole} == {
        "2000-01-01": 4,
        "2001-01-01": 0,  # scaffold: period present in data, no run starts
    }


def test_windowed_max_run_sum(spark):
    df = _mask_series(spark, [1, 1, 0, 1, 1, 1])
    df = df.withColumn("data", F.col("value") * F.dayofmonth("time"))
    out = rl.windowed_max_run_sum(df, _cond(), 2, "data", freq="YS",
                                  cells=["cell"]).collect()
    # runs: days 1-2 (sum 3), days 4-6 (sum 15)
    assert out[0]["max_run_sum"] == 15.0


def test_keep_longest_run(spark):
    df = _mask_series(spark, [1, 1, 0, 1, 1, 1, 0, 1])
    out = rl.keep_longest_run(df, _cond(), cells=["cell"]).orderBy("time").collect()
    assert [int(r["kept"]) for r in out] == [0, 0, 0, 1, 1, 1, 0, 0]


def test_run_bounds(spark):
    df = _mask_series(spark, [0, 1, 1, 0, 1])
    out = rl.run_bounds(df, _cond(), cells=["cell"]).orderBy("run_start").collect()
    assert len(out) == 2
    assert str(out[0]["run_start"]) == "2000-01-02"
    assert str(out[0]["run_end"]) == "2000-01-03"
    assert out[0]["run_length"] == 2


def test_spell_mask_window_sum(spark):
    # 3-day spells where 3-day sum >= 20: values 10,10,10 qualify everywhere
    vals = [1.0, 10.0, 10.0, 10.0, 1.0, 1.0]
    df = timeseries(spark, vals, start="2000-01-01")
    out = rl.spell_mask(df, "value", 3, "sum", ">=", 20.0,
                        cells=["cell"]).orderBy("time").collect()
    flags = [int(r["is_spell"]) for r in out]
    # windows: [1,10,10]=21 hit at idx2 -> covers idx 0..2; [10,10,10]=30 at
    # idx3 -> 1..3; [10,10,1]=21 at idx4 -> 2..4; [10,1,1]=12 no.
    assert flags == [1, 1, 1, 1, 1, 0]


def test_spell_mask_bivariate_all(spark):
    from pyspark.sql import Row

    rows = [
        Row(cell=0, time=f"2000-01-{d:02d}", a=float(a), b=float(b))
        for d, (a, b) in enumerate(
            [(1, 1), (1, 0), (1, 1), (0, 1), (1, 1)], start=1
        )
    ]
    df = spark.createDataFrame(rows).withColumn("time", F.to_date("time"))
    out = rl.spell_mask(df, ["a", "b"], 1, "min", ">=", 1.0, cells=["cell"],
                        var_reducer="all").orderBy("time").collect()
    assert [int(r["is_spell"]) for r in out] == [1, 0, 1, 0, 1]
    out = rl.spell_mask(df, ["a", "b"], 1, "min", ">=", 1.0, cells=["cell"],
                        var_reducer="any").orderBy("time").collect()
    assert [int(r["is_spell"]) for r in out] == [1, 1, 1, 1, 1]


def test_runs_with_holes(spark):
    # start: 2 consecutive >0.5; stop: 2 consecutive <0.5
    bits = [1, 1, 0, 1, 0, 0, 1, 1]
    df = _mask_series(spark, bits)
    out = rl.runs_with_holes(df, _cond(), 2, ~_cond(), 2, cells=["cell"]).orderBy(
        "time"
    ).collect()
    state = [int(r["in_event"]) for r in out]
    # on at idx0 (run of 2), survives single 0 at idx2, off at idx4 (two 0s),
    # on again at idx6
    assert state == [1, 1, 1, 1, 0, 0, 1, 1]


def test_find_events_table(spark):
    bits = [0, 1, 1, 1, 0, 0, 1, 1, 0]
    df = _mask_series(spark, bits)
    out = rl.find_events(df, _cond(), 2, cells=["cell"]).orderBy(
        "event_start"
    ).collect()
    assert len(out) == 2
    e1, e2 = out
    assert str(e1["event_start"]) == "2000-01-02"
    assert e1["event_length"] == 3
    assert e1["event_effective_length"] == 3
    assert str(e2["event_start"]) == "2000-01-07"
    assert e2["event_length"] == 2


def test_season_bounds(spark):
    # growing season: starts with 3 warm days, ends with 3 cold days after
    # midsummer (doy 183)
    bits = [0] * 50 + [1] * 150 + [0] * 100 + [1, 1] + [0] * 64
    df = _mask_series(spark, bits)
    out = rl.season_bounds(df, _cond(), 3, mid_doy=183, cells=["cell"]).collect()
    assert len(out) == 1
    r = out[0]
    assert str(r["season_start"]) == "2000-02-20"  # doy 51
    assert str(r["season_end"]) == "2000-07-19"  # first 3-day cold run >= doy 183
    assert r["season_length"] == 150


# ---------------------------------------------------------------------------
# last_run + date-bounded searches (reference tests/test_run_length.py
# TestLastRun:384-420, TestRunEndAfterDate-family :495-580)
# ---------------------------------------------------------------------------

def test_last_run_simple(spark):
    # ref TestLastRun.test_simple: zeros with t[30:40]=2 -> last run end is
    # 2000-02-09 (doy 40)
    bits = [0] * 60
    for i in range(30, 40):
        bits[i] = 1
    df = _mask_series(spark, bits)
    out = rl.last_run(df, _cond(), 1, freq="YS", cells=["cell"],
                      coord="doy").collect()
    assert out[0]["last_run"] == 40
    out = rl.last_run(df, _cond(), 1, freq="YS", cells=["cell"],
                      coord="date").collect()
    assert str(out[0]["last_run"]) == "2000-02-09"


def _run_series(spark, start_idx, end_idx, n=360):
    bits = [0] * n
    for i in range(start_idx, end_idx):
        bits[i] = 1
    return _mask_series(spark, bits)


@pytest.mark.parametrize("date,end,expected", [
    ("07-01", 210, 211),
    ("04-01", 150, None),   # date falls before the run begins
    ("11-01", 150, 306),    # run ends before date -> period fallback?  no:
                            # anti-run after date starts at the date itself
])
def test_run_end_after_date(spark, date, end, expected):
    df = _run_series(spark, 140, end)
    out = rl.run_end_after_date(df, _cond(), 1, date=date, freq="YS",
                                cells=["cell"], coord="doy").collect()
    assert out[0]["run_end_after_date"] == expected


@pytest.mark.parametrize("date,beg,expected", [
    ("07-01", 210, 211),
    ("04-01", None, None),  # no run at all
    ("11-01", 150, 306),    # run already started -> restarts at date
])
def test_first_run_after_date(spark, date, beg, expected):
    bits = [0] * 365
    if beg:
        for i in range(beg, 365):
            bits[i] = 1
    df = _mask_series(spark, bits)
    out = rl.first_run_after_date(df, _cond(), 1, date=date, freq="YS",
                                  cells=["cell"], coord="doy").collect()
    assert out[0]["first_run_after_date"] == expected


@pytest.mark.parametrize("date,end,expected", [
    ("07-01", 210, 183),
    ("04-01", 150, None),   # run begins after the date
    ("11-01", 150, 150),
])
def test_last_run_before_date(spark, date, end, expected):
    df = _run_series(spark, 140, end)
    out = rl.last_run_before_date(df, _cond(), 1, date=date, freq="YS",
                                  cells=["cell"], coord="doy").collect()
    assert out[0]["last_run_before_date"] == expected


def test_first_run_before_date(spark):
    # run starting doy 141; looking before 07-01 finds it, before 04-01
    # does not
    df = _run_series(spark, 140, 210)
    out = rl.first_run_before_date(df, _cond(), 1, date="07-01", freq="YS",
                                   cells=["cell"], coord="doy").collect()
    assert out[0]["first_run_before_date"] == 141
    out = rl.first_run_before_date(df, _cond(), 1, date="04-01", freq="YS",
                                   cells=["cell"], coord="doy").collect()
    assert out[0]["first_run_before_date"] is None


def test_suspicious_run(spark):
    import datetime as dt

    rows = []
    vals = [1.0, 5.0, 5.0, 5.0, 5.0, 2.0, 3.0, 3.0, 9.0, 9.0, 9.0, 9.0]
    for i, v in enumerate(vals):
        rows.append((1, dt.date(2000, 1, 1) + dt.timedelta(days=i), v))
    df = spark.createDataFrame(rows, "cell INT, time DATE, v DOUBLE")
    out = rl.suspicious_run(df, "v", window=4, time="time", cells=["cell"])
    got = [r["suspicious"] for r in out.orderBy("time").collect()]
    # runs: 1x1, 5x4, 2x1, 3x2, 9x4 -> the 5-run and 9-run are flagged
    assert got == [False, True, True, True, True, False, False, False,
                   True, True, True, True]
    # thresh restricts to runs of values > 6 -> only the 9-run
    out2 = rl.suspicious_run(df, "v", window=4, thresh=6.0,
                             time="time", cells=["cell"])
    got2 = [r["suspicious"] for r in out2.orderBy("time").collect()]
    assert got2 == [False] * 8 + [True] * 4


def test_rle_statistics_quantile_reducer(spark):
    import datetime as dt

    rows = []
    # cell 1: runs of lengths 2, 3, 5 (separated by False days)
    day = dt.date(2000, 1, 1)
    pattern = [1, 1, 0, 1, 1, 1, 0, 1, 1, 1, 1, 1, 0]
    for i, p in enumerate(pattern):
        rows.append((1, day + dt.timedelta(days=i), float(p)))
    df = spark.createDataFrame(rows, "cell INT, time DATE, v DOUBLE")
    out = rl.rle_statistics(df, F.col("v") > 0.5, "q50", 1,
                            time="time", cells=["cell"]).collect()
    assert out[0]["rle_stat"] == 3.0  # median of run lengths {2, 3, 5}


def test_spell_mask_min_gap_merges_short_breaks(spark):
    """min_gap merging (ref generic.py:537-538): gaps shorter than
    min_gap between spells are absorbed into one spell."""
    from pyspark.sql import functions as F

    from xclim_spark.operators import run_length as rl
    from xclim_spark.testing import timeseries

    # mask: T T F T T F F T -> with min_gap=2 the single-day gap fills
    d = timeseries(spark, [5.0, 5.0, 0.0, 5.0, 5.0, 0.0, 0.0, 5.0],
                   start="2000-01-01")
    out = rl.spell_mask(d, "value", 1, "min", ">", 1.0, cells=["cell"],
                        min_gap=2).orderBy("time").collect()
    assert [r["is_spell"] for r in out] == [
        True, True, True, True, True, False, False, True]

    # and through spell_length_statistics: longest merged spell = 5
    st = rl.spell_length_statistics(
        d, "value", 1, "min", ">", 1.0, "max", "YS", cells=["cell"],
        min_gap=2, alias="sl").collect()
    assert st[0]["sl"] == 5
    st1 = rl.spell_length_statistics(
        d, "value", 1, "min", ">", 1.0, "max", "YS", cells=["cell"],
        alias="sl").collect()
    assert st1[0]["sl"] == 2  # without merging
