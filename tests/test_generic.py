"""Generic operator tests on deterministic synthetic series
(mirrors reference tests/test_generic.py + test_temperature.py style:
inject a known feature, assert the exact count/value)."""

import pytest
from pyspark.sql import functions as F

from xclim_spark.operators import generic as g
from xclim_spark.testing import timeseries


def test_threshold_count_exact(spark):
    # 10 qualifying days injected into a 60-day series (CSDI-style assert)
    values = [20.0] * 60
    for i in range(15, 25):
        values[i] = 35.0
    df = timeseries(spark, values, start="2000-01-01")
    out = g.threshold_count(df, "value", ">", 30.0, "YS", cells=["cell"],
                            alias="n").collect()
    assert len(out) == 1
    assert out[0]["n"] == 10


def test_threshold_count_ops(spark):
    df = timeseries(spark, [1.0, 2.0, 3.0, 4.0], start="2000-01-01")
    for op, expect in [(">", 2), (">=", 3), ("<", 1), ("<=", 2), ("ge", 3)]:
        out = g.threshold_count(df, "value", op, 2.0, "YS", cells=["cell"],
                                alias="n").collect()
        assert out[0]["n"] == expect, op


def test_get_op_invalid():
    with pytest.raises(ValueError):
        g.get_op("!!")


def test_domain_count(spark):
    df = timeseries(spark, [5.0, 10.0, 15.0, 20.0, 25.0], start="2000-01-01")
    out = g.domain_count(df, "value", 10.0, 20.0, "YS", cells=["cell"],
                         alias="n").collect()
    # (10, 20] -> 15 and 20
    assert out[0]["n"] == 2


def test_resample_mean_monthly(spark):
    # Jan = 31 days of 1.0, Feb = 29 days (2000 leap) of 3.0
    values = [1.0] * 31 + [3.0] * 29
    df = timeseries(spark, values, start="2000-01-01")
    out = {
        str(r["period"]): r["m"]
        for r in g.select_resample_op(df, "value", "mean", "MS",
                                      cells=["cell"], alias="m").collect()
    }
    assert out == {"2000-01-01": 1.0, "2000-02-01": 3.0}


def test_resample_sum_anchored_year(spark):
    # 400 days from 2000-01-01; YS-JUL splits at 2000-07-01 (day index 182)
    values = [1.0] * 400
    df = timeseries(spark, values, start="2000-01-01")
    out = {
        str(r["period"]): r["s"]
        for r in g.select_resample_op(df, "value", "sum", "YS-JUL",
                                      cells=["cell"], alias="s").collect()
    }
    assert out["1999-07-01"] == 182.0
    assert out["2000-07-01"] == 218.0


def test_doymax(spark):
    values = [10.0] * 40
    values[25] = 99.0  # doy 26
    df = timeseries(spark, values, start="2000-01-01")
    out = g.select_resample_op(df, "value", "doymax", "YS", cells=["cell"],
                               alias="d").collect()
    assert out[0]["d"] == 26


def test_doymax_tie_earliest(spark):
    values = [10.0, 99.0, 5.0, 99.0, 1.0]
    df = timeseries(spark, values, start="2000-01-01")
    out = g.select_resample_op(df, "value", "doymax", "YS", cells=["cell"],
                               alias="d").collect()
    assert out[0]["d"] == 2  # first of the tied maxima


def test_temperature_sum_directions(spark):
    df = timeseries(spark, [8.0, 12.0, 15.0], start="2000-01-01")
    above = g.temperature_sum(df, "value", ">", 10.0, "YS", cells=["cell"],
                              alias="dd").collect()[0]["dd"]
    assert above == pytest.approx(7.0)  # (12-10)+(15-10)
    below = g.temperature_sum(df, "value", "<", 10.0, "YS", cells=["cell"],
                              alias="dd").collect()[0]["dd"]
    assert below == pytest.approx(2.0)  # -(8-10)


def test_rolling_resample_min_periods(spark):
    values = [float(i) for i in range(10)]
    df = timeseries(spark, values, start="2000-01-01")
    out = g.select_rolling_resample_op(
        df, "value", "max", "YS", window=3, window_op="mean",
        cells=["cell"], alias="m",
    ).collect()
    # rolling mean of last 3 at the end: (7+8+9)/3 = 8; first 2 rows NULL
    assert out[0]["m"] == pytest.approx(8.0)


def test_get_daily_events_null_propagation(spark):
    df = timeseries(spark, [1.0, None, 5.0], start="2000-01-01")
    out = df.select(g.get_daily_events("value", ">", 2.0).alias("e")).collect()
    assert [r["e"] for r in out] == [0, None, 1]


def test_get_zones(spark):
    df = timeseries(spark, [-5.0, 0.0, 9.9, 10.0, 49.9, 50.0, 99.0],
                    start="2000-01-01")
    out = df.select(g.get_zones("value", 0.0, 50.0, 10.0).alias("z")).collect()
    assert [r["z"] for r in out] == [0, 1, 1, 2, 5, 6, 6]


def test_thresholded_statistics(spark):
    df = timeseries(spark, [1.0, 30.0, 40.0, 2.0], start="2000-01-01")
    out = g.thresholded_statistics(df, "value", "mean", ">", 20.0, "YS",
                                   cells=["cell"], alias="m").collect()
    assert out[0]["m"] == pytest.approx(35.0)


def test_cumulative_difference_running(spark):
    df = timeseries(spark, [12.0, 8.0, 14.0], start="2000-01-01")
    out = g.cumulative_difference(df, "value", ">", 10.0, freq=None,
                                  cells=["cell"]).orderBy("time").collect()
    assert [r["cumulative_difference"] for r in out] == [2.0, 2.0, 6.0]


def test_aggregate_between_dates(spark):
    values = [1.0] * 100
    df = timeseries(spark, values, start="2000-01-01")
    out = g.aggregate_between_dates(df, "value", "sum", start_doy=10,
                                    end_doy=19, cells=["cell"],
                                    alias="s").collect()
    assert out[0]["s"] == 10.0


def test_callable_reducer(spark):
    df = timeseries(spark, [1.0, 2.0, 3.0], start="2000-01-01")
    out = g.select_resample_op(df, "value", lambda c: F.max(c) - F.min(c),
                               "YS", cells=["cell"], alias="range").collect()
    assert out[0]["range"] == 2.0


def test_detrend_removes_linear_trend(spark):
    import numpy as np
    from xclim_spark.operators.generic import detrend

    # y = 3 + 0.5*i + seasonal wiggle -> detrended removes exactly the
    # OLS line; residual of a pure line is ~0
    n = 200
    vals = [3.0 + 0.5 * i for i in range(n)]
    df = timeseries(spark, vals, start="2000-01-01")
    out = detrend(df, "value", cells=["cell"], alias="resid")
    res = np.array([r["resid"] for r in out.collect()])
    assert np.abs(res).max() < 1e-8
    # line + sine: residual is the sine (zero-mean, slope-free)
    vals2 = [3.0 + 0.5 * i + 2.0 * np.sin(i / 7.0) for i in range(n)]
    df2 = timeseries(spark, vals2, start="2000-01-01")
    out2 = detrend(df2, "value", cells=["cell"], alias="resid")
    res2 = np.array([r["resid"] for r in out2.orderBy("time").collect()])
    assert abs(res2.mean()) < 1e-9
    # no residual trend: OLS slope of residual ~ 0
    t = np.arange(n)
    slope = np.polyfit(t, res2, 1)[0]
    assert abs(slope) < 1e-10


def test_count_level_crossings(spark):
    from xclim_spark.operators import generic as g
    from xclim_spark.testing import timeseries

    d = timeseries(spark, [5.0, 8.0, 12.0, 20.0], start="2000-01-01")
    d = d.withColumn("hi", F.col("value") + 6.0)
    # level 10: low<10 while hi>=10 -> days with 4<value<10 -> 5.0, 8.0
    out = g.count_level_crossings(d, "value", "hi", 10.0, "YS",
                                  cells=["cell"], alias="n").collect()
    assert out[0]["n"] == 2


def test_first_last_occurrence(spark):
    from xclim_spark.operators import generic as g
    from xclim_spark.testing import timeseries

    d = timeseries(spark, [1.0, 9.0, 3.0, 9.5, 2.0], start="2000-01-01")
    f = g.first_occurrence(d, "value", ">", 8.0, "YS", cells=["cell"],
                           alias="doy").collect()
    l = g.last_occurrence(d, "value", ">", 8.0, "YS", cells=["cell"],
                          alias="doy").collect()
    assert f[0]["doy"] == 2 and l[0]["doy"] == 4
    # condition never met -> null, matching the reference's NaN
    f2 = g.first_occurrence(d, "value", ">", 99.0, "YS", cells=["cell"],
                            alias="doy").collect()
    assert f2[0]["doy"] is None


def test_first_last_occurrence_anchored_freq(spark):
    """On YS-JUL the period spans the year boundary: the chronological
    first event (Dec, doy ~350) must win over a later January event
    (doy ~5) even though its doy is larger."""
    import datetime as dt
    from xclim_spark.operators import generic as g

    rows = [
        (0, dt.date(2000, 12, 15), 9.0),   # doy 350 — chronologically first
        (0, dt.date(2001, 1, 5), 9.0),     # doy 5
        (0, dt.date(2001, 3, 1), 9.0),     # doy 60 — chronologically last
        (0, dt.date(2000, 8, 1), 1.0),     # below thresh
    ]
    d = spark.createDataFrame(rows, "cell INT, time DATE, value DOUBLE")
    f = g.first_occurrence(d, "value", ">", 8.0, "YS-JUL", cells=["cell"],
                           alias="doy").collect()
    l = g.last_occurrence(d, "value", ">", 8.0, "YS-JUL", cells=["cell"],
                          alias="doy").collect()
    assert f[0]["doy"] == 350
    assert l[0]["doy"] == 60


def test_count_level_crossings_validates_ops(spark):
    import pytest as _pytest
    from xclim_spark.operators import generic as g
    from xclim_spark.testing import timeseries

    d = timeseries(spark, [5.0, 8.0], start="2000-01-01")
    d = d.withColumn("hi", F.col("value") + 6.0)
    with _pytest.raises(ValueError, match="op_low"):
        g.count_level_crossings(d, "value", "hi", 10.0, "YS",
                                cells=["cell"], op_low=">")
    with _pytest.raises(ValueError, match="op_high"):
        g.count_level_crossings(d, "value", "hi", 10.0, "YS",
                                cells=["cell"], op_high="<=")
