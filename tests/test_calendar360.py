"""Non-standard calendar + time_bnds + stack_periods tests."""

import pytest
from pyspark.sql import functions as F

from xclim_spark import calendar360 as c360
from xclim_spark.calendar import time_bnds, stack_periods
from xclim_spark.testing import timeseries


def _yd(spark, pairs):
    return spark.createDataFrame(pairs, "year INT, doy INT")


def test_month_day_from_doy_360(spark):
    df = _yd(spark, [(2000, 1), (2000, 30), (2000, 31), (2000, 360)])
    out = df.select(
        c360.month_from_doy("doy", "360_day").alias("m"),
        c360.day_from_doy("doy", "360_day").alias("d"),
    ).collect()
    assert [(r["m"], r["d"]) for r in out] == [
        (1, 1), (1, 30), (2, 1), (12, 30)]


def test_month_day_from_doy_noleap(spark):
    df = _yd(spark, [(2000, 1), (2000, 31), (2000, 32), (2000, 59),
                     (2000, 60), (2000, 365)])
    out = df.select(
        c360.month_from_doy("doy", "noleap").alias("m"),
        c360.day_from_doy("doy", "noleap").alias("d"),
    ).collect()
    assert [(r["m"], r["d"]) for r in out] == [
        (1, 1), (1, 31), (2, 1), (2, 28), (3, 1), (12, 31)]


def test_period_key_resample_360(spark):
    # a full 360-day year: MS resample gives 12 months x 30 days
    rows = [(2000, d, 1.0) for d in range(1, 361)]
    df = spark.createDataFrame(rows, "year INT, doy INT, v DOUBLE")
    out = (
        df.withColumn("pk", c360.period_key("year", "doy", "MS", "360_day"))
        .groupBy("pk").agg(F.count("*").alias("n"), F.sum("v").alias("s"))
        .collect()
    )
    assert len(out) == 12
    assert all(r["n"] == 30 for r in out)
    assert min(r["pk"] for r in out) == 20000101
    assert max(r["pk"] for r in out) == 20001201


def test_convert_doy_between_calendars(spark):
    df = _yd(spark, [(2000, 59), (2000, 60), (2000, 90), (2000, 360)])
    # 360_day -> noleap: (m=2,d=29)->Feb 28 clamp -> 59; (m=2,d=30)->59;
    # (m=3,d=30)->31+28+30=89; (m=12,d=30)->334+30=364
    out = df.select(
        c360.convert_doy_calendar("doy", "360_day", "noleap").alias("c")
    ).collect()
    assert [r["c"] for r in out] == [59, 59, 89, 364]
    # noleap -> 360_day: Feb 28 (59) -> (2,28) -> 58; Dec 31 -> day 31
    # clamps to 30 -> 360
    df2 = _yd(spark, [(2000, 59), (2000, 365)])
    out2 = df2.select(
        c360.convert_doy_calendar("doy", "noleap", "360_day").alias("c")
    ).collect()
    assert [r["c"] for r in out2] == [58, 360]


def test_time_bnds(spark):
    df = timeseries(spark, [1.0], start="2000-03-01")
    out = df.select(
        time_bnds(F.to_date("time"), "MS").alias("b"),
        time_bnds(F.trunc("time", "year"), "YS").alias("y"),
        time_bnds(F.to_date("time"), "QS").alias("q"),
    ).collect()[0]
    assert str(out["b"]["start"]) == "2000-03-01"
    assert str(out["b"]["end"]) == "2000-03-31"
    assert str(out["y"]["end"]) == "2000-12-31"
    assert str(out["q"]["end"]) == "2000-05-31"


def test_stack_periods(spark):
    # 40 years of one point per year; window=30 stride=10 -> each year in
    # up to 3 period labels
    import datetime as dt

    rows = [(0, dt.date(1980 + i, 6, 1), float(i)) for i in range(40)]
    df = spark.createDataFrame(rows, "cell INT, time DATE, v DOUBLE")
    out = stack_periods(df, "time", window=30, stride=10)
    # year 1995 belongs to labels 1970, 1980, 1990
    labs = sorted(
        r["period_label"] for r in
        out.filter(F.year("time") == 1995).collect()
    )
    assert labs == [1970, 1980, 1990]
    # group sizes: label 1980 spans 1980-2009 -> 30 rows
    n = out.filter(F.col("period_label") == 1980).count()
    assert n == 30
