"""Missing-mask tests (mirrors reference tests/test_missing.py)."""

import pytest

from xclim_spark.operators import missing as miss
from xclim_spark.testing import timeseries


def _january(spark, drop_days=(), null_days=()):
    values = [1.0] * 31
    vals = [None if (i + 1) in null_days else v for i, v in enumerate(values)]
    df = timeseries(spark, vals, start="2000-01-01")
    if drop_days:
        from pyspark.sql import functions as F

        df = df.filter(~F.dayofmonth("time").isin(list(drop_days)))
    return df


def test_missing_any_complete(spark):
    df = _january(spark)
    out = miss.missing_any(df, "value", "MS", cells=["cell"]).collect()
    assert out[0]["is_missing"] is False


def test_missing_any_absent_row(spark):
    df = _january(spark, drop_days=(5,))
    out = miss.missing_any(df, "value", "MS", cells=["cell"]).collect()
    assert out[0]["is_missing"] is True


def test_missing_any_null_value(spark):
    df = _january(spark, null_days=(7,))
    out = miss.missing_any(df, "value", "MS", cells=["cell"]).collect()
    assert out[0]["is_missing"] is True


def test_missing_pct(spark):
    df = _january(spark, drop_days=(1, 2, 3))  # 3/31 ~ 9.7%
    ok = miss.missing_pct(df, "value", "MS", 0.15, cells=["cell"]).collect()
    assert ok[0]["is_missing"] is False
    strict = miss.missing_pct(df, "value", "MS", 0.05, cells=["cell"]).collect()
    assert strict[0]["is_missing"] is True


def test_missing_at_least_n(spark):
    df = _january(spark, drop_days=tuple(range(16, 32)))  # 15 days left
    ok = miss.missing_at_least_n(df, "value", "MS", 10, cells=["cell"]).collect()
    assert ok[0]["is_missing"] is False
    strict = miss.missing_at_least_n(df, "value", "MS", 20,
                                     cells=["cell"]).collect()
    assert strict[0]["is_missing"] is True


def test_missing_wmo_consecutive(spark):
    # 4 missing days scattered: passes nm=11 and nc=5
    df = _january(spark, drop_days=(3, 10, 17, 24))
    out = miss.missing_wmo(df, "value", "MS", cells=["cell"]).collect()
    assert out[0]["is_missing"] is False
    # 5 consecutive missing: fails nc=5 even though total <= 11
    df = _january(spark, drop_days=(10, 11, 12, 13, 14))
    out = miss.missing_wmo(df, "value", "MS", cells=["cell"]).collect()
    assert out[0]["is_missing"] is True
    # missing run at the period head is caught too
    df = _january(spark, drop_days=(1, 2, 3, 4, 5))
    out = miss.missing_wmo(df, "value", "MS", cells=["cell"]).collect()
    assert out[0]["is_missing"] is True
    # and at the tail
    df = _january(spark, drop_days=(27, 28, 29, 30, 31))
    out = miss.missing_wmo(df, "value", "MS", cells=["cell"]).collect()
    assert out[0]["is_missing"] is True


def test_mask_missing_nulls_out(spark):
    from xclim_spark.operators import generic as g

    df = _january(spark, drop_days=(5,))
    res = g.select_resample_op(df, "value", "mean", "MS", cells=["cell"],
                               alias="m")
    m = miss.missing_any(df, "value", "MS", cells=["cell"])
    out = miss.mask_missing(res, m, ["m"], keys=["cell", "period"]).collect()
    assert out[0]["m"] is None


def test_missing_two_steps_rollup(spark):
    """WMO-style rollup: invalid month poisons its year (reference
    MissingTwoSteps, missing.py:338-391)."""
    from xclim_spark.operators import missing as miss

    # 1999: all 365 days present; 2000: missing 20 days in March
    vals = []
    import datetime as dt

    days = []
    d = dt.date(1999, 1, 1)
    while d <= dt.date(2000, 12, 31):
        if not (d.year == 2000 and d.month == 3 and d.day <= 20):
            days.append(d)
        d += dt.timedelta(days=1)
    df = spark.createDataFrame([(0, d, 1.0) for d in days],
                               "cell INT, time DATE, value DOUBLE")
    monthly = miss.missing_any(df, "value", "MS", cells=["cell"])
    yearly = miss.missing_two_steps(monthly, "YS", "MS", cells=["cell"])
    got = {r["period"].year: r["is_missing"] for r in yearly.collect()}
    assert got[1999] is False
    assert got[2000] is True


def test_register_missing_method(spark):
    from xclim_spark.operators import missing as miss

    @miss.register_missing_method("never")
    def missing_never(df, var, freq, *, time="time", cells=(),
                      src_freq="D"):
        from pyspark.sql import functions as F
        from xclim_spark.calendar import period_start

        return (
            df.withColumn("period", period_start(time, freq))
            .groupBy(*cells, "period")
            .agg(F.lit(False).alias("is_missing"))
        )

    assert "never" in miss.MISSING_METHODS
    # usable through the indicator layer's missing hook
    from xclim_spark.indicators import atmos
    from xclim_spark.testing import timeseries

    vals = [20.0] * 5  # short month -> "any" would mask; "never" keeps
    df = timeseries(spark, vals, start="2000-01-01")
    res = atmos.tg_mean(df, tas="value", freq="MS", cells=["cell"],
                        missing="never")
    assert res.df.collect()[0]["tg_mean"] == 20.0


def test_weighted_spell_mask_mean_and_reject(spark):
    import pytest
    from pyspark.sql import functions as F
    from xclim_spark.operators import run_length as rl
    from xclim_spark.testing import timeseries

    vals = [1.0, 2.0, 3.0, 4.0, 5.0]
    df = timeseries(spark, vals, start="2000-01-01")
    # weighted mean over window 2 with weights (1, 3): day i value =
    # (v[i-1]*1 + v[i]*3)/4
    out = rl.spell_mask(df, ["value"], 2, "mean", ">", 3.0,
                        weights=[1.0, 3.0], cells=["cell"])
    rows = out.orderBy("time").collect()
    # rolling weighted means: day2=(1+2*3)/4=1.75, day3=2.75, day4=3.75,
    # day5=4.75 -> cond days 4,5 -> spell mask marks days in spells
    assert sum(1 for r in rows if r["is_spell"]) >= 2
    with pytest.raises(ValueError):
        rl.spell_mask(df, ["value"], 2, "max", ">", 3.0,
                      weights=[1.0, 3.0], cells=["cell"])


def test_missing_some_but_not_all(spark):
    # Jan: full 31 valid -> valid; Feb: 10 of 28 -> missing;
    # Mar: 31 rows all NULL -> valid (all-missing periods pass)
    import datetime as dt

    rows = []
    for d in range(31):
        rows.append(("c", dt.date(2001, 1, 1) + dt.timedelta(d), 1.0))
    for d in range(10):
        rows.append(("c", dt.date(2001, 2, 1) + dt.timedelta(d), 1.0))
    for d in range(31):
        rows.append(("c", dt.date(2001, 3, 1) + dt.timedelta(d), None))
    df = spark.createDataFrame(rows, "cell string, time date, v double")
    out = {str(r["period"]): r["is_missing"] for r in
           miss.missing_some_but_not_all(
               df, "v", "MS", cells=["cell"]).collect()}
    assert out["2001-01-01"] is False
    assert out["2001-02-01"] is True
    assert out["2001-03-01"] is False


def test_expected_count_subdaily(spark):
    """Calendar-exact denominators for sub-daily sources (reference
    core/missing.py:64-160 src_timestep): hourly February (leap and
    non-leap), 6-hourly month, minutes inside an hourly target."""
    import datetime as dt

    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(dt.date(2001, 2, 1),), (dt.date(2004, 2, 1),),
         (dt.date(2001, 1, 1),)], "period DATE")
    got = df.select(
        "period",
        miss.expected_count("period", "MS", "h").alias("hourly"),
        miss.expected_count("period", "MS", "6h").alias("sixh"),
        miss.expected_count("period", "YS", "h").alias("hourly_y"),
        miss.expected_count("period", "MS", "30min").alias("halfhour"),
    ).collect()
    by = {str(r["period"]): r for r in got}
    assert by["2001-02-01"]["hourly"] == 28 * 24
    assert by["2004-02-01"]["hourly"] == 29 * 24
    assert by["2001-02-01"]["sixh"] == 28 * 4
    assert by["2001-01-01"]["hourly_y"] == 365 * 24
    assert by["2004-02-01"]["hourly_y"] == 366 * 24
    assert by["2001-01-01"]["halfhour"] == 31 * 48

    # hourly steps in a sub-daily target period
    row = df.select(
        miss.expected_count("period", "6h", "h").alias("n"),
        miss.expected_count("period", "6h", "30min").alias("m"),
    ).collect()[0]
    assert row["n"] == 6 and row["m"] == 12

    # weekly source only aligns with weekly targets
    row = df.select(
        miss.expected_count("period", "W", "W").alias("w")).collect()[0]
    assert row["w"] == 1
    with pytest.raises(NotImplementedError):
        miss.expected_count("period", "MS", "W")
    with pytest.raises(NotImplementedError):
        miss.expected_count("period", "MS", "7h")  # does not divide a day
    with pytest.raises(NotImplementedError):
        miss.missing_wmo(df, "period", "YS", src_freq="h")


def test_missing_any_hourly(spark):
    """missing_any with src_freq='h': a day with 23 of 24 hours present
    flags, a complete day does not."""
    import datetime as dt

    rows = []
    for h in range(24):
        rows.append(("c", dt.datetime(2001, 1, 1, h), 1.0))
    for h in range(23):  # Jan 2 is short one hour
        rows.append(("c", dt.datetime(2001, 1, 2, h), 1.0))
    df = spark.createDataFrame(rows, "cell string, time timestamp, v double")
    out = {str(r["period"]): r["is_missing"] for r in
           miss.missing_any(df, "v", "D", cells=["cell"],
                            src_freq="h").collect()}
    assert out["2001-01-01"] is False
    assert out["2001-01-02"] is True
