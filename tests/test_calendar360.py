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
    # year 1995 maps to labels 1970/1980/1990, but label 1970 only
    # overlaps the data (1980-2019) by 20 years < window -> pruned by
    # min_length (a "30-year normal" with 20 years of data is not one)
    labs = sorted(
        r["period_label"] for r in
        out.filter(F.year("time") == 1995).collect()
    )
    assert labs == [1980, 1990]
    # group sizes: label 1980 spans 1980-2009 -> 30 rows
    n = out.filter(F.col("period_label") == 1980).count()
    assert n == 30
    # relaxing min_length restores the short edge windows
    labs20 = sorted(
        r["period_label"] for r in
        stack_periods(df, "time", window=30, stride=10, min_length=20)
        .filter(F.year("time") == 1995).collect()
    )
    assert labs20 == [1970, 1980, 1990]


def test_unstack_periods_roundtrip(spark):
    # stack -> unstack must reproduce every original row exactly once
    # (reference unstack_periods, calendar.py:1584-1731: center stride of
    # each window, edges from first/last windows)
    import datetime as dt
    import pytest
    from xclim_spark.calendar import unstack_periods

    rows = [(0, dt.date(1980 + i, 6, 1), float(i)) for i in range(40)]
    df = spark.createDataFrame(rows, "cell INT, time DATE, v DOUBLE")
    st = stack_periods(df, "time", window=30, stride=10)
    back = unstack_periods(st, "time", window=30, stride=10)
    got = sorted((r["time"], r["v"]) for r in back.collect())
    assert got == sorted((r[1], r[2]) for r in rows)
    # window == stride: non-overlapping concat
    st2 = stack_periods(df, "time", window=10, stride=10)
    back2 = unstack_periods(st2, "time", window=10, stride=10)
    assert back2.count() == 40
    # even window/stride ratio is ambiguous, as in the reference
    with pytest.raises(NotImplementedError):
        unstack_periods(st, "time", window=20, stride=10)


def test_unstack_periods_section_ownership(spark):
    # 10 years, window=3 stride=1: interior year y must come from period
    # y-1 (its center); edge years from the first/last periods
    import datetime as dt
    from pyspark.sql import functions as F
    from xclim_spark.calendar import unstack_periods

    rows = [(0, dt.date(1995 + i, 6, 1), float(i)) for i in range(10)]
    df = spark.createDataFrame(rows, "cell INT, time DATE, v DOUBLE")
    st = stack_periods(df, "time", window=3, stride=1)
    tagged = st.withColumn("src", F.col("period_label"))
    # keep the label copy through the unstack filter to assert provenance
    out = unstack_periods(tagged, "time", window=3, stride=1)
    own = {r["time"].year: r["src"] for r in out.collect()}
    assert len(own) == 10
    assert own[1995] == 1995 and own[1996] == 1995          # first period
    assert all(own[y] == y - 1 for y in range(1997, 2003))  # centers
    assert own[2003] == 2002 and own[2004] == 2002          # last period


# ---------------------------------------------------------------------------
# convert_calendar (reference calendar.py:138-361 / xarray semantics)
# ---------------------------------------------------------------------------

def _dates(spark, start, n, var_vals=None):
    import datetime as dt

    y, m, d = map(int, start.split("-"))
    t0 = dt.date(y, m, d)
    rows = [(t0 + dt.timedelta(days=i),
             float(var_vals[i]) if var_vals else float(i))
            for i in range(n)]
    return spark.createDataFrame(rows, "time DATE, v DOUBLE")


def test_convert_standard_to_noleap_drops_feb29(spark):
    from xclim_spark.calendar360 import convert_calendar

    df = _dates(spark, "2000-02-27", 4)  # 2000 is a leap year
    out = convert_calendar(df, "noleap").collect()
    assert len(out) == 3  # Feb 29 dropped
    doys = sorted(r["doy"] for r in out)
    # noleap doys: Feb 27 = 58, Feb 28 = 59, Mar 1 = 60
    assert doys == [58, 59, 60]
    assert all(r["year"] == 2000 for r in out)


def test_convert_noleap_to_standard_roundtrip(spark):
    from xclim_spark.calendar360 import convert_calendar

    df = _dates(spark, "2001-01-01", 365)  # non-leap: lossless
    nl = convert_calendar(df, "noleap")
    back = convert_calendar(nl, "standard", source="noleap")
    orig = {(r["time"], r["v"]) for r in df.collect()}
    got = {(r["time"], r["v"]) for r in back.collect()}
    assert got == orig


def test_convert_standard_to_allleap_keeps_everything(spark):
    from xclim_spark.calendar360 import convert_calendar

    df = _dates(spark, "2001-02-27", 3)  # non-leap year
    out = convert_calendar(df, "all_leap").collect()
    assert len(out) == 3
    doys = sorted(r["doy"] for r in out)
    # all_leap: Feb 27 = 58, Feb 28 = 59, Mar 1 = 61 (Feb 29 = 60 skipped)
    assert doys == [58, 59, 61]


def test_convert_standard_to_360_drops_about_5_days(spark):
    from xclim_spark.calendar360 import convert_calendar

    df = _dates(spark, "2001-01-01", 365)
    out = convert_calendar(df, "360_day", align_on="year").collect()
    assert len(out) == 360
    doys = sorted(r["doy"] for r in out)
    assert doys == list(range(1, 361))  # exactly the full 360 axis


def test_convert_360_to_standard_has_no_duplicates(spark):
    from xclim_spark.calendar360 import convert_calendar

    rows = [(1999, d, float(d)) for d in range(1, 361)]
    df = spark.createDataFrame(rows, "year INT, doy INT, v DOUBLE")
    out = convert_calendar(df, "standard", source="360_day",
                           align_on="year").collect()
    assert len(out) == 360
    times = [r["time"] for r in out]
    assert len(set(times)) == 360
    assert min(times).month == 1 and max(times).month == 12


def test_convert_calendar_missing_fills_gaps(spark):
    from xclim_spark.calendar360 import convert_calendar

    df = _dates(spark, "2000-02-27", 4)
    out = convert_calendar(df, "noleap", missing=-999.0).collect()
    assert len(out) == 365  # full noleap axis
    filled = [r for r in out if r["v"] == -999.0]
    assert len(filled) == 365 - 3


def test_common_calendar_hierarchy():
    from xclim_spark.calendar360 import common_calendar

    assert common_calendar(["360_day", "noleap", "default"],
                           join="outer") == "standard"
    assert common_calendar(["360_day", "noleap", "default"],
                           join="inner") == "360_day"
    assert common_calendar(["all_leap", "standard"]) == "all_leap"


def test_create_ensemble_mixed_calendars(spark):
    from xclim_spark.calendar360 import convert_calendar
    from xclim_spark.ensembles import create_ensemble

    std = _dates(spark, "2001-01-01", 365)
    nl_rows = [(2001, d, float(d)) for d in range(1, 366)]
    nl = spark.createDataFrame(nl_rows, "year INT, doy INT, v DOUBLE")
    ens = create_ensemble([std, nl], calendars=["standard", "noleap"])
    # outer join of {standard, noleap} -> standard: both members become
    # DATE-axis frames; 2001 is non-leap so both keep 365 rows
    rows = ens.collect()
    assert len(rows) == 730
    assert {r["realization"] for r in rows} == {0, 1}
    assert all(r["time"] is not None for r in rows)


def test_decode_cf_offsets_360day(spark):
    """Integer CF day offsets -> (year, doy) in 360_day: pure integer
    algebra, floor semantics for pre-epoch offsets."""
    df = spark.createDataFrame(
        [(o,) for o in [0, 29, 30, 359, 360, -1, -360, 725]],
        "t LONG")
    y, d = c360.decode_cf_offsets("t", "days since 1995-01-01", "360_day")
    rows = {r["t"]: (r["y"], r["d"]) for r in
            df.select("t", y.alias("y"), d.alias("d")).collect()}
    assert rows[0] == (1995, 1)
    assert rows[29] == (1995, 30)     # last day of 360_day January
    assert rows[30] == (1995, 31)     # Feb 1 -> doy 31
    assert rows[359] == (1995, 360)
    assert rows[360] == (1996, 1)
    assert rows[-1] == (1994, 360)    # floor, not truncate-toward-zero
    assert rows[-360] == (1994, 1)
    assert rows[725] == (1997, 6)


def test_decode_cf_offsets_fractional_floor(spark):
    """Fractional CF offsets (midday-centred axes) keep floor-day
    semantics: -0.5 is the last day of 1994, 0.5 is doy 1 of 1995 —
    cast('long') would truncate -0.5 to 0 and land pre-epoch samples on
    the wrong day."""
    df = spark.createDataFrame(
        [(o,) for o in [-0.5, 0.5, 1.5, 359.5, 360.5]], "t DOUBLE")
    y, d = c360.decode_cf_offsets("t", "days since 1995-01-01", "360_day")
    rows = {r["t"]: (r["y"], r["d"]) for r in
            df.select("t", y.alias("y"), d.alias("d")).collect()}
    assert rows[-0.5] == (1994, 360)
    assert rows[0.5] == (1995, 1)
    assert rows[1.5] == (1995, 2)
    assert rows[359.5] == (1995, 360)
    assert rows[360.5] == (1996, 1)


def test_decode_cf_offsets_noleap_midyear_epoch(spark):
    """noleap with a mid-year epoch: 'days since 2000-03-01' starts at
    doy 60 (31+28+1), and years advance every 365 days."""
    df = spark.createDataFrame([(0,), (305,), (306,), (-60,)], "t LONG")
    y, d = c360.decode_cf_offsets("t", "days since 2000-03-01", "noleap")
    rows = {r["t"]: (r["y"], r["d"]) for r in
            df.select("t", y.alias("y"), d.alias("d")).collect()}
    assert rows[0] == (2000, 60)
    assert rows[305] == (2000, 365)
    assert rows[306] == (2001, 1)
    assert rows[-60] == (1999, 365)


def test_decode_cf_offsets_rejects_standard_and_bad_units(spark):
    with pytest.raises(ValueError, match="fixed-length"):
        c360.decode_cf_offsets("t", "days since 2000-01-01", "standard")
    with pytest.raises(ValueError, match="days since"):
        c360.decode_cf_offsets("t", "hours since 2000-01-01", "360_day")
