"""Calendar algebra tests (mirrors reference tests/test_calendar.py style)."""

import pytest

from xclim_spark.calendar import (
    Offset,
    compare_offsets,
    construct_offset,
    is_offset_divisor,
    parse_offset,
)


@pytest.mark.parametrize(
    "freq,expected",
    [
        ("D", Offset(1, "D", True, None)),
        ("MS", Offset(1, "M", True, None)),
        ("M", Offset(1, "M", False, None)),
        ("YS", Offset(1, "Y", True, None)),
        ("YS-JUL", Offset(1, "Y", True, "JUL")),
        ("QS-DEC", Offset(1, "Q", True, "DEC")),
        ("7D", Offset(7, "D", True, None)),
        ("W", Offset(1, "W", True, None)),
        ("AS-SEP", Offset(1, "Y", True, "SEP")),
        ("3MS", Offset(3, "M", True, None)),
    ],
)
def test_parse_offset(freq, expected):
    assert parse_offset(freq) == expected


def test_parse_offset_bad():
    with pytest.raises(ValueError):
        parse_offset("XYZ-FOO")


def test_anchor_month():
    assert parse_offset("YS-JUL").anchor_month == 7
    assert parse_offset("YS").anchor_month == 1
    assert parse_offset("Y").anchor_month == 12


def test_construct_offset_roundtrip():
    for freq in ["MS", "YS-JUL", "QS-DEC", "7D", "W"]:
        o = parse_offset(freq)
        assert parse_offset(construct_offset(o.mult, o.base, o.start, o.anchor)) == o


def test_compare_offsets():
    assert compare_offsets("D", "<", "MS")
    assert compare_offsets("YS", ">", "QS-DEC")
    assert not compare_offsets("MS", ">", "YS")


def test_is_offset_divisor():
    assert is_offset_divisor("D", "MS")
    assert is_offset_divisor("MS", "YS")
    assert not is_offset_divisor("YS", "MS")
    assert not is_offset_divisor("W", "MS")


def test_period_start_values(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("2000-01-15",), ("2000-07-01",), ("2000-06-30",), ("1999-12-31",)],
        "d STRING",
    ).select(F.to_date("d").alias("t"))
    from xclim_spark.calendar import period_start

    rows = df.select(
        period_start("t", "MS").alias("ms"),
        period_start("t", "YS").alias("ys"),
        period_start("t", "YS-JUL").alias("ysjul"),
        period_start("t", "QS-DEC").alias("qsdec"),
        period_start("t", "W").alias("w"),
    ).collect()
    iso = [
        {k: str(r[k]) for k in ("ms", "ys", "ysjul", "qsdec", "w")} for r in rows
    ]
    assert iso[0] == {
        "ms": "2000-01-01", "ys": "2000-01-01", "ysjul": "1999-07-01",
        "qsdec": "1999-12-01", "w": "2000-01-10",
    }
    assert iso[1]["ysjul"] == "2000-07-01"
    assert iso[2]["ysjul"] == "1999-07-01"
    assert iso[3]["qsdec"] == "1999-12-01"
    assert iso[3]["ys"] == "1999-01-01"


def test_select_time_season(spark):
    from pyspark.sql import functions as F

    from xclim_spark.calendar import select_time

    df = spark.createDataFrame(
        [(f"2000-{m:02d}-15",) for m in range(1, 13)], "d STRING"
    ).select(F.to_date("d").alias("t"))
    djf = df.filter(select_time("t", season="DJF")).count()
    assert djf == 3
    mam = df.filter(select_time("t", month=[3, 4, 5])).count()
    assert mam == 3
    doy = df.filter(select_time("t", doy_bounds=(300, 50))).count()  # wrap
    assert doy == 4  # Nov, Dec, Jan, Feb 15ths
    dates = df.filter(select_time("t", date_bounds=("04-10", "06-20"))).count()
    assert dates == 3


def test_doy_days_since_roundtrip(spark):
    from pyspark.sql import functions as F
    from xclim_spark.calendar import doy_to_days_since, days_since_to_doy

    rows = [(2001, 200), (2001, 10), (2000, 366)]
    df = spark.createDataFrame(rows, "year INT, doy INT")
    out = df.select(
        "year", "doy",
        doy_to_days_since("doy", "year", "07-01").alias("ds"),
    )
    got = {(r["year"], r["doy"]): r["ds"] for r in out.collect()}
    # 2001: Jul 1 is doy 182 -> doy 200 = 18 days since
    assert got[(2001, 200)] == 18
    # doy 10 is before Jul 1 -> wraps: 10 - 182 + 365 = 193
    assert got[(2001, 10)] == 193
    # leap year: Jul 1 2000 is doy 183; 366 - 183 = 183
    assert got[(2000, 366)] == 183
    back = out.select(
        "year", days_since_to_doy("ds", "year", "07-01").alias("doy2"), "doy"
    ).collect()
    for r in back:
        assert r["doy2"] == r["doy"]


def test_season_bounds_mid_date(spark):
    from pyspark.sql import functions as F
    from xclim_spark.operators import run_length as rl
    from xclim_spark.testing import timeseries

    # growing season: cond on doy 100..250; mid date 07-01 (doy ~182)
    bits = [1.0 if 100 <= i + 1 <= 250 else 0.0 for i in range(365)]
    df = timeseries(spark, bits, start="2001-01-01")
    out = rl.season_bounds(df, F.col("value") > 0.5, 3, mid_date="07-01",
                           cells=["cell"]).collect()[0]
    assert str(out["season_start"]) == "2001-04-10"   # doy 100
    assert str(out["season_end"]) == "2001-09-08"     # doy 251 (first anti)
    assert out["season_length"] == 151
