"""Agro kernel tests: Utah chill units mapping, Dynamic Model behavior."""

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from xclim_spark.operators import agro


def test_chill_units_mapping(spark):
    temps = [0.0, 2.0, 5.0, 10.0, 14.0, 17.0, 25.0, None]
    df = spark.createDataFrame([(t,) for t in temps], "t DOUBLE")
    out = [r["cu"] for r in
           df.select(agro.chill_units("t").alias("cu")).collect()]
    assert out == [0.0, 0.5, 1.0, 0.5, 0.0, -0.5, -1.0, None]


def test_chill_portions_1d_accumulates_in_cold():
    # ~6 degC (optimal chilling) for 2000 hours accumulates plenty of
    # portions; constant 25 degC accumulates none
    cold = np.full(2000, 279.15)
    hot = np.full(2000, 298.15)
    cp_cold = agro.chill_portions_1d(cold)
    cp_hot = agro.chill_portions_1d(hot)
    assert cp_cold > 50
    assert cp_hot == pytest.approx(0.0, abs=1e-6)
    # roughly one portion every ~28 h at optimum (published behaviour of
    # the Dynamic Model): sanity band
    assert 50 < cp_cold < 120


def test_chill_portions_spark_matches_kernel(spark):
    rng = np.random.RandomState(5)
    base = dt.datetime(2000, 11, 1)
    temps = 277.0 + 4.0 * rng.rand(500)
    rows = [(1, base + dt.timedelta(hours=i), float(t))
            for i, t in enumerate(temps)]
    df = spark.createDataFrame(rows, "cell INT, time TIMESTAMP, tas DOUBLE")
    out = agro.chill_portions(df, "tas", "YS", cells=["cell"]).collect()
    assert len(out) == 1
    expect = agro.chill_portions_1d(temps)
    assert out[0]["chill_portions"] == pytest.approx(expect, rel=1e-12)


def _rain_year(spark, wet=(10.0, 10.0, 10.0), drizzle=2.0,
               dry_from="2001-10-20"):
    """One cell, year 2001: dry Jan-May 9, 3 wet days May 10-12,
    drizzle through Oct 19, bone-dry after."""
    days = [dt.date(2001, 1, 1) + dt.timedelta(d) for d in range(365)]
    wet_days = {dt.date(2001, 5, 10 + i): w for i, w in enumerate(wet)}
    dry_start = dt.date.fromisoformat(dry_from)
    rows = []
    for d in days:
        if d in wet_days:
            p = wet_days[d]
        elif dt.date(2001, 5, 10 + len(wet)) <= d < dry_start:
            p = drizzle
        else:
            p = 0.0
        rows.append(("c1", d, p))
    return spark.createDataFrame(rows, "cell string, time date, pr double")


def test_rain_season_start_end_length(spark):
    # ref _agro.py:796-981 semantics: start = first day of a 3-day >=25mm
    # wet spell (May 12, doy 132) followed by 30 days without a 7-day dry
    # run; end = first >=20-day dry run after the start in [09-01, 12-31]
    # (Oct 20, doy 293); length = end - start = 161 days.
    df = _rain_year(spark)
    out = agro.rain_season(df, "pr", cells=["cell"]).collect()
    assert len(out) == 1
    r = out[0]
    assert r["rain_season_start"] == 132.0
    assert r["rain_season_end"] == 293.0
    assert r["rain_season_length"] == 161.0


def test_rain_season_no_start_when_wet_spell_too_small(spark):
    # 3-day accumulation 15 mm < 25 mm: no season at all
    df = _rain_year(spark, wet=(5.0, 5.0, 5.0))
    r = agro.rain_season(df, "pr", cells=["cell"]).collect()[0]
    assert r["rain_season_start"] is None
    assert r["rain_season_length"] is None


def test_rain_season_dry_run_vetoes_start(spark):
    # a 7-day dry run right after the wet spell (drizzle=0.5 <= 1.0 mm)
    # kills the probation window: no start
    df = _rain_year(spark, drizzle=0.5)
    r = agro.rain_season(df, "pr", cells=["cell"]).collect()[0]
    assert r["rain_season_start"] is None


def test_rain_season_open_ended_runs_to_year_end(spark):
    # drizzle continues to Dec 31: no dry run, length = days to Dec 31
    df = _rain_year(spark, dry_from="2002-01-01")
    r = agro.rain_season(df, "pr", cells=["cell"]).collect()[0]
    assert r["rain_season_start"] == 132.0
    assert r["rain_season_end"] is None
    # May 12 .. Dec 31 inclusive = 234 days
    assert r["rain_season_length"] == 234.0


def test_rain_season_total_methods(spark):
    # method 'total': dry start sequence judged on 7-day totals; dry end
    # on 20-day totals <= thresh*window
    df = _rain_year(spark)
    r = agro.rain_season(
        df, "pr", method_dry_start="total", thresh_dry_start=7.0,
        method_dry_end="total", thresh_dry_end=10.0,
        cells=["cell"]).collect()[0]
    assert r["rain_season_start"] == 132.0
    # end: first day whose trailing 20-day total <= 10 mm, after Sep 1;
    # drizzle (2 mm/d) stops Oct 20, so the window ending Nov 3 (doy 307,
    # spanning Oct 15..Nov 3) holds exactly 5*2 = 10 mm — first hit.
    assert r["rain_season_end"] == 307.0


def test_dryness_index_hand_computed(spark):
    # pr = 1 mm/d, etp = 3 mm/d all of 2001 (non-leap):
    # contrib(m) = P - 3n*k - 3*(1-k)*(n/5) for Apr..Sep else 0
    # Apr 4.8, May -9.92, Jun -24, Jul -24.8, Aug -24.8, Sep -24
    # DI = 200 + sum = 97.28
    days = [dt.date(2001, 1, 1) + dt.timedelta(d) for d in range(365)]
    df = spark.createDataFrame(
        [("c1", d, 1.0, 3.0) for d in days],
        "cell string, time date, pr double, etp double")
    out = agro.dryness_index(df, "pr", "etp", cells=["cell"]).collect()
    assert len(out) == 1
    assert out[0]["dryness_index"] == pytest.approx(97.28, abs=1e-9)


def test_dryness_index_south_labels_inside_jan(spark):
    # Southern hemisphere: Oct 2000 - Mar 2001 season labelled 2001-01-01
    days = [dt.date(2000, 7, 1) + dt.timedelta(d) for d in range(365)]
    df = spark.createDataFrame(
        [("c1", d, 2.0, 1.0) for d in days],
        "cell string, time date, pr double, etp double")
    out = agro.dryness_index(df, "pr", "etp", lat="south",
                             cells=["cell"]).collect()
    periods = {str(r["period"]) for r in out}
    assert "2001-01-01" in periods
    # Oct-Mar contributions are positive (P > ETP): DI > Wo for that season
    di = {str(r["period"]): r["dryness_index"] for r in out}
    assert di["2001-01-01"] > 200.0


def test_qian_weighted_mean_average(spark):
    from xclim_spark.operators import agro
    from xclim_spark.testing import timeseries

    vals = [10.0, 12.0, 14.0, 16.0, 18.0, 20.0]
    d = timeseries(spark, vals, start="2000-01-01")
    out = {r["time"].day: r["q"] for r in agro.qian_weighted_mean_average(
        d, "value", cells=["cell"], alias="q").collect()}
    # full windows: linear data -> smoothing preserves the value
    assert out[3] == pytest.approx(14.0)
    assert out[4] == pytest.approx(16.0)
    # edges lack neighbours -> null (reference rolling(center).construct)
    assert out[1] is None and out[2] is None
    assert out[5] is None and out[6] is None


def test_qian_smoothing_null_next_to_gaps(spark):
    """A missing calendar day must null the smoothed value wherever the
    5-day window would span non-adjacent dates (reference's
    calendar-complete centered rolling yields NaN near gaps)."""
    import datetime as dt
    from xclim_spark.operators import agro

    days = [1, 2, 3, 4, 5, 7, 8, 9, 10, 11]  # Jan 6 missing
    rows = [(0, dt.date(2000, 1, d), float(d)) for d in days]
    d = spark.createDataFrame(rows, "cell INT, time DATE, value DOUBLE")
    out = {r["time"].day: r["q"] for r in agro.qian_weighted_mean_average(
        d, "value", cells=["cell"], alias="q").collect()}
    # days 4,5,7,8 have the gap inside their +/-2 window -> null
    for day in (1, 2, 4, 5, 7, 8, 10, 11):
        assert out[day] is None, day
    assert out[3] == pytest.approx(3.0)
    assert out[9] == pytest.approx(9.0)


def test_pet_thornthwaite_matches_hand_formula(spark):
    """One cell, one year, constant 10 degC at the equator: dl = 12 h
    (dl12 = 1), I = 12 * (10/5)^1.514, PET = 16 * (10*10/I)^a."""
    import pandas as pd

    days = pd.date_range("2001-01-01", "2001-12-31", freq="D")
    df = spark.createDataFrame(
        pd.DataFrame({"cell": 1, "time": days, "tas": 10.0}))
    out = agro.potential_evapotranspiration_monthly(
        df, lat=F.lit(0.0), tas="tas", method="thornthwaite48",
        cells=["cell"]).toPandas().sort_values("period")
    assert len(out) == 12
    i_y = 12 * (10.0 / 5.0) ** 1.514
    a = 6.75e-7 * i_y**3 - 7.71e-5 * i_y**2 + 0.01791 * i_y + 0.49239
    expected = 16.0 * 1.0 * (10.0 * 10.0 / i_y) ** a
    # dl12 is not exactly 1 at lat=0 (spencer declination wobbles the
    # sunset angle by <1e-6 rad at the equator), so compare loosely
    np.testing.assert_allclose(out["pet"].to_numpy(), expected, rtol=1e-6)


def test_pet_da02_negative_base_zeroes(spark):
    """A pr rate big enough to push (tr - 0.0123 pr) negative must give
    PET = 0 (the reference's NaN guard, converters.py:2056-2058)."""
    import pandas as pd

    days = pd.date_range("2001-06-01", "2001-06-30", freq="D")
    df = spark.createDataFrame(pd.DataFrame(
        {"cell": 1, "time": days, "tn": 10.0, "tx": 15.0, "pr": 1000.0}))
    out = agro.potential_evapotranspiration_monthly(
        df, lat=F.lit(45.0), tasmin="tn", tasmax="tx", pr="pr",
        method="droogersallen02", cells=["cell"]).toPandas()
    assert out["pet"].tolist() == [0.0]


def test_bedd_gladstones_equals_icclim_at_neutral_latitude(spark):
    """At lat 40 the Gladstones day-length ratio is exactly 1 and with
    dtr pinned inside [low_dtr, high_dtr] the range adjustment is 0, so
    methods 'gladstones' and 'icclim' coincide (reference
    _agro.py:275-446)."""
    import pandas as pd

    from xclim_spark.indicators import registry

    days = pd.date_range("2001-01-01", "2001-12-31", freq="D")
    pdf = pd.DataFrame({"cell": 1, "day": days, "tn": 8.0, "tx": 18.0})
    df = spark.createDataFrame(pdf).withColumn("lat", F.lit(40.0))
    kw = dict(time="day", cells=["cell"], tasmin="tn", tasmax="tx",
              lat="lat", missing=None)
    icc = registry["biologically_effective_degree_days"](
        df, method="icclim", **kw).df.collect()
    gla = registry["biologically_effective_degree_days"](
        df, method="gladstones", **kw).df.collect()
    assert icc[0]["biologically_effective_degree_days"] == pytest.approx(
        gla[0]["biologically_effective_degree_days"], rel=1e-9)
    # value: 214 days in [04-01, 11-01), (8+18)/2 - 10 = 3 K/day
    assert icc[0]["biologically_effective_degree_days"] == pytest.approx(
        214 * 3.0)


def test_bedd_jones_multiplies_annual_coefficient(spark):
    import pandas as pd

    from xclim_spark.functions import solar
    from xclim_spark.indicators import registry

    days = pd.date_range("2001-01-01", "2001-12-31", freq="D")
    pdf = pd.DataFrame({"cell": 1, "day": days, "tn": 8.0, "tx": 18.0})
    df = spark.createDataFrame(pdf).withColumn("lat", F.lit(45.0))
    out = registry["biologically_effective_degree_days"](
        df, time="day", cells=["cell"], tasmin="tn", tasmax="tx",
        lat="lat", method="jones", missing=None).df.collect()
    k = solar.jones_day_length_latitude_coefficient(
        df, F.col("lat"), method="jones", time="day",
        cells=["cell"]).collect()[0]["k"]
    assert out[0]["biologically_effective_degree_days"] == pytest.approx(
        214 * 3.0 * k, rel=1e-9)
