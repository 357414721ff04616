"""Round-5 API-parity batch: small public helpers the reference exposes
(units transforms, calendar doy utilities, options context, accessors)."""

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_units_transforms(spark):
    from xclim_spark import units as u

    df = spark.range(1).select(F.lit(2.0).alias("x"))
    got = df.select(
        u.amount2lwethickness(F.col("x")).alias("lwe"),          # kg/m2 -> mm
        u.lwethickness2amount(F.col("x")).alias("amt"),
        u.rate2flux(F.col("x"), "312 kg m-3").alias("flux"),
        u.flux2rate(F.col("x"), 312.0).alias("rate"),
        u.pint_multiply(F.col("x"), "3 d").alias("mult"),
    ).collect()[0]
    assert got["lwe"] == pytest.approx(2.0)     # 1 kg/m2 == 1 mm lwe
    assert got["amt"] == pytest.approx(2.0)
    assert got["flux"] == pytest.approx(624.0)
    assert got["rate"] == pytest.approx(2.0 / 312.0)
    assert got["mult"] == pytest.approx(6.0)


def test_infer_sampling_units_and_temp_helpers():
    from xclim_spark import units as u

    assert u.infer_sampling_units("D") == (1, "d")
    assert u.infer_sampling_units("MS") == (1, "month")
    assert u.infer_sampling_units("QS-DEC") == (3, "month")
    assert u.infer_sampling_units("YS") == (1, "a")
    assert u.ensure_absolute_temperature("degC") == "K"
    assert u.ensure_absolute_temperature("degF") == "degR"
    assert u.ensure_absolute_temperature("mm") == "mm"
    assert u.ensure_delta("degC") == "delta_degC"
    assert u.ensure_delta("K") == "K"
    assert u.infer_context("lwe_thickness_of_precipitation_amount") == "hydro"
    assert u.infer_context("air_temperature") == "none"


def test_doy_from_string():
    from xclim_spark.calendar import doy_from_string

    assert doy_from_string("03-01", 2001) == 60        # non-leap
    assert doy_from_string("03-01", 2000) == 61        # leap
    assert doy_from_string("03-01", 2000, "noleap") == 60
    assert doy_from_string("03-01", 2001, "all_leap") == 61
    assert doy_from_string("03-01", 2000, "360_day") == 61  # 2*30+1
    assert doy_from_string("12-30", 2001, "360_day") == 360


def test_build_climatology_bounds(spark):
    from xclim_spark.calendar import build_climatology_bounds

    rows = [(dt.date(1991, 1, 1),), (dt.date(1995, 6, 2),),
            (dt.date(2020, 12, 31),)]
    df = spark.createDataFrame(rows, "time DATE")
    assert build_climatology_bounds(df) == ["1991-01-01", "2020-12-31"]


def test_climatological_mean_doy_and_within_bnds(spark):
    from xclim_spark.calendar import (climatological_mean_doy,
                                      within_bnds_doy)

    rows = [(0, dt.date(2000, 1, 1) + dt.timedelta(days=i), float(i % 10))
            for i in range(730)]
    df = spark.createDataFrame(rows, "cell INT, time DATE, v DOUBLE")
    clim = climatological_mean_doy(df, "v", window=5, cells=["cell"])
    r = clim.filter("dayofyear = 100").collect()[0]
    assert r["clim_std"] >= 0.0 and 0.0 <= r["clim_mean"] <= 9.0
    bounds = clim.select(
        "cell", "dayofyear",
        (F.col("clim_mean") - 3 * F.col("clim_std")).alias("low"),
        (F.col("clim_mean") + 3 * F.col("clim_std")).alias("high"))
    flagged = within_bnds_doy(df, "v", bounds, cells=["cell"])
    vals = flagged.select("within").collect()
    assert all(r["within"] is not None for r in vals)


def test_adjust_doy_calendar(spark):
    from xclim_spark.calendar import adjust_doy_calendar

    # linear source over doy 1..360 -> interpolated onto 1..365
    src = spark.createDataFrame(
        [(d, float(d)) for d in range(1, 361)], "dayofyear INT, v DOUBLE")
    out = adjust_doy_calendar(src, 365, source_max=360)
    got = {r["dayofyear"]: r["v"] for r in out.collect()}
    assert len(got) == 365
    assert got[1] == pytest.approx(1.0)
    assert got[365] == pytest.approx(360.0)
    # midpoint maps linearly
    assert got[183] == pytest.approx((183 - 1) / 364 * 359 + 1, rel=1e-9)


def test_mask_between_doys(spark):
    from xclim_spark.calendar import mask_between_doys

    rows = [(dt.date(2001, 1, 1) + dt.timedelta(days=i),)
            for i in range(365)]
    df = spark.createDataFrame(rows, "time DATE")
    n = df.filter(mask_between_doys("time", (100, 200))).count()
    assert n == 101
    # wrap-around window spans the year boundary
    nw = df.filter(mask_between_doys("time", (360, 5))).count()
    assert nw == 11


def test_set_options_and_missing_from_context(spark):
    from xclim_spark.operators.missing import missing_from_context
    from xclim_spark.options import set_options

    rows = [(0, dt.date(2001, 1, d), 1.0) for d in range(1, 17)]  # half of Jan
    df = spark.createDataFrame(rows, "cell INT, time DATE, v DOUBLE")
    m_any = missing_from_context(df, "v", "MS", cells=["cell"]).collect()
    assert m_any[0]["is_missing"] is True
    with set_options(check_missing="at_least_n",
                     missing_options={"at_least_n": {"n": 10}}):
        m_n = missing_from_context(df, "v", "MS", cells=["cell"]).collect()
        assert m_n[0]["is_missing"] is False
    with pytest.raises(ValueError):
        set_options(check_missing="not_a_method")
    with pytest.raises(ValueError):
        set_options(no_such_option=1)


def test_get_dist_and_significance_registry():
    from xclim_spark import ensembles as ens
    from xclim_spark.stats import get_dist

    assert get_dist("gumbel_r")["nparams"] == 2
    with pytest.raises(ValueError):
        get_dist("cauchy_nope")

    @ens.significance_test
    def _test_always(fut, ref):
        return True, 0.0

    assert ens.SIGNIFICANCE_TESTS["always"] is _test_always
    del ens.SIGNIFICANCE_TESTS["always"]


def test_hawkins_sutton_09_weighting(spark):
    from xclim_spark.ensembles import hawkins_sutton_09_weighting

    rows = []
    for m, slope in (("a", 1.0), ("b", 2.0)):
        for y in range(1971, 2001):
            rows.append((m, dt.date(y, 6, 1), slope * (y - 1971)))
    df = spark.createDataFrame(rows, "model STRING, time DATE, value DOUBLE")
    w = {r["model"]: r["weight"] for r in
         hawkins_sutton_09_weighting(df, obs=14.5).collect()}
    # model a: baseline mean 14.5, 2000-value 29 -> xm = 14.5 == obs -> w = 1/14.5
    assert w["a"] == pytest.approx(1 / 14.5)
    # model b: mean 29, end 58 -> xm 29; |29-14.5|=14.5 -> w = 1/29
    assert w["b"] == pytest.approx(1 / 29.0)


def test_check_valid():
    from xclim_spark.datachecks import ValidationError, check_valid

    check_valid({"standard_name": "air_temperature"}, "standard_name",
                "air_temperature")
    check_valid({"cell_methods": "time: mean"}, "cell_methods",
                ["time: mean", "time: point"])
    with pytest.raises(ValidationError):
        check_valid({}, "standard_name", "air_temperature")
    with pytest.raises(ValidationError):
        check_valid({"standard_name": "x"}, "standard_name", "y")


def test_first_day_threshold_reached(spark):
    from xclim_spark.operators import generic as g
    from xclim_spark.testing import timeseries

    # condition true on days 50-60 and 200-210; after 07-01 (doy 182)
    vals = [1.0 if (50 <= i + 1 <= 60 or 200 <= i + 1 <= 210) else 0.0
            for i in range(365)]
    df = timeseries(spark, vals, start="2001-01-01")
    out = g.first_day_threshold_reached(
        df, "value", ">", 0.5, "07-01", window=3, cells=["cell"]).collect()
    assert out[0]["doy"] == 200


def test_bivariate_spell_length_statistics(spark):
    import datetime as _dt
    from xclim_spark.operators import run_length as rl

    rows = []
    for i in range(60):
        d = _dt.date(2001, 6, 1) + _dt.timedelta(days=i)
        tx = 30.0 if 10 <= i < 20 else 20.0   # >= 25 on days 10..19
        hu = 80.0 if 12 <= i < 25 else 40.0   # >= 60 on days 12..24
        rows.append((0, d, tx, hu))
    df = spark.createDataFrame(rows,
                               "cell INT, time DATE, tx DOUBLE, hu DOUBLE")
    out = rl.bivariate_spell_length_statistics(
        df, "tx", 25.0, "hu", 60.0, 1, "min", ">=", "max", "YS",
        cells=["cell"])
    # both conditions hold on days 12..19 -> longest joint spell = 8
    assert out.collect()[0]["spell_stat"] == 8


def test_add_season_coord_and_split(spark):
    import datetime as _dt
    from xclim_spark.calendar import (add_season_coord,
                                      split_time_to_season_year)

    rows = [(_dt.date(2001, m, 15),) for m in range(1, 13)]
    df = spark.createDataFrame(rows, "time DATE")
    # QS-DEC -> meteorological seasons
    got = {r["time"].month: r["season"] for r in
           add_season_coord(df, "QS-DEC").collect()}
    assert got[12] == "DJF" and got[1] == "DJF" and got[2] == "DJF"
    assert got[3] == "MAM" and got[6] == "JJA" and got[9] == "SON"
    # monthly -> month abbreviations; yearly -> 'annual'
    gm = {r["time"].month: r["season"] for r in
          add_season_coord(df, "MS").collect()}
    assert gm[1] == "JAN" and gm[12] == "DEC"
    ga = add_season_coord(df, "YS").select("season").distinct().collect()
    assert [r["season"] for r in ga] == ["annual"]
    # split: Dec 2001 belongs to year 2001 (anchor DEC); Jan 2001 to 2000
    sp = {r["time"].month: r["year"] for r in
          split_time_to_season_year(df, "QS-DEC").collect()}
    assert sp[12] == 2001 and sp[1] == 2000 and sp[11] == 2000
    import pytest as _pytest
    with _pytest.raises(ValueError):
        add_season_coord(df, "W")
    with _pytest.raises(ValueError):
        add_season_coord(df, "5MS")


def test_attr_prefix_helpers():
    from xclim_spark.formatting import (get_percentile_metadata,
                                        prefix_attrs, unprefix_attrs)

    src = {"units": "K", "window": 5, "other": 1}
    p = prefix_attrs(src, ["units", "window"], "tas_")
    assert p == {"tas_units": "K", "tas_window": 5, "other": 1}
    assert unprefix_attrs(p, ["units", "window"], "tas_") == src
    meta = get_percentile_metadata(
        {"percentiles": [90], "window": 5,
         "climatology_bounds": ["1991-01-01", "2020-12-31"]}, "tas_per")
    assert meta["tas_per_thresh"] == [90]
    assert meta["tas_per_window"] == 5
    assert meta["tas_per_period"] == ["1991-01-01", "2020-12-31"]


def test_cf_unit_serialization():
    from xclim_spark import units as u

    assert u.pint2cfunits("mm/d") == "mm d-1"
    assert u.pint2cfunits("kg m-2 s-1") == "kg m-2 s-1"
    assert u.pint2cfunits("°C") == "degC"
    assert u.pint2cfunits("W/m^2") == "W m-2"
    assert u.ensure_cf_units("celsius") == "degC"
    assert u.pint2cfattrs("5 mm/d") == {"units": "mm d-1"}
    assert u.pint2cfattrs("2 degC", is_difference=True) == \
        {"units": "delta_degC"}
    assert u.cf_conversion("precipitation_amount", "amount2rate",
                           "to") == "precipitation_flux"
    assert u.cf_conversion("precipitation_flux", "amount2rate",
                           "from") == "precipitation_amount"
    assert u.cf_conversion("nope", "amount2rate", "to") is None


def test_declare_relative_units():
    import pytest as _pytest
    from xclim_spark.units import declare_relative_units

    @declare_relative_units(thresh="<data>")
    def op(*, data, thresh):
        return 1

    assert op(data=("col", "degC"), thresh="25 degC") == 1
    assert op.relative_units == {"thresh": "<data>"}
    with _pytest.raises(Exception):
        op(data=("col", "degC"), thresh="10 mm")


def test_default_freq():
    import pytest as _pytest
    from xclim_spark.operators.generic import default_freq

    assert default_freq() == "YS-JAN"
    assert default_freq(season="DJF") == "YS-DEC"
    assert default_freq(month=[6, 7, 8]) == "YS-JUN"
    assert default_freq(doy_bounds=(100, 200)) == "YS-APR"  # doy 100 = Apr 9
    assert default_freq(date_bounds=("07-01", "09-30")) == "YS-JUL"
    with _pytest.raises(ValueError):
        default_freq(bogus=1)


def test_season_length_from_boundaries(spark):
    from xclim_spark.operators.generic import season_length_from_boundaries

    start = spark.createDataFrame(
        [(0, 2001, 100), (0, 2002, 350), (0, 2003, None)],
        "cell INT, period INT, season_start INT")
    end = spark.createDataFrame(
        [(0, 2001, 250), (0, 2002, 40), (0, 2003, 120)],
        "cell INT, period INT, season_end INT")
    out = {r["period"]: r["season_length"] for r in
           season_length_from_boundaries(start, end).collect()}
    assert out[2001] == 150
    assert out[2002] == 55        # wraps the year end: 40 + 365 - 350
    assert out[2003] is None


def test_preprocess_standardized_index(spark):
    from xclim_spark.stats import preprocess_standardized_index
    from xclim_spark.testing import timeseries

    vals = [float(i) for i in range(90)]
    df = timeseries(spark, vals, start="2001-01-01")
    out = preprocess_standardized_index(
        df, "value", "MS", 2, cells=["cell"]).orderBy("period").collect()
    assert out[0]["_roll"] is None                 # window not yet full
    jan = sum(range(0, 31))
    feb = sum(range(31, 59))
    mar = sum(range(59, 90))
    assert out[1]["_roll"] == jan + feb
    assert out[2]["_roll"] == feb + mar
