"""Datachecks + cfchecks tests (reference tests/test_checks.py style)."""

import pytest

from xclim_spark import datachecks as dc
from xclim_spark.testing import timeseries


def test_check_daily_passes(spark):
    df = timeseries(spark, [1.0] * 10, start="2000-01-01")
    dc.check_daily(df, cells=["cell"])  # no raise


def test_check_freq_rejects_wrong_freq(spark):
    df = timeseries(spark, [1.0] * 10, start="2000-01-01", freq_days=7)
    with pytest.raises(dc.ValidationError):
        dc.check_freq(df, "D", cells=["cell"])
    dc.check_freq(df, "7D", cells=["cell"])  # weekly ok
    # non-strict: 7D is a multiple of D
    dc.check_freq(df, "D", strict=False, cells=["cell"])


def test_check_freq_irregular(spark):
    import datetime as dt

    rows = [(0, dt.date(2000, 1, 1), 1.0), (0, dt.date(2000, 1, 2), 1.0),
            (0, dt.date(2000, 1, 5), 1.0)]
    df = spark.createDataFrame(rows, "cell INT, time DATE, value DOUBLE")
    with pytest.raises(dc.ValidationError):
        dc.check_daily(df, cells=["cell"])


def test_check_common_time(spark):
    a = timeseries(spark, [1.0] * 5, start="2000-01-01")
    b = timeseries(spark, [2.0] * 5, start="2000-01-01")
    dc.check_common_time([a, b], cells=["cell"])  # no raise
    c = timeseries(spark, [2.0] * 5, start="2001-01-01")
    with pytest.raises(dc.ValidationError):
        dc.check_common_time([a, c], cells=["cell"])


def test_cfcheck_from_name():
    dc.cfcheck_from_name("tas", units="K")          # temperature ok
    dc.cfcheck_from_name("unknown_var", units="parsecs")  # unknown passes
    with pytest.raises(dc.ValidationError):
        dc.cfcheck_from_name("pr", units="degC")    # wrong dimensionality
    with pytest.raises(dc.ValidationError):
        dc.cfcheck_from_name("tas", standard_name="sea_water_salinity")
