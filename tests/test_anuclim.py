"""ANUCLIM kernel tests."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from xclim_spark.operators import anuclim as an
from xclim_spark.testing import timeseries


def test_temperature_seasonality(spark):
    # constant temperature -> CV 0
    df = timeseries(spark, [10.0] * 365, start="2001-01-01")
    out = an.temperature_seasonality(df, "value", cells=["cell"]).collect()
    assert out[0]["temperature_seasonality"] == pytest.approx(0.0)
    # sinusoidal year
    vals = [10.0 + 10.0 * np.sin(2 * np.pi * i / 365) for i in range(365)]
    df2 = timeseries(spark, vals, start="2001-01-01")
    got = an.temperature_seasonality(df2, "value",
                                     cells=["cell"]).collect()[0]
    k = np.array(vals) + 273.15
    want = 100.0 * k.std() / k.mean()
    assert got["temperature_seasonality"] == pytest.approx(want, rel=1e-9)


def test_isothermality(spark):
    import datetime as dt

    rows = [(0, dt.date(2001, 1, 1) + dt.timedelta(days=i),
             10.0, 20.0 if i != 100 else 40.0) for i in range(365)]
    df = spark.createDataFrame(rows, "cell INT, time DATE, tn DOUBLE, "
                                     "tx DOUBLE")
    out = an.isothermality(df, "tn", "tx", cells=["cell"]).collect()[0]
    mean_rng = (10.0 * 364 + 30.0) / 365
    want = 100.0 * mean_rng / (40.0 - 10.0)
    assert out["isothermality"] == pytest.approx(want, rel=1e-9)


def test_quarter_stat_warmest(spark):
    # temperature peaks Jun-Aug; precip is 2.0 in those months else 1.0:
    # wettest-quarter mean pr ~ warmest-quarter mean pr = 2.0
    import datetime as dt

    rows = []
    d = dt.date(2001, 1, 1)
    while d.year == 2001:
        tas = 20.0 if d.month in (6, 7, 8) else 5.0
        pr = 2.0 if d.month in (6, 7, 8) else 1.0
        rows.append((0, d, tas, pr))
        d += dt.timedelta(days=1)
    df = spark.createDataFrame(rows, "cell INT, time DATE, tas DOUBLE, "
                                     "pr DOUBLE")
    # BIO10-ish: mean tas of warmest quarter
    warm = an.quarter_stat(df, "tas", op="mean", select="max",
                           cells=["cell"], alias="bio10").collect()[0]
    assert warm["bio10"] == pytest.approx(20.0)
    # mean pr of warmest quarter (selector = tas)
    prw = an.quarter_stat(df, "pr", op="mean", sel_var="tas",
                          select="max", cells=["cell"],
                          alias="pr_warmq").collect()[0]
    assert prw["pr_warmq"] == pytest.approx(2.0)
    # coldest quarter excludes summer
    cold = an.quarter_stat(df, "tas", op="mean", select="min",
                           cells=["cell"], alias="bio11").collect()[0]
    assert cold["bio11"] == pytest.approx(5.0)
