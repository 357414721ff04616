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
