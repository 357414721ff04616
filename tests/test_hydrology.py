"""Hydrology kernel tests (reference tests/test_hydrology.py style)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from xclim_spark.operators import hydrology as hy
from xclim_spark.testing import timeseries


def test_base_flow_index(spark):
    # constant flow -> centered 7-day mean == mean -> BFI == 1
    df = timeseries(spark, [5.0] * 30, start="2000-01-01")
    out = hy.base_flow_index(df, "value", "YS", cells=["cell"]).collect()
    assert out[0]["base_flow_index"] == pytest.approx(1.0)
    # one low-flow dip drags the 7-day min below the mean
    vals = [5.0] * 30
    vals[15] = 0.0
    df2 = timeseries(spark, vals, start="2000-01-01")
    out2 = hy.base_flow_index(df2, "value", "YS", cells=["cell"]).collect()
    assert out2[0]["base_flow_index"] < 1.0


def test_rb_flashiness(spark):
    # constant flow -> RBI 0; alternating flow -> high RBI
    df = timeseries(spark, [4.0] * 20, start="2000-01-01")
    assert hy.rb_flashiness_index(df, "value", "YS", cells=["cell"]) \
        .collect()[0]["rbi"] == pytest.approx(0.0)
    alt = timeseries(spark, [1.0, 9.0] * 10, start="2000-01-01")
    rbi = hy.rb_flashiness_index(alt, "value", "YS", cells=["cell"]) \
        .collect()[0]["rbi"]
    assert rbi == pytest.approx(8.0 * 19 / 100.0)


def test_flow_and_frequency(spark):
    rng = np.random.RandomState(0)
    vals = rng.lognormal(1.0, 1.0, 365).tolist()
    df = timeseries(spark, vals, start="2000-01-01")
    fi = hy.flow_index(df, "value", 0.95, cells=["cell"]).collect()[0]
    assert fi["flow_index"] > 1.0
    hf = hy.high_flow_frequency(df, "value", 9.0, "YS",
                                cells=["cell"]).collect()[0]
    med = float(np.percentile(np.array(vals), 50))
    assert hf["high_flow_days"] == sum(v > 9 * med for v in vals)
    lf = hy.low_flow_frequency(df, "value", 0.2, "YS",
                               cells=["cell"]).collect()[0]
    mean = float(np.mean(vals))
    assert lf["low_flow_days"] == sum(v < 0.2 * mean for v in vals)


def test_sen_slope(spark):
    # perfect linear trend -> slope recovered exactly
    vals = [2.0 + 0.25 * i for i in range(50)]
    df = timeseries(spark, vals, start="2000-01-01")
    out = hy.sen_slope(df, "value", cells=["cell"]).collect()
    assert out[0]["sen_slope"] == pytest.approx(0.25, rel=1e-12)
    # trend + outliers: Theil-Sen is robust where OLS is not
    vals2 = list(vals)
    vals2[10] = 100.0
    vals2[40] = -100.0
    df2 = timeseries(spark, vals2, start="2000-01-01")
    out2 = hy.sen_slope(df2, "value", cells=["cell"]).collect()
    assert out2[0]["sen_slope"] == pytest.approx(0.25, rel=0.05)
