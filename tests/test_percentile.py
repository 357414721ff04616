"""Percentile climatology tests."""

import pytest
from pyspark.sql import functions as F

from xclim_spark.operators import percentile as pc
from xclim_spark.testing import timeseries


def test_percentile_doy_window_pool(spark):
    # 3 years of daily data with value = doy; with window=5 the p50 of each
    # doy bucket is the bucket's own doy (median of symmetric neighbours).
    vals = []
    from datetime import date, timedelta

    t0 = date(2000, 1, 1)
    n = 365 * 3
    for i in range(n):
        d = t0 + timedelta(days=i)
        doy = d.timetuple().tm_yday
        vals.append(float(min(doy, 365)))
    df = timeseries(spark, vals, start="2000-01-01")
    per = pc.percentile_doy(df, "value", 0.5, window=5, cells=["cell"],
                            alias="p50")
    rows = {r["dayofyear"]: r["p50"] for r in per.collect()}
    assert len(rows) == 365
    # mid-year buckets: median of {doy-2..doy+2} pooled over 3 years = doy
    for doy in (50, 180, 300):
        assert rows[doy] == pytest.approx(doy, abs=0.51)


def test_resample_doy_broadcast_join(spark):
    df = timeseries(spark, [1.0] * 10, start="2000-01-01")
    per = pc.percentile_doy(df, "value", 0.9, window=1, cells=["cell"],
                            alias="thresh")
    joined = pc.resample_doy(df, per, cells=["cell"])
    assert "thresh" in joined.columns
    assert joined.filter(F.col("thresh").isNull()).count() == 0
    # the join must be a broadcast, not a shuffle join
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
