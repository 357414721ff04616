"""IO tier tests: dataset roundtrip with pruning, NetCDF ingest plumbing."""

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from xclim_spark.io import (ingest_netcdf, netcdf_manifest, read_dataset,
                            write_dataset)
from xclim_spark.testing import timeseries


def test_write_read_roundtrip_with_pruning(spark, tmp_path):
    vals = [float(i) for i in range(365 * 3)]
    df = timeseries(spark, vals, start="2000-01-01")
    path = str(tmp_path / "ds")
    write_dataset(df, path, time="time")
    back = read_dataset(spark, path, years=(2001, 2001))
    assert back.count() == 365
    assert back.select(F.min(F.year("time")),
                       F.max(F.year("time"))).collect()[0] == (2001,) * 2 \
        or back.select(F.min("year")).collect()[0][0] == 2001
    # partition pruning visible in the plan: only year=2001 scanned
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or "year" in plan
    # column pruning
    two = read_dataset(spark, path, columns=["cell", "value"])
    assert set(two.columns) <= {"cell", "value", "year"}


def test_netcdf_manifest_parallelism(spark):
    m = netcdf_manifest(spark, [f"/fake/{i}.nc" for i in range(7)])
    assert m.count() == 7
    assert m.rdd.getNumPartitions() == 7


def test_ingest_with_injected_reader(spark):
    # synthetic "file" reader: 2 files x 3 days x 2 cells of tas
    def reader(path):
        base = dt.datetime(2000, 1, 1)
        fileno = int(path[-4])
        rows = []
        for d in range(3):
            for cell in range(2):
                rows.append({
                    "time": base + dt.timedelta(days=d + 3 * fileno),
                    "lat": 40.0 + cell, "lon": -70.0,
                    "tas": float(fileno * 100 + d + cell),
                })
        yield pd.DataFrame(rows)

    out = ingest_netcdf(
        spark, ["/fake/0.nc", "/fake/1.nc"],
        "time TIMESTAMP, lat DOUBLE, lon DOUBLE, tas DOUBLE",
        reader=reader,
    )
    assert out.count() == 12
    assert out.select(F.countDistinct(F.to_date("time"))).collect()[0][0] == 6
    # schema contract holds
    assert [f.name for f in out.schema.fields] == ["time", "lat", "lon",
                                                   "tas"]


def test_default_reader_raises_without_libs(spark):
    with pytest.raises(NotImplementedError):
        ingest_netcdf(spark, ["/fake/a.nc"], "time TIMESTAMP, tas DOUBLE")


def test_bucketed_table_feeds_window_and_agg_without_exchange(spark, tmp_path):
    """The bucketed+sorted layout must remove the shuffle from cell-keyed
    window and aggregation plans — the engine's dominant access pattern."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from xclim_spark.io.dataset import write_bucketed_table
    from xclim_spark.testing import timeseries

    d = timeseries(spark, [float(i % 7) for i in range(200)],
                   start="2000-01-01")
    d = d.withColumn("cell", (F.dayofyear("time") % 5).cast("int"))
    write_bucketed_table(d, "bucketed_t", cells=("cell",), buckets=4)
    try:
        t = spark.table("bucketed_t")
        w = Window.partitionBy("cell").orderBy("time")
        win_plan = (t.withColumn("lag", F.lag("value").over(w))
                    ._jdf.queryExecution().executedPlan().toString())
        agg_plan = (t.groupBy("cell").agg(F.sum("value"))
                    ._jdf.queryExecution().executedPlan().toString())
        assert "Exchange" not in win_plan
        assert "Exchange" not in agg_plan
        # and the data round-trips
        assert t.count() == 200
    finally:
        spark.sql("DROP TABLE IF EXISTS bucketed_t")
