"""Dataflags QC suite tests (reference tests/test_flags.py style)."""

import pytest
from pyspark.sql import functions as F

from xclim_spark import dataflags as dfl
from xclim_spark.testing import timeseries


def _wide(spark):
    rows = [
        # (cell, tasmin, tasmax, tas, pr)
        (0, 5.0, 15.0, 10.0, 0.0),
        (0, 8.0, 6.0, 7.0, 12.0),     # tasmax < tasmin !
        (0, 2.0, 20.0, 25.0, -3.0),   # tas > tasmax, negative pr !
        (0, -95.0, 10.0, 0.0, 400.0),  # extremely low tasmin, huge pr !
    ]
    import datetime as dt

    data = [(c, dt.date(2000, 1, 1 + i), a, b, t, p)
            for i, (c, a, b, t, p) in enumerate(rows)]
    return spark.createDataFrame(
        data, "cell INT, time DATE, tasmin DOUBLE, tasmax DOUBLE, "
              "tas DOUBLE, pr DOUBLE")


def test_flag_suite_summary(spark):
    df = _wide(spark)
    checks = {
        "tasmax_below_tasmin": dfl.tasmax_below_tasmin("tasmax", "tasmin"),
        "tas_exceeds_tasmax": dfl.tas_exceeds_tasmax("tas", "tasmax"),
        "temperature_extremely_low":
            dfl.temperature_extremely_low("tasmin"),
        "negative_accumulation_values":
            dfl.negative_accumulation_values("pr"),
        "very_large_precipitation_events":
            dfl.very_large_precipitation_events("pr"),
        "temperature_extremely_high":
            dfl.temperature_extremely_high("tasmax"),
    }
    row = dfl.data_flags(df, checks).collect()[0]
    assert row["tasmax_below_tasmin"] is True
    assert row["tas_exceeds_tasmax"] is True
    assert row["temperature_extremely_low"] is True
    assert row["negative_accumulation_values"] is True
    assert row["very_large_precipitation_events"] is True
    assert row["temperature_extremely_high"] is False
    verdict = dfl.ecad_compliant(df, checks).collect()[0]
    assert verdict["ecad_qc_flag"] is False


def test_per_row_flags(spark):
    df = _wide(spark)
    out = dfl.data_flags(
        df, {"bad": dfl.tasmax_below_tasmin("tasmax", "tasmin")},
        per_row=True).orderBy("time").collect()
    assert [r["bad"] for r in out] == [False, True, False, False]


def test_values_repeating(spark):
    vals = [1.0, 2.0, 2.0, 2.0, 3.0, 4.0, 4.0]
    df = timeseries(spark, vals, start="2000-01-01")
    out = dfl.values_repeating_for_n_or_more_days(
        df, "value", 3, cells=["cell"]).orderBy("time").collect()
    name = "values_repeating_for_3_or_more_days"
    assert [r[name] for r in out] == [
        False, True, True, True, False, False, False]


def test_outside_n_std_climatology(spark):
    # 3 years of smooth values + one wild spike
    # the spike pollutes its own doy bucket's stats, so it must dominate:
    # 999 vs sigma~0.2 elsewhere, and n=3 keeps normal days unflagged
    vals = [10.0 + (i % 7) * 0.1 for i in range(365 * 3)]
    vals[500] = 999.0
    df = timeseries(spark, vals, start="2000-01-01")
    out = dfl.outside_n_standard_deviations_of_climatology(
        df, "value", 3.0, window=5, cells=["cell"])
    name = "outside_3_standard_deviations_of_climatology"
    flagged = out.filter(F.col(name)).collect()
    assert len(flagged) == 1
    assert flagged[0]["value"] == 999.0


def test_registry(spark):
    assert "tasmax_below_tasmin" in dfl.REGISTRY
    assert "very_large_precipitation_events" in dfl.REGISTRY


def test_values_op_thresh_repeating_flag(spark):
    import datetime as dt
    from xclim_spark.dataflags import (
        values_op_thresh_repeating_for_n_or_more_days)

    # pr pinned at exactly 5.0 for 5 days (suspicious), a 5-run of 3.0
    # (not at the threshold), and varied values
    vals = [1.0, 5.0, 5.0, 5.0, 5.0, 5.0, 2.0, 3.0, 3.0, 3.0, 3.0, 3.0,
            4.0]
    rows = [(0, dt.date(2000, 1, 1) + dt.timedelta(days=i), v)
            for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "cell INT, time DATE, pr DOUBLE")
    out = values_op_thresh_repeating_for_n_or_more_days(
        df, "pr", 5, 5.0, op="==", cells=["cell"], flag_name="flag")
    got = {r["time"].day: r["flag"] for r in out.collect()}
    assert all(got[d] for d in range(2, 7))          # the 5.0 run
    assert not any(got[d] for d in (1, 7, 13))
    assert not any(got[d] for d in range(8, 13))     # 3.0 run: wrong value


def test_specific_discharge_extremely_high_flag(spark):
    from pyspark.sql import functions as F
    from xclim_spark.dataflags import specific_discharge_extremely_high

    df = spark.createDataFrame([(50.0,), (150.0,)], "q DOUBLE")
    out = df.select(specific_discharge_extremely_high("q").alias("f")) \
        .collect()
    assert [r["f"] for r in out] == [False, True]
