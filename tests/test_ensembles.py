"""Ensemble tier tests (reference tests/test_ensembles.py style)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from xclim_spark import ensembles as ens
from xclim_spark.testing import timeseries


def _ensemble(spark, series):
    members = [timeseries(spark, vals, start="2000-01-01") for vals in series]
    return ens.create_ensemble(members)


def test_create_ensemble(spark):
    e = _ensemble(spark, [[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]])
    assert e.count() == 6
    assert set(r["realization"] for r in
               e.select("realization").distinct().collect()) == {0, 1, 2}


def test_mean_std_max_min(spark):
    e = _ensemble(spark, [[1.0, 10.0], [2.0, 20.0], [3.0, 30.0]])
    out = ens.ensemble_mean_std_max_min(e, "value", keys=["cell", "time"])
    rows = {r["time"]: r for r in out.collect()}
    t0 = sorted(rows)[0]
    assert rows[t0]["value_mean"] == pytest.approx(2.0)
    assert rows[t0]["value_stdev"] == pytest.approx(np.std([1, 2, 3]))
    assert rows[t0]["value_max"] == 3.0 and rows[t0]["value_min"] == 1.0


def test_min_members_masking(spark):
    e = _ensemble(spark, [[1.0, None], [2.0, None], [3.0, 30.0]])
    out = ens.ensemble_mean_std_max_min(e, "value", keys=["cell", "time"],
                                        min_members=2)
    rows = {r["time"]: r for r in out.collect()}
    t0, t1 = sorted(rows)
    assert rows[t0]["value_mean"] == pytest.approx(2.0)
    assert rows[t1]["value_mean"] is None  # only 1 valid member


def test_weighted_mean(spark):
    e = _ensemble(spark, [[1.0], [2.0], [4.0]])
    out = ens.ensemble_mean_std_max_min(
        e, "value", keys=["cell", "time"], weights={0: 1.0, 1: 1.0, 2: 2.0})
    row = out.collect()[0]
    assert row["value_mean"] == pytest.approx((1 + 2 + 4 * 2) / 4)


def test_percentiles_methods(spark):
    vals = [[float(v)] for v in (1, 2, 3, 4, 5, 6, 7, 8, 9, 10)]
    e = _ensemble(spark, vals)
    out = ens.ensemble_percentiles(e, "value", (10, 50, 90),
                                   keys=["cell", "time"])
    row = out.collect()[0]
    x = np.arange(1.0, 11.0)
    assert row["value_p10"] == pytest.approx(np.percentile(x, 10))
    assert row["value_p50"] == pytest.approx(np.percentile(x, 50))
    assert row["value_p90"] == pytest.approx(np.percentile(x, 90))
    out2 = ens.ensemble_percentiles(e, "value", (10, 90),
                                    keys=["cell", "time"],
                                    method="median_unbiased")
    row2 = out2.collect()[0]
    assert row2["value_p10"] == pytest.approx(
        np.percentile(x, 10, method="median_unbiased"))
    assert row2["value_p90"] == pytest.approx(
        np.percentile(x, 90, method="median_unbiased"))


def test_robustness_fractions(spark):
    # 4 members: 3 increase, 1 decreases
    ref = _ensemble(spark, [[10.0], [10.0], [10.0], [10.0]])
    fut = _ensemble(spark, [[12.0], [13.0], [11.0], [8.0]])
    out = ens.robustness_fractions(fut, ref, "value", keys=["cell", "time"])
    row = out.collect()[0]
    assert row["changed_positive"] == pytest.approx(0.75)
    assert row["changed_negative"] == pytest.approx(0.25)
    assert row["agree"] == pytest.approx(0.75)
    assert row["valid_members"] == 4
