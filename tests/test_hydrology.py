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


def test_sen_slope_annual_means_and_mk_p(spark):
    # 5 years whose annual means are exactly 1,2,3,4,5 -> slope 1/year;
    # the Mann-Kendall p for a strictly increasing n=5 series is the
    # published textbook value 2*(1-Phi((10-1)/sqrt(50/3))) = 0.027486
    vals = []
    for yr in range(5):
        n = 366 if yr == 0 else 365  # 2000 is a leap year
        vals += [float(yr + 1)] * n
    df = timeseries(spark, vals, start="2000-01-01")
    out = hy.sen_slope(df, "value", freq="YS", cells=["cell"]).collect()
    assert len(out) == 1 and out[0]["season"] == 1
    assert out[0]["sen_slope"] == pytest.approx(1.0, rel=1e-12)
    assert out[0]["p_value"] == pytest.approx(0.0274863, abs=1e-6)


def test_sen_slope_robust_to_outlier_year(spark):
    # Theil-Sen over annual means shrugs off one outlier year
    vals = []
    for yr in range(9):
        n = 366 if yr % 4 == 0 else 365
        v = 100.0 if yr == 4 else 2.0 + 0.5 * yr
        vals += [v] * n
    df = timeseries(spark, vals, start="2000-01-01")
    out = hy.sen_slope(df, "value", freq="YS", cells=["cell"]).collect()
    assert out[0]["sen_slope"] == pytest.approx(0.5, rel=1e-9)


def test_sen_slope_ratio_seasonal(spark):
    # sim = 2x obs -> per-season slopes double, ratio exactly 0.5;
    # QS-DEC splits into 4 seasons (anchor months 12, 3, 6, 9)
    vals = [float(i % 37) + 0.1 * (i // 365) for i in range(4 * 365 + 1)]
    df = timeseries(spark, vals, start="2000-01-01")
    df = df.withColumn("sim", F.col("value") * 2.0)
    out = hy.sen_slope_ratio(df, "value", "sim", freq="QS-DEC",
                             cells=["cell"]).collect()
    assert sorted(r["season"] for r in out) == [3, 6, 9, 12]
    for r in out:
        assert r["ratio"] == pytest.approx(0.5, rel=1e-9)
        assert r["p_value"] == r["p_value_sim"]  # same sign pattern


def test_mk_kernel_matches_bruteforce():
    """Property check: the vectorized Mann-Kendall/Sen kernel equals a
    straightforward per-pair re-derivation on random series (ties
    included via integer draws)."""
    import math

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from xclim_spark.operators.hydrology import _mk_kernel

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.integers(min_value=-5, max_value=5),
                    min_size=2, max_size=24))
    def check(vals):
        x = np.asarray(vals, dtype=float)
        slope, p = _mk_kernel(x)
        n = len(x)
        diffs, slopes = [], []
        for i in range(n):
            for j in range(i + 1, n):
                diffs.append(np.sign(x[j] - x[i]))
                slopes.append((x[j] - x[i]) / (j - i))
        s = float(np.sum(diffs))
        _, t = np.unique(x, return_counts=True)
        var_s = (n * (n - 1) * (2 * n + 5)
                 - float(np.sum(t * (t - 1) * (2 * t + 5)))) / 18.0
        if var_s > 0 and s != 0:
            z = (s - 1 if s > 0 else s + 1) / math.sqrt(var_s)
        else:
            z = 0.0
        assert slope == pytest.approx(float(np.median(slopes)), rel=1e-12)
        assert p == pytest.approx(math.erfc(abs(z) / math.sqrt(2)),
                                  rel=1e-12)

    check()


def test_mk_kernel_skips_nans_with_compressed_index():
    """pymannkendall's original_test drops missing values (method
    'skip') and re-indexes the survivors consecutively — one all-null
    period must not NaN out the whole (cell, season)."""
    from xclim_spark.operators.hydrology import _mk_kernel

    clean = np.array([1.0, 2.0, 3.0, 4.0])
    holed = np.array([1.0, np.nan, 2.0, 3.0, np.nan, 4.0])
    s0, p0 = _mk_kernel(clean)
    s1, p1 = _mk_kernel(holed)
    assert s1 == pytest.approx(s0) and p1 == pytest.approx(p0)
    # all-NaN and single-survivor series degrade to NaN, not crash
    s, p = _mk_kernel(np.array([np.nan, np.nan]))
    assert np.isnan(s) and np.isnan(p)
    s, p = _mk_kernel(np.array([np.nan, 7.0]))
    assert np.isnan(s) and np.isnan(p)
