"""Missing-mask tests (mirrors reference tests/test_missing.py)."""

from xclim_spark.operators import missing as miss
from xclim_spark.testing import timeseries


def _january(spark, drop_days=(), null_days=()):
    values = [1.0] * 31
    vals = [None if (i + 1) in null_days else v for i, v in enumerate(values)]
    df = timeseries(spark, vals, start="2000-01-01")
    if drop_days:
        from pyspark.sql import functions as F

        df = df.filter(~F.dayofmonth("time").isin(list(drop_days)))
    return df


def test_missing_any_complete(spark):
    df = _january(spark)
    out = miss.missing_any(df, "value", "MS", cells=["cell"]).collect()
    assert out[0]["is_missing"] is False


def test_missing_any_absent_row(spark):
    df = _january(spark, drop_days=(5,))
    out = miss.missing_any(df, "value", "MS", cells=["cell"]).collect()
    assert out[0]["is_missing"] is True


def test_missing_any_null_value(spark):
    df = _january(spark, null_days=(7,))
    out = miss.missing_any(df, "value", "MS", cells=["cell"]).collect()
    assert out[0]["is_missing"] is True


def test_missing_pct(spark):
    df = _january(spark, drop_days=(1, 2, 3))  # 3/31 ~ 9.7%
    ok = miss.missing_pct(df, "value", "MS", 0.15, cells=["cell"]).collect()
    assert ok[0]["is_missing"] is False
    strict = miss.missing_pct(df, "value", "MS", 0.05, cells=["cell"]).collect()
    assert strict[0]["is_missing"] is True


def test_missing_at_least_n(spark):
    df = _january(spark, drop_days=tuple(range(16, 32)))  # 15 days left
    ok = miss.missing_at_least_n(df, "value", "MS", 10, cells=["cell"]).collect()
    assert ok[0]["is_missing"] is False
    strict = miss.missing_at_least_n(df, "value", "MS", 20,
                                     cells=["cell"]).collect()
    assert strict[0]["is_missing"] is True


def test_missing_wmo_consecutive(spark):
    # 4 missing days scattered: passes nm=11 and nc=5
    df = _january(spark, drop_days=(3, 10, 17, 24))
    out = miss.missing_wmo(df, "value", "MS", cells=["cell"]).collect()
    assert out[0]["is_missing"] is False
    # 5 consecutive missing: fails nc=5 even though total <= 11
    df = _january(spark, drop_days=(10, 11, 12, 13, 14))
    out = miss.missing_wmo(df, "value", "MS", cells=["cell"]).collect()
    assert out[0]["is_missing"] is True
    # missing run at the period head is caught too
    df = _january(spark, drop_days=(1, 2, 3, 4, 5))
    out = miss.missing_wmo(df, "value", "MS", cells=["cell"]).collect()
    assert out[0]["is_missing"] is True
    # and at the tail
    df = _january(spark, drop_days=(27, 28, 29, 30, 31))
    out = miss.missing_wmo(df, "value", "MS", cells=["cell"]).collect()
    assert out[0]["is_missing"] is True


def test_mask_missing_nulls_out(spark):
    from xclim_spark.operators import generic as g

    df = _january(spark, drop_days=(5,))
    res = g.select_resample_op(df, "value", "mean", "MS", cells=["cell"],
                               alias="m")
    m = miss.missing_any(df, "value", "MS", cells=["cell"])
    out = miss.mask_missing(res, m, ["m"], keys=["cell", "period"]).collect()
    assert out[0]["m"] is None
