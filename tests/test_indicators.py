"""Indicator framework tests (reference tests/test_indicators.py,
test_modules.py style: tiny deterministic series, exact expected values)."""

import pytest
from pyspark.sql import functions as F

from xclim_spark.indicators import atmos, registry, from_dict, \
    build_indicator_module_from_yaml
from xclim_spark.testing import timeseries


def test_registry_populated():
    assert len(registry) >= 25
    for name in ("tg_mean", "tx_days_above", "frost_days", "wetdays",
                 "growing_degree_days", "maximum_consecutive_dry_days",
                 "hot_spell_frequency", "hot_spell_max_length", "tg90p",
                 "precip_accumulation", "daily_temperature_range"):
        assert name in registry, name
        assert getattr(atmos, name) is registry[name]


def test_tx_days_above_by_name(spark):
    # 10 days, 3 above 30
    vals = [25, 31, 28, 35, 29, 30, 32, 20, 22, 24]
    df = timeseries(spark, vals, start="2000-01-01")
    res = atmos.tx_days_above(df, tasmax="value", thresh=30, freq="YS",
                              cells=["cell"], missing=None)
    out = res.df.collect()
    assert len(out) == 1 and out[0]["tx_days_above"] == 3
    assert res.attrs["units"] == "days"
    assert "30" in res.attrs["long_name"]


def test_threshold_unit_conversion(spark):
    # data in kelvin; threshold quantified in degC converts at plan time
    vals = [300.0, 310.0, 280.0, 305.0]
    df = timeseries(spark, vals, start="2000-01-01")
    res = atmos.tx_days_above(df, tasmax="value", thresh="30 degC",
                              freq="YS", cells=["cell"], missing=None,
                              units={"tasmax": "K"})
    # 30 degC = 303.15 K -> 310 and 305 qualify
    assert res.df.collect()[0]["tx_days_above"] == 2


def test_growing_degree_days(spark):
    vals = [3.0, 5.0, 6.0, 4.0, 10.0]
    df = timeseries(spark, vals, start="2000-01-01")
    res = atmos.growing_degree_days(df, tas="value", thresh=4.0, freq="YS",
                                    cells=["cell"], missing=None)
    # (5-4) + (6-4) + (10-4) = 9
    assert res.df.collect()[0]["growing_degree_days"] == pytest.approx(9.0)


def test_heat_wave_frequency_bivariate(spark):
    tn = [20, 23, 23, 23, 20, 23, 23, 23, 20]
    tx = [28, 31, 31, 31, 28, 31, 31, 31, 28]
    df = timeseries(spark, tn, start="2000-01-01", var="tasmin_v")
    df2 = timeseries(spark, tx, start="2000-01-01", var="tasmax_v")
    wide = df.join(df2.select("cell", "time", "tasmax_v"), ["cell", "time"])
    res = atmos.heat_wave_frequency(
        wide, tasmin="tasmin_v", tasmax="tasmax_v",
        thresh_low=22.0, thresh_high=30.0, window=3, freq="YS",
        cells=["cell"], missing=None)
    assert res.df.collect()[0]["heat_wave_frequency"] == 2


def test_missing_mask_wired(spark):
    # 31-day january with 1 null -> missing_any nulls the period
    vals = [20.0] * 31
    vals[10] = None
    df = timeseries(spark, vals, start="2000-01-01")
    res = atmos.tg_mean(df, tas="value", freq="MS", cells=["cell"],
                        missing="any")
    row = res.df.collect()[0]
    assert row["tg_mean"] is None
    res2 = atmos.tg_mean(df, tas="value", freq="MS", cells=["cell"],
                         missing=None)
    assert res2.df.collect()[0]["tg_mean"] == pytest.approx(20.0)


def test_dtr_and_variability(spark):
    tn = [10.0, 10.0, 10.0, 10.0]
    tx = [15.0, 17.0, 15.0, 17.0]
    a = timeseries(spark, tn, start="2000-01-01", var="tn")
    b = timeseries(spark, tx, start="2000-01-01", var="tx")
    wide = a.join(b.select("cell", "time", "tx"), ["cell", "time"])
    dtr = atmos.daily_temperature_range(
        wide, tasmin="tn", tasmax="tx", freq="YS", cells=["cell"],
        missing=None)
    assert dtr.df.collect()[0]["daily_temperature_range"] == pytest.approx(6.0)
    vdtr = atmos.daily_temperature_range_variability(
        wide, tasmin="tn", tasmax="tx", freq="YS", cells=["cell"],
        missing=None)
    # diffs of (5,7,5,7): |2|,|2|,|2| -> mean 2
    assert vdtr.df.collect()[0][
        "daily_temperature_range_variability"] == pytest.approx(2.0)


def test_tg90p_through_registry(spark):
    from xclim_spark.operators import percentile as pc

    vals = [float(i % 50) for i in range(365)]
    df = timeseries(spark, vals, start="2001-01-01")
    per = pc.percentile_doy(df, "value", 0.9, window=5, cells=["cell"],
                            alias="per")
    res = atmos.tg90p(df, tas="value", per=per, freq="YS", cells=["cell"],
                      missing=None)
    row = res.df.collect()[0]
    assert row["tg90p"] >= 0  # plan executes; value checked in oracle query


def test_from_dict_and_yaml_module(spark):
    yml = """
indicators:
  my_hot_days:
    base: tx_days_above
    parameters:
      thresh: "35.0"
  plain_mean:
    realm: generic
    compute: resample_op
    units: "1"
    input: {data: data}
    parameters:
      op: {default: mean, kind: string}
      freq: {default: YS, kind: freq}
"""
    mod = build_indicator_module_from_yaml("testmod", yml)
    assert len(mod) == 2
    vals = [30.0, 36.0, 40.0, 20.0]
    df = timeseries(spark, vals, start="2000-01-01")
    out = mod.my_hot_days(df, tasmax="value", freq="YS", cells=["cell"],
                          missing=None)
    assert out.df.collect()[0]["my_hot_days"] == 2
    m = mod.plain_mean(df, data="value", freq="YS", cells=["cell"])
    assert m.df.collect()[0]["plain_mean"] == pytest.approx(31.5)


def test_unexpected_arg_raises(spark):
    df = timeseries(spark, [1.0], start="2000-01-01")
    with pytest.raises(TypeError):
        atmos.tg_mean(df, tas="value", bogus=1, cells=["cell"])


def test_icclim_virtual_module(spark):
    from xclim_spark.indicators import icclim, registry

    assert len(icclim) >= 25
    for name in ("SU", "FD", "CDD", "RX5day", "GD4", "TG", "R20mm"):
        assert name in registry, name
    vals = [20.0, 26.0, 30.0, 24.0, 28.0]
    df = timeseries(spark, vals, start="2000-01-01")
    out = icclim.SU(df, tasmax="value", freq="YS", cells=["cell"],
                    missing=None)
    assert out.df.collect()[0]["SU"] == 3
    # threshold override via YAML parameters: R20mm vs RR1
    pr = [0.5, 5.0, 15.0, 25.0, 30.0]
    dfp = timeseries(spark, pr, start="2000-01-01")
    assert icclim.RR1(dfp, pr="value", freq="YS", cells=["cell"],
                      missing=None).df.collect()[0]["RR1"] == 4
    assert icclim.R20mm(dfp, pr="value", freq="YS", cells=["cell"],
                        missing=None).df.collect()[0]["R20mm"] == 2
    # CSU rebinds the input variable to tasmax with its own threshold
    assert icclim.CSU(df, tasmax="value", freq="YS", cells=["cell"],
                      missing=None).df.collect()[0]["CSU"] == 2


def test_cli_end_to_end(spark, tmp_path):
    """Generated CLI: one subcommand per registry entry (reference
    cli.py:120-157)."""
    from xclim_spark.cli import build_parser, main

    p = build_parser()
    # a couple of generated subcommands exist
    help_text = p.format_help()
    assert "tx_days_above" in help_text
    inp = str(tmp_path / "in.parquet")
    outp = str(tmp_path / "out.parquet")
    vals = [25.0, 31.0, 35.0, 20.0]
    timeseries(spark, vals, start="2000-01-01").write.parquet(inp)
    rc = main([
        "tx_days_above", "-i", inp, "-o", outp,
        "--map", "tasmax=value", "--cells", "cell",
        "--thresh", "30", "--freq", "YS", "--master", "local[2]",
    ])
    assert rc == 0
    back = spark.read.parquet(outp).collect()
    assert back[0]["tx_days_above"] == 2
