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


def test_new_registry_entries():
    for name in ("warm_spell_duration_index", "cold_spell_duration_index",
                 "growing_season_end", "growing_season_length",
                 "frost_free_season_start", "last_spring_frost",
                 "dry_spell_frequency", "wet_spell_max_length",
                 "liquid_precip_ratio", "rprctot", "windy_days",
                 "snd_season_length", "base_flow_index", "sea_ice_area"):
        assert name in registry, name


def test_growing_season_end_and_length(spark):
    from xclim_spark.indicators import atmos as A

    # warm May-Sep (tas 10), cold otherwise: season start at the first
    # 6-day warm run (May 1 = doy 122 in 2001), end at the first 5-day
    # cold run after Jul 1 (Oct 1 = doy 274)
    vals = []
    import datetime as dt
    for d in range(365):
        day = dt.date(2001, 1, 1) + dt.timedelta(days=d)
        vals.append(10.0 if 5 <= day.month <= 9 else -2.0)
    df = timeseries(spark, vals, start="2001-01-01")
    end = A.growing_season_end(df, tas="value", cells=["cell"],
                               missing=None).df.collect()[0]
    assert end["growing_season_end"] == 274
    length = A.growing_season_length(df, tas="value", cells=["cell"],
                                     missing=None).df.collect()[0]
    # May 1 .. Sep 30 inclusive = 153 days
    assert length["growing_season_length"] == 153


def test_frost_season_and_spring_frost(spark):
    import datetime as dt

    # frost until Apr 10 (doy 100) and from Oct 20 (doy 293)
    vals = []
    for d in range(365):
        doy = d + 1
        vals.append(-3.0 if doy <= 100 or doy >= 293 else 5.0)
    df = timeseries(spark, vals, start="2001-01-01")
    from xclim_spark.indicators import atmos as A

    start = A.frost_free_season_start(df, tasmin="value", cells=["cell"],
                                      missing=None).df.collect()[0]
    assert start["frost_free_season_start"] == 101
    last = A.last_spring_frost(df, tasmin="value", cells=["cell"],
                               missing=None).df.collect()[0]
    assert last["last_spring_frost"] == 100
    first_fall = A.first_fall_frost(df, tasmin="value", cells=["cell"],
                                    missing=None).df.collect()[0]
    assert first_fall["first_fall_frost"] == 293
    ffl = A.frost_free_season_length(df, tasmin="value", cells=["cell"],
                                     missing=None).df.collect()[0]
    # doys 101..292 inclusive = 192 days
    assert ffl["frost_free_season_length"] == 192


def test_dry_wet_spell_family(spark):
    # pr: 10 wet days, 9 dry days, 10 wet, rest dry
    vals = [5.0] * 10 + [0.0] * 9 + [5.0] * 10 + [0.0] * 11
    df = timeseries(spark, vals, start="2001-01-01")
    from xclim_spark.indicators import atmos as A

    freqy = A.dry_spell_frequency(df, pr="value", cells=["cell"],
                                  missing=None).df.collect()[0]
    # 3-day rolling sums < 1mm: two dry stretches -> 2 events
    assert freqy["dry_spell_frequency"] == 2
    wmax = A.wet_spell_max_length(df, pr="value", cells=["cell"],
                                  missing=None).df.collect()[0]
    # window=1, 1-day sums >= 1mm: longest wet run = 10 (+1 day whose
    # 1-day sum is its own: exactly the wet runs)
    assert wmax["wet_spell_max_length"] == 10


def test_csdi_wsdi(spark):
    import numpy as np

    from xclim_spark.indicators import atmos as A
    from xclim_spark.operators.percentile import percentile_doy

    rng = np.random.RandomState(3)
    base = 15 + 10 * np.sin(2 * np.pi * np.arange(365 * 6) / 365.25)
    vals = (base + rng.normal(0, 2, len(base))).tolist()
    df = timeseries(spark, vals, start="1998-01-01")
    per = percentile_doy(df, "value", 0.9, window=5, cells=["cell"])
    out = A.warm_spell_duration_index(df, tasmax="value", per=per,
                                      cells=["cell"],
                                      missing=None).df.collect()
    got = {r["period"].year: r["warm_spell_duration_index"] for r in out}
    assert set(got) == set(range(1998, 2004))
    # WSDI counts only days inside >=6-day exceedance runs: bounded by
    # the total exceedance count (~10% of 365) and usually small
    assert all(0 <= v <= 60 for v in got.values())


def test_liquid_precip_ratio_and_rprctot(spark):
    import datetime as dt

    # pr constant 2 mm; tas below freezing for the first 20 days
    rows = []
    for d in range(40):
        day = dt.date(2001, 1, 1) + dt.timedelta(days=d)
        rows.append((1, day, 2.0, -5.0 if d < 20 else 5.0))
    df = spark.createDataFrame(
        rows, "cell int, time date, pr double, tas double")
    from xclim_spark.indicators import atmos as A

    out = A.liquid_precip_ratio(df, pr="pr", tas="tas", freq="YS",
                                cells=["cell"], missing=None).df.collect()[0]
    assert out["liquid_precip_ratio"] == pytest.approx(0.5)

    # rprctot: half the days have pr >= 3 -> those carry all of their sum
    rows2 = [(1, dt.date(2001, 1, 1) + dt.timedelta(days=d),
              4.0 if d % 2 == 0 else 0.5) for d in range(40)]
    df2 = spark.createDataFrame(rows2, "cell int, time date, pr double")
    out2 = A.rprctot(df2, pr="pr", freq="YS", cells=["cell"],
                     missing=None).df.collect()[0]
    assert out2["rprctot"] == pytest.approx(4.0 * 20 / (4.0 * 20 + 0.5 * 20))


def test_snow_indicators(spark):
    import datetime as dt

    from xclim_spark.indicators import land as L

    # snow depth 10cm from Nov 15 2000 to Mar 31 2001 (YS-JUL year
    # starting 2000-07-01), else 0
    rows = []
    for d in range(365):
        day = dt.date(2000, 7, 1) + dt.timedelta(days=d)
        snd = 10.0 if (dt.date(2000, 11, 15) <= day <=
                       dt.date(2001, 3, 31)) else 0.0
        rows.append((1, day, snd))
    df = spark.createDataFrame(rows, "cell int, time date, snd double")
    length = L.snd_season_length(df, snd="value", cells=["cell"],
                                 missing=None, units={"snd": "cm"},
                                 snd_col="snd") if False else \
        L.snd_season_length(df, snd="snd", cells=["cell"], missing=None)
    row = length.df.collect()[0]
    # Nov 15..Mar 30 (end = first 14-day snow-free run start, Apr 1)
    assert row["snd_season_length"] == pytest.approx(137, abs=2)

    melt_rows = []
    for d in range(365):
        day = dt.date(2000, 7, 1) + dt.timedelta(days=d)
        swe = max(0.0, 100.0 - 4.0 * max(0, d - 250))
        melt_rows.append((1, day, swe))
    dfm = spark.createDataFrame(melt_rows,
                                "cell int, time date, snw double")
    m = L.snow_melt_we_max(dfm, snw="snw", cells=["cell"],
                           missing=None).df.collect()[0]
    assert m["snow_melt_we_max"] == pytest.approx(12.0)  # 3-day max melt


def test_sea_ice_area_extent(spark):
    import datetime as dt

    from xclim_spark.indicators import seaIce

    day = dt.date(2001, 1, 1)
    rows = [(c, day, conc, 100.0) for c, conc in
            enumerate([0.9, 0.5, 0.10, 0.0])]
    df = spark.createDataFrame(
        rows, "cell int, time date, siconc double, areacello double")
    area = seaIce.sea_ice_area(df, siconc="siconc", areacello="areacello",
                               missing=None).df.collect()[0]
    assert area["sea_ice_area"] == pytest.approx((0.9 + 0.5) * 100.0)
    ext = seaIce.sea_ice_extent(df, siconc="siconc", areacello="areacello",
                                missing=None).df.collect()[0]
    assert ext["sea_ice_extent"] == pytest.approx(200.0)


def test_streamflow_indicators(spark):
    import datetime as dt

    from xclim_spark.indicators import land as L

    rows = [(1, dt.date(2001, 1, 1) + dt.timedelta(days=d),
             10.0 + (5.0 if d == 100 else 0.0)) for d in range(365)]
    df = spark.createDataFrame(rows, "cell int, time date, q double")
    doy = L.doy_qmax(df, q="q", cells=["cell"], missing=None) \
        .df.collect()[0]
    assert doy["doy_qmax"] == 101


def test_cf_module_complete():
    from xclim_spark.indicators import cf

    assert len(cf) == 55
    for name in ("cdd", "cwd", "ctmgeTT", "ctxltTT", "cfd", "csu", "gd4",
                 "hd17", "gddgrowTT", "txx", "tnn", "tmmean", "dtr",
                 "maxdtr", "etr", "vdtr", "sdii", "fg", "fxx", "pp"):
        assert hasattr(cf, name), name


def test_cf_cdd_spell_length(spark):
    from xclim_spark.indicators import cf

    # dry (<1mm) runs: 3, then 2 -> cdd = 3
    vals = [0.0, 0.2, 0.5, 5.0, 2.0, 0.0, 0.1, 3.0, 1.5, 2.0]
    df = timeseries(spark, vals, start="2000-01-01")
    out = cf.cdd(df, pr="value", cells=["cell"], missing=None).df.collect()
    assert len(out) == 1 and out[0]["cdd"] == 3


def test_cf_tt_threshold_required(spark):
    from xclim_spark.indicators import cf

    # ctxgeTT: longest run of tasmax > threshold (threshold injected)
    vals = [21, 22, 23, 19, 25, 26, 18, 30, 10, 12]
    df = timeseries(spark, vals, start="2000-01-01")
    out = cf.ctxgeTT(df, tasmax="value", threshold="20 degree_Celsius",
                     cells=["cell"], missing=None).df.collect()
    assert out[0]["ctxgeTT"] == 3


def test_cf_statistics_and_ranges(spark):
    import datetime as dt

    from xclim_spark.indicators import cf

    vals = [5.0, 9.0, 3.0, 7.0]
    df = timeseries(spark, vals, start="2000-01-01")
    assert cf.txx(df, tasmax="value", cells=["cell"],
                  missing=None).df.collect()[0]["txx"] == 9.0
    assert cf.tnn(df, tasmin="value", cells=["cell"],
                  missing=None).df.collect()[0]["tnn"] == 3.0

    rows = [(1, dt.date(2001, 1, 1) + dt.timedelta(days=d),
             20.0 + d, 10.0 - d) for d in range(4)]
    two = spark.createDataFrame(
        rows, "cell int, time date, hi double, lo double")
    # etr = max(hi) - min(lo) = 23 - 7
    assert cf.etr(two, tasmax="hi", tasmin="lo", cells=["cell"],
                  missing=None).df.collect()[0]["etr"] == 16.0
    # dtr mean of (hi-lo): diffs 10,12,14,16 -> 13
    assert cf.dtr(two, tasmax="hi", tasmin="lo", cells=["cell"],
                  missing=None).df.collect()[0]["dtr"] == 13.0
    # vdtr mean |day-to-day dtr diff| = mean(2,2,2) = 2
    assert cf.vdtr(two, tasmax="hi", tasmin="lo", cells=["cell"],
                   missing=None).df.collect()[0]["vdtr"] == 2.0


def test_cf_sdii(spark):
    from xclim_spark.indicators import cf

    vals = [0.0, 4.0, 0.5, 6.0, 0.0, 2.0]
    df = timeseries(spark, vals, start="2000-01-01")
    out = cf.sdii(df, pr="value", cells=["cell"], missing=None).df.collect()
    assert out[0]["sdii"] == 4.0


def test_anuclim_module(spark):
    import datetime as dt

    from xclim_spark.indicators import anuclim as A

    assert len(A) == 19

    # two years of monthly-constant data: tas ramps by month, pr inverse
    rows = []
    for y in (2001, 2002):
        for m in range(1, 13):
            t0 = dt.date(y, m, 1)
            ndays = (dt.date(y + (m == 12), (m % 12) + 1, 1) - t0).days
            for d in range(ndays):
                rows.append((1, t0 + dt.timedelta(days=d),
                             float(m), float(13 - m)))
    df = spark.createDataFrame(rows, "cell int, time date, t double, p double")

    # P1: annual mean of tas = mean weighted by month lengths
    p1 = A.P1_AnnMeanTemp(df, tas="t", cells=["cell"],
                          missing=None).df.collect()
    assert len(p1) == 2 and p1[0]["P1_AnnMeanTemp"] == pytest.approx(
        sum(m * (dt.date(2001 + (m == 12), (m % 12) + 1, 1)
                 - dt.date(2001, m, 1)).days for m in range(1, 13)) / 365)

    # P10: warmest quarter = Oct-Dec -> mean(10,11,12) = 11
    p10 = A.P10_MeanTempWarmestQuarter(df, tas="t", cells=["cell"],
                                       missing=None).df.collect()
    assert all(abs(r["P10_MeanTempWarmestQuarter"] - 11.0) < 1e-9
               for r in p10)
    # P11: coldest quarter = Jan-Mar -> 2
    p11 = A.P11_MeanTempColdestQuarter(df, tas="t", cells=["cell"],
                                       missing=None).df.collect()
    assert all(abs(r["P11_MeanTempColdestQuarter"] - 2.0) < 1e-9
               for r in p11)

    # P8: wettest quarter (pr peaks Jan-Mar) -> tas mean = 2
    p8 = A.P8_MeanTempWettestQuarter(df, tas="t", pr="p", cells=["cell"],
                                     missing=None).df.collect()
    assert all(abs(r["P8_MeanTempWettestQuarter"] - 2.0) < 1e-9 for r in p8)

    # P14: driest period (monthly sums; December: 1.0/day * 31)
    p14 = A.P14_PrecipDriestPeriod(df, pr="p", cells=["cell"],
                                   missing=None).df.collect()
    assert all(r["P14_PrecipDriestPeriod"] == pytest.approx(31.0)
               for r in p14)

    # P7: annual extreme range = 12 - 1 = 11
    p7 = A.P7_TempAnnualRange(df, tasmax="t", tasmin="t", cells=["cell"],
                              missing=None).df.collect()
    assert all(r["P7_TempAnnualRange"] == pytest.approx(11.0) for r in p7)


def test_atmos_batch_variants(spark):
    import datetime as dt

    vals = [5, -2, 3, -1, 0, 2, 6, -3, 1, 4]
    df = timeseries(spark, vals, start="2000-01-01")
    assert atmos.tg_days_above(df, tas="value", thresh=0.0, cells=["cell"],
                               missing=None).df.collect()[0][2] == 6
    assert atmos.freezing_degree_days(
        df, tas="value", cells=["cell"],
        missing=None).df.collect()[0][2] == pytest.approx(6.0)
    assert atmos.thawing_degree_days(
        df, tas="value", cells=["cell"],
        missing=None).df.collect()[0][2] == pytest.approx(21.0)
    assert atmos.first_day_tg_above(df, tas="value", cells=["cell"],
                                    missing=None).df.collect()[0][2] == 1
    assert atmos.wetdays_prop(
        df, pr="value", thresh=3.0, cells=["cell"],
        missing=None).df.collect()[0][2] == pytest.approx(0.4)
    assert atmos.tx_mean(df, tasmax="value", cells=["cell"],
                         missing=None).df.collect()[0][2] == \
        pytest.approx(1.5)

    rows = [(1, dt.date(2001, 1, 1) + dt.timedelta(days=d),
             float(hi), float(lo)) for d, (hi, lo) in
            enumerate([(5, -1), (3, -2), (-1, -5), (4, 1), (6, -1)])]
    two = spark.createDataFrame(rows,
                                "cell int, time date, tx double, tn double")
    assert atmos.daily_freezethaw_cycles(
        two, tasmax="tx", tasmin="tn", cells=["cell"],
        missing=None).df.collect()[0][2] == 3
    assert atmos.freezethaw_spell_mean_length(
        two, tasmax="tx", tasmin="tn", cells=["cell"],
        missing=None).df.collect()[0][2] == pytest.approx(1.5)
    assert atmos.freezethaw_spell_frequency(
        two, tasmax="tx", tasmin="tn", cells=["cell"],
        missing=None).df.collect()[0][2] == 2
    assert atmos.snd_storm_days(two, snd="tx", thresh=2.0, cells=["cell"],
                                missing=None).df.collect()[0][2] == 2
    assert atmos.last_snowfall(two, prsn="tx", thresh=3.5, cells=["cell"],
                               missing=None).df.collect()[0][2] == 5
    assert atmos.tx_tn_days_above(
        two, tasmax="tx", tasmin="tn", thresh_high=3.0, thresh_low=0.0,
        cells=["cell"], missing=None).df.collect()[0][2] == 1


def test_convert_realm(spark):
    import datetime as dt

    from xclim_spark.indicators import convert as C

    assert len(C) == 33  # 28 + 5 reference short-identifier aliases

    day = dt.date(2000, 7, 6)
    df = spark.createDataFrame(
        [(1, day, 30.0, 25.0 + 273.15, 70.0, 101325.0, 0.005, 3.0, 4.0)],
        "cell int, time date, t double, td double, h double, p double,"
        " q double, u double, v double")

    # humidex at T=30, Td=25 ~ 42 (definition table)
    out = C.humidex(df, tas="t", tdps="td", cells=["cell"]).df.collect()
    assert out[0]["humidex"] == pytest.approx(42.3, abs=0.5)

    # tuple output: wind speed + direction
    out = C.wind_speed_from_vector(df, uas="u", vas="v",
                                   cells=["cell"]).df.collect()
    assert out[0]["sfcWind"] == pytest.approx(5.0)
    assert set(out[0].asDict()) == {"cell", "time", "sfcWind",
                                    "sfcWindfromdir"}

    # rh from specific humidity: q=0.005 at 30degC ~ 18.7%
    out = C.relative_humidity(
        df.withColumn("tk", F.col("t") + 273.15), tas="tk", huss="q",
        ps="p", cells=["cell"]).df.collect()
    assert out[0]["relative_humidity"] == pytest.approx(18.7, abs=1.0)

    # water budget with given PET
    df2 = spark.createDataFrame(
        [(1, day, 10.0, 4.0)],
        "cell int, time date, rain double, pet double")
    out = C.water_budget(df2, pr="rain", evspsblpot="pet",
                         cells=["cell"]).df.collect()
    assert out[0]["water_budget"] == pytest.approx(6.0)

    # PET hargreaves85 produces a positive mm/day value
    df3 = spark.createDataFrame(
        [(1, day, 45.0, 12.0, 25.0)],
        "cell int, time date, la double, tn double, tx double")
    out = C.potential_evapotranspiration(
        df3, lat="la", tasmin="tn", tasmax="tx", cells=["cell"]).df.collect()
    assert 2.0 < out[0]["potential_evapotranspiration"] < 10.0


def test_generic_land_wrapper_indicators(spark):
    import datetime as dt
    import math

    from xclim_spark.indicators import generic, land

    rows = [(1, dt.date(1990 + y, 6, 1) + dt.timedelta(days=d),
             10.0 + math.sin(y * 2.1) * 3 + d * 0.01)
            for y in range(30) for d in range(50)]
    df = spark.createDataFrame(rows, "cell int, time date, v double")
    out = generic.return_level(df, data="v", t=20, cells=["cell"]).df \
        .collect()
    assert len(out) == 1 and 13.0 < out[0]["return_level"] < 16.0
    out = generic.fit(df, data="v", dist="norm", cells=["cell"]).df \
        .collect()
    assert out[0]["dparams"][0] == pytest.approx(10.237, abs=0.01)
    out = generic.stats(df, data="v", op="max", cells=["cell"],
                        missing=None).df.collect()
    assert len(out) == 30

    rows = [(1, dt.date(2001, 1, 1) + dt.timedelta(days=d), float(p),
             float(t)) for d, (p, t) in
            enumerate([(5, 2), (3, -1), (4, 1), (2, -3)])]
    pp = spark.createDataFrame(rows,
                               "cell int, time date, p double, t double")
    api = sorted(land.antecedent_precipitation_index(
        pp, pr="p", cells=["cell"]).df.collect(), key=lambda r: r[1])
    assert api[1][2] == pytest.approx(3 + 5 * 0.935)
    rr = land.runoff_ratio(pp, q="p", pr="t", cells=["cell"],
                           missing=None).df.collect()
    assert rr[0][2] == pytest.approx(-14.0)


def test_heat_spell_and_magnitude(spark):
    import datetime as dt

    rows = [(1, dt.date(2001, 1, 1) + dt.timedelta(days=d), float(tx),
             float(tn)) for d, (tx, tn) in
            enumerate([(35, 22), (36, 23), (35, 21), (20, 10), (34, 22),
                       (36, 21), (35, 22), (10, 5)])]
    two = spark.createDataFrame(rows,
                                "cell int, time date, tx double, tn double")
    assert atmos.heat_spell_frequency(
        two, tasmax="tx", tasmin="tn", cells=["cell"],
        missing=None).df.collect()[0][2] == 2
    assert atmos.hot_spell_max_magnitude(
        two, tasmax="tx", cells=["cell"],
        missing=None).df.collect()[0][2] == pytest.approx(31.0)


def test_precip_phase_indicators(spark):
    import datetime as dt

    rows = [(1, dt.date(2001, 1, 1) + dt.timedelta(days=d), float(p),
             float(t)) for d, (p, t) in
            enumerate([(5, 2), (3, -1), (4, 1), (2, -3)])]
    pp = spark.createDataFrame(rows,
                               "cell int, time date, p double, t double")
    assert atmos.liquid_precip_accumulation(
        pp, pr="p", tas="t", cells=["cell"],
        missing=None).df.collect()[0][2] == pytest.approx(9.0)
    assert atmos.solid_precip_accumulation(
        pp, pr="p", tas="t", cells=["cell"],
        missing=None).df.collect()[0][2] == pytest.approx(5.0)
    assert atmos.solid_precip_average(
        pp, pr="p", tas="t", cells=["cell"],
        missing=None).df.collect()[0][2] == pytest.approx(2.5)


def test_fire_wrapper_indicators(spark):
    import datetime as dt

    rows = [(1, dt.date(2001, 6, 1) + dt.timedelta(days=d), 20.0 + d % 5,
             28.0 + d % 4, 1.0 if d % 6 == 0 else 0.0, 45.0, 15.0)
            for d in range(40)]
    df = spark.createDataFrame(
        rows, "cell int, time date, t double, tx double, p double,"
              " h double, w double")
    dc = atmos.drought_code(df, tas="t", pr="p", hurs="h", sfcWind="w",
                            cells=["cell"]).df
    assert dc.count() == 40 and dc.columns[-1] == "drought_code"
    ff = atmos.mcarthur_forest_fire_danger_index(
        df, pr="p", tasmax="tx", hurs="h", sfcWind="w", cells=["cell"]).df
    row = ff.orderBy("time").collect()[-1]
    assert row["mcarthur_forest_fire_danger_index"] > 0.0


def test_final_batch_indicators(spark):
    import datetime as dt

    from xclim_spark.indicators import land, registry

    # full reference name coverage except the 3 hardest
    import glob as _g
    import re as _re
    allref = set()
    for f in _g.glob('/root/reference/src/xclim/indicators/**/*.py',
                     recursive=True):
        for m in _re.finditer(r'^([a-z][a-z0-9_]*)\s*=\s*[A-Z][A-Za-z_]*\(',
                              open(f).read(), _re.M):
            allref.add(m.group(1))
    missing = allref - set(registry)
    assert missing <= {"dryness_index", "jetstream_metric_woollings",
                       "rain_season"}, missing

    df = spark.createDataFrame([(1, dt.date(2001, 7, 1), 25.0, 15.0, 20.0)],
                               "cell int, time date, tx double, tn double,"
                               " tg double")
    r = atmos.cooling_degree_days_approximation(
        df, tasmax="tx", tasmin="tn", tas="tg", cells=["cell"],
        missing=None).df.collect()
    assert r[0][2] == pytest.approx(2.75)

    df2 = spark.createDataFrame([(1, dt.date(2001, 7, 1), 14.0, 24.0)],
                                "cell int, time date, tn double, tx double")
    r = atmos.corn_heat_units(df2, tasmin="tn", tasmax="tx",
                              cells=["cell"]).df.collect()
    assert r[0][2] == pytest.approx(23.682)

    rows = [(1, dt.date(2001, 1, 1) + dt.timedelta(days=d), 15.0, 21.0,
             45.0) for d in range(365)]
    df3 = spark.createDataFrame(rows, "cell int, time date, t double,"
                                " tx double, la double")
    r = atmos.huglin_index(df3, tas="t", tasmax="tx", lat="la",
                           cells=["cell"], missing=None).df.collect()
    assert r[0][2] == pytest.approx(8.32 * 183, rel=1e-9)

    # poleward of 50 deg, the indicator's cap_value default of 1.0
    # (reference _agro.py:157) keeps the sum finite: k=1 there
    df4 = spark.createDataFrame(
        [(1, dt.date(2001, 1, 1) + dt.timedelta(days=d), 15.0, 21.0, 60.0)
         for d in range(365)],
        "cell int, time date, t double, tx double, la double")
    r = atmos.huglin_index(df4, tas="t", tasmax="tx", lat="la",
                           cells=["cell"], missing=None).df.collect()
    assert r[0][2] == pytest.approx(8.0 * 183, rel=1e-9)
    r = atmos.huglin_index(df4, tas="t", tasmax="tx", lat="la",
                           cells=["cell"], missing=None,
                           cap_value=float("nan")).df.collect()
    import math
    assert r[0][2] is None or math.isnan(r[0][2])

    rows = [(1, dt.date(2001, 1, 1) + dt.timedelta(days=d),
             15.0 if 50 <= d < 200 else 2.0) for d in range(300)]
    df5 = spark.createDataFrame(rows, "cell int, time date, tx double")
    on = atmos.fire_season(df5, tasmax="tx",
                           cells=["cell"]).df.filter("fire_season").count()
    assert on == 150

    # rain-on-frozen: 7 frozen days then a warm rainy day
    rows = [(1, dt.date(2001, 1, 1) + dt.timedelta(days=d), p, t)
            for d, (p, t) in enumerate(
                [(0.0, -5.0)] * 7 + [(10.0, 2.0), (10.0, 2.0)])]
    df6 = spark.createDataFrame(rows, "cell int, time date, p double,"
                                " t double")
    r = atmos.rain_on_frozen_ground_days(
        df6, pr="p", tas="t", cells=["cell"], missing=None).df.collect()
    assert r[0][2] == 1  # only the first warm day qualifies


def test_reference_name_closure():
    # every named indicator instantiated by the reference's indicator
    # modules resolves in the registry (ref src/xclim/indicators/*)
    for name in ("sfcWind_max", "sfcWindmax_mean", "dryness_index",
                 "rain_season", "jetstream_metric_woollings"):
        assert name in registry, name


def test_wind_stats_by_name(spark):
    vals = [4.0, 9.0, 2.0, 7.0]
    df = timeseries(spark, vals, start="2000-01-01")
    res = registry["sfcWind_max"](df, data="value", freq="YS",
                                  cells=["cell"], missing=None)
    assert res.df.collect()[0]["sfcWind_max"] == 9.0
    assert res.attrs["units"] == "m s-1"


def test_reference_short_identifier_parity(spark):
    """The reference's short registry identifiers (dlyfrzthw, dtrmax,
    liquidprcptot, prlp, ...) must resolve and compute sensibly."""
    import datetime as dt

    from xclim_spark.indicators import registry

    for name in ("dlyfrzthw", "dtrmax", "dtrvar", "prcpavg", "wet_prcptot",
                 "liquidprcptot", "solidprcptot", "liquidprcpavg",
                 "solidprcpavg", "rain_frzgr", "e_sat", "hurs_fromdewpoint",
                 "huss_fromdewpoint", "tdps_from_huss", "prlp"):
        assert name in registry, name

    rows = []
    for i in range(60):
        d = dt.date(2001, 1, 1) + dt.timedelta(days=i)
        rows.append((0, d, -1.0 if i < 30 else 2.0, -5.0,
                     5.0 if i % 2 == 0 else -2.0,
                     5.0 if i % 3 == 0 else 0.0))
    df = spark.createDataFrame(
        rows, "cell INT, time DATE, tas DOUBLE, tasmin DOUBLE, "
              "tasmax DOUBLE, pr DOUBLE")
    u = {"tas": "degC", "tasmin": "degC", "tasmax": "degC", "pr": "mm/d"}
    frzthw = registry["dlyfrzthw"](
        df, tasmin="tasmin", tasmax="tasmax", units=u, cells=["cell"],
        missing=None).df.collect()[0]
    assert frzthw["dlyfrzthw"] == 30          # even days cross freezing
    dtrmax = registry["dtrmax"](
        df, tasmin="tasmin", tasmax="tasmax", units=u, cells=["cell"],
        missing=None).df.collect()[0]
    assert dtrmax["dtrmax"] == 10.0
    liq = registry["liquidprcptot"](
        df, pr="pr", tas="tas", units=u, cells=["cell"],
        missing=None).df.collect()[0]
    sol = registry["solidprcptot"](
        df, pr="pr", tas="tas", units=u, cells=["cell"],
        missing=None).df.collect()[0]
    assert liq["liquidprcptot"] + sol["solidprcptot"] == 100.0
    assert liq["liquidprcptot"] == 50.0       # wet days in the warm half
    wet = registry["wet_prcptot"](
        df, pr="pr", units=u, cells=["cell"], missing=None).df.collect()[0]
    assert wet["wet_prcptot"] == 100.0
