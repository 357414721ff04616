"""Bias-adjustment tests (semantics per Cannon et al. 2015 / the
reference's delegated xsdba surface)."""

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from xclim_spark import sdba


def _series(spark, values, start="2000-01-01", cell=0):
    y, m, d = map(int, start.split("-"))
    t0 = dt.date(y, m, d)
    rows = [(cell, t0 + dt.timedelta(days=i), float(v))
            for i, v in enumerate(values)]
    return spark.createDataFrame(rows, "cell INT, time DATE, v DOUBLE")


def test_eqm_recovers_constant_shift(spark):
    rng = np.random.RandomState(0)
    ref_v = rng.normal(20.0, 5.0, 300)
    hist_v = ref_v + 3.0          # biased by exactly +3
    sim_v = rng.normal(23.0, 5.0, 200)
    ref, hist, sim = (_series(spark, v) for v in (ref_v, hist_v, sim_v))
    eqm = sdba.EmpiricalQuantileMapping(nquantiles=15, kind="+")
    eqm.train(ref, hist, "v", cells=["cell"])
    out = eqm.adjust(sim, "v", cells=["cell"]).collect()
    got = np.array([r["v_adj"] for r in out])
    assert np.allclose(got, sim_v - 3.0, atol=1e-9)


def test_eqm_multiplicative_recovers_scale(spark):
    rng = np.random.RandomState(1)
    ref_v = rng.gamma(2.0, 3.0, 300) + 0.1
    hist_v = ref_v * 2.0          # 2x wet bias
    sim_v = rng.gamma(2.0, 3.0, 200) * 2.0 + 0.1
    ref, hist, sim = (_series(spark, v) for v in (ref_v, hist_v, sim_v))
    eqm = sdba.EmpiricalQuantileMapping(nquantiles=15, kind="*")
    eqm.train(ref, hist, "v", cells=["cell"])
    out = eqm.adjust(sim, "v", cells=["cell"]).collect()
    got = np.array([r["v_adj"] for r in out])
    assert np.allclose(got, sim_v / 2.0, rtol=1e-9)


def test_eqm_adjusting_hist_reproduces_ref_quantiles(spark):
    rng = np.random.RandomState(2)
    ref_v = rng.normal(10.0, 2.0, 400)
    hist_v = rng.normal(14.0, 3.0, 400)   # different mean AND spread
    ref, hist = _series(spark, ref_v), _series(spark, hist_v)
    eqm = sdba.EmpiricalQuantileMapping(nquantiles=50, kind="+")
    eqm.train(ref, hist, "v", cells=["cell"])
    out = eqm.adjust(hist, "v", cells=["cell"]).collect()
    got = np.array([r["v_adj"] for r in out])
    for p in (25, 50, 75):
        assert abs(np.percentile(got, p)
                   - np.percentile(ref_v, p)) < 0.4


def test_eqm_monthly_grouping(spark):
    # bias of +1 in January, +5 in February
    days = 59
    ref_v = [10.0] * days
    hist_v = [11.0 if i < 31 else 15.0 for i in range(days)]
    ref, hist = _series(spark, ref_v), _series(spark, hist_v)
    eqm = sdba.EmpiricalQuantileMapping(nquantiles=5, kind="+",
                                        group="time.month")
    eqm.train(ref, hist, "v", cells=["cell"])
    out = eqm.adjust(hist, "v", cells=["cell"]).orderBy("time").collect()
    assert all(abs(r["v_adj"] - 10.0) < 1e-9 for r in out)


def test_qdm_preserves_sim_extremes_shape(spark):
    rng = np.random.RandomState(3)
    ref_v = rng.normal(0.0, 1.0, 500)
    hist_v = rng.normal(1.0, 1.0, 500)
    # future sim: shifted AND wider than hist
    sim_v = rng.normal(3.0, 2.0, 500)
    ref, hist, sim = (_series(spark, v) for v in (ref_v, hist_v, sim_v))
    qdm = sdba.QuantileDeltaMapping(nquantiles=30, kind="+")
    qdm.train(ref, hist, "v", cells=["cell"])
    out = qdm.adjust(sim, "v", cells=["cell"]).collect()
    got = np.array([r["v_adj"] for r in out])
    # bias (hist - ref = +1) removed around the median...
    assert abs(np.median(got) - (np.median(sim_v) - 1.0)) < 0.3
    # ...while the simulated widening survives (QDM's defining property)
    assert np.std(got) > 1.6


def test_dqm_passes_trend_through(spark):
    rng = np.random.RandomState(4)
    base = rng.normal(10.0, 1.0, 400)
    ref, hist = _series(spark, base), _series(spark, base + 2.0)
    trend = np.linspace(0.0, 6.0, 400)          # strong warming
    sim_v = base + 2.0 + trend
    sim = _series(spark, sim_v)
    dqm = sdba.DetrendedQuantileMapping(nquantiles=20, kind="+")
    dqm.train(ref, hist, "v", cells=["cell"])
    out = dqm.adjust(sim, "v", cells=["cell"]).orderBy("time").collect()
    got = np.array([r["v_adj"] for r in out])
    # bias removed: ~base + trend
    resid = got - (base + trend)
    assert abs(resid.mean()) < 0.15
    # trend preserved: OLS slope of adjusted ~ slope of sim
    t = np.arange(400, dtype=float)
    slope = np.polyfit(t, got, 1)[0]
    assert abs(slope - 6.0 / 399.0) < 0.002


def test_scaling(spark):
    ref = _series(spark, [10.0, 12.0, 14.0])
    hist = _series(spark, [20.0, 22.0, 24.0])
    sim = _series(spark, [30.0, 40.0, 50.0])
    sc = sdba.Scaling(kind="+")
    sc.train(ref, hist, "v", cells=["cell"])
    out = sc.adjust(sim, "v", cells=["cell"]).orderBy("time").collect()
    assert [r["v_adj"] for r in out] == [20.0, 30.0, 40.0]


def test_grouper_and_kind_validation():
    with pytest.raises(ValueError):
        sdba.EmpiricalQuantileMapping(kind="/")
    with pytest.raises(ValueError):
        sdba.Grouper("time.dayofyear").key("time")
    eqm = sdba.EmpiricalQuantileMapping()
    with pytest.raises(ValueError):
        eqm.adjust(None, "v")


def test_loci_matches_frequency_and_intensity(spark):
    """LOCI on identical ref==hist must be the identity on wet days; on
    a uniformly scaled hist it must restore the reference wet mean."""
    import numpy as np

    from xclim_spark import sdba
    from xclim_spark.testing import timeseries

    rng = np.random.default_rng(7)
    vals = [float(v) for v in rng.gamma(2.0, 8.0, 200)]
    d = timeseries(spark, vals, start="2000-01-01")
    ref = d.select("cell", "time", F.col("value").alias("v"))
    hist = d.select("cell", "time", (F.col("value") * 1.5).alias("v"))
    loci = sdba.LOCI(thresh=10.0, group="time")
    tr = loci.train(ref, hist, "v", cells=["cell"]).collect()[0]
    # frequency matching: hist_thresh is the hist quantile at ref's dry
    # fraction -> approx 1.5x the ref threshold for a scaled dist
    assert tr["hist_thresh"] == pytest.approx(15.0, rel=0.15)
    adj = loci.adjust(hist, "v", cells=["cell"])
    got = adj.select(F.avg(F.when(F.col("v_adj") >= 10.0, F.col("v_adj")))
                     .alias("m")).collect()[0]["m"]
    want = ref.select(F.avg(F.when(F.col("v") >= 10.0, F.col("v")))
                      .alias("m")).collect()[0]["m"]
    assert got == pytest.approx(want, rel=0.05)


def test_properties_and_measures(spark):
    import numpy as np

    from xclim_spark import sdba
    from xclim_spark.testing import timeseries

    # linear series: known mean, trend=slope, acf1 ~ 1
    vals = [float(10 + 0.5 * i) for i in range(40)]
    d = timeseries(spark, vals, start="2000-01-01")
    p = sdba.properties(d, "value", cells=["cell"],
                        which=("mean", "std", "trend", "acf1", "wet_freq"),
                        wet_thresh=15.0).collect()[0]
    assert p["mean"] == pytest.approx(np.mean(vals))
    assert p["std"] == pytest.approx(np.std(vals, ddof=1))
    assert p["trend"] == pytest.approx(0.5)
    assert p["acf1"] == pytest.approx(1.0, abs=1e-6)
    assert p["wet_freq"] == pytest.approx(np.mean(np.array(vals) >= 15.0))

    d2 = timeseries(spark, [v * 2 for v in vals], start="2000-01-01")
    p2 = sdba.properties(d2, "value", cells=["cell"], which=("mean", "std"))
    m = sdba.measures(p2, sdba.properties(d, "value", cells=["cell"],
                                          which=("mean", "std")),
                      keys=["cell", "grp"], stats=["mean", "std"],
                      kind="*").collect()[0]
    assert m["mean_ratio"] == pytest.approx(2.0)
    assert m["std_ratio"] == pytest.approx(2.0)


def test_jitter_under_thresh(spark):
    import datetime as dt
    from xclim_spark import sdba

    rows = [(0, dt.date(2000, 1, 1) + dt.timedelta(days=i),
             0.0 if i % 2 == 0 else 5.0 + i) for i in range(40)]
    df = spark.createDataFrame(rows, "cell INT, time DATE, v DOUBLE")
    out = sdba.jitter_under_thresh(df, "v", thresh=1.0, cells=["cell"])
    got = {r["time"]: r["v"] for r in out.collect()}
    for (c, d, orig) in rows:
        if orig == 0.0:
            assert 0.0 <= got[d] < 1.0 and got[d] != 0.0
        else:
            assert got[d] == orig
    # deterministic: second run identical
    got2 = {r["time"]: r["v"] for r in
            sdba.jitter_under_thresh(df, "v", thresh=1.0,
                                     cells=["cell"]).collect()}
    assert got == got2


def test_adapt_freq_matches_reference_dry_fraction(spark):
    import datetime as dt
    from xclim_spark import sdba

    n = 200
    rng = np.random.RandomState(3)
    wet = rng.gamma(2.0, 5.0, n) + 1.0
    ref_rows, sim_rows = [], []
    for i in range(n):
        d = dt.date(2000, 1, 1) + dt.timedelta(days=i)
        # ref: 20% dry; sim: 50% dry (drier simulation)
        ref_rows.append((0, d, 0.0 if i % 5 == 0 else float(wet[i])))
        sim_rows.append((0, d, 0.0 if i % 2 == 0 else float(wet[i])))
    ref = spark.createDataFrame(ref_rows, "cell INT, time DATE, v DOUBLE")
    sim = spark.createDataFrame(sim_rows, "cell INT, time DATE, v DOUBLE")
    simj = sdba.jitter_under_thresh(sim, "v", thresh=1.0, cells=["cell"])
    out = sdba.adapt_freq(ref, simj, "v", thresh=1.0, cells=["cell"])
    vals = np.array([r["v_ad"] for r in out.collect()])
    orig = np.array([r[2] for r in sim_rows])
    # dry fraction adapted from 0.5 down to ~ref's 0.2 (rank granularity)
    assert abs((vals < 1.0).mean() - 0.2) < 0.02
    # untouched wet days preserved exactly
    kept = orig >= 1.0
    got_wet = np.array(sorted(vals[vals >= 1.0]))
    # the new drizzle lies in [thresh, pth): below ref's wet quantile
    drizzle = vals[(vals >= 1.0) & ~np.isin(
        np.round(vals, 9), np.round(orig[kept], 9))]
    pth = np.quantile(np.array([r[2] for r in ref_rows]), 0.5)
    assert (drizzle >= 1.0).all() and (drizzle <= pth + 1e-9).all()
    assert len(got_wet) == kept.sum() + len(drizzle)


def test_adapt_freq_noop_when_sim_not_drier(spark):
    import datetime as dt
    from xclim_spark import sdba

    rows = [(0, dt.date(2000, 1, 1) + dt.timedelta(days=i),
             float(i % 7)) for i in range(70)]
    ref = spark.createDataFrame(rows, "cell INT, time DATE, v DOUBLE")
    out = sdba.adapt_freq(ref, ref, "v", thresh=1.0, cells=["cell"])
    assert all(r["v_ad"] == r["v"] for r in out.collect())
