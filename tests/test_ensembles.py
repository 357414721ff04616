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


def test_percentiles_all_six_methods_match_numpy(spark):
    """Parity table: every interpolation method the reference exposes
    (_base.py:214-375) against numpy's same-named estimator, on an
    uneven sample and off-grid percentiles."""
    vals = [[float(v)] for v in (3.1, 0.2, 7.7, 7.7, 1.5, 9.9, 4.4)]
    e = _ensemble(spark, vals)
    x = np.array([v[0] for v in vals])
    for method in ("linear", "interpolated_inverted_cdf", "hazen",
                   "weibull", "median_unbiased", "normal_unbiased"):
        out = ens.ensemble_percentiles(
            e, "value", (5, 25, 50, 75, 95), keys=["cell", "time"],
            method=method)
        row = out.collect()[0]
        for p in (5, 25, 50, 75, 95):
            assert row[f"value_p{p}"] == pytest.approx(
                np.percentile(x, p, method=method), rel=1e-12), \
                (method, p)


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


def test_hawkins_sutton_partitioning(spark):
    # value = (0.01 + dm)*(t-1950) + (0.02 + ds)*(t-1950) with model slopes
    # dm in {-e,0,e} and scenario slopes ds in {-f,f}: after quartic
    # smoothing (exact for a line) and baseline-anomaly removal,
    # model U(t) = var(dm) (t - tb)^2 and scenario U(t) = var(ds) (t - tb)^2
    import datetime as dt

    dm = {"m1": -0.002, "m2": 0.0, "m3": 0.002}
    ds = {"s1": -0.004, "s2": 0.004}
    rows = []
    for s, dsv in ds.items():
        for m, dmv in dm.items():
            for y in range(1950, 2101):
                v = (0.01 + dmv + dsv) * (y - 1950)
                rows.append((s, m, dt.date(y, 1, 1), v))
    df = spark.createDataFrame(rows,
                               "scenario STRING, model STRING, time DATE, "
                               "v DOUBLE")
    out = ens.hawkins_sutton(df, "v", baseline=(1971, 2000))
    rows_out = {r["time"].year: r for r in out.collect()}
    tb = (1971 + 2000) / 2
    y = 2080
    var_dm = np.var([-0.002, 0.0, 0.002])
    var_ds = np.var([-0.004, 0.004])
    got = rows_out[y]
    assert got["variability"] == pytest.approx(0.0, abs=1e-10)
    assert got["model"] == pytest.approx(var_dm * (y - tb) ** 2, rel=1e-6)
    assert got["scenario"] == pytest.approx(var_ds * (y - tb) ** 2,
                                            rel=1e-6)
    assert got["total"] == pytest.approx(got["model"] + got["scenario"],
                                         rel=1e-9)
    frac = ens.fractional_uncertainty(out).collect()
    fr = {r["time"].year: r for r in frac}[y]
    assert fr["model"] + fr["scenario"] == pytest.approx(1.0)


def test_kkz_and_kmeans_reduction():
    # 3 tight clusters of members; both reducers pick one per cluster
    rng = np.random.RandomState(0)
    centers = np.array([[0.0, 0.0], [10.0, 0.0], [0.0, 10.0]])
    X = np.vstack([c + rng.randn(4, 2) * 0.1 for c in centers])
    sel_kkz = ens.kkz_reduce_ensemble(X, 3)
    sel_km = ens.kmeans_reduce_ensemble(X, 3, seed=1)
    assert len(sel_kkz) == 3 and len(set(i // 4 for i in sel_kkz)) == 3
    assert len(sel_km) == 3 and len(set(i // 4 for i in sel_km)) == 3


def test_robustness_categories(spark):
    rows = [(1, 0.9, 0.9),    # robust signal
            (2, 0.3, 0.9),    # no change
            (3, 0.9, 0.5)]    # conflicting
    df = spark.createDataFrame(rows, "cell INT, changed DOUBLE, agree DOUBLE")
    out = {r["cell"]: (r["category"], r["category_name"])
           for r in ens.robustness_categories(df).collect()}
    assert out[1] == (1, "robust signal")
    assert out[2] == (2, "no change or no signal")
    assert out[3] == (3, "conflicting signal")


import datetime as dt


def _two_epochs(spark, shift=2.0, scale=1.0, n_members=8, n_steps=30,
                seed=3):
    rng = np.random.RandomState(seed)
    fut_rows, ref_rows = [], []
    for m in range(n_members):
        for y in range(n_steps):
            fut_rows.append((f"r{m}", "p1",
                             dt.date(2070, 1, 1) + dt.timedelta(days=30 * y),
                             float(shift + scale * rng.randn())))
            ref_rows.append((f"r{m}", "p1",
                             dt.date(1970, 1, 1) + dt.timedelta(days=30 * y),
                             float(rng.randn())))
    schema = "realization string, point string, time date, tas double"
    return (spark.createDataFrame(fut_rows, schema),
            spark.createDataFrame(ref_rows, schema))


def test_robustness_fractions_significance_tests(spark):
    # clear +1sigma mean shift: every mean-change test flags every member;
    # equal variances: Brown-Forsythe (a variance test) flags none
    fut, ref = _two_epochs(spark)
    for test in ("ttest", "welch-ttest", "mannwhitney-utest", "ipcc-ar6-c"):
        out = ens.robustness_fractions(
            fut, ref, "tas", keys=["point"], test=test).collect()[0]
        assert out["changed"] == 1.0, test
        assert out["positive"] == 1.0, test
        assert out["changed_positive"] == 1.0, test
    bf = ens.robustness_fractions(
        fut, ref, "tas", keys=["point"], test="brownforsythe-test"
    ).collect()[0]
    # equal variances: only alpha-level false positives allowed
    assert bf["changed"] <= 0.25


def test_robustness_fractions_no_change(spark):
    # identical distributions: ttest flags ~alpha fraction (allow slack)
    fut, ref = _two_epochs(spark, shift=0.0, seed=5)
    out = ens.robustness_fractions(
        fut, ref, "tas", keys=["point"], test="ttest").collect()[0]
    assert out["changed"] <= 0.3


def test_brownforsythe_detects_variance_change(spark):
    fut, ref = _two_epochs(spark, shift=0.0, scale=4.0, seed=7)
    out = ens.robustness_fractions(
        fut, ref, "tas", keys=["point"], test="brownforsythe-test"
    ).collect()[0]
    assert out["changed"] >= 0.8


def test_robustness_coefficient_ranges(spark):
    # tight agreement -> R near 1; same construction with huge spread -> lower
    fut, ref = _two_epochs(spark, shift=3.0, scale=0.1, seed=9)
    r_tight = ens.robustness_coefficient(
        fut, ref, "tas", keys=["point"]).collect()[0]["R"]
    fut2, ref2 = _two_epochs(spark, shift=3.0, scale=4.0, seed=9)
    r_loose = ens.robustness_coefficient(
        fut2, ref2, "tas", keys=["point"]).collect()[0]["R"]
    assert r_tight <= 1.0
    assert r_loose < r_tight
    assert r_tight > 0.9


def test_lafferty_sriver_partition_components(spark):
    # constructed ensemble: scenario trend spread dominates late-century,
    # model offsets give ~var_pop({-.5,0,.5})=0.167, downscaling ~0,
    # noise sigma=0.3 -> variability ~0.09
    rng = np.random.RandomState(11)
    rows = []
    for s, trend in (("ssp1", 0.01), ("ssp5", 0.05)):
        for m, off in (("m1", 0.0), ("m2", 0.5), ("m3", -0.5)):
            for d in ("d1", "d2"):
                for y in range(1980, 2100):
                    v = off + trend * (y - 1980) + 0.3 * rng.randn()
                    rows.append((s, m, d, dt.date(y, 1, 1), float(v)))
    df = spark.createDataFrame(
        rows, "scenario string, model string, downscaling string, "
              "time date, tas double")
    out = {r["time"]: r for r in
           ens.lafferty_sriver(df, "tas").collect()}
    mid = out[dt.date(2040, 1, 1)]
    assert abs(mid["model"] - 0.167) < 0.08
    assert mid["downscaling"] < 0.02
    assert 0.03 < mid["variability"] < 0.2
    late, early = out[dt.date(2095, 1, 1)], out[dt.date(1995, 1, 1)]
    assert late["scenario"] > early["scenario"] + 1.0
    assert abs(mid["total"] - (mid["model"] + mid["scenario"]
               + mid["downscaling"] + mid["variability"])) < 1e-9


def test_general_partition_defaults_match_lafferty(spark):
    rng = np.random.RandomState(13)
    rows = []
    for s in ("a", "b"):
        for m in ("m1", "m2"):
            for d in ("d1", "d2"):
                for y in range(2000, 2060):
                    rows.append((s, m, d, dt.date(y, 1, 1),
                                 float(rng.randn())))
    df = spark.createDataFrame(
        rows, "scenario string, model string, downscaling string, "
              "time date, tas double")
    a = ens.lafferty_sriver(df, "tas")
    b = ens.general_partition(df, "tas", var_first=["model", "downscaling"],
                              mean_first=["scenario"],
                              weights=["model", "downscaling"])
    da = {r["time"]: r["total"] for r in a.collect()}
    db = {r["time"]: r["total"] for r in b.collect()}
    for t, v in da.items():
        if v is not None and db[t] is not None:
            assert abs(v - db[t]) < 1e-9


def test_make_criteria_roundtrip(spark):
    df = spark.createDataFrame(
        [(2, 1.0, 5.0), (0, 3.0, 2.0), (1, 2.0, 4.0)],
        "realization INT, a DOUBLE, b DOUBLE")
    ids, mat = ens.make_criteria(df, ["a", "b"])
    assert ids == [0, 1, 2]
    assert mat == [[3.0, 2.0], [2.0, 4.0], [1.0, 5.0]]


# ---------------------------------------------------------------------------
# Ensemble filters (reference _filters.py) + weighted percentiles
# ---------------------------------------------------------------------------

def test_concat_hist(spark):
    import datetime as dt

    
    rows = []
    for y in (1990, 1991):
        rows.append(("historical", dt.date(y, 1, 1), float(y)))
    for scen in ("ssp245", "ssp370"):
        for y in (2020, 2021):
            rows.append((scen, dt.date(y, 1, 1), float(y)))
    df = spark.createDataFrame(rows, "scenario STRING, time DATE, v DOUBLE")
    out = ens.concat_hist(df, hist="historical").collect()
    assert len(out) == 8  # 2 hist years x 2 scens + 4 future rows
    scens = {r["scenario"] for r in out}
    assert scens == {"ssp245", "ssp370"}
    s245 = sorted(r["time"].year for r in out if r["scenario"] == "ssp245")
    assert s245 == [1990, 1991, 2020, 2021]


def test_model_in_all_scens(spark):
    rows = [
        ("ssp245", "A", 1, 1.0), ("ssp370", "A", 1, 1.0),
        ("ssp245", "B", 1, 1.0), ("ssp370", "B", 2, 1.0),
        ("ssp245", "C", 1, 1.0),              # C missing in ssp370
    ]
    df = spark.createDataFrame(
        rows, "scenario STRING, model STRING, member INT, v DOUBLE")
    out = ens.model_in_all_scens(df).collect()
    assert {r["model"] for r in out} == {"A", "B"}


def test_single_member(spark):
    rows = [
        ("ssp245", "A", 1, 1.0), ("ssp245", "A", 2, 2.0),
        ("ssp370", "A", 1, 3.0), ("ssp370", "A", 3, 4.0),
        ("ssp245", "B", 2, 5.0), ("ssp245", "B", 5, 6.0),
    ]
    df = spark.createDataFrame(
        rows, "scenario STRING, model STRING, member INT, v DOUBLE")
    out = ens.single_member(df).collect()
    picked = {(r["model"], r["scenario"]): r["member"] for r in out}
    assert picked == {("A", "ssp245"): 1, ("A", "ssp370"): 1,
                      ("B", "ssp245"): 2}
    assert len(out) == 3


def test_weighted_percentiles_equal_weights_match_hazen(spark):
    rows = [(0, "x", 1.0), (1, "x", 2.0), (2, "x", 3.0), (3, "x", 10.0)]
    df = spark.createDataFrame(rows, "realization INT, k STRING, v DOUBLE")
    w = ens.ensemble_percentiles(
        df, "v", (50,), keys=["k"],
        weights={0: 1.0, 1: 1.0, 2: 1.0, 3: 1.0}).collect()[0]
    h = ens.ensemble_percentiles(
        df, "v", (50,), keys=["k"], method="hazen").collect()[0]
    assert abs(w["v_p50"] - h["v_p50"]) < 1e-12


def test_weighted_percentiles_pull_toward_heavy_member(spark):
    rows = [(0, "x", 1.0), (1, "x", 2.0), (2, "x", 3.0)]
    df = spark.createDataFrame(rows, "realization INT, k STRING, v DOUBLE")
    hi = ens.ensemble_percentiles(
        df, "v", (50,), keys=["k"],
        weights={0: 1.0, 1: 1.0, 2: 10.0}).collect()[0]["v_p50"]
    lo = ens.ensemble_percentiles(
        df, "v", (50,), keys=["k"],
        weights={0: 10.0, 1: 1.0, 2: 1.0}).collect()[0]["v_p50"]
    assert hi > 2.5 and lo < 1.5


def test_weighted_percentiles_reject_other_methods(spark):
    df = spark.createDataFrame([(0, "x", 1.0)],
                               "realization INT, k STRING, v DOUBLE")
    import pytest

    with pytest.raises(ValueError):
        ens.ensemble_percentiles(df, "v", (50,), keys=["k"],
                                method="weibull", weights={0: 1.0})
