"""Stats tier tests (reference tests/test_stats.py style: known samples,
parameter recovery, distributional checks)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from xclim_spark.stats import distributions as D
from xclim_spark import stats
from xclim_spark.testing import timeseries


# ---------------------------------------------------------------------------
# numpy kernels
# ---------------------------------------------------------------------------

def test_probit_matches_stdlib():
    from statistics import NormalDist

    nd = NormalDist()
    qs = [1e-6, 0.001, 0.025, 0.3, 0.5, 0.7, 0.975, 0.999, 1 - 1e-6]
    got = D.probit(qs)
    want = [nd.inv_cdf(q) for q in qs]
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12)


def test_gammainc_known_values():
    # P(1, x) = 1 - e^-x (exponential); P(a, a) ~ 0.5 for large a
    x = np.array([0.1, 1.0, 3.0])
    np.testing.assert_allclose(D.gammainc_p(1.0, x), 1 - np.exp(-x),
                               rtol=1e-12)
    assert D.gammainc_p(100.0, np.array([100.0]))[0] == pytest.approx(
        0.513, abs=0.01)
    # half-integer case: P(0.5, x) = erf(sqrt(x))
    np.testing.assert_allclose(
        D.gammainc_p(0.5, x),
        [math.erf(math.sqrt(v)) for v in x], rtol=1e-10)


def test_gamma_ppf_roundtrip():
    for a in (0.5, 2.0, 7.3):
        q = np.array([0.05, 0.5, 0.95])
        x = D.ppf((a, 0.0, 1.0), "gamma", q)
        back = D.cdf((a, 0.0, 1.0), "gamma", x)
        np.testing.assert_allclose(back, q, rtol=1e-8)


def test_norm_fit_and_ppf():
    rng = np.random.RandomState(0)
    x = rng.normal(10.0, 3.0, 4000)
    loc, scale = D.fit_params(x, "norm", "ML")
    assert loc == pytest.approx(10.0, abs=0.2)
    assert scale == pytest.approx(3.0, abs=0.2)
    # PWM agrees
    loc2, scale2 = D.fit_params(x, "norm", "PWM")
    assert loc2 == pytest.approx(loc, abs=0.05)
    assert scale2 == pytest.approx(scale, abs=0.1)


def test_gumbel_fit_recovers_params():
    rng = np.random.RandomState(1)
    x = rng.gumbel(loc=20.0, scale=5.0, size=5000)
    for method in ("PWM", "MOM", "ML"):
        loc, scale = D.fit_params(x, "gumbel_r", method)
        assert loc == pytest.approx(20.0, abs=0.5), method
        assert scale == pytest.approx(5.0, abs=0.4), method
    # ppf closed form
    assert D.ppf((20.0, 5.0), "gumbel_r", [0.95])[0] == pytest.approx(
        20.0 - 5.0 * math.log(-math.log(0.95)))


def test_genextreme_fit_recovers_params():
    # sample via inverse transform from the scipy-convention ppf
    rng = np.random.RandomState(2)
    u = rng.uniform(1e-6, 1 - 1e-6, 8000)
    true = (0.2, 10.0, 2.0)  # c, loc, scale
    x = D.ppf(true, "genextreme", u)
    c, loc, scale = D.fit_params(x, "genextreme", "PWM")
    assert c == pytest.approx(0.2, abs=0.05)
    assert loc == pytest.approx(10.0, abs=0.15)
    assert scale == pytest.approx(2.0, abs=0.15)


def test_gamma_fit_recovers_params():
    rng = np.random.RandomState(3)
    x = rng.gamma(shape=3.0, scale=2.0, size=8000)
    for method in ("ML", "PWM"):
        a, loc, scale = D.fit_params(x, "gamma", method)
        assert a == pytest.approx(3.0, rel=0.1), method
        assert scale == pytest.approx(2.0, rel=0.1), method


def test_lognorm_fit():
    rng = np.random.RandomState(4)
    x = rng.lognormal(mean=1.0, sigma=0.5, size=6000)
    s, loc, scale = D.fit_params(x, "lognorm", "ML")
    assert s == pytest.approx(0.5, abs=0.03)
    assert scale == pytest.approx(math.e, rel=0.05)


# ---------------------------------------------------------------------------
# Spark operators
# ---------------------------------------------------------------------------

def test_fit_and_parametric_quantile(spark):
    rng = np.random.RandomState(5)
    vals = rng.gumbel(30.0, 4.0, 600).tolist()
    df = timeseries(spark, vals, start="2000-01-01")
    p = stats.fit(df, "value", "gumbel_r", "PWM", cells=["cell"])
    row = p.collect()[0]
    assert row["dparams"][0] == pytest.approx(30.0, abs=1.0)
    q = stats.parametric_quantile(p, [0.5, 0.99], "gumbel_r",
                                  cells=["cell"]).collect()
    got = {r["quantile"]: r["value"] for r in q}
    want50 = row["dparams"][0] - row["dparams"][1] * math.log(-math.log(0.5))
    assert got[0.5] == pytest.approx(want50, rel=1e-9)
    assert got[0.99] > got[0.5]


def test_fa_return_periods(spark):
    # 30 years of daily data; annual max ~ gumbel; rp20 > rp2
    rng = np.random.RandomState(6)
    n = 30 * 365
    vals = rng.gumbel(20.0, 3.0, n).tolist()
    df = timeseries(spark, vals, start="1990-01-01")
    out = stats.fa(df, "value", [2, 20], "gumbel_r", "max", "PWM",
                   cells=["cell"]).collect()
    got = {r["return_period"]: r["value"] for r in out}
    assert got[20] > got[2]
    # the rp-T quantile of the ANNUAL MAX distribution: loose sanity range
    assert 25 < got[2] < 40 and got[20] < 60


def test_standardized_index_is_standard_normal(spark):
    # gamma-distributed monthly totals -> SPI ~ N(0,1)
    rng = np.random.RandomState(7)
    n_days = 365 * 30
    vals = rng.gamma(2.0, 5.0, n_days).tolist()
    df = timeseries(spark, vals, start="1990-01-01")
    out = stats.standardized_index(df, "value", window=1, dist="gamma",
                                   freq="MS", cells=["cell"]).collect()
    spi = np.array([r["spi"] for r in out if r["spi"] is not None])
    spi = spi[np.isfinite(spi)]
    assert len(spi) >= 350
    assert abs(spi.mean()) < 0.15
    assert 0.8 < spi.std() < 1.2
    assert np.abs(spi).max() <= 8.21


def test_standardized_index_calibration_range(spark):
    rng = np.random.RandomState(8)
    vals = rng.gamma(2.0, 5.0, 365 * 10).tolist()
    df = timeseries(spark, vals, start="1990-01-01")
    out = stats.standardized_index(
        df, "value", window=3, dist="gamma", freq="MS", cells=["cell"],
        cal_start="1990-01-01", cal_end="1994-12-31").collect()
    # rolling window=3: first two months NULL
    per = sorted(r["period"] for r in out)
    by = {r["period"]: r["spi"] for r in out}
    assert by[per[0]] is None or np.isnan(by[per[0]])
    vals3 = [v for v in by.values() if v is not None and np.isfinite(v)]
    assert len(vals3) >= 100


def test_fisk_fit_recovers_params():
    # log-logistic sample via the inverse-cdf transform; PWM estimators
    # (Vicente-Serrano 2010 / Singh-Guo 1995) should recover the truth
    rng = np.random.RandomState(11)
    beta, gamma_loc, alpha = 4.0, 2.0, 10.0
    u = rng.uniform(0.0, 1.0, 20000)
    x = gamma_loc + alpha * (u / (1 - u)) ** (1 / beta)
    p = D.fit_params(x, "fisk", "PWM")
    assert p[0] == pytest.approx(beta, rel=0.08)
    assert p[1] == pytest.approx(gamma_loc, abs=0.6)
    assert p[2] == pytest.approx(alpha, rel=0.08)
    # cdf/ppf roundtrip
    qs = np.array([0.05, 0.5, 0.95])
    assert D.cdf(p, "fisk", D.ppf(p, "fisk", qs)) == pytest.approx(qs,
                                                                   rel=1e-9)


def test_spei_standard_normal(spark):
    # symmetric water budget (can be negative) -> fisk SPEI ~ N(0,1)
    rng = np.random.RandomState(5)
    vals = (rng.gamma(2.0, 3.0, 365 * 30) - 4.0).tolist()
    df = timeseries(spark, vals, start="1980-01-01")
    out = stats.standardized_precipitation_evapotranspiration_index(
        df, "value", freq="MS", cells=["cell"]).collect()
    spei = np.array([r["spei"] for r in out], dtype=float)
    spei = spei[np.isfinite(spei)]
    assert len(spei) >= 350
    assert abs(spei.mean()) < 0.15
    assert 0.8 < spei.std() < 1.2
    # negative budgets must map to the lower tail, not to a clamp
    assert (spei < -1.5).any() and (spei > 1.5).any()
    assert np.abs(spei).max() < 8.21


def test_ssi_genextreme(spark):
    rng = np.random.RandomState(6)
    vals = rng.gumbel(10.0, 3.0, 365 * 20).tolist()
    df = timeseries(spark, vals, start="1990-01-01")
    out = stats.standardized_streamflow_index(
        df, "value", freq="MS", cells=["cell"]).collect()
    ssi = np.array([r["ssi"] for r in out], dtype=float)
    ssi = ssi[np.isfinite(ssi)]
    assert len(ssi) >= 200
    assert abs(ssi.mean()) < 0.2
    assert 0.75 < ssi.std() < 1.25


def test_betainc_t_f_tails_known_values():
    from xclim_spark.stats import distributions as D

    # published checkpoints: I_0.5(2,3)=0.6875; t(df=10) two-sided p at
    # t=2.228 is 0.05; F(1,10) upper tail at 4.965 is 0.05
    assert abs(D.betainc(2, 3, 0.5)[0] - 0.6875) < 1e-10
    assert abs(D.t_sf_two_sided(2.2281, 10)[0] - 0.05) < 1e-4
    assert abs(D.f_sf(4.9646, 1, 10)[0] - 0.05) < 1e-4
    assert abs(D.norm_sf_two_sided(1.959964) - 0.05) < 1e-6


def test_parametric_cdf_pdf_and_dist_method(spark):
    import numpy as np

    from xclim_spark import stats

    rng = np.random.RandomState(21)
    rows = [("c", float(v)) for v in rng.normal(10.0, 2.0, 400)]
    df = spark.createDataFrame(rows, "cell string, x double")
    params = stats.fit(df, "x", dist="norm", cells=["cell"])
    cdf = stats.parametric_cdf(params, 10.0, "norm",
                               cells=["cell"]).collect()[0]
    assert abs(cdf["cdf"] - 0.5) < 0.05
    pdf = stats.parametric_pdf(params, 10.0, "norm",
                               cells=["cell"]).collect()[0]
    # N(10, 2) density at the mean = 1/(2*sqrt(2pi)) ~ 0.1995
    assert abs(pdf["pdf"] - 0.1995) < 0.03
    q = stats.dist_method("ppf", params, 0.5, "norm",
                          cells=["cell"]).collect()[0]
    assert abs(q["value"] - 10.0) < 0.3


def test_standardized_index_fit_params_shape(spark):
    import datetime as dt

    import numpy as np

    rng = np.random.RandomState(22)
    rows = []
    for y in range(1990, 2020):
        for m in range(1, 13):
            for d in (1, 10, 20):
                rows.append(("c", dt.date(y, m, d),
                             float(max(rng.gamma(2.0, 2.0), 0.0))))
    df = spark.createDataFrame(rows, "cell string, time date, pr double")
    from xclim_spark import stats

    out = stats.standardized_index_fit_params(
        df, "pr", dist="gamma", freq="MS", cells=["cell"]).collect()
    assert len(out) == 12  # one row per month-of-year
    for r in out:
        assert r["prob_of_zero"] == 0.0
        assert len(r["dparams"]) == 3


def test_weibull_fit_recovers_params():
    """Deterministic Weibull(c=2.5, scale=4) quantile lattice; both PWM
    and ML recover the parameters.  Closed-form anchors: c=2 (Rayleigh)
    has cdf(scale) = 1 - 1/e and median = scale*ln(2)^(1/2)."""
    import math

    import numpy as np

    from xclim_spark.stats import distributions as D

    q = (np.arange(400) + 0.5) / 400
    x = 4.0 * np.power(-np.log1p(-q), 1.0 / 2.5)
    for method in ("PWM", "ML"):
        c, loc, sc = D.fit_params(x, "weibull_min", method)
        assert abs(c - 2.5) < 0.1, method
        assert loc == 0.0
        assert abs(sc - 4.0) < 0.05, method
    # Rayleigh pins (exact closed forms, not fit-dependent)
    p = (2.0, 0.0, 3.0)
    assert D.cdf(p, "weibull_min", [3.0])[0] == pytest.approx(
        1.0 - math.exp(-1.0))
    assert D.ppf(p, "weibull_min", [0.5])[0] == pytest.approx(
        3.0 * math.sqrt(math.log(2.0)))
    # pdf integrates to ~1
    xs = np.linspace(0.001, 15, 4000)
    assert np.trapz(D.pdf(p, "weibull_min", xs), xs) == pytest.approx(
        1.0, abs=1e-3)


def test_pearson3_exponential_special_case():
    """Pearson III with skew=2 is a unit-rate shifted exponential:
    alpha=4/skew^2=1, beta=scale*skew/2=1, zeta=loc-2*scale/skew=1.
    With loc=2, scale=1 -> X ~ 1 + Exp(1): cdf(2) = 1-1/e,
    ppf(0.5) = 1+ln 2 — exact pins."""
    import math

    import numpy as np

    from xclim_spark.stats import distributions as D

    p = (2.0, 2.0, 1.0)  # skew, loc(mean), scale(std)
    assert D.cdf(p, "pearson3", [2.0])[0] == pytest.approx(
        1.0 - math.exp(-1.0), abs=1e-10)
    assert D.ppf(p, "pearson3", [0.5])[0] == pytest.approx(
        1.0 + math.log(2.0), abs=1e-8)
    assert D.pdf(p, "pearson3", [1.5])[0] == pytest.approx(
        math.exp(-0.5), abs=1e-10)
    # negative skew mirrors: X = 3 - Exp(1), so cdf(2) = 1/e
    pn = (-2.0, 2.0, 1.0)
    assert D.cdf(pn, "pearson3", [2.0])[0] == pytest.approx(
        math.exp(-1.0), abs=1e-10)
    # skew -> 0 degenerates to the normal
    p0 = (0.0, 5.0, 2.0)
    assert D.ppf(p0, "pearson3", [0.5])[0] == pytest.approx(5.0, abs=1e-9)
    assert D.cdf(p0, "pearson3", [7.0])[0] == pytest.approx(
        0.8413447, abs=1e-6)


def test_pearson3_fit_recovers_params():
    import numpy as np

    from xclim_spark.stats import distributions as D

    q = (np.arange(2000) + 0.5) / 2000
    x = np.asarray(D.ppf((1.2, 10.0, 3.0), "pearson3", q))
    sk, loc, sc = D.fit_params(x, "pearson3", "PWM")
    assert abs(sk - 1.2) < 0.1
    assert abs(loc - 10.0) < 0.1
    assert abs(sc - 3.0) < 0.1
    sk2, loc2, sc2 = D.fit_params(x, "pearson3", "ML")  # MOM stand-in
    assert abs(loc2 - 10.0) < 0.1
    assert abs(sc2 - 3.0) < 0.15


def test_dist_method_extended_surface(spark):
    """sf/isf/log variants agree with their defining identities on a
    fitted table."""
    import math

    import numpy as np

    from xclim_spark import stats

    rng = np.random.RandomState(5)
    rows = [("c", float(v)) for v in rng.gumbel(20.0, 4.0, size=200)]
    df = spark.createDataFrame(rows, "cell string, x double")
    params = stats.fit(df, "x", "gumbel_r", "PWM", cells=["cell"])
    ppf90 = stats.dist_method("ppf", params, 0.9, "gumbel_r",
                              cells=["cell"]).collect()[0]["value"]
    isf10 = stats.dist_method("isf", params, 0.1, "gumbel_r",
                              cells=["cell"]).collect()[0]["isf"]
    assert isf10 == pytest.approx(ppf90, rel=1e-12)
    cdf = stats.dist_method("cdf", params, 25.0, "gumbel_r",
                            cells=["cell"]).collect()[0]["cdf"]
    sf = stats.dist_method("sf", params, 25.0, "gumbel_r",
                           cells=["cell"]).collect()[0]["sf"]
    assert sf == pytest.approx(1.0 - cdf, abs=1e-12)
    logsf = stats.dist_method("logsf", params, 25.0, "gumbel_r",
                              cells=["cell"]).collect()[0]["logsf"]
    assert logsf == pytest.approx(math.log(sf), rel=1e-9)
    with pytest.raises(ValueError, match="Unsupported"):
        stats.dist_method("entropy", params, 0.5, "gumbel_r",
                          cells=["cell"])


def test_fa_weibull_and_pearson3_paths(spark):
    """fa runs end-to-end on the two new distributions and the weibull
    return level obeys the closed-form PWM algebra."""
    import math

    import numpy as np

    from xclim_spark import stats
    from xclim_spark.stats import distributions as D

    rng = np.random.RandomState(9)
    rows = []
    for y in range(2000, 2020):
        for d in range(1, 360, 10):
            rows.append(("c", f"{y}-{(d - 1) // 30 + 1:02d}-{(d - 1) % 28 + 1:02d}",
                         float(rng.weibull(2.0) * 10.0)))
    df = spark.createDataFrame(rows, "cell string, t string, v double") \
        .selectExpr("cell", "CAST(t AS DATE) AS t", "v")
    out = {r["return_period"]: r["value"]
           for r in stats.fa(df, "v", [2, 50], "weibull_min", "max",
                             "PWM", time="t", cells=["cell"]).collect()}
    # re-derive from the annual maxima directly
    ann = df.groupBy("cell", pyspark_year("t")).agg({"v": "max"})
    xs = np.array([r[2] for r in ann.collect()])
    c, _, sc = D.fit_params(xs, "weibull_min", "PWM")
    assert out[2] == pytest.approx(sc * math.log(2.0) ** (1.0 / c),
                                   rel=1e-9)
    assert out[50] == pytest.approx(sc * math.log(50.0) ** (1.0 / c),
                                    rel=1e-9)
    p3 = stats.fa(df, "v", [10], "pearson3", "max", "PWM",
                  time="t", cells=["cell"]).collect()
    assert len(p3) == 1 and p3[0]["value"] > float(np.mean(xs))


def pyspark_year(col):
    from pyspark.sql import functions as F

    return F.year(col).alias("y")
