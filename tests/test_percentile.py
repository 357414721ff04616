"""Percentile climatology tests."""

import pytest
from pyspark.sql import functions as F

from xclim_spark.operators import percentile as pc
from xclim_spark.testing import timeseries


def test_percentile_doy_window_pool(spark):
    # 3 years of daily data with value = doy; with window=5 the p50 of each
    # doy bucket is the bucket's own doy (median of symmetric neighbours).
    vals = []
    from datetime import date, timedelta

    t0 = date(2000, 1, 1)
    n = 365 * 3
    for i in range(n):
        d = t0 + timedelta(days=i)
        doy = d.timetuple().tm_yday
        vals.append(float(min(doy, 365)))
    df = timeseries(spark, vals, start="2000-01-01")
    per = pc.percentile_doy(df, "value", 0.5, window=5, cells=["cell"],
                            alias="p50")
    rows = {r["dayofyear"]: r["p50"] for r in per.collect()}
    assert len(rows) == 365
    # mid-year buckets: median of {doy-2..doy+2} pooled over 3 years = doy
    for doy in (50, 180, 300):
        assert rows[doy] == pytest.approx(doy, abs=0.51)


def test_resample_doy_broadcast_join(spark):
    df = timeseries(spark, [1.0] * 10, start="2000-01-01")
    per = pc.percentile_doy(df, "value", 0.9, window=1, cells=["cell"],
                            alias="thresh")
    joined = pc.resample_doy(df, per, cells=["cell"], broadcast=True)
    assert "thresh" in joined.columns
    assert joined.filter(F.col("thresh").isNull()).count() == 0
    # forced broadcast must produce a broadcast, not a shuffle join
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_hf_quantile_matches_numpy(spark):
    import numpy as np

    vals = [3.1, 0.5, 9.9, 2.2, 7.7, 5.5, 1.1, 8.8, 4.4, 6.6, 2.9]
    df = timeseries(spark, vals, start="2001-01-01")
    for p in (0.1, 0.5, 0.9):
        got = df.agg(pc.hf_quantile("value", p).alias("q")).collect()[0]["q"]
        want = float(np.quantile(np.array(vals), p, method="median_unbiased"))
        assert got == pytest.approx(want, rel=1e-12), p
    # alpha=beta=1 == numpy 'linear'
    got = df.agg(
        pc.hf_quantile("value", 0.35, alpha=1, beta=1).alias("q")
    ).collect()[0]["q"]
    assert got == pytest.approx(float(np.quantile(np.array(vals), 0.35)))


def test_percentile_doy_leap_year_alignment(spark):
    # 2000 is a leap year: Feb 29 (doy 60) must pool into bucket 59 with
    # Feb 28, and Mar 1 (doy 61) into bucket 60 — aligned with non-leap
    # years; Dec 31 (doy 366) lands in bucket 365, never bucket 1.
    from datetime import date, timedelta

    t0 = date(2000, 1, 1)
    n = 366 + 365  # 2000 (leap) + 2001
    vals = [float(i % 400) for i in range(n)]
    df = timeseries(spark, vals, start="2000-01-01")
    per = pc.percentile_doy(df, "value", 0.5, window=1, cells=["cell"],
                            alias="p50")
    buckets = {r["dayofyear"] for r in per.select("dayofyear").collect()}
    assert max(buckets) == 365 and min(buckets) == 1
    # lookup side maps with the same doy365: no NULL thresholds anywhere,
    # including Feb 29 and Dec 31 of the leap year
    joined = pc.resample_doy(df, per, cells=["cell"])
    assert joined.filter(F.col("p50").isNull()).count() == 0
    feb29 = joined.filter(F.col("time") == date(2000, 2, 29)).collect()[0]
    assert feb29["dayofyear"] == 59
    dec31 = joined.filter(F.col("time") == date(2000, 12, 31)).collect()[0]
    assert dec31["dayofyear"] == 365


def test_bootstrap_days_over_percentile_matches_bruteforce(spark):
    """Zhang-2005 bootstrap vs a brute-force python replication."""
    import numpy as np
    from datetime import date, timedelta

    rng = np.random.RandomState(9)
    years = [2001, 2002, 2003]
    rows = []
    series = {}
    for y in years:
        t0 = date(y, 1, 1)
        vals = rng.gamma(4.0, 5.0, 365)
        series[y] = vals
        for i in range(365):
            rows.append((0, t0 + timedelta(days=i), float(vals[i])))
    df = spark.createDataFrame(rows, "cell INT, time DATE, value DOUBLE")

    out = pc.bootstrap_days_over_percentile(
        df, "value", 0.9, base_years=years, window=5, cells=["cell"])
    got = {r["year"]: r["days_over"] for r in out.collect()}

    # brute force: for in-base year y, average exceedance over pools
    # where y is replaced by r (r twice)
    def hf_q(xs, p):
        xs = np.sort(xs)
        n = len(xs)
        h = (n - 1/3 - 1/3 + 1.0) * p + 1/3
        h = min(max(h, 1.0), float(n))
        j = int(np.floor(h))
        g = h - j
        lo = xs[j - 1]
        hi = xs[min(j, n - 1)]
        return lo + g * (hi - lo)

    for y in years:
        reps = []
        for r in years:
            if r == y:
                continue
            pool_years = [v for v in years if v != y] + [r]
            count = 0
            for doy in range(1, 366):
                sample = []
                for v in pool_years:
                    for off in range(-2, 3):
                        d = (doy - 1 + off) % 365
                        sample.append(series[v][d])
                th = hf_q(np.array(sample), 0.9)
                if series[y][doy - 1] > th:
                    count += 1
            reps.append(count)
        expect = float(np.mean(reps))
        assert got[y] == pytest.approx(expect, rel=1e-12), y


def test_bootstrap_spell_duration_csdi(spark):
    """Bootstrapped spell-duration (CSDI shape): a 10-day dip in one
    in-base year counts as spell days ONLY for that year (the other
    years' thresholds absorb the dip into their pools), and a dip
    shorter than spell_window counts zero."""
    from datetime import date, timedelta

    years = [2001, 2002, 2003]
    rows = []
    for y in years:
        t0 = date(y, 1, 1)
        for i in range(365):
            q = 20.0
            if y == 2002 and 100 <= i < 110:
                q = 0.0           # 10-day cold dip
            if y == 2003 and 200 <= i < 205:
                q = 0.0           # 5-day dip: below spell_window
            rows.append((0, t0 + timedelta(days=i), q))
    df = spark.createDataFrame(rows, "cell INT, time DATE, value DOUBLE")

    out = pc.bootstrap_spell_duration(
        df, "value", 0.1, base_years=years, window=5, spell_window=6,
        op="<", cells=["cell"])
    got = {r["year"]: r["spell_days"] for r in out.collect()}
    assert set(got) == set(years)
    # 2002's thresholds come from pools EXCLUDING 2002 -> all 20s ->
    # the 10 dip days are all < 20 and form one >=6 run
    assert got[2002] == pytest.approx(10.0)
    # 2003's 5-day dip is < spell_window (its pools are all 20s except
    # the 2002 dip bleeding in at far-away doys)
    assert got[2003] == pytest.approx(0.0)
    # 2001 is flat at 20; thresholds are <= 20 everywhere -> no days
    assert got[2001] == pytest.approx(0.0)


def test_bootstrap_fraction_over_precip_matches_bruteforce(spark):
    """Fraction-family Zhang bootstrap (R75pTOT shape) vs a brute-force
    python replication: wet-day pools, tp = max(per, wet_thresh), ratio
    of over-threshold to wet-day totals, averaged over replacements."""
    import numpy as np
    from datetime import date, timedelta

    rng = np.random.RandomState(17)
    years = [2001, 2002, 2003]
    wet_thresh = 1.0
    rows = []
    series = {}
    for y in years:
        t0 = date(y, 1, 1)
        # mixture: ~40% dry days (below wet threshold), gamma wet tail
        vals = np.where(rng.rand(365) < 0.4,
                        rng.rand(365) * wet_thresh,
                        rng.gamma(2.0, 4.0, 365) + wet_thresh)
        series[y] = vals
        for i in range(365):
            rows.append((0, t0 + timedelta(days=i), float(vals[i])))
    df = spark.createDataFrame(rows, "cell INT, time DATE, value DOUBLE")

    out = pc.bootstrap_fraction_over_precip(
        df, "value", 0.75, base_years=years, window=5,
        wet_thresh=wet_thresh, cells=["cell"], alias="frac")
    got = {r["year"]: r["frac"] for r in out.collect()}

    def hf_q(xs, p):
        xs = np.sort(xs)
        n = len(xs)
        h = (n - 1/3 - 1/3 + 1.0) * p + 1/3
        h = min(max(h, 1.0), float(n))
        j = int(np.floor(h))
        g = h - j
        return xs[j - 1] + g * (xs[min(j, n - 1)] - xs[j - 1])

    for y in years:
        reps = []
        for r in years:
            if r == y:
                continue
            pool_years = [v for v in years if v != y] + [r]
            over = total = 0.0
            for doy in range(1, 366):
                sample = []
                for v in pool_years:
                    for off in range(-2, 3):
                        d = (doy - 1 + off) % 365
                        if series[v][d] > wet_thresh:
                            sample.append(series[v][d])
                x = series[y][doy - 1]
                if x <= wet_thresh:
                    continue
                tp = (max(hf_q(np.array(sample), 0.75), wet_thresh)
                      if sample else wet_thresh)
                total += x
                if x > tp:
                    over += x
            reps.append(over / total)
        expect = float(np.mean(reps))
        assert got[y] == pytest.approx(expect, rel=1e-9), y
