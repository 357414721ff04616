"""Generate golden parquet fixtures for the queries whose semantics are
not ANSI-SQL-expressible (day-over-day recursions, distribution fits,
iterative selections).

Each fixture is computed by an INDEPENDENT orchestration — DuckDB for the
relational base aggregations, plain pandas/numpy loops for the sequential
parts — so the Spark queries' distributed plumbing (partitioning,
applyInPandas batching, window accumulation, resampling) is genuinely
cross-checked.  The scalar numerical kernels (CFFWIS equations,
distribution fits, incomplete-beta tails) are shared with the library,
where they are pinned by unit tests against published reference values
(tests/test_fire.py, tests/test_stats.py) — the fixture checks the
*orchestration*, the unit tests check the *math*.

Fixtures are sf0.01-specific (the driver's correctness gate scale).

Usage:  python tools/make_golden.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "tests", "golden")

DAILY = """
SELECT l_suppkey AS cell, CAST(date_trunc('day', l_shipdate) AS DATE) AS day,
       avg(l_quantity) AS qty, sum(l_extendedprice) AS price
FROM '{sf}/lineitem.parquet' GROUP BY 1, 2 ORDER BY cell, day
"""

ENS = """
SELECT l_linenumber % 3 AS realization, l_suppkey AS cell,
       CAST(date_trunc('month', l_shipdate) AS DATE) AS period,
       avg(l_quantity) AS tg
FROM '{sf}/lineitem.parquet' GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


def daily(con) -> pd.DataFrame:
    return con.execute(DAILY.format(sf=SF_DIR)).fetchdf()


def golden_fwi_max_ys(con) -> pd.DataFrame:
    from xclim_spark.operators.fire import cffwis_1d

    d = daily(con)
    rows = []
    for cell, g in d.groupby("cell"):
        g = g.sort_values("day")
        qty = g["qty"].to_numpy()
        price = g["price"].to_numpy()
        tas = qty - 5.0
        prcp = np.maximum(0.0, price / 20000.0 - 2.0)
        hurs = np.minimum(99.0, 30.0 + qty)
        ws = 5.0 + qty / 2.0
        months = pd.to_datetime(g["day"]).dt.month.to_numpy()
        years = pd.to_datetime(g["day"]).dt.year.to_numpy()
        fwi = cffwis_1d(tas, prcp, hurs, ws, months, 47.0)["fwi"]
        for y in np.unique(years):
            # Spark's max treats NaN as greater than any value; np.max
            # propagates NaN the same way
            rows.append((cell, pd.Timestamp(int(y), 1, 1).date(),
                         round(float(np.max(fwi[years == y])), 6)))
    return pd.DataFrame(rows, columns=["cell", "period", "fwi_max"])


def golden_fwi_season_ys(con) -> pd.DataFrame:
    """Seasonal+overwintered CFFWIS, independently orchestrated: the
    season mask automaton runs per cell, each ON segment is computed by
    the scalar 1-D kernel (cffwis_1d) from its start values, and the
    Drought Code is overwintered with the closed-form wDC between
    segments — a different orchestration from the library's vectorized
    in-loop automaton (cffwis_block season path)."""
    d = daily(con)
    rows = []
    for cell, g in d.groupby("cell"):
        g = g.sort_values("day")
        qty = g["qty"].to_numpy()
        price = g["price"].to_numpy()
        tas = qty - 5.0
        prcp = np.maximum(0.0, price / 20000.0 - 2.0)
        hurs = np.minimum(99.0, 30.0 + qty)
        ws = 5.0 + qty / 2.0
        months = pd.to_datetime(g["day"]).dt.month.to_numpy()
        years = pd.to_datetime(g["day"]).dt.year.to_numpy()
        fwi, mask = _segmented_seasonal_fwi(tas, prcp, hurs, ws, months)
        for y in np.unique(years):
            sel = fwi[years == y]
            m = float(np.nanmax(sel)) if not np.all(np.isnan(sel)) \
                else None
            ndays = int(np.sum(mask[years == y]))
            rows.append((cell, pd.Timestamp(int(y), 1, 1).date(),
                         None if m is None else round(m, 6), ndays))
    return pd.DataFrame(rows, columns=["cell", "period", "fwi_max",
                                       "season_days"])


def _segmented_seasonal_fwi(tas, prcp, hurs, ws, months, lat=47.0):
    """Shared segment orchestration for the seasonal+overwintered
    goldens: WF93 mask per cell, each ON segment computed by the scalar
    1-D kernel from its start values, closed-form wDC between segments.
    Returns (fwi array with NaN off-season, bool mask)."""
    import math

    from xclim_spark.operators.fire import cffwis_1d, fire_season_mask_block

    mask = fire_season_mask_block(tas[:, None], method="WF93")[:, 0]
    n = len(tas)
    fwi = np.full(n, np.nan)
    ow_dc = None
    winter_pr = 0.0
    prev = False
    seg_start = None
    for i in range(n + 1):
        cur = bool(mask[i]) if i < n else False
        if cur and not prev:
            seg_start = i
        if prev and not cur:
            if ow_dc is None:
                dc0 = 15.0
            else:
                qf = 800.0 * math.exp(-ow_dc / 400.0)
                qs = 0.75 * qf + 0.75 * 3.94 * winter_pr
                dc0 = max(400.0 * math.log(800.0 / qs), 15.0)
            seg = cffwis_1d(tas[seg_start:i], prcp[seg_start:i],
                            hurs[seg_start:i], ws[seg_start:i],
                            months[seg_start:i], lat, dc0=dc0)
            fwi[seg_start:i] = seg["fwi"]
            ow_dc = seg["dc"][-1]
            winter_pr = 0.0
        if not cur and i < n:
            winter_pr += prcp[i]
        prev = cur
    return fwi, mask


def golden_stream_fwi_ms(con) -> pd.DataFrame:
    """Golden for the STREAMING CFFWIS gate: same independent segment
    orchestration as golden_fwi_season_ys, on the stream gate's
    qty-only met synthesis (the staged replay files carry no price
    column), aggregated monthly.  The met scaling (tas amplified around
    the qty mean) makes WF93 start/stop fire repeatedly, so the stream's
    carried automaton + overwinter state is genuinely exercised."""
    d = daily(con)
    rows = []
    for cell, g in d.groupby("cell"):
        g = g.sort_values("day")
        qty = g["qty"].to_numpy()
        tas = (qty - 25.0) * 1.5
        prcp = np.maximum(0.0, qty - 30.0)
        hurs = np.minimum(99.0, 30.0 + qty)
        ws = 5.0 + qty / 2.0
        dt = pd.to_datetime(g["day"])
        months = dt.dt.month.to_numpy()
        fwi, mask = _segmented_seasonal_fwi(tas, prcp, hurs, ws, months)
        mkey = (dt.dt.year * 100 + dt.dt.month).to_numpy()
        for mk in np.unique(mkey):
            sel = fwi[mkey == mk]
            m = (float(np.nanmax(sel))
                 if not np.all(np.isnan(sel)) else None)
            ndays = int(np.sum(mask[mkey == mk]))
            rows.append((cell,
                         pd.Timestamp(int(mk) // 100, int(mk) % 100,
                                      1).date(),
                         None if m is None else round(m, 6), ndays))
    return pd.DataFrame(rows, columns=["cell", "period", "fwi_max",
                                       "season_days"])


def golden_ffdi_max_ys(con) -> pd.DataFrame:
    from xclim_spark.operators.fire import (
        griffiths_drought_factor_1d,
        kbdi_1d,
    )

    d = daily(con)
    rows = []
    for cell, g in d.groupby("cell"):
        g = g.sort_values("day")
        qty = g["qty"].to_numpy()
        price = g["price"].to_numpy()
        tasmax = qty + 5.0
        prcp = np.maximum(0.0, price / 20000.0 - 2.0)
        hurs = np.minimum(99.0, 30.0 + qty)
        ws = 10.0 + qty / 2.0
        years = pd.to_datetime(g["day"]).dt.year.to_numpy()
        k = kbdi_1d(prcp, tasmax, 900.0)
        df_ = griffiths_drought_factor_1d(prcp, k, "xlim")
        ffdi = df_ ** 0.987 * np.exp(
            0.0338 * tasmax - 0.0345 * hurs + 0.0234 * ws + 0.243147)
        for y in np.unique(years):
            # the drought factor's 19-day warm-up is NaN; crossing the
            # Arrow boundary turns pandas NaN into SQL NULL, which
            # Spark's max() skips — nanmax mirrors that
            v = ffdi[years == y]
            rows.append((cell, pd.Timestamp(int(y), 1, 1).date(),
                         round(float(np.nanmax(v)), 6)
                         if np.isfinite(v).any() else float("nan")))
    return pd.DataFrame(rows, columns=["cell", "period", "ffdi_max"])


def _standardized(con, monthly_sql: str, dist: str, method: str,
                  window: int, alias: str) -> pd.DataFrame:
    """Independent SPI/SPEI pipeline: DuckDB monthly accumulation ->
    pandas rolling -> per month-of-year fit -> probit."""
    from xclim_spark.stats import distributions as D

    acc = con.execute(monthly_sql).fetchdf()
    out_rows = []
    for cell, g in acc.groupby("cell"):
        g = g.sort_values("period").reset_index(drop=True)
        x = g["acc"].to_numpy(dtype=float)
        roll = pd.Series(x).rolling(window, min_periods=window).sum() \
            .to_numpy()
        months = pd.to_datetime(g["period"]).dt.month.to_numpy()
        out = np.full(len(x), np.nan)
        for m in np.unique(months):
            sel = months == m
            xc = roll[sel & np.isfinite(roll)]
            if len(xc) <= 1:
                continue
            p0 = float(np.mean(xc == 0.0)) if dist == "gamma" else 0.0
            pos = xc[xc > 0] if dist == "gamma" else xc
            if len(pos) <= 1:
                continue
            params = D.fit_params(pos, dist, method)
            if np.isnan(params).any():
                continue
            valid = sel & np.isfinite(roll)
            c = np.zeros(len(x))
            ev = valid & (roll > 0) if dist == "gamma" else valid
            c[ev] = D.cdf(params, dist, roll[ev])
            prob = np.clip(p0 + (1.0 - p0) * c, 5e-4, 1.0 - 5e-4)
            out[valid] = np.clip(D.probit(prob[valid]), -8.21, 8.21)
        for per, v in zip(g["period"], out):
            out_rows.append(
                (cell, pd.Timestamp(per).date(),
                 round(float(v), 6) if np.isfinite(v) else float("nan")))
    return pd.DataFrame(out_rows, columns=["cell", "period", alias])


def golden_spi_ms(con) -> pd.DataFrame:
    sql = f"""
    WITH daily AS ({DAILY.format(sf=SF_DIR)})
    SELECT cell, CAST(date_trunc('month', day) AS DATE) AS period,
           sum(price) AS acc
    FROM daily GROUP BY 1, 2 ORDER BY 1, 2"""
    return _standardized(con, sql, "gamma", "ML", 3, "spi")


def golden_spei_ms(con) -> pd.DataFrame:
    sql = f"""
    WITH daily AS ({DAILY.format(sf=SF_DIR)})
    SELECT cell, CAST(date_trunc('month', day) AS DATE) AS period,
           sum(qty - 25.0) AS acc
    FROM daily GROUP BY 1, 2 ORDER BY 1, 2"""
    return _standardized(con, sql, "fisk", "PWM", 3, "spei")


def golden_ens_kkz_selection(con) -> pd.DataFrame:
    crit = con.execute(f"""
    WITH ens AS ({ENS.format(sf=SF_DIR)})
    SELECT realization, avg(tg) AS c_mean, stddev_pop(tg) AS c_std,
           max(tg) AS c_max
    FROM ens GROUP BY 1 ORDER BY 1""").fetchdf()
    ids = crit["realization"].to_list()
    X = crit[["c_mean", "c_std", "c_max"]].to_numpy(dtype=float)
    std = np.where(X.std(axis=0) == 0, 1, X.std(axis=0))
    norm = (X - X.mean(axis=0)) / std
    center = norm.mean(axis=0)
    selected = [int(np.argmin(((norm - center) ** 2).sum(axis=1)))]
    while len(selected) < min(2, len(norm)):
        dists = np.min([((norm - norm[s]) ** 2).sum(axis=1)
                        for s in selected], axis=0)
        dists[selected] = -1.0
        selected.append(int(np.argmax(dists)))
    return pd.DataFrame(
        [(i, int(ids[j])) for i, j in enumerate(selected)],
        columns=["rank", "realization"]).astype(
            {"rank": "int32", "realization": "int32"})


def golden_ens_robustness_ttest(con) -> pd.DataFrame:
    from xclim_spark.stats import distributions as D

    m = con.execute(ENS.format(sf=SF_DIR)).fetchdf()
    m["period"] = pd.to_datetime(m["period"])
    cut = pd.Timestamp("1998-01-01")
    per_member = []
    for (cell, real), g in m.groupby(["cell", "realization"]):
        fv = g.loc[g["period"] >= cut, "tg"].to_numpy(dtype=float)
        rv = g.loc[g["period"] < cut, "tg"].to_numpy(dtype=float)
        fv, rv = fv[np.isfinite(fv)], rv[np.isfinite(rv)]
        if len(fv) == 0 or len(rv) == 0:
            continue
        delta = float(fv.mean() - rv.mean())
        if len(fv) < 2:
            changed = False
        else:
            t = (fv.mean() - rv.mean()) / (fv.std(ddof=1) / np.sqrt(len(fv)))
            p = float(D.t_sf_two_sided(t, len(fv) - 1)[0])
            changed = p < 0.05
        per_member.append((cell, float(changed), float(delta > 0),
                           float(delta < 0)))
    pm = pd.DataFrame(per_member,
                      columns=["cell", "chg", "pos", "neg"])
    rows = []
    for cell, g in pm.groupby("cell"):
        rows.append((
            cell,
            round(g["chg"].mean(), 6),
            round(g["pos"].mean(), 6),
            round((g["chg"] * g["pos"]).mean(), 6),
            round(g["neg"].mean(), 6),
            round((g["chg"] * g["neg"]).mean(), 6),
            len(g),
            round(max(g["pos"].mean(), g["neg"].mean()), 6),
        ))
    return pd.DataFrame(rows, columns=[
        "cell", "changed", "positive", "changed_positive", "negative",
        "changed_negative", "valid_members", "agree"])


def golden_agro_rain_season_ys(con) -> pd.DataFrame:
    """Sequential reimplementation of rain_season (query params:
    thresh_wet_start=90, thresh_dry_start=10, method_dry_end='total',
    thresh_dry_end=480) — plain per-(cell, year) loops over the same
    DuckDB daily base, mirroring reference _agro.py:796 semantics."""
    d = daily(con)
    d["day"] = pd.to_datetime(d["day"])
    d["year"] = d["day"].dt.year
    wws, wnds, wds, wde = 3, 30, 7, 20
    rows = []
    for (cell, year), g in d.groupby(["cell", "year"]):
        g = g.sort_values("day").reset_index(drop=True)
        n = len(g)
        pram = g["qty"].to_numpy(dtype=float)
        mmdd = g["day"].dt.strftime("%m-%d").to_numpy()
        in_slice = mmdd >= "05-01"
        da_start = np.zeros(n, bool)
        for i in range(wws - 1, n):
            if (in_slice[i] and mmdd[i - wws + 1] >= "05-01"
                    and pram[i - wws + 1: i + 1].sum() >= 90.0):
                da_start[i] = True
        da_stop = in_slice & (pram <= 10.0)
        # runs_with_holes(start, 1, stop, wds): forward-complete runs
        # emit signals, stop wins ties, last signal carried forward
        state = np.zeros(n, bool)
        cur = 0
        for i in range(n):
            if i + wds <= n and da_stop[i: i + wds].all():
                cur = 0
            elif da_start[i]:
                cur = 1
            state[i] = cur == 1
        # qualifying start: first row of a state-run of length >= 33
        start_t = None
        i = 0
        while i < n:
            if state[i]:
                j = i
                while j < n and state[j]:
                    j += 1
                if (j - i >= wnds + wws and "05-01" <= mmdd[i] <= "12-31"):
                    start_t = g["day"].iloc[i]
                    break
                i = j
            else:
                i += 1
        end_t = None
        if start_t is not None:
            after = g["day"] > start_t
            val = np.where(after, pram, np.nan)
            for i in range(n):
                lo = max(0, i - wde + 1)
                wv = val[lo: i + 1]
                if (np.isfinite(wv).sum() == wde
                        and np.nansum(wv) <= 480.0
                        and "09-01" <= mmdd[i] <= "12-31"):
                    end_t = g["day"].iloc[i]
                    break
        per = pd.Timestamp(int(year), 1, 1).date()
        if start_t is None:
            rows.append((cell, per, np.nan, np.nan, np.nan))
        else:
            sd = float(start_t.dayofyear)
            if end_t is not None:
                rows.append((cell, per, sd, float(end_t.dayofyear),
                             float((end_t - start_t).days)))
            else:
                last = g["day"].iloc[-1]
                rows.append((cell, per, sd, np.nan,
                             float((last - start_t).days) + 1))
    return pd.DataFrame(rows, columns=[
        "cell", "period", "rain_season_start", "rain_season_end",
        "rain_season_length"])


GOLDENS = {
    "agro_rain_season_ys": golden_agro_rain_season_ys,
    "fwi_max_ys": golden_fwi_max_ys,
    "fwi_season_ys": golden_fwi_season_ys,
    "stream_fwi_ms": golden_stream_fwi_ms,
    "ffdi_max_ys": golden_ffdi_max_ys,
    "spi_ms": golden_spi_ms,
    "spei_ms": golden_spei_ms,
    "ens_kkz_selection": golden_ens_kkz_selection,
    "ens_robustness_ttest": golden_ens_robustness_ttest,
}


def main() -> int:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    for name, fn in GOLDENS.items():
        df = fn(con)
        path = os.path.join(OUT, f"{name}.parquet")
        df.to_parquet(path, index=False)
        print(f"{name}: {len(df)} rows -> {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
