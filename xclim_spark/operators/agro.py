"""Agroclimatic stateful kernels: chill portions (Dynamic Model) and
chill units (Utah model) — reference ``src/xclim/indices/_agro.py``.

``chill_units`` is a pure per-hour Column mapping + period sum (JVM-side).
``chill_portions`` carries a two-state hourly recursion (intermediate
product E, transformed fraction), so it runs per (cell, period) inside
``applyInPandas`` — state resets each period, exactly like the
reference's per-season ``resample_map`` (reference _agro.py:1436-1537).
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..calendar import period_start
from ..util import repartition_for_apply

__all__ = ["chill_units", "chill_portions", "chill_portions_1d",
           "dryness_index", "rain_season",
           "potential_evapotranspiration_monthly"]

# Dynamic Model constants (Fishman et al. 1987 / Luedeling et al. 2009;
# reference _agro.py:1445-1450)
_E0, _E1 = 4153.5, 12888.8
_A0, _A1 = 139500.0, 2.567e18
_SLP, _TETMLT = 1.6, 277.0


def chill_units(tas_c, positive_only: bool = False) -> Column:
    """Utah-model chill units per hour (Richardson et al. 1974; reference
    ``chill_units``, _agro.py): piecewise mapping of hourly temperature
    [degC] -> {-1, -0.5, 0, 0.5, 1}, NULL-propagating."""
    t = tas_c if isinstance(tas_c, Column) else F.col(tas_c)
    cu = (
        F.when(t.isNull(), F.lit(None).cast("double"))
        .when((t <= 1.4) | ((t > 12.4) & (t <= 15.9)), 0.0)
        .when(((t > 1.4) & (t <= 2.4)) | ((t > 9.1) & (t <= 12.4)), 0.5)
        .when((t > 2.4) & (t <= 9.1), 1.0)
        .when((t > 15.9) & (t <= 17.9), -0.5)
        .otherwise(-1.0)
    )
    return cu


def chill_portions_1d(tas_k: np.ndarray) -> float:
    """Dynamic-Model chill portions for one season of hourly temperatures
    [K] (reference ``_chill_portion_one_season``, _agro.py:1436-1470)."""
    aa = _A0 / _A1
    ee = _E1 - _E0
    ftmprt = _SLP * _TETMLT * (tas_k - _TETMLT) / tas_k
    sr = np.exp(ftmprt)
    xi = sr / (1.0 + sr)
    xs = aa * np.exp(ee / tas_k)
    ak1 = _A1 * np.exp(-_E1 / tas_k)
    inter_e = np.zeros_like(tas_k)
    for i in range(1, len(tas_k)):
        prev_e, prev_xi = inter_e[i - 1], xi[i - 1]
        curr_s = prev_e if prev_e < 1 else prev_e - prev_e * prev_xi
        inter_e[i] = xs[i] - (xs[i] - curr_s) * np.exp(-ak1[i])
    delta = np.where(inter_e >= 1.0, inter_e * xi, 0.0)
    return float(delta.sum())


def chill_portions(
    df: DataFrame, var: str, freq: str = "YS", *,
    time: str = "time", cells: Sequence[str] = (),
    alias: str = "chill_portions",
) -> DataFrame:
    """Chill portions per period (reference ``chill_portions``,
    _agro.py:1472-1537): the hourly recursion runs per (cell, period)
    pandas task — state resets at period boundaries like the reference's
    per-season map.  ``var`` is hourly temperature in Kelvin."""
    df = df.withColumn("period", period_start(time, freq))
    fields = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    schema = ", ".join(
        [f"{c} {fields[c]}" for c in cells]
        + [f"period {fields['period']}", f"{alias} DOUBLE"]
    )

    def _one(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(time)
        val = chill_portions_1d(pdf[var].to_numpy(dtype=float))
        out = {c: [pdf[c].iloc[0]] for c in cells}
        out["period"] = [pdf["period"].iloc[0]]
        out[alias] = [val]
        return pd.DataFrame(out)

    return repartition_for_apply(df, [*cells, "period"]) \
        .groupBy(*cells, "period").applyInPandas(_one, schema=schema)


# ---------------------------------------------------------------------------
# Dryness Index (Riou 1994 / Tonietto-Carbonneau 2004)
# reference src/xclim/indices/_agro.py:532-724 dryness_index
# ---------------------------------------------------------------------------

# monthly radiative-absorption coefficient k by calendar month
# (reference _agro.py:648-656: NH Apr=0.1, May=0.3, Jun-Sep=0.5; SH shifted
# six months)
_DI_K_NORTH = {4: 0.1, 5: 0.3, 6: 0.5, 7: 0.5, 8: 0.5, 9: 0.5}
_DI_K_SOUTH = {10: 0.1, 11: 0.3, 12: 0.5, 1: 0.5, 2: 0.5, 3: 0.5}


def qian_weighted_mean_average(
    df: DataFrame, var: str, *, time: str = "time",
    cells: Sequence[str] = (), alias: str = "tas_qian",
) -> DataFrame:
    """Binomial five-day weighted moving average with emphasis on the
    centre day: (x[n-2] + 4 x[n-1] + 6 x[n] + 4 x[n+1] + x[n+2]) / 16
    (ref _agro.py:1245-1284, Qian 2010 / Bootsma 2005).  Edge days (and
    neighbours of gaps) are null, matching the reference's centered
    rolling with full-window requirement.  One sorted window pass per
    cell — lag/lead over the same frame, no shuffle beyond the sort."""
    w = Window.partitionBy(*cells).orderBy(time)
    v = F.col(var)
    t = F.col(time)
    sm = (
        F.lag(v, 2).over(w) + 4.0 * F.lag(v, 1).over(w) + 6.0 * v
        + 4.0 * F.lead(v, 1).over(w) + F.lead(v, 2).over(w)
    ) / 16.0
    # lag/lead are row-positional: near a missing day the 5-row window
    # would silently span non-adjacent dates.  Require the +/-2 rows to be
    # exactly +/-2 calendar days, else null — the reference's
    # calendar-complete centered rolling yields NaN there.
    contiguous = (
        (F.datediff(t, F.lag(t, 2).over(w)) == 2)
        & (F.datediff(F.lead(t, 2).over(w), t) == 2)
    )
    return df.withColumn(alias, F.when(contiguous, sm))


def _month_map(mapping: dict[int, float], month: Column) -> Column:
    expr = F.lit(0.0)
    for m, v in mapping.items():
        expr = F.when(month == m, F.lit(v)).otherwise(expr)
    return expr


def dryness_index(
    df: DataFrame, pr: str, evspsblpot: str, *,
    lat: str = "north", wo: float = 200.0,
    time: str = "time", cells: Sequence[str] = (),
    alias: str = "dryness_index",
) -> DataFrame:
    """Estimate of year-end soil water reserve for viticulture [mm]
    (reference ``dryness_index``, _agro.py:532-724).

    ``pr`` and ``evspsblpot`` are daily totals in mm/day.  Monthly
    accumulations P and ETP feed the water balance over the growing
    season (Apr-Sep for ``lat='north'``, Oct-Mar for ``lat='south'``):

        DI = Wo + sum_m( P_m - ETP_m*k_m - (ETP_m/N)*(1-k_m)*JPm )

    with JPm = min(P_m/5, N) and P_m zeroed outside the season
    (reference masks pr with ``k > 0``).  Southern-hemisphere seasons
    span Oct-Mar and are labelled at the Jan 1 inside the season
    (reference shifts YS-JUL periods by -6 months, _agro.py:707-710).

    Plan shape: two hash aggregations (daily->monthly, monthly->yearly),
    both partial-aggregated map-side; no window, no shuffle beyond the
    two groupBys — safe at any cell count.
    """
    south = str(lat).lower() == "south"
    kmap = _DI_K_SOUTH if south else _DI_K_NORTH

    monthly = (
        df.withColumn("_mstart", F.trunc(F.col(time), "month"))
        .groupBy(*cells, "_mstart")
        .agg(F.sum(pr).alias("_prm"),
             F.sum(evspsblpot).alias("_etpm"),
             F.count(F.lit(1)).alias("_n"))
    )
    month = F.month("_mstart")
    k = _month_map(kmap, month)
    prm_masked = F.when(k > 0, F.col("_prm")).otherwise(F.lit(0.0))
    t_v = F.col("_etpm") * k
    jpm = F.least(prm_masked / F.lit(5.0), F.col("_n").cast("double"))
    e_s = (F.col("_etpm") / F.col("_n")) * (F.lit(1.0) - k) * jpm
    contrib = prm_masked - t_v - e_s

    if south:
        # Oct..Mar season -> label at the Jan 1 it straddles: add 3 months
        # then truncate to year (Oct-Dec roll forward, Jan-Mar stay).
        period = F.trunc(F.add_months("_mstart", 3), "year")
    else:
        period = F.trunc("_mstart", "year")

    return (
        monthly.withColumn("period", period)
        .groupBy(*cells, "period")
        .agg((F.lit(float(wo)) + F.sum(contrib)).alias(alias))
    )


# ---------------------------------------------------------------------------
# Rain season (Sivakumar 1998)
# reference src/xclim/indices/_agro.py:796-981 rain_season
# ---------------------------------------------------------------------------

def rain_season(
    df: DataFrame, pram: str, *,
    thresh_wet_start: float = 25.0, window_wet_start: int = 3,
    window_not_dry_start: int = 30,
    thresh_dry_start: float = 1.0, window_dry_start: int = 7,
    method_dry_start: str = "per_day",
    date_min_start: str = "05-01", date_max_start: str = "12-31",
    thresh_dry_end: float = 0.0, window_dry_end: int = 20,
    method_dry_end: str = "per_day",
    date_min_end: str = "09-01", date_max_end: str = "12-31",
    freq: str = "YS-JAN",
    time: str = "time", cells: Sequence[str] = (),
    prefix: str = "rain_season",
) -> DataFrame:
    """Start doy, end doy and length of the rain season (reference
    ``rain_season``, _agro.py:796-981).

    Start: the first day inside [date_min_start, date_max_start] opening
    a wet spell — ``window_wet_start`` days accumulating >=
    ``thresh_wet_start`` mm — that is followed by ``window_not_dry_start``
    days without a qualifying dry sequence (reference combines both with
    ``runs_with_holes`` then keeps runs of length >= window_not_dry_start
    + window_wet_start).  End: first qualifying dry sequence strictly
    after the start inside [date_min_end, date_max_end].  Length: days
    from start to end (exclusive), or to the period's last day when no
    end is found — the reference's index arithmetic (_agro.py:958)
    expressed as date arithmetic.

    All passes share ONE partitioning (cells, period) ordered by time:
    Spark shuffles once and reuses the sort for every window below —
    the same single-shuffle shape as the spell operators.
    """
    from . import run_length as rl

    wws, wnds = int(window_wet_start), int(window_not_dry_start)
    wds, wde = int(window_dry_start), int(window_dry_end)

    df = df.withColumn("period", period_start(time, freq))
    part = [*cells, "period"]
    w = Window.partitionBy(*part).orderBy(time)
    df = df.withColumn("_mmdd", F.date_format(time, "MM-dd"))
    in_slice = F.col("_mmdd") >= date_min_start

    # -- start condition: wet spell fully inside the search slice
    roll_wet = F.sum(pram).over(w.rowsBetween(-(wws - 1), 0))
    win_first = F.lag("_mmdd", wws - 1).over(w)
    da_start = (in_slice & win_first.isNotNull()
                & (win_first >= date_min_start)
                & (roll_wet >= thresh_wet_start))

    # -- dry-sequence condition vetoing the start (reference da_stop)
    if method_dry_start == "per_day":
        da_stop = in_slice & (F.col(pram) <= thresh_dry_start)
        window_dry = wds
    elif method_dry_start == "total":
        fwd = F.sum(pram).over(w.rowsBetween(0, wds - 1))
        n_fwd = F.count(pram).over(w.rowsBetween(0, wds - 1))
        da_stop = in_slice & (n_fwd == wds) & (fwd <= thresh_dry_start)
        window_dry = 1
    else:
        raise ValueError(f"Unknown method_dry_start: {method_dry_start}")

    df = (df.withColumn("_das", da_start)
            .withColumn("_dst", da_stop))
    df = rl.runs_with_holes(
        df, F.col("_das"), 1, F.col("_dst"), window_dry,
        time=time, cells=cells, partition_extra=["period"],
        state_name="_ev",
    )

    # qualifying season start = first row of an in-event run long enough
    # to cover the wet window plus the not-dry probation window
    df = rl.with_run_id(df, F.col("_ev"), time=time, cells=cells,
                        partition_extra=["period"],
                        cond_name="_evc", run_name="_evr")
    wrun = Window.partitionBy(*part, "_evr")
    ev_len = F.count(F.lit(1)).over(wrun)
    ev_pos = F.row_number().over(wrun.orderBy(time))
    qual_start = (F.col("_evc") & (ev_pos == 1) & (ev_len >= wnds + wws)
                  & F.col("_mmdd").between(date_min_start, date_max_start))
    df = df.withColumn("_qs", qual_start)
    df = df.withColumn(
        "_start", F.min(F.when(F.col("_qs"), F.col(time)))
                   .over(Window.partitionBy(*part)))

    # -- end: first qualifying dry sequence strictly after the start
    after = F.col(time) > F.col("_start")
    if method_dry_end == "per_day":
        dry_end = after & (F.col(pram) <= thresh_dry_end)
        df = rl.with_run_id(df, dry_end, time=time, cells=cells,
                            partition_extra=["period"],
                            cond_name="_dec", run_name="_der")
        wdry = Window.partitionBy(*part, "_der")
        dlen = F.count(F.lit(1)).over(wdry)
        dpos = F.row_number().over(wdry.orderBy(time))
        qual_end = (F.col("_dec") & (dpos == 1) & (dlen >= wde)
                    & F.col("_mmdd").between(date_min_end, date_max_end))
    elif method_dry_end == "total":
        val = F.when(after, F.col(pram))
        back = F.sum(val).over(w.rowsBetween(-(wde - 1), 0))
        n_back = F.count(val).over(w.rowsBetween(-(wde - 1), 0))
        qual_end = ((n_back == wde) & (back <= thresh_dry_end)
                    & F.col("_mmdd").between(date_min_end, date_max_end))
    else:
        raise ValueError(f"Unknown method_dry_end: {method_dry_end}")
    df = df.withColumn("_qe", qual_end)

    out = df.groupBy(*part).agg(
        F.min(F.when(F.col("_qs"), F.col(time))).alias("_st"),
        F.min(F.when(F.col("_qe"), F.col(time))).alias("_et"),
        F.max(time).alias("_last"),
    )
    start_doy = F.dayofyear("_st").cast("double")
    end_doy = F.dayofyear("_et").cast("double")
    length = F.when(
        F.col("_st").isNull(), F.lit(None).cast("double")
    ).when(
        F.col("_et").isNotNull(), F.datediff("_et", "_st").cast("double")
    ).otherwise(F.datediff("_last", "_st").cast("double") + 1)
    return out.select(
        *part,
        start_doy.alias(f"{prefix}_start"),
        end_doy.alias(f"{prefix}_end"),
        length.alias(f"{prefix}_length"),
    )


# ---------------------------------------------------------------------------
# Monthly-resample PET methods (Thornthwaite 1948, Droogers & Allen 2002)
# reference src/xclim/indices/converters.py:2030-2135 — these two methods
# are DataFrame-level (monthly resample + annual heat index), unlike the
# daily elementwise methods in functions.converters.
# ---------------------------------------------------------------------------

def potential_evapotranspiration_monthly(
    df: DataFrame, *, lat, tasmin=None, tasmax=None, tas=None, pr=None,
    method: str = "thornthwaite48", time: str = "time",
    cells: Sequence[str] = (), alias: str = "pet",
) -> DataFrame:
    """Monthly PET [mm/month] (reference converters.py:2030-2135).

    ``thornthwaite48`` / ``TW48``: daily mean temperature clipped at
    0 degC and half-day lengths are averaged monthly; the annual heat
    index ``I = sum_m (tas_m/5)^1.514`` feeds the Thornthwaite exponent
    ``a = 6.75e-7 I^3 - 7.71e-5 I^2 + 0.01791 I + 0.49239`` and
    ``PET = 16 dl_m (10 tas_m / I)^a``.

    ``droogersallen02`` / ``DA02``: monthly means of tasmin/tasmax/tas
    and of ``pr`` (daily series carrying an mm/month rate, as the
    reference's unit conversion produces), monthly-summed FAO-56
    extraterrestrial radiation times 0.408, then
    ``PET = 0.0013 Ra (tas_m + 17) (tr - 0.0123 pr_m)^0.76`` with
    ``tr = max(tasmax_m - tasmin_m, 0)``, zero where the base is
    negative (the reference's NaN guard) and clipped at 0.

    Plan shape: one daily->monthly hash aggregation; TW48 adds one
    window over the dim-sized monthly table for the annual heat index
    (partitioned by (cells, year) — no second scan of the daily input).
    """
    from ..functions.solar import (
        day_lengths,
        extraterrestrial_solar_radiation,
    )

    c = lambda x: x if isinstance(x, Column) else F.col(x)  # noqa: E731
    part = [F.col(k) for k in cells]
    month = F.trunc(F.col(time), "month").alias("period")

    if method in ("thornthwaite48", "TW48"):
        tas_c = c(tas) if tas is not None else (c(tasmin) + c(tasmax)) / 2.0
        tclip = F.greatest(tas_c, F.lit(0.0))
        dl12 = day_lengths(time, lat) / 12.0
        monthly = (
            df.select(*part, month, tclip.alias("_tc"), dl12.alias("_dl"))
            .groupBy(*cells, "period")
            .agg(F.avg("_tc").alias("_tas_m"), F.avg("_dl").alias("_dl_m"))
        )
        idm = F.pow(F.col("_tas_m") / 5.0, 1.514)
        w = Window.partitionBy(*cells, F.year("period"))
        iy = F.sum(idm).over(w)
        a = ((6.75e-7 * iy - 7.71e-5) * iy + 0.01791) * iy + 0.49239
        pet = 16.0 * F.col("_dl_m") * F.pow(10.0 * F.col("_tas_m") / iy, a)
        return monthly.select(*cells, "period", pet.alias(alias))

    if method in ("droogersallen02", "DA02"):
        tmin, tmax = c(tasmin), c(tasmax)
        tas_c = c(tas) if tas is not None else (tmin + tmax) / 2.0
        ra = extraterrestrial_solar_radiation(time, lat)
        monthly = (
            df.select(*part, month, tmin.alias("_tn"), tmax.alias("_tx"),
                      tas_c.alias("_ta"), c(pr).alias("_pr"),
                      ra.alias("_ra"))
            .groupBy(*cells, "period")
            .agg(F.avg("_tn").alias("_tn"), F.avg("_tx").alias("_tx"),
                 F.avg("_ta").alias("_ta"), F.avg("_pr").alias("_pr"),
                 (F.sum("_ra") * 0.408).alias("_ras"))
        )
        tr = F.greatest(F.col("_tx") - F.col("_tn"), F.lit(0.0))
        ab = tr - 0.0123 * F.col("_pr")
        pet = F.when(ab < 0.0, F.lit(0.0)).otherwise(
            F.greatest(0.0013 * F.col("_ras") * (F.col("_ta") + 17.0)
                       * F.pow(ab, 0.76), F.lit(0.0)))
        return monthly.select(*cells, "period", pet.alias(alias))

    raise ValueError(f"Unknown monthly PET method {method!r}")
