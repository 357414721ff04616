"""Canadian Fire Weather Index System — the stateful tier
(reference ``src/xclim/indices/fire/_cffwis.py``).

FFMC/DMC/DC carry day-over-day state, so the kernel is inherently
sequential along time.  The Spark mapping is exactly the reference's own
strategy ("Dask arrays must have only one chunk along the time
dimension", _cffwis.py:912): ``applyInPandas`` keyed by cell, the full
series for one cell in one task, a tight numpy loop inside.  A streaming
deployment would swap the groupBy for ``transformWithStateInPandas``
keyed the same way with the three moisture codes as state.

This implements ``fire_weather_ufunc`` (_cffwis.py:883-1169) including
the fire-season start/stop automaton (WF93/LA08/GFWED masks), DC
overwintering (cffdrs wDC), and the CFS dry-spring start, on top of the
same per-day equations; only the GFWED snow-hybrid dry-start modes are
omitted.  All equations are the published Van Wagner 1987 / cffdrs
forms (equation numbers cited inline, as in the reference).
"""

from __future__ import annotations

import math
from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..util import repartition_for_apply

__all__ = ["cffwis_indices", "cffwis_1d", "daily_severity_rating",
           "kbdi_1d", "griffiths_drought_factor_1d", "mcarthur_ffdi",
           "ffdi_indices", "initial_spread_index", "build_up_index",
           "fire_weather_index", "overwintering_drought_code",
           "fire_season_mask_block"]

DAY_LENGTHS = np.array([
    [11.5, 10.5, 9.2, 7.9, 6.8, 6.2, 6.5, 7.4, 8.7, 10, 11.2, 11.8],
    [10.1, 9.6, 9.1, 8.5, 8.1, 7.8, 7.9, 8.3, 8.9, 9.4, 9.9, 10.2],
    [9.0] * 12,
    [7.9, 8.4, 8.9, 9.5, 9.9, 10.2, 10.1, 9.7, 9.1, 8.6, 8.1, 7.8],
    [6.5, 7.5, 9, 12.8, 13.9, 13.9, 12.4, 10.9, 9.4, 8, 7, 6],
])

DAY_LENGTH_FACTORS = np.array([
    [6.4, 5.0, 2.4, 0.4, -1.6, -1.6, -1.6, -1.6, -1.6, 0.9, 3.8, 5.8],
    [1.39] * 12,
    [-1.6, -1.6, -1.6, 0.9, 3.8, 5.8, 6.4, 5.0, 2.4, 0.4, -1.6, -1.6],
])


def _day_length(lat: float, mth: int) -> float:
    if -90 <= lat < -30:
        return DAY_LENGTHS[0, mth - 1]
    if -30 <= lat < -15:
        return DAY_LENGTHS[1, mth - 1]
    if -15 <= lat < 15:
        return 9.0
    if 15 <= lat < 30:
        return DAY_LENGTHS[3, mth - 1]
    return DAY_LENGTHS[4, mth - 1]


def _day_length_factor(lat: float, mth: int) -> float:
    if -90 <= lat < -15:
        return DAY_LENGTH_FACTORS[0, mth - 1]
    if -15 <= lat < 15:
        return 1.39
    return DAY_LENGTH_FACTORS[2, mth - 1]


def _ffmc(t, p, w, h, ffmc0):
    """Fine fuel moisture code, one step (Van Wagner eqs. 1-10)."""
    mo = (147.2 * (101.0 - ffmc0)) / (59.5 + ffmc0)  # Eq.1
    if p > 0.5:
        rf = p - 0.5  # Eq.2
        wet = 42.5 * rf * math.exp(-100.0 / (251.0 - mo)) * \
            (1.0 - math.exp(-6.93 / rf))
        if mo > 150.0:
            mo = mo + wet + 0.0015 * (mo - 150.0) ** 2 * math.sqrt(rf)  # 3b
        else:
            mo = mo + wet  # Eq.3a
        mo = min(mo, 250.0)
    ed = 0.942 * h ** 0.679 + 11.0 * math.exp((h - 100.0) / 10.0) + \
        0.18 * (21.1 - t) * (1.0 - math.exp(-0.115 * h))  # Eq.4
    if mo < ed:
        ew = 0.618 * h ** 0.753 + 10.0 * math.exp((h - 100.0) / 10.0) + \
            0.18 * (21.1 - t) * (1.0 - math.exp(-0.115 * h))  # Eq.5
        if mo < ew:
            kl = 0.424 * (1.0 - ((100.0 - h) / 100.0) ** 1.7) + \
                0.0694 * math.sqrt(w) * (1.0 - ((100.0 - h) / 100.0) ** 8)
            kw = kl * 0.581 * math.exp(0.0365 * t)  # Eq.7b
            m = ew - (ew - mo) / 10.0 ** kw  # Eq.9
        else:
            m = mo
    elif mo == ed:
        m = mo
    else:
        kl = 0.424 * (1.0 - (h / 100.0) ** 1.7) + \
            0.0694 * math.sqrt(w) * (1.0 - (h / 100.0) ** 8)  # Eq.6a
        kw = kl * 0.581 * math.exp(0.0365 * t)  # Eq.6b
        m = ed + (mo - ed) / 10.0 ** kw  # Eq.8
    ffmc = (59.5 * (250.0 - m)) / (147.2 + m)  # Eq.10
    return min(max(ffmc, 0.0), 101.0)


def _dmc(t, p, h, mth, lat, dmc0):
    """Duff moisture code, one step (eqs. 11-17, cffdrs variant)."""
    dl = _day_length(lat, mth)
    rk = 0.0 if t < -1.1 else 1.894 * (t + 1.1) * (100.0 - h) * dl * 1e-4
    if p > 1.5:
        rw = 0.92 * p - 1.27  # Eq.11
        wmi = 20.0 + 280.0 / math.exp(0.023 * dmc0)  # Eq.12 (cffdrs form)
        if dmc0 <= 33.0:
            b = 100.0 / (0.5 + 0.3 * dmc0)  # Eq.13a
        elif dmc0 <= 65.0:
            b = 14.0 - 1.3 * math.log(dmc0)  # Eq.13b
        else:
            b = 6.2 * math.log(dmc0) - 17.2  # Eq.13c
        wmr = wmi + (1000.0 * rw) / (48.77 + b * rw)  # Eq.14
        pr = 43.43 * (5.6348 - math.log(wmr - 20.0))  # Eq.15 (cffdrs)
    else:
        pr = dmc0
    return max(max(pr, 0.0) + rk, 0.0)


def _dc(t, p, mth, lat, dc0):
    """Drought code, one step (eqs. 18-22)."""
    fl = _day_length_factor(lat, mth)
    t = max(t, -2.8)
    pe = max((0.36 * (t + 2.8) + fl) / 2.0, 0.0)  # Eq.22
    if p > 2.8:
        rw = 0.83 * p - 1.27  # Eq.18
        smi = 800.0 * math.exp(-dc0 / 400.0)  # Eq.19
        dr = dc0 - 400.0 * math.log(1.0 + 3.937 * rw / smi)  # Eqs.20-21
        return dr + pe if dr > 0.0 else pe
    return dc0 + pe


def _isi(ws, ffmc):
    """Initial spread index (eqs. 25-26)."""
    mo = 147.2 * (101.0 - ffmc) / (59.5 + ffmc)  # Eq.1
    ff = 19.1152 * math.exp(mo * -0.1386) * (1.0 + mo ** 5.31 / 4.93e7)
    return ff * math.exp(0.05039 * ws)  # Eq.26


def _bui(dmc, dc):
    """Build-up index (eq. 27)."""
    denom = dmc + 0.4 * dc
    # Guard denom == 0.0 (not just dmc == dc == 0): a subnormal dc can
    # underflow 0.4 * dc to 0.0, and _bui_v guards on the summed
    # denominator — the two kernels must agree (hypothesis-found).
    if denom == 0.0:
        return 0.0
    if dmc <= 0.4 * dc:
        return 0.8 * dc * dmc / denom  # Eq.27a
    return dmc - (1.0 - 0.8 * dc / denom) * \
        (0.92 + (0.0114 * dmc) ** 1.7)  # Eq.27b


def _fwi(isi, bui):
    """Fire weather index (eqs. 28-30).  BUI is clamped at 0 like the
    vectorized kernel (_fwi_v): Eq.27b can go fractionally negative for
    small DMC with DC near 0, where a negative base to the 0.809 power
    would go complex — both kernels must agree on that pathological
    state."""
    if bui <= 80.0:
        fwi = 0.1 * isi * (0.626 * max(bui, 0.0) ** 0.809 + 2.0)  # Eq.28a
    else:
        fwi = 0.1 * isi * (1000.0 / (25.0 + 108.64 / math.exp(0.023 * bui)))
    if fwi > 1.0:
        fwi = math.exp(2.72 * (0.434 * math.log(fwi)) ** 0.647)  # Eq.30b
    return fwi


def cffwis_1d(
    tas, pr, hurs, ws, months, lat: float,
    ffmc0: float = 85.0, dmc0: float = 6.0, dc0: float = 15.0,
):
    """Sequential CFFWIS over one cell's series (numpy arrays in time
    order).  Returns dict of arrays ffmc/dmc/dc/isi/bui/fwi."""
    n = len(tas)
    out = {k: np.empty(n) for k in ("ffmc", "dmc", "dc", "isi", "bui",
                                    "fwi")}
    f, m, c = ffmc0, dmc0, dc0
    for i in range(n):
        t, p, h, w = float(tas[i]), float(pr[i]), float(hurs[i]), \
            float(ws[i])
        h = min(h, 99.9999)
        f = _ffmc(t, p, w, h, f)
        m = _dmc(t, p, h, int(months[i]), lat, m)
        c = _dc(t, p, int(months[i]), lat, c)
        isi = _isi(w, f)
        bui = _bui(m, c)
        out["ffmc"][i] = f
        out["dmc"][i] = m
        out["dc"][i] = c
        out["isi"][i] = isi
        out["bui"][i] = bui
        out["fwi"][i] = _fwi(isi, bui)
    return out


def _day_length_v(lat: np.ndarray, mth: int) -> np.ndarray:
    """Vector (over cells) form of :func:`_day_length`."""
    return np.select(
        [lat < -30.0, lat < -15.0, lat < 15.0, lat < 30.0],
        [DAY_LENGTHS[0, mth - 1], DAY_LENGTHS[1, mth - 1], 9.0,
         DAY_LENGTHS[3, mth - 1]],
        DAY_LENGTHS[4, mth - 1],
    )


def _day_length_factor_v(lat: np.ndarray, mth: int) -> np.ndarray:
    return np.select(
        [lat < -15.0, lat < 15.0],
        [DAY_LENGTH_FACTORS[0, mth - 1], 1.39],
        DAY_LENGTH_FACTORS[2, mth - 1],
    )


def _ffmc_v(t, p, w, h, f0):
    """Vector-over-cells FFMC step (same formulas as :func:`_ffmc`;
    branch arms guarded so masked lanes never raise)."""
    mo = (147.2 * (101.0 - f0)) / (59.5 + f0)
    rf = np.maximum(p - 0.5, 1e-12)
    wet = 42.5 * rf * np.exp(-100.0 / (251.0 - mo)) * \
        (1.0 - np.exp(-6.93 / rf))
    mo_w = np.where(
        mo > 150.0, mo + wet + 0.0015 * (mo - 150.0) ** 2 * np.sqrt(rf),
        mo + wet)
    mo = np.where(p > 0.5, np.minimum(mo_w, 250.0), mo)
    ed = 0.942 * h ** 0.679 + 11.0 * np.exp((h - 100.0) / 10.0) + \
        0.18 * (21.1 - t) * (1.0 - np.exp(-0.115 * h))
    ew = 0.618 * h ** 0.753 + 10.0 * np.exp((h - 100.0) / 10.0) + \
        0.18 * (21.1 - t) * (1.0 - np.exp(-0.115 * h))
    klw = 0.424 * (1.0 - ((100.0 - h) / 100.0) ** 1.7) + \
        0.0694 * np.sqrt(w) * (1.0 - ((100.0 - h) / 100.0) ** 8)
    kww = klw * 0.581 * np.exp(0.0365 * t)
    m_wet = ew - (ew - mo) / 10.0 ** kww
    kld = 0.424 * (1.0 - (h / 100.0) ** 1.7) + \
        0.0694 * np.sqrt(w) * (1.0 - (h / 100.0) ** 8)
    kwd = kld * 0.581 * np.exp(0.0365 * t)
    m_dry = ed + (mo - ed) / 10.0 ** kwd
    m = np.where(mo > ed, m_dry, np.where(mo < ew, m_wet, mo))
    return np.clip((59.5 * (250.0 - m)) / (147.2 + m), 0.0, 101.0)


def _dmc_v(t, p, h, dl, d0):
    rk = np.where(t < -1.1, 0.0,
                  1.894 * (t + 1.1) * (100.0 - h) * dl * 1e-4)
    logd = np.log(np.maximum(d0, 1e-12))
    b = np.where(d0 <= 33.0, 100.0 / (0.5 + 0.3 * d0),
                 np.where(d0 <= 65.0, 14.0 - 1.3 * logd,
                          6.2 * logd - 17.2))
    rw = 0.92 * p - 1.27
    wmi = 20.0 + 280.0 / np.exp(0.023 * d0)
    wmr = wmi + (1000.0 * rw) / (48.77 + b * rw)
    pr_ = 43.43 * (5.6348 - np.log(np.maximum(wmr - 20.0, 1e-12)))
    pr_ = np.where(p > 1.5, pr_, d0)
    return np.maximum(np.maximum(pr_, 0.0) + rk, 0.0)


def _dc_v(t, p, fl, d0):
    t2 = np.maximum(t, -2.8)
    pe = np.maximum((0.36 * (t2 + 2.8) + fl) / 2.0, 0.0)
    rw = np.maximum(0.83 * p - 1.27, 1e-12)
    smi = 800.0 * np.exp(-d0 / 400.0)
    dr = d0 - 400.0 * np.log(1.0 + 3.937 * rw / smi)
    wet = np.where(dr > 0.0, dr + pe, pe)
    return np.where(p > 2.8, wet, d0 + pe)


def _isi_v(ws, ffmc):
    mo = 147.2 * (101.0 - ffmc) / (59.5 + ffmc)
    ff = 19.1152 * np.exp(mo * -0.1386) * (1.0 + mo ** 5.31 / 4.93e7)
    return ff * np.exp(0.05039 * ws)


def _bui_v(dmc, dc):
    denom = dmc + 0.4 * dc
    denom_s = np.where(denom == 0.0, 1.0, denom)
    a = 0.8 * dc * dmc / denom_s
    bb = dmc - (1.0 - 0.8 * dc / denom_s) * (0.92 + (0.0114 * dmc) ** 1.7)
    return np.where((dmc == 0.0) & (dc == 0.0), 0.0,
                    np.where(dmc <= 0.4 * dc, a, bb))


def _fwi_v(isi, bui):
    fwi = np.where(
        bui <= 80.0,
        0.1 * isi * (0.626 * np.maximum(bui, 0.0) ** 0.809 + 2.0),
        0.1 * isi * (1000.0 / (25.0 + 108.64 / np.exp(0.023 * bui))))
    big = np.exp(
        2.72 * (0.434 * np.log(np.maximum(fwi, 1e-12))) ** 0.647)
    return np.where(fwi > 1.0, big, fwi)


def fire_season_mask_block(
    tas, snd=None, method: str = "WF93",
    temp_start_thresh: float = 12.0, temp_end_thresh: float = 5.0,
    temp_condition_days: int = 3, snow_condition_days: int = 3,
    snow_thresh: float = 0.01,
):
    """Fire-season mask over a (n_days, n_cells) block (reference
    ``_fire_season``, _cffwis.py:569-655): WF93 (temperature runs,
    window EXCLUDES the current day), LA08 (snow-cover runs, window
    includes today), GFWED (windowed means).  Returns a bool matrix;
    day i is ON if the previous day was on or a start-up fired, and no
    shut-down fired."""
    tas = np.asarray(tas, dtype=float)
    n, k = tas.shape
    if method in ("LA08", "GFWED"):
        if snd is None:
            raise ValueError(f"method {method!r} requires snow depth snd")
        snd = np.asarray(snd, dtype=float)
    mask = np.zeros((n, k), dtype=bool)
    if method == "WF93":
        start_index = temp_condition_days + 1
    elif method in ("LA08", "GFWED"):
        start_index = max(temp_condition_days, snow_condition_days)
    else:
        raise ValueError("method must be one of 'WF93', 'LA08', 'GFWED'")
    with np.errstate(all="ignore"):
        for it in range(start_index, n):
            if method == "WF93":
                temp = tas[it - temp_condition_days:it]
                start_up = np.all(temp > temp_start_thresh, axis=0)
                shut_down = np.all(temp < temp_end_thresh, axis=0)
            elif method == "LA08":
                snow = snd[it - snow_condition_days + 1:it + 1]
                temp = tas[it - temp_condition_days + 1:it + 1]
                start_up = np.all(snow <= snow_thresh, axis=0)
                shut_down = (snd[it] > snow_thresh) | np.all(
                    temp < temp_end_thresh, axis=0)
            else:  # GFWED
                msnow = np.mean(snd[it - snow_condition_days + 1:it + 1],
                                axis=0)
                mtemp = np.mean(tas[it - temp_condition_days + 1:it + 1],
                                axis=0)
                start_up = (mtemp > temp_start_thresh) & (msnow < snow_thresh)
                shut_down = (msnow >= snow_thresh) | (mtemp < temp_end_thresh)
            mask[it] = (mask[it - 1] | start_up) & ~shut_down
    return mask


def _overwinter_dc_v(dcf, wpr, a, b, min_dc):
    """Vectorized wDC (reference _overwintering_drought_code,
    _cffwis.py:522-553); NaN in, NaN out."""
    qf = 800.0 * np.exp(-np.asarray(dcf, dtype=float) / 400.0)
    qs = a * qf + b * (3.94 * np.asarray(wpr, dtype=float))
    return np.maximum(400.0 * np.log(800.0 / qs), min_dc)


def cffwis_block(
    tas, pr, hurs, ws, months, lat,
    ffmc0: float = 85.0, dmc0: float = 6.0, dc0: float = 15.0,
    present=None,
    season_mask=None, overwintering: bool = False,
    dry_start: str | None = None,
    carry_over_fraction: float = 0.75,
    wetting_efficiency_fraction: float = 0.75,
    prec_thresh: float = 1.0,
    dc_dry_factor: float = 5.0, dmc_dry_factor: float = 2.0,
    initial_start_up: bool = True,
    state0: dict | None = None,
    return_state: bool = False,
):
    """CFFWIS over a BLOCK of cells: inputs are (n_days, n_cells) arrays
    on a shared time axis; the day loop is Python but every step is a
    numpy vector over the block's cells — ~50-100x less interpreter
    overhead than one scalar loop per cell, same recursion.

    ``present`` marks which (day, cell) slots exist in the source; absent
    slots carry state through unchanged and emit nothing (a cell's own
    series is processed exactly as the 1-D kernel would).

    ``state0``/``return_state`` make the recursion RESUMABLE: ``state0``
    (a dict produced by a prior ``return_state=True`` call) seeds the
    per-cell moisture codes and season accumulators instead of the cold
    defaults, and ``return_state=True`` returns ``(out, state)`` with the
    end-of-block state — so processing a series in consecutive chunks is
    bit-identical to one full-series call.  This is the substrate of the
    streaming twin (:func:`xclim_spark.streaming.fire.streaming_cffwis`),
    where each micro-batch is one chunk and the state lives in the
    streaming state store.

    ``season_mask`` (bool, same shape) switches on the reference's
    start-up/shut-down automaton (``_fire_weather_calc``,
    _cffwis.py:655-880): outside the fire season all codes are NaN; at
    shut-down the last DC is stored; at start-up FFMC/DMC reset to their
    start values and DC either resets (plain), continues from the
    dry-spring accumulator (``dry_start='CFS'``), or is overwintered
    from the stored DC + accumulated off-season precipitation
    (``overwintering=True``, the cffdrs wDC method).  ``ffmc0``/
    ``dmc0``/``dc0`` double as the season start values, exactly like the
    reference's ``*_start`` params.  The GFWED/snow dry-start hybrids
    are not implemented (they need snow-cover history on top of LA08)."""
    tas = np.asarray(tas, dtype=float)
    n, k = tas.shape
    pr = np.asarray(pr, dtype=float)
    ws = np.asarray(ws, dtype=float)
    h_all = np.minimum(np.asarray(hurs, dtype=float), 99.9999)
    if present is None:
        present = ~np.isnan(tas)
    latv = (np.full(k, float(lat)) if np.ndim(lat) == 0
            else np.asarray(lat, dtype=float))
    dl_tab = [_day_length_v(latv, m) for m in range(1, 13)]
    fl_tab = [_day_length_factor_v(latv, m) for m in range(1, 13)]
    if dry_start not in (None, "CFS"):
        raise NotImplementedError(
            "dry_start supports None or 'CFS' (GFWED/snow hybrids need "
            "snow-cover history)")
    seasonal = season_mask is not None
    if seasonal:
        smask = np.asarray(season_mask).astype(np.int16)
        if state0 is not None:
            f = np.asarray(state0["f"], dtype=float).copy()
            dm = np.asarray(state0["dm"], dtype=float).copy()
            dc_ = np.asarray(state0["dc"], dtype=float).copy()
            ow_dc = np.asarray(state0["ow_dc"], dtype=float).copy()
            ow_dmc = np.asarray(state0["ow_dmc"], dtype=float).copy()
            winter_pr = np.asarray(state0["winter_pr"],
                                   dtype=float).copy()
            prev = np.asarray(state0["prev"], dtype=np.int16).copy()
        else:
            f = np.full(k, np.nan)
            dm = np.full(k, np.nan)
            dc_ = np.full(k, np.nan)
            # previous season's DC (overwintering) or dry-spring
            # accumulators
            ow_dc = (np.full(k, np.nan) if overwintering
                     else np.full(k, dc0))
            ow_dmc = np.full(k, dmc0)
            winter_pr = np.zeros(k)
            prev = (np.zeros(k, dtype=np.int16) if initial_start_up
                    else smask[0])
    elif state0 is not None:
        f = np.asarray(state0["f"], dtype=float).copy()
        dm = np.asarray(state0["dm"], dtype=float).copy()
        dc_ = np.asarray(state0["dc"], dtype=float).copy()
    else:
        f = np.full(k, ffmc0)
        dm = np.full(k, dmc0)
        dc_ = np.full(k, dc0)
    out = {key: np.full((n, k), np.nan)
           for key in ("ffmc", "dmc", "dc", "isi", "bui", "fwi")}
    with np.errstate(all="ignore"):
        for i in range(n):
            t, p, h, w = tas[i], pr[i], h_all[i], ws[i]
            pres = present[i]
            mth = int(months[i])
            if seasonal:
                cur = smask[i]
                delta = cur - prev
                shut_down = delta == -1
                winter = (delta == 0) & (cur == 0)
                start_up = delta == 1
                p_safe = np.where(pres, p, 0.0)
                # --- DC start-up/shut-down (ref _cffwis.py:760-812) ---
                if overwintering:
                    ow_dc[shut_down] = dc_[shut_down]
                    winter_pr[shut_down] = p_safe[shut_down]
                    winter_pr[winter] += p_safe[winter]
                    wdc = _overwinter_dc_v(
                        ow_dc, winter_pr, carry_over_fraction,
                        wetting_efficiency_fraction, dc0)
                    dc_[start_up] = np.where(
                        np.isnan(ow_dc[start_up]), dc0, wdc[start_up])
                    ow_dc[start_up] = np.nan
                    winter_pr[start_up] = 0.0
                elif dry_start == "CFS":
                    wetpts = p_safe > prec_thresh
                    ow_dc[shut_down] = dc0
                    ow_dc[winter & wetpts] = dc0
                    ow_dc[winter & ~wetpts] += dc_dry_factor
                    dc_[start_up] = ow_dc[start_up]
                    ow_dc[start_up] = np.nan
                else:
                    dc_[start_up] = dc0
                dc_[shut_down] = np.nan
                # --- DMC (ref :814-838) ---
                if dry_start == "CFS":
                    wetpts = p_safe > prec_thresh
                    ow_dmc[shut_down] = dmc0
                    ow_dmc[winter & wetpts] = dmc0
                    ow_dmc[winter & ~wetpts] += dmc_dry_factor
                    dm[start_up] = ow_dmc[start_up]
                    ow_dmc[start_up] = np.nan
                else:
                    dm[start_up] = dmc0
                dm[shut_down] = np.nan
                # --- FFMC (ref :840-842) ---
                f[start_up] = ffmc0
                f[shut_down] = np.nan
                prev = cur
            f = np.where(pres, _ffmc_v(t, p, w, h, f), f)
            dm = np.where(pres, _dmc_v(t, p, h, dl_tab[mth - 1], dm), dm)
            dc_ = np.where(pres, _dc_v(t, p, fl_tab[mth - 1], dc_), dc_)
            isi = _isi_v(w, f)
            bui = _bui_v(dm, dc_)
            fwi = _fwi_v(isi, bui)
            out["ffmc"][i] = np.where(pres, f, np.nan)
            out["dmc"][i] = np.where(pres, dm, np.nan)
            out["dc"][i] = np.where(pres, dc_, np.nan)
            out["isi"][i] = np.where(pres, isi, np.nan)
            out["bui"][i] = np.where(pres, bui, np.nan)
            out["fwi"][i] = np.where(pres, fwi, np.nan)
    if return_state:
        state = {"f": f, "dm": dm, "dc": dc_}
        if seasonal:
            state.update(ow_dc=ow_dc, ow_dmc=ow_dmc,
                         winter_pr=winter_pr, prev=prev)
        return out, state
    return out


def kbdi_1d(pr, tasmax, pr_annual: float, kbdi0: float = 0.0) -> np.ndarray:
    """Keetch-Byram drought index over one cell's daily series (reference
    fire/_ffdi.py:44-97, Finkele et al. 2006 with the 203.2 mm cap):
    evapotranspiration recharge vs effective rainfall after a 5 mm
    interception/runoff store."""
    pr = np.asarray(pr, dtype=float)
    t = np.asarray(tasmax, dtype=float)
    out = np.empty(len(pr))
    k = kbdi0
    rr = 5.0
    for d in range(len(pr)):
        if pr[d] <= 0.0:
            r = pr[d]
            rr = 5.0
        else:
            r = min(pr[d], rr)
            rr -= r
        peff = pr[d] - r
        et = (1e-3 * (203.2 - k)
              * (0.968 * math.exp(0.0875 * t[d] + 1.5552) - 8.3)
              / (1.0 + 10.88 * math.exp(-0.00173 * pr_annual)))
        k = min(max(k + et - peff, 0.0), 203.2)
        out[d] = k
    return out


def griffiths_drought_factor_1d(pr, smd, limiting: str = "xlim") -> np.ndarray:
    """Griffiths drought factor (reference fire/_ffdi.py:98-187, Finkele
    et al. 2006 eqs. 13/14): 20-day significant-rainfall x-function
    combined with the soil moisture deficit; values in [0, 10], NaN for
    the first 19 days.  ``limiting``: 'xlim' (eq. 14) or 'discrete'
    (eq. 13 step limits)."""
    pr = np.asarray(pr, dtype=float)
    smd = np.asarray(smd, dtype=float)
    wl = 20
    out = np.full(len(pr), np.nan)
    for d in range(wl - 1, len(pr)):
        pw = pr[d - wl + 1: d + 1]
        conseq = 0
        pmax = 0.0
        psum = 0.0
        x = 1.0
        N = 0
        for iw in range(wl):
            event = pw[iw] > 2.0
            event_end = (not event) and conseq != 0
            final_event = event and iw == wl - 1
            if event:
                conseq += 1
                psum += pw[iw]
                if pw[iw] >= pmax:
                    N = wl - iw
                    pmax = pw[iw]
            if event_end or final_event:
                x = min(N ** 1.3 / (N ** 1.3 + psum - 2.0), x)
                conseq = 0
                psum = 0.0
                pmax = 0.0
        if limiting == "xlim":
            if smd[d] < 20.0:
                xlim = 1.0 / (1.0 + 0.1135 * smd[d])
            else:
                xlim = 75.0 / (270.525 - 1.267 * smd[d])
            x = min(x, xlim)
        dfw = 10.5 * (1.0 - math.exp(-(smd[d] + 30.0) / 40.0)) \
            * (41.0 * x * x + x) / (40.0 * x * x + x + 1.0)
        if limiting == "discrete":
            if smd[d] < 25.0:
                dflim = 6.0
            elif smd[d] < 42.0:
                dflim = 7.0
            elif smd[d] < 65.0:
                dflim = 8.0
            elif smd[d] < 100.0:
                dflim = 9.0
            else:
                dflim = 10.0
            dfw = min(dfw, dflim)
        out[d] = min(dfw, 10.0)
    return out


def mcarthur_ffdi(drought_factor, tasmax_c, hurs_pct, sfcwind_kmh):
    """McArthur FFDI Mark 5 (reference fire/_ffdi.py:359-401):
    ``DF^0.987 exp(0.0338 T - 0.0345 H + 0.0234 V + 0.243147)`` — pure
    Column expression (Columns in, Column out) or numpy on arrays."""
    from pyspark.sql import Column

    if isinstance(drought_factor, (Column, str)):
        from pyspark.sql import functions as F

        dfc = F.col(drought_factor) if isinstance(drought_factor, str) \
            else drought_factor
        t = F.col(tasmax_c) if isinstance(tasmax_c, str) else tasmax_c
        h = F.col(hurs_pct) if isinstance(hurs_pct, str) else hurs_pct
        v = F.col(sfcwind_kmh) if isinstance(sfcwind_kmh, str) \
            else sfcwind_kmh
        return F.pow(dfc, 0.987) * F.exp(
            0.0338 * t - 0.0345 * h + 0.0234 * v + 0.243147)
    d = np.asarray(drought_factor, dtype=float)
    return d ** 0.987 * np.exp(
        0.0338 * np.asarray(tasmax_c, dtype=float)
        - 0.0345 * np.asarray(hurs_pct, dtype=float)
        + 0.0234 * np.asarray(sfcwind_kmh, dtype=float) + 0.243147)


def ffdi_indices(
    df: DataFrame,
    *,
    pr: str, tasmax: str, hurs: str, sfcWind: str,
    pr_annual: float,
    time: str = "time",
    cells: Sequence[str] = (),
    kbdi0: float = 0.0,
    limiting: str = "xlim",
) -> DataFrame:
    """KBDI + Griffiths drought factor + McArthur FFDI per cell (reference
    fire/_ffdi.py public API): the two stateful kernels run in one pandas
    task per cell; the FFDI combination is a plain expression on the
    result."""
    from pyspark.sql import functions as F

    fields = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    schema = ", ".join(
        [f"{c} {fields[c]}" for c in cells]
        + [f"{time} {fields[time]}", f"{tasmax} DOUBLE", f"{hurs} DOUBLE",
           f"{sfcWind} DOUBLE", "kbdi DOUBLE", "drought_factor DOUBLE"]
    )

    def _calc(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(time)
        k = kbdi_1d(pdf[pr].to_numpy(), pdf[tasmax].to_numpy(),
                    pr_annual, kbdi0)
        dfac = griffiths_drought_factor_1d(pdf[pr].to_numpy(), k, limiting)
        out = {c: pdf[c].to_numpy() for c in cells}
        out[time] = pdf[time].to_numpy()
        for c in (tasmax, hurs, sfcWind):
            out[c] = pdf[c].to_numpy()
        out["kbdi"] = k
        out["drought_factor"] = dfac
        return pd.DataFrame(out)

    base = repartition_for_apply(df, cells).groupBy(*cells) \
        .applyInPandas(_calc, schema=schema)
    return base.withColumn(
        "ffdi", mcarthur_ffdi("drought_factor", tasmax, hurs, sfcWind)
    )


def daily_severity_rating(fwi):
    """DSR = 0.0272 FWI^1.77 (reference _cffwis.py daily_severity_rating)."""
    return 0.0272 * np.asarray(fwi, dtype=float) ** 1.77



def cffwis_indices(
    df: DataFrame,
    *,
    tas: str, pr: str, hurs: str, sfcWind: str,
    lat: float | str = 45.0,
    time: str = "time",
    cells: Sequence[str] = (),
    ffmc0: float = 85.0, dmc0: float = 6.0, dc0: float = 15.0,
    snd: str | None = None,
    season_method: str | None = None,
    season_mask: str | None = None,
    overwintering: bool = False,
    dry_start: str | None = None,
    season_params: dict | None = None,
    nblocks: int | None = None,
) -> DataFrame:
    """Daily FFMC/DMC/DC/ISI/BUI/FWI per cell (reference
    ``cffwis_indices``, _cffwis.py:1278).

    ``season_method`` — None ("always on"), 'WF93'/'LA08'/'GFWED'
    (mask computed in-task from tas/snd via
    :func:`fire_season_mask_block`), or 'mask' (read from the boolean
    ``season_mask`` column).  ``overwintering`` carries the Drought Code
    across seasons via the cffdrs wDC method; ``dry_start='CFS'``
    accumulates the dry-spring factor instead.  ``season_params``
    overrides the mask thresholds (temp_start_thresh, temp_end_thresh,
    temp_condition_days, snow_condition_days, snow_thresh).

    ``lat`` is a scalar latitude or the name of a per-cell latitude
    column.  Plan: ONE hash exchange on the cell key puts every cell's
    full series in a single partition, a spill-safe JVM sort within each
    partition makes cells contiguous, and ``mapInPandas`` streams the
    partition in COMPLETE-CELL CHUNKS of ~``$XCLIM_SPARK_FIRE_CHUNK_ROWS``
    (default 200k) rows: each chunk pivots to (days x cells) matrices
    and the day-over-day recursion runs as numpy vectors across the
    chunk's cells (:func:`cffwis_block`) — the sequential-in-time
    constraint stays, the per-cell Python interpreter cost goes, and
    per-task pandas memory is bounded by the chunk size NO MATTER how
    many rows land in the partition.  (The round-14 scale rehearsal
    measured the group-materializing predecessor super-linear at 100x —
    1.7M-row pandas groups per task, PLANS.md round 14; chunked
    streaming needs no block-count knob at all.)  Days missing for one
    cell carry its state unchanged, exactly as the 1-D kernel skipping
    absent rows would.

    ``nblocks`` is now just the task count (default: executor
    parallelism x ``$XCLIM_SPARK_FIRE_BLOCK_MULT``); rows-per-task no
    longer affects memory or pandas churn."""
    from pyspark.sql import functions as F

    fields = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    schema = ", ".join(
        [f"{c} {fields[c]}" for c in cells]
        + [f"{time} {fields[time]}", "ffmc DOUBLE", "dmc DOUBLE",
           "dc DOUBLE", "isi DOUBLE", "bui DOUBLE", "fwi DOUBLE"]
    )
    cells_l = list(cells)
    variables = [tas, pr, hurs, sfcWind]
    if snd is not None:
        variables.append(snd)
    if season_method == "mask":
        if season_mask is None:
            raise ValueError("season_method='mask' needs a season_mask "
                             "column")
        variables.append(season_mask)
    sparams = dict(season_params or {})

    def _calc(pdf: pd.DataFrame) -> pd.DataFrame:
        # factorize-based pivot: ~10x faster than pivot_table for the
        # dense (day, cell) -> matrix reshape this needs
        if len(cells_l) == 1:
            ckey = pdf[cells_l[0]]
        else:
            ckey = pd.MultiIndex.from_arrays(
                [pdf[c] for c in cells_l])
        ccodes, cols = pd.factorize(ckey, sort=True)
        tcodes, times = pd.factorize(pdf[time], sort=True)
        n, k = len(times), len(cols)
        mats = {}
        for v in variables:
            m = np.full((n, k), np.nan)
            m[tcodes, ccodes] = pdf[v].to_numpy(dtype=float)
            mats[v] = m
        # presence mask: a (day, cell) slot exists iff the source had the
        # row (value may still be NaN — poisons state like the 1-D path)
        present = np.zeros((n, k), dtype=bool)
        present[tcodes, ccodes] = True
        months = pd.DatetimeIndex(pd.to_datetime(times)).month.to_numpy()
        if isinstance(lat, str):
            latv = np.full(k, np.nan)
            latv[ccodes] = pdf[lat].to_numpy(dtype=float)
        else:
            latv = float(lat)
        if season_method is None:
            smask = None
        elif season_method == "mask":
            # absent (day, cell) slots are NaN in the pivoted matrix; carry
            # the last seen mask value across them (same ffill the computed
            # branch applies below) — nan_to_num would read a gap as
            # mask=False and fabricate shut-down/start-up transitions
            # (FFMC/DMC/DC resets, bogus winter_pr under overwintering)
            smask = (pd.DataFrame(mats[season_mask]).ffill().fillna(0.0)
                     .to_numpy() > 0.5)
        else:
            # The block's time axis is the union of the block's cells'
            # days; a cell absent on some axis rows must see the SAME
            # automaton as its own compacted series (windows count the
            # cell's own consecutive days, reference 1-D semantics).
            # Compute per cell on the compacted rows, scatter back, and
            # carry the mask across the cell's absent slots so the
            # season state machine in cffwis_block sees no spurious
            # transitions inside gaps.
            # compact-to-top permutation: stable-sort each column so a
            # cell's own present days stack contiguously from row 0 —
            # then ONE vectorized automaton pass over (max_len, cells)
            # gives every cell its compact-series mask (padding rows are
            # NaN: comparisons are False, the mask just carries, and the
            # scatter ignores them)
            order = np.argsort(~present, axis=0, kind="stable")
            lens = present.sum(axis=0)
            lmax = int(lens.max()) if k else 0
            comp_t = np.take_along_axis(mats[tas], order, axis=0)[:lmax]
            comp_s = (np.take_along_axis(mats[snd], order, axis=0)[:lmax]
                      if snd is not None else None)
            mcomp = np.full((n, k), False)
            mcomp[:lmax] = fire_season_mask_block(
                comp_t, snd=comp_s, method=season_method, **sparams)
            inv = np.argsort(order, axis=0, kind="stable")
            scat = np.take_along_axis(mcomp.astype(float), inv, axis=0)
            smf = np.where(present, scat, np.nan)
            # carry the mask across a cell's absent slots so the season
            # state machine sees no spurious transitions inside gaps
            smask = (pd.DataFrame(smf).ffill().fillna(0.0)
                     .to_numpy() > 0.5)
        res = cffwis_block(
            mats[tas], mats[pr], mats[hurs], mats[sfcWind], months, latv,
            ffmc0=ffmc0, dmc0=dmc0, dc0=dc0, present=present,
            season_mask=smask, overwintering=overwintering,
            dry_start=dry_start)

        flat = present.ravel()
        out = {}
        times_arr = np.asarray(times)
        if len(cells_l) == 1:
            out[cells_l[0]] = np.tile(np.asarray(cols), n)[flat]
        else:
            for ci, cname in enumerate(cells_l):
                vals = np.array([c[ci] for c in cols])
                out[cname] = np.tile(vals, n)[flat]
        out[time] = np.repeat(times_arr, k)[flat]
        for key, mat in res.items():
            out[key] = mat.ravel()[flat]
        return pd.DataFrame(out)

    import os as _os

    sc = df.sparkSession.sparkContext
    if nblocks is None:
        mult = int(_os.environ.get("XCLIM_SPARK_FIRE_BLOCK_MULT", "1"))
        nblocks = max(sc.defaultParallelism * max(mult, 1), 2)
    # only the columns _calc reads cross the Python boundary — callers
    # routinely pass tables with extra payload columns, and every byte
    # here is shuffled, Arrow-serialized, and pandas-materialized
    needed = list(dict.fromkeys(
        cells_l + [time] + variables
        + ([lat] if isinstance(lat, str) else [])))
    df = df.select(*needed)
    if not cells_l:
        # single global series — inherently one sequential task
        blocked = df.withColumn("_blk", F.lit(0))
        return blocked.repartition(1, "_blk").groupBy("_blk") \
            .applyInPandas(lambda p: _calc(p.drop(columns=["_blk"])),
                           schema=schema)

    chunk_rows = max(
        int(_os.environ.get("XCLIM_SPARK_FIRE_CHUNK_ROWS", "200000")), 1)
    out_names = cells_l + [time, "ffmc", "dmc", "dc", "isi", "bui", "fwi"]

    def _stream(batches):
        # the partition is sorted by the cell key, so every cell is one
        # contiguous run; accumulate Arrow batches to ~chunk_rows, hold
        # back the (possibly continuing) last cell's suffix, and hand
        # _calc only COMPLETE cells
        acc: list[pd.DataFrame] = []
        nacc = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            acc.append(pdf)
            nacc += len(pdf)
            if nacc < chunk_rows:
                continue
            whole = pd.concat(acc, ignore_index=True) \
                if len(acc) > 1 else acc[0]
            tail_mask = np.ones(len(whole), dtype=bool)
            last = whole.iloc[-1]
            for c in cells_l:
                v = whole[c]
                lv = last[c]
                # null-aware: a NaN/null cell key never ==-matches
                # itself, which would split that cell across chunks and
                # silently restart the FWI recursion mid-series
                if pd.isna(lv):
                    tail_mask &= v.isna().to_numpy()
                else:
                    tail_mask &= (v == lv).fillna(False).to_numpy()
            cut = len(whole) - int(tail_mask.sum())
            if cut == 0:
                # one cell larger than the chunk target still in flight
                acc, nacc = [whole], len(whole)
                continue
            yield _calc(whole.iloc[:cut])[out_names]
            held = whole.iloc[cut:]
            acc, nacc = [held], len(held)
        if nacc:
            whole = pd.concat(acc, ignore_index=True) \
                if len(acc) > 1 else acc[0]
            yield _calc(whole)[out_names]

    return df.repartition(nblocks, *cells_l) \
        .sortWithinPartitions(*cells_l) \
        .mapInPandas(_stream, schema=schema)

# ---------------------------------------------------------------------------
# Public closed-form component equations as Column expressions.
#
# The reference exposes initial_spread_index / build_up_index /
# fire_weather_index as standalone public functions (_cffwis.py:1040-1169)
# so users can recombine stored moisture codes without re-running the
# stateful iterator; here they are pure JVM-side expressions (whole-stage
# codegen, no Python in the hot path).  Equation numbers are the Van
# Wagner 1987 / CFFDRS forms, identical to the scalar kernels above.
# ---------------------------------------------------------------------------

def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


def initial_spread_index(ws, ffmc) -> Column:
    """ISI from wind speed (km/h) and FFMC (ref _cffwis.py:1040)."""
    ws, ffmc = _c(ws), _c(ffmc)
    mo = 147.2 * (101.0 - ffmc) / (59.5 + ffmc)  # Eq.1
    ff = 19.1152 * F.exp(mo * -0.1386) * (1.0 + F.pow(mo, 5.31) / 4.93e7)
    return ff * F.exp(0.05039 * ws)  # Eq.26


def build_up_index(dmc, dc) -> Column:
    """BUI from DMC and DC (ref _cffwis.py:1072, Eq.27a/27b)."""
    dmc, dc = _c(dmc), _c(dc)
    denom = dmc + 0.4 * dc
    low = 0.8 * dc * dmc / denom  # Eq.27a
    high = dmc - (1.0 - 0.8 * dc / denom) * \
        (0.92 + F.pow(0.0114 * dmc, 1.7))  # Eq.27b
    return F.when((dmc == 0.0) & (dc == 0.0), F.lit(0.0)).otherwise(
        F.when(dmc <= 0.4 * dc, low).otherwise(high)
    )


def fire_weather_index(isi, bui) -> Column:
    """FWI from ISI and BUI (ref _cffwis.py:1105, Eqs.28-30).  BUI is
    clamped at 0 exactly like the scalar/vectorized kernels."""
    isi, bui = _c(isi), _c(bui)
    b = F.greatest(bui, F.lit(0.0))
    fwi = F.when(
        b <= 80.0, 0.1 * isi * (0.626 * F.pow(b, 0.809) + 2.0)  # Eq.28a
    ).otherwise(
        0.1 * isi * (1000.0 / (25.0 + 108.64 / F.exp(0.023 * b)))  # Eq.28b
    )
    return F.when(
        fwi > 1.0, F.exp(2.72 * F.pow(0.434 * F.log(fwi), 0.647))  # Eq.30b
    ).otherwise(fwi)


def overwintering_drought_code(
    last_dc, winter_pr,
    carry_over_fraction: float = 0.75,
    wetting_efficiency_fraction: float = 0.75,
    min_dc: float = 15.0,
) -> Column:
    """Season-starting Drought Code from the previous season's final DC
    and accumulated winter precipitation in mm — the cffdrs "wDC" method
    (ref _cffwis.py:522-553,1170-1260; Cantin 2014; Lawson & Armitage
    2008 Table 9).  Null in, null out (the reference propagates NaN)."""
    dcf, wpr = _c(last_dc), _c(winter_pr)
    qf = 800.0 * F.exp(-dcf / 400.0)
    qs = carry_over_fraction * qf + wetting_efficiency_fraction * (3.94 * wpr)
    dcs = 400.0 * F.log(800.0 / qs)
    # greatest() skips nulls, which would resurrect a null input as
    # min_dc; the reference propagates missing state instead
    return F.when(dcs.isNull(), F.lit(None).cast("double")).otherwise(
        F.greatest(dcs, F.lit(float(min_dc)))
    )
