"""Statistical tier: distribution fitting, frequency analysis, SPI.

Spark re-expression of the reference's stats machinery
(``src/xclim/indices/stats.py``): per-cell series fit via
``applyInPandas`` (the series for one cell fits comfortably in one task —
the same "single chunk along time" constraint the reference imposes,
stats.py / _cffwis.py:912), everything else stays in DataFrame land.

No scipy in this environment: the distribution kernels live in
:mod:`.distributions` (pure numpy, published estimators).
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..calendar import period_start
from ..util import repartition_for_apply
from . import distributions as D

__all__ = ["fit", "get_dist", "parametric_quantile", "parametric_cdf",
           "parametric_pdf", "dist_method", "fa", "frequency_analysis",
           "standardized_index", "standardized_index_fit_params",
           "preprocess_standardized_index",
           "standardized_precipitation_index",
           "standardized_precipitation_evapotranspiration_index",
           "standardized_streamflow_index",
           "standardized_groundwater_index",
           "distributions"]

distributions = D


def _key_schema(df: DataFrame, cells: Sequence[str]) -> str:
    fields = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    return ", ".join(f"{c} {fields[c]}" for c in cells)


def get_dist(dist: str):
    """Validated accessor for a named distribution's kernel table
    (reference ``get_dist``, stats.py:551-570 — there a scipy
    rv_continuous; here the scipy-free kernel entry of
    distributions.DISTS)."""
    if dist not in D.DISTS:
        raise ValueError(f"Unknown distribution {dist!r}; "
                         f"available: {sorted(D.DISTS)}")
    return D.DISTS[dist]


def fit(
    df: DataFrame,
    var: str,
    dist: str = "norm",
    method: str = "ML",
    *,
    time: str = "time",
    cells: Sequence[str] = (),
) -> DataFrame:
    """Fit ``dist`` to each cell's series (reference stats.py:115-220).

    Returns ``cells..., dparams array<double>`` (scipy parameter order
    ``*shapes, loc, scale``).  Plan: one shuffle on the cell key, one
    pandas task per cell."""
    schema = _key_schema(df, cells) + ", dparams ARRAY<DOUBLE>"

    def _fit(pdf: pd.DataFrame) -> pd.DataFrame:
        p = D.fit_params(pdf[var].to_numpy(), dist, method)
        out = {c: [pdf[c].iloc[0]] for c in cells}
        out["dparams"] = [list(map(float, p))]
        return pd.DataFrame(out)

    return repartition_for_apply(df, cells).groupBy(*cells) \
        .applyInPandas(_fit, schema=schema)


def parametric_quantile(
    params_df: DataFrame,
    q: float | Sequence[float],
    dist: str,
    *,
    cells: Sequence[str] = (),
) -> DataFrame:
    """Evaluate fitted quantiles (reference stats.py:221-296).  Returns
    long format ``cells..., quantile, value``."""
    return _parametric_eval(params_df, q, dist, D.ppf_rows, "value",
                            "quantile", cells)


def _params_matrix(pdf: pd.DataFrame, dist: str):
    """(n, k) float matrix from an Arrow ``dparams`` column (rows may be
    None or ragged-null)."""
    import numpy as np

    k = D.nparams(dist)
    nan = [float("nan")] * k
    return np.array(
        [list(p) if p is not None and len(p) == k else nan
         for p in pdf["dparams"]], dtype=float).reshape(len(pdf), k)


def _parametric_eval(params_df, xs, dist, row_kernel, out_col, x_col, cells):
    """Shared evaluator for ppf/cdf/pdf on a fitted-parameter table.

    ``mapInPandas`` over the params table — no shuffle at all (the old
    ``groupBy(cells).applyInPandas`` paid a full exchange plus one pandas
    task per cell); each Arrow batch evaluates every row at once through
    the row-vectorized kernels (distributions.py ``*_rows``), so the cost
    is O(batches), not O(cells)."""
    xs = [xs] if isinstance(xs, (int, float)) else list(xs)
    schema = _key_schema(params_df, cells) + \
        f", {x_col} DOUBLE, {out_col} DOUBLE"
    key_cols = list(cells)

    def _ev(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            P = _params_matrix(pdf, dist)
            for xx in xs:
                out = pdf[key_cols].copy()
                out[x_col] = float(xx)
                out[out_col] = row_kernel(P, dist, float(xx))
                yield out

    return params_df.mapInPandas(_ev, schema=schema)


def parametric_cdf(
    params_df: DataFrame, x: float | Sequence[float], dist: str, *,
    cells: Sequence[str] = (),
) -> DataFrame:
    """Evaluate the fitted CDF at ``x`` (reference ``parametric_cdf``,
    stats.py:297-360).  Returns ``cells..., x, cdf``."""
    return _parametric_eval(params_df, x, dist, D.cdf_rows, "cdf", "x",
                            cells)


def parametric_pdf(
    params_df: DataFrame, x: float | Sequence[float], dist: str, *,
    cells: Sequence[str] = (),
) -> DataFrame:
    """Evaluate the fitted PDF at ``x`` (reference ``parametric_pdf``).
    Returns ``cells..., x, pdf``."""
    return _parametric_eval(params_df, x, dist, D.pdf_rows, "pdf", "x",
                            cells)


def dist_method(
    function: str,
    params_df: DataFrame,
    arg: float | Sequence[float],
    dist: str,
    *,
    cells: Sequence[str] = (),
) -> DataFrame:
    """Dispatch a distribution method over a fitted-parameter table
    (reference ``dist_method``, stats.py:395-428, which forwards to any
    ``rv_continuous`` method).  Supported here for every registered
    distribution: ``ppf``, ``cdf``, ``pdf``, ``sf`` (survival, 1-cdf),
    ``isf`` (inverse survival, ppf(1-q)), ``logcdf``, ``logsf``,
    ``logpdf`` — the full set the reference's indicator/analysis code
    actually calls through ``dist_method``."""
    if function == "ppf":
        return parametric_quantile(params_df, arg, dist, cells=cells)
    if function == "cdf":
        return parametric_cdf(params_df, arg, dist, cells=cells)
    if function == "pdf":
        return parametric_pdf(params_df, arg, dist, cells=cells)
    derived = {
        "sf": (lambda P, d, x: 1.0 - D.cdf_rows(P, d, x), "sf"),
        "isf": (lambda P, d, q: D.ppf_rows(P, d, 1.0 - q), "isf"),
        "logcdf": (lambda P, d, x: np.log(D.cdf_rows(P, d, x)), "logcdf"),
        "logsf": (lambda P, d, x: np.log(1.0 - D.cdf_rows(P, d, x)),
                  "logsf"),
        "logpdf": (lambda P, d, x: np.log(D.pdf_rows(P, d, x)), "logpdf"),
    }
    if function in derived:
        kernel, out_col = derived[function]
        x_col = "q" if function == "isf" else "x"
        return _parametric_eval(params_df, arg, dist, kernel, out_col,
                                x_col, cells)
    raise ValueError(f"Unsupported dist method: {function}")


def preprocess_standardized_index(
    df: DataFrame, var: str, freq: str | None, window: int, *,
    time: str = "time", cells: Sequence[str] = (),
    alias: str = "_roll",
) -> DataFrame:
    """Resample + rolling accumulation step of the standardized indices
    (reference ``preprocess_standardized_index``, stats.py:770-838):
    sum to ``freq`` (skipped when ``freq=None`` — already resampled),
    then a ``window``-period rolling sum, NULL until the window fills.
    Exposed as the named entry point the reference's two-call pattern
    uses; :func:`standardized_index` fuses the same steps inline.
    Returns ``cells..., period, <alias>``."""
    from ..operators.generic import select_resample_op

    if freq is not None:
        acc = select_resample_op(df, var, "sum", freq, time=time,
                                 cells=cells, alias="_acc")
    else:
        acc = df.select(*cells, F.col(time).alias("period"),
                        F.col(var).alias("_acc"))
    w = Window.partitionBy(*cells).orderBy("period") \
        .rowsBetween(-(window - 1), 0)
    cnt = F.count("_acc").over(w)
    return acc.withColumn(
        alias, F.when(cnt >= window, F.sum("_acc").over(w))
    ).drop("_acc")


def standardized_index_fit_params(
    df: DataFrame,
    var: str,
    *,
    window: int = 1,
    dist: str = "gamma",
    freq: str = "MS",
    cal_start: str | None = None,
    cal_end: str | None = None,
    method: str = "ML",
    time: str = "time",
    cells: Sequence[str] = (),
) -> DataFrame:
    """Calibration parameters of the standardized index (reference
    ``standardized_index_fit_params``, stats.py:770-838): per
    (cell, month-of-year), the zero-mass ``prob_of_zero`` and the fitted
    ``dparams`` of the accumulation distribution.  The transform step
    (:func:`standardized_index`) recomputes these inline; this entry
    point exposes them for the reference's two-call pattern."""
    from ..operators.generic import select_resample_op

    acc = select_resample_op(df, var, "sum", freq, time=time, cells=cells,
                             alias="_acc")
    w = Window.partitionBy(*cells).orderBy("period") \
        .rowsBetween(-(window - 1), 0)
    cnt = F.count("_acc").over(w)
    acc = acc.withColumn("_roll", F.when(cnt >= window,
                                         F.sum("_acc").over(w)))
    schema = _key_schema(df, cells) + \
        ", month INT, prob_of_zero DOUBLE, dparams ARRAY<DOUBLE>"
    lo = pd.Timestamp(cal_start) if cal_start else None
    hi = pd.Timestamp(cal_end) if cal_end else None

    def _fit(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values("period")
        x = pdf["_roll"].to_numpy(dtype=float)
        per = pd.to_datetime(pdf["period"])
        months = per.dt.month.to_numpy()
        cal_base = np.isfinite(x)
        if lo is not None:
            cal_base &= (per >= lo).to_numpy()
        if hi is not None:
            cal_base &= (per <= hi).to_numpy()
        rows = []
        key = tuple(pdf[c].iloc[0] for c in cells)
        for m in np.unique(months):
            xc = x[cal_base & (months == m)]
            if len(xc) <= 1:
                continue
            p0 = float(np.mean(xc == 0.0)) if dist == "gamma" else 0.0
            pos = xc[xc > 0] if dist == "gamma" else xc
            if len(pos) <= 1:
                continue
            params = D.fit_params(pos, dist, method)
            rows.append(key + (int(m), p0, list(map(float, params))))
        return pd.DataFrame(
            rows, columns=[*cells, "month", "prob_of_zero", "dparams"])

    return repartition_for_apply(acc, cells).groupBy(*cells) \
        .applyInPandas(_fit, schema=schema)


def fa(
    df: DataFrame,
    var: str,
    t: int | Sequence[int],
    dist: str = "gumbel_r",
    mode: str = "max",
    method: str = "PWM",
    *,
    freq: str = "YS",
    time: str = "time",
    cells: Sequence[str] = (),
    alias: str = "value",
) -> DataFrame:
    """Frequency analysis / return-period values (reference
    stats.py:429-560): resample extremes at ``freq`` -> fit -> quantile at
    ``1 - 1/T`` (mode max) or ``1/T`` (mode min).

    Returns ``cells..., return_period, <alias>``.  Two shuffles total:
    the resample groupBy and the per-cell fit (which reuses the cell
    partitioning)."""
    from ..operators.generic import select_resample_op

    ts = [t] if isinstance(t, int) else list(t)
    extremes = select_resample_op(df, var, mode, freq, time=time,
                                  cells=cells, alias="_ext")
    schema = _key_schema(df, cells) + f", return_period INT, {alias} DOUBLE"

    def _fa(pdf: pd.DataFrame) -> pd.DataFrame:
        p = D.fit_params(pdf["_ext"].to_numpy(), dist, method)
        rows = []
        for T in ts:
            qq = 1.0 - 1.0 / T if mode in ("max", "high") else 1.0 / T
            v = float(D.ppf(p, dist, [qq])[0]) if not pd.isna(p).any() \
                else float("nan")
            rows.append(tuple(pdf[c].iloc[0] for c in cells) + (T, v))
        return pd.DataFrame(rows, columns=[*cells, "return_period", alias])

    return repartition_for_apply(extremes, cells).groupBy(*cells) \
        .applyInPandas(_fa, schema=schema)


frequency_analysis = fa


def standardized_index(
    df: DataFrame,
    var: str,
    *,
    window: int = 1,
    dist: str = "gamma",
    freq: str = "MS",
    cal_start: str | None = None,
    cal_end: str | None = None,
    method: str = "ML",
    clip: float = 8.21,
    time: str = "time",
    cells: Sequence[str] = (),
    alias: str = "spi",
) -> DataFrame:
    """Standardized index (SPI/SSI family; reference stats.py:770-1050).

    Pipeline: resample to ``freq`` sums -> rolling ``window``-period
    accumulation per cell -> group by period-of-year (month) -> fit
    ``dist`` on the calibration range with zero-inflation handling
    (P0 + (1-P0) cdf) -> normal ppf, clipped to ±``clip``.

    One shuffle for the resample, one window sort, one shuffle on
    (cell, month) for the grouped fit — each keyed small and skew-free.
    Returns ``cells..., period, <alias>``."""
    from ..operators.generic import select_resample_op

    acc = select_resample_op(df, var, "sum", freq, time=time, cells=cells,
                             alias="_acc")
    w = Window.partitionBy(*cells).orderBy("period") \
        .rowsBetween(-(window - 1), 0)
    cnt = F.count("_acc").over(w)
    acc = acc.withColumn("_roll", F.when(cnt >= window,
                                         F.sum("_acc").over(w)))

    schema = _key_schema(df, cells) + f", period DATE, {alias} DOUBLE"
    lo, hi = pd.Timestamp(cal_start) if cal_start else None, \
        pd.Timestamp(cal_end) if cal_end else None

    # One pandas task per CELL (not per (cell, month)): the 12
    # month-of-year fits run inside the task — 12x fewer Arrow groups,
    # and the groupBy reuses the window's cell partitioning.
    def _spi(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values("period")
        x = pdf["_roll"].to_numpy(dtype=float)
        per = pd.to_datetime(pdf["period"])
        months = per.dt.month.to_numpy()
        cal_base = np.isfinite(x)
        if lo is not None:
            cal_base &= (per >= lo).to_numpy()
        if hi is not None:
            cal_base &= (per <= hi).to_numpy()
        out = np.full(len(x), np.nan)
        for m in np.unique(months):
            sel = months == m
            cal = cal_base & sel
            xc = x[cal]
            if len(xc) <= 1:
                continue
            p0 = float(np.mean(xc == 0.0)) if dist == "gamma" else 0.0
            pos = xc[xc > 0] if dist == "gamma" else xc
            if len(pos) <= 1:
                continue
            params = D.fit_params(pos, dist, method)
            if np.isnan(params).any():
                continue
            valid = sel & np.isfinite(x)
            c = np.zeros(len(x))
            # gamma: P0 mass at zero, cdf on the positive part only;
            # unbounded dists (fisk/genextreme/norm) evaluate everywhere
            ev = valid & (x > 0) if dist == "gamma" else valid
            c[ev] = D.cdf(params, dist, x[ev])
            prob = p0 + (1.0 - p0) * c
            prob = np.clip(prob, 5e-4, 1.0 - 5e-4)
            out[valid] = np.clip(D.probit(prob[valid]), -clip, clip)
        res = {c: pdf[c].to_numpy() for c in cells}
        res["period"] = pdf["period"].to_numpy()
        res[alias] = out
        return pd.DataFrame(res)

    return repartition_for_apply(acc, cells).groupBy(*cells) \
        .applyInPandas(_spi, schema=schema)


def standardized_precipitation_index(df, pr, **kw):
    """SPI (reference _agro.py:987-1147): gamma-fitted standardized
    index over precipitation accumulation.  Thin front over
    :func:`standardized_index` with the reference defaults."""
    kw.setdefault("dist", "gamma")
    kw.setdefault("alias", "spi")
    return standardized_index(df, pr, **kw)


def standardized_precipitation_evapotranspiration_index(
    df, wb, *, offset: float | None = None, **kw
):
    """SPEI (reference _agro.py:1148-1291) over a water-budget column
    (``pr - pet``, see :func:`xclim_spark.functions.water_budget`).

    ``dist='fisk'`` (the Vicente-Serrano 2010 log-logistic, default here)
    handles negative budgets natively; for ``gamma`` an ``offset``
    (default 1.0 unit/day, the reference's classic choice) shifts the
    series positive before fitting — the standardization is
    shift-invariant in probability space.
    """
    kw.setdefault("dist", "fisk")
    kw.setdefault("alias", "spei")
    if offset is None and kw["dist"] == "gamma":
        offset = 1.0
    if offset:
        df = df.withColumn(wb, F.col(wb) + float(offset))
    return standardized_index(df, wb, **kw)


def standardized_streamflow_index(df, q, **kw):
    """SSI (reference _hydrology.py:136-233): genextreme-fitted
    standardized index over streamflow."""
    kw.setdefault("dist", "genextreme")
    kw.setdefault("alias", "ssi")
    return standardized_index(df, q, **kw)


def standardized_groundwater_index(df, head, **kw):
    """SGI (reference _hydrology.py:447-541): gamma-fitted standardized
    index over groundwater levels."""
    kw.setdefault("dist", "gamma")
    kw.setdefault("alias", "sgi")
    return standardized_index(df, head, **kw)
