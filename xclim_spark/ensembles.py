"""Ensemble tier: creation, statistics, percentiles, robustness.

Spark re-expression of ``src/xclim/ensembles/_base.py`` and
``_robustness.py``: an ensemble is a long DataFrame with a
``realization`` key column (the reference's extra dimension,
_base.py:31-140); every statistic is one hash-aggregate over
``(cells..., time-ish keys)`` — realizations for one point always land in
the same group, so the plan is a single shuffle with map-side partial
aggregation regardless of member count.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .operators.percentile import hf_quantile
from .util import repartition_for_apply

__all__ = [
    "create_ensemble",
    "ensemble_mean_std_max_min",
    "ensemble_percentiles",
    "hawkins_sutton",
    "fractional_uncertainty",
    "kkz_reduce_ensemble",
    "kmeans_reduce_ensemble",
    "robustness_fractions",
    "robustness_categories",
    "PERCENTILE_METHODS",
]

# numpy interpolation-method names -> Hyndman-Fan (alpha, beta)
# (reference ensemble_percentiles ``method`` param, _base.py:214-375)
PERCENTILE_METHODS = {
    "linear": (1.0, 1.0),
    "hazen": (0.5, 0.5),
    "weibull": (0.0, 0.0),
    "median_unbiased": (1 / 3, 1 / 3),
    "normal_unbiased": (3 / 8, 3 / 8),
}


def create_ensemble(
    members: Sequence[DataFrame] | dict[str, DataFrame],
    *,
    realization: str = "realization",
) -> DataFrame:
    """Union members by name with a ``realization`` key (reference
    create_ensemble / _ens_align_datasets, _base.py:31-140).  Members may
    have differing column order; missing columns error (align first)."""
    if isinstance(members, dict):
        items = list(members.items())
    else:
        items = list(enumerate(members))
    out = None
    for key, df in items:
        tagged = df.withColumn(realization, F.lit(key))
        out = tagged if out is None else out.unionByName(tagged)
    return out


def ensemble_mean_std_max_min(
    ens: DataFrame,
    var: str,
    *,
    keys: Sequence[str],
    min_members: int | None = 1,
    weights: dict | None = None,
    realization: str = "realization",
) -> DataFrame:
    """Fused mean/stdev/max/min/count across realizations (reference
    _base.py:141-213).  ``keys`` are the non-realization coordinates
    (cells + period).  ``min_members`` masks groups with fewer valid
    members (None = require all members).  ``weights`` maps realization
    key -> weight (plan-time dict, compiled to a CASE expression)."""
    v = F.col(var)
    if weights is None:
        mean = F.avg(v)
        std = F.stddev_pop(v)
    else:
        w = F.coalesce(*[
            F.when(F.col(realization) == k, F.lit(float(wt)))
            for k, wt in weights.items()
        ], F.lit(0.0))
        w = F.when(v.isNotNull(), w)
        mean = F.sum(v * w) / F.sum(w)
        std = F.sqrt(F.sum(w * v * v) / F.sum(w) -
                     (F.sum(v * w) / F.sum(w)) ** 2)
    n_members = ens.select(realization).distinct().count()
    need = n_members if min_members is None else min_members
    out = ens.groupBy(*keys).agg(
        mean.alias(f"{var}_mean"),
        std.alias(f"{var}_stdev"),
        F.max(v).alias(f"{var}_max"),
        F.min(v).alias(f"{var}_min"),
        F.count(v).alias("_nvalid"),
    )
    if need != 1:
        for stat in ("mean", "stdev", "max", "min"):
            c = f"{var}_{stat}"
            out = out.withColumn(
                c, F.when(F.col("_nvalid") >= need, F.col(c))
            )
    return out.drop("_nvalid")


def ensemble_percentiles(
    ens: DataFrame,
    var: str,
    values: Sequence[int] = (10, 50, 90),
    *,
    keys: Sequence[str],
    method: str = "linear",
    min_members: int | None = 1,
    realization: str = "realization",
) -> DataFrame:
    """Percentiles across realizations (reference _base.py:214-375), one
    column per requested percentile (``split=True`` form:
    ``<var>_p10``…).  ``method`` selects the Hyndman-Fan plotting
    positions (same six as numpy's interpolation methods)."""
    alpha, beta = PERCENTILE_METHODS[method]
    aggs = []
    for p in values:
        name = f"{var}_p{int(p)}"
        if (alpha, beta) == (1.0, 1.0):
            aggs.append(F.expr(f"percentile({var}, {p / 100.0})")
                        .alias(name))
        else:
            aggs.append(
                hf_quantile(var, p / 100.0, alpha=alpha, beta=beta)
                .alias(name)
            )
    aggs.append(F.count(F.col(var)).alias("_nvalid"))
    n_members = ens.select(realization).distinct().count()
    need = n_members if min_members is None else min_members
    out = ens.groupBy(*keys).agg(*aggs)
    if need != 1:
        for p in values:
            c = f"{var}_p{int(p)}"
            out = out.withColumn(
                c, F.when(F.col("_nvalid") >= need, F.col(c))
            )
    return out.drop("_nvalid")


def hawkins_sutton(
    df: DataFrame,
    var: str,
    *,
    time: str = "time",
    scenario: str = "scenario",
    model: str = "model",
    baseline: tuple[int, int] = (1971, 2000),
    variability_from: int = 2000,
    deg: int = 4,
) -> DataFrame:
    """Hawkins & Sutton (2009) variance partitioning (reference
    ``_partitioning.py:57-191``): split projection uncertainty into
    internal variability, model and scenario components.

    Pipeline: per-(scenario, model) polynomial smoothing
    (``applyInPandas`` — np.polyfit over the annual series), then pure
    aggregate algebra: variability = mean over models of the variance of
    decadal-mean residuals; model U(t) = mean over scenarios of the
    across-model variance of baseline-anomaly trends; scenario U(t) =
    across-scenario variance of model means.  Returns one row per year:
    ``time, variability, model, scenario, total``.
    """
    import pandas as pd

    fields = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    schema = (f"{scenario} {fields[scenario]}, {model} {fields[model]}, "
              f"{time} {fields[time]}, _sm DOUBLE, _res DOUBLE")

    def _smooth(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values(time)
        y = pdf[var].to_numpy(dtype=float)
        t = pd.to_datetime(pdf[time]).dt.year.to_numpy(dtype=float)
        coefs = np.polyfit(t, y, deg)
        sm = np.polyval(coefs, t)
        return pd.DataFrame({
            scenario: pdf[scenario].to_numpy(),
            model: pdf[model].to_numpy(),
            time: pdf[time].to_numpy(),
            "_sm": sm, "_res": y - sm,
        })

    smoothed = repartition_for_apply(df, [scenario, model]) \
        .groupBy(scenario, model).applyInPandas(_smooth, schema=schema)
    yr = F.year(time)

    # internal variability: decadal rolling mean of residuals, var over
    # (scenario, time >= variability_from), mean over models
    w10 = Window.partitionBy(scenario, model).orderBy(time) \
        .rowsBetween(-5, 4)
    dec = smoothed.withColumn("_dres", F.avg("_res").over(w10))
    nv = (
        dec.filter(yr >= variability_from)
        .groupBy(model).agg(F.var_pop("_dres").alias("_v"))
        .agg(F.avg("_v").alias("variability"))
    )

    # baseline anomaly of the smoothed series
    ref = (
        smoothed.filter((yr >= baseline[0]) & (yr <= baseline[1]))
        .groupBy(scenario, model).agg(F.avg("_sm").alias("_ref"))
    )
    anom = smoothed.join(ref, on=[scenario, model]) \
        .withColumn("_a", F.col("_sm") - F.col("_ref"))

    model_u = (
        anom.groupBy(time, scenario).agg(F.var_pop("_a").alias("_mv"))
        .groupBy(time).agg(F.avg("_mv").alias("model"))
    )
    scen_u = (
        anom.groupBy(time, scenario).agg(F.avg("_a").alias("_sm2"))
        .groupBy(time).agg(F.var_pop("_sm2").alias("scenario"))
    )
    out = model_u.join(scen_u, on=time).crossJoin(F.broadcast(nv))
    return out.withColumn(
        "total", F.col("variability") + F.col("model") + F.col("scenario")
    )


def fractional_uncertainty(partitioned: DataFrame) -> DataFrame:
    """Convert variance components to fractions of total (reference
    ``fractional_uncertainty``)."""
    out = partitioned
    for c in ("variability", "model", "scenario"):
        out = out.withColumn(c, F.col(c) / F.col("total"))
    return out


def kkz_reduce_ensemble(criteria, k: int) -> list:
    """KKZ ensemble-member selection (reference _reduce.py:177; Katsavounidis
    et al. 1994): driver-side numpy on the (member x criteria) matrix —
    the matrix is tiny after criteria reduction, exactly like the
    reference.  Returns selected member indices."""
    import numpy as np

    X = np.asarray(criteria, dtype=float)
    norm = (X - X.mean(axis=0)) / np.where(X.std(axis=0) == 0, 1,
                                           X.std(axis=0))
    center = norm.mean(axis=0)
    first = int(np.argmin(((norm - center) ** 2).sum(axis=1)))
    selected = [first]
    while len(selected) < min(k, len(norm)):
        dists = np.min(
            [((norm - norm[s]) ** 2).sum(axis=1) for s in selected], axis=0
        )
        dists[selected] = -1.0
        selected.append(int(np.argmax(dists)))
    return selected


def kmeans_reduce_ensemble(criteria, k: int, *, seed: int = 0,
                           n_iter: int = 100) -> list:
    """K-means ensemble reduction (reference _reduce.py:104): cluster the
    criteria matrix, return the member closest to each centroid
    (Lloyd's algorithm in numpy — sklearn is not available here)."""
    import numpy as np

    X = np.asarray(criteria, dtype=float)
    norm = (X - X.mean(axis=0)) / np.where(X.std(axis=0) == 0, 1,
                                           X.std(axis=0))
    rng = np.random.RandomState(seed)
    k = min(k, len(norm))
    centroids = norm[rng.choice(len(norm), k, replace=False)]
    for _ in range(n_iter):
        d = ((norm[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        lab = d.argmin(axis=1)
        new = np.array([
            norm[lab == j].mean(axis=0) if (lab == j).any() else centroids[j]
            for j in range(k)
        ])
        if np.allclose(new, centroids):
            break
        centroids = new
    out = []
    for j in range(k):
        d = ((norm - centroids[j]) ** 2).sum(axis=1)
        out.append(int(d.argmin()))
    return sorted(set(out))


def robustness_categories(
    fractions: DataFrame,
    *,
    categories: Sequence[str] = ("robust signal", "no change or no signal",
                                 "conflicting signal"),
    ops: Sequence[tuple[str, str]] = ((">=", ">="), ("<", None),
                                     (">=", "<")),
    thresholds: Sequence[tuple[float, float | None]] = ((0.66, 0.8),
                                                        (0.66, None),
                                                        (0.66, 0.8)),
    changed_col: str = "changed",
    agree_col: str = "agree",
) -> DataFrame:
    """Classify robustness fractions into categories (reference
    ``robustness_categories``, _robustness.py:336-429; IPCC AR6 advanced
    approach by default): each category tests (fraction changed, fraction
    agreeing on sign) against thresholds; the first match wins, encoded
    1..n with the category name alongside."""
    from .operators.generic import get_op

    expr = F.lit(None).cast("int")
    name = F.lit(None).cast("string")
    # build from last to first so the first category takes precedence
    for i in range(len(categories) - 1, -1, -1):
        cond = get_op(ops[i][0])(F.col(changed_col),
                                 F.lit(float(thresholds[i][0])))
        if ops[i][1] is not None and thresholds[i][1] is not None:
            cond = cond & get_op(ops[i][1])(
                F.col(agree_col), F.lit(float(thresholds[i][1])))
        expr = F.when(cond, F.lit(i + 1)).otherwise(expr)
        name = F.when(cond, F.lit(categories[i])).otherwise(name)
    return fractions.withColumn("category", expr) \
        .withColumn("category_name", name)


def robustness_fractions(
    fut: DataFrame,
    ref: DataFrame,
    var: str,
    *,
    keys: Sequence[str],
    realization: str = "realization",
) -> DataFrame:
    """Agreement fractions on the sign of change (reference
    robustness_fractions with ``test=None``, _robustness.py:74-335):
    for each point, the fraction of members whose future mean exceeds /
    falls below their reference mean.

    ``fut``/``ref`` carry one row per (realization, keys) — typically the
    output of a per-period reduction over each epoch.  Returns
    ``keys..., changed_positive, changed_negative, agree`` where ``agree``
    is the larger fraction (the reference's sign-agreement measure).

    Plan: one broadcast-free equi-join on (realization, keys) — both
    sides are already reduced, so the join input is members x points, not
    raw data — then one aggregate."""
    f = fut.select(realization, *keys, F.col(var).alias("_fut"))
    r = ref.select(realization, *keys, F.col(var).alias("_ref"))
    j = f.join(r, on=[realization, *keys])
    delta = F.col("_fut") - F.col("_ref")
    out = j.groupBy(*keys).agg(
        F.avg((delta > 0).cast("double")).alias("changed_positive"),
        F.avg((delta < 0).cast("double")).alias("changed_negative"),
        F.count(F.lit(1)).alias("valid_members"),
    )
    return out.withColumn(
        "agree", F.greatest("changed_positive", "changed_negative")
    )
