"""Spatial analogs: multivariate dissimilarity between a target site's
distribution and every candidate cell (reference ``src/xclim/analog.py``).

The target sample (one site's multivariate series — small) is captured in
the task closure; candidates are processed one cell per pandas task
(``applyInPandas`` keyed by cell), so the search over a large grid
parallelizes over cells with no all-pairs structure.

Metrics are numpy implementations of the published formulas (scipy is
absent here): standardized-euclidean of means, nearest-neighbour
agreement, Székely-Rizzo energy distance, Mahalanobis of means.
New metrics register with :func:`metric` (reference analog.py:133).
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .util import repartition_for_apply

__all__ = ["metric", "METRICS", "seuclidean", "nearest_neighbor",
           "szekely_rizzo", "mahalanobis", "spatial_analogs"]

METRICS: dict[str, object] = {}


def metric(fn):
    """Register a dissimilarity metric (reference ``@metric``,
    analog.py:133)."""
    METRICS[fn.__name__] = fn
    return fn


def _standardize(x: np.ndarray, y: np.ndarray):
    """Joint standardization by sqrt of the product of standard deviations
    (reference ``standardize``, analog.py)."""
    s = np.sqrt(x.std(0, ddof=1) * y.std(0, ddof=1))
    s[s == 0] = 1.0
    return x / s, y / s


@metric
def seuclidean(x: np.ndarray, y: np.ndarray) -> float:
    """Standardized Euclidean distance between sample means, variance from
    the reference sample (reference analog.py:182-214)."""
    v = x.var(axis=0, ddof=1)
    v[v == 0] = 1.0
    d = (x.mean(0) - y.mean(0)) ** 2 / v
    return float(np.sqrt(d.sum()))


@metric
def nearest_neighbor(x: np.ndarray, y: np.ndarray) -> float:
    """Fraction of pooled points whose nearest neighbour belongs to the
    same sample (reference analog.py:217-260): 0.5 for identical
    distributions, ->1 for disjoint ones.  Rescaled to [0, 1] as in the
    reference (2 |f - 0.5|)... the reference reports the raw mean, so we
    do too."""
    x, y = _standardize(x, y)
    pooled = np.vstack([x, y])
    labels = np.array([0] * len(x) + [1] * len(y))
    d = ((pooled[:, None, :] - pooled[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d, np.inf)
    nn = d.argmin(axis=1)
    same = labels[nn] == labels
    return float(same.mean())


@metric
def szekely_rizzo(x: np.ndarray, y: np.ndarray, *,
                  standardize: bool = True) -> float:
    """Székely-Rizzo energy distance (reference analog.py:323-433):
    ``w (2 sXY - sXX - sYY)`` with ``w = nm/(n+m)``; standardized
    Euclidean norm by default."""
    n, m = len(x), len(y)
    if standardize:
        v = (x.std(0, ddof=1) * y.std(0, ddof=1)).astype(float)
        v[v == 0] = 1.0
    else:
        v = np.ones(x.shape[1])

    def dmat(a, b):
        return np.sqrt((((a[:, None, :] - b[None, :, :]) ** 2) / v).sum(-1))

    sXY = dmat(x, y).sum() / (n * m)
    sXX = dmat(x, x).sum() / n ** 2
    sYY = dmat(y, y).sum() / m ** 2
    w = n * m / (n + m)
    return float(w * (2 * sXY - sXX - sYY))


@metric
def mahalanobis(x: np.ndarray, y: np.ndarray) -> float:
    """Mahalanobis distance between sample means under the pooled
    covariance (reference analog.py mahalanobis)."""
    cov = np.cov(np.vstack([x, y]).T, ddof=1)
    cov = np.atleast_2d(cov)
    diff = x.mean(0) - y.mean(0)
    inv = np.linalg.pinv(cov)
    return float(np.sqrt(diff @ inv @ diff))


def spatial_analogs(
    target: DataFrame | "pd.DataFrame",
    candidates: DataFrame,
    variables: Sequence[str],
    *,
    cells: Sequence[str],
    method: str = "seuclidean",
    alias: str = "dissimilarity",
    **metric_kwargs,
) -> DataFrame:
    """Dissimilarity of every candidate cell to the target distribution
    (reference ``spatial_analogs``, analog.py:21-130).

    ``target`` may be a Spark or pandas DataFrame holding the target
    site's series of ``variables`` (collected to the driver — one site's
    series is small, mirroring the reference's in-memory target).
    Returns ``cells..., <alias>`` sorted plan-free (caller orders).
    """
    if method not in METRICS:
        raise ValueError(f"Unknown metric {method!r}; have {list(METRICS)}")
    fn = METRICS[method]
    if isinstance(target, DataFrame):
        tgt = np.array(
            [[r[v] for v in variables] for r in
             target.select(*variables).collect()], dtype=float)
    else:
        tgt = target[list(variables)].to_numpy(dtype=float)

    fields = {f.name: f.dataType.simpleString()
              for f in candidates.schema.fields}
    schema = ", ".join(
        [f"{c} {fields[c]}" for c in cells] + [f"{alias} DOUBLE"]
    )

    def _dist(pdf: pd.DataFrame) -> pd.DataFrame:
        y = pdf[list(variables)].to_numpy(dtype=float)
        y = y[np.isfinite(y).all(axis=1)]
        val = float(fn(tgt, y, **metric_kwargs)) if len(y) > 1 else np.nan
        out = {c: [pdf[c].iloc[0]] for c in cells}
        out[alias] = [val]
        return pd.DataFrame(out)

    return repartition_for_apply(candidates, cells) \
        .groupBy(*cells).applyInPandas(_dist, schema=schema)
