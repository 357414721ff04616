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
def zech_aslan(x: np.ndarray, y: np.ndarray, *, dmin: float = 1e-12) -> float:
    """Zech-Aslan energy dissimilarity (reference analog.py:255-321):
    log-weighted standardized-Euclidean charge energy
    ``phi_xx + phi_yy - phi_xy`` with pole cut-off ``dmin``."""
    nx, ny = len(x), len(y)
    v = (x.std(0, ddof=1) * y.std(0, ddof=1)).astype(float)
    v[v == 0] = 1.0

    def sed(a, b):
        return np.sqrt((((a[:, None, :] - b[None, :, :]) ** 2) / v).sum(-1))

    dx, dy, dxy = sed(x, x), sed(y, y), sed(x, y)
    iux = np.triu_indices(nx, 1)
    iuy = np.triu_indices(ny, 1)
    phix = -np.log(dx[iux].clip(dmin)).sum() / (nx * (nx - 1))
    phiy = -np.log(dy[iuy].clip(dmin)).sum() / (ny * (ny - 1))
    phixy = -np.log(dxy.clip(dmin)).sum() / (nx * ny)
    return float(phix + phiy - phixy)


@metric
def friedman_rafsky(x: np.ndarray, y: np.ndarray) -> float:
    """Friedman-Rafsky MST runs statistic (reference analog.py:389-432):
    build the minimal spanning tree of the pooled sample (Prim's
    algorithm on the dense distance matrix — the reference's
    scipy/sklearn path without the dependencies) and count edges
    crossing samples; ``1 - (1 + crossings)/n``."""
    nx = len(x)
    xy = np.vstack([x, y])
    n = len(xy)
    d = ((xy[:, None, :] - xy[None, :, :]) ** 2).sum(-1)

    in_tree = np.zeros(n, dtype=bool)
    best = np.full(n, np.inf)
    parent = np.full(n, -1)
    in_tree[0] = True
    best_upd = d[0]
    mask = ~in_tree
    best[mask] = best_upd[mask]
    parent[mask] = 0
    crossings = 0
    for _ in range(n - 1):
        j = int(np.where(mask, best, np.inf).argmin())
        in_tree[j] = True
        mask[j] = False
        if (parent[j] < nx) != (j < nx):
            crossings += 1
        upd = d[j] < best
        upd &= mask
        best[upd] = d[j][upd]
        parent[upd] = j
    return float(1.0 - (1.0 + crossings) / n)


@metric
def kolmogorov_smirnov(x: np.ndarray, y: np.ndarray) -> float:
    """Multivariate KS statistic, Fasano-Franceschini style (reference
    analog.py:434-497): max quadrant-count difference over both pivot
    choices."""
    def pivot(_x, _y):
        nx, d = _x.shape
        ny, _ = _y.shape
        mf = (2 ** np.arange(d)).reshape(1, d, 1)
        minlength = 2 ** d
        ix = ((_x.T <= np.atleast_3d(_x)) * mf).sum(1)
        iy = ((_x.T <= np.atleast_3d(_y)) * mf).sum(1)
        cx = np.apply_along_axis(
            np.bincount, 0, ix, minlength=minlength) * 1.0 / nx
        cy = np.apply_along_axis(
            np.bincount, 0, iy, minlength=minlength) * 1.0 / ny
        return float(np.max(np.abs(cx - cy)))

    return max(pivot(x, y), pivot(y, x))


@metric
def kldiv(x: np.ndarray, y: np.ndarray, *,
          k: int | Sequence[int] = 1) -> float | list[float]:
    """Kullback-Leibler divergence D(P||Q) from samples via kth-NN
    distances (Perez-Cruz 2008; reference analog.py:499-587).  Dense
    distance matrices + ``np.partition`` replace the reference's KDTree
    — same estimator, no scipy."""
    mk = np.iterable(k)
    ka = np.atleast_1d(k)
    nx, d = x.shape
    ny, _ = y.shape
    if d > 10:
        raise ValueError(f"Too many dimensions: {d}.")
    if nx < 5 or ny < 5:
        return [np.nan] * len(ka) if mk else np.nan

    dxx = np.sqrt(((x[:, None, :] - x[None, :, :]) ** 2).sum(-1))
    dxy = np.sqrt(((x[:, None, :] - y[None, :, :]) ** 2).sum(-1))
    # row-sorted distances: dxx column 0 is the self-distance (0)
    r = np.sort(dxx, axis=1)
    s = np.sort(dxy, axis=1)
    out = []
    for ki in ka:
        ki = int(ki)
        # kth NN of x[i] within x excludes self -> column ki; within y
        # there is no self -> column ki-1 (reference analog.py:577-581)
        val = -np.log(r[:, ki] / s[:, ki - 1]).sum() * d / nx \
            + np.log(ny / (nx - 1.0))
        out.append(float(val))
    return out if mk else out[0]


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
