"""Spatial analog tests (reference tests/test_analog.py style)."""

import numpy as np
import pytest

from xclim_spark import analog


def _samples(shift=0.0, seed=0, n=200):
    rng = np.random.RandomState(seed)
    x = rng.randn(n, 2)
    y = rng.randn(n, 2) + shift
    return x, y


def test_seuclidean():
    x, y = _samples(0.0)
    near = analog.seuclidean(x, y)
    x, y = _samples(3.0)
    far = analog.seuclidean(x, y)
    assert near < 0.3 and far > 2.0
    # analytic: unit-variance samples shifted by s in both dims -> ~s*sqrt(2)
    assert far == pytest.approx(3 * np.sqrt(2), rel=0.15)


def test_nearest_neighbor():
    x, y = _samples(0.0)
    near = analog.nearest_neighbor(x, y)
    x, y = _samples(6.0)
    far = analog.nearest_neighbor(x, y)
    assert 0.4 < near < 0.62   # identical dists -> ~0.5
    assert far > 0.95          # disjoint -> ~1


def test_szekely_rizzo_energy():
    x, y = _samples(0.0)
    near = analog.szekely_rizzo(x, y)
    x, y = _samples(2.0)
    far = analog.szekely_rizzo(x, y)
    # identical distributions sit at sampling-noise level (the n*m/(n+m)
    # weight keeps the stat O(1)); a 2-sigma shift dominates it
    assert near < far / 10


def test_mahalanobis():
    x, y = _samples(0.0)
    assert analog.mahalanobis(x, y) < 0.3
    x, y = _samples(2.0)
    assert analog.mahalanobis(x, y) > 1.5


def test_spatial_analogs_ranks_true_analog_first(spark):
    rng = np.random.RandomState(3)
    # target: bivariate normal at (0, 10); candidates: 3 cells, one matches
    tgt = np.column_stack([rng.randn(150), 10 + rng.randn(150)])
    import pandas as pd

    target_pd = pd.DataFrame(tgt, columns=["t1", "t2"])
    rows = []
    for cell, (mu1, mu2) in enumerate([(0.0, 10.0), (5.0, 10.0),
                                       (0.0, 30.0)]):
        for _ in range(150):
            rows.append((cell, float(mu1 + rng.randn()),
                         float(mu2 + rng.randn())))
    cand = spark.createDataFrame(rows, "cell INT, t1 DOUBLE, t2 DOUBLE")
    out = analog.spatial_analogs(target_pd, cand, ["t1", "t2"],
                                 cells=["cell"], method="seuclidean")
    d = {r["cell"]: r["dissimilarity"] for r in out.collect()}
    assert d[0] < d[1] and d[0] < d[2]
    # energy distance agrees on the ranking
    out2 = analog.spatial_analogs(target_pd, cand, ["t1", "t2"],
                                  cells=["cell"], method="szekely_rizzo")
    d2 = {r["cell"]: r["dissimilarity"] for r in out2.collect()}
    assert d2[0] < d2[1] and d2[0] < d2[2]
