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


def test_zech_aslan_separates():
    rng = np.random.RandomState(7)
    x = rng.randn(80, 2)
    same = rng.randn(80, 2)
    far = rng.randn(80, 2) + 4.0
    assert analog.zech_aslan(x, same) < analog.zech_aslan(x, far)


def test_friedman_rafsky_bounds_and_separation():
    rng = np.random.RandomState(8)
    x = rng.randn(60, 2)
    same = rng.randn(60, 2)
    far = rng.randn(60, 2) + 6.0
    d_same = analog.friedman_rafsky(x, same)
    d_far = analog.friedman_rafsky(x, far)
    # overlapping samples cross often (low stat); disjoint clouds cross
    # once -> statistic near (n-1)/n
    assert 0.0 <= d_same < d_far <= (120 - 1) / 120
    assert d_far > 0.9


def test_kolmogorov_smirnov_identical_and_shifted():
    rng = np.random.RandomState(9)
    x = rng.randn(200, 2)
    assert analog.kolmogorov_smirnov(x, x.copy()) < 0.05
    y = rng.randn(200, 2) + 3.0
    assert analog.kolmogorov_smirnov(x, y) > 0.8


@pytest.mark.slow
def test_kldiv_1d_normals_close_to_analytic():
    # D(N(0,1) || N(mu,1)) = mu^2/2; with mu=1 -> 0.5
    rng = np.random.RandomState(10)
    x = rng.randn(4000, 1)
    y = rng.randn(4000, 1) + 1.0
    est = analog.kldiv(x, y, k=5)
    assert abs(est - 0.5) < 0.15
    # identical distributions -> ~0
    z = rng.randn(4000, 1)
    assert abs(analog.kldiv(x, z, k=5)) < 0.1


def test_kldiv_k_sequence_and_small_sample_nan():
    rng = np.random.RandomState(11)
    x, y = rng.randn(100, 2), rng.randn(100, 2)
    out = analog.kldiv(x, y, k=[1, 2, 3])
    assert len(out) == 3
    assert np.isnan(analog.kldiv(x[:3], y))
