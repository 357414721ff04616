"""CFFWIS stateful kernel tests.

The canonical single-day check is the cffdrs R package example
(yda codes FFMC=85, DMC=6, DC=15; noon obs T=17 degC, RH=42 %,
WS=25 km/h, prec=0 mm, lat=55, 1985-04-13) whose published outputs are
FFMC~87.69, DMC~8.54, DC~19.01, ISI~10.85, BUI~8.49, FWI~10.10
(reference validates against the same R cffdrs outputs,
tests/test_cffwis.py)."""

import numpy as np
import pytest
from datetime import date

from xclim_spark.operators import fire


def test_cffdrs_single_day_example():
    out = fire.cffwis_1d(
        tas=[17.0], pr=[0.0], hurs=[42.0], ws=[25.0], months=[4],
        lat=55.0, ffmc0=85.0, dmc0=6.0, dc0=15.0,
    )
    assert out["ffmc"][0] == pytest.approx(87.69, abs=0.02)
    assert out["dmc"][0] == pytest.approx(8.54, abs=0.02)
    assert out["dc"][0] == pytest.approx(19.01, abs=0.02)
    assert out["isi"][0] == pytest.approx(10.85, abs=0.02)
    assert out["bui"][0] == pytest.approx(8.49, abs=0.02)
    assert out["fwi"][0] == pytest.approx(10.10, abs=0.02)


def test_rain_resets_codes_downward():
    # heavy rain day: FFMC and DMC must drop sharply from dry values
    dry = fire.cffwis_1d([20.0], [0.0], [30.0], [15.0], [7], 50.0,
                         ffmc0=90.0, dmc0=50.0, dc0=200.0)
    wet = fire.cffwis_1d([20.0], [25.0], [95.0], [15.0], [7], 50.0,
                         ffmc0=90.0, dmc0=50.0, dc0=200.0)
    assert wet["ffmc"][0] < dry["ffmc"][0] - 20
    assert wet["dmc"][0] < dry["dmc"][0]
    assert wet["dc"][0] < dry["dc"][0]


def test_state_carryover_monotone_drought():
    # rainless hot spell: DC strictly increases day over day
    n = 30
    out = fire.cffwis_1d([25.0] * n, [0.0] * n, [30.0] * n, [10.0] * n,
                         [7] * n, 45.0)
    assert np.all(np.diff(out["dc"]) > 0)
    assert np.all(np.diff(out["dmc"]) > 0)
    # FFMC saturates toward its dry equilibrium, staying <= 101
    assert out["ffmc"][-1] <= 101.0
    assert out["ffmc"][-1] > out["ffmc"][0] - 1e-9


def test_spark_operator_matches_kernel(spark):
    rng = np.random.RandomState(11)
    n = 120
    rows = []
    for cell in (1, 2):
        for i in range(n):
            rows.append((
                cell, date(2000, 1, 1).toordinal() + i,
                float(10 + 15 * rng.rand()), float(rng.gamma(0.5, 4.0)),
                float(30 + 60 * rng.rand()), float(5 + 20 * rng.rand()),
            ))
    import datetime as dt

    data = [(c, dt.date.fromordinal(o), t, p, h, w)
            for c, o, t, p, h, w in rows]
    df = spark.createDataFrame(
        data, "cell INT, time DATE, tas DOUBLE, pr DOUBLE, hurs DOUBLE, "
              "ws DOUBLE")
    out = fire.cffwis_indices(df, tas="tas", pr="pr", hurs="hurs",
                              sfcWind="ws", lat=47.0, cells=["cell"])
    got = out.filter("cell = 1").orderBy("time").collect()
    pdf = [r for r in data if r[0] == 1]
    ref = fire.cffwis_1d(
        [r[2] for r in pdf], [r[3] for r in pdf], [r[4] for r in pdf],
        [r[5] for r in pdf], [r[1].month for r in pdf], 47.0)
    np.testing.assert_allclose([r["fwi"] for r in got], ref["fwi"],
                               rtol=1e-12)
    np.testing.assert_allclose([r["dc"] for r in got], ref["dc"],
                               rtol=1e-12)
