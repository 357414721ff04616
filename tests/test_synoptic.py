"""Jetstream metric tests (reference tests for _synoptic.py:24
jetstream_metric_woollings: filter weights + argmax behaviour)."""

import datetime as dt

import numpy as np
import pytest

from xclim_spark.operators import synoptic


def test_lanczos_weights_shape_and_sum():
    w = synoptic.lanczos_lowpass_weights(61, 1.0 / 10)
    assert len(w) == 61
    # low-pass: weights sum ~ 1, symmetric, peak at center
    assert np.isclose(w.sum(), 1.0, atol=0.02)
    assert np.allclose(w, w[::-1])
    assert w.argmax() == 30


def test_jetstream_constant_peak(spark):
    # stationary jet at 40N: every day (after spin-up) reports jetlat 40
    rows = []
    for ti in range(120):
        t = dt.date(2000, 1, 1) + dt.timedelta(ti)
        for la in range(20, 71, 5):
            rows.append((t, float(la), 30.0 - abs(la - 40.0)))
    df = spark.createDataFrame(rows, "time date, lat double, ua double")
    out = synoptic.jetstream_metric_woollings(df, "ua").collect()
    # 120 days - 60 edge days with incomplete filter window
    assert len(out) == 60
    assert all(r["jetlat"] == 40.0 for r in out)
    # filtered strength approximates the raw peak (30) for constant input
    assert all(abs(r["jetstr"] - 30.0) < 0.5 for r in out)


def test_jetstream_tracks_moving_peak(spark):
    # peak latitude drifts 30 -> 60 over a year; smoothed argmax follows
    rows = []
    for ti in range(365):
        t = dt.date(2000, 1, 1) + dt.timedelta(ti)
        center = 30.0 + 30.0 * ti / 365.0
        for la in range(15, 76, 5):
            rows.append((t, float(la), 25.0 - abs(la - center)))
    df = spark.createDataFrame(rows, "time date, lat double, ua double")
    out = {r["time"]: r["jetlat"]
           for r in synoptic.jetstream_metric_woollings(df, "ua").collect()}
    early = out[dt.date(2000, 3, 1)]
    late = out[dt.date(2000, 11, 1)]
    assert early < late
    assert abs(early - 35.0) <= 5.0
    assert abs(late - 55.0) <= 5.0


def test_jetstream_filters_latitude_band(spark):
    # latitudes outside [15, 75] are ignored even with huge wind
    rows = []
    for ti in range(120):
        t = dt.date(2000, 1, 1) + dt.timedelta(ti)
        rows.append((t, 10.0, 99.0))   # outside band
        rows.append((t, 40.0, 20.0))
        rows.append((t, 50.0, 10.0))
    df = spark.createDataFrame(rows, "time date, lat double, ua double")
    out = synoptic.jetstream_metric_woollings(df, "ua").collect()
    assert all(r["jetlat"] == 40.0 for r in out)


def test_eccentricity_and_time_correction(spark):
    """Spot-check the Spencer eccentricity factor and the solar-time
    correction against the reference formulas evaluated in numpy."""
    import math

    from pyspark.sql import functions as F

    from xclim_spark.functions import solar

    df = spark.createDataFrame(
        [("2001-01-03",), ("2001-07-04",), ("2000-02-29",)], "d STRING"
    ).select(F.to_date("d").alias("d"))
    rows = df.select(
        solar.eccentricity_correction_factor("d").alias("ecf"),
        solar.time_correction_for_solar_angle("d").alias("tc"),
    ).collect()

    def ref(doy, diy):
        da = (doy - 1) / diy * 2 * math.pi
        ecf = (1.0001100 + 0.034221 * math.cos(da) + 0.001280 * math.sin(da)
               + 0.000719 * math.cos(2 * da) + 0.000077 * math.sin(2 * da))
        tc_deg = (0.004297 + 0.107029 * math.cos(da) - 1.837877 * math.sin(da)
                  - 0.837378 * math.cos(2 * da) - 2.340475 * math.sin(2 * da))
        tc = (tc_deg * math.pi / 180.0 + math.pi) % (2 * math.pi) - math.pi
        return ecf, tc

    for (doy, diy), r in zip([(3, 365), (185, 365), (60, 366)], rows):
        ecf, tc = ref(doy, diy)
        assert r["ecf"] == pytest.approx(ecf, rel=1e-12)
        assert r["tc"] == pytest.approx(tc, rel=1e-12)
    # perihelion-ish: ecf near max (~1.035); aphelion: near min (~0.967)
    assert rows[0]["ecf"] > 1.03 and rows[1]["ecf"] < 0.97
