"""Converter tests mirroring the reference's expected values
(reference tests/test_converters.py)."""

import datetime as dt
import numpy as np
import pytest
from pyspark.sql import functions as F

from xclim_spark.functions import converters as cv

K2C = 273.15


def _eval(spark, cols: dict, expr) -> list:
    """Evaluate a Column expression over literal rows."""
    n = len(next(iter(cols.values())))
    rows = [tuple(cols[k][i] for k in cols) for i in range(n)]
    schema = ", ".join(f"{k} DOUBLE" for k in cols)
    df = spark.createDataFrame(rows, schema=schema)
    return [r["out"] for r in df.select(expr.alias("out")).collect()]


def test_humidex_wikipedia_values(spark):
    # expected values from the humidex definition (ref
    # tests/test_converters.py:86-96): tas degC + dewpoint K -> [16,29,47,52]
    out = _eval(
        spark,
        {"tas": [15.0, 25.0, 35.0, 40.0],
         "tdps": [10 + K2C, 15 + K2C, 25 + K2C, 25 + K2C]},
        cv.humidex("tas", tdps_k="tdps"),
    )
    np.testing.assert_array_almost_equal(out, [16, 29, 47, 52], 0)


def test_humidex_from_hurs(spark):
    # both vapour-pressure paths must agree near saturation reference
    out_td = _eval(spark, {"t": [30.0], "td": [25.0 + K2C]},
                   cv.humidex("t", tdps_k="td"))
    # hurs equivalent of Td=25degC at T=30degC is ~74.7%
    out_h = _eval(spark, {"t": [30.0], "h": [74.7]},
                  cv.humidex("t", hurs_pct="h"))
    assert out_td[0] == pytest.approx(out_h[0], abs=0.5)


def test_heat_index_regression(spark):
    # Rothfusz regression: T=30degC, RH=70% -> ~35degC (NWS chart 95F/70%)
    out = _eval(spark, {"t": [30.0, 15.0], "h": [70.0, 70.0]},
                cv.heat_index("t", "h"))
    assert out[0] == pytest.approx(35.0, abs=1.0)
    assert out[1] is None  # masked below 20 degC


def test_saturation_vapor_pressure_sonntag90(spark):
    # ref tests/test_converters.py:140-150
    tas = [t + K2C for t in (-20, -10, -1, 10, 20, 25, 30, 40, 60)]
    exp = [103, 260, 563, 1228, 2339, 3169, 4247, 7385, 19947]
    out = _eval(spark, {"t": tas},
                cv.saturation_vapor_pressure("t", "sonntag90",
                                             ice_thresh_k=K2C))
    np.testing.assert_allclose(out, exp, atol=0.5, rtol=0.005)


def test_relative_humidity(spark):
    # ref tests/test_converters.py:152-167
    tas = [t + K2C for t in (-10, 10, 20, 35, 50, 75, 95)]
    huss = [0.001, 0.005, 0.005, 0.005, 0.005, 0.005, 0.005]
    ps = [101325.0] * 7
    exp = [62.5, 66.0, 35.0, 14.5, 6.5, 2.0, 1.0]
    out = _eval(
        spark, {"t": tas, "q": huss, "p": ps},
        cv.relative_humidity("t", "q", "p", method="sonntag90",
                             ice_thresh_k=K2C),
    )
    np.testing.assert_allclose(out, exp, atol=0.5, rtol=0.005)


def test_relative_humidity_ice_switch(spark):
    # with ice_thresh, sub-zero esat uses the over-ice fit; check via the
    # full expression (ratio of vapor_pressure to esat-with-ice)
    tas = [-10.0 + K2C]
    huss = [0.001]
    ps = [101325.0]
    e = cv.vapor_pressure("q", "p")
    esat = cv.saturation_vapor_pressure("t", "sonntag90", ice_thresh_k=K2C)
    out = _eval(spark, {"t": tas, "q": huss, "p": ps}, 100.0 * e / esat)
    assert out[0] == pytest.approx(62.5, abs=0.5)


def test_specific_humidity(spark):
    # ref tests/test_converters.py:169-184 (skipping the >100% RH case)
    tas = [t + K2C for t in (-10, 10, 20, 35, 50, 75, 95)]
    hurs = [10.0, 90.0, 20.0, 80.0, 50.0, 70.0, 40.0]
    ps = [100000.0, 100000.0, 100000.0, 101000.0, 101000.0, 101000.0,
          101000.0]
    exp = [1.6e-4, 6.9e-3, 3.0e-3, 2.9e-2, 4.1e-2, 2.1e-1, 5.7e-1]
    esat = cv.saturation_vapor_pressure("t", "sonntag90", ice_thresh_k=K2C)
    wsat = 0.622 * esat / (F.col("p") - esat)
    w = wsat * F.col("h") / 100.0
    out = _eval(spark, {"t": tas, "h": hurs, "p": ps}, w / (1.0 + w))
    np.testing.assert_allclose(out, exp, atol=1e-4, rtol=0.05)


def test_dewpoint_roundtrip(spark):
    # dewpoint_from_specific_humidity inverts the Magnus esat: check
    # e_sat(Td) == vapor_pressure(q, p)
    huss = [0.0035031, 0.00722795, 0.01319614]
    ps = [100000.0, 105000.0, 110000.0]
    td = cv.dewpoint_from_specific_humidity("q", "p", method="buck81")
    out = _eval(spark, {"q": huss, "p": ps}, td)
    # MetPy values computed with sonntag90; buck81 agrees within 0.3 K
    np.testing.assert_allclose(out, [272, 283, 293], atol=0.5)


def test_snowfall_approximation_methods(spark):
    pr = [10.0] * 5
    tas = [K2C - 1, K2C, K2C + 1.0, K2C + 2.0, K2C + 5.0]
    # binary: solid at/below freezing
    out = _eval(spark, {"p": pr, "t": tas},
                cv.snowfall_approximation("p", "t", K2C, "binary"))
    assert out == [10.0, 10.0, 0.0, 0.0, 0.0]
    # brown: linear 1 -> 0 over [thresh, thresh+2]
    out = _eval(spark, {"p": pr, "t": tas},
                cv.snowfall_approximation("p", "t", K2C, "brown"))
    np.testing.assert_allclose(out, [10.0, 10.0, 5.0, 0.0, 0.0])
    # auer: polynomial fraction, 1 below 0 excess, 0 at >= 6
    out = _eval(spark, {"p": pr, "t": tas},
                cv.snowfall_approximation("p", "t", K2C, "auer"))
    assert out[0] == 10.0 and out[1] == 10.0 and out[4] == pytest.approx(
        10.0 * max(0.0, (100 + 4.6664 * 5 - 15.038 * 25 - 1.5089 * 125
                         + 2.0399 * 625 - 0.366 * 3125 + 0.0202 * 15625))
        / 100.0, rel=1e-9)
    # rain + snow == pr
    rain = _eval(spark, {"p": pr, "t": tas},
                 cv.rain_approximation("p", "t", K2C, "brown"))
    snow = _eval(spark, {"p": pr, "t": tas},
                 cv.snowfall_approximation("p", "t", K2C, "brown"))
    np.testing.assert_allclose(np.array(rain) + np.array(snow), pr)


def test_wind_chill_index(spark):
    # ECCC chart: T=-20degC, V=30km/h -> W ~ -33; slow-wind branch at 2km/h
    out = _eval(spark, {"t": [-20.0, -20.0], "v": [30.0, 2.0]},
                cv.wind_chill_index("t", "v", method="CAN"))
    assert out[0] == pytest.approx(-33.0, abs=1.0)
    slow = -20.0 + (-1.59 + 0.1345 * -20.0) / 5.0 * 2.0
    assert out[1] == pytest.approx(slow, rel=1e-9)
    # masked above 0 degC
    out = _eval(spark, {"t": [5.0], "v": [30.0]},
                cv.wind_chill_index("t", "v", method="CAN"))
    assert out[0] is None


def test_uas_vas_roundtrip(spark):
    uas = [3.0, -3.0, 0.0, 0.0, 0.1]
    vas = [0.0, 0.0, 4.0, -4.0, 0.1]
    w, d = cv.uas_vas_to_sfcwind("u", "v")
    speed = _eval(spark, {"u": uas, "v": vas}, w)
    np.testing.assert_allclose(speed, [3, 3, 4, 4, np.hypot(.1, .1)])
    direction = _eval(spark, {"u": uas, "v": vas}, d)
    # wind FROM: easterly u>0 -> 270; westerly -> 90; southerly v>0 -> 180;
    # northerly -> 360; calm -> 0
    np.testing.assert_allclose(direction, [270, 90, 180, 360, 0])
    # roundtrip
    u2, v2 = cv.sfcwind_to_uas_vas("w", "d")
    back_u = _eval(spark, {"w": speed[:4], "d": direction[:4]}, u2)
    back_v = _eval(spark, {"w": speed[:4], "d": direction[:4]}, v2)
    np.testing.assert_allclose(back_u, uas[:4], atol=1e-9)
    np.testing.assert_allclose(back_v, vas[:4], atol=1e-9)


def test_snow_and_simple_converters(spark):
    assert _eval(spark, {"x": [1.0]}, cv.snd_to_snw("x")) == [312.0]
    assert _eval(spark, {"x": [312.0]}, cv.snw_to_snd("x")) == [1.0]
    assert _eval(spark, {"x": [1.0]}, cv.prsnd_to_prsn("x")) == [100.0]
    assert _eval(spark, {"a": [5.0], "b": [2.0]},
                 cv.water_budget("a", "b")) == [3.0]
    assert _eval(spark, {"a": [10.0], "b": [4.0]},
                 cv.tas_from_tasmin_tasmax("b", "a")) == [7.0]
    assert _eval(
        spark, {"rls": [50.0], "rlds": [300.0]},
        cv.longwave_upwelling_radiation_from_net_downwelling("rls", "rlds"),
    ) == [250.0]
    # wind profile power law: double height with alpha=1/7
    out = _eval(spark, {"v": [7.0]}, cv.wind_profile("v", 20.0, 10.0))
    assert out[0] == pytest.approx(7.0 * 2 ** (1 / 7))
    # power potential: cubic ramp between cut-in and rated
    out = _eval(spark, {"v": [2.0, 13.5, 30.0, 8.0]},
                cv.wind_power_potential("v"))
    assert out[0] == 0.0 and out[1] == 1.0 and out[2] == 0.0
    assert out[3] == pytest.approx((8**3 - 3.5**3) / (13**3 - 3.5**3))


def test_solar_declination_and_day_lengths(spark):
    from xclim_spark.functions import solar

    # solstices: declination ~ +-23.44 deg; equator day length ~ 12 h
    import datetime as dt

    rows = [(0, dt.date(2001, 6, 21), 0.0), (1, dt.date(2001, 12, 21), 0.0),
            (2, dt.date(2001, 6, 21), 45.0), (3, dt.date(2001, 12, 21), 45.0),
            (4, dt.date(2001, 6, 21), 80.0)]
    df = spark.createDataFrame(rows, "id INT, time DATE, lat DOUBLE")
    out = {r["id"]: r for r in df.select(
        "id",
        solar.solar_declination("time").alias("decl"),
        solar.day_lengths("time", F.col("lat")).alias("dl"),
        solar.day_lengths("time", F.col("lat"),
                          infill_polar_days=True).alias("dlf"),
    ).collect()}
    assert out[0]["decl"] == pytest.approx(23.44 * np.pi / 180, abs=0.02)
    assert out[1]["decl"] == pytest.approx(-23.44 * np.pi / 180, abs=0.02)
    assert out[0]["dl"] == pytest.approx(12.0, abs=0.2)   # equator
    assert out[2]["dl"] > 14.5                            # 45N summer
    assert out[3]["dl"] < 9.5                             # 45N winter
    assert out[4]["dl"] is None                           # polar day -> NULL
    assert out[4]["dlf"] == 24.0                          # infilled


def test_extraterrestrial_radiation_fao56_example(spark):
    # FAO-56 example 8: 20 deg S, 3 September -> Ra ~ 32.2 MJ m-2 day-1
    from xclim_spark.functions import solar
    import datetime as dt

    df = spark.createDataFrame([(dt.date(2001, 9, 3), -20.0)],
                               "time DATE, lat DOUBLE")
    out = df.select(
        solar.extraterrestrial_solar_radiation("time", F.col("lat"))
        .alias("ra")).collect()
    assert out[0]["ra"] == pytest.approx(32.2, abs=0.8)


def test_pet_hargreaves(spark):
    import datetime as dt

    df = spark.createDataFrame(
        [(dt.date(2001, 7, 15), 45.0, 15.0, 30.0)],
        "time DATE, lat DOUBLE, tmin DOUBLE, tmax DOUBLE")
    out = df.select(
        cv.potential_evapotranspiration(
            "time", F.col("lat"), tasmin_c="tmin", tasmax_c="tmax")
        .alias("pet"),
        cv.potential_evapotranspiration(
            "time", F.col("lat"), tasmin_c="tmin", tasmax_c="tmax",
            method="baierrobertson65").alias("petbr"),
    ).collect()[0]
    # mid-summer mid-latitude: a few mm/day, HG and BR roughly agree
    assert 3.0 < out["pet"] < 9.0
    assert 3.0 < out["petbr"] < 12.0


def test_make_hourly_temperature(spark):
    import datetime as dt
    from xclim_spark.functions import solar

    rows = [(0, dt.date(2001, 6, 20), 10.0, 30.0, 45.0),
            (0, dt.date(2001, 6, 21), 12.0, 28.0, 45.0)]
    df = spark.createDataFrame(
        rows, "cell INT, time DATE, tn DOUBLE, tx DOUBLE, lat DOUBLE")
    out = solar.make_hourly_temperature(df, "tn", "tx", F.col("lat"),
                                        cells=["cell"])
    rows_h = out.filter(F.to_date("time") == dt.date(2001, 6, 20)) \
        .orderBy("time_h").collect()
    assert len(rows_h) == 24
    temps = [r["tas"] for r in rows_h]
    # sunrise (hour 0) == tasmin; max reached during the day ~ tasmax
    assert temps[0] == pytest.approx(10.0)
    assert max(temps) == pytest.approx(30.0, abs=0.5)
    # night hours cool monotonically toward the next day's minimum
    dl = rows_h[0]["tas"]  # placeholder to keep lints quiet
    night = [r["tas"] for r in rows_h if r["time_h"].hour >= 16]
    assert all(a >= b - 1e-9 for a, b in zip(night, night[1:]))
    assert night[-1] >= 12.0 - 2.0  # approaching next tasmin


def test_degree_days_exceedance_date(spark):
    from xclim_spark.operators.generic import degree_days_exceedance_date
    from xclim_spark.testing import timeseries

    # 10 degree-days/day above thresh from day 1: crosses 95 on day 10
    vals = [20.0] * 40
    df = timeseries(spark, vals, start="2001-01-01")
    out = degree_days_exceedance_date(df, "value", ">", 10.0, 95.0,
                                      cells=["cell"]).collect()[0]
    assert out["dded"] == 10
    # after_date shifts the accumulation start
    out2 = degree_days_exceedance_date(df, "value", ">", 10.0, 95.0,
                                       after_date="01-05",
                                       cells=["cell"]).collect()[0]
    assert out2["dded"] == 14


def test_utci_published_value(spark):
    # Brode 2012 operational procedure: Ta=25 degC, Tmrt=25 degC,
    # va=1 m/s, RH=50% -> UTCI = 24.6 degC (utci.org reference table,
    # also the pythermalcomfort documentation example).
    df = spark.createDataFrame(
        [(25.0, 50.0, 1.0, 25.0 + K2C),
         (25.0, 50.0, 0.4, 25.0 + K2C),   # below wind validity -> NULL
         (55.0, 50.0, 1.0, 55.0 + K2C)],  # above temp validity -> NULL
        "tas double, hurs double, wind double, mrt double")
    out = cv.universal_thermal_climate_index(
        df, "tas", "hurs", "wind", "mrt").select("utci").collect()
    assert out[0]["utci"] == pytest.approx(24.6, abs=0.05)
    assert out[1]["utci"] is None
    assert out[2]["utci"] is None
    # wind_cap_min clamps to the 0.5 m/s validity floor instead of NULL
    capped = cv.universal_thermal_climate_index(
        df, "tas", "hurs", "wind", "mrt", wind_cap_min=True
    ).select("utci").collect()
    assert capped[1]["utci"] is not None


def test_utci_matches_numpy_twin(spark):
    # independent numpy evaluation of the published coefficient table --
    # catches staging/power-binding bugs in the Spark expression build
    rng = np.random.default_rng(7)
    n = 50
    tas = rng.uniform(-40, 45, n)
    hurs = rng.uniform(5, 100, n)
    wind = rng.uniform(0.6, 16.5, n)
    mrt = tas + rng.uniform(-25, 25, n) + K2C

    t_k = tas + K2C
    e_sat = np.exp(-2836.5744 / t_k**2 - 6028.076559 / t_k + 19.54263612
                   - 2.737830188e-2 * t_k + 1.6261698e-5 * t_k**2
                   + 7.0229056e-10 * t_k**3 - 1.8680009e-13 * t_k**4
                   + 2.7150305 * np.log(t_k))
    pa = e_sat / 1000.0 * hurs / 100.0
    d = mrt - K2C - tas
    exp = np.zeros(n)
    for i, j, k, p, coef in cv.UTCI_POLYNOMIAL_COEFFICIENTS:
        exp += coef * tas**i * wind**j * d**k * pa**p
    valid = (np.abs(d) < 30)
    df = spark.createDataFrame(
        [(float(a), float(b), float(c), float(m))
         for a, b, c, m in zip(tas, hurs, wind, mrt)],
        "tas double, hurs double, wind double, mrt double")
    got = [r["utci"] for r in cv.universal_thermal_climate_index(
        df, "tas", "hurs", "wind", "mrt").select("utci").collect()]
    for g, e, v in zip(got, exp, valid):
        if v:
            assert g == pytest.approx(e, rel=1e-9)
        else:
            assert g is None


def test_mean_radiant_temperature_numpy_twin(spark):
    import datetime as dt
    import math as m

    # numpy twin of the Di Napoli 2020 formula at a fixed date/latitude
    day = dt.date(2000, 6, 1)
    lat = 45.0
    rsds, rsus, rlds, rlus = 300.0, 60.0, 350.0, 400.0

    # sunlit-average csza (closed daily form)
    diy = 366.0
    da = (152 - 1) / diy * 2 * m.pi  # doy 153? June 1 of leap 2000 = doy 153
    da = (153 - 1) / diy * 2 * m.pi
    decl = (0.006918 - 0.399912 * m.cos(da) + 0.070257 * m.sin(da)
            - 0.006758 * m.cos(2 * da) + 0.000907 * m.sin(2 * da)
            - 0.002697 * m.cos(3 * da) + 0.001480 * m.sin(3 * da))
    latr = m.radians(lat)
    ws = m.acos(max(-1.0, min(1.0, -m.tan(latr) * m.tan(decl))))
    csza = (m.sin(decl) * m.sin(latr)
            + m.cos(decl) * m.cos(latr) * m.sin(ws) / ws)
    # distance from sun at 2000-06-01 (J2000 + 152.5 days... noon-anchored
    # at 00:00 UTC): g = 357.528 + 0.9856003 * days
    epoch = dt.datetime(2000, 1, 1, 12)
    days = (dt.datetime(2000, 6, 1) - epoch).total_seconds() / 86400.0
    g = m.radians((357.528 + 0.9856003 * days) % 360)
    dsun = 1.00014 - 0.01671 * m.cos(g) - 0.00014 * m.cos(2 * g)
    s_star = min(rsds / (1367.0 * csza * dsun**-2), 0.85)
    fdir = min(m.exp(3 - 1.34 * s_star - 1.65 / s_star), 0.9)
    direct = fdir * rsds
    diffuse = rsds - direct
    gamma = m.asin(csza)
    fp = 0.308 * m.cos(gamma * 0.988 - gamma**2 / 50000)
    i_star = direct / csza
    expected = ((1 / 5.67e-8) * (0.5 * rlds + 0.5 * rlus + 0.7 / 0.97
                * (0.5 * diffuse + 0.5 * rsus + fp * i_star))) ** 0.25

    df = spark.createDataFrame(
        [(day, lat, rsds, rsus, rlds, rlus)],
        "day date, lat double, rsds double, rsus double, "
        "rlds double, rlus double")
    got = df.select(cv.mean_radiant_temperature(
        "day", "lat", "rsds", "rsus", "rlds", "rlus").alias("out")) \
        .collect()[0]["out"]
    assert got == pytest.approx(expected, rel=1e-6)


def test_pet_fao_allen98_worked_example(spark):
    import datetime as dt

    # FAO-56 example 18 conditions (Uccle, 6 July): tmax 21.5, tmin 12.3,
    # u10 such that u2=2.78 m/s, Rn ~ 13.28 MJ m-2 d-1, RH ~ 70.6%
    # -> ETo ~ 3.9 mm/day (tolerance covers the reference's mean-es
    # delta variant vs FAO's tmean-esat delta).
    u10 = 2.78 / (np.log(67.8 * 2 - 5.42) / np.log(67.8 * 10 - 5.42))
    rn_wm2 = 13.28 / 0.0864
    df = spark.createDataFrame(
        [(dt.date(2000, 7, 6), 50.8, 12.3, 21.5, 70.6, float(u10),
          float(rn_wm2), 0.0, 0.0, 0.0)],
        "day date, lat double, tasmin double, tasmax double, hurs double,"
        " wind double, rsds double, rsus double, rlds double, rlus double")
    got = df.select(cv.potential_evapotranspiration(
        "day", "lat", tasmin_c="tasmin", tasmax_c="tasmax",
        hurs_pct="hurs", sfcwind_10m_ms="wind", rsds_wm2="rsds",
        rsus_wm2="rsus", rlds_wm2="rlds", rlus_wm2="rlus",
        method="allen98").alias("out")).collect()[0]["out"]
    assert got == pytest.approx(3.9, rel=0.08)


def test_pet_mcguinness_bordne(spark):
    import datetime as dt

    # MB05 numpy twin: Ra(1367 W/m2) / latent_heat * (a*tas + b)
    day, lat, tasmin, tasmax = dt.date(2000, 6, 1), 45.0, 10.0, 25.0
    df = spark.createDataFrame(
        [(day, lat, tasmin, tasmax)],
        "day date, lat double, tasmin double, tasmax double")
    from xclim_spark.functions.solar import extraterrestrial_solar_radiation
    ra = df.select(extraterrestrial_solar_radiation(
        "day", "lat", solar_constant_wm2=1367.0).alias("ra")) \
        .collect()[0]["ra"]
    tas = (tasmin + tasmax) / 2
    latent = 4185.5 * (751.78 - 0.5655 * (tas + K2C))
    expected = ra * 1e6 / latent * (0.00516409319477 * tas
                                    + 0.0874972822289)
    got = df.select(cv.potential_evapotranspiration(
        "day", "lat", tasmin_c="tasmin", tasmax_c="tasmax",
        method="mcguinnessbordne05").alias("out")).collect()[0]["out"]
    assert got == pytest.approx(expected, rel=1e-9)
    assert 1.0 < got < 8.0  # plausible summer mid-latitude PET


def test_cosine_solar_zenith_and_distance(spark):
    import datetime as dt

    from xclim_spark.functions import solar

    df = spark.createDataFrame(
        [(dt.date(2000, 3, 20), 0.0),    # equinox, equator
         (dt.date(2000, 6, 21), 80.0),   # polar day
         (dt.date(2000, 12, 21), 80.0)],  # polar night
        "day date, lat double")
    rows = df.select(
        solar.cosine_of_solar_zenith_angle("day", F.col("lat")).alias("c"),
        solar.distance_from_sun("day").alias("d"),
    ).collect()
    # equinox at the equator: decl ~ 0, ws = pi/2 -> avg = sin(ws)/ws = 2/pi
    assert rows[0]["c"] == pytest.approx(2 / np.pi, abs=0.02)
    # polar day: avg = sin(decl) sin(lat) > 0; polar night: exactly 0
    assert rows[1]["c"] > 0.3
    assert rows[2]["c"] == 0.0
    # earth-sun distance: ~1.014 AU in June, ~0.984 AU in December
    assert rows[1]["d"] == pytest.approx(1.014, abs=0.003)
    assert rows[2]["d"] == pytest.approx(0.984, abs=0.003)


def test_cc_scaled_precipitation(spark):
    df = spark.createDataFrame([(10.0, 2.0)], "pr double, dt double")
    got = df.select(cv.clausius_clapeyron_scaled_precipitation(
        "dt", "pr").alias("out")).collect()[0]["out"]
    assert got == pytest.approx(10.0 * 1.07**2)


def test_specific_humidity_from_dewpoint(spark):
    # dewpoint 17 degC at standard pressure -> q ~ 0.0120 kg/kg
    df = spark.createDataFrame([(290.15, 101325.0)],
                               "tdps double, ps double")
    got = df.select(cv.specific_humidity_from_dewpoint(
        "tdps", "ps").alias("q")).collect()[0]["q"]
    assert got == pytest.approx(0.0120, abs=3e-4)


def test_fao_allen98_direct():
    # FAO-56 example 17 values -> ETo ~ 3.88 mm/day
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    df = spark.createDataFrame(
        [(13.28, 290.05, 2.078, 1.997, 1.409, 0.122, 0.0666)],
        "rn double, tk double, u2 double, es double, ea double,"
        " dsvp double, gamma double")
    got = df.select(cv.fao_allen98(
        "rn", "tk", "u2", "es", "ea", "dsvp", "gamma").alias("et")
    ).collect()[0]["et"]
    assert got == pytest.approx(3.88, abs=0.05)


def test_clearness_index_roundtrip(spark):
    import datetime as dt

    df = spark.createDataFrame(
        [(dt.date(2000, 7, 6), 45.0, 20.0), (dt.date(2000, 7, 6), 45.0, 0.0)],
        "day date, lat double, rsds double")
    out = df.withColumn(
        "ci", cv.clearness_index("day", "lat", "rsds")
    ).withColumn(
        "back",
        cv.shortwave_downwelling_radiation_from_clearness_index(
            "day", "lat", F.col("ci")),
    ).collect()
    assert 0.0 < out[0]["ci"] < 1.0
    assert out[0]["back"] == pytest.approx(20.0, rel=1e-9)
    assert out[1]["ci"] == 0.0


def test_tas_alias(spark):
    df = spark.createDataFrame([(10.0, 20.0)], "tn double, tx double")
    got = df.select(cv.tas("tn", "tx").alias("t")).collect()[0]["t"]
    assert got == 15.0


def test_huglin_latitude_coefficients(spark):
    from xclim_spark.functions import solar

    df = spark.createDataFrame(
        [(39.0,), (41.0,), (45.0,), (49.0,), (55.0,)], "lat double")
    rows = df.select(
        "lat",
        solar.huglin_day_length_latitude_coefficient("lat", "huglin")
        .alias("step"),
        solar.huglin_day_length_latitude_coefficient("lat", "interpolated")
        .alias("smooth"),
    ).collect()
    by = {r["lat"]: r for r in rows}
    assert by[39.0]["step"] == 1.0 and by[39.0]["smooth"] == 1.0
    assert by[41.0]["step"] == 1.02
    assert by[41.0]["smooth"] == pytest.approx(1.006)
    assert by[45.0]["step"] == 1.04
    assert by[45.0]["smooth"] == pytest.approx(1.03)
    assert by[49.0]["step"] == 1.06
    assert by[49.0]["smooth"] == pytest.approx(1.054)
    import math
    assert math.isnan(by[55.0]["step"]) and math.isnan(by[55.0]["smooth"])


def test_gladstones_coefficient_neutral_is_one(spark):
    from xclim_spark.functions import solar

    df = spark.createDataFrame(
        [(dt.date(2001, 6, 1), 40.0), (dt.date(2001, 6, 1), -40.0),
         (dt.date(2001, 6, 1), 50.0), (dt.date(2001, 6, 1), 10.0)],
        "time date, lat double")
    rows = df.select(
        "lat",
        solar.gladstones_day_length_latitude_coefficient("time", "lat")
        .alias("k"),
        solar.gladstones_day_length_latitude_coefficient(
            "time", "lat", constrain=25.0).alias("kc"),
    ).collect()
    by = {r["lat"]: r for r in rows}
    # at the neutral latitude the ratio is exactly 1 in each hemisphere
    assert by[40.0]["k"] == pytest.approx(1.0)
    assert by[-40.0]["k"] == pytest.approx(1.0)
    # June day at 50N is longer than at 40N
    assert by[50.0]["k"] > 1.0
    # inside the constrain band the coefficient pins to 1
    assert by[10.0]["kc"] == 1.0 and by[10.0]["k"] < 1.0


def test_jones_coefficient_formula_and_gladstones_transform(spark):
    import pandas as pd

    from xclim_spark.functions import solar

    days = pd.date_range("2001-01-01", "2001-12-31", freq="D")
    pdf = pd.DataFrame({"cell": 1, "time": days})
    df = spark.createDataFrame(pdf).withColumn("lat", F.lit(45.0))
    kj = solar.jones_day_length_latitude_coefficient(
        df, F.col("lat"), method="jones", cells=["cell"]).collect()
    kg = solar.jones_day_length_latitude_coefficient(
        df, F.col("lat"), method="gladstones", cells=["cell"]).collect()
    # re-derive: sum of spencer day lengths over [04-01, 11-01)
    import numpy as np
    doy = np.array([d.dayofyear for d in days
                    if "04-01" <= d.strftime("%m-%d") < "11-01"])
    da = (doy - 1) / 365.0 * 2 * np.pi
    decl = (0.006918 - 0.399912 * np.cos(da) + 0.070257 * np.sin(da)
            - 0.006758 * np.cos(2 * da) + 0.000907 * np.sin(2 * da)
            - 0.002697 * np.cos(3 * da) + 0.001480 * np.sin(3 * da))
    dl = 24 / np.pi * np.arccos(-np.tan(np.radians(45.0)) * np.tan(decl))
    k_expected = 2.8311e-4 * dl.sum() + 0.30834
    assert kj[0]["k"] == pytest.approx(k_expected, rel=1e-12)
    assert kg[0]["k"] == pytest.approx(1.1135 * k_expected - 0.1352,
                                       rel=1e-12)


def test_jones_gladstones_guard_on_raw_coefficient(spark):
    """The all-below-1 guard runs on the RAW jones coefficient before
    the gladstones transform (reference helpers.py:786-799).  At 15S,
    raw k ~ 1.0092 (guard passes) but the transformed value ~ 0.9886;
    guarding on the transformed value would wrongly null the season."""
    import pandas as pd

    from xclim_spark.functions import solar

    days = pd.date_range("2001-01-01", "2001-12-31", freq="D")
    pdf = pd.DataFrame({"cell": 1, "time": days})
    df = spark.createDataFrame(pdf).withColumn("lat", F.lit(-15.0))
    kg = solar.jones_day_length_latitude_coefficient(
        df, F.col("lat"), method="gladstones", cells=["cell"]).collect()
    assert kg[0]["k"] is not None
    assert 0.98 < kg[0]["k"] < 1.0
    # floor comes AFTER both guard and transform: the sub-1 transformed
    # value floors to 1.0 (reference helpers.py:803-804).
    kf = solar.jones_day_length_latitude_coefficient(
        df, F.col("lat"), method="gladstones", floor=True,
        cells=["cell"]).collect()
    assert kf[0]["k"] == 1.0
    # ...and a guard-nulled season also floors to 1.0 (xarray's
    # where(k >= 1, 1.0) maps NaN to the fill value).
    pdf2 = pd.DataFrame({"cell": 1, "time": days})
    df2 = spark.createDataFrame(pdf2).withColumn("lat", F.lit(-60.0))
    kn = solar.jones_day_length_latitude_coefficient(
        df2, F.col("lat"), method="jones", cells=["cell"]).collect()
    assert kn[0]["k"] is None  # winter-heavy season: raw k < 1
    kn_f = solar.jones_day_length_latitude_coefficient(
        df2, F.col("lat"), method="jones", floor=True,
        cells=["cell"]).collect()
    assert kn_f[0]["k"] == 1.0
