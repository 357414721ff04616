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


# ---------------------------------------------------------------------------
# KBDI / Griffiths DF / McArthur FFDI (reference fire/_ffdi.py)
# ---------------------------------------------------------------------------

def test_kbdi_dry_spell_monotone_and_capped():
    n = 400
    k = fire.kbdi_1d([0.0] * n, [35.0] * n, pr_annual=500.0)
    assert np.all(np.diff(k) >= 0)
    assert k[-1] <= 203.2
    assert k[-1] > 150  # long hot dry spell approaches field capacity
    # heavy rain knocks it down
    pr = [0.0] * 50 + [80.0] + [0.0] * 10
    k2 = fire.kbdi_1d(pr, [35.0] * 61, pr_annual=500.0)
    assert k2[50] < k2[49]


def test_griffiths_df_bounds_and_response():
    n = 60
    pr = [0.0] * n
    smd = [100.0] * n
    df = fire.griffiths_drought_factor_1d(pr, smd)
    assert np.isnan(df[:19]).all()
    valid = df[19:]
    assert np.all((valid >= 0) & (valid <= 10))
    # no rain + high deficit -> high drought factor
    assert valid[-1] > 9.0
    # recent heavy rain suppresses it
    pr2 = [0.0] * 50 + [50.0] + [0.0] * 9
    df2 = fire.griffiths_drought_factor_1d(pr2, smd)
    assert df2[-1] < valid[-1]


def test_mcarthur_ffdi_formula():
    got = fire.mcarthur_ffdi([10.0], [35.0], [15.0], [30.0])[0]
    want = 10.0 ** 0.987 * np.exp(
        0.0338 * 35 - 0.0345 * 15 + 0.0234 * 30 + 0.243147)
    assert got == pytest.approx(want, rel=1e-12)


def test_ffdi_indices_spark(spark):
    import datetime as dt

    rng = np.random.RandomState(3)
    rows = []
    for cell in (1, 2):
        for i in range(120):
            rows.append((cell, dt.date(2000, 1, 1) + dt.timedelta(days=i),
                         float(rng.gamma(0.3, 8.0)),
                         float(25 + 10 * rng.rand()),
                         float(20 + 40 * rng.rand()),
                         float(10 + 20 * rng.rand())))
    df = spark.createDataFrame(
        rows, "cell INT, time DATE, pr DOUBLE, tasmax DOUBLE, "
              "hurs DOUBLE, ws DOUBLE")
    out = fire.ffdi_indices(df, pr="pr", tasmax="tasmax", hurs="hurs",
                            sfcWind="ws", pr_annual=600.0, cells=["cell"])
    got = out.filter("cell = 1").orderBy("time").collect()
    sub = [r for r in rows if r[0] == 1]
    k = fire.kbdi_1d([r[2] for r in sub], [r[3] for r in sub], 600.0)
    dfac = fire.griffiths_drought_factor_1d([r[2] for r in sub], k)
    ffdi = fire.mcarthur_ffdi(dfac, [r[3] for r in sub],
                              [r[4] for r in sub], [r[5] for r in sub])
    np.testing.assert_allclose(
        [r["kbdi"] for r in got], k, rtol=1e-12)
    got_f = np.array([r["ffdi"] for r in got], dtype=float)
    ok = ~np.isnan(ffdi)
    np.testing.assert_allclose(got_f[ok], ffdi[ok], rtol=1e-12)


def test_column_component_forms_match_scalar_kernels(spark):
    """ISI/BUI/FWI Column expressions must agree with the scalar kernels
    used inside the stateful iterator."""
    from xclim_spark.operators import fire

    cases = [  # (ws, ffmc, dmc, dc)
        (10.0, 85.0, 6.0, 15.0),
        (25.0, 92.0, 80.0, 300.0),
        (0.0, 60.0, 0.0, 0.0),
        (40.0, 96.0, 2.0, 400.0),
        (5.0, 75.0, 150.0, 100.0),
    ]
    df = spark.createDataFrame(cases, "ws DOUBLE, ffmc DOUBLE, dmc DOUBLE, dc DOUBLE")
    isi = fire.initial_spread_index("ws", "ffmc")
    bui = fire.build_up_index("dmc", "dc")
    rows = df.select(
        isi.alias("isi"), bui.alias("bui"),
        fire.fire_weather_index(isi, bui).alias("fwi"),
    ).collect()
    for (ws, ffmc, dmc, dc), r in zip(cases, rows):
        isi_s = fire._isi(ws, ffmc)
        bui_s = fire._bui(dmc, dc)
        assert r["isi"] == pytest.approx(isi_s, rel=1e-12)
        assert r["bui"] == pytest.approx(bui_s, rel=1e-12)
        assert r["fwi"] == pytest.approx(fire._fwi(isi_s, bui_s), rel=1e-12)


def test_overwintering_drought_code_values(spark):
    """wDC method (Cantin 2014): spot values from the closed form, plus
    the min_dc floor and null propagation."""
    import math

    from xclim_spark.operators import fire

    df = spark.createDataFrame(
        [(300.0, 100.0), (15.0, 500.0), (None, 10.0)],
        "dcf DOUBLE, wpr DOUBLE",
    )
    rows = df.select(
        fire.overwintering_drought_code("dcf", "wpr").alias("odc")
    ).collect()

    def ref(dcf, wpr, a=0.75, b=0.75, mn=15.0):
        qf = 800.0 * math.exp(-dcf / 400.0)
        return max(400.0 * math.log(800.0 / (a * qf + b * 3.94 * wpr)), mn)

    assert rows[0]["odc"] == pytest.approx(ref(300.0, 100.0), rel=1e-12)
    assert rows[1]["odc"] == 15.0  # heavy winter rain floors at min_dc
    assert rows[2]["odc"] is None  # null in, null out


def test_fire_season_mask_block_wf93_la08():
    from xclim_spark.operators import fire

    n = 20
    tas = np.full((n, 1), 20.0)
    tas[:6] = 0.0
    tas[15:] = 0.0
    m = fire.fire_season_mask_block(tas, method="WF93")[:, 0]
    # WF93 window EXCLUDES today: start at first day whose previous 3
    # days all exceeded 12degC -> day 9; end when previous 3 all below 5
    assert not m[:9].any()
    assert m[9:18].all()
    assert not m[18:].any()

    snd = np.zeros((n, 1))
    snd[:5] = 0.5  # snow on ground
    snd[16:] = 0.5
    m2 = fire.fire_season_mask_block(tas, snd=snd, method="LA08")[:, 0]
    # LA08: on once 3 days incl. today are snow-free; off on snow day
    assert not m2[:7].any()
    assert m2[7:16].all()
    assert not m2[16:].any()


def test_seasonal_cffwis_matches_segmented_1d_kernel():
    """With a season mask, each ON segment must equal the 1-D kernel run
    on that segment with start values; OFF days are NaN."""
    from xclim_spark.operators import fire

    n = 40
    rng = np.random.default_rng(5)
    tas = rng.uniform(10, 30, (n, 1))
    pr = rng.exponential(1.0, (n, 1))
    hurs = rng.uniform(30, 90, (n, 1))
    ws = rng.uniform(0, 20, (n, 1))
    months = np.full(n, 7)
    mask = np.zeros((n, 1), dtype=bool)
    mask[5:18, 0] = True
    mask[25:36, 0] = True
    out = fire.cffwis_block(tas, pr, hurs, ws, months, 45.0,
                            season_mask=mask)
    fwi = out["fwi"][:, 0]
    assert np.isnan(fwi[:5]).all() and np.isnan(fwi[18:25]).all() \
        and np.isnan(fwi[36:]).all()
    for s0, s1 in ((5, 18), (25, 36)):
        exp = fire.cffwis_1d(tas[s0:s1, 0], pr[s0:s1, 0], hurs[s0:s1, 0],
                             ws[s0:s1, 0], months[s0:s1], 45.0)
        np.testing.assert_allclose(fwi[s0:s1], exp["fwi"], rtol=1e-12)


def test_seasonal_cffwis_overwintering_dc():
    """With overwintering, the second season's DC starts from wDC of the
    stored last DC and the off-season precipitation total."""
    import math

    from xclim_spark.operators import fire

    n = 30
    tas = np.full((n, 1), 20.0)
    pr = np.full((n, 1), 0.4)
    pr[12:20] = 3.0  # off-season rain accumulates into winter_pr
    hurs = np.full((n, 1), 50.0)
    ws = np.full((n, 1), 10.0)
    months = np.full(n, 7)
    mask = np.zeros((n, 1), dtype=bool)
    mask[2:12, 0] = True
    mask[20:, 0] = True
    out = fire.cffwis_block(tas, pr, hurs, ws, months, 45.0,
                            season_mask=mask, overwintering=True)
    dc = out["dc"][:, 0]
    last_dc = dc[11]
    winter_pr = pr[12:20, 0].sum()  # shut-down day (12) through winter
    qf = 800.0 * math.exp(-last_dc / 400.0)
    qs = 0.75 * qf + 0.75 * 3.94 * winter_pr
    wdc = max(400.0 * math.log(800.0 / qs), 15.0)
    # day 20 output = one DC step applied to the overwintered start
    from xclim_spark.operators.fire import _dc
    assert out["dc"][20, 0] == pytest.approx(_dc(20.0, 0.4, 7, 45.0, wdc),
                                             rel=1e-12)
    # and it differs from the plain restart (dc0=15)
    assert abs(wdc - 15.0) > 1.0


def test_user_mask_gap_carries_no_spurious_transition(spark):
    """A (day, cell) gap inside the fire season with season_method='mask'
    must carry state across the gap (like the computed-mask branch), not
    read the absent slots as mask=False and reset FFMC/DMC/DC."""
    import datetime as dt

    rng = np.random.RandomState(7)
    n = 60
    base = []
    for i in range(n):
        base.append((dt.date(2000, 6, 1) + dt.timedelta(days=i),
                     float(15 + 10 * rng.rand()),
                     float(rng.gamma(0.4, 3.0)),
                     float(35 + 50 * rng.rand()),
                     float(3 + 15 * rng.rand())))
    rows = []
    for cell in (1, 2):
        for i, (d, t, p, h, w) in enumerate(base):
            if cell == 2 and 25 <= i < 35:
                continue  # the gap: rows absent entirely
            m = 1.0 if 10 <= i <= 50 else 0.0
            rows.append((cell, d, t, p, h, w, m))
    df = spark.createDataFrame(
        rows, "cell INT, time DATE, tas DOUBLE, pr DOUBLE, hurs DOUBLE, "
              "ws DOUBLE, m DOUBLE")
    out = fire.cffwis_indices(
        df, tas="tas", pr="pr", hurs="hurs", sfcWind="ws", lat=47.0,
        cells=["cell"], season_method="mask", season_mask="m")
    got = out.filter("cell = 2").orderBy("time").collect()
    # expected: 1-D kernel over cell 2's own compacted series + mask
    keep = [i for i in range(n) if not (25 <= i < 35)]
    mask = np.array([[10 <= i <= 50] for i in keep])
    r = fire.cffwis_block(
        np.array([[base[i][1]] for i in keep]),
        np.array([[base[i][2]] for i in keep]),
        np.array([[base[i][3]] for i in keep]),
        np.array([[base[i][4]] for i in keep]),
        np.array([base[i][0].month for i in keep]), 47.0,
        season_mask=mask)
    def _f(v):
        return float("nan") if v is None else v

    np.testing.assert_allclose([_f(row["fwi"]) for row in got],
                               r["fwi"][:, 0], rtol=1e-12)
    np.testing.assert_allclose([_f(row["dc"]) for row in got],
                               r["dc"][:, 0], rtol=1e-12)


def test_chunked_streaming_invariant_to_chunk_size(spark, monkeypatch):
    """The mapInPandas complete-cell chunker must give identical results
    whether a chunk holds many cells, one cell, or a cell spans several
    accumulation rounds (chunk target smaller than one cell's series)."""
    import datetime as dt

    rng = np.random.RandomState(23)
    n = 90
    data = []
    for cell in range(7):
        for i in range(n):
            data.append((
                cell, dt.date(2001, 3, 1) + dt.timedelta(days=i),
                float(8 + 18 * rng.rand()), float(rng.gamma(0.4, 5.0)),
                float(25 + 70 * rng.rand()), float(3 + 25 * rng.rand()),
            ))
    df = spark.createDataFrame(
        data, "cell INT, time DATE, tas DOUBLE, pr DOUBLE, hurs DOUBLE, "
              "ws DOUBLE")

    def run():
        out = fire.cffwis_indices(df, tas="tas", pr="pr", hurs="hurs",
                                  sfcWind="ws", lat=47.0, cells=["cell"])
        return sorted(
            ((r["cell"], r["time"], r["fwi"], r["dc"], r["ffmc"])
             for r in out.collect()))

    monkeypatch.delenv("XCLIM_SPARK_FIRE_CHUNK_ROWS", raising=False)
    base = run()
    assert len(base) == 7 * n
    # chunk smaller than one cell's series: exercises the in-flight-cell
    # accumulation path AND the held-tail path
    monkeypatch.setenv("XCLIM_SPARK_FIRE_CHUNK_ROWS", "40")
    small = run()
    monkeypatch.setenv("XCLIM_SPARK_FIRE_CHUNK_ROWS", "1")
    tiny = run()
    assert small == base
    assert tiny == base
