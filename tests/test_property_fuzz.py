"""Hypothesis property tests for driver-side kernels.

These fuzz invariants that randomized-example tests can miss: the scalar
and vectorized CFFWIS kernels must agree bitwise on ANY state (they
diverged once, on the Eq.27b negative-BUI corner), and the sampling
threshold must be monotone and exact at the boundaries.
"""

import math

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from xclim_spark.operators import fire


finite = dict(allow_nan=False, allow_infinity=False)


@settings(max_examples=300, deadline=None)
@given(
    t=st.floats(-45.0, 45.0, **finite),
    p=st.floats(0.0, 120.0, **finite),
    w=st.floats(0.0, 80.0, **finite),
    h=st.floats(0.0, 99.9, **finite),
    f0=st.floats(0.0, 101.0, **finite),
    dm0=st.floats(0.0, 400.0, **finite),
    dc0=st.floats(0.0, 900.0, **finite),
    mth=st.integers(1, 12),
)
def test_scalar_and_vector_cffwis_kernels_agree(t, p, w, h, f0, dm0, dc0,
                                                mth):
    lat = 47.0
    f_s = fire._ffmc(t, p, w, h, f0)
    f_v = fire._ffmc_v(*[np.array([x]) for x in (t, p, w, h, f0)])[0]
    assert f_v == pytest.approx(f_s, rel=1e-12, abs=1e-12)

    dl = fire._day_length(lat, mth)
    m_s = fire._dmc(t, p, h, mth, lat, dm0)
    m_v = fire._dmc_v(np.array([t]), np.array([p]), np.array([h]),
                      np.array([dl]), np.array([dm0]))[0]
    assert m_v == pytest.approx(m_s, rel=1e-12, abs=1e-12)

    fl = fire._day_length_factor(lat, mth)
    c_s = fire._dc(t, p, mth, lat, dc0)
    c_v = fire._dc_v(np.array([t]), np.array([p]), np.array([fl]),
                     np.array([dc0]))[0]
    assert c_v == pytest.approx(c_s, rel=1e-12, abs=1e-12)

    isi_s = fire._isi(w, f_s)
    bui_s = fire._bui(m_s, c_s)
    fwi_s = fire._fwi(isi_s, bui_s)
    isi_v = fire._isi_v(np.array([w]), np.array([f_s]))[0]
    bui_v = fire._bui_v(np.array([m_s]), np.array([c_s]))[0]
    fwi_v = fire._fwi_v(np.array([isi_s]), np.array([bui_s]))[0]
    assert isi_v == pytest.approx(isi_s, rel=1e-12)
    assert bui_v == pytest.approx(bui_s, rel=1e-12, abs=1e-12)
    assert fwi_v == pytest.approx(fwi_s, rel=1e-12, abs=1e-12)
    assert fwi_s >= 0.0 and not math.isnan(fwi_s)


@settings(max_examples=200, deadline=None)
@given(r1=st.floats(0.0, 1.0, **finite), r2=st.floats(0.0, 1.0, **finite))
def test_hex_threshold_monotone(r1, r2):
    from xclim_spark.llm.pipeline import hex_threshold

    lo, hi = sorted([r1, r2])
    assert hex_threshold(lo) <= hex_threshold(hi)
    assert hex_threshold(0.0) == "00000000"
    assert hex_threshold(1.0) > "f" * 8


@settings(max_examples=100, deadline=None)
@given(
    vals=st.lists(st.floats(-50.0, 50.0, **finite), min_size=1,
                  max_size=60),
    thresh=st.floats(-20.0, 20.0, **finite),
)
def test_overwintering_dc_vector_matches_scalar(vals, thresh):
    dcf = np.array(vals)
    wpr = np.abs(dcf) + abs(thresh)
    v = fire._overwinter_dc_v(np.maximum(dcf, 0.0), wpr, 0.75, 0.75, 15.0)

    def scalar(d, w):
        qf = 800.0 * math.exp(-d / 400.0)
        qs = 0.75 * qf + 0.75 * 3.94 * w
        return max(400.0 * math.log(800.0 / qs), 15.0)

    for i, (d, w) in enumerate(zip(np.maximum(dcf, 0.0), wpr)):
        assert v[i] == pytest.approx(scalar(d, w), rel=1e-12)
