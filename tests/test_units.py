"""Unit algebra tests (mirrors reference tests/test_units.py)."""

import pytest

from xclim_spark.units import (
    DimensionalityError,
    check_units,
    convert_units_to,
    declare_units,
    str2pint,
    to_agg_units,
    units_convert_factor,
)


def test_str2pint():
    q = str2pint("25 degC")
    assert q.magnitude == 25.0
    assert q.si == pytest.approx(298.15)
    q = str2pint("10 mm/d")
    assert q.magnitude == 10.0


def test_temperature_conversions():
    assert convert_units_to("25 degC", "K") == pytest.approx(298.15)
    assert convert_units_to("298.15 K", "degC") == pytest.approx(25.0)
    assert convert_units_to("32 degF", "degC") == pytest.approx(0.0)
    assert convert_units_to("0 degC", "degF") == pytest.approx(32.0)


def test_precip_hydro_context():
    # kg m-2 s-1 <-> mm/day (the "hydro" pint context, units.py:1502)
    assert convert_units_to("1 kg m-2 s-1", "mm/d") == pytest.approx(86400.0)
    assert convert_units_to("86400 mm/d", "kg m-2 s-1") == pytest.approx(1.0)
    assert convert_units_to("1 kg m-2", "mm") == pytest.approx(1.0)


def test_simple_scales():
    assert convert_units_to("1 m", "mm") == 1000.0
    assert convert_units_to("1 d", "h") == 24.0
    assert convert_units_to("36 km/h", "m/s") == pytest.approx(10.0)
    assert convert_units_to("1 hPa", "Pa") == 100.0


def test_column_conversion(spark):
    from xclim_spark.testing import timeseries

    df = timeseries(spark, [0.0, 100.0], start="2000-01-01")
    out = df.select(
        convert_units_to(df.value, "K", source_units="degC").alias("k")
    ).collect()
    assert [r["k"] for r in out] == [273.15, 373.15]


def test_incompatible_units():
    with pytest.raises(DimensionalityError):
        convert_units_to("1 m", "K")
    with pytest.raises(DimensionalityError):
        check_units("m", "kg")


def test_factor_shift():
    scale, shift = units_convert_factor("degC", "K")
    assert scale == 1.0 and shift == pytest.approx(273.15)
    scale, shift = units_convert_factor("km", "m")
    assert scale == 1000.0 and shift == 0.0


def test_to_agg_units():
    assert to_agg_units("K", "count") == "days"
    assert to_agg_units("K", "mean") == "K"
    assert to_agg_units("K", "var") == "(K)^2"


def test_declare_units_contract():
    @declare_units(tas="K", thresh="K")
    def f(tas=None, thresh=None):
        return True

    assert f(tas=(None, "degC"), thresh="25 degC")
    with pytest.raises(DimensionalityError):
        f(tas=(None, "mm/d"), thresh="25 degC")
