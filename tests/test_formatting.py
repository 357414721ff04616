"""Formatting + locale tests (mirrors reference tests:
test_formatting.py / test_locales.py behavior)."""

import pytest

from xclim_spark import formatting as fmt


def test_attr_formatter_modifiers():
    f = fmt.AttrFormatter(
        {"nice": ["beau", "belle"], "evil": ["méchant", "méchante"]},
        ["m", "f"],
    )
    out = f.format("Le chien est {a:m}, l'oie est {b:f}, le gecko est "
                   "{c:r}", a="nice", b="evil", c="smart")
    assert out == "Le chien est beau, l'oie est méchante, le gecko est smart"


def test_attr_formatter_fnmatch_patterns():
    f = fmt.AttrFormatter(
        {"YS-*": ["annuel", "annuelle"], "MS": ["mensuel", "mensuelle"]},
        ["m", "f"],
    )
    out = f.format("La moyenne {freq:f} sur un pas {src:m}",
                   freq="YS-JUL", src="MS")
    assert out == "La moyenne annuelle sur un pas mensuel"


def test_attr_formatter_unknown_value_warns_on_modifier():
    f = fmt.AttrFormatter({"x": ["y"]}, ["m"])
    with pytest.warns(UserWarning):
        assert f.format("{v:m}", v="zzz") == "zzz"


def test_attr_formatter_reserved_r():
    with pytest.raises(ValueError):
        fmt.AttrFormatter({}, ["r"])


def test_default_formatter_freq():
    out = fmt.default_formatter.format("{freq} mean of {op}",
                                       freq="YS", op="max")
    assert out == "annual mean of maximal"


def test_update_history_and_merge():
    h1 = {"history": "first thing"}
    line = fmt.update_history("tg_mean(freq='YS')", h1, new_name="tg_mean")
    assert "tg_mean: tg_mean(freq='YS')" in line
    assert "xclim_spark version" in line
    assert line.endswith("first thing")
    merged = fmt.merge_attributes("history", a=h1, b={"history": "second"})
    assert merged == "a: first thing\nb: second"


def test_locale_registry():
    assert "fr" in fmt.list_locales()
    f = fmt.get_local_formatter("fr")
    assert f.format("{freq:f}", freq="YS") == "annuelle"
    attrs = fmt.get_local_attrs("tg_mean", "fr")
    assert "long_name_fr" in attrs


def test_indicator_carries_formatted_attrs(spark):
    from tests.conftest import series
    from xclim_spark.indicators import registry

    df = series(spark, [20.0] * 30, var="tas", start="2000-01-01")
    res = registry["tg_mean"](df, data="tas", freq="YS", missing=None,
                              locale="fr")
    assert "annual" in res.attrs["long_name"].lower() \
        or "mean" in res.attrs["long_name"].lower()
    assert res.attrs["history"].startswith("[")
    assert "tg_mean(" in res.attrs["history"]
    assert "xclim_spark version" in res.attrs["history"]
    # French translation rendered through the locale formatter
    assert "long_name_fr" in res.attrs
    assert "annuelle" in res.attrs["long_name_fr"].lower() \
        or "moyenne" in res.attrs["long_name_fr"].lower()


def test_indicator_without_locale_has_no_translations(spark):
    from tests.conftest import series
    from xclim_spark.indicators import registry

    df = series(spark, [20.0] * 10, var="tas", start="2000-01-01")
    res = registry["tg_mean"](df, data="tas", freq="YS", missing=None)
    assert not any(k.endswith("_fr") for k in res.attrs)


def test_register_custom_locale():
    fmt.register_locale("xx", {
        "attrs_mapping": {"modifiers": ["m"], "YS": ["yearly-xx"]},
        "tg_mean": {"long_name": "XX {freq}"},
    })
    try:
        f = fmt.get_local_formatter("xx")
        assert f.format("{freq}", freq="YS") == "yearly-xx"
        assert fmt.get_local_attrs("tg_mean", "xx") == {
            "long_name_xx": "XX {freq}"}
    finally:
        fmt._LOCALES.pop("xx", None)


def test_parse_doc_sections():
    from xclim_spark.formatting import parse_doc

    doc = """
    Number of hot days.

    The annual count of days where daily maximum temperature
    exceeds a threshold.

    Parameters
    ----------
    tasmax : str
        Daily maximum temperature column.
    thresh : str
        Threshold temperature, e.g. "30 degC".

    Notes
    -----
    Counting is calendar-aligned.

    References
    ----------
    ETCCDI climate indices.
    """
    out = parse_doc(doc)
    assert out["title"] == "Number of hot days."
    assert out["abstract"].startswith("The annual count")
    assert set(out["parameters"]) == {"tasmax", "thresh"}
    assert "Threshold temperature" in out["parameters"]["thresh"][
        "description"]
    assert out["notes"].startswith("Counting")
    assert "ETCCDI" in out["references"]
    assert parse_doc(None) == {}


def test_generate_indicator_docstring():
    from xclim_spark.formatting import generate_indicator_docstring
    from xclim_spark.indicators import registry

    ind = registry["tx_days_above"]
    doc = generate_indicator_docstring(ind)
    assert "realm:" in doc and "Based on compute" in doc
    assert "Parameters" in doc
    assert ind.identifier in doc or (ind.title and ind.title in doc)
