"""Data structure checks (reference ``src/xclim/core/datachecks.py``) and
metadata checks (``cfchecks.py``).

Structure checks run as tiny Spark aggregates over the time column (one
pass, map-side combined); metadata checks validate against the variable
vocabulary at plan time.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .calendar import parse_offset

__all__ = ["ValidationError", "infer_freq_seconds", "check_freq",
           "check_daily", "check_common_time", "cfcheck_from_name",
           "check_valid"]

_BASE_SECONDS = {"D": 86400, "H": 3600, "T": 60, "W": 7 * 86400}


class ValidationError(ValueError):
    """Raised when a structural or metadata check fails
    (reference core/datachecks.py / cfchecks.py)."""


def infer_freq_seconds(
    df: DataFrame, *, time: str = "time", cells: Sequence[str] = ()
) -> int | None:
    """Infer the (regular) step of the time axis in seconds: one window
    pass computing consecutive deltas + one aggregate.  Returns None when
    the series is irregular or has < 2 steps (reference relies on
    ``xr.infer_freq``)."""
    w = Window.partitionBy(*cells).orderBy(time)
    delta = F.unix_timestamp(F.col(time).cast("timestamp")) - \
        F.unix_timestamp(F.lag(time).over(w).cast("timestamp"))
    stats = df.select(delta.alias("_d")).filter(F.col("_d").isNotNull()) \
        .agg(F.min("_d").alias("lo"), F.max("_d").alias("hi"),
             F.count("_d").alias("n")).collect()[0]
    if stats["n"] == 0 or stats["lo"] != stats["hi"] or stats["lo"] <= 0:
        return None
    return int(stats["lo"])


def check_freq(
    df: DataFrame, freq: str | Sequence[str], *, strict: bool = True,
    time: str = "time", cells: Sequence[str] = (),
) -> None:
    """Raise unless the series' inferred step matches one of ``freq``
    (reference datachecks.py:20-75).  ``strict=False`` accepts multiples
    of the expected base."""
    freqs = [freq] if isinstance(freq, str) else list(freq)
    step = infer_freq_seconds(df, time=time, cells=cells)
    if step is None:
        raise ValidationError(
            "Unable to infer the frequency of the time series."
        )
    ok = False
    for f in freqs:
        off = parse_offset(f)
        base_s = _BASE_SECONDS.get(off.base)
        if base_s is None:
            continue
        want = base_s * off.mult
        if step == want or (not strict and step % base_s == 0):
            ok = True
    if not ok:
        raise ValidationError(
            f"Frequency of time series not "
            f"{'strictly ' if strict else ''}in {freqs} (step={step}s)."
        )


def check_daily(df: DataFrame, *, time: str = "time",
                cells: Sequence[str] = ()) -> None:
    """Daily frequency check (reference datachecks.py:78-95)."""
    check_freq(df, "D", time=time, cells=cells)


def check_common_time(
    dfs: Sequence[DataFrame], *, time: str = "time",
    cells: Sequence[str] = (),
) -> None:
    """All inputs must share the same inferred step and time span
    (reference datachecks.py:98-140)."""
    seen = set()
    for df in dfs:
        step = infer_freq_seconds(df, time=time, cells=cells)
        span = df.agg(F.min(time), F.max(time)).collect()[0]
        seen.add((step, span[0], span[1]))
    if len(seen) > 1:
        raise ValidationError(
            f"Inputs have mismatched time axes: {sorted(map(str, seen))}"
        )


def check_valid(attrs: dict, key: str, expected) -> None:
    """Check one metadata attribute against expected value(s) (reference
    ``check_valid``, cfchecks.py:22-45): raises :class:`ValidationError`
    when ``attrs[key]`` is absent or not among ``expected`` (a string or
    sequence of strings)."""
    exp = [expected] if isinstance(expected, str) else list(expected)
    got = attrs.get(key)
    if got is None or got not in exp:
        raise ValidationError(
            f"Attribute {key!r} is {got!r}, expected one of {exp}")


def cfcheck_from_name(varname: str, units: str | None = None,
                      standard_name: str | None = None) -> None:
    """Metadata check against the variable vocabulary (reference
    cfchecks.py:22-94 + VARIABLES registry): raises when declared
    metadata contradicts the vocabulary entry."""
    from .indicators.core import VARIABLES
    from .units import check_units

    if varname not in VARIABLES:
        return  # unknown variables pass (reference warns)
    spec = VARIABLES[varname]
    if standard_name and spec.get("standard_name") and \
            standard_name != spec["standard_name"]:
        raise ValidationError(
            f"{varname}: standard_name {standard_name!r} != "
            f"{spec['standard_name']!r}"
        )
    if units:
        try:
            check_units(units, spec["canonical_units"])
        except Exception as err:
            raise ValidationError(
                f"{varname}: units {units!r} not compatible with "
                f"{spec['canonical_units']!r}"
            ) from err
