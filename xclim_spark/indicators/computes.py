"""Generic compute functions bound by indicator specs.

Each compute is a named bridge from a declarative spec to the kernel layer
— the Spark equivalents of the reference's generic indices used by its
YAML virtual modules (``count_occurrences``, ``spell_length``, … ;
``src/xclim/data/cf.yml`` backed by ``src/xclim/indices/generic.py``).

Signature contract: ``compute(df, cols, params, *, time, cells, alias)``
returns a DataFrame ``cells..., period, <alias>``.  ``cols`` maps input
roles (``data``, ``low_data``, ``high_data``…) to DataFrame column names;
``params`` are already unit-converted scalars.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import generic as g
from ..operators import run_length as rl
from .core import register_compute

_INDEXER_KEYS = ("season", "month", "doy_bounds", "date_bounds")


def _indexer(params: dict) -> dict:
    return {k: params[k] for k in _INDEXER_KEYS if params.get(k) is not None}


@register_compute("resample_op")
def resample_op(df, cols, params, *, time, cells, alias):
    """select_resample_op (reference generic.py:83-125)."""
    return g.select_resample_op(
        df, cols["data"], params["op"], params["freq"],
        time=time, cells=cells, alias=alias, **_indexer(params),
    )


@register_compute("rolling_resample_op")
def rolling_resample_op(df, cols, params, *, time, cells, alias):
    """select_rolling_resample_op (reference generic.py:128-174)."""
    return g.select_rolling_resample_op(
        df, cols["data"], params["op"], params["freq"],
        window=int(params["window"]),
        window_op=params.get("window_op", "mean"),
        time=time, cells=cells, alias=alias, **_indexer(params),
    )


@register_compute("count_occurrences")
def count_occurrences(df, cols, params, *, time, cells, alias):
    """threshold_count (reference generic.py:329-361; cf.yml
    count_occurrences)."""
    return g.threshold_count(
        df, cols["data"], params["op"], params["thresh"], params["freq"],
        time=time, cells=cells, alias=alias, **_indexer(params),
    )


@register_compute("domain_count")
def domain_count(df, cols, params, *, time, cells, alias):
    """domain_count (reference generic.py:364-392)."""
    return g.domain_count(
        df, cols["data"], params["low"], params["high"], params["freq"],
        time=time, cells=cells, alias=alias, **_indexer(params),
    )


@register_compute("temperature_sum")
def temperature_sum(df, cols, params, *, time, cells, alias):
    """Signed degree-day sum (reference generic.py:1324-1357)."""
    return g.temperature_sum(
        df, cols["data"], params["op"], params["thresh"], params["freq"],
        time=time, cells=cells, alias=alias, **_indexer(params),
    )


@register_compute("thresholded_statistics")
def thresholded_statistics(df, cols, params, *, time, cells, alias):
    """Reducer over rows meeting a condition (reference generic.py:1279)."""
    return g.thresholded_statistics(
        df, cols["data"], params["reducer"], params["op"], params["thresh"],
        params["freq"], time=time, cells=cells, alias=alias,
        **_indexer(params),
    )


@register_compute("longest_run")
def longest_run(df, cols, params, *, time, cells, alias):
    """Longest run of ``data op thresh`` (reference run_length.py:338;
    maximum_consecutive_* family)."""
    cond = g.compare(cols["data"], params["op"], params["thresh"])
    return rl.longest_run(
        df, cond, freq=params["freq"], time=time, cells=cells, alias=alias,
        resample_before_rl=params.get("resample_before_rl", True),
    )


@register_compute("windowed_run_count")
def windowed_run_count(df, cols, params, *, time, cells, alias):
    """Days inside >=window runs (reference run_length.py:437; spell_length
    total form)."""
    cond = g.compare(cols["data"], params["op"], params["thresh"])
    return rl.windowed_run_count(
        df, cond, int(params["window"]), freq=params["freq"],
        time=time, cells=cells, alias=alias,
    )


@register_compute("windowed_run_events")
def windowed_run_events(df, cols, params, *, time, cells, alias):
    """Number of >=window runs (reference run_length.py:381; *_frequency
    spells)."""
    cond = g.compare(cols["data"], params["op"], params["thresh"])
    return rl.windowed_run_events(
        df, cond, int(params["window"]), freq=params["freq"],
        time=time, cells=cells, alias=alias,
    )


@register_compute("spell_length_max")
def spell_length_max(df, cols, params, *, time, cells, alias):
    """Longest >=window spell (reference rle_statistics max,
    run_length.py:275; *_max_length spells)."""
    cond = g.compare(cols["data"], params["op"], params["thresh"])
    return rl.rle_statistics(
        df, cond, "max", int(params["window"]), freq=params["freq"],
        time=time, cells=cells, alias=alias,
    )


@register_compute("first_run_doy")
def first_run_doy(df, cols, params, *, time, cells, alias):
    """Day-of-year of the first >=window run (reference run_length.py:643;
    growing_season_start shape)."""
    cond = g.compare(cols["data"], params["op"], params["thresh"])
    return rl.first_run(
        df, cond, int(params["window"]), freq=params["freq"],
        time=time, cells=cells, coord="doy", alias=alias,
    )


@register_compute("bivariate_count_occurrences")
def bivariate_count_occurrences(df, cols, params, *, time, cells, alias):
    """Count of days meeting two conditions at once (heat_wave shape,
    reference _multivariate.py:646 uses both tasmin+tasmax)."""
    cond = g.compare(
        cols["low_data"], params["op_low"], params["thresh_low"]
    ) & g.compare(cols["high_data"], params["op_high"], params["thresh_high"])
    return g.select_resample_op(
        df.withColumn("_biv", cond.cast("long")), "_biv", "sum",
        params["freq"], time=time, cells=cells, alias=alias,
    )


@register_compute("bivariate_spell_events")
def bivariate_spell_events(df, cols, params, *, time, cells, alias):
    """Number of >=window bivariate spells (heat_wave_frequency,
    reference _multivariate.py:646)."""
    cond = g.compare(
        cols["low_data"], params["op_low"], params["thresh_low"]
    ) & g.compare(cols["high_data"], params["op_high"], params["thresh_high"])
    return rl.windowed_run_events(
        df, cond, int(params["window"]), freq=params["freq"],
        time=time, cells=cells, alias=alias,
    )


@register_compute("range_statistics")
def range_statistics(df, cols, params, *, time, cells, alias):
    """Reducer over (high - low), e.g. daily_temperature_range
    (reference _multivariate.py:482-560)."""
    rng = F.col(cols["high_data"]) - F.col(cols["low_data"])
    return g.select_resample_op(
        df.withColumn("_rng", rng), "_rng", params.get("reducer", "mean"),
        params["freq"], time=time, cells=cells, alias=alias,
    )


@register_compute("interday_range_variability")
def interday_range_variability(df, cols, params, *, time, cells, alias):
    """Mean absolute day-to-day difference of (high - low)
    (daily_temperature_range_variability, reference _multivariate.py:561)."""
    from pyspark.sql import Window

    rng = F.col(cols["high_data"]) - F.col(cols["low_data"])
    w = Window.partitionBy(*cells).orderBy(time)
    df = df.withColumn("_rng", rng)
    df = df.withColumn("_vdtr", F.abs(F.col("_rng") - F.lag("_rng").over(w)))
    return g.select_resample_op(
        df, "_vdtr", "mean", params["freq"], time=time, cells=cells,
        alias=alias,
    )


@register_compute("days_over_doy_percentile")
def days_over_doy_percentile(df, cols, params, *, time, cells, alias):
    """tg90p family: count days beyond the day-of-year percentile
    climatology (reference _multivariate.py:1300; resample_doy
    calendar.py:763).  ``params['per']`` is the climatology DataFrame
    (cells..., dayofyear, per) built by ``percentile_doy``."""
    from ..operators import percentile as pc

    per_df = params["per"]
    j = pc.resample_doy(df, per_df, time=time, cells=cells,
                        broadcast=params.get("broadcast"))
    cond = g.compare(cols["data"], params.get("op", ">"), F.col("per"))
    return g.select_resample_op(
        j.withColumn("_over", cond.cast("long")), "_over", "sum",
        params["freq"], time=time, cells=cells, alias=alias,
    )
