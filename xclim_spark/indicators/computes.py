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


def _thr(params: dict):
    """Threshold under either spelling: ``thresh`` (atmos specs) or
    ``threshold`` (clix-meta cf.yml naming)."""
    v = params.get("thresh")
    return v if v is not None else params.get("threshold")


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
        df, cols["data"], params["op"], _thr(params), params["freq"],
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
        df, cols["data"], params["op"], _thr(params), params["freq"],
        time=time, cells=cells, alias=alias, **_indexer(params),
    )


@register_compute("thresholded_statistics")
def thresholded_statistics(df, cols, params, *, time, cells, alias):
    """Reducer over rows meeting a condition (reference generic.py:1279)."""
    return g.thresholded_statistics(
        df, cols["data"], params["reducer"], params["op"], _thr(params),
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


@register_compute("spell_stats")
def spell_stats(df, cols, params, *, time, cells, alias):
    """Windowed-aggregate spells — dry/wet_spell_* family (reference
    _threshold.py:3314-3742 via generic.py:543-769): days are in a spell
    when the rolling ``window`` ``win_reducer`` of the data meets ``op
    thresh``; ``spell_reducer`` in {count, sum, max} maps to
    frequency / total length / max length."""
    return rl.spell_length_statistics(
        df, cols["data"], int(params["window"]),
        params.get("win_reducer", "sum"), params["op"], params["thresh"],
        params["spell_reducer"], params["freq"],
        time=time, cells=cells, alias=alias,
    )


@register_compute("season_field")
def season_field(df, cols, params, *, time, cells, alias):
    """One field of the season automaton — growing/frost-free season
    start/end/length (reference run_length.py:891-1147,
    _threshold.py:975-1475).  ``params['field']`` in {start, end,
    length}; start/end are emitted as day-of-year."""
    cond = g.compare(cols["data"], params["op"], params["thresh"])
    out = rl.season_bounds(
        df, cond, int(params["window"]),
        mid_date=params.get("mid_date", "07-01"),
        freq=params["freq"], time=time, cells=cells,
    )
    field = params["field"]
    keys = [*[F.col(c) for c in cells], F.col("period")]
    if field == "length":
        col = F.col("season_length")
    else:
        col = F.dayofyear(F.col(f"season_{field}"))
    return out.select(*keys, col.alias(alias))


@register_compute("first_run_after_date_doy")
def first_run_after_date_doy(df, cols, params, *, time, cells, alias):
    """Day-of-year of the first >=window run after a calendar date —
    growing_season_end / first_fall_frost shape (reference
    run_length.py:1204-1242)."""
    cond = g.compare(cols["data"], params["op"], params["thresh"])
    return rl.first_run_after_date(
        df, cond, int(params["window"]), date=params.get("date", "07-01"),
        freq=params["freq"], time=time, cells=cells, coord="doy",
        alias=alias,
    )


@register_compute("last_run_before_date_doy")
def last_run_before_date_doy(df, cols, params, *, time, cells, alias):
    """Day-of-year of the last >=window run before a calendar date —
    last_spring_frost (reference _threshold.py:1526,
    run_length.py:1245-1287)."""
    cond = g.compare(cols["data"], params["op"], params["thresh"])
    return rl.last_run_before_date(
        df, cond, int(params["window"]), date=params.get("date", "07-01"),
        freq=params["freq"], time=time, cells=cells, coord="doy",
        alias=alias,
    )


@register_compute("spell_duration_index")
def spell_duration_index(df, cols, params, *, time, cells, alias):
    """WSDI/CSDI (reference _multivariate.py:69,1719): days inside
    >=window runs beyond the day-of-year percentile climatology
    (``params['per']`` DataFrame from ``percentile_doy``)."""
    from ..operators import percentile as pc

    j = pc.resample_doy(df, params["per"], time=time, cells=cells,
                        broadcast=params.get("broadcast"))
    cond = g.compare(cols["data"], params.get("op", ">"), F.col("per"))
    return rl.windowed_run_count(
        j, cond, int(params["window"]), freq=params["freq"],
        time=time, cells=cells, alias=alias,
    )


@register_compute("bivariate_spell_max_length")
def bivariate_spell_max_length(df, cols, params, *, time, cells, alias):
    """Longest >=window bivariate spell (heat_wave_max_length,
    reference _multivariate.py:724)."""
    cond = g.compare(
        cols["low_data"], params["op_low"], params["thresh_low"]
    ) & g.compare(cols["high_data"], params["op_high"], params["thresh_high"])
    return rl.rle_statistics(
        df, cond, "max", int(params["window"]), freq=params["freq"],
        time=time, cells=cells, alias=alias,
    )


@register_compute("bivariate_spell_total_length")
def bivariate_spell_total_length(df, cols, params, *, time, cells, alias):
    """Days inside >=window bivariate spells (heat_wave_total_length,
    reference _multivariate.py:803)."""
    cond = g.compare(
        cols["low_data"], params["op_low"], params["thresh_low"]
    ) & g.compare(cols["high_data"], params["op_high"], params["thresh_high"])
    return rl.windowed_run_count(
        df, cond, int(params["window"]), freq=params["freq"],
        time=time, cells=cells, alias=alias,
    )


@register_compute("thresholded_ratio")
def thresholded_ratio(df, cols, params, *, time, cells, alias):
    """Ratio of the thresholded sum over the total sum per period —
    liquid_precip_ratio / rprctot shape (reference
    _multivariate.py:871, _threshold.py:3170).  The condition applies to
    ``cond_data`` (defaults to the summed data itself)."""
    cond_col = cols.get("cond_data", cols["data"])
    cond = g.compare(cond_col, params["op"], params["thresh"])
    d = df.withColumn("_num", F.when(cond, F.col(cols["data"]))
                      .otherwise(F.lit(0.0)))
    from ..calendar import period_start

    per = period_start(time, params["freq"])
    out = (
        d.groupBy(*cells, per.alias("period"))
        .agg((F.sum("_num") / F.sum(cols["data"])).alias(alias))
    )
    return out


@register_compute("degree_days_exceedance_date")
def degree_days_exceedance_date(df, cols, params, *, time, cells, alias):
    """First day-of-year where cumulative degree days cross a sum
    (reference _threshold.py:3215)."""
    return g.degree_days_exceedance_date(
        df, cols["data"], params.get("op", ">"), params["thresh"],
        params["sum_thresh"], freq=params.get("freq", "YS"),
        after_date=params.get("after_date"), time=time, cells=cells,
        alias=alias,
    )


@register_compute("weighted_domain_sum")
def weighted_domain_sum(df, cols, params, *, time, cells, alias):
    """Spatially aggregated thresholded weighted sum per timestep —
    sea_ice_area/extent (reference _threshold.py:3058-3134): sum of
    ``weight`` (times ``data`` unless ``extent``) over cells where
    ``data op thresh``; grouped by the period key only (``cells``
    intentionally NOT in the output grain)."""
    from ..calendar import period_start

    cond = g.compare(cols["data"], params["op"], params["thresh"])
    val = F.col(cols["weight"]) if params.get("extent") \
        else F.col(cols["weight"]) * F.col(cols["data"])
    d = df.withColumn("_v", F.when(cond, val).otherwise(F.lit(0.0)))
    per = period_start(time, params.get("freq", "D"))
    return d.groupBy(per.alias("period")).agg(F.sum("_v").alias(alias))


@register_compute("melt_rolling_max")
def melt_rolling_max(df, cols, params, *, time, cells, alias):
    """Max over period of the rolling ``window``-day sum of snow melt
    (positive day-over-day SWE decrease) — snow_melt_we_max (reference
    _hydrology.py:371-405)."""
    from pyspark.sql import Window

    w = Window.partitionBy(*cells).orderBy(time)
    melt = -(F.col(cols["data"]) - F.lag(cols["data"]).over(w))
    d = df.withColumn("_melt", melt)
    return g.select_rolling_resample_op(
        d, "_melt", "max", params["freq"], window=int(params["window"]),
        window_op="sum", time=time, cells=cells, alias=alias,
    )


@register_compute("base_flow_index")
def base_flow_index(df, cols, params, *, time, cells, alias):
    """min(7-day mean flow) / mean flow (reference _hydrology.py:50)."""
    from ..operators import hydrology as hy

    return hy.base_flow_index(df, cols["data"], params["freq"],
                              time=time, cells=cells, alias=alias)


@register_compute("statistics")
def statistics(df, cols, params, *, time, cells, alias):
    """clix-meta ``statistics`` (cf.yml; reference generic.py:83-125):
    plain reducer over the period — same kernel as ``resample_op`` but
    parameterized by ``reducer`` as in the YAML."""
    return g.select_resample_op(
        df, cols["data"], params["reducer"], params["freq"],
        time=time, cells=cells, alias=alias, **_indexer(params),
    )


@register_compute("spell_length")
def spell_length(df, cols, params, *, time, cells, alias):
    """clix-meta ``spell_length`` (cf.yml cdd/cwd/ct**TT family): reducer
    over lengths of runs where ``data op threshold`` (reference
    run_length.py:275 rle_statistics)."""
    cond = g.compare(cols["data"], params["op"], params["threshold"])
    return rl.rle_statistics(
        df, cond, params.get("reducer", "max"), 1, freq=params["freq"],
        time=time, cells=cells, alias=alias,
    )


@register_compute("diurnal_temperature_range")
def diurnal_temperature_range(df, cols, params, *, time, cells, alias):
    """clix-meta ``diurnal_temperature_range`` (cf.yml dtr/maxdtr):
    reducer over (high - low) — same kernel as ``range_statistics``."""
    return range_statistics(df, cols, params, time=time, cells=cells,
                            alias=alias)


@register_compute("extreme_temperature_range")
def extreme_temperature_range(df, cols, params, *, time, cells, alias):
    """clix-meta ``extreme_temperature_range`` (cf.yml etr): per-period
    max(high) - min(low) (reference _multivariate.py:615)."""
    from ..calendar import period_start

    per = period_start(time, params["freq"])
    return (
        df.groupBy(*cells, per.alias("period"))
        .agg((F.max(cols["high_data"]) - F.min(cols["low_data"]))
             .alias(alias))
    )


@register_compute("interday_diurnal_temperature_range")
def interday_diurnal_temperature_range(df, cols, params, *, time, cells,
                                       alias):
    """clix-meta ``interday_diurnal_temperature_range`` (cf.yml vdtr) —
    same kernel as ``interday_range_variability``."""
    return interday_range_variability(df, cols, params, time=time,
                                      cells=cells, alias=alias)


@register_compute("rb_flashiness_index")
def rb_flashiness_index(df, cols, params, *, time, cells, alias):
    """Richards-Baker flashiness (reference _hydrology.py:94)."""
    from ..operators import hydrology as hy

    return hy.rb_flashiness_index(df, cols["data"], params["freq"],
                                  time=time, cells=cells, alias=alias)


@register_compute("temperature_seasonality")
def temperature_seasonality(df, cols, params, *, time, cells, alias):
    """ANUCLIM BIO4 (anuclim.yml P4; reference _anuclim.py:105)."""
    from ..operators import anuclim as an

    return an.temperature_seasonality(
        df, cols["data"], params["freq"], time=time, cells=cells,
        alias=alias)


@register_compute("precip_seasonality")
def precip_seasonality(df, cols, params, *, time, cells, alias):
    """ANUCLIM BIO15 (anuclim.yml P15; reference _anuclim.py:161)."""
    from ..operators import anuclim as an

    return an.precip_seasonality(
        df, cols["data"], params["freq"], time=time, cells=cells,
        alias=alias)


@register_compute("isothermality")
def isothermality(df, cols, params, *, time, cells, alias):
    """ANUCLIM BIO3 (anuclim.yml P3; reference _anuclim.py:66)."""
    from ..operators import anuclim as an

    return an.isothermality(
        df, cols["low_data"], cols["high_data"], params["freq"],
        time=time, cells=cells, alias=alias)


@register_compute("quarter_stat")
def quarter_stat(df, cols, params, *, time, cells, alias):
    """Rolling 3-month quarter stat selected by another variable —
    ANUCLIM BIO8-11/16-19 (reference _anuclim.py:215-526 via
    _to_quarter/_from_other_arg :527-620).  ``cols['data']`` is reduced
    (``op``), ``cols['sel_data']`` (default data) drives the warmest/
    coldest/wettest/driest selection (``sel_op`` + ``select``)."""
    from ..operators import anuclim as an

    return an.quarter_stat(
        df, cols["data"], op=params.get("op", "mean"),
        sel_var=cols.get("sel_data"), sel_op=params.get("sel_op", "mean"),
        select=params.get("select", "max"), freq=params["freq"],
        time=time, cells=cells, alias=alias)


@register_compute("period_extreme")
def period_extreme(df, cols, params, *, time, cells, alias):
    """Extreme of the per-subperiod reduction within each period —
    ANUCLIM P13/P14 PrecipWettest/DriestPeriod (reference
    _anuclim.py:330-420 with monthly src periods): monthly ``sub_op``
    then ``select`` over months of the year."""
    from ..calendar import period_start

    sub = {"sum": F.sum, "mean": F.avg, "max": F.max, "min": F.min}[
        params.get("sub_op", "sum")]
    outer = F.max if params.get("select", "max") == "max" else F.min
    monthly = (
        df.withColumn("_m", period_start(time, params.get("subfreq", "MS")))
        .groupBy(*cells, "_m")
        .agg(sub(cols["data"]).alias("_v"))
    )
    return (
        monthly.withColumn("period", period_start("_m", params["freq"]))
        .groupBy(*cells, "period")
        .agg(outer("_v").alias(alias))
    )


@register_compute("occurrence_fraction")
def occurrence_fraction(df, cols, params, *, time, cells, alias):
    """Fraction (or %) of days meeting ``data op thresh`` per period —
    wetdays_prop / snowfall_frequency (reference _threshold.py:2793,
    :528).  ``params['percent']`` scales to 0-100."""
    from ..calendar import period_start

    cond = g.compare(cols["data"], params["op"], _thr(params))
    scale = 100.0 if params.get("percent") else 1.0
    per = period_start(time, params["freq"])
    return (
        df.groupBy(*cells, per.alias("period"))
        .agg((F.avg(cond.cast("double")) * scale).alias(alias))
    )


@register_compute("last_run_doy")
def last_run_doy(df, cols, params, *, time, cells, alias):
    """Day-of-year of the last >=window run (reference run_length.py:693;
    last_snowfall shape)."""
    cond = g.compare(cols["data"], params["op"], _thr(params))
    return rl.last_run(
        df, cond, int(params.get("window", 1)), freq=params["freq"],
        time=time, cells=cells, coord="doy", alias=alias,
    )


@register_compute("bivariate_spell_mean_length")
def bivariate_spell_mean_length(df, cols, params, *, time, cells, alias):
    """Mean length of >=window bivariate spells (freezethaw_spell_mean_length,
    reference _multivariate.py multiday_temperature_swing op=mean)."""
    cond = g.compare(
        cols["low_data"], params["op_low"], params["thresh_low"]
    ) & g.compare(cols["high_data"], params["op_high"], params["thresh_high"])
    return rl.rle_statistics(
        df, cond, "mean", int(params.get("window", 1)),
        freq=params["freq"], time=time, cells=cells, alias=alias,
    )


@register_compute("increase_count")
def increase_count(df, cols, params, *, time, cells, alias):
    """Days where ``data`` increases by >= thresh versus the previous day
    — snd/snw_storm_days (reference _threshold.py:2471-2535)."""
    from pyspark.sql import Window

    from ..calendar import period_start

    w = Window.partitionBy(*cells).orderBy(time)
    inc = F.col(cols["data"]) - F.lag(cols["data"]).over(w)
    per = period_start(time, params["freq"])
    return (
        df.withColumn("_inc", inc)
        .groupBy(*cells, per.alias("period"))
        .agg(F.sum((F.col("_inc") >= F.lit(_thr(params)))
                   .cast("long")).alias(alias))
    )


@register_compute("converter")
def converter(df, cols, params, *, time, cells, alias):
    """Per-timestep physical converter (reference indicators/convert realm,
    src/xclim/indicators/convert/_conversion.py): applies a Column-builder
    from :mod:`xclim_spark.functions.converters` row-wise, preserving the
    time grain.  ``params['fn']`` names the function; ``params['args']``
    lists input roles / parameter names in positional order;
    ``params['outputs']`` names the columns for tuple-returning
    converters."""
    from ..functions import converters as cv
    from ..functions import solar as sol

    fn = getattr(cv, params["fn"], None) or getattr(sol, params["fn"])
    args = []
    for a in params.get("args", []):
        if a == "_time":
            args.append(time)
        elif a in cols:
            args.append(cols[a])
        else:
            args.append(params[a])
    out = fn(*args)
    keys = [*cells, time]
    if isinstance(out, tuple):
        names = params["outputs"]
        return df.select(*keys, *[c.alias(n) for c, n in zip(out, names)])
    return df.select(*keys, out.alias(alias))


@register_compute("utci")
def utci(df, cols, params, *, time, cells, alias):
    """UTCI (reference converters.py:2389; staged multi-column build)."""
    from ..functions import converters as cv

    staged = cv.universal_thermal_climate_index(
        df, cols["tas"], cols["hurs"], cols["sfcWind"], cols["mrt"],
        out=alias, mask_invalid=params.get("mask_invalid", True),
    )
    return staged.select(*cells, time, alias)


@register_compute("mean_radiant_temperature")
def mean_radiant_temperature(df, cols, params, *, time, cells, alias):
    """Mean radiant temperature (reference converters.py:2538)."""
    from ..functions import converters as cv

    out = cv.mean_radiant_temperature(
        time, cols["lat"], cols["rsds"], cols["rsus"], cols["rlds"],
        cols["rlus"], stat=params.get("stat", "sunlit"))
    return df.select(*cells, time, out.alias(alias))


@register_compute("potential_evapotranspiration")
def potential_evapotranspiration_c(df, cols, params, *, time, cells, alias):
    """PET converter indicator (reference converters.py:1890)."""
    from ..functions import converters as cv

    out = cv.potential_evapotranspiration(
        time, cols["lat"],
        tasmin_c=cols.get("tasmin"), tasmax_c=cols.get("tasmax"),
        tas_c=cols.get("tas"), hurs_pct=cols.get("hurs"),
        sfcwind_10m_ms=cols.get("sfcWind"), rsds_wm2=cols.get("rsds"),
        rsus_wm2=cols.get("rsus"), rlds_wm2=cols.get("rlds"),
        rlus_wm2=cols.get("rlus"),
        method=params.get("method", "hargreaves85"))
    return df.select(*cells, time, out.alias(alias))


@register_compute("water_budget")
def water_budget_c(df, cols, params, *, time, cells, alias):
    """pr minus PET, from given PET or from temperature (reference
    converters.py water_budget / water_budget_from_tas)."""
    from ..functions import converters as cv

    if cols.get("evspsblpot"):
        pet = F.col(cols["evspsblpot"])
    else:
        pet = cv.potential_evapotranspiration(
            time, cols["lat"], tasmin_c=cols.get("tasmin"),
            tasmax_c=cols.get("tasmax"), tas_c=cols.get("tas"),
            method=params.get("method") or "baierrobertson65")
    out = F.col(cols["pr"]) - pet
    return df.select(*cells, time, out.alias(alias))


@register_compute("fit")
def fit_c(df, cols, params, *, time, cells, alias):
    """Distribution fit per cell (reference stats.py:115; generic
    indicator `fit`)."""
    from .. import stats as st

    return st.fit(df, cols["data"], params.get("dist", "norm"),
                  params.get("method", "ML"), time=time, cells=cells)


@register_compute("return_level")
def return_level(df, cols, params, *, time, cells, alias):
    """Frequency analysis / return levels (reference stats.py:429;
    generic indicator `return_level`)."""
    from .. import stats as st

    return st.fa(
        df, cols["data"], params.get("t", 20),
        dist=params.get("dist", "gumbel_r"), mode=params.get("mode", "max"),
        method=params.get("method", "PWM"), freq=params.get("freq", "YS"),
        time=time, cells=cells, alias=alias)


@register_compute("standardized_index")
def standardized_index_c(df, cols, params, *, time, cells, alias):
    """SPI/SPEI/SSI/SGI (reference stats.py:770-1050, _agro.py:987,
    _hydrology.py:136,447)."""
    from .. import stats as st

    d = df
    offset = params.get("offset")
    if offset:
        d = d.withColumn(cols["data"], F.col(cols["data"]) + float(offset))
    return st.standardized_index(
        d, cols["data"], window=int(params.get("window", 1)),
        dist=params.get("dist", "gamma"), freq=params.get("freq", "MS"),
        cal_start=params.get("cal_start"), cal_end=params.get("cal_end"),
        method=params.get("method", "ML"), time=time, cells=cells,
        alias=alias)


@register_compute("sen_slope")
def sen_slope_c(df, cols, params, *, time, cells, alias):
    """Theil-Sen slope (reference _hydrology.py:894)."""
    from ..operators import hydrology as hy

    return hy.sen_slope(df, cols["data"], time=time, cells=cells,
                        alias=alias)


@register_compute("flow_index")
def flow_index_c(df, cols, params, *, time, cells, alias):
    """Qp/Q50 flow index (reference _hydrology.py:577)."""
    from ..operators import hydrology as hy

    return hy.flow_index(df, cols["data"], float(params.get("p", 0.95)),
                         cells=cells, alias=alias)


@register_compute("high_flow_frequency")
def high_flow_frequency_c(df, cols, params, *, time, cells, alias):
    """Days with flow above factor x median (reference _hydrology.py:607)."""
    from ..operators import hydrology as hy

    return hy.high_flow_frequency(
        df, cols["data"], float(params.get("threshold_factor", 9.0)),
        params.get("freq", "YS"), time=time, cells=cells, alias=alias)


@register_compute("low_flow_frequency")
def low_flow_frequency_c(df, cols, params, *, time, cells, alias):
    """Days with flow below factor x mean (reference _hydrology.py:640)."""
    from ..operators import hydrology as hy

    return hy.low_flow_frequency(
        df, cols["data"], float(params.get("threshold_factor", 0.2)),
        params.get("freq", "YS"), time=time, cells=cells, alias=alias)


@register_compute("cffwis_field")
def cffwis_field(df, cols, params, *, time, cells, alias):
    """One (or all) of the six CFFWIS codes at daily grain (reference
    _cffwis.py:1278 cffwis_indices).  ``params['field']`` selects a
    single output column renamed to the indicator identifier; 'all'
    keeps the full ffmc/dmc/dc/isi/bui/fwi set."""
    from ..operators import fire as fr

    out = fr.cffwis_indices(
        df, tas=cols["tas"], pr=cols["pr"], hurs=cols["hurs"],
        sfcWind=cols["sfcWind"], lat=params.get("lat", 45.0),
        time=time, cells=cells,
        ffmc0=float(params.get("ffmc0", 85.0)),
        dmc0=float(params.get("dmc0", 6.0)),
        dc0=float(params.get("dc0", 15.0)))
    field = params.get("field", "all")
    if field == "all":
        return out
    return out.select(*cells, time, F.col(field).alias(alias))


@register_compute("ffdi_field")
def ffdi_field(df, cols, params, *, time, cells, alias):
    """KBDI / Griffiths drought factor / McArthur FFDI at daily grain
    (reference fire/_ffdi.py)."""
    from ..operators import fire as fr

    out = fr.ffdi_indices(
        df, pr=cols["pr"], tasmax=cols["tasmax"], hurs=cols["hurs"],
        sfcWind=cols["sfcWind"],
        pr_annual=float(params["pr_annual"]),
        time=time, cells=cells, kbdi0=float(params.get("kbdi0", 0.0)),
        limiting=params.get("limiting", "xlim"))
    field = params.get("field", "ffdi")
    name = {"kbdi": "kbdi", "drought_factor": "drought_factor",
            "ffdi": "ffdi"}[field]
    return out.select(*cells, time, F.col(name).alias(alias))


@register_compute("bivariate_windowed_spell_stats")
def bivariate_windowed_spell_stats(df, cols, params, *, time, cells, alias):
    """heat_spell_* family (reference indicators/atmos/_temperature.py
    heat_spell_frequency): spells where the ``window``-day ``win_reducer``
    of BOTH variables exceeds its threshold."""
    return rl.spell_length_statistics(
        df, [cols["low_data"], cols["high_data"]], int(params["window"]),
        params.get("win_reducer", "mean"), params.get("op", ">"),
        [params["thresh_low"], params["thresh_high"]],
        params["spell_reducer"], params["freq"],
        time=time, cells=cells, alias=alias)


@register_compute("spell_max_magnitude")
def spell_max_magnitude(df, cols, params, *, time, cells, alias):
    """hot_spell_max_magnitude (reference _threshold.py:2253): max over
    spells of the cumulative exceedance above thresh."""
    t = _thr(params)
    d = df.withColumn("_exc", F.col(cols["data"]) - F.lit(float(t)))
    cond = g.compare(cols["data"], ">", t)
    ev = rl.find_events(d, cond, int(params["window"]), data_var="_exc",
                        freq=params["freq"], time=time, cells=cells)
    ev = ev.filter(F.col("event_length") >= int(params["window"]))
    agg = ev.groupBy(*cells, "period").agg(F.max("event_sum").alias(alias))
    return rl._on_scaffold(d, agg, cells, time, params["freq"],
                           fills={alias: 0.0})


@register_compute("conditional_stat")
def conditional_stat(df, cols, params, *, time, cells, alias):
    """Reducer over ``data`` on days where ``cond_data op thresh`` —
    liquid/solid precip accumulation (reference _multivariate.py:930
    precip_accumulation with phase filtering)."""
    from ..calendar import period_start

    cond = g.compare(cols.get("cond_data", cols["data"]), params["op"],
                     _thr(params))
    reducer = params.get("reducer", "sum")
    red = {"sum": F.sum, "mean": F.avg, "max": F.max, "min": F.min}[reducer]
    fill = F.lit(0.0) if reducer == "sum" else F.lit(None)
    d = df.withColumn("_v", F.when(cond, F.col(cols["data"])).otherwise(fill))
    per = period_start(time, params["freq"])
    return d.groupBy(*cells, per.alias("period")).agg(red("_v").alias(alias))


@register_compute("ratio_of_sums")
def ratio_of_sums(df, cols, params, *, time, cells, alias):
    """sum(num)/sum(den) per period — runoff_ratio / aridity_index shape
    (reference _hydrology.py runoff_ratio, _agro.py aridity gauges)."""
    from ..calendar import period_start

    per = period_start(time, params["freq"])
    return (
        df.groupBy(*cells, per.alias("period"))
        .agg((F.sum(cols["num"]) / F.sum(cols["den"])).alias(alias))
    )


@register_compute("sum_of_two")
def sum_of_two(df, cols, params, *, time, cells, alias):
    """sum(a + b) per period — water_cycle_intensity (reference
    _hydrology.py water_cycle_intensity: pr + evapotranspiration)."""
    from ..calendar import period_start

    per = period_start(time, params["freq"])
    return (
        df.groupBy(*cells, per.alias("period"))
        .agg(F.sum(F.col(cols["a"]) + F.col(cols["b"])).alias(alias))
    )


@register_compute("peak_lag")
def peak_lag(df, cols, params, *, time, cells, alias):
    """doy(max of a) - doy(max of b) per period — lag_snowpack_flow_peaks
    (reference land/_streamflow.py)."""
    from ..calendar import period_start

    per = period_start(time, params["freq"])
    doy = F.dayofyear(time)
    return (
        df.groupBy(*cells, per.alias("period"))
        .agg((F.max_by(doy, F.struct(F.col(cols["a"]), doy)) -
              F.max_by(doy, F.struct(F.col(cols["b"]), doy))).alias(alias))
    )


@register_compute("melt_and_precip_max")
def melt_and_precip_max(df, cols, params, *, time, cells, alias):
    """Max over period of the rolling ``window``-day sum of snow melt plus
    precipitation (reference _hydrology.py:406-440)."""
    from pyspark.sql import Window

    w = Window.partitionBy(*cells).orderBy(time)
    melt = -(F.col(cols["snw"]) - F.lag(cols["snw"]).over(w))
    d = df.withColumn("_mp", F.greatest(melt, F.lit(0.0)) +
                      F.col(cols["pr"]))
    return g.select_rolling_resample_op(
        d, "_mp", "max", params["freq"], window=int(params["window"]),
        window_op="sum", time=time, cells=cells, alias=alias,
    )


@register_compute("antecedent_precipitation_index")
def antecedent_precipitation_index(df, cols, params, *, time, cells, alias):
    """API_t = sum_{i<window} pr_{t-i} * p_exp^i at daily grain (reference
    _hydrology.py antecedent_precipitation_index).  The window unrolls to
    ``window`` lag expressions — pure codegen, no UDF."""
    from pyspark.sql import Window

    w = Window.partitionBy(*cells).orderBy(time)
    p = float(params.get("p_exp", 0.935))
    n = int(params.get("window", 7))
    terms = [F.coalesce(F.lag(cols["data"], i).over(w), F.lit(0.0)) *
             F.lit(p ** i) for i in range(n)]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return df.select(*cells, time, out.alias(alias))
