"""Run-length / spell / event compiler — xclim's signature operator family.

Re-expresses the reference's ``src/xclim/indices/run_length.py`` (cumsum-reset
tricks + numba 1-D kernels) as the classic relational **sessionization**
pattern:

    run_id = count of condition *changes* OVER (PARTITION BY cell ORDER BY time)

followed by ``groupBy(cell, run_id)``.  One shuffle on the cell key; every
downstream run statistic is an ordinary aggregate over the runs table, and
chained run-length ops reuse the same partitioning (Spark's window exchange
reuse), so the plan scales linearly with data volume at constant shuffle
count.

``resample_before_rl`` (reference run_length.py:87-132) decides whether runs
may cross resampling-period boundaries: True partitions the run window by
(cell, period) — runs truncate at boundaries; False partitions by cell only
and stamps each run with the period of its first element.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..calendar import period_start

__all__ = [
    "with_run_id",
    "runs_table",
    "rle",
    "rle_statistics",
    "longest_run",
    "windowed_run_count",
    "windowed_run_events",
    "windowed_max_run_sum",
    "first_run",
    "last_run",
    "run_bounds",
    "first_run_after_date",
    "last_run_before_date",
    "first_run_before_date",
    "run_end_after_date",
    "keep_longest_run",
    "spell_mask",
    "spell_length_statistics",
    "bivariate_spell_length_statistics",
    "runs_with_holes",
    "find_events",
    "suspicious_run",
    "season_bounds",
]


def _order_cols(time: str, order_extra: Sequence[str]) -> list:
    return [F.col(time)] + [F.col(c) for c in order_extra]


def with_run_id(
    df: DataFrame,
    cond: Column,
    *,
    time: str = "time",
    cells: Sequence[str] = (),
    order_extra: Sequence[str] = (),
    partition_extra: Sequence[str] = (),
    cond_name: str = "_cond",
    run_name: str = "_run_id",
) -> DataFrame:
    """Assign a run id that increments whenever ``cond`` changes value.

    Equivalent to the reference's ``_cumsum_reset`` trick
    (run_length.py:144-219) but expressed as a lag-compare + running sum —
    a single window over (cells, order) that Catalyst evaluates in one pass.
    """
    part = [*cells, *partition_extra]
    w = Window.partitionBy(*part).orderBy(*_order_cols(time, order_extra))
    df = df.withColumn(cond_name, cond.cast("boolean"))
    # null-SAFE comparison: a NULL condition (the reference's NaN) must
    # open its own run — a plain `!=` yields NULL there, the running sum
    # skips it, and the NULL row would silently extend the previous run
    chg = (
        ~F.col(cond_name).eqNullSafe(F.lag(cond_name).over(w))
    ).cast("long")
    wsum = w.rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn(run_name, F.sum(chg).over(wsum))


def runs_table(
    df: DataFrame,
    cond: Column,
    *,
    time: str = "time",
    cells: Sequence[str] = (),
    order_extra: Sequence[str] = (),
    freq: str | None = None,
    resample_before_rl: bool = True,
    sum_var: str | None = None,
    include_false: bool = False,
) -> DataFrame:
    """One row per maximal run of True ``cond``: the engine's runs CTE.

    Output columns: ``cells... , period?, run_start, run_end, run_length
    [, run_sum]``.  This is the common substrate for ``rle_statistics``,
    ``longest_run``, ``windowed_run_*``, ``first_run``, ``run_bounds``,
    ``find_events`` (reference run_length.py:223-1901).

    ``include_false=True`` keeps runs of BOTH polarities with a
    ``run_true`` flag: every (cell, period) then appears in the table (its
    rows always belong to some run), so period statistics need no second
    scan of the source for the resample scaffold — the single-pass form
    used by the stat operators below.
    """
    part_extra: list[str] = []
    if freq is not None and resample_before_rl:
        df = df.withColumn("period", period_start(time, freq))
        part_extra = ["period"]
    df = with_run_id(df, cond, time=time, cells=cells,
                     order_extra=order_extra, partition_extra=part_extra)
    rows = df if include_false else df.filter(F.col("_cond"))
    aggs = [
        F.min(time).alias("run_start"),
        F.max(time).alias("run_end"),
        F.count(F.lit(1)).alias("run_length"),
        F.first("_cond").alias("run_true"),
    ]
    if sum_var is not None:
        aggs.append(F.sum(sum_var).alias("run_sum"))
    keys = [*cells, *part_extra, "_run_id"]
    runs = rows.groupBy(*keys).agg(*aggs)
    if freq is not None and not resample_before_rl:
        # period of the run's first element (runs may cross boundaries)
        runs = runs.withColumn("period", period_start("run_start", freq))
    if not include_false:
        runs = runs.drop("run_true")
    return runs.drop("_run_id")


def _stat_runs(df, cond, time, cells, order_extra, freq,
               resample_before_rl, sum_var=None):
    """Runs substrate for period statistics: single-pass (both
    polarities) when periods partition the run window, scaffold-join
    otherwise (runs crossing period bounds can leave a period with no
    run *starting* in it)."""
    single_pass = freq is None or resample_before_rl
    runs = runs_table(df, cond, time=time, cells=cells, freq=freq,
                      order_extra=order_extra, sum_var=sum_var,
                      resample_before_rl=resample_before_rl,
                      include_false=single_pass)
    if not single_pass:
        runs = runs.withColumn("run_true", F.lit(True))
    return runs, single_pass


# ---------------------------------------------------------------------------
# Run statistics (reference run_length.py:223-543)
# ---------------------------------------------------------------------------

def rle(
    df: DataFrame, cond: Column, *, time: str = "time",
    cells: Sequence[str] = (), order_extra: Sequence[str] = (),
) -> DataFrame:
    """Stamp each row with the length of the run it belongs to
    (reference ``rle``, run_length.py:223-272): a count window over
    (cell, run_id) — no extra shuffle beyond the run-id window."""
    df = with_run_id(df, cond, time=time, cells=cells, order_extra=order_extra)
    w = Window.partitionBy(*cells, "_run_id")
    return df.withColumn(
        "run_length",
        F.when(F.col("_cond"), F.count(F.lit(1)).over(w)),
    ).drop("_run_id")


def _runs_grouped(runs: DataFrame, cells: Sequence[str], freq: str | None):
    keys = [*cells] + (["period"] if freq is not None else [])
    return runs.groupBy(*keys)


def _scaffold(df: DataFrame, cells: Sequence[str], time: str, freq: str) -> DataFrame:
    """Distinct (cells, period) pairs present in the source — the resample
    scaffold.  The reference's ``resample(freq)`` emits a value for *every*
    period, even ones with zero qualifying True values; the runs table drops
    them, so period statistics left-join onto this scaffold (ADVICE r2).

    Cheap at scale: reads only the key + time columns (column pruning) and
    aggregates to cells x periods cardinality with map-side combine.
    """
    return (
        df.withColumn("period", period_start(time, freq))
        .select(*cells, "period")
        .distinct()
    )


def _on_scaffold(
    df: DataFrame, agg: DataFrame, cells: Sequence[str], time: str,
    freq: str | None, fills: dict[str, object] | None = None,
) -> DataFrame:
    """Left-join a per-period runs aggregate onto the full period scaffold,
    coalescing count-like statistics to ``fills`` (None values stay NULL)."""
    if freq is None:
        return agg
    out = _scaffold(df, cells, time, freq).join(
        agg, on=[*cells, "period"], how="left"
    )
    for col, fill in (fills or {}).items():
        if fill is not None:
            out = out.withColumn(col, F.coalesce(F.col(col), F.lit(fill)))
    return out


def rle_statistics(
    df: DataFrame, cond: Column, reducer: str, window: int, *,
    freq: str | None = None, time: str = "time", cells: Sequence[str] = (),
    order_extra: Sequence[str] = (), resample_before_rl: bool = True,
    alias: str = "rle_stat",
) -> DataFrame:
    """Reducer over run lengths >= window per period
    (reference run_length.py:275-335)."""
    runs, single = _stat_runs(df, cond, time, cells, order_extra, freq,
                              resample_before_rl)
    qual = F.when(F.col("run_true") & (F.col("run_length") >= window),
                  F.col("run_length"))
    if reducer.startswith("q"):  # "q90"-style quantile reducer (ref qNN)
        p = float(reducer[1:]) / 100.0
        def red(c, _p=p):
            return F.percentile(c, F.lit(_p))
    else:
        red = {"max": F.max, "min": F.min, "mean": F.avg, "sum": F.sum,
               "count": F.count, "std": F.stddev_pop}[reducer]
    agg = _runs_grouped(runs, cells, freq).agg(
        F.coalesce(red(qual), F.lit(0)).alias(alias)
    )
    if not single:
        agg = _on_scaffold(df, agg, cells, time, freq, {alias: 0})
    return agg


def longest_run(
    df: DataFrame, cond: Column, *, freq: str | None = None,
    time: str = "time", cells: Sequence[str] = (),
    order_extra: Sequence[str] = (), resample_before_rl: bool = True,
    alias: str = "longest_run",
) -> DataFrame:
    """Max run length per period (reference run_length.py:338-380)."""
    return rle_statistics(df, cond, "max", 1, freq=freq, time=time,
                          cells=cells, order_extra=order_extra,
                          resample_before_rl=resample_before_rl, alias=alias)


def windowed_run_count(
    df: DataFrame, cond: Column, window: int, *, freq: str | None = None,
    time: str = "time", cells: Sequence[str] = (),
    order_extra: Sequence[str] = (), resample_before_rl: bool = True,
    alias: str = "days",
) -> DataFrame:
    """Total days belonging to runs >= window (reference run_length.py:437-490).

    Period-truncated path: a day is in a qualifying run iff some
    all-``cond`` block of ``window`` rows starts within the previous
    ``window-1`` rows (incl. itself) — forward rolling sum + backward
    rolling max, one sorted pass, and the groupBy inherently emits 0 for
    runless periods (no runs table, no scaffold join).  Runs crossing
    period bounds (``resample_before_rl=False``) keep the runs-table path.
    """
    single = freq is None or resample_before_rl
    if single:
        if freq is not None:
            df = df.withColumn("period", period_start(time, freq))
        part = [*cells] + (["period"] if freq is not None else [])
        wseq = Window.partitionBy(*part).orderBy(
            *_order_cols(time, order_extra))
        fwd = F.sum(cond.cast("boolean").cast("int")).over(
            wseq.rowsBetween(0, window - 1)) == window
        in_run = F.max(fwd.cast("int")).over(
            wseq.rowsBetween(-(window - 1), 0)) == 1
        return df.withColumn("_in", in_run).groupBy(*part).agg(
            F.sum(F.col("_in").cast("long")).alias(alias))
    runs, _ = _stat_runs(df, cond, time, cells, order_extra, freq,
                         resample_before_rl)
    qual = F.when(F.col("run_true") & (F.col("run_length") >= window),
                  F.col("run_length")).otherwise(0)
    agg = _runs_grouped(runs, cells, freq).agg(F.sum(qual).alias(alias))
    return _on_scaffold(df, agg, cells, time, freq, {alias: 0})


def windowed_run_events(
    df: DataFrame, cond: Column, window: int, *, freq: str | None = None,
    time: str = "time", cells: Sequence[str] = (),
    order_extra: Sequence[str] = (), resample_before_rl: bool = True,
    alias: str = "events",
) -> DataFrame:
    """Number of runs >= window (reference run_length.py:381-436).

    Period-truncated path: a qualifying run is counted at its start row —
    ``window`` consecutive hits begin there and the previous row broke
    the run — one sorted pass, no runs table, no scaffold join.
    """
    single = freq is None or resample_before_rl
    if single:
        if freq is not None:
            df = df.withColumn("period", period_start(time, freq))
        part = [*cells] + (["period"] if freq is not None else [])
        wseq = Window.partitionBy(*part).orderBy(
            *_order_cols(time, order_extra))
        c = cond.cast("boolean")
        fwd = F.sum(c.cast("int")).over(
            wseq.rowsBetween(0, window - 1)) == window
        is_start = fwd & ~F.coalesce(F.lag(c).over(wseq), F.lit(False))
        return df.withColumn("_st", is_start).groupBy(*part).agg(
            F.sum(F.col("_st").cast("long")).alias(alias))
    runs, _ = _stat_runs(df, cond, time, cells, order_extra, freq,
                         resample_before_rl)
    agg = _runs_grouped(runs, cells, freq).agg(
        F.sum((F.col("run_true") & (F.col("run_length") >= window))
              .cast("long")).alias(alias)
    )
    return _on_scaffold(df, agg, cells, time, freq, {alias: 0})


def windowed_max_run_sum(
    df: DataFrame, cond: Column, window: int, sum_var: str, *,
    freq: str | None = None, time: str = "time", cells: Sequence[str] = (),
    order_extra: Sequence[str] = (), resample_before_rl: bool = True,
    alias: str = "max_run_sum",
) -> DataFrame:
    """Max over qualifying runs of the within-run sum
    (reference run_length.py:491-542)."""
    runs, single = _stat_runs(df, cond, time, cells, order_extra, freq,
                              resample_before_rl, sum_var=sum_var)
    qual = F.when(F.col("run_true") & (F.col("run_length") >= window),
                  F.col("run_sum"))
    agg = _runs_grouped(runs, cells, freq).agg(
        F.coalesce(F.max(qual), F.lit(0.0)).alias(alias)
    )
    if not single:
        agg = _on_scaffold(df, agg, cells, time, freq, {alias: 0.0})
    return agg


def first_run(
    df: DataFrame, cond: Column, window: int, *, freq: str | None = None,
    time: str = "time", cells: Sequence[str] = (),
    order_extra: Sequence[str] = (), resample_before_rl: bool = True,
    coord: str = "date", alias: str = "first_run",
) -> DataFrame:
    """Start of the first run >= window per period
    (reference ``first_run``/``_boundary_run``, run_length.py:543-692).
    ``coord``: 'date' for the timestamp, 'doy' for day-of-year.

    Period-truncated path: the first qualifying run starts at the
    earliest row with ``window`` consecutive hits — one forward rolling
    sum on one sorted pass, no runs table, no scaffold join."""
    single = freq is None or resample_before_rl
    if single:
        if freq is not None:
            df = df.withColumn("period", period_start(time, freq))
        part = [*cells] + (["period"] if freq is not None else [])
        wseq = Window.partitionBy(*part).orderBy(
            *_order_cols(time, order_extra))
        fwd = F.sum(cond.cast("boolean").cast("int")).over(
            wseq.rowsBetween(0, window - 1)) == window
        out = df.withColumn("_q", fwd).groupBy(*part).agg(
            F.min(F.when(F.col("_q"), F.col(time))).alias("_start"))
    else:
        runs, _ = _stat_runs(df, cond, time, cells, order_extra, freq,
                             resample_before_rl)
        qual = F.when(F.col("run_true") & (F.col("run_length") >= window),
                      F.col("run_start"))
        out = _runs_grouped(runs, cells, freq).agg(
            F.min(qual).alias("_start"))
        out = _on_scaffold(df, out, cells, time, freq)  # NULL = ref NaN
    val = F.dayofyear("_start") if coord == "doy" else F.col("_start")
    return out.withColumn(alias, val).drop("_start")


def last_run(
    df: DataFrame, cond: Column, window: int, *, freq: str | None = None,
    time: str = "time", cells: Sequence[str] = (),
    order_extra: Sequence[str] = (), resample_before_rl: bool = True,
    coord: str = "date", alias: str = "last_run",
) -> DataFrame:
    """Start of the last run >= window per period (run_length.py:693-744).

    Note: like the reference, this returns the *last element* position of
    the final qualifying run when ``coord='date'`` maps to run_end.

    Period-truncated path: the last qualifying run ENDS at the latest row
    preceded by ``window`` consecutive hits (itself included) — one
    backward rolling sum, no runs table, no scaffold join.
    """
    single = freq is None or resample_before_rl
    if single:
        if freq is not None:
            df = df.withColumn("period", period_start(time, freq))
        part = [*cells] + (["period"] if freq is not None else [])
        wseq = Window.partitionBy(*part).orderBy(
            *_order_cols(time, order_extra))
        bwd = F.sum(cond.cast("boolean").cast("int")).over(
            wseq.rowsBetween(-(window - 1), 0)) == window
        out = df.withColumn("_q", bwd).groupBy(*part).agg(
            F.max(F.when(F.col("_q"), F.col(time))).alias("_end"))
    else:
        runs, _ = _stat_runs(df, cond, time, cells, order_extra, freq,
                             resample_before_rl)
        qual = F.when(F.col("run_true") & (F.col("run_length") >= window),
                      F.col("run_end"))
        out = _runs_grouped(runs, cells, freq).agg(
            F.max(qual).alias("_end"))
        out = _on_scaffold(df, out, cells, time, freq)  # NULL = ref NaN
    val = F.dayofyear("_end") if coord == "doy" else F.col("_end")
    return out.withColumn(alias, val).drop("_end")


def run_bounds(
    df: DataFrame, cond: Column, *, time: str = "time",
    cells: Sequence[str] = (), order_extra: Sequence[str] = (),
) -> DataFrame:
    """Start/end of every run (reference run_length.py:745-804)."""
    return runs_table(df, cond, time=time, cells=cells,
                      order_extra=order_extra)


# ---------------------------------------------------------------------------
# Date-constrained run searches (reference run_length.py:1148-1334)
# ---------------------------------------------------------------------------

def _mid_date(time: str, freq: str, mmdd: str) -> Column:
    """First occurrence of the 'MM-DD' day within the row's period
    (reference ``index_of_date``): for anchored periods the calendar day
    may fall in the following civil year."""
    mm, dd = (int(x) for x in mmdd.split("-"))
    per = period_start(time, freq)
    cand = F.make_date(F.year(per), F.lit(mm), F.lit(dd))
    return F.when(cand < F.to_date(per), F.add_months(cand, 12)) \
        .otherwise(cand)


def first_run_after_date(
    df: DataFrame, cond: Column, window: int, *, date: str = "07-01",
    freq: str = "YS", time: str = "time", cells: Sequence[str] = (),
    coord: str = "doy", alias: str = "first_run_after_date",
) -> DataFrame:
    """Start of the first >=window run at or after ``date`` in each period
    (reference run_length.py:1204-1242).  Masking the condition before the
    date reproduces the reference's ``da.where(time >= date)`` — runs in
    progress restart their count at the date."""
    mid = _mid_date(time, freq, date)
    cond2 = cond & (F.to_date(time) >= mid)
    return first_run(df, cond2, window, freq=freq, time=time, cells=cells,
                     coord=coord, alias=alias)


def last_run_before_date(
    df: DataFrame, cond: Column, window: int, *, date: str = "07-01",
    freq: str = "YS", time: str = "time", cells: Sequence[str] = (),
    coord: str = "doy", alias: str = "last_run_before_date",
) -> DataFrame:
    """End of the last >=window run ending at or before ``date``
    (reference run_length.py:1245-1287)."""
    mid = _mid_date(time, freq, date)
    cond2 = cond & (F.to_date(time) <= mid)
    return last_run(df, cond2, window, freq=freq, time=time, cells=cells,
                    coord=coord, alias=alias)


def first_run_before_date(
    df: DataFrame, cond: Column, window: int, *, date: str = "07-01",
    freq: str = "YS", time: str = "time", cells: Sequence[str] = (),
    coord: str = "doy", alias: str = "first_run_before_date",
) -> DataFrame:
    """Start of the first >=window run beginning before ``date``
    (reference run_length.py:1290-1334: rows at/after date+window-1 are
    masked, so the latest possible run starts the day before the date)."""
    mid = _mid_date(time, freq, date)
    cond2 = cond & (F.to_date(time) < F.date_add(mid, window - 1))
    return first_run(df, cond2, window, freq=freq, time=time, cells=cells,
                     coord=coord, alias=alias)


def run_end_after_date(
    df: DataFrame, cond: Column, window: int, *, date: str = "07-01",
    freq: str = "YS", time: str = "time", cells: Sequence[str] = (),
    coord: str = "doy", alias: str = "run_end_after_date",
) -> DataFrame:
    """First index after the end of a run ending after ``date``, provided
    the run began before it (reference run_length.py:1148-1201 —
    growing_season_end's kernel).

    end = start of the first >=window anti-run at/after the date;
    beg = start of the first >=window run before the date;
    if beg exists but no anti-run follows, the period's last timestamp is
    returned; NULL when no run began before the date.

    Both first-run searches are forward-rolling hit tests over the SAME
    (cell, period) sorted pass, so the whole kernel is one window
    operator + one groupBy — one scan, one exchange (previously three
    scans joined)."""
    mid = _mid_date(time, freq, date)
    tcol = F.to_date(time)
    df = df.withColumn("period", period_start(time, freq))
    part = [*cells, "period"]
    wseq = Window.partitionBy(*part).orderBy(F.col(time))
    c_end = ((~cond) & (tcol >= mid)).cast("boolean").cast("int")
    c_beg = (cond & (tcol < mid)).cast("boolean").cast("int")
    fwd_end = F.sum(c_end).over(wseq.rowsBetween(0, window - 1)) == window
    fwd_beg = F.sum(c_beg).over(wseq.rowsBetween(0, window - 1)) == window
    agg = (
        df.withColumn("_qe", fwd_end).withColumn("_qb", fwd_beg)
        .groupBy(*part).agg(
            F.min(F.when(F.col("_qe"), F.col(time))).alias("_end"),
            F.min(F.when(F.col("_qb"), F.col(time))).alias("_beg"),
            F.max(tcol).alias("_last"),
        )
    )
    end_val = F.dayofyear("_end") if coord == "doy" else F.col("_end")
    last_val = F.dayofyear("_last") if coord == "doy" else F.col("_last")
    out = agg.withColumn(
        alias,
        F.when(F.col("_beg").isNull(), F.lit(None))
        .when(F.col("_end").isNull(), last_val)
        .otherwise(end_val),
    )
    return out.drop("_end", "_beg", "_last")


def keep_longest_run(
    df: DataFrame, cond: Column, *, time: str = "time",
    cells: Sequence[str] = (), order_extra: Sequence[str] = (),
) -> DataFrame:
    """Mask keeping only the longest run per cell
    (reference run_length.py:805-843): rank runs by length, keep rank 1."""
    df = with_run_id(df, cond, time=time, cells=cells, order_extra=order_extra)
    wrun = Window.partitionBy(*cells, "_run_id")
    df = df.withColumn(
        "_rl", F.when(F.col("_cond"), F.count(F.lit(1)).over(wrun)).otherwise(0)
    )
    wcell = Window.partitionBy(*cells)
    df = df.withColumn("_maxrl", F.max("_rl").over(wcell))
    # ties: keep the earliest run (min run_id among max-length runs)
    wbest = Window.partitionBy(*cells)
    df = df.withColumn(
        "_best",
        F.min(F.when(F.col("_rl") == F.col("_maxrl"), F.col("_run_id"))).over(wbest),
    )
    out = df.withColumn(
        "kept", F.col("_cond") & (F.col("_run_id") == F.col("_best"))
    )
    return out.drop("_run_id", "_rl", "_maxrl", "_best")


# ---------------------------------------------------------------------------
# Spells (reference generic.py:434-769)
# ---------------------------------------------------------------------------

def spell_mask(
    df: DataFrame,
    var: str | Sequence[str],
    window: int,
    win_reducer: str,
    op: str,
    thresh,
    *,
    time: str = "time",
    cells: Sequence[str] = (),
    order_extra: Sequence[str] = (),
    var_reducer: str = "all",
    weights: Sequence[float] | None = None,
    min_gap: int = 1,
    mask_name: str = "is_spell",
) -> DataFrame:
    """Boolean "day is part of a spell" column (reference generic.py:434-540).

    A spell is any ``window``-day stretch whose ``win_reducer`` (min/max/
    sum/mean) of ``var`` satisfies ``op thresh``; every day covered by a
    qualifying stretch is flagged.  Implemented as the reference's own
    backshift trick: trailing rolling reducer -> compare -> forward-looking
    ``max() OVER (ROWS BETWEEN CURRENT AND window-1 FOLLOWING)``.

    Multi-variable spells (e.g. heat waves on tasmin+tasmax) pass a list of
    vars; ``var_reducer`` 'all'/'any' combines their conditions, and
    ``thresh`` may be a matching list.
    """
    from .generic import compare  # local import to avoid cycle

    variables = [var] if isinstance(var, str) else list(var)
    thresholds = thresh if isinstance(thresh, (list, tuple)) else [thresh] * len(variables)
    wspec = Window.partitionBy(*cells).orderBy(*_order_cols(time, order_extra))
    back = wspec.rowsBetween(-(window - 1), 0)
    fwd = wspec.rowsBetween(0, window - 1)

    conds = []
    for v, th in zip(variables, thresholds):
        if window == 1:  # fast path (reference generic.py:499-505)
            roll = F.col(v)
        elif weights is not None:
            # reference restricts weighted windows to sum/mean
            # (generic.py:520-535); mean divides by the weight total.
            if win_reducer not in ("sum", "mean"):
                raise ValueError(
                    "Weighted spell windows only support win_reducer "
                    f"'sum' or 'mean', got {win_reducer!r}"
                )
            wts = [float(wt) for wt in weights]
            lags = [
                F.lag(F.col(v), i).over(wspec) * F.lit(wt)
                for i, wt in enumerate(reversed(wts))
            ]
            roll = sum(lags[1:], lags[0])
            if win_reducer == "mean":
                roll = roll / F.lit(sum(wts))
        else:
            roll = {"min": F.min, "max": F.max, "sum": F.sum, "mean": F.avg}[
                win_reducer
            ](F.col(v)).over(back)
        cnt = F.count(F.col(v)).over(back)
        hit = compare(roll, op, th) & (cnt >= window)
        conds.append(hit)
    combined = conds[0]
    for c in conds[1:]:
        combined = (combined & c) if var_reducer == "all" else (combined | c)
    # A day is in a spell if any of the next window-1 trailing windows hit.
    in_spell = F.max(combined.cast("int")).over(fwd) == 1
    out = df.withColumn(mask_name, F.coalesce(in_spell, F.lit(False)))
    if min_gap > 1:
        # merge spells separated by gaps shorter than min_gap (reference
        # generic.py:537-538: runs_with_holes(mask, 1, ~mask, min_gap))
        out = runs_with_holes(
            out, F.col(mask_name), 1, ~F.col(mask_name), min_gap,
            time=time, cells=cells, order_extra=order_extra,
            state_name="_gapfilled",
        )
        out = out.drop(mask_name).withColumnRenamed("_gapfilled", mask_name)
        out = out.withColumn(mask_name, F.col(mask_name).cast("boolean"))
    return out


def spell_length_statistics(
    df: DataFrame,
    var: str | Sequence[str],
    window: int,
    win_reducer: str,
    op: str,
    thresh,
    spell_reducer: str,
    freq: str,
    *,
    time: str = "time",
    cells: Sequence[str] = (),
    order_extra: Sequence[str] = (),
    var_reducer: str = "all",
    resample_before_rl: bool = False,
    alias: str = "spell_stat",
    min_window: int = 1,
    min_gap: int = 1,
) -> DataFrame:
    """Period statistics of spell lengths (reference generic.py:543-769,
    covering both the univariate and bivariate forms, incl. min_gap
    merging of spells separated by short breaks)."""
    masked = spell_mask(df, var, window, win_reducer, op, thresh, time=time,
                        cells=cells, order_extra=order_extra,
                        var_reducer=var_reducer, min_gap=min_gap)
    if spell_reducer == "count":
        return windowed_run_events(masked, F.col("is_spell"), min_window,
                                   freq=freq, time=time, cells=cells,
                                   order_extra=order_extra,
                                   resample_before_rl=resample_before_rl,
                                   alias=alias)
    return rle_statistics(masked, F.col("is_spell"), spell_reducer, min_window,
                          freq=freq, time=time, cells=cells,
                          order_extra=order_extra,
                          resample_before_rl=resample_before_rl, alias=alias)


def bivariate_spell_length_statistics(
    df: DataFrame,
    var1: str, thresh1, var2: str, thresh2,
    window: int, win_reducer: str, op: str, spell_reducer: str, freq: str,
    *,
    min_gap: int = 1,
    time: str = "time",
    cells: Sequence[str] = (),
    resample_before_rl: bool = False,
    alias: str = "spell_stat",
) -> DataFrame:
    """Spell statistics where conditions on BOTH variables must hold
    (reference ``bivariate_spell_length_statistics``, generic.py:690-769)
    — the reference's named entry point for the two-variable form of
    :func:`spell_length_statistics` (same kernel, ``var_reducer='all'``)."""
    return spell_length_statistics(
        df, [var1, var2], window, win_reducer, op, [thresh1, thresh2],
        spell_reducer, freq, time=time, cells=cells, var_reducer="all",
        resample_before_rl=resample_before_rl, min_gap=min_gap,
        alias=alias)


# ---------------------------------------------------------------------------
# Start/stop automaton + event tables
# (reference run_length.py:844-890, 1760-1901; generic.py:1740-1804)
# ---------------------------------------------------------------------------

def runs_with_holes(
    df: DataFrame,
    cond_start: Column,
    window_start: int,
    cond_stop: Column,
    window_stop: int,
    *,
    time: str = "time",
    cells: Sequence[str] = (),
    order_extra: Sequence[str] = (),
    partition_extra: Sequence[str] = (),
    state_name: str = "in_event",
) -> DataFrame:
    """Start/stop state machine (reference run_length.py:844-890).

    Mirrors the reference exactly: ``_cumsum_reset(index='first')`` puts the
    *remaining* run length on every row, so a start signal (1) is emitted on
    every row of a ``cond_start`` run whose remaining length >= window_start,
    a stop signal (0) on every row of a ``cond_stop`` run whose remaining
    length >= window_stop, stop wins on ties (``combine_first(stop, start)``),
    and the last signal is carried forward (``ffill``), defaulting to 0.

    Implemented without run-ids: "remaining run length >= w at row t" is
    equivalent to "rows t..t+w-1 all satisfy the condition" (remaining
    >= w puts the next w rows inside the same run; conversely w
    consecutive hits from t imply remaining >= w) — a forward-looking
    rolling sum.  Both signals and the ``last IGNORE NULLS``
    carry-forward ride ONE sorted window pass: single exchange, single
    sort, versus two run-id layers + two per-run-length sorts.
    """
    part = [*cells, *partition_extra]
    order = _order_cols(time, order_extra)
    wspec = Window.partitionBy(*part).orderBy(*order)

    f_start = F.sum(cond_start.cast("boolean").cast("int")).over(
        wspec.rowsBetween(0, window_start - 1)) == window_start
    f_stop = F.sum(cond_stop.cast("boolean").cast("int")).over(
        wspec.rowsBetween(0, window_stop - 1)) == window_stop
    # stop beats start on the same row (reference: stop_positions take
    # precedence via combine_first)
    signal = (
        F.when(f_stop, F.lit(0))
        .when(f_start, F.lit(1))
        .otherwise(F.lit(None).cast("int"))
    )
    df = df.withColumn("_sig", signal)
    carried = F.last("_sig", ignorenulls=True).over(
        wspec.rowsBetween(Window.unboundedPreceding, 0)
    )
    df = df.withColumn(state_name, F.coalesce(carried, F.lit(0)) == 1)
    return df.drop("_sig")


def find_events(
    df: DataFrame,
    cond_start: Column,
    window_start: int,
    *,
    cond_stop: Column | None = None,
    window_stop: int = 1,
    data_var: str | None = None,
    freq: str | None = None,
    time: str = "time",
    cells: Sequence[str] = (),
    order_extra: Sequence[str] = (),
) -> DataFrame:
    """Event table (reference ``find_events``, run_length.py:1760-1901).

    One row per event with ``event_start, event_end, event_length,
    event_effective_length [, event_sum]``.  In relational form the
    reference's padded ``event`` dimension disappears — an event is just a
    row, which is also the representation that scales (no dense padding).

    ``cond_stop`` defaults to ``NOT cond_start`` (hysteresis form used by
    ``thresholded_events``, generic.py:1740-1804).

    With ``freq`` given, the reference resamples *first* and searches events
    within each period independently (events truncate at period bounds) —
    here every window is additionally partitioned by the period column.
    ``event_sum``/``event_effective_length`` only consider steps where the
    start condition holds (reference _find_events, run_length.py:1760-1843).
    """
    stop = cond_stop if cond_stop is not None else ~cond_start
    part_extra: list[str] = []
    if freq is not None:
        df = df.withColumn("period", period_start(time, freq))
        part_extra = ["period"]
    df = runs_with_holes(df, cond_start, window_start, stop, window_stop,
                         time=time, cells=cells, order_extra=order_extra,
                         partition_extra=part_extra)
    df = with_run_id(df, F.col("in_event"), time=time, cells=cells,
                     order_extra=order_extra, partition_extra=part_extra,
                     cond_name="_ev", run_name="_eid")
    ev = df.filter(F.col("_ev")).withColumn("_cs_eff", cond_start)
    aggs = [
        F.min(time).alias("event_start"),
        F.max(time).alias("event_end"),
        F.count(F.lit(1)).alias("event_length"),
        F.sum(F.col("_cs_eff").cast("long")).alias("event_effective_length"),
    ]
    if data_var is not None:
        aggs.append(
            F.sum(F.when(F.col("_cs_eff"), F.col(data_var))).alias("event_sum")
        )
    return ev.groupBy(*cells, *part_extra, "_eid").agg(*aggs).drop("_eid")


def suspicious_run(
    df: DataFrame,
    var: str,
    *,
    window: int = 10,
    op: str | None = None,
    thresh: float | None = None,
    time: str = "time",
    cells: Sequence[str] = (),
    order_extra: Sequence[str] = (),
    alias: str = "suspicious",
) -> DataFrame:
    """Mark rows inside runs of >= window *identical values* (reference
    ``suspicious_run``/``suspicious_run_1d``, run_length.py:1668-1759) —
    the QC primitive behind repeating-value dataflags.

    ``thresh`` (with ``op``, default '>') additionally restricts the flag
    to runs whose repeated value satisfies the comparison.  Output: the
    input rows plus a boolean ``<alias>`` column (same shape as the
    input, like the reference).
    """
    w = Window.partitionBy(*cells).orderBy(*_order_cols(time, order_extra))
    v = F.col(var)
    # null-safe: NULL values form their own runs instead of silently
    # extending the previous one (see with_run_id)
    chg = (~v.eqNullSafe(F.lag(v).over(w))).cast("long")
    df = df.withColumn(
        "_vrid", F.sum(chg).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    length = F.count(F.lit(1)).over(Window.partitionBy(*cells, "_vrid"))
    sus = length >= window
    if thresh is not None:
        from .generic import get_op

        sus = sus & get_op(op or ">")(v, F.lit(float(thresh)))
    return df.withColumn(alias, sus).drop("_vrid")


def season_bounds(
    df: DataFrame,
    cond: Column,
    window: int,
    *,
    mid_doy: int | None = None,
    mid_date: str | None = None,
    time: str = "time",
    cells: Sequence[str] = (),
    order_extra: Sequence[str] = (),
    freq: str = "YS",
) -> DataFrame:
    """Season start/end/length (reference run_length.py:891-1147).

    Start = first >=window run of ``cond`` per year; end = first >=window
    run of ``NOT cond`` beginning at-or-after the mid point — either a
    scalar ``mid_doy`` or a calendar ``mid_date`` 'MM-DD' string (the
    reference's DayOfYearStr form, anchored-period aware); length = days
    between (end exclusive).  Returns one row per (cell, period) with
    ``season_start, season_end, season_length`` (dates may be NULL when no
    qualifying run exists — same as the reference's NaN).

    Single-pass plan: the *first* >=window run starts at the earliest row
    from which ``window`` consecutive rows all satisfy the condition — a
    forward-looking rolling sum, no run-id assignment needed.  And because
    the mid-point filter keeps a *contiguous tail* of each period, the
    end-side anti-runs are exactly the runs of ``NOT cond AND late`` over
    the unfiltered stream.  Both tests ride ONE sorted window pass and the
    final groupBy reuses the same (cells, period) clustering — one
    exchange total, versus two ``first_run`` pipelines joined (which also
    scanned the source twice).
    """
    if mid_date is not None:
        late = F.to_date(time) >= _mid_date(time, freq, mid_date)
    elif mid_doy is not None:
        late = F.dayofyear(time) >= mid_doy
    else:
        raise ValueError("One of mid_doy or mid_date is required")

    df = df.withColumn("period", period_start(time, freq))
    part = [*cells, "period"]
    wseq = (
        Window.partitionBy(*part)
        .orderBy(*_order_cols(time, order_extra))
        .rowsBetween(0, window - 1)
    )
    c1 = cond.cast("boolean")
    c2 = (~c1) & late
    # NULL cond contributes nothing to the sum, so NaN breaks runs like
    # the reference; a short period tail can never reach `window` either.
    q1 = F.sum(c1.cast("int")).over(wseq) == window
    q2 = F.sum(c2.cast("int")).over(wseq) == window
    out = (
        df.withColumn("_q1", q1).withColumn("_q2", q2)
        .groupBy(*part).agg(
            F.min(F.when(F.col("_q1"), F.col(time))).alias("season_start"),
            F.min(F.when(F.col("_q2"), F.col(time))).alias("season_end"),
        )
    )
    length = F.when(
        F.col("season_start").isNotNull(),
        F.when(
            F.col("season_end").isNotNull(),
            F.datediff(F.col("season_end"), F.col("season_start")),
        ).otherwise(
            # season never ends within the year: count to period end
            F.datediff(
                F.add_months(F.col("period"), 12), F.col("season_start")
            )
        ),
    )
    return out.withColumn("season_length", length)
