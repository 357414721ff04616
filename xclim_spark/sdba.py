"""Bias adjustment (statistical post-processing) tier.

The reference delegates this surface to the split-out ``xsdba`` package
(reference src/xclim/sdba.py — a compatibility shim); the algorithms
themselves are published: empirical quantile mapping and its detrended /
quantile-delta variants (Cannon et al. 2015, J. Climate 28;
Themeßl et al. 2012), and mean scaling.  This module re-derives them
Spark-first:

* ``train`` is one aggregation per (cells..., group) producing an
  ADJUSTMENT TABLE — arrays of the historical quantiles and the
  per-quantile adjustment factors.  Exact type-7 quantiles via the
  repo's Hyndman-Fan expression aggregate (no UDF, no approximation).
* ``adjust`` joins the simulation to its (cells, group) row of the
  adjustment table — a co-keyed shuffle (broadcast when the table is
  dim-sized) — and interpolates the factor with pure Column
  expressions over the nq-sized arrays.  Nothing leaves the JVM.

Grouping supports ``"time"`` (one group per cell) and ``"time.month"``
(the reference's most common choice for removing seasonal bias).
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .operators.percentile import hf_interp_sorted

__all__ = [
    "Grouper",
    "properties",
    "measures",
    "EmpiricalQuantileMapping",
    "DetrendedQuantileMapping",
    "QuantileDeltaMapping",
    "Scaling",
    "LOCI",
    "equally_spaced_nodes",
    "jitter_under_thresh",
    "adapt_freq",
]


def equally_spaced_nodes(n: int) -> list[float]:
    """``n`` quantile nodes at the midpoints ``(k + 0.5) / n`` — every
    node estimable from data, constant extrapolation beyond the ends
    (the published EQM discretization choice)."""
    return [(k + 0.5) / n for k in range(n)]


@dataclass(frozen=True)
class Grouper:
    """Temporal grouping for adjustment factors: ``"time"`` (everything
    in one group) or ``"time.month"``."""

    name: str = "time"

    def key(self, time) -> Column:
        t = F.col(time) if isinstance(time, str) else time
        if self.name == "time":
            return F.lit(0)
        if self.name == "time.month":
            return F.month(t)
        raise ValueError(f"Unsupported group {self.name!r}")


def _interp_at(xs: str, ys: str, x: Column) -> Column:
    """Piecewise-linear interpolation of the (xs, ys) node arrays at
    ``x``, constant beyond the ends — pure expressions over nq-sized
    arrays (same shape the weighted-percentile path uses)."""
    i = F.size(F.filter(F.col(xs), lambda e: e <= x))
    n = F.size(F.col(xs))
    lo = F.element_at(F.col(xs), i)
    hi = F.element_at(F.col(xs), F.least(i + 1, n))
    ylo = F.element_at(F.col(ys), i)
    yhi = F.element_at(F.col(ys), F.least(i + 1, n))
    mid = F.when(
        hi == lo, ylo
    ).otherwise(ylo + (x - lo) / (hi - lo) * (yhi - ylo))
    return (
        F.when(i == 0, F.element_at(F.col(ys), 1))
        .when(i >= n, F.element_at(F.col(ys), -1))
        .otherwise(mid)
    )


class EmpiricalQuantileMapping:
    """EQM (Themeßl 2012; reference xsdba ``EmpiricalQuantileMapping``):
    adjustment factors between the reference and historical-simulation
    quantiles, applied to the simulated value's position in the
    TRAINING distribution.

    ``kind``: ``"+"`` (additive, temperatures) or ``"*"``
    (multiplicative, precipitation-like, hist quantiles clamped away
    from zero).
    """

    def __init__(self, *, nquantiles: int = 20, kind: str = "+",
                 group: str | Grouper = "time"):
        if kind not in ("+", "*"):
            raise ValueError("kind must be '+' or '*'")
        self.nq = int(nquantiles)
        self.kind = kind
        self.group = group if isinstance(group, Grouper) else Grouper(group)
        self.trained: DataFrame | None = None

    # -- training --------------------------------------------------------
    def train(
        self, ref: DataFrame, hist: DataFrame, var: str, *,
        time: str = "time", cells: Sequence[str] = (),
    ) -> DataFrame:
        """One aggregation per input per (cells, group): nq exact HF
        type-7 quantiles of each; factors ``ref_q - hist_q`` (or ratio).
        Returns (and stores) the adjustment table
        ``cells..., _grp, hist_q, af``."""
        qs = equally_spaced_nodes(self.nq)

        def quantiles(df: DataFrame, alias: str) -> DataFrame:
            # ONE sorted collect per group; the nq node quantiles are
            # then O(1) interpolations over that array — nq separate
            # quantile aggregates would sort the same group nq times
            g = df.withColumn("_grp", self.group.key(time))
            out = g.groupBy(*cells, "_grp").agg(
                F.sort_array(F.collect_list(F.col(var).cast("double")))
                .alias("_xs"))
            return out.select(
                *cells, "_grp",
                F.array(*[
                    hf_interp_sorted(F.col("_xs"), p, alpha=1.0, beta=1.0)
                    for p in qs
                ]).alias(alias))

        r = quantiles(ref, "_rq")
        h = quantiles(hist, "hist_q")
        j = r.join(h, on=[*cells, "_grp"])
        if self.kind == "+":
            af = F.zip_with("_rq", "hist_q", lambda a, b: a - b)
        else:
            af = F.zip_with("_rq", "hist_q", lambda a, b: a / b)
        self.trained = j.select(*cells, "_grp", "hist_q",
                                af.alias("af"))
        return self.trained

    # -- adjustment ------------------------------------------------------
    def adjust(
        self, sim: DataFrame, var: str, *,
        time: str = "time", cells: Sequence[str] = (),
        alias: str | None = None, broadcast: bool = False,
    ) -> DataFrame:
        """Join the adjustment table on (cells, group) and interpolate
        the factor at the simulated value's position among the TRAINED
        historical quantiles (linear between nodes, constant beyond —
        the reference's interp='linear', extrapolation='constant').

        ``broadcast=True`` broadcasts the table (cells x groups rows —
        dim-sized for modest grids); default lets AQE decide."""
        if self.trained is None:
            raise ValueError("call train() first")
        tbl = F.broadcast(self.trained) if broadcast else self.trained
        out_col = alias or f"{var}_adj"
        s = sim.withColumn("_grp", self.group.key(time))
        j = s.join(tbl, on=[*cells, "_grp"], how="left")
        x = F.col(var).cast("double")
        a = _interp_at("hist_q", "af", x)
        adj = x + a if self.kind == "+" else x * a
        return j.withColumn(out_col, adj).drop("_grp", "hist_q", "af")


class QuantileDeltaMapping(EmpiricalQuantileMapping):
    """QDM (Cannon 2015): the factor is taken at the simulated value's
    rank within the SIMULATION's own distribution (preserving the
    simulated change signal in all quantiles), not at its position in
    the training distribution."""

    def adjust(
        self, sim: DataFrame, var: str, *,
        time: str = "time", cells: Sequence[str] = (),
        alias: str | None = None, broadcast: bool = False,
    ) -> DataFrame:
        if self.trained is None:
            raise ValueError("call train() first")
        qs = equally_spaced_nodes(self.nq)
        out_col = alias or f"{var}_adj"
        s = sim.withColumn("_grp", self.group.key(time))
        sim_q = s.groupBy(*cells, "_grp").agg(
            F.sort_array(F.collect_list(F.col(var).cast("double")))
            .alias("_xs")
        ).select(
            *cells, "_grp",
            F.array(*[
                hf_interp_sorted(F.col("_xs"), p, alpha=1.0, beta=1.0)
                for p in qs
            ]).alias("sim_q"))
        tbl = self.trained.join(sim_q, on=[*cells, "_grp"])
        tbl = F.broadcast(tbl) if broadcast else tbl
        j = s.join(tbl, on=[*cells, "_grp"], how="left")
        x = F.col(var).cast("double")
        # rank of x among the sim quantile nodes -> af at that rank
        nodes = F.lit(qs)
        rank = _interp_at("sim_q", "_nodes_arr", x)
        j = j.withColumn("_nodes_arr", nodes)
        # af as a function of quantile node, evaluated at `rank`
        j = j.withColumn("_rank", rank)
        a = _interp_at("_nodes_arr", "af", F.col("_rank"))
        adj = x + a if self.kind == "+" else x * a
        return j.withColumn(out_col, adj) \
            .drop("_grp", "hist_q", "af", "sim_q", "_nodes_arr", "_rank")


class DetrendedQuantileMapping(EmpiricalQuantileMapping):
    """DQM (Cannon et al. 2015, eq. 2): standard EQM factors trained on
    the raw calibration data, but at adjustment the simulation is first
    brought back to the calibration epoch — its per-(cells, group)
    linear trend removed and the historical mean reinstated — mapped,
    and the trend restored.  The simulated long-term trend thereby
    passes through the mapping unchanged instead of being squashed onto
    the calibration distribution's range.

    Additive:       x' = x - trend(t) + mu_hist;  out = EQM(x')
                    + trend(t) - mu_hist
    Multiplicative: x' = x * mu_hist / trend(t);  out = EQM(x')
                    * trend(t) / mu_hist

    The linear detrend is the repo's closed-form OLS window (one
    shuffle on the cell key, no UDF)."""

    def train(self, ref: DataFrame, hist: DataFrame, var: str, *,
              time: str = "time", cells: Sequence[str] = ()) -> DataFrame:
        out = super().train(ref, hist, var, time=time, cells=cells)
        mean_h = hist.withColumn("_grp", self.group.key(time)) \
            .groupBy(*cells, "_grp").agg(F.avg(var).alias("_mh"))
        self.trained = out.join(mean_h, on=[*cells, "_grp"])
        return self.trained

    def adjust(self, sim: DataFrame, var: str, *,
               time: str = "time", cells: Sequence[str] = (),
               alias: str | None = None, broadcast: bool = False
               ) -> DataFrame:
        from .operators.generic import detrend

        if self.trained is None:
            raise ValueError("call train() first")
        out_col = alias or f"{var}_adj"
        det = detrend(sim, var, time=time, cells=cells, alias="_anom")
        det = det.withColumn("_trend",
                             F.col(var).cast("double") - F.col("_anom"))
        tbl = F.broadcast(self.trained) if broadcast else self.trained
        s = det.withColumn("_grp", self.group.key(time))
        j = s.join(tbl, on=[*cells, "_grp"], how="left")
        if self.kind == "+":
            xprime = F.col("_anom") + F.col("_mh")
        else:
            xprime = (F.col(var).cast("double") * F.col("_mh")
                      / F.col("_trend"))
        j = j.withColumn("_x", xprime)
        a = _interp_at("hist_q", "af", F.col("_x"))
        if self.kind == "+":
            adj = (F.col("_x") + a) + F.col("_trend") - F.col("_mh")
        else:
            adj = (F.col("_x") * a) * F.col("_trend") / F.col("_mh")
        return j.withColumn(out_col, adj).drop(
            "_grp", "hist_q", "af", "_anom", "_trend", "_x", "_mh")


class Scaling:
    """Mean scaling (reference xsdba ``Scaling``): one additive or
    multiplicative factor per (cells, group) from the ref/hist means."""

    def __init__(self, *, kind: str = "+", group: str | Grouper = "time"):
        if kind not in ("+", "*"):
            raise ValueError("kind must be '+' or '*'")
        self.kind = kind
        self.group = group if isinstance(group, Grouper) else Grouper(group)
        self.trained: DataFrame | None = None

    def train(self, ref: DataFrame, hist: DataFrame, var: str, *,
              time: str = "time", cells: Sequence[str] = ()) -> DataFrame:
        r = ref.withColumn("_grp", self.group.key(time)) \
            .groupBy(*cells, "_grp").agg(F.avg(var).alias("_mr"))
        h = hist.withColumn("_grp", self.group.key(time)) \
            .groupBy(*cells, "_grp").agg(F.avg(var).alias("_mh"))
        j = r.join(h, on=[*cells, "_grp"])
        af = (F.col("_mr") - F.col("_mh")) if self.kind == "+" \
            else (F.col("_mr") / F.col("_mh"))
        self.trained = j.select(*cells, "_grp", af.alias("af"))
        return self.trained

    def adjust(self, sim: DataFrame, var: str, *,
               time: str = "time", cells: Sequence[str] = (),
               alias: str | None = None, broadcast: bool = True
               ) -> DataFrame:
        if self.trained is None:
            raise ValueError("call train() first")
        out_col = alias or f"{var}_adj"
        tbl = F.broadcast(self.trained) if broadcast else self.trained
        s = sim.withColumn("_grp", self.group.key(time))
        j = s.join(tbl, on=[*cells, "_grp"], how="left")
        x = F.col(var).cast("double")
        adj = x + F.col("af") if self.kind == "+" else x * F.col("af")
        return j.withColumn(out_col, adj).drop("_grp", "af")


class LOCI:
    """Local intensity scaling for precipitation (Schmidli, Frei &
    Vidale 2006, Int. J. Climatol. 26 — the xsdba ``LOCI`` surface).

    ``train``: per (cells, group), find the historical threshold whose
    exceedance frequency matches the reference's wet-day frequency at
    ``thresh`` (type-7 quantile of hist at the reference dry fraction),
    then the scaling factor ``s = (mean ref wet - thresh) /
    (mean hist above hist_thresh - hist_thresh)``.

    ``adjust``: ``max(thresh + s * (sim - hist_thresh), 0)`` — dry days
    stay dry, wet intensities rescale so the adjusted mean wet-day
    intensity and wet-day frequency both match the reference.

    Same plan shape as EQM: train is one aggregation producing a
    dim-sized factor table; adjust is a co-keyed join + pure
    expressions.
    """

    def __init__(self, *, thresh: float, group: str | Grouper = "time"):
        self.thresh = float(thresh)
        self.group = group if isinstance(group, Grouper) else Grouper(group)
        self.trained: DataFrame | None = None

    def train(
        self, ref: DataFrame, hist: DataFrame, var: str, *,
        time: str = "time", cells: Sequence[str] = (),
    ) -> DataFrame:
        from .operators.percentile import hf_interp_sorted

        t = self.thresh
        keys = [*cells, "grp"]
        v = F.col(var)
        # wet mean via a SORTED sequential fold: bitwise-identical to an
        # independent engine summing the same sorted list (a distributed
        # avg() can differ in the last ulp, which matters when a factor
        # multiplies thousands of rows that then round)
        refa = ref.groupBy(
            *cells, self.group.key(time).alias("grp")
        ).agg(
            F.avg((v < t).cast("double")).alias("_dry_frac"),
            F.array_sort(F.collect_list(F.when(v >= t, v)))
            .alias("_rw"),
        ).withColumn(
            "_ref_wet_mean",
            F.when(
                F.size("_rw") > 0,
                F.aggregate("_rw", F.lit(0.0), lambda a, e: a + e)
                / F.size("_rw"),
            ),
        ).drop("_rw")
        hista = hist.groupBy(
            *cells, self.group.key(time).alias("grp")
        ).agg(F.array_sort(F.collect_list(v)).alias("_hv"))
        j = refa.join(hista, keys)
        # type-7 (alpha=beta=1) quantile of hist at the ref dry fraction
        ht = hf_interp_sorted(F.col("_hv"), F.col("_dry_frac"),
                              alpha=1.0, beta=1.0)
        j = j.withColumn("hist_thresh", ht)
        wet = F.filter(F.col("_hv"), lambda e: e >= F.col("hist_thresh"))
        hist_wet_mean = F.when(
            F.size(wet) > 0,
            F.aggregate(wet, F.lit(0.0), lambda a, e: a + e) / F.size(wet),
        )
        j = j.withColumn(
            "af",
            (F.col("_ref_wet_mean") - F.lit(t))
            / (hist_wet_mean - F.col("hist_thresh")),
        )
        self.trained = j.select(*keys, "hist_thresh", "af")
        return self.trained

    def adjust(
        self, sim: DataFrame, var: str, *,
        time: str = "time", cells: Sequence[str] = (),
    ) -> DataFrame:
        if self.trained is None:
            raise RuntimeError("call train() first")
        keys = [*cells, "grp"]
        s = sim.withColumn("grp", self.group.key(time))
        out = s.join(self.trained, keys)
        adj = F.greatest(
            F.lit(self.thresh)
            + F.col("af") * (F.col(var) - F.col("hist_thresh")),
            F.lit(0.0),
        )
        return out.withColumn(f"{var}_adj", adj).drop(
            "grp", "hist_thresh", "af")


# ---------------------------------------------------------------------------
# Preprocessing: jitter_under_thresh + adapt_freq (published wet-day
# frequency adaptation — Themeßl et al. 2012 "frequency adaptation";
# Cannon et al. 2015 §3; the reference exposes them via xsdba.processing)
# ---------------------------------------------------------------------------

def hash_uniform(cols: Sequence[Column], salt: str) -> Column:
    """Deterministic engine-reproducible U[0, 1) draw per row: the first
    6 hex nibbles of ``md5(col|col|...|salt)`` decoded with plain ascii
    arithmetic (``ascii``/``substring`` behave identically in Spark and
    DuckDB, so the oracle recomputes the identical doubles — same
    pattern as the LLM tier's md5-threshold sampling).  24 bits of
    mantissa; the draw is i.i.d.-uniform in the Random-Oracle sense and
    reproducible across engines, runs, and partitionings — which true
    RNG jitter is not."""
    h = F.md5(F.concat_ws(
        "|", *[c.cast("string") for c in cols], F.lit(salt)))
    val = F.lit(0)
    for i in range(1, 7):
        a = F.ascii(F.substring(h, i, 1))
        digit = a - 48 - F.when(a >= 97, F.lit(39)).otherwise(F.lit(0))
        val = val + digit * (16 ** (6 - i))
    return val.cast("double") / float(16 ** 6)


def jitter_under_thresh(
    df: DataFrame, var: str, *, thresh: float, time: str = "time",
    cells: Sequence[str] = (), alias: str | None = None,
    salt: str = "jitter",
) -> DataFrame:
    """Replace values strictly under ``thresh`` with a deterministic
    uniform draw in ``[0, thresh)`` (xsdba ``jitter_under_thresh``):
    breaks the massive rank tie at zero precipitation so rank-based
    algorithms (:func:`adapt_freq`, multiplicative EQM) see a total
    order.  Stateless per-row expression — zero shuffle."""
    out_col = alias or var
    u = hash_uniform([F.col(c) for c in cells] + [F.col(time)], salt)
    v = F.col(var).cast("double")
    return df.withColumn(
        out_col, F.when(v < thresh, u * thresh).otherwise(v))


def adapt_freq(
    ref: DataFrame, sim: DataFrame, var: str, *, thresh: float,
    group: str | Grouper = "time", time: str = "time",
    cells: Sequence[str] = (), alias: str | None = None,
) -> DataFrame:
    """Adapt the frequency of values under ``thresh`` in ``sim`` to match
    ``ref`` (xsdba ``adapt_freq``; Themeßl 2012): when the simulation has
    MORE dry days than the reference (``P0_sim > P0_ref``), quantile
    mapping alone cannot create the missing wet days — so the
    smallest-ranked sim values between the two dry fractions become
    drizzle drawn from ``[thresh, pth)``, where ``pth = F_ref^{-1}
    (P0_sim)`` is the reference value at the simulation's dry fraction.

    Per-row decision: with ``pct = rank/n`` of the value within its
    (cells, group), values with ``pct < P0_ref`` stay dry, ``pct >
    P0_sim`` stay untouched, and the band between is replaced by
    ``thresh + u * (pth - thresh)`` with a deterministic
    :func:`hash_uniform` draw (the published algorithm draws true
    uniforms; a seeded hash keeps the operator reproducible across
    engines and partitionings).  If ``P0_sim <= P0_ref`` the group is
    returned unchanged.  Ties above the threshold share a rank and
    therefore a decision, so results don't depend on sort order —
    jitter the input (:func:`jitter_under_thresh`) to break the
    sub-threshold tie first.

    Plan: two dim-sized aggregations (one per input, the ref side
    carrying its sorted per-group sample for the ``pth`` interpolation),
    one dim-table join, a broadcast of the factor table onto ``sim``,
    and ONE rank window on the same (cells, group) key — no other
    shuffle.  Assumes no NULLs in ``var`` (drop them first; nulls would
    shift the rank/count alignment)."""
    from pyspark.sql import Window

    g = group if isinstance(group, Grouper) else Grouper(group)
    out_col = alias or f"{var}_ad"
    v = F.col(var).cast("double")
    dry = (v < thresh).cast("double")

    r = ref.withColumn("_grp", g.key(time)).groupBy(*cells, "_grp").agg(
        F.avg((F.col(var).cast("double") < thresh).cast("double"))
        .alias("_p0_ref"),
        F.sort_array(F.collect_list(F.col(var).cast("double")))
        .alias("_rs"),
    )
    s_stats = sim.withColumn("_grp", g.key(time)) \
        .groupBy(*cells, "_grp").agg(
            F.avg(dry).alias("_p0_sim"), F.count(v).alias("_n"))
    # pth: type-7 (alpha=beta=1) quantile of ref at the per-group P0_sim
    # — hf_interp_sorted takes the probability as a Column
    factors = r.join(s_stats, on=[*cells, "_grp"]).select(
        *cells, "_grp", "_p0_ref", "_p0_sim", "_n",
        hf_interp_sorted(F.col("_rs"), F.col("_p0_sim"),
                         alpha=1.0, beta=1.0).alias("_pth"),
    )
    w = Window.partitionBy(*cells, "_grp").orderBy(v)
    u = hash_uniform(
        [F.col(c) for c in cells] + [F.col(time)], "adapt_freq")
    s = sim.withColumn("_grp", g.key(time)) \
        .join(F.broadcast(factors), on=[*cells, "_grp"]) \
        .withColumn("_pct", F.rank().over(w).cast("double") / F.col("_n"))
    adapted = (
        F.when(F.col("_p0_sim") <= F.col("_p0_ref"), v)
        .when((F.col("_pct") < F.col("_p0_ref"))
              | (F.col("_pct") > F.col("_p0_sim")), v)
        .otherwise(F.lit(thresh) + u * (F.col("_pth") - F.lit(thresh)))
    )
    return s.withColumn(out_col, adapted).drop(
        "_grp", "_p0_ref", "_p0_sim", "_n", "_pth", "_pct")


def properties(
    df: DataFrame, var: str, *, time: str = "time",
    cells: Sequence[str] = (), group: str | Grouper = "time",
    which: Sequence[str] = ("mean", "std", "skewness", "acf1",
                            "trend", "wet_freq"),
    wet_thresh: float = 1.0,
) -> DataFrame:
    """Statistical properties of a climate series, per (cells, group) —
    the xsdba ``properties`` surface used to validate adjustments
    (mean/std/skewness, lag-1 autocorrelation, OLS trend per step,
    wet-day relative frequency).  One aggregation; acf1/trend come from
    sufficient statistics (lag pairs / index covariances), so nothing
    leaves the JVM."""
    from pyspark.sql import Window

    grouper = group if isinstance(group, Grouper) else Grouper(group)
    v = F.col(var)
    w = Window.partitionBy(*cells, grouper.key(time)).orderBy(time)
    d = df.withColumn("_lag", F.lag(v).over(w)).withColumn(
        "_i", F.row_number().over(w).cast("double"))
    aggs = []
    if "mean" in which:
        aggs.append(F.avg(v).alias("mean"))
    if "std" in which:
        aggs.append(F.stddev_samp(v).alias("std"))
    if "skewness" in which:
        aggs.append(F.skewness(v).alias("skewness"))
    if "acf1" in which:
        aggs.append(F.corr(v, F.col("_lag")).alias("acf1"))
    if "trend" in which:
        aggs.append((F.covar_samp(F.col("_i"), v)
                     / F.var_samp(F.col("_i"))).alias("trend"))
    if "wet_freq" in which:
        aggs.append(F.avg((v >= wet_thresh).cast("double"))
                    .alias("wet_freq"))
    return d.groupBy(*cells, grouper.key(time).alias("grp")).agg(*aggs)


def measures(
    sim_props: DataFrame, ref_props: DataFrame, *,
    keys: Sequence[str], stats: Sequence[str],
    kind: str = "+",
) -> DataFrame:
    """Compare simulated vs reference property tables — the xsdba
    ``measures`` surface: per property, ``bias`` (additive kind) or
    ``ratio`` (multiplicative).  A co-keyed join of two dim-sized
    tables."""
    r = ref_props.select(
        *keys, *[F.col(s).alias(f"_ref_{s}") for s in stats])
    j = sim_props.join(r, list(keys))
    for s in stats:
        if kind == "+":
            j = j.withColumn(f"{s}_bias", F.col(s) - F.col(f"_ref_{s}"))
        else:
            j = j.withColumn(f"{s}_ratio", F.col(s) / F.col(f"_ref_{s}"))
        j = j.drop(f"_ref_{s}")
    return j

