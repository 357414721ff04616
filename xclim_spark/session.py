"""Recommended SparkSession construction for the engine's workloads.

The library itself never creates sessions (every operator takes the
caller's DataFrames), but deployments keep re-deriving the same config
set, so :func:`session` encodes it once with the 100 TB rationale
attached to each knob.  Everything is an overridable default — an
already-active session is returned untouched (Spark configs are
immutable post-start).

Why these defaults:

* ``spark.sql.adaptive.enabled`` + skew-join: the engine's shuffles key
  on ``(cell[, period])``; real grids are skewed (ocean vs land
  masking, coastal cell density), and AQE's runtime re-plan splits the
  hot partitions without manual salting.
* ``spark.sql.adaptive.coalescePartitions.parallelismFirst=true``: the
  pandas tiers (stats/fire/agro) are CPU-bound on byte-tiny shuffles;
  parallelism-first stops byte-based coalescing from serializing them
  (the query paths additionally use ``util.repartition_for_apply``,
  which is exempt from coalescing altogether).
* ``spark.sql.files.maxPartitionBytes=128m``: daily-grain climate
  parquet compresses ~5-10x; 128 MiB of input decompresses to well
  under executor task memory even with the engine's widest operator
  (the doy-window percentile explode, x5 rows).
* ``spark.sql.shuffle.partitions``: default to 2x total cores when not
  on a real cluster manager; at cluster scale leave AQE to coalesce
  from a deliberately high initial count.
* Arrow execution on: every pandas tier moves through Arrow batches
  (``spark.sql.execution.arrow.pyspark.enabled``); the per-batch cap
  bounds UDF peak memory against wide cells.
* ``spark.sql.parquet.aggregatePushdown``: count/min/max push to
  parquet footers — the dataset-statistics paths (datachecks, missing
  masks' probe queries) read no row data at all.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

__all__ = ["session", "RECOMMENDED"]

RECOMMENDED: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.parallelismFirst": "true",
    "spark.sql.files.maxPartitionBytes": "134217728",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    "spark.sql.parquet.aggregatePushdown": "true",
    "spark.sql.session.timeZone": "UTC",
}


def session(
    app: str = "xclim_spark",
    master: str | None = None,
    **overrides: str,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's recommended
    configuration (see module docstring for the per-knob rationale).

    ``overrides`` win over :data:`RECOMMENDED` and must be Spark conf
    keys (``spark.*``) — anything else raises, so a mistyped kwarg
    (e.g. ``app_name=`` instead of ``app=``) fails loudly instead of
    being swallowed as a bogus conf entry.  An already-active session
    is returned as-is (Spark configs are immutable post-start — this
    helper never mutates a running session behind the caller's back)."""
    bad = [k for k in overrides if not k.startswith("spark.")]
    if bad:
        raise TypeError(
            f"session() override keys must be Spark conf keys "
            f"('spark.*'); got {bad!r} — did you mean app=/master=?")
    active = SparkSession.getActiveSession()
    if active is not None:
        return active
    b = SparkSession.builder.appName(app)
    if master:
        b = b.master(master)
    conf = dict(RECOMMENDED)
    if master and master.startswith("local"):
        import os

        cores = os.cpu_count() or 8
        conf.setdefault("spark.sql.shuffle.partitions", str(2 * cores))
    conf.update(overrides)
    for k, v in conf.items():
        b = b.config(k, v)
    return b.getOrCreate()
