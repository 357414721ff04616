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

Stateful-streaming defaults (:data:`STREAMING_RECOMMENDED`, merged by
``session(streaming=True)``):

* ``spark.sql.streaming.stateStore.providerClass`` = RocksDB: the
  default HDFS-backed provider keeps EVERY key's state as
  deserialized JVM-heap objects and rewrites the full state map into
  one snapshot blob per partition per micro-batch — profiled in r13
  as the single-threaded ~20 GB-RSS wall behind the streaming
  near-dedup state hog.  RocksDB keeps state off-heap with
  incremental compaction, so per-batch cost follows the CHANGED
  keys, not total state — at 100 TB the watermark-window state of
  the dedup/session operators is orders of magnitude larger than any
  heap.  The r16 interleaved A/B on the streaming near-dedup gate
  (PLANS.md "state-store provider A/B") measured the two providers
  at PARITY at local rehearsal scale (sf1 medians 113 vs 118 s, sf10
  993 vs 971 s, identical outputs, RocksDB the tighter spread) —
  local state still fits the heap, so the crossover the provider
  exists for is not reachable on one box; the recommendation rests
  on the state≫heap deployment regime and is measured COST-FREE at
  rehearsal scale.
* ``...rocksdb.changelogCheckpointing.enabled``: checkpoint the
  per-batch changelog instead of uploading a full snapshot per batch
  — same changed-keys-not-total-state argument, for the checkpoint
  upload path.
* ``spark.sql.shuffle.partitions`` is ALSO the state-store partition
  count and is frozen into the checkpoint at first start (Spark
  refuses to restart a stateful query under a different count).  Size
  it for the TARGET state, not the first day's: state_bytes /
  partitions must fit an executor's RocksDB working set; the helper's
  2x-cores local default is fine for rehearsal but a 100 TB
  deployment should start high (e.g. 2000) and let AQE coalesce the
  stateless stages around it.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

__all__ = ["session", "RECOMMENDED", "STREAMING_RECOMMENDED"]

#: Extra defaults for stateful Structured Streaming deployments
#: (rationale in the module docstring).  Session-level SQL confs —
#: settable at runtime via ``spark.conf.set`` too, but the provider
#: is read at STREAM START and the partition count is frozen into the
#: checkpoint, so set them before the first ``start()``.
STREAMING_RECOMMENDED: dict[str, str] = {
    "spark.sql.streaming.stateStore.providerClass":
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    "spark.sql.streaming.stateStore.rocksdb."
    "changelogCheckpointing.enabled": "true",
}

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
    *,
    streaming: bool = False,
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
    if streaming:
        conf.update(STREAMING_RECOMMENDED)
    if master and master.startswith("local"):
        import os

        cores = os.cpu_count() or 8
        conf.setdefault("spark.sql.shuffle.partitions", str(2 * cores))
    conf.update(overrides)
    for k, v in conf.items():
        b = b.config(k, v)
    return b.getOrCreate()
