"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line with per-query wall-clock seconds.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        # AQE coalescing sizes partitions by BYTES; climate workloads are
        # compute-dense on byte-tiny numeric shuffles (a 600k-row daily
        # series compresses to ~400 kB), so the default 1 MB floor — and
        # even 64 kB, measured — serializes polynomial/pandas stages onto
        # a handful of tasks. A 1 kB floor makes parallelismFirst fully
        # effective (target = bytes/cores) without touching large
        # shuffles, which hit the advisory-size path regardless.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
                "1kb")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .appName("xclim-spark-bench")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from xclim_spark.queries import build_queries

    qs = build_queries()
    # warm the JVM + parquet footers once with the flagship query
    qs["tg_mean_ms"](spark, sf_dir).count()
    # warm the Python UDF workers + Arrow serializers once: the first
    # pandas stage of a session pays worker fork/import (~5-10 s on 32
    # cores) that would otherwise be billed to one unlucky query
    from pyspark.sql import functions as F
    spark.range(int(cpus) * 4).withColumn(
        "g", F.col("id") % int(cpus)
    ).repartition(int(cpus), "g").groupBy("g").applyInPandas(
        lambda p: p, schema="id long, g long").count()

    timings: dict[str, float] = {}
    t_all0 = time.time()
    for name, fn in qs.items():
        t0 = time.time()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
        # queries that persist intermediates (dedup digests, smoothed
        # members) must not bill their cached blocks to later queries
        spark.catalog.clearCache()
    total = round(time.time() - t_all0, 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(json.dumps({
        "metric": "total_query_wall_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf else None,
        "n_queries": len(timings),
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
