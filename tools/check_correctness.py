"""Local emulation of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at sf0.01, compares row counts, column names, and order-insensitive
values.  Usage:  python tools/check_correctness.py [name ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("CHECK_SF_DIR", "/root/testdata/sf0.01")
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def main(names):
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as e

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64kb")
        .appName("check")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    qs = e.queries()
    os_ = e.oracle_sql()
    sel = names or list(qs)
    n_pass = n_fail = 0
    for name in sel:
        t0 = time.time()
        spark.catalog.clearCache()
        try:
            sdf = qs[name](spark, SF_DIR)
            spark_rows = sdf.collect()
            spark_cols = sorted(sdf.columns)
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {ex}")
            n_fail += 1
            continue
        if name not in os_:
            print(f"OK?  {name}: rows-only ({len(spark_rows)} rows, "
                  f"{time.time()-t0:.1f}s)")
            continue
        try:
            res = con.execute(os_[name])
            duck_cols = sorted(d[0] for d in res.description)
            duck_rows = res.fetchall()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {ex}")
            n_fail += 1
            continue
        ok = True
        msgs = []
        if len(spark_rows) != len(duck_rows):
            ok = False
            msgs.append(f"rowcount spark={len(spark_rows)} duck={len(duck_rows)}")
        if spark_cols != duck_cols:
            ok = False
            msgs.append(f"schema spark={spark_cols} duck={duck_cols}")
        if ok:
            sset = sorted(
                tuple(norm(r[c]) for c in spark_cols) for r in spark_rows
            )
            dmap = {d[0]: i for i, d in enumerate(res.description)}
            dset = sorted(
                tuple(norm(r[dmap[c]]) for c in duck_cols) for r in duck_rows
            )
            if sset != dset:
                ok = False
                diff = [(a, b) for a, b in zip(sset, dset) if a != b][:3]
                msgs.append(f"values differ, first diffs: {diff}")
        if ok:
            print(f"PASS {name} ({len(spark_rows)} rows, {time.time()-t0:.1f}s)")
            n_pass += 1
        else:
            print(f"FAIL {name}: {'; '.join(msgs)}")
            n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail / {len(sel)} run")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
