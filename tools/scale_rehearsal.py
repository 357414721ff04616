"""Three-point scale rehearsal — the "would it survive 100x?" artifact.

Runs a representative set of scale-critical operators at sf0.1 (the
driver bench scale), sf1 (10x, ``tools/make_sf1.py``), and sf10 (100x,
``tools/make_sf1.py 100 sf10``) on the same local[32] harness and
reports per-query wall-clock plus the sf1 -> sf10 scaling ratio.  Data
grows exactly 10x between the upper points, so a ratio near (or below)
10 is linear-or-better scaling; a ratio well above 10 exposes the
super-linear failure modes this engine is designed to avoid
(all-pairs joins, skewed keys, driver collects, plan-size blowups).

Ratios below 10 are common at these absolute sizes — fixed overheads
(JVM, planning, Python worker pools) amortize with scale — which is
exactly the property a 100 TB deployment relies on.

Writes ``SCALE_r{N}.json`` at the repo root (committed: it is the
evidence the per-round scale claims point at).

Usage:  python tools/scale_rehearsal.py [query ...]
Env:    SPARK_GRAFT_CPUS (32), SPARK_GRAFT_SCALE_REPS (2),
        SPARK_GRAFT_ROUND (inferred like bench_sf1.py)
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SCRATCH = os.path.join(REPO, ".scratch")
POINTS = [
    ("sf0.1", "/root/testdata/sf0.1"),
    ("sf1", os.path.join(SCRATCH, "sf1")),
    ("sf10", os.path.join(SCRATCH, "sf10")),
]

# one representative per scale-critical family: core resample agg,
# rolling window, run-length sessionization, stateful Arrow kernel,
# exact + MinHash dedup, Bloom probe, BPE training, BM25, LM
# perplexity, Gopher quality, IVF-PQ ANN
DEFAULT = [
    "tg_mean_ms", "rx7day_ms", "spell_days_ys", "fwi_max_ys",
    "dedup_exact", "dedup_fuzzy", "dedup_bloom_probe",
    "tokenizer_bpe_train", "search_bm25_docs", "text_lm_perplexity",
    "text_gopher_flags", "knn_ivfpq_docs",
]


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def _round_label() -> str:
    env = os.environ.get("SPARK_GRAFT_ROUND")
    if env:
        return env if env.startswith("r") else f"r{env}"
    rounds = [int(os.path.basename(p)[len("CORRECTNESS_r"):-len(".json")])
              for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))]
    return f"r{(max(rounds) + 1) if rounds else 1:02d}"


def main(argv) -> int:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("SPARK_GRAFT_SCALE_REPS", "2"))
    queries = argv or DEFAULT

    if not os.path.exists(os.path.join(SCRATCH, "sf1",
                                       "lineitem.parquet")):
        subprocess.check_call(
            [sys.executable, os.path.join(REPO, "tools", "make_sf1.py")])
    if not os.path.exists(os.path.join(SCRATCH, "sf10",
                                       "lineitem.parquet")):
        log("building .scratch/sf10 (100 reps of sf0.1) ...")
        subprocess.check_call(
            [sys.executable, os.path.join(REPO, "tools", "make_sf1.py"),
             "100", "sf10"])

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .appName("xclim-spark-scale-rehearsal")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from xclim_spark.queries import build_queries

    qs = build_queries()
    # warm JVM + Python worker pool once (not billed to any point)
    qs["tg_mean_ms"](spark, POINTS[0][1]).count()
    spark.range(cpus * 4).withColumn("g", F.col("id") % cpus) \
        .repartition(cpus, "g").groupBy("g") \
        .applyInPandas(lambda p: p, schema="id long, g long").count()

    import gc

    results: dict[str, dict] = {}
    la0 = os.getloadavg()[0]
    for name in queries:
        row: dict = {}
        for label, sf_dir in POINTS:
            samples = []
            try:
                for _ in range(reps):
                    t0 = time.time()
                    qs[name](spark, sf_dir).write.format("noop") \
                        .mode("overwrite").save()
                    samples.append(time.time() - t0)
                    spark.catalog.clearCache()
                    gc.collect()
            except Exception as exc:
                row[label] = f"ERROR {type(exc).__name__}"[:80]
                log(f"{name}@{label}: {row[label]}")
                continue
            row[label] = round(min(samples), 2)
        if isinstance(row.get("sf1"), float) \
                and isinstance(row.get("sf10"), float) and row["sf1"]:
            row["x10"] = round(row["sf10"] / row["sf1"], 2)
        results[name] = row
        log(f"{name}: " + "  ".join(
            f"{k}={v}" for k, v in row.items()))
    spark.stop()

    label = _round_label()
    out = os.path.join(REPO, f"SCALE_{label}.json")
    prior = {}
    if os.path.exists(out):
        with open(out) as fh:
            prior = json.load(fh).get("queries", {})
    prior.update(results)
    results = prior
    art = {
        "instrument": "tools/scale_rehearsal.py",
        "points": {k: "10x replicated keys per step" for k, _ in POINTS},
        "cpus": cpus, "reps": reps, "loadavg_start": round(la0, 2),
        "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "note": ("x10 = sf10/sf1 wall ratio for a 10x data step; "
                 "<= ~10 is linear-or-better, >> 10 is the "
                 "super-linear red flag"),
        "queries": results,
    }
    with open(out, "w") as fh:
        json.dump(art, fh, indent=1, sort_keys=True)
    log(f"wrote {out}")
    print(json.dumps({"metric": "scale_rehearsal",
                      "round": label,
                      "n": len(results)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
