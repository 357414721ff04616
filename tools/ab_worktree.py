"""Interleaved git-worktree A/B — the host-noise adjudication instrument.

The sf1 bench runs on a shared box whose scheduling noise has repeatedly
mimicked regressions in untouched code (PLANS.md round 11: the r10 code
itself swung 5.84 -> 10.72 s between consecutive idle-gated runs).  The
only measurement that separates CODE from ENVIRONMENT is interleaving
the two revisions on the same box, same data, same harness, alternating
A/B/A/B so any contention window hits both sides equally.

Usage:
    python tools/ab_worktree.py REF_A REF_B query [query ...]
Env:
    SPARK_GRAFT_AB_ROUNDS (default 4)  — A/B pairs to run
    SPARK_GRAFT_AB_REPS   (default 3)  — timed reps per process run
    SPARK_GRAFT_CPUS      (default 32)

Each (ref, query) run is a FRESH subprocess (fresh JVM) executing the
ref's checked-out tree against the shared ``.scratch/sf1`` data, with
one untimed warm rep.  Reports per-ref medians and floors (min) and the
per-round interleaved samples so a contention window is visible in the
artifact rather than averaged away.

Worktrees land in ``.scratch/ab/<sanitized-ref>`` (gitignored) and are
reused across invocations; ``git worktree add`` is only run when the
directory is missing.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1_DIR = os.path.join(REPO, ".scratch", "sf1")
AB_DIR = os.path.join(REPO, ".scratch", "ab")

RUNNER = r"""
import json, os, sys, time, gc
tree = sys.argv[1]
sf_dir = sys.argv[2]
queries = sys.argv[3].split(",")
reps = int(sys.argv[4])
cpus = int(sys.argv[5])
sys.path.insert(0, tree)
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
spark = (SparkSession.builder.master(f"local[{cpus}]")
         .config("spark.sql.shuffle.partitions", cpus)
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "48g"))
         .config("spark.ui.enabled", "false")
         .config("spark.ui.showConsoleProgress", "false")
         .appName("xclim-spark-ab").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from xclim_spark.queries import build_queries
qs = build_queries()
# warm: JVM, parquet footers, one Python-worker pool spin-up
qs["tg_mean_ms"](spark, sf_dir).count()
spark.range(cpus * 4).withColumn("g", F.col("id") % cpus) \
    .repartition(cpus, "g").groupBy("g") \
    .applyInPandas(lambda p: p, schema="id long, g long").count()
out = {}
for name in queries:
    samples = []
    for rep in range(reps + 1):
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        spark.catalog.clearCache(); gc.collect()
        if rep > 0:
            samples.append(round(dt, 3))
    out[name] = samples
spark.stop()
print("AB_RESULT " + json.dumps(out))
"""


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def _worktree(ref: str) -> str:
    safe = ref.replace("/", "_")
    path = os.path.join(AB_DIR, safe)
    if not os.path.exists(os.path.join(path, "xclim_spark")):
        os.makedirs(AB_DIR, exist_ok=True)
        subprocess.check_call(
            ["git", "worktree", "add", "--detach", "-f", path, ref],
            cwd=REPO)
    return path


def _run(tree: str, queries: list[str], reps: int, cpus: int) -> dict:
    cmd = [sys.executable, "-c", RUNNER, tree, SF1_DIR,
           ",".join(queries), str(reps), str(cpus)]
    p = subprocess.run(cmd, capture_output=True, text=True, cwd=tree)
    for line in p.stdout.splitlines():
        if line.startswith("AB_RESULT "):
            return json.loads(line[len("AB_RESULT "):])
    raise RuntimeError(
        f"run in {tree} produced no result:\n{p.stdout[-2000:]}\n"
        f"{p.stderr[-2000:]}")


def main(argv: list[str]) -> int:
    if len(argv) < 3:
        log(__doc__)
        return 1
    ref_a, ref_b, queries = argv[0], argv[1], argv[2:]
    rounds = int(os.environ.get("SPARK_GRAFT_AB_ROUNDS", "4"))
    reps = int(os.environ.get("SPARK_GRAFT_AB_REPS", "3"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    if not os.path.exists(os.path.join(SF1_DIR, "lineitem.parquet")):
        subprocess.check_call(
            [sys.executable, os.path.join(REPO, "tools", "make_sf1.py")])

    trees = {ref_a: _worktree(ref_a), ref_b: _worktree(ref_b)}
    result: dict = {"refs": [ref_a, ref_b], "queries": queries,
                    "rounds": [], "loadavg_start": os.getloadavg()[0],
                    "ts": time.strftime("%Y-%m-%dT%H:%M:%S")}
    all_samples: dict[str, dict[str, list[float]]] = {
        q: {ref_a: [], ref_b: []} for q in queries}
    for rnd in range(rounds):
        for ref in (ref_a, ref_b):
            la = os.getloadavg()[0]
            got = _run(trees[ref], queries, reps, cpus)
            for q, samples in got.items():
                all_samples[q][ref].extend(samples)
            result["rounds"].append(
                {"round": rnd, "ref": ref, "loadavg": round(la, 2),
                 "samples": got})
            log(f"round {rnd} {ref}: "
                + " ".join(f"{q}={got[q]}" for q in got))
    result["summary"] = {
        q: {ref: {"median": round(statistics.median(s), 3),
                  "floor": round(min(s), 3)}
            for ref, s in refs.items()}
        for q, refs in all_samples.items()}
    result["loadavg_end"] = os.getloadavg()[0]
    print(json.dumps(result, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
