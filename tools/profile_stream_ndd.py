"""Attribute stream_dedup_fuzzy's sf1 wall-clock (verdict r12 ask #7).

Runs the same staged 4-file corpus replay as the gate under several
configurations and breaks the time down with Structured Streaming's
progress metrics (``triggerExecution`` = whole micro-batch,
``addBatch`` = plan execution incl. the Arrow prep + state work,
``stateOperators[].commitTimeMs`` = state-store commit), plus a
batch-mode run of JUST the prep stage (shingle/MinHash/band
``mapInPandas``) over the same rows to separate hashing cost from
streaming machinery.

Variants: maxFilesPerTrigger in {1 (gate), 2, 4} x num_blocks in
{32, 64 (default at 32 cores), 128}.

Usage: python tools/profile_stream_ndd.py [sf_dir]   (default .scratch/sf1)
Output: one JSON document on stdout; paste the table into PLANS.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import uuid

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv) -> int:
    sf_dir = argv[0] if argv else os.path.join(REPO, ".scratch", "sf1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .config("spark.sql.shuffle.partitions", cpus)
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory",
                     os.environ.get("SPARK_GRAFT_MEM", "48g"))
             .config("spark.ui.enabled", "false")
             .config("spark.ui.showConsoleProgress", "false")
             .appName("profile-stream-ndd").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from xclim_spark.queries import (_sf_of, _stage_stream_docs,
                                     _stream_state_partitions)
    from xclim_spark.streaming.dedup import streaming_near_dedup

    root = _stage_stream_docs(sf_dir)
    small = _sf_of(sf_dir) <= 0.01
    num_perm = 32 if small else 128
    bands = 16 if small else 64

    out: dict = {"sf_dir": sf_dir, "cpus": cpus,
                 "loadavg": os.getloadavg()[0],
                 "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
                 "variants": []}

    # --- prep-only floor: the same Arrow hashing pass, batch mode ----
    bdf = (spark.read
           .schema("doc_id BIGINT, ts TIMESTAMP, text STRING")
           .parquet(f"{root}/part_*.parquet"))
    # equivalent-work probe for the Arrow prep stage: the same
    # tokenize -> unique crc32 grams -> MinHash math as _prep
    # (streaming/dedup.py), batch mode, no state machinery
    from xclim_spark.llm.dedup import _MERSENNE31, _perm_coeffs, _ws_tokens
    import numpy as np
    import pandas as pd

    coeffs = _perm_coeffs(num_perm, 7)
    A = np.array([c[0] for c in coeffs], dtype=np.int64)
    Bc = np.array([c[1] for c in coeffs], dtype=np.int64)

    def _prep_equiv(it):
        import zlib
        for pdf in it:
            sigs = []
            for t in pdf["text"]:
                w = _ws_tokens(t) if t is not None else []
                if len(w) < 3:
                    sigs.append(0)
                    continue
                grams = {" ".join(w[j:j + 3]) for j in range(len(w) - 2)}
                u = np.unique(np.fromiter(
                    (zlib.crc32(g.encode()) for g in grams),
                    dtype=np.int64) % _MERSENNE31)
                sig = ((u[:, None] * A[None, :] + Bc[None, :])
                       % _MERSENNE31).min(axis=0)
                sigs.append(int(sig.sum()))
            yield pd.DataFrame({"s": sigs})

    for rep in range(3):
        t0 = time.time()
        bdf.repartition(cpus).mapInPandas(_prep_equiv, "s long").count()
        dt = time.time() - t0
        out.setdefault("prep_batch_equiv_s", []).append(round(dt, 2))

    def run(mfpt: int, num_blocks: int) -> dict:
        sdf = (spark.readStream
               .schema("doc_id BIGINT, ts TIMESTAMP, text STRING")
               .option("maxFilesPerTrigger", mfpt)
               .parquet(f"{root}/part_*.parquet"))
        res = streaming_near_dedup(
            sdf, delay="3650 days", threshold=0.6,
            num_perm=num_perm, bands=bands, num_blocks=num_blocks)
        fold_dir = f"/tmp/xclim_profile_ndd_{uuid.uuid4().hex}"
        os.makedirs(fold_dir, exist_ok=True)

        def _fold(batch_df, bid):
            (batch_df.groupBy("doc_id")
             .agg(F.min("dup_of").alias("dup_of"))
             .write.mode("overwrite").parquet(f"{fold_dir}/b{bid}"))

        t0 = time.time()
        try:
            with _stream_state_partitions(spark):
                q = (res.writeStream.foreachBatch(_fold)
                     .trigger(availableNow=True).start())
                q.awaitTermination()
                prog = [json.loads(p.json) for p in q.recentProgress]
        finally:
            shutil.rmtree(fold_dir, ignore_errors=True)
        wall = round(time.time() - t0, 2)
        batches = []
        for p in prog:
            dur = p.get("durationMs", {})
            st = (p.get("stateOperators") or [{}])[0]
            batches.append({
                "rows": p.get("numInputRows"),
                "triggerExecution_ms": dur.get("triggerExecution"),
                "addBatch_ms": dur.get("addBatch"),
                "getBatch_ms": dur.get("getBatch"),
                "walCommit_ms": dur.get("walCommit"),
                "stateCommit_ms": st.get("commitTimeMs"),
                "stateRows": st.get("numRowsTotal"),
                "stateMemory": st.get("memoryUsedBytes"),
            })
        return {"maxFilesPerTrigger": mfpt, "num_blocks": num_blocks,
                "wall_s": wall, "batches": batches}

    for mfpt in (1, 2, 4):
        for nb in (32, 64, 128):
            if mfpt != 1 and nb != 64:
                continue  # sweep blocks at the gate trigger only
            r = run(mfpt, nb)
            out["variants"].append(r)
            print(f"mfpt={mfpt} blocks={nb}: {r['wall_s']}s",
                  file=sys.stderr, flush=True)

    spark.stop()
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
