"""Synthesize the 10x scale-rehearsal dataset (.scratch/sf1, gitignored).

Replicates /root/testdata/sf0.1 ten times with shifted keys so join/group
cardinalities grow 10x while value distributions stay identical:

* lineitem: l_suppkey + 10000*r  (10x cells, same days)
* documents: doc_id + 100000*r   (10x corpus)
* embeddings: vec_id + 10000*r   (10x vectors -> every vector has 10
  exact copies across replicas; embedding-similarity queries therefore
  see real near-dup structure by construction)

Usage: python tools/make_sf1.py [reps] [dst_name]

``dst_name`` (default ``sf1``) lets the scale-rehearsal harness build
``.scratch/sf10`` with ``reps=100`` — a genuine 100x of the driver's
sf0.1 — without duplicating this script.
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
SCRATCH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".scratch")
DST = os.path.join(SCRATCH, "sf1")


def main() -> int:
    global DST
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    if len(sys.argv) > 2:
        DST = os.path.join(SCRATCH, sys.argv[2])
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW r AS SELECT unnest(range({reps})) AS r")
    jobs = {
        "lineitem": ("l_suppkey + 10000 * r.r AS l_suppkey",
                     "* EXCLUDE (l_suppkey)"),
        "documents": ("doc_id + 100000 * r.r AS doc_id",
                      "* EXCLUDE (doc_id)"),
        "embeddings": ("vec_id + 10000 * r.r AS vec_id",
                       "* EXCLUDE (vec_id)"),
    }
    for table, (keyed, rest) in jobs.items():
        con.execute(
            f"COPY (SELECT {keyed}, {rest} "
            f"FROM '{SRC}/{table}.parquet' CROSS JOIN r) "
            f"TO '{DST}/{table}.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM '{DST}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n} rows")
    # small dims copied as-is (queries only read them for joins)
    for table in ("region", "nation", "customer", "supplier", "part",
                  "orders", "events"):
        src = f"{SRC}/{table}.parquet"
        if os.path.exists(src):
            con.execute(f"COPY (SELECT * FROM '{src}') "
                        f"TO '{DST}/{table}.parquet' (FORMAT PARQUET)")
    print("done ->", DST)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
