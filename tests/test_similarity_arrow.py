"""Bit-parity of the Arrow batch kernels against the Column folds they
replace (llm/similarity.py pair_cosine_arrow / knn_lsh signatures /
random_projection; llm/dedup.py embedding_near_duplicates verify).

The Arrow kernels claim BIT-IDENTICAL results, not approximate ones:
the per-dimension accumulation replicates the interpreted ``aggregate``
fold's left-to-right float64 order (similarity._seq_dot64), so LSH sign
decisions, threshold comparisons and rounded outputs cannot move.  The
fixtures include near-zero dot products (the adversarial case for sign
stability) and a float32 source column (the widening-cast case).
"""

import numpy as np
import pytest


def _emb_df(spark, n=60, dim=16, seed=3, dtype="float"):
    rng = np.random.RandomState(seed)
    vecs = rng.standard_normal((n, dim))
    # vecs[1]: Gram-Schmidt residual against vecs[0] — the exact dot is
    # float rounding noise within a few ulp of zero, the adversarial
    # case for sign/threshold parity between evaluation orders
    vecs[1] = vecs[1] - (vecs[1] @ vecs[0]) / (vecs[0] @ vecs[0]) * vecs[0]
    # vecs[2]: a near-parallel clone (cosine within 1e-13 of 1.0)
    vecs[2] = vecs[0] * (1 + 1e-13)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(n)]
    return spark.createDataFrame(
        rows, f"vec_id LONG, embedding ARRAY<{dtype.upper()}>")


@pytest.mark.parametrize("dtype", ["float", "double"])
def test_pair_cosine_arrow_bit_parity(spark, dtype):
    from pyspark.sql import functions as F

    from xclim_spark.llm.similarity import (
        cosine_similarity, pair_cosine_arrow)

    e = _emb_df(spark, dtype=dtype)
    pairs = (e.alias("a").crossJoin(
        e.selectExpr("vec_id AS vb", "embedding AS eb").alias("b"))
        .filter(F.col("vec_id") < F.col("vb")))
    got = pairs.select(
        "vec_id", "vb",
        pair_cosine_arrow(F.col("embedding"), F.col("eb")).alias("c"),
    ).collect()
    want = pairs.select(
        "vec_id", "vb",
        cosine_similarity(F.col("embedding"), F.col("eb")).alias("c"),
    ).collect()
    gm = {(r["vec_id"], r["vb"]): r["c"] for r in got}
    wm = {(r["vec_id"], r["vb"]): r["c"] for r in want}
    assert gm.keys() == wm.keys()
    for k in wm:
        # bit-for-bit, not approx
        assert gm[k] == wm[k], (k, gm[k].hex(), wm[k].hex())


def test_knn_lsh_arrow_matches_column(spark):
    from xclim_spark.llm.similarity import knn_lsh

    e = _emb_df(spark, n=80, dim=16)
    q = e.filter("vec_id % 10 = 0")
    a = knn_lsh(e, q, k=3, dim=16, n_planes=6, n_tables=3,
                arrow=True).collect()
    b = knn_lsh(e, q, k=3, dim=16, n_planes=6, n_tables=3,
                arrow=False).collect()
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    am = {key(r): (r["neighbor_id"], r["cos_sim"]) for r in a}
    bm = {key(r): (r["neighbor_id"], r["cos_sim"]) for r in b}
    assert am == bm and len(am) > 0


def test_knn_ivf_and_bruteforce_arrow_match(spark):
    from xclim_spark.llm.similarity import knn_bruteforce, knn_ivf

    e = _emb_df(spark, n=80, dim=16)
    q = e.filter("vec_id % 10 = 0")
    cents = e.filter("vec_id % 7 = 0")
    for fn, kw in ((knn_bruteforce, {}), (knn_ivf, {"nprobe": 2})):
        args = (e, q) if fn is knn_bruteforce else (e, q, cents)
        a = fn(*args, k=3, arrow=True, **kw).collect()
        b = fn(*args, k=3, arrow=False, **kw).collect()
        am = {(r["query_id"], r["rank"]): (r["neighbor_id"], r["cos_sim"])
              for r in a}
        bm = {(r["query_id"], r["rank"]): (r["neighbor_id"], r["cos_sim"])
              for r in b}
        assert am == bm and len(am) > 0


def test_random_projection_arrow_bit_parity(spark):
    from xclim_spark.llm.similarity import random_projection

    e = _emb_df(spark, n=40, dim=16)
    a = e.select(
        "vec_id",
        random_projection("embedding", dim=16, out_dim=5,
                          arrow=True).alias("p")).collect()
    b = e.select(
        "vec_id",
        random_projection("embedding", dim=16, out_dim=5,
                          arrow=False).alias("p")).collect()
    am = {r["vec_id"]: r["p"] for r in a}
    bm = {r["vec_id"]: r["p"] for r in b}
    assert am.keys() == bm.keys()
    for k in bm:
        assert am[k] == bm[k]


def test_embedding_near_duplicates_arrow_matches_column(spark):
    from pyspark.sql import functions as F

    from xclim_spark.llm.dedup import embedding_near_duplicates

    e = _emb_df(spark, n=60, dim=16)
    # add exact near-clones so the verify stage has real work
    clones = e.filter("vec_id % 10 = 0").select(
        (F.col("vec_id") + 1000).alias("vec_id"),
        F.transform("embedding",
                    lambda x: x * F.lit(1.0001).cast("float"))
        .alias("embedding"))
    u = e.unionByName(clones)
    a = embedding_near_duplicates(
        u, threshold=0.98, dim=16, n_planes=6, n_tables=3,
        arrow=True).collect()
    b = embedding_near_duplicates(
        u, threshold=0.98, dim=16, n_planes=6, n_tables=3,
        arrow=False).collect()
    am = {(r["id_a"], r["id_b"]): r["cos_sim"] for r in a}
    bm = {(r["id_a"], r["id_b"]): r["cos_sim"] for r in b}
    assert am == bm and len(am) > 0


def test_knn_bruteforce_batch_partial_topk_edges(spark):
    """The batch scorer's per-task partial top-k must compose into the
    same global top-k the window computes, across many partitions and
    at the edges: ties at the k boundary (broken by neighbor id ASC),
    a query with fewer than k non-self neighbors, and a zero-norm
    (NaN-cosine) corpus vector, which Spark's DESC window orders FIRST
    (NaN is greatest) and the kernel must too."""
    from pyspark.sql import functions as F

    from xclim_spark.llm.similarity import knn_bruteforce

    # 6 identical vectors -> every pairwise cosine ties at 1.0 exactly;
    # one zero vector -> NaN cosine against everything.  (The Column
    # twin cannot serve as reference here: under Spark 4 ANSI mode its
    # 0/0 raises DIVIDE_BY_ZERO, while both Arrow kernels — the pair
    # kernel this path replaced and the batch scorer — yield NaN, so
    # the default path's degenerate-input behavior is unchanged.)
    rows = [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(6)]
    rows.append((6, [0.0, 0.0, 0.0, 0.0]))
    df = spark.createDataFrame(
        rows, "vec_id LONG, embedding ARRAY<FLOAT>").repartition(5)
    q = df.filter("vec_id IN (0, 6)")

    got = knn_bruteforce(df, q, k=3, arrow=True).collect()
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    assert len(got) == 6
    # a kernel NaN crosses the Arrow boundary as SQL NULL, and the
    # rank window is DESC NULLS LAST: the zero vector loses to every
    # real cosine — query 0 keeps the exact 1.0 ties by ascending id
    by_q0 = [r["neighbor_id"] for r in sorted(got, key=key)
             if r["query_id"] == 0]
    assert by_q0 == [1, 2, 3]
    # the zero-vector query: every cosine NULL, ties by ascending id
    q6 = [r for r in sorted(got, key=key) if r["query_id"] == 6]
    assert [r["neighbor_id"] for r in q6] == [0, 1, 2]
    assert all(r["cos_sim"] is None for r in q6)
    # the kernel must not let NULL-scored candidates crowd out real
    # ones inside a partition: one partition holding the zero vector
    # plus real neighbors, k = 2 -> both slots go to real cosines
    one = spark.createDataFrame(
        [(0, [1.0, 0.0]), (7, [0.0, 0.0]), (8, [0.9, 0.1]),
         (9, [0.8, 0.2])],
        "vec_id LONG, embedding ARRAY<FLOAT>").coalesce(1)
    out1 = knn_bruteforce(one, one.filter("vec_id = 0"), k=2,
                          arrow=True).collect()
    assert [r["neighbor_id"] for r in
            sorted(out1, key=key)] == [8, 9]

    # fewer than k non-self neighbors: 2-doc corpus, k=5
    small = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.5, 0.5])],
        "vec_id LONG, embedding ARRAY<FLOAT>").repartition(3)
    out = knn_bruteforce(small, small.filter("vec_id = 0"), k=5,
                         arrow=True).collect()
    assert [(r["neighbor_id"], r["rank"]) for r in out] == [(1, 1)]

    # partial-vs-global composition: 40 docs over 7 partitions must
    # equal the single-partition answer row for row
    df40 = _emb_df(spark, n=40, dim=8, seed=11)
    q40 = df40.filter("vec_id % 13 = 0")
    a = knn_bruteforce(df40.repartition(7), q40, k=4).collect()
    b = knn_bruteforce(df40.coalesce(1), q40, k=4).collect()
    am = {key(r): (r["neighbor_id"], r["cos_sim"]) for r in a}
    bm = {key(r): (r["neighbor_id"], r["cos_sim"]) for r in b}
    assert am == bm and len(am) > 0


def test_knn_bruteforce_query_collect_size_gate(spark):
    """The batch scorer's driver collect is size-gated: a query frame
    over ``broadcast_max_queries`` rows must take the pair-join path
    (no unbounded collect, plan carries the join) and still return the
    identical top-k."""
    from xclim_spark.llm.similarity import knn_bruteforce

    e = _emb_df(spark, n=50, dim=8, seed=7)
    q = e.filter("vec_id % 5 = 0")  # 10 query rows

    gated = knn_bruteforce(e, q, k=3, broadcast_max_queries=4)
    plan = gated._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan, plan  # fell back to the pair join
    assert "ArrowEvalPython" in plan, plan  # ...which scores per pair

    batch = knn_bruteforce(e, q, k=3)  # default gate: batch path
    bplan = batch._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in bplan, bplan

    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    gm = {key(r): (r["neighbor_id"], r["cos_sim"])
          for r in gated.collect()}
    bm = {key(r): (r["neighbor_id"], r["cos_sim"])
          for r in batch.collect()}
    assert gm == bm and len(gm) == 30


def test_knn_bruteforce_batch_null_embeddings(spark):
    """NULL embeddings must not crash the batch kernel: a NULL corpus
    vector scores NULL cos_sim (ordered after every real cosine), and
    a NULL query vector ranks its candidates by neighbor id with NULL
    scores — the Column path's NULL-cosine ordering."""
    from xclim_spark.llm.similarity import knn_bruteforce

    rows = [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, None),
            (3, [0.5, 0.5]), (4, None)]
    df = spark.createDataFrame(
        rows, "vec_id LONG, embedding ARRAY<FLOAT>").repartition(3)

    # NULL corpus vectors only surface when real candidates run out
    out = knn_bruteforce(df, df.filter("vec_id = 0"), k=4).collect()
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    got = [(r["neighbor_id"], r["cos_sim"] is None)
           for r in sorted(out, key=key)]
    assert [n for n, _ in got] == [1, 3, 2, 4]
    assert [isnull for _, isnull in got] == [False, False, True, True]

    # NULL query vector: all candidates NULL-scored, ties by id ASC
    outq = knn_bruteforce(df, df.filter("vec_id = 2"), k=3).collect()
    gq = [(r["neighbor_id"], r["cos_sim"] is None)
          for r in sorted(outq, key=key)]
    assert gq == [(0, True), (1, True), (3, True)]
