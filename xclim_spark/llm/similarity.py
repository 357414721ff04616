"""Similarity search over embedding columns (``array<float>``).

Two tiers:

* :func:`knn_bruteforce` — exact cosine top-k: broadcast the (small) query
  set against the corpus, one pass, no shuffle of the corpus side.  Cost
  is O(|corpus| x |queries|) — the right baseline, and the right plan when
  queries are few.
* :func:`knn_lsh` — random-hyperplane LSH: signatures computed map-side,
  candidates restricted to matching buckets, exact cosine only within
  buckets.  At 100 TB the shuffle carries (bucket, vec_id, embedding) for
  bucketed candidates only — never the full cross product.

All vector math is pure Column expressions (``zip_with`` products in
double + ``aggregate`` fold) — JVM-side, no Python UDFs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["dot", "l2_norm", "cosine_similarity", "pair_cosine_arrow",
           "knn_bruteforce", "knn_lsh", "knn_ivf", "lsh_bucket",
           "kmeans_fit", "pq_fit", "pq_encode", "knn_ivfpq",
           "random_projection"]


def dot(a, b) -> Column:
    """Double-precision dot product of two float-array Columns (products
    cast to double before the fold so both engines agree bit-for-bit)."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a, b) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def _f64_rows(vs) -> "np.ndarray":
    """Stack a pandas Series of float vectors into an (n, d) float64
    matrix (float32 -> float64 widening is exact)."""
    return np.stack(vs.to_numpy()).astype(np.float64, copy=False)


def _seq_dot64(A: "np.ndarray", B: "np.ndarray") -> "np.ndarray":
    """Row-wise dot product with the SAME float evaluation order as the
    :func:`dot` Column fold: ``acc = ((0.0 + p_0) + p_1) + ...`` in
    float64, left to right over the array index.  Vectorized ACROSS
    rows, sequential across dimensions, so every row's result is
    bit-identical to Catalyst's interpreted ``aggregate`` fold (numpy's
    own ``sum``/``@`` use pairwise/BLAS reassociation and would drift
    in the last ulp — enough to flip an LSH sign on an adversarial
    vector or a rounded 6th decimal at a boundary)."""
    acc = np.zeros(len(A))
    for j in range(A.shape[1]):
        acc += A[:, j] * B[:, j]
    return acc


def pair_cosine_arrow(a, b) -> Column:
    """Arrow twin of :func:`cosine_similarity` — one vectorized batch
    kernel instead of three interpreted per-element folds per row,
    bit-identical output (see :func:`_seq_dot64`; the final
    ``dot / (sqrt(na) * sqrt(nb))`` is the same scalar expression
    tree).  Higher-order Column functions are evaluated INTERPRETED
    per element (the measured defect class of the r11 pair-cosine and
    r16 classifier-scoring rewrites), which at ``dim`` = 64 puts ~400
    interpreter dispatches on every candidate pair; this kernel pays
    one Arrow transfer of the two vectors instead.

    The UDF is marked non-deterministic (it is not — the kernel is
    bit-reproducible) PURELY to stop the optimizer duplicating it:
    when a filter consumes the scored column (the ``>= threshold``
    verify in ``embedding_near_duplicates``), filter pushdown
    otherwise clones the UDF below the filter and every surviving pair
    pays the kernel twice — measured as a 2x ArrowEvalPython plan
    (plans/r16/dedup_embed) and the standard workaround for this
    optimizer behaviour."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _cos(av: pd.Series, bv: pd.Series) -> pd.Series:
        if not len(av):
            return pd.Series([], dtype="float64")
        A, B = _f64_rows(av), _f64_rows(bv)
        return pd.Series(
            _seq_dot64(A, B)
            / (np.sqrt(_seq_dot64(A, A)) * np.sqrt(_seq_dot64(B, B))))

    _cos = _cos.asNondeterministic()
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return _cos(a, b)


def knn_bruteforce(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    broadcast_queries: bool = True,
    arrow: bool = True,
    broadcast_max_queries: int = 8192,
) -> DataFrame:
    """Exact cosine top-k for each query vector.

    ``queries`` is a (small) subset with the same schema.  Plan: broadcast
    queries -> map-side cross join -> per-partition partial evaluation ->
    one shuffle keyed by query for the rank.  Returns
    ``query_id, neighbor_id, cos_sim, rank`` (self-matches excluded,
    ties broken by neighbor id).

    ``arrow=True`` (default) scores with vectorized order-preserving
    batch kernels (bit-identical to the Column fold, so ranks and
    rounded values cannot move); ``arrow=False`` keeps the pure-Column
    twin as the A/B control and for Python-worker-free environments.

    With ``broadcast_queries=True`` (the contract's "queries are
    small" case) the arrow path does not materialize pairs at all: the
    query block is a driver-collected closure literal (NOTE: the query
    set is collected EAGERLY, at call time, not at action time), each
    corpus vector crosses the Python boundary ONCE (not once per
    query), the kernel scores it against every query with the same
    ascending-index float64 accumulation as :func:`_seq_dot64`
    (bit-identical cosines), and each task emits only its per-query
    top-k candidates — the final rank shuffles
    ``n_tasks x n_queries x k`` candidate rows instead of
    ``|corpus| x |queries|`` pairs carrying two vectors each.  Partial
    top-k per task then global top-k is exact because the ordering
    ``(cos DESC, neighbor_id ASC)`` is total and deterministic.

    The collect is SIZE-GATED (same pattern as
    ``lm_broadcast_model``): at most ``broadcast_max_queries`` query
    rows are pulled to the driver; one row more and the call degrades
    to the pair-join path instead of risking driver/worker memory (the
    scoring kernel holds an (arrow-batch-rows x n_queries) float64
    block per task, so 8192 queries x 10k-row batches is ~650 MB —
    the ceiling of comfortable).  ``broadcast_queries=False`` skips
    the collect entirely and keeps the pair-at-a-time join for query
    sets known to be large.

    A NULL embedding on either side scores NULL ``cos_sim`` (ordered
    after every real cosine, ties by neighbor id) on both paths; a
    ragged embedding (dimension mismatch) raises with a clear message
    on the batch path.
    """
    if arrow and broadcast_queries:
        batch = _knn_bruteforce_batch(
            emb, queries, k, id_col=id_col, vec_col=vec_col,
            max_queries=broadcast_max_queries)
        if batch is not None:
            return batch
        broadcast_queries = False  # over the gate: degrade to the join
    if arrow:
        q = queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qvec"))
        j = (emb.select(F.col(id_col).alias("neighbor_id"),
                        F.col(vec_col).alias("_nvec"))
             .crossJoin(q)
             .filter(F.col("neighbor_id") != F.col("query_id"))
             .withColumn("cos_sim",
                         pair_cosine_arrow("_qvec", "_nvec")))
    else:
        # norms are computed ONCE per side before the join — per pair
        # only the dot product remains (3x less per-pair expression work)
        q = queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qvec"),
            l2_norm(F.col(vec_col)).alias("_qnorm"),
        )
        if broadcast_queries:
            q = F.broadcast(q)
        j = emb.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("_nvec"),
            l2_norm(F.col(vec_col)).alias("_nnorm"),
        ).crossJoin(q).filter(F.col("neighbor_id") != F.col("query_id"))
        j = j.withColumn(
            "cos_sim",
            dot("_qvec", "_nvec") / (F.col("_qnorm") * F.col("_nnorm")),
        )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        j.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def _knn_bruteforce_batch(
    emb: DataFrame,
    queries: DataFrame,
    k: int,
    *,
    id_col: str,
    vec_col: str,
    max_queries: int = 8192,
) -> DataFrame | None:
    """Pair-free brute-force top-k (see :func:`knn_bruteforce`).
    Returns ``None`` when the query set exceeds ``max_queries`` rows,
    so the caller can fall back to the pair-join path instead of
    collecting an unbounded frame to the driver.

    Scoring reproduces the pair kernel bit for bit: the dot/norm
    accumulators advance in ascending array-index order in float64
    (:func:`_seq_dot64`'s order; IEEE multiply is commutative so
    ``n_j * q_j`` == ``q_j * n_j`` bitwise), and the cosine is the same
    ``dot / (sqrt(qq) * sqrt(nn))`` scalar tree.  Candidate selection
    mirrors Spark's ``(cos DESC, neighbor_id ASC)`` window ordering.
    A zero-norm vector scores NaN, and a kernel NaN becomes SQL NULL
    at the Arrow boundary (the pair kernel this path replaced coerced
    identically), so the window's ``DESC NULLS LAST`` puts such pairs
    AFTER every real cosine — the selection keys NaN as ``-inf``
    (ties by neighbor id) to match.  A NULL embedding is a NaN row in
    the kernel, which lands in the same NULLS-LAST regime the Column
    path gave it."""
    from pyspark.sql.types import DoubleType, StructField, StructType

    # size-gated collect: pull at most max_queries + 1 rows; one row
    # over the gate means "too big to broadcast" and the caller keeps
    # the join path (mirrors lm_broadcast_model's max_rows gate)
    qrows = (queries.select(F.col(id_col), F.col(vec_col))
             .limit(max_queries + 1).collect())
    if len(qrows) > max_queries:
        return None
    out_schema = StructType([
        StructField("query_id", queries.schema[id_col].dataType),
        StructField("neighbor_id", emb.schema[id_col].dataType),
        StructField("cos_sim", DoubleType()),
    ])
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id"))
    if not qrows:
        empty = emb.sparkSession.createDataFrame([], out_schema)
        return (empty.withColumn("rank", F.row_number().over(w))
                .select("query_id", "neighbor_id", "cos_sim", "rank"))
    qids = [r[0] for r in qrows]
    qvecs = [r[1] for r in qrows]
    qdims = {len(v) for v in qvecs if v is not None}
    if len(qdims) > 1:
        raise ValueError(
            f"ragged query embeddings: lengths {sorted(qdims)} in "
            f"column {vec_col!r}; all vectors must share one dimension")
    dim = qdims.pop() if qdims else 0
    # a NULL query embedding becomes a NaN row: every candidate scores
    # NaN -> SQL NULL, ranked by neighbor id — the Column path's
    # NULL-cosine ordering
    Qm = np.full((len(qvecs), dim), np.nan)
    for i, v in enumerate(qvecs):
        if v is not None:
            Qm[i] = v
    qn = np.sqrt(_seq_dot64(Qm, Qm))
    n_q = len(qvecs)

    def _f64_rows_nullable(vs):
        if not dim:
            # every query vector is NULL: all cosines are NaN whatever
            # the corpus holds, so its values never need stacking
            return np.zeros((len(vs), 0))
        notna = vs.notna().to_numpy()
        if notna.all():
            try:
                M = _f64_rows(vs)
            except ValueError as exc:
                raise ValueError(
                    f"ragged corpus embeddings in column {vec_col!r}: "
                    f"{exc}") from exc
        else:
            M = np.full((len(vs), dim), np.nan)
            if notna.any():
                try:
                    M[notna] = _f64_rows(vs[notna])
                except ValueError as exc:
                    raise ValueError(
                        f"ragged corpus embeddings in column "
                        f"{vec_col!r}: {exc}") from exc
        if dim and M.shape[1] != dim:
            raise ValueError(
                f"embedding dimension mismatch: corpus {M.shape[1]} "
                f"vs queries {dim} in column {vec_col!r}")
        return M

    def _topk(batches):
        sc: list = [[] for _ in range(n_q)]   # per-query candidate scores
        ni: list = [[] for _ in range(n_q)]   # per-query candidate ids
        qid_arr = np.asarray(qids)
        for pdf in batches:
            if not len(pdf):
                continue
            N = _f64_rows_nullable(pdf[vec_col])
            ids = pdf[id_col].to_numpy()
            nn = np.zeros(len(N))
            S = np.zeros((len(N), n_q))
            for j in range(dim):
                col = N[:, j]
                nn += col * col
                S += col[:, None] * Qm[:, j][None, :]
            S /= qn[None, :] * np.sqrt(nn)[:, None]
            valid = ids[:, None] != qid_arr[None, :]
            for qi in range(n_q):
                v = valid[:, qi]
                if not v.any():
                    continue
                s, nb = S[v, qi], ids[v]
                # kernel NaN -> SQL NULL at the Arrow boundary; the
                # window is DESC NULLS LAST, so key NaN as -inf
                key = np.where(np.isnan(s), -np.inf, s)
                top = np.lexsort((nb, -key))[:k]
                sc[qi].append(s[top])
                ni[qi].append(nb[top])
        out_q, out_n, out_s = [], [], []
        for qi in range(n_q):
            if not sc[qi]:
                continue
            s = np.concatenate(sc[qi])
            nb = np.concatenate(ni[qi])
            key = np.where(np.isnan(s), -np.inf, s)
            top = np.lexsort((nb, -key))[:k]
            out_q.extend([qids[qi]] * len(top))
            out_n.extend(nb[top].tolist())
            out_s.extend(s[top].tolist())
        if out_q:
            yield pd.DataFrame({"query_id": out_q, "neighbor_id": out_n,
                                "cos_sim": out_s})

    cand = (emb.select(F.col(id_col), F.col(vec_col))
            .mapInPandas(_topk, schema=out_schema))
    return (cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cos_sim", "rank"))


def _planes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_bucket(vec, dim: int, n_planes: int = 16, seed: int = 42) -> Column:
    """Random-hyperplane signature -> integer bucket id.

    ``sign(v . h_i)`` bits packed into an int: vectors with small angular
    distance collide with probability ``(1 - theta/pi)^n_planes``.  The
    hyperplanes are deterministic literals (driver-seeded) so buckets are
    reproducible across runs and engines.

    The whole plane matrix is ONE nested-array literal and the signature
    one ``transform``+``aggregate`` pair — a handful of py4j calls
    instead of ``n_planes x dim`` scalar literals, which dominated
    wall-clock at plan-build time.
    """
    v = F.col(vec) if isinstance(vec, str) else vec
    planes = F.lit([[float(x) for x in p]
                    for p in _planes(dim, n_planes, seed)])
    idx = F.lit(list(range(n_planes)))
    bits = F.transform(
        idx,
        lambda i: F.when(
            dot(v, F.element_at(planes, i + 1)) >= 0.0,
            F.pow(F.lit(2.0), i).cast("int"),
        ).otherwise(F.lit(0)),
    )
    return F.aggregate(bits, F.lit(0), lambda a, b: a + b)


def knn_lsh(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    *,
    dim: int,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    arrow: bool = True,
) -> DataFrame:
    """Approximate cosine top-k: candidates limited to vectors sharing an
    LSH bucket with the query in at least one of ``n_tables`` hash tables
    (multi-probe via independent plane sets).

    Plan shape at scale: corpus signatures computed map-side (one narrow
    projection), exploded to (table, bucket) keys, shuffled once on the
    bucket key; queries likewise; the join touches only matching buckets.
    Recall is tunable via n_planes (bucket granularity) x n_tables
    (probes).

    ``arrow=True`` (default) computes both the signature bits and the
    candidate cosines with the vectorized order-preserving batch
    kernels (:func:`_seq_dot64`): every sign decision and every cosine
    is bit-identical to the Column fold the oracle re-derives, so
    bucket membership and ranks cannot move.  ``arrow=False`` keeps the
    pure-Column twin (interpreted per-element folds — ``n_tables x
    n_planes x dim`` interpreter dispatches per ROW) as the A/B
    control.
    """
    planes_list = [
        [[float(x) for x in p] for p in _planes(dim, n_planes, seed + t)]
        for t in range(n_tables)
    ]

    if arrow:
        from pyspark.sql.functions import pandas_udf

        P = np.asarray(planes_list)  # (tables, planes, dim) float64

        @pandas_udf("array<int>")
        def _sigs(vs: pd.Series) -> pd.Series:
            if not len(vs):
                return pd.Series([], dtype=object)
            X = _f64_rows(vs)
            out = np.zeros((len(X), n_tables), dtype=np.int32)
            for t in range(n_tables):
                for i in range(n_planes):
                    # order-preserving fold: same sign as the Column
                    # dot even within 1 ulp of zero
                    acc = np.zeros(len(X))
                    for j in range(X.shape[1]):
                        acc += X[:, j] * P[t, i, j]
                    out[:, t] |= (acc >= 0.0).astype(np.int32) << i
            return pd.Series(list(out))

        def with_buckets(df: DataFrame, idn: str) -> DataFrame:
            return df.select(
                F.col(id_col).alias(idn),
                F.col(vec_col).alias(f"_{idn}_vec"),
                F.posexplode(_sigs(F.col(vec_col)))
                .alias("table", "bucket"),
            )
    else:
        # one nested literal (tables x planes x dim) + nested transform:
        # O(1) py4j calls for the whole multi-table signature
        planes = F.lit(planes_list)
        v = F.col(vec_col)

        def _bucket(t):
            tbl = F.element_at(planes, t + 1)
            bits = F.transform(
                F.lit(list(range(n_planes))),
                lambda i: F.when(
                    dot(v, F.element_at(tbl, i + 1)) >= 0.0,
                    F.pow(F.lit(2.0), i).cast("int"),
                ).otherwise(F.lit(0)),
            )
            return F.aggregate(bits, F.lit(0), lambda a, b: a + b)

        def with_buckets(df: DataFrame, idn: str) -> DataFrame:
            buckets = F.transform(
                F.lit(list(range(n_tables))),
                lambda t: F.struct(
                    t.alias("table"), _bucket(t).alias("bucket")
                ),
            )
            return df.select(
                F.col(id_col).alias(idn),
                F.col(vec_col).alias(f"_{idn}_vec"),
                F.explode(buckets).alias("_tb"),
            ).select(
                idn, f"_{idn}_vec",
                F.col("_tb.table").alias("table"),
                F.col("_tb.bucket").alias("bucket"),
            )

    e = with_buckets(emb, "neighbor_id")
    q = with_buckets(queries, "query_id")
    # cosine is computed BEFORE the pair-dedup so the dedup exchange
    # carries (query_id, neighbor_id, cos_sim) — one double per pair —
    # instead of two dim-sized arrays; a pair colliding in t tables costs
    # t map-side dot products (identical doubles), far cheaper at scale
    # than shuffling the vectors
    pair_cos = (pair_cosine_arrow if arrow else cosine_similarity)(
        "_query_id_vec", "_neighbor_id_vec")
    cand = (
        e.join(q, on=["table", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos_sim", pair_cos)
        .groupBy("query_id", "neighbor_id")
        .agg(F.max("cos_sim").alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def _centroid_scorer(centroids: DataFrame, id_col: str, vec_col: str):
    """Collect the (small, driver-bounded) centroid codebook ONCE and
    return ``(centroid_ids, scores_fn)`` where ``scores_fn`` maps a
    pandas Series of vectors to the (rows x centroids) cosine matrix —
    one BLAS matmul per Arrow batch, carried in the task closure (zero
    shuffle).  Shared by :func:`knn_ivf` cell assignment and
    :func:`~xclim_spark.llm.dedup.semantic_dedup` clustering."""
    cents = sorted(
        (r[0], [float(x) for x in r[1]])
        for r in centroids.select(id_col, vec_col).collect()
    )
    ids = np.array([int(c[0]) for c in cents], dtype=np.int64)
    vecs = np.stack([np.asarray(c[1]) for c in cents])  # (C, d)
    norms = np.linalg.norm(vecs, axis=1)

    def _scores(vs) -> np.ndarray:
        # accepts a pandas Series of vectors OR an (n, d) ndarray —
        # numpy callers (pq_fit._prep, pq_encode) skip a
        # Series(list(X)) round-trip per Arrow batch
        X = (vs.astype(np.float64) if isinstance(vs, np.ndarray)
             else np.stack(vs.to_numpy()).astype(np.float64))
        return (X @ vecs.T) / (
            np.linalg.norm(X, axis=1, keepdims=True) * norms)

    return ids, _scores


def knn_ivf(
    emb: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    *,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    arrow: bool = True,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: a coarse quantizer assigns
    every corpus vector to its nearest centroid cell; a query probes only
    its ``nprobe`` nearest cells and ranks candidates there by exact
    cosine.

    ``centroids`` is the (small, driver-bounded) coarse codebook — in
    production the output of a k-means training pass; any deterministic
    subset works for the plumbing.  It is collected ONCE into a numpy
    matrix carried in the task closure, so cell assignment is a
    zero-shuffle map-side pandas stage: one BLAS matmul per Arrow batch
    scores every (vector, centroid) pair (an expression fold here was
    interpreted per element and went quadratic-feeling at 400 centroids
    — 111 s for 20k vectors; the matmul is milliseconds).  Ties pick the
    lowest centroid id on both paths, and the candidate COSINES come
    from the order-preserving Arrow kernel (``arrow=True``, default —
    bit-identical to the Column fold, see :func:`pair_cosine_arrow`) or
    the pure-Column twin (``arrow=False``), so the discrete assignment
    plus the ranked output stay reproducible by the SQL oracle.  The only
    shuffles are the (cell)-keyed candidate join and the per-query rank
    — at 100 TB the corpus never moves except for the probed cells'
    rows.

    Returns ``query_id, neighbor_id, cos_sim, rank`` (approximate:
    neighbors outside probed cells are unseen, exactly like FAISS IVF).
    """
    from pyspark.sql.functions import pandas_udf

    cent_ids_np, _scores = _centroid_scorer(centroids, id_col, vec_col)

    @pandas_udf("bigint")
    def _cell(vs: pd.Series) -> pd.Series:
        # np.argmax takes the first maximum -> lowest centroid id
        return pd.Series(cent_ids_np[np.argmax(_scores(vs), axis=1)])

    # non-deterministic marking (the scorer is in fact reproducible)
    # stops the optimizer cloning the assignment UDF below the join-key
    # null filter: the captured plan evaluated _cell TWICE over the
    # whole corpus (plans/r16/knn_ivf_docs_before.txt) — the §4.4
    # filter-pushdown duplication, here on the expensive side
    _cell = _cell.asNondeterministic()

    @pandas_udf("array<bigint>")
    def _probe_cells(vs: pd.Series) -> pd.Series:
        # stable argsort of -scores: ties keep ascending centroid order
        order = np.argsort(-_scores(vs), axis=1, kind="stable")
        return pd.Series(list(cent_ids_np[order[:, :nprobe]]))

    asg = emb.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_nvec"),
        _cell(F.col(vec_col)).alias("cell"),
    )
    qs = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qvec"),
        F.explode(_probe_cells(F.col(vec_col))).alias("cell"),
    ).select("query_id", "_qvec", "cell")
    cand = (
        asg.join(qs, on="cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", "_qvec", "_nvec")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    # candidate scoring: the Arrow batch kernel is bit-identical to the
    # Column fold (see pair_cosine_arrow), so the SQL oracle's ranked
    # output is unchanged; the Column twin stays as the A/B control
    cand = cand.withColumn(
        "cos_sim", (pair_cosine_arrow if arrow else cosine_similarity)(
            "_qvec", "_nvec"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def _spread_init(
    emb: DataFrame, k: int, id_col: str, vec_col: str, cap: int,
) -> np.ndarray:
    """Deterministic k-means++-style init: farthest-first traversal
    (Gonzalez 1985) over a hash-spread sample.

    The sample is the ``cap`` rows with the smallest ``md5(id)`` — a
    uniform, order- and partitioning-independent draw that Spark
    executes as a TopK (``TakeOrderedAndProject``), never a full sort
    shuffle.  Seeded at the sample's minimum id, each next centroid is
    the sample point FARTHEST from the chosen set (ties to the lower
    id) — spread like k-means++ but with no RNG, so the codebook is
    bit-reproducible across runs, engines and partitionings.  Driver
    cost O(cap * k * d) on a metadata-sized sample.
    """
    rows = (emb.select(F.col(id_col).cast("long").alias("_i"), vec_col)
            .withColumn("_h", F.md5(F.col("_i").cast("string")))
            .orderBy("_h", "_i").limit(cap).collect())
    samp = sorted((int(r["_i"]), [float(x) for x in r[1]]) for r in rows)
    X = np.asarray([s[1] for s in samp], dtype=np.float64)
    if len(X) < k:
        raise ValueError(f"k={k} exceeds sample size {len(X)}")
    chosen = [0]  # samp is id-sorted: index 0 IS the minimum id
    d2 = ((X - X[0]) ** 2).sum(axis=1)
    for _ in range(1, k):
        if d2.max() == 0.0:
            # every remaining point coincides with a chosen centroid:
            # argmax would keep returning index 0 and silently emit
            # duplicate centroids (a degenerate sub-codebook whose
            # failure surfaces later as a generic error) — name the
            # actual distinct count instead
            raise ValueError(
                f"k={k} exceeds the number of distinct points in the "
                f"init sample ({len(chosen)} distinct of {len(X)} "
                "sampled); lower k or provide more varied data")
        nxt = int(np.argmax(d2))  # argmax first-max -> lowest id on tie
        chosen.append(nxt)
        d2 = np.minimum(d2, ((X - X[nxt]) ** 2).sum(axis=1))
    return X[chosen].copy()


def kmeans_fit(
    emb: DataFrame,
    k: int,
    *,
    iters: int = 10,
    tol: float = 1e-6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    return_counts: bool = False,
    init: str = "first",
    sample_fraction: float | None = None,
    init_sample_cap: int = 8192,
):
    """Distributed Lloyd k-means over an embedding column — the
    training pass that produces the coarse codebook :func:`knn_ivf`
    and :func:`~xclim_spark.llm.dedup.semantic_dedup` consume.

    Plan shape per iteration (the classic MapReduce k-means):

    * **assign + partial-reduce map-side**: one ``mapInPandas`` pass
      computes each Arrow batch's nearest centroid via a BLAS matmul
      against the broadcast (k x d) codebook, then reduces the batch
      to at most ``k`` rows of ``(cluster, count, component sums)`` —
      the corpus itself never shuffles;
    * **tiny combine**: the per-batch partials (``<= k x batches``
      rows, k x (d+2) doubles each) collect to the driver and combine
      in numpy — the same driver-bounded-small-matrix design as
      ``kmeans_reduce_ensemble``; an empty cluster keeps its previous
      centroid (the standard Lloyd fallback).

    Deterministic: with ``init="first"`` (default, the oracle-gated
    path) the init is the first ``k`` vectors by ascending ``id_col``
    (stable across engines and partitionings); ``init="spread"`` is a
    deterministic k-means++-style farthest-first init over a
    hash-spread sample of ``init_sample_cap`` vectors (see
    :func:`_spread_init`) — real corpora often store near-duplicates
    at adjacent ids, exactly the degenerate-cluster input "first"
    produces.  Assignment ties break to the lowest cluster index
    (``argmin`` first-minimum on squared euclidean distance), and
    iteration stops after ``iters`` rounds or when no centroid moves
    more than ``tol``.

    ``sample_fraction`` bounds the 100-TB fit: when set (0 < f <= 1)
    every Lloyd pass scans only the rows with
    ``md5('kmeans|' || id) < hex_threshold(f)`` — the same stateless
    hash-threshold draw as ``mixture_sample`` (llm/pipeline.py), so
    the subset is identical every iteration, every run, and on every
    engine, and the full corpus is scanned zero times instead of
    ``iters`` times.  Codebook quality degrades only with sampling
    error (k-means centroids are means — they concentrate fast).

    Returns the (k, d) centroid matrix as numpy — metadata-sized;
    wrap in ``spark.createDataFrame`` for the ``centroids=`` contract
    of the consumers.  With ``return_counts=True`` returns
    ``(centroids, counts)`` where ``counts`` is the final iteration's
    per-cluster membership (of the SAMPLE when sampling).
    """
    if sample_fraction is not None:
        if not (0.0 < sample_fraction <= 1.0):
            raise ValueError(
                f"sample_fraction must be in (0, 1] (got {sample_fraction})")
        if sample_fraction < 1.0:
            from .pipeline import hex_threshold, sample_hash

            emb = emb.filter(
                sample_hash(F.lit("kmeans"), F.col(id_col))
                < hex_threshold(sample_fraction))

    if init == "spread":
        cents = _spread_init(
            emb, k, id_col, vec_col, max(init_sample_cap, 2 * k))
    elif init == "first":
        first = [r[1] for r in sorted(
            (int(r[0]), list(r[1])) for r in
            emb.select(id_col, vec_col).orderBy(id_col).limit(k).collect())]
        if len(first) < k:
            raise ValueError(f"k={k} exceeds corpus size {len(first)}")
        cents = np.asarray(first, dtype=np.float64)
    else:
        raise ValueError(
            f"kmeans_fit: init must be 'first' or 'spread' (got {init!r})")
    d = cents.shape[1]
    counts = np.zeros(k)  # stays zero if iters=0 (init codebook only)

    for _ in range(iters):
        C = cents  # rebind: the closure ships THIS iteration's matrix

        def _partials(it, C=C):
            for pdf in it:
                if not len(pdf):
                    continue
                X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
                # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2; drop ||x||^2
                # (constant per row) -> argmin of (-2 x.C^T + ||C||^2)
                scores = -2.0 * (X @ C.T) + (C * C).sum(axis=1)
                a = np.argmin(scores, axis=1)
                out = {"cluster": [], "n": [], "s": []}
                for c in np.unique(a):
                    m = a == c
                    out["cluster"].append(int(c))
                    out["n"].append(int(m.sum()))
                    out["s"].append([float(v)
                                     for v in X[m].sum(axis=0)])
                yield pd.DataFrame(out)

        rows = emb.select(vec_col).mapInPandas(
            _partials,
            "cluster int, n long, s array<double>").collect()
        counts = np.zeros(k)
        sums = np.zeros((k, d))
        for r in rows:
            counts[r["cluster"]] += r["n"]
            sums[r["cluster"]] += np.asarray(r["s"])
        new = np.where(counts[:, None] > 0,
                       sums / np.maximum(counts[:, None], 1), cents)
        shift = float(np.abs(new - cents).max())
        cents = new
        if shift <= tol:
            break
    return (cents, counts) if return_counts else cents


def _pq_check(dim: int, m: int, ks: int) -> int:
    if dim % m != 0:
        raise ValueError(f"pq: dim {dim} not divisible by m={m} subspaces")
    if not (2 <= ks <= 256):
        raise ValueError(f"pq: ks must be in [2, 256] (got {ks}) — codes "
                         "are stored as one byte per subspace")
    return dim // m


def _norm_centroids(centroids: DataFrame, id_col: str, vec_col: str):
    """Collected, id-sorted, L2-normalized coarse centroid matrix plus
    the cosine scorer — the residual-PQ helper (residuals live on the
    unit sphere: r = v/||v|| - c/||c|| of the assigned cell)."""
    cent_ids, scores = _centroid_scorer(centroids, id_col, vec_col)
    cents = sorted(
        (int(r[0]), [float(x) for x in r[1]])
        for r in centroids.select(id_col, vec_col).collect())
    C = np.stack([np.asarray(c[1], dtype=np.float64) for c in cents])
    C /= np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-30)
    return cent_ids, scores, C


def pq_fit(
    emb: DataFrame,
    *,
    m: int = 4,
    ks: int = 16,
    iters: int = 10,
    tol: float = 1e-6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_fraction: float | None = None,
    centroids: DataFrame | None = None,
) -> np.ndarray:
    """Product-quantization codebooks (Jégou, Douze & Schmid 2011,
    *Product Quantization for Nearest Neighbor Search*, TPAMI): split
    the d-dim space into ``m`` subspaces of d/m dims and train an
    independent ``ks``-entry k-means codebook per subspace over the
    L2-NORMALIZED vectors (so squared-L2 ADC ranks like cosine:
    ``cos = 1 - ||a-b||^2 / 2`` on the unit sphere).

    One FUSED Lloyd loop: each iteration is a single ``mapInPandas``
    pass that assigns every Arrow batch to its nearest code in ALL m
    subspaces (m small BLAS matmuls) and partial-reduces to
    ``<= m x ks`` rows of (subspace, code, count, component sums) —
    m separate :func:`kmeans_fit` calls would scan the corpus
    ``m x iters`` times; this scans it ``iters`` times total,
    independent of m (and zero times with ``sample_fraction``, the
    same stateless md5-threshold draw as :func:`kmeans_fit`).

    Deterministic init: subspace slices of the first ``ks`` vectors by
    ascending id.  Empty codes keep their previous entry (standard
    Lloyd fallback).  Returns the (m, ks, d/m) codebook tensor —
    metadata-sized (m*ks*(d/m) = ks*d doubles).

    With ``centroids`` (the coarse IVF codebook), codebooks are
    trained on RESIDUALS ``v/||v|| - c/||c||`` of each vector's
    assigned cell — Jégou et al.'s actual IVFADC scheme: residuals
    concentrate near the origin, so the same ks spends its precision
    on within-cell structure instead of re-coding the cell mean.
    """
    if not (2 <= ks <= 256):
        raise ValueError(f"pq: ks must be in [2, 256] (got {ks}) — codes "
                         "are stored as one byte per subspace")
    if sample_fraction is not None:
        if not (0.0 < sample_fraction <= 1.0):
            raise ValueError(
                f"sample_fraction must be in (0, 1] (got {sample_fraction})")
        if sample_fraction < 1.0:
            from .pipeline import hex_threshold, sample_hash

            emb = emb.filter(
                sample_hash(F.lit("pq"), F.col(id_col))
                < hex_threshold(sample_fraction))

    cent = (None if centroids is None
            else _norm_centroids(centroids, id_col, vec_col))

    def _prep(X: np.ndarray) -> np.ndarray:
        """Normalize, and subtract the assigned normalized centroid
        when training residual codebooks."""
        Xn = X / np.maximum(
            np.linalg.norm(X, axis=1, keepdims=True), 1e-30)
        if cent is None:
            return Xn
        _, scores, Cn = cent
        return Xn - Cn[np.argmax(scores(X), axis=1)]

    first = [r[1] for r in sorted(
        (int(r[0]), [float(x) for x in r[1]]) for r in
        emb.select(id_col, vec_col).orderBy(id_col).limit(ks).collect())]
    if len(first) < ks:
        raise ValueError(f"ks={ks} exceeds corpus size {len(first)}")
    X0 = _prep(np.asarray(first, dtype=np.float64))
    dim = X0.shape[1]
    dsub = _pq_check(dim, m, ks)
    books = np.stack([X0[:, j * dsub:(j + 1) * dsub] for j in range(m)])

    for _ in range(iters):
        B = books  # ship THIS iteration's tensor in the closure

        def _partials(it, B=B):
            for pdf in it:
                if not len(pdf):
                    continue
                X = _prep(
                    np.stack(pdf[vec_col].to_numpy()).astype(np.float64))
                out = {"sub": [], "code": [], "n": [], "s": []}
                for j in range(m):
                    Xj = X[:, j * dsub:(j + 1) * dsub]
                    Cj = B[j]
                    scores = -2.0 * (Xj @ Cj.T) + (Cj * Cj).sum(axis=1)
                    a = np.argmin(scores, axis=1)
                    for c in np.unique(a):
                        msk = a == c
                        out["sub"].append(j)
                        out["code"].append(int(c))
                        out["n"].append(int(msk.sum()))
                        out["s"].append(
                            [float(v) for v in Xj[msk].sum(axis=0)])
                yield pd.DataFrame(out)

        rows = emb.select(vec_col).mapInPandas(
            _partials,
            "sub int, code int, n long, s array<double>").collect()
        counts = np.zeros((m, ks))
        sums = np.zeros((m, ks, dsub))
        for r in rows:
            counts[r["sub"], r["code"]] += r["n"]
            sums[r["sub"], r["code"]] += np.asarray(r["s"])
        new = np.where(counts[..., None] > 0,
                       sums / np.maximum(counts[..., None], 1), books)
        shift = float(np.abs(new - books).max())
        books = new
        if shift <= tol:
            break
    return books


def pq_encode(
    emb: DataFrame,
    codebooks: np.ndarray,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "pq_codes",
    centroids: DataFrame | None = None,
    cell_col: str = "pq_cell",
) -> DataFrame:
    """Map-side PQ encoding: each L2-normalized vector becomes ``m``
    one-byte codes (nearest codebook entry per subspace, ties to the
    lowest code) — d x 4-byte floats compress to m bytes, the memory
    step that makes a 100-TB ANN index fit executor RAM.  Pure
    Arrow ``pandas_udf``; zero shuffle.  Codes ride as
    ``array<smallint>`` (values 0..ks-1 <= 255).

    With ``centroids`` the vector is coarse-assigned first and the
    RESIDUAL against its normalized centroid is coded (train the
    codebooks with the same ``centroids=``!); the assignment rides
    along as ``cell_col`` so index build needs ONE Arrow pass, not
    separate cell and code stages."""
    from pyspark.sql.functions import pandas_udf

    m, ks, dsub = codebooks.shape
    B = codebooks
    cent = (None if centroids is None
            else _norm_centroids(centroids, id_col, vec_col))

    def _encode_np(X: np.ndarray):
        Xn = X / np.maximum(
            np.linalg.norm(X, axis=1, keepdims=True), 1e-30)
        cells = None
        if cent is not None:
            ids, scores, Cn = cent
            a = np.argmax(scores(X), axis=1)
            cells = ids[a]
            Xn = Xn - Cn[a]
        cols = []
        for j in range(m):
            Xj = Xn[:, j * dsub:(j + 1) * dsub]
            Cj = B[j]
            sc = -2.0 * (Xj @ Cj.T) + (Cj * Cj).sum(axis=1)
            cols.append(np.argmin(sc, axis=1).astype(np.int16))
        return cells, np.stack(cols, axis=1)

    if cent is None:
        @pandas_udf("array<smallint>")
        def _codes(vs: pd.Series) -> pd.Series:
            if not len(vs):  # np.stack([]) raises on an empty batch
                return pd.Series([], dtype=object)
            _, codes = _encode_np(
                np.stack(vs.to_numpy()).astype(np.float64))
            return pd.Series(list(codes))

        return emb.select(
            F.col(id_col), F.col(vec_col),
            _codes(F.col(vec_col)).alias(out_col))

    @pandas_udf("struct<cell: bigint, codes: array<smallint>>")
    def _cell_codes(vs: pd.Series) -> pd.DataFrame:
        if not len(vs):
            return pd.DataFrame({"cell": [], "codes": []})
        cells, codes = _encode_np(
            np.stack(vs.to_numpy()).astype(np.float64))
        return pd.DataFrame({"cell": cells, "codes": list(codes)})

    # non-deterministic marking (the encoder is in fact reproducible)
    # stops the optimizer cloning the UDF below a pushed-down filter:
    # when `cell` becomes a join key, the isnotnull(cell) null filter
    # otherwise re-evaluates the WHOLE corpus encode — centroid matmul,
    # residual subtraction and m sub-space argmins — a second time
    # (plans/r16/knn_ivfpq_res_docs_before.txt, nodes 6+9; the §4.4
    # filter-pushdown duplication already fixed on knn_ivf's _cell)
    _cell_codes = _cell_codes.asNondeterministic()

    enc = emb.select(
        F.col(id_col), F.col(vec_col),
        _cell_codes(F.col(vec_col)).alias("_cc"))
    return enc.select(
        id_col, vec_col,
        F.col("_cc.cell").alias(cell_col),
        F.col("_cc.codes").alias(out_col))


def knn_ivfpq(
    emb: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    codebooks: np.ndarray,
    k: int = 5,
    *,
    nprobe: int = 2,
    shortlist: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    residual: bool = False,
    index: DataFrame | None = None,
    arrow: bool = True,
) -> DataFrame:
    """IVF-PQ approximate top-k (Jégou et al. 2011): the coarse
    quantizer prunes to ``nprobe`` cells, PQ codes rank the survivors
    by asymmetric distance, and only the ``shortlist`` best per query
    are re-ranked by EXACT cosine against their full vectors.

    ``residual=True`` is the paper's actual IVFADC: codes are over
    ``v/||v|| - c/||c||`` residuals (train ``codebooks`` with the
    same ``centroids=``!), and each query's ADC table is built per
    PROBED CELL from ``(q_n - c_n)`` — nprobe small tables instead of
    one, still metadata-sized.  Residuals concentrate near the
    origin, so quantization error drops and tight-shortlist recall
    rises (measured in tests).

    Plan shape at 100 TB:

    * corpus side: cell assignment + PQ encoding in one map-side pass —
      what shuffles to the cell join is (cell, id, m bytes of codes),
      never the d-dim vector;
    * query side: ``nprobe`` probed cells plus a per-query ADC table of
      m x ks squared-L2 entries to the codebook (normalized space, so
      the ordering is the cosine ordering) — metadata-sized, computed
      once per query, NOT per pair;
    * ADC per candidate is an m-term expression fold over the byte
      codes (JVM-side, no Python in the pair loop);
    * only shortlist survivors (|queries| x ``shortlist`` rows) fetch
      their full vectors back — one broadcast-able semi-join against
      the corpus — for the exact cosine re-rank.

    Approximate exactly like FAISS IVFPQ: neighbors outside probed
    cells or beyond the ADC shortlist are unseen; recall tunes with
    ``nprobe`` x ``shortlist`` (measured in tests).  Returns
    ``query_id, neighbor_id, cos_sim, rank``.
    """
    from pyspark.sql.functions import pandas_udf

    if index is not None and not residual:
        raise ValueError(
            "index= carries cell + residual codes (pq_encode with "
            "centroids=); probing it requires residual=True")
    m, ks, dsub = codebooks.shape
    B = codebooks
    cent_ids_np, _scores = _centroid_scorer(centroids, id_col, vec_col)

    @pandas_udf("bigint")
    def _cell(vs: pd.Series) -> pd.Series:
        return pd.Series(cent_ids_np[np.argmax(_scores(vs), axis=1)])

    # same §4.4 guard as knn_ivf._cell: `cell` is the candidate-join
    # key, and without this the pushed isnotnull(cell) filter cloned
    # the corpus-side centroid assignment below itself — every corpus
    # vector paid the matmul + Arrow round-trip twice
    # (plans/r16/knn_ivfpq_docs_before.txt, nodes 6+10)
    _cell = _cell.asNondeterministic()

    @pandas_udf("array<bigint>")
    def _probe_cells(vs: pd.Series) -> pd.Series:
        order = np.argsort(-_scores(vs), axis=1, kind="stable")
        return pd.Series(list(cent_ids_np[order[:, :nprobe]]))

    @pandas_udf("array<double>")
    def _adc_table(vs: pd.Series) -> pd.Series:
        # flattened (m*ks) table: entry j*ks+c = ||q_j - B[j][c]||^2 in
        # the normalized space
        if not len(vs):
            return pd.Series([], dtype=object)
        Q = np.stack(vs.to_numpy()).astype(np.float64)
        Q /= np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-30)
        tabs = np.empty((len(Q), m * ks))
        for j in range(m):
            Qj = Q[:, j * dsub:(j + 1) * dsub]
            Cj = B[j]
            tabs[:, j * ks:(j + 1) * ks] = (
                (Qj * Qj).sum(axis=1, keepdims=True)
                - 2.0 * (Qj @ Cj.T) + (Cj * Cj).sum(axis=1))
        return pd.Series(list(tabs))

    if residual:
        _, _, Cn = _norm_centroids(centroids, id_col, vec_col)
        ids_sorted = cent_ids_np  # _centroid_scorer sorts by id

        @pandas_udf("array<double>")
        def _adc_table_res(vs: pd.Series, cells: pd.Series) -> pd.Series:
            if not len(vs):
                return pd.Series([], dtype=object)
            Q = np.stack(vs.to_numpy()).astype(np.float64)
            Q /= np.maximum(
                np.linalg.norm(Q, axis=1, keepdims=True), 1e-30)
            idx = np.searchsorted(ids_sorted, cells.to_numpy())
            R = Q - Cn[idx]
            tabs = np.empty((len(R), m * ks))
            for j in range(m):
                Rj = R[:, j * dsub:(j + 1) * dsub]
                Cj = B[j]
                tabs[:, j * ks:(j + 1) * ks] = (
                    (Rj * Rj).sum(axis=1, keepdims=True)
                    - 2.0 * (Rj @ Cj.T) + (Cj * Cj).sum(axis=1))
            return pd.Series(list(tabs))

        if index is not None:
            # pre-built (id, pq_cell, pq_codes) index — the streaming
            # ingest path maintains one incrementally (pq_encode with
            # centroids= inside each micro-batch) and probes it here
            asg = index.select(
                F.col(id_col).alias("neighbor_id"), "pq_codes",
                F.col("pq_cell").alias("cell"))
        else:
            # ONE Arrow pass builds cell + residual codes for the corpus
            enc = pq_encode(emb, codebooks, id_col=id_col,
                            vec_col=vec_col, centroids=centroids)
            asg = enc.select(
                F.col(id_col).alias("neighbor_id"), "pq_codes",
                F.col("pq_cell").alias("cell"))
        qs = (queries.select(
                  F.col(id_col).alias("query_id"), F.col(vec_col),
                  F.explode(_probe_cells(F.col(vec_col))).alias("cell"))
              .select("query_id", "cell",
                      _adc_table_res(F.col(vec_col), F.col("cell"))
                      .alias("_tab")))
    else:
        enc = pq_encode(emb, codebooks, id_col=id_col, vec_col=vec_col)
        asg = enc.select(
            F.col(id_col).alias("neighbor_id"), "pq_codes",
            _cell(F.col(vec_col)).alias("cell"))
        qs = queries.select(
            F.col(id_col).alias("query_id"),
            _adc_table(F.col(vec_col)).alias("_tab"),
            F.explode(_probe_cells(F.col(vec_col))).alias("cell"))
    # Each corpus vector lives in exactly ONE coarse cell, so the cell
    # join emits every (query, neighbor) pair at most once — no pair
    # dedup needed.  (An earlier groupBy(query, neighbor).min(adc)
    # here added a candidate-sized exchange for nothing: ~30% of probe
    # wall-clock at sf1, see PLANS.md round 14.)  The ADC fold runs in
    # the join's own projection, so the m*ks table is dropped before
    # anything shuffles.
    # m is known at plan time, so the ADC is a STATIC m-term sum —
    # whole-stage-codegen'd — not an `aggregate` fold over a sequence
    # (higher-order functions are interpreted; measured 2-3x slower on
    # the candidate stream)
    adc = None
    for j in range(m):
        term = F.element_at(
            "_tab", (F.lit(j * ks)
                     + F.element_at("pq_codes", F.lit(j + 1)) + 1
                     ).cast("int"))
        adc = term if adc is None else adc + term
    cand = (
        asg.join(qs, on="cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("adc", adc)
        .select("query_id", "neighbor_id", "adc")
    )
    wa = Window.partitionBy("query_id").orderBy(
        F.asc("adc"), F.asc("neighbor_id"))
    short = (cand.withColumn("_r", F.row_number().over(wa))
             .filter(F.col("_r") <= shortlist)
             .select("query_id", "neighbor_id"))
    # exact re-rank: fetch full vectors for the shortlist only (the
    # shortlist side is |queries| x shortlist rows — broadcast it)
    nvec = emb.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("_nvec"))
    qv = queries.select(F.col(id_col).alias("query_id"),
                        F.col(vec_col).alias("_qvec"))
    rer = (nvec.join(F.broadcast(short), on="neighbor_id")
           .join(F.broadcast(qv), on="query_id")
           .withColumn("cos_sim",
                       (pair_cosine_arrow if arrow
                        else cosine_similarity)("_qvec", "_nvec")))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id"))
    return (rer.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cos_sim", "rank"))


def random_projection(
    vec, dim: int, out_dim: int, seed: int = 42, arrow: bool = True,
) -> Column:
    """Johnson–Lindenstrauss random projection to ``out_dim`` dims —
    the standard shrink step before ANN / clustering at 100 TB
    (pairwise distances survive within 1±eps for
    out_dim = O(log n / eps^2); Achlioptas 2003 for the database-
    friendly variants).

    The projection matrix is ONE driver-seeded nested literal
    (``N(0,1)/sqrt(out_dim)``, same plane machinery as
    :func:`lsh_bucket`) and each output coordinate a
    ``zip_with``+``aggregate`` dot product — zero shuffle, and
    bit-reproducible across runs/engines (a SQL oracle restates the
    identical literals and sequential fold).  ``arrow=True`` (default)
    computes the same ``out_dim`` sequential folds in one vectorized
    Arrow batch kernel — bit-identical per coordinate (see
    :func:`_seq_dot64`) where the Column twin (``arrow=False``) pays
    ``out_dim x dim`` interpreter dispatches per row."""
    v = F.col(vec) if isinstance(vec, str) else vec
    scale = 1.0 / float(np.sqrt(out_dim))
    planes_list = [[float(x) * scale for x in p]
                   for p in _planes(dim, out_dim, seed)]
    if arrow:
        from pyspark.sql.functions import pandas_udf

        P = np.asarray(planes_list)  # (out_dim, dim) float64

        @pandas_udf("array<double>")
        def _proj(vs: pd.Series) -> pd.Series:
            if not len(vs):
                return pd.Series([], dtype=object)
            X = _f64_rows(vs)
            out = np.empty((len(X), out_dim))
            for jo in range(out_dim):
                acc = np.zeros(len(X))
                for j in range(X.shape[1]):
                    acc += X[:, j] * P[jo, j]
                out[:, jo] = acc
            return pd.Series(list(out))

        return _proj(v)
    planes = F.lit(planes_list)
    return F.transform(
        F.sequence(F.lit(0), F.lit(out_dim - 1)),
        lambda j: dot(v, F.element_at(planes, j + 1)))
