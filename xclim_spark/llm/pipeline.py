"""Training-data pipeline operators: benchmark decontamination,
deterministic mixture sampling, catalog fan-out helpers.

These are the corpus-curation steps a pretraining pipeline runs between
dedup and shuffling into the training mix (cf. GPT-3 appendix A / Pile /
Gopher section A1.2 descriptions of n-gram decontamination and per-source
mixture weights).

Scale design (the part that matters at 100 TB):

* **decontaminate** — the benchmark side is tiny relative to the corpus
  (eval sets are MBs, corpora are TBs), so its distinct n-gram set is
  broadcast; corpus n-grams are generated map-side inside the scan
  projection and hash-joined against the broadcast set without ever
  shuffling document text.  The per-document verdict is a map-side
  aggregation over the exploded grams keyed by ``doc_id`` — the only
  exchange carries ``(doc_id, counters)``.
* **mixture_sample** — pure stateless filter: the keep/drop decision is a
  deterministic function of ``md5(source | id)`` compared against a
  per-source hex threshold, so it needs **zero shuffles**, is reproducible
  across engines and runs, and re-sampling with a different rate table
  keeps maximal overlap between samples (threshold sampling is monotone:
  raising a source's rate only adds documents).  No RNG state, no
  ``sample()`` nondeterminism, no skew sensitivity.

The md5-threshold trick also makes the operator *oracle-portable*: Spark
and DuckDB produce identical lowercase hex digests, so correctness can be
verified bit-for-bit by an independent engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "word_ngrams",
    "ngrams_from_tokens",
    "repetition_stats",
    "pack_sequences",
    "decontaminate",
    "hex_threshold",
    "sample_hash",
    "mixture_sample",
    "stratified_topn",
    "gopher_repetition_flags",
    "GOPHER_REPETITION_THRESHOLDS",
]


def _tokens(text) -> Column:
    return F.split(F.lower(F.trim(text)), r"\s+")


def ngrams_from_tokens(toks, n: int) -> Column:
    """Word n-grams from an ALREADY-MATERIALIZED token-array column.

    ``toks`` must be a bound attribute (produced by a previous
    projection), not an inline ``split(...)`` expression: Catalyst does
    not hoist subexpressions out of higher-order-function lambdas, so an
    inline split would re-tokenize the document once per n-gram —
    measured 5-6x slower at corpus scale.  CollapseProject keeps the
    two-step form intact because the alias is referenced multiple times
    by a non-cheap expression.
    """
    toks = F.col(toks) if isinstance(toks, str) else toks
    # sequence(1, 0) would yield [1, 0] (Spark infers step -1), so short
    # documents must short-circuit to an empty array explicitly
    idx = F.when(
        F.size(toks) >= n, F.sequence(F.lit(1), F.size(toks) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(
        idx, lambda i: F.array_join(F.slice(toks, i, n), " ")
    )


def word_ngrams(text, n: int = 13) -> Column:
    """Lowercased whitespace-token word n-grams of ``text`` as an array of
    space-joined strings.  Documents shorter than ``n`` tokens yield an
    empty array.

    The standard decontamination unit: GPT-3 used 13-gram overlap, The
    Pile 13-grams, PaLM 8-grams.  The token array is BOUND as a lambda
    variable (single-element transform, same trick as
    ``dedup.word_shingles``) so the split runs once per row even in this
    inline form — an outer expression referenced inside a higher-order
    lambda would re-evaluate per n-gram.
    """
    return F.element_at(
        F.transform(F.array(_tokens(text)),
                    lambda w: ngrams_from_tokens(w, n)), 1
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
    bench_text_col: str | None = None,
) -> DataFrame:
    """Flag training documents that share any word ``n``-gram with a
    benchmark/eval set.

    Returns one row per input document: ``(id_col, total_grams,
    dirty_grams, contaminated)``.  ``contaminated`` is true when at least
    one of the document's n-grams appears verbatim in the benchmark.

    Plan shape: ``benchmark`` → distinct n-gram table (small; broadcast);
    ``docs`` → explode n-grams map-side → broadcast left join → count
    matches per document.  The corpus is read once; the only exchange is
    the final per-``doc_id`` aggregation (and it is partial-aggregated
    map-side first).
    """
    bench_text_col = bench_text_col or text_col
    bench_grams = (
        benchmark.select(_tokens(F.col(bench_text_col)).alias("_toks"))
        .select(F.explode(ngrams_from_tokens("_toks", n)).alias("gram"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    grams = docs.select(
        F.col(id_col), _tokens(F.col(text_col)).alias("_toks")
    ).select(
        F.col(id_col),
        F.explode_outer(ngrams_from_tokens("_toks", n)).alias("gram"),
    )
    joined = grams.join(F.broadcast(bench_grams), "gram", "left")
    return joined.groupBy(id_col).agg(
        F.count("gram").alias("total_grams"),
        F.coalesce(F.sum("hit"), F.lit(0)).alias("dirty_grams"),
        (F.coalesce(F.sum("hit"), F.lit(0)) > 0).alias("contaminated"),
    )


def hex_threshold(rate: float, digits: int = 8) -> str:
    """The ``digits``-char lowercase hex string ``t`` such that a uniform
    ``digits``-nibble hex draw is ``< t`` with probability ``rate``."""
    space = 16 ** digits
    cut = min(max(int(round(rate * space)), 0), space)
    if cut >= space:
        # 'g' > 'f' lexicographically, so rate>=1.0 keeps everything
        return "g" * digits
    return format(cut, f"0{digits}x")


def sample_hash(source, key) -> Column:
    """Deterministic per-row sampling hash: first 8 hex chars of
    ``md5(source || '|' || key)``.  Lowercase hex compares identically in
    Spark and DuckDB, making the sample reproducible across engines."""
    return F.substring(
        F.md5(F.concat_ws("|", source.cast("string"), key.cast("string"))),
        1, 8,
    )


def mixture_sample(
    df: DataFrame,
    rates: dict[str, float],
    source_col: str = "source",
    key_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic stratified sampling to a target per-source mixture.

    ``rates`` maps source values to keep probabilities.  A row is kept
    iff ``md5(source|key)[:8] < hex_threshold(rate[source])`` — stateless,
    shuffle-free, reproducible, and monotone in the rate (raising a
    source's weight strictly grows its sample).  Unlisted sources fall
    back to ``default_rate``.
    """
    h = sample_hash(F.col(source_col), F.col(key_col))
    thresh = F.lit(hex_threshold(default_rate))
    for src, rate in sorted(rates.items()):
        thresh = F.when(
            F.col(source_col) == src, F.lit(hex_threshold(rate))
        ).otherwise(thresh)
    return df.filter(h < thresh)


def stratified_topn(
    df: DataFrame,
    n: int,
    group_col: str = "source",
    key_col: str = "doc_id",
) -> DataFrame:
    """Deterministic EXACT-COUNT stratified sampling: at most ``n``
    rows per group, chosen as the group's ``n`` smallest
    ``md5(group|key)`` hashes — the fixed-quota sibling of
    :func:`mixture_sample` (rate sampling gives binomial counts; domain
    caps, eval-set carving and head-domain throttling need exact
    quotas).

    Properties shared with the threshold sampler: stateless and
    engine-reproducible (same lowercase-hex md5 ordering in Spark and
    DuckDB), monotone in ``n`` (raising a quota strictly grows the
    sample), and decided by hash, not input order, so re-partitioning
    or re-ingesting cannot change the draw.

    Plan shape at 100 TB: one hash-partitioned ``row_number`` window
    per group — a single shuffle on ``group_col``; no global sort, no
    driver collection.  A skewed group (one domain = half the corpus)
    makes one hot partition: cap such domains upstream with
    ``domain_counts`` or run this after a coarse ``mixture_sample``
    prefilter.
    """
    from pyspark.sql import Window

    rn = "_rn"
    while rn in df.columns:  # never clobber a caller's column
        rn += "_"
    w = Window.partitionBy(group_col).orderBy(
        sample_hash(F.col(group_col), F.col(key_col)),
        F.col(key_col))
    return (df.withColumn(rn, F.row_number().over(w))
            .filter(F.col(rn) <= n).drop(rn))


def repetition_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Within-document repetition measures (Gopher section A1.1-style
    quality filters): fraction of tokens taken by the most frequent
    word / bigram, and the distinct-token fraction.

    Shape: explode tokens -> two-level aggregation keyed by
    ``(doc, token)`` then ``doc``.  Both levels partial-aggregate
    map-side; the per-token frequency never needs the text after the
    first projection, and no per-document O(len^2) array scan exists —
    the relational form stays linear at 100 TB.
    """
    pre = docs.select(
        F.col(id_col), _tokens(F.col(text_col)).alias("_toks")
    )

    def _top_frac(grams: Column, out_prefix: str) -> DataFrame:
        t = pre.select(F.col(id_col), F.explode(grams).alias("g"))
        c = t.groupBy(id_col, "g").agg(F.count(F.lit(1)).alias("cnt"))
        return c.groupBy(id_col).agg(
            (F.max("cnt") / F.sum("cnt")).alias(f"top_{out_prefix}_frac"),
            (F.count(F.lit(1)) / F.sum("cnt")).alias(
                f"distinct_{out_prefix}_frac"),
        )

    uni = _top_frac(F.col("_toks"), "word")
    bi = _top_frac(ngrams_from_tokens("_toks", 2), "bigram") \
        .drop("distinct_bigram_frac")
    return uni.join(bi, id_col, "left")


def pack_sequences(
    docs: DataFrame,
    context_len: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    stream_col: str | None = "source",
) -> DataFrame:
    """Assign documents to fixed-size training contexts — the GPT-style
    "concatenate the stream, chunk every ``context_len`` tokens" packing,
    expressed relationally: a running token total per stream (ordered by
    ``id_col``, so the packing is deterministic and reproducible) and
    ``pack_id = (cumsum - ntok) // context_len`` — the pack a document
    STARTS in.

    Scale shape: one window pass per stream partition (one sort, one
    exchange keyed by ``stream_col``).  Streams are independent, so a
    100 TB corpus packs in parallel across sources/shards; there is no
    driver-side loop and no state beyond the running sum.  A document
    longer than ``context_len`` simply spans packs, exactly like the
    training-time chunker.
    """
    from pyspark.sql import Window

    ntok = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    part = [stream_col] if stream_col else []
    w = (Window.partitionBy(*part).orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, 0))
    cum = F.sum(ntok).over(w)
    return docs.withColumn("ntok", ntok).withColumn(
        "pack_id", F.floor((cum - ntok) / context_len).cast("long")
    )


GOPHER_REPETITION_THRESHOLDS: dict[str, float] = {
    "dup_line_frac": 0.30, "dup_para_frac": 0.30,
    "dup_line_char_frac": 0.20, "dup_para_char_frac": 0.20,
    "top_2gram_char_frac": 0.20, "top_3gram_char_frac": 0.18,
    "top_4gram_char_frac": 0.16,
    "dup_5gram_char_frac": 0.15, "dup_6gram_char_frac": 0.14,
    "dup_7gram_char_frac": 0.13, "dup_8gram_char_frac": 0.12,
    "dup_9gram_char_frac": 0.11, "dup_10gram_char_frac": 0.10,
}


def gopher_repetition_flags(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    thresholds: dict[str, float] | None = None,
) -> DataFrame:
    """The full Gopher repetition-removal rules (Rae et al. 2021,
    Table A1) — the within-document half of the Gopher filter pair
    (:func:`~xclim_spark.llm.text.gopher_quality_flags` is the
    document-quality half):

    * duplicate line / paragraph fractions (occurrences beyond the
      first, over all occurrences) and their CHARACTER fractions
      (characters of repeated occurrences over all line/para chars);
    * top 2/3/4-gram character fraction — chars covered by the most
      frequent word n-gram (count x gram length; ties break to the
      longer gram, then lexicographically);
    * duplicate 5..10-gram character fraction — the TRUE union of
      character intervals covered by n-grams occurring more than once
      (overlapping occurrences are not double-counted), per n.

    Definitions are over the whitespace-normalized lowercased token
    stream (tokens joined by single spaces) so both engines measure
    the same character space regardless of the original whitespace;
    line/para fractions use the raw '\\n' / '\\n\\n' splits.

    Every statistic is WITHIN-document, so the whole operator is one
    Arrow ``mapInPandas`` pass — embarrassingly parallel, zero
    shuffles, linear per document (compare :func:`repetition_stats`'s
    relational two-level aggregation, which pays two corpus shuffles
    to get two of these thirteen columns).  Returns
    ``id_col, <13 fractions>, keep`` with the Table A1 thresholds.
    """
    import numpy as np
    import pandas as pd

    from .dedup import _ws_tokens

    th = dict(GOPHER_REPETITION_THRESHOLDS)
    th.update(thresholds or {})
    cols = list(GOPHER_REPETITION_THRESHOLDS)

    def _dup_fracs(parts: list[str]) -> tuple[float, float]:
        counts: dict[str, int] = {}
        for p in parts:
            counts[p] = counts.get(p, 0) + 1
        tot = len(parts)
        chars = sum(len(p) * c for p, c in counts.items())
        dup = sum(c - 1 for c in counts.values())
        dchars = sum(len(p) * (c - 1) for p, c in counts.items())
        return (dup / tot if tot else 0.0,
                dchars / chars if chars else 0.0)

    def _stats(it):
        gram_cols = ([f"top_{n}gram_char_frac" for n in (2, 3, 4)]
                     + [f"dup_{n}gram_char_frac" for n in range(5, 11)])
        for pdf in it:
            D = len(pdf)
            texts = list(pdf[text_col])
            valid = [k for k, t in enumerate(texts) if t is not None]
            res = {c: np.full(D, np.nan) for c in cols}
            toks_per: dict[int, list[str]] = {}
            for k in valid:
                t = texts[k]
                res["dup_line_frac"][k], res["dup_line_char_frac"][k] = \
                    _dup_fracs(t.split("\n"))
                res["dup_para_frac"][k], res["dup_para_char_frac"][k] = \
                    _dup_fracs(t.split("\n\n"))
                toks_per[k] = _ws_tokens(t.lower())
                for c in gram_cols:
                    res[c][k] = 0.0
            # ---- batch-vectorized gram statistics (the per-doc dict
            # loop was measured 28 s at sf1; this path is ~all numpy) --
            flat: list[str] = []
            doc_of_list: list[int] = []
            for k in valid:
                flat.extend(toks_per[k])
                doc_of_list.extend([k] * len(toks_per[k]))
            T = len(flat)
            if T:
                # np.unique sorts, so id order == lexicographic token
                # order — comparing id windows IS comparing gram strings
                _, inv = np.unique(np.asarray(flat, dtype=object),
                                   return_inverse=True)
                lens = np.fromiter((len(x) for x in flat),
                                   dtype=np.int64, count=T)
                doc_of = np.asarray(doc_of_list, dtype=np.int64)
                csum = np.cumsum(lens + 1)
                starts_g = csum - (lens + 1)
                docs_u, first_i = np.unique(doc_of, return_index=True)
                base_map = np.zeros(D, dtype=np.int64)
                base_map[docs_u] = starts_g[first_i]
                off = starts_g - base_map[doc_of]
                total = np.zeros(D, dtype=np.int64)
                np.add.at(total, doc_of, lens)
                ntok = np.bincount(doc_of, minlength=D)
                total += np.maximum(ntok - 1, 0)
                for n in range(2, 11):
                    if T < n:
                        continue
                    m = doc_of[:T - n + 1] == doc_of[n - 1:]
                    if not m.any():
                        continue
                    j = np.flatnonzero(m)
                    W = np.lib.stride_tricks.sliding_window_view(
                        inv, n)[m]
                    wdoc = doc_of[j]
                    sarr = off[j]
                    earr = off[j + n - 1] + lens[j + n - 1]
                    glen = earr - sarr
                    order = np.lexsort(
                        tuple(W[:, c] for c in reversed(range(n)))
                        + (wdoc,))
                    Ws, wd = W[order], wdoc[order]
                    newg = np.empty(len(order), dtype=bool)
                    newg[0] = True
                    newg[1:] = ((wd[1:] != wd[:-1])
                                | (Ws[1:] != Ws[:-1]).any(axis=1))
                    gid = np.cumsum(newg) - 1
                    gcount = np.bincount(gid)
                    if n <= 4:
                        gfirst = np.flatnonzero(newg)
                        gdoc = wd[gfirst]
                        g_glen = glen[order][gfirst]
                        cov = gcount * g_glen
                        # stable lexsort: ties in (count, glen) keep
                        # the (doc, window-lex) order -> lex-min gram
                        o2 = np.lexsort((-g_glen, -gcount, gdoc))
                        fm = np.empty(len(o2), dtype=bool)
                        fm[0] = True
                        fm[1:] = gdoc[o2][1:] != gdoc[o2][:-1]
                        chosen = o2[fm]
                        # Residual ties in (count, glen) must break on
                        # the space-JOINED gram string (oracle: gram
                        # ASC), which differs from token-id-sequence
                        # order only when a token carries chars below
                        # 0x20.  cov is count*glen so the fraction is
                        # pick-invariant; materialize strings only for
                        # the (rare) tied docs to keep the exact pick.
                        head = np.maximum.accumulate(
                            np.where(fm, np.arange(len(o2)), -1))
                        tie = ((gcount[o2] == gcount[o2[head]])
                               & (g_glen[o2] == g_glen[o2[head]]))
                        grp_of = np.cumsum(fm) - 1
                        tiecnt = np.bincount(
                            grp_of[tie], minlength=len(chosen))
                        for di in np.flatnonzero(tiecnt > 1):
                            cands = o2[tie & (grp_of == di)]
                            gram_of = {}
                            for g in cands:
                                p = j[order[gfirst[g]]]
                                gram_of[g] = " ".join(flat[p:p + n])
                            chosen[di] = min(
                                cands, key=lambda g: gram_of[g])
                        dk = gdoc[chosen]
                        res[f"top_{n}gram_char_frac"][dk] = (
                            cov[chosen] / total[dk])
                    else:
                        dupocc = gcount[gid] >= 2
                        cover = np.zeros(D, dtype=np.int64)
                        if dupocc.any():
                            sd = wd[dupocc]
                            ss = sarr[order][dupocc]
                            ee = earr[order][dupocc]
                            big = int(total.max()) + 2
                            gs = ss + sd * big
                            ge = ee + sd * big
                            o3 = np.argsort(gs, kind="stable")
                            gs, ge, sd3 = gs[o3], ge[o3], sd[o3]
                            runmax = np.maximum.accumulate(ge)
                            isl = np.empty(len(gs), dtype=bool)
                            isl[0] = True
                            isl[1:] = gs[1:] > runmax[:-1]
                            heads = np.flatnonzero(isl)
                            tails = np.append(heads[1:], len(gs)) - 1
                            np.add.at(cover, sd3[heads],
                                      runmax[tails] - gs[heads])
                        vk = np.asarray(valid, dtype=np.int64)
                        tz = total[vk] > 0
                        res[f"dup_{n}gram_char_frac"][vk[tz]] = (
                            cover[vk[tz]] / total[vk[tz]])
            out = {id_col: list(pdf[id_col])}
            vset = set(valid)
            for c in cols:
                out[c] = [float(res[c][k]) if k in vset else None
                          for k in range(D)]
            out["keep"] = [
                all(res[c][k] <= th[c] for c in cols) if k in vset
                else None
                for k in range(D)]
            yield pd.DataFrame(out)

    schema = (f"{id_col} long, "
              + ", ".join(f"{c} double" for c in cols)
              + ", keep boolean")
    src = docs.select(id_col, text_col)
    sc = docs.sparkSession.sparkContext
    if src.rdd.getNumPartitions() < sc.defaultParallelism:
        # a small/compacted source (one parquet file at gate scale)
        # would run the whole Arrow pass as a single task — the same
        # guard as duplicate_spans; a 100 TB corpus has many input
        # splits and skips this
        src = src.repartition(sc.defaultParallelism)
    return src.mapInPandas(_stats, schema)
