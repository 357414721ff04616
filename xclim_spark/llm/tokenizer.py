"""Distributed BPE tokenizer training + encoding (Sennrich, Haddow &
Birch 2016, "Neural Machine Translation of Rare Words with Subword
Units", §3.2) — the one standard pretraining-pipeline stage between
curation and packing: learn a merge table from the corpus, then encode
documents with it so per-source token budgets are exact instead of
heuristic (`bpe_ish_token_count`, llm/text.py, stays as the cheap
estimator; this is the real thing).

Scale design (what survives 100 TB):

* **One corpus-scale pass, ever.**  The full text is read exactly once,
  by :func:`word_counts` — a map-side-combined ``groupBy(word)`` whose
  shuffle carries ``(word, count)``, never text.  Everything after
  operates on the *distinct-word* table (bounded by vocabulary growth,
  ~10⁷ rows for web corpora — Heaps' law — vs 10¹¹ documents).
* **Per merge round**: adjacent symbol pairs are generated inside the
  projection (higher-order ``transform``, zero Python), aggregated with
  one ``groupBy(a, b)`` partial-aggregated on the map side, and exactly
  ONE row (the argmax pair) is collected.  The merge is then applied as
  a pure ``aggregate`` (fold) expression over the symbol arrays — no
  shuffle at all — and the table is ``localCheckpoint``-ed so K rounds
  do not stack K fold expressions into one Catalyst tree (the same
  flat-lineage pattern as the connected-components operators,
  llm/dedup.py).
* **Encoding is embarrassingly parallel**: the learned merge table is
  vocab-sized driver state shipped in the UDF closure (equivalently a
  broadcast); documents are encoded map-side in Arrow batches with a
  per-batch distinct-word cache, so a batch with 10⁶ token occurrences
  of 10⁴ distinct words does 10⁴ encodes.

Determinism contract (mirrored bit-for-bit by the DuckDB oracles in
queries.py): words are ``\\s+`` splits of the trimmed, lowercased text;
a word's initial symbols are its characters plus a final
:data:`END_OF_WORD` marker; pair counts weight each *adjacent
occurrence* by the word's corpus frequency (overlapping occurrences all
count, as in the reference implementation); the winning pair maximizes
(count, then lexicographically smallest ``(a, b)``); merge application
is a left fold that replaces each adjacent ``(a, b)`` greedily (a fold
never cascades: the merged symbol ``a||b`` can't equal ``a``, so one
pass per merge is exact).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "END_OF_WORD",
    "word_counts",
    "init_symbols",
    "merge_pair",
    "bpe_train",
    "bpe_encode_counts",
    "bpe_encode_words",
]

END_OF_WORD = "</w>"

# Adjacent symbol pairs, generated inside the projection.  ``syms`` must
# be a bound attribute (same HOF contract as ngrams_from_tokens,
# llm/pipeline.py): slice off the last element, pair each symbol with
# its successor via 0-based bracket indexing.
_PAIRS_EXPR = (
    "transform(slice(syms, 1, size(syms) - 1), "
    "(x, i) -> struct(x as a, syms[i + 1] as b))"
)


def word_counts(docs: DataFrame, *, text_col: str = "text",
                lowercase: bool = True) -> DataFrame:
    """Corpus word frequencies — the single full-text pass.  Returns
    ``(w, cnt)``; the groupBy partial-aggregates map-side so the
    shuffle carries one row per distinct word per partition."""
    t = F.trim(F.col(text_col))
    if lowercase:
        t = F.lower(t)
    return (
        docs.where(F.col(text_col).isNotNull())
        .select(F.explode(F.split(t, r"\s+")).alias("w"))
        .where(F.length("w") > 0)
        .groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))
    )


def init_symbols(wc: DataFrame) -> DataFrame:
    """Initial symbol arrays: characters plus the end-of-word marker."""
    return wc.withColumn(
        "syms", F.concat(F.split("w", ""), F.array(F.lit(END_OF_WORD))))


def merge_pair(syms_col, a: str, b: str) -> Column:
    """Apply one learned merge to a symbol-array column as a pure left
    fold (zero shuffle, zero Python): each adjacent ``(a, b)`` becomes
    ``a||b``, greedily left-to-right.  One pass is exact — the merged
    symbol can never re-match ``a`` (``a||b == a`` needs ``b = ''``)."""
    return F.aggregate(
        syms_col,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1),
                     F.array(F.lit(a + b))),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(
    docs: DataFrame,
    *,
    text_col: str = "text",
    num_merges: int = 10,
    min_count: int = 2,
    lowercase: bool = True,
) -> list[tuple[str, str, int]]:
    """Learn up to ``num_merges`` BPE merges from the corpus.  Returns
    ``[(left, right, pair_count), ...]`` in learned order; stops early
    when no pair reaches ``min_count``.

    Each round is one groupBy over the distinct-word table plus a
    1-row collect; the corpus text is never re-read."""
    st = init_symbols(word_counts(
        docs, text_col=text_col, lowercase=lowercase)
    ).select("cnt", "syms").localCheckpoint()
    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        best = (
            st.select("cnt", F.explode(F.expr(_PAIRS_EXPR)).alias("p"))
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("cnt").alias("c"))
            .orderBy(F.desc("c"), "a", "b")
            .limit(1)
            .collect()
        )
        if not best or int(best[0]["c"]) < min_count:
            break
        a, b, c = best[0]["a"], best[0]["b"], int(best[0]["c"])
        merges.append((a, b, c))
        st = st.withColumn("syms", merge_pair("syms", a, b)) \
               .localCheckpoint()
    return merges


def _encode_word(w: str, merges: list[tuple[str, str]]) -> list[str]:
    """Driver/executor-shared reference encode: sequential application
    of the learned merges.  Equivalent to rank-priority encoding — a
    merge's output symbol can only feed merges learned *after* it, so
    learned order IS rank order."""
    syms = list(w) + [END_OF_WORD]
    for a, b in merges:
        if len(syms) < 2:
            break
        out: list[str] = []
        for x in syms:
            if out and out[-1] == a and x == b:
                out[-1] = a + b
            else:
                out.append(x)
        syms = out
    return syms


def bpe_encode_words(text: str | None,
                     merges: list[tuple[str, str]],
                     *, lowercase: bool = True,
                     _cache: dict | None = None) -> list[list[str]]:
    """Encode one document to per-word token lists (empty for NULL or
    whitespace-only text).  ``_cache`` memoizes distinct words — the
    Arrow path shares one per batch."""
    if text is None:
        return []
    t = text.strip()
    if lowercase:
        t = t.lower()
    # explicit ASCII class: Python's unicode \s would also split on
    # \xa0 etc., diverging from Java/RE2 \s used by the Column path
    words = [w for w in re.split("[ \t\n\x0b\f\r]+", t) if w]
    cache = _cache if _cache is not None else {}
    out = []
    for w in words:
        got = cache.get(w)
        if got is None:
            got = cache[w] = _encode_word(w, merges)
        out.append(got)
    return out


def bpe_encode_counts(
    docs: DataFrame,
    merges: list[tuple[str, str, int]] | list[tuple[str, str]],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
) -> DataFrame:
    """Exact per-document token counts under the learned tokenizer:
    ``(id_col, n_words, n_tokens)``.  Map-side Arrow batches with a
    per-batch distinct-word cache; the merge table rides the closure
    (vocab-sized).  NULL/empty documents keep zero rows counts."""
    mg = [(m[0], m[1]) for m in merges]

    def _counts(it):
        import pandas as pd
        for pdf in it:
            cache: dict = {}
            nw, nt = [], []
            for t in pdf[text_col]:
                enc = bpe_encode_words(
                    t, mg, lowercase=lowercase, _cache=cache)
                nw.append(len(enc))
                nt.append(sum(len(e) for e in enc))
            yield pd.DataFrame({
                id_col: pdf[id_col], "n_words": nw, "n_tokens": nt})

    return docs.select(id_col, text_col).mapInPandas(
        _counts, schema=f"{id_col} long, n_words long, n_tokens long")
