"""Deduplication operators: exact, MinHash+LSH near-dup, SimHash.

Scale design (the part that matters at 100 TB):

* everything heavy is computed **map-side per document** (shingles,
  hashes, signatures) as pure Column expressions;
* the only shuffles carry **fixed-size keys** — a 16-byte digest (exact),
  a (band, bucket-hash, doc_id) triple (MinHash LSH), a 64-bit sketch
  (SimHash).  Document text never crosses the network;
* candidate verification joins the candidate-pair ids back to the
  (doc_id, shingle-hash array) projection — the array is bounded by
  document length and only flows for candidates, never all pairs.

No all-pairs cross join exists anywhere in this module.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "exact_duplicates",
    "word_shingles",
    "shingle_hashes",
    "minhash_signature",
    "lsh_band_buckets",
    "near_duplicates",
    "simhash",
    "jaccard",
]

_MERSENNE31 = 2147483647  # 2^31 - 1, prime modulus for universal hashing


def exact_duplicates(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup groups: md5 computed map-side, shuffle carries only the
    digest + id."""
    return docs.groupBy(F.md5(text_col).alias("text_hash")).agg(
        F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("dup_count")
    )


def word_shingles(text, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a text Column (pure expressions:
    split -> transform over a sequence -> array_distinct).

    The split result is bound as a lambda variable (via a single-element
    transform) — referencing an outer expression inside a higher-order
    lambda re-evaluates it per element, turning shingling O(words^2);
    binding keeps it one split per row (15x at sf0.1)."""
    words = F.split(F.trim(text), r"\s+")

    def shingle(w: Column) -> Column:
        grams = F.transform(
            F.sequence(F.lit(0), F.size(w) - n),
            lambda i: F.concat_ws(
                " ", *[F.element_at(w, (i + j + 1).cast("int"))
                       for j in range(n)]
            ),
        )
        return F.when(F.size(w) >= n, F.array_distinct(grams)).otherwise(
            F.array().cast("array<string>")
        )

    return F.element_at(F.transform(F.array(words), shingle), 1)


def shingle_hashes(shingles) -> Column:
    """Map each shingle into the 31-bit universal-hash domain."""
    return F.transform(
        shingles, lambda s: F.pmod(F.xxhash64(s), F.lit(_MERSENNE31))
    )


def _perm_coeffs(k: int, seed: int) -> list[tuple[int, int]]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE31, size=k, dtype=np.int64)
    b = rng.randint(0, _MERSENNE31, size=k, dtype=np.int64)
    return list(zip(a.tolist(), b.tolist()))


def minhash_signature(hashes, k: int = 128, seed: int = 7) -> Column:
    """k-permutation MinHash signature (array<long> of length k).

    Permutation j is the universal hash ``(a_j h + b_j) mod p`` with
    driver-seeded coefficients; products stay under 2^62 so 64-bit
    arithmetic never overflows.  Entirely Column expressions — the
    signature is computed map-side next to the scan.
    """
    coeffs = F.array(*[
        F.struct(F.lit(a).alias("a"), F.lit(b).alias("b"))
        for a, b in _perm_coeffs(k, seed)
    ])
    return F.transform(
        coeffs,
        lambda c: F.array_min(
            F.transform(
                hashes,
                lambda h: F.pmod(c["a"] * h + c["b"], F.lit(_MERSENNE31)),
            )
        ),
    )


def lsh_band_buckets(sig, bands: int, rows: int) -> Column:
    """Split a signature into ``bands`` bands of ``rows`` and hash each:
    array of (band, bucket) structs.  Two docs are candidates iff any band
    bucket matches — P(candidate) = 1-(1-J^rows)^bands."""
    return F.array(*[
        F.struct(
            F.lit(i).alias("band"),
            F.hash(F.slice(sig, i * rows + 1, rows)).alias("bucket"),
        )
        for i in range(bands)
    ])


def jaccard(a, b) -> Column:
    """Exact Jaccard of two distinct-element arrays (integer ratio — the
    same bits in any engine)."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return inter.cast("double") / union


def near_duplicates(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.6,
    num_perm: int = 128,
    bands: int = 64,
    seed: int = 7,
    parallelism: int | None = None,
    lazy: bool = False,
) -> DataFrame:
    """MinHash+LSH near-duplicate pairs with exact-Jaccard verification.

    Pipeline (each stage one narrow projection or one keyed shuffle):

    1. shingle + hash + signature map-side;
    2. explode band buckets -> shuffle on (band, bucket) -> self-join
       within buckets only (``id_a < id_b``), distinct candidate pairs;
    3. join candidates back to shingle arrays, verify exact word-shingle
       Jaccard, keep pairs ``>= threshold``.

    With bands=64 x rows=2 the candidate-recall at J=0.6 is
    1-(1-0.36)^64 ~= 1-4e-13, so verified output matches the exact
    all-pairs answer (the DuckDB oracle) while never materializing all
    pairs.  Returns ``id_a, id_b, jaccard``.

    ``parallelism``: shingling is compute-dense, so stage parallelism is
    whatever the *scan* provides.  On a real corpus (many files / row
    groups) that is already the cluster width — leave ``None``.  On a
    single-file local input the scan is one task; passing the core count
    redistributes ``(id, text)`` on ``id`` first (one bounded pass of
    the corpus) and, because explode/groupBy(id) reuse that hash
    partitioning, the signature aggregation then needs no further
    shuffle.
    """
    rows = num_perm // bands
    src = docs.select(F.col(id_col).alias("_id"), F.col(text_col))
    if parallelism:
        src = src.repartition(parallelism, "_id")
    # persist the digest table: it feeds the signature path AND both
    # sides of the verification join — without it the corpus text is
    # re-scanned and re-shingled three times (the digests are ~10x
    # smaller than the text they replace, so this is the cheap side of
    # the trade at any scale)
    base = src.select(
        "_id",
        shingle_hashes(word_shingles(F.col(text_col), n)).alias("_sh"),
    ).filter(F.size("_sh") > 0).persist()
    # Signature via explode + k min-aggregates: nested higher-order
    # lambdas are interpreted row-at-a-time in Spark, but plain aggregates
    # are whole-stage-codegen'd with map-side partial min — the shuffle
    # carries one k-long partial signature per (map task, doc).
    coeffs = _perm_coeffs(num_perm, seed)
    exploded = base.select("_id", F.explode("_sh").alias("_h"))
    aggs = [
        F.min(F.pmod(F.lit(a) * F.col("_h") + F.lit(b),
                     F.lit(_MERSENNE31))).alias(f"_s{j}")
        for j, (a, b) in enumerate(coeffs)
    ]
    sigs = exploded.groupBy("_id").agg(*aggs).select(
        "_id", F.array(*[f"_s{j}" for j in range(num_perm)]).alias("_sig")
    )
    bucketed = sigs.select(
        "_id", F.explode(lsh_band_buckets(F.col("_sig"), bands, rows))
        .alias("_bb")
    ).select("_id", "_bb.band", "_bb.bucket")
    left = bucketed.select(F.col("_id").alias("id_a"), "band", "bucket")
    right = bucketed.select(F.col("_id").alias("id_b"), "band", "bucket")
    cand = (
        left.join(right, on=["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    sh_a = base.select(F.col("_id").alias("id_a"), F.col("_sh").alias("_sh_a"))
    sh_b = base.select(F.col("_id").alias("id_b"), F.col("_sh").alias("_sh_b"))
    verified = (
        cand.join(sh_a, "id_a").join(sh_b, "id_b")
        .withColumn("jaccard", jaccard("_sh_a", "_sh_b"))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    if lazy:
        # caller owns the digest cache: the returned plan reads ``base``
        # (persisted) twice; call spark.catalog.clearCache() (or keep a
        # handle via verified.sparkSession) after the last action
        return verified
    # Default: materialize the (dup-sized, corpus-bounded) pair table and
    # release the corpus-sized digest cache before returning, so repeated
    # library calls don't accumulate cached blocks (the pairs output is
    # orders of magnitude smaller than the digests that produced it).
    out = verified.localCheckpoint(eager=True)
    base.unpersist()
    return out


def simhash(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    bits: int = 64,
    parallelism: int | None = None,
) -> DataFrame:
    """64-bit SimHash sketch per document: per-bit majority vote over word
    n-gram shingle hashes.  Near-dups differ in few bits (Hamming
    distance); candidate generation then groups on sketch prefixes.

    Same scale shape as the MinHash path: shingle hashes explode map-side,
    the per-bit counts are plain codegen'd sum-aggregates with map-side
    combine, and the shuffle carries one 64-counter partial per (task,
    doc).  Returns ``id_col, simhash`` (long).  ``parallelism``: same
    single-file-input escape hatch as :func:`near_duplicates`."""
    src = docs.select(F.col(id_col), F.col(text_col))
    if parallelism:
        src = src.repartition(parallelism, id_col)
    exploded = src.select(
        F.col(id_col),
        F.explode(
            F.transform(word_shingles(F.col(text_col), n),
                        lambda s: F.xxhash64(s))
        ).alias("_h"),
    )
    aggs = [F.count(F.lit(1)).alias("_m")]
    for i in range(bits):
        aggs.append(
            F.sum(F.shiftrightunsigned("_h", i).bitwiseAND(F.lit(1))
                  .cast("long")).alias(f"_b{i}")
        )
    g = exploded.groupBy(id_col).agg(*aggs)
    sketch = F.lit(0).cast("long")
    for i in range(bits):
        mask = F.lit((1 << i) if i < 63 else -(1 << 63)).cast("long")
        sketch = sketch.bitwiseOR(
            F.when(F.col(f"_b{i}") * 2 >= F.col("_m"), mask)
            .otherwise(F.lit(0).cast("long"))
        )
    return g.select(F.col(id_col), sketch.alias("simhash"))
