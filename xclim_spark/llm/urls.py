"""URL canonicalization + domain-level deduplication — the standard
training-pipeline curation stage (CCNet/C4-style corpora key documents
by a normalized URL and curate the domain mix by per-domain counts).

Everything is pure Column expressions (Java regex in Spark, RE2 in
DuckDB — patterns stay in the common subset: no lookaround, no
backreferences), so the canonical key a 1000-executor cluster computes
map-side is byte-identical to what any SQL auditor recomputes.

Scope: absolute ``http(s)://`` URLs with host[:port] authorities.
Userinfo (``user@host``) and IPv6 bracket hosts are passed through
un-normalized (lowercased like any authority) — out of scope for
corpus curation, documented rather than half-handled.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "canonicalize_url",
    "registered_domain",
    "url_dedup",
    "domain_counts",
    "TRACKING_PARAMS_PATTERN",
    "MULTI_PART_SUFFIXES",
]

# Tracking/click-id query parameters stripped during canonicalization —
# they vary per referral, never per resource.  Anchored alternation,
# portable across Java regex and RE2.
TRACKING_PARAMS_PATTERN = (
    r"^(utm_[^=&]*|fbclid|gclid|msclkid|mc_eid|igshid|ref_src)(=.*)?$"
)

# Minimal embedded multi-part public suffixes (the full Mozilla PSL is
# ~9k entries and injectable via ``extra_suffixes`` in production —
# same documented-subset contract as C4_BAD_WORDS).
MULTI_PART_SUFFIXES = [
    "co.uk", "org.uk", "gov.uk", "ac.uk", "com.au", "net.au",
    "co.jp", "co.in", "co.kr", "com.br", "com.cn", "com.mx",
]


def canonicalize_url(url) -> Column:
    """Canonical form of an absolute URL, as one Column expression:

    * scheme and host lowercased;
    * default port stripped (``:80`` for http, ``:443`` for https);
    * fragment removed;
    * tracking query parameters removed
      (:data:`TRACKING_PARAMS_PATTERN`), remaining parameters sorted
      by byte order and re-joined;
    * empty path becomes ``/``.

    Non-http(s) inputs (no ``://``) come back unchanged — callers
    filter or flag them upstream.
    """
    u = url if isinstance(url, Column) else F.col(url)
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    auth = F.lower(F.regexp_extract(
        u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    host = (
        F.when(scheme == "http", F.regexp_replace(auth, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(auth, r":443$", ""))
        .otherwise(auth)
    )
    path = F.regexp_extract(
        u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    path = F.when(path == "", "/").otherwise(path)
    # Strip the fragment BEFORE looking for the query: a '?' inside the
    # fragment (http://h/p#/route?tab=1) is fragment content, not a
    # query string, and must not resurface in the canonical key.
    qraw = F.regexp_extract(
        F.regexp_replace(u, r"#.*$", ""), r"\?(.*)$", 1)
    qkept = F.array_sort(F.filter(
        F.split(qraw, "&"),
        lambda p: (F.length(p) > 0)
        & ~p.rlike(TRACKING_PARAMS_PATTERN),
    ))
    q = F.array_join(qkept, "&")
    canon = F.concat(
        scheme, F.lit("://"), host, path,
        F.when(q == "", "").otherwise(F.concat(F.lit("?"), q)),
    )
    return F.when(scheme == "", u).otherwise(canon)


def registered_domain(host, *, extra_suffixes: list[str] | None = None
                      ) -> Column:
    """Registrable domain of a (lowercased) host: the last two labels,
    or the last three when the last two form a known multi-part public
    suffix (:data:`MULTI_PART_SUFFIXES` + ``extra_suffixes``).  A
    bare single-label host comes back unchanged."""
    h = host if isinstance(host, Column) else F.col(host)
    # ports/userinfo never reach here from canonicalize_url output, but
    # strip a trailing :port defensively for direct host inputs
    h = F.regexp_replace(h, r":\d+$", "")
    parts = F.split(h, r"\.")
    n = F.size(parts)
    last2 = F.concat_ws(".", F.element_at(parts, -2),
                        F.element_at(parts, -1))
    suffixes = MULTI_PART_SUFFIXES + list(extra_suffixes or [])
    is_multi = F.array_contains(
        F.array(*[F.lit(s) for s in suffixes]), last2)
    last3 = F.concat_ws(".", F.element_at(parts, -3), last2)
    return (
        F.when(n <= 1, h)
        .when((n >= 3) & is_multi, last3)
        .otherwise(last2)
    )


def _canon_host(canon) -> Column:
    return F.regexp_extract(canon, r"^[a-z][a-z0-9+.-]*://([^/?#]*)", 1)


def url_dedup(
    docs: DataFrame,
    *,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact dedup on the canonical URL: one groupBy on the canonical
    key (computed map-side — partial aggregation means only one row
    per canonical key per partition shuffles), keeping the minimum
    ``id_col`` as the exemplar.  Returns
    ``canon_url, domain, kept_doc_id, n_dups`` — trivially 100 TB: the
    shuffle key is the canonical string, no skew beyond genuinely
    hot URLs (which a count cap downstream handles)."""
    canon = canonicalize_url(F.col(url_col))
    return (
        docs.select(F.col(id_col).alias("_id"), canon.alias("canon_url"))
        .withColumn("domain", registered_domain(_canon_host(F.col("canon_url"))))
        .groupBy("canon_url", "domain")
        .agg(F.min("_id").alias("kept_doc_id"),
             F.count(F.lit(1)).alias("n_dups"))
    )


def domain_counts(
    docs: DataFrame,
    *,
    url_col: str = "url",
    dedup_first: bool = True,
) -> DataFrame:
    """Per-registered-domain document counts for domain-mix curation
    (the CCNet/Gopher head/middle/tail-domain balancing input).  With
    ``dedup_first`` the count is of DISTINCT canonical URLs per domain
    (two aggregations, both partial map-side); otherwise raw rows."""
    canon = canonicalize_url(F.col(url_col))
    d = docs.select(canon.alias("canon_url")).withColumn(
        "domain", registered_domain(_canon_host(F.col("canon_url"))))
    if dedup_first:
        d = d.dropDuplicates(["canon_url"])
    return d.groupBy("domain").agg(F.count(F.lit(1)).alias("n_docs"))
