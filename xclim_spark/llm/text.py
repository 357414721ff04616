"""Text analysis operators: language id, quality scoring, token counting,
fingerprinting.

All pure Column expressions over the text column — the scoring runs inside
the scan projection (map-side, whole-stage codegen); only aggregated
results shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "whitespace_tokens",
    "token_count",
    "bpe_ish_token_count",
    "type_token_ratio",
    "punct_ratio",
    "alpha_ratio",
    "mean_word_length",
    "stopword_ratio",
    "quality_score",
    "gopher_quality_flags",
    "GOPHER_REQUIRED_WORDS",
    "c4_clean_lines",
    "c4_quality_flags",
    "C4_BAD_WORDS",
    "unicode_normalize",
    "language_id",
    "winnowing_fingerprints",
    "pii_counts",
    "redact_pii",
    "STOPWORDS",
    "PII_PATTERNS",
]

# Minimal per-language stopword lists (top function words) — the classic
# stopword-profile language-id heuristic.
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "of", "and", "to", "in", "a", "is", "that", "it", "for"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une", "du", "est"],
    "de": ["der", "die", "und", "das", "ist", "von", "den", "mit", "nicht",
           "ein"],
    "es": ["el", "la", "de", "que", "y", "los", "en", "un", "una", "es"],
    "it": ["di", "il", "che", "la", "e", "per", "un", "una", "del", "non"],
}


def whitespace_tokens(text) -> Column:
    return F.split(F.trim(text), r"\s+")


def token_count(text) -> Column:
    """Whitespace token count."""
    return F.size(whitespace_tokens(text))


def bpe_ish_token_count(text) -> Column:
    """Sub-word-ish token count: splits on whitespace AND at
    letter/digit/punctuation boundaries (a cheap proxy for BPE token
    counts — ~#segments a byte-pair tokenizer would not merge across)."""
    pieces = F.split(
        F.trim(text), r"(\s+|(?<=[a-zA-Z])(?=[0-9])|(?<=[0-9])(?=[a-zA-Z])"
        r"|(?<=[^\w\s])|(?=[^\w\s]))"
    )
    return F.size(F.filter(pieces, lambda p: p != ""))


def type_token_ratio(text) -> Column:
    """Distinct words / words (case-folded) — low values flag
    boilerplate/repetition."""
    toks = whitespace_tokens(F.lower(text))
    return F.size(F.array_distinct(toks)).cast("double") / F.size(toks)


def punct_ratio(text) -> Column:
    stripped = F.regexp_replace(text, r"[^\p{Punct}]", "")
    return F.length(stripped).cast("double") / F.length(text)


def alpha_ratio(text) -> Column:
    stripped = F.regexp_replace(text, r"[^A-Za-z]", "")
    return F.length(stripped).cast("double") / F.length(text)


def mean_word_length(text) -> Column:
    toks = whitespace_tokens(text)
    return F.aggregate(
        toks, F.lit(0.0), lambda acc, w: acc + F.length(w)
    ) / F.size(toks)


def _stopword_hits(text, words: list[str]) -> Column:
    """Count stopword tokens (with multiplicity) via one regexp pass —
    higher-order-function lambdas can't close over literal lists in
    classic PySpark, and a single compiled regex is faster anyway."""
    pat = r"(?:(?<=\s)|^)(?:" + "|".join(words) + r")(?=\s|$)"
    return F.regexp_count(F.lower(text), F.lit(pat))


def stopword_ratio(text, lang: str = "en") -> Column:
    hits = _stopword_hits(text, STOPWORDS[lang])
    return hits.cast("double") / F.size(whitespace_tokens(text))


def quality_score(text) -> Column:
    """Composite [0,1] quality heuristic (Gopher/C4-style signals):
    length in range, word lengths sane, low repetition, mostly alphabetic.
    Each signal clamps to [0,1]; the score is their mean."""
    toks = token_count(text)
    len_ok = F.least(toks.cast("double") / 20.0, F.lit(1.0)) * F.least(
        F.lit(1.0), 2000.0 / F.greatest(toks.cast("double"), F.lit(1.0))
    )
    mwl = mean_word_length(text)
    wl_ok = F.when((mwl >= 2.0) & (mwl <= 12.0), 1.0).otherwise(0.0)
    ttr = type_token_ratio(text)
    alpha = alpha_ratio(text)
    # alpha weighted double: symbol soup must not ride a perfect TTR past
    # repetitive-but-textual content
    return (len_ok + wl_ok + ttr + 2.0 * alpha) / 5.0


GOPHER_REQUIRED_WORDS = ["the", "be", "to", "of", "and", "that",
                         "have", "with"]


def gopher_quality_flags(
    text, *,
    min_words: int = 50, max_words: int = 100_000,
    min_mean_word_len: float = 3.0, max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_required_hits: int = 2,
) -> dict[str, Column]:
    """The Gopher document-quality rules (Rae et al. 2021, *Scaling
    Language Models: Methods, Analysis & Insights from Training
    Gopher*, Appendix A) as pure Column expressions — the standard
    pre-training corpus filter, each rule a named column plus the
    conjunction ``keep``:

    * word count in [``min_words``, ``max_words``];
    * mean word length in [3, 10];
    * symbol-to-word ratio (``#`` or ellipsis) <= 0.1;
    * <= 90% of lines start with a bullet, <= 30% end with an
      ellipsis;
    * >= 80% of words contain at least one alphabetic character;
    * at least 2 of the 8 required English function words appear.

    Engine-portable patterns (no lookaround, ASCII classes where
    possible) so a SQL oracle restates every rule; per-line and
    per-word work uses higher-order functions — per ROW, bounded by
    document size, not the per-element-x-millions shape that needs
    Arrow.  Returns ``{name: Column}``; splat into ``select``.
    """
    # F.trim strips only ASCII spaces, so text starting with a tab or
    # newline would otherwise carry a leading empty token that inflates
    # n_words and deflates mean_word_len/alpha_word_frac
    toks = F.filter(whitespace_tokens(text),
                    lambda w: F.length(w) > 0)
    n = F.size(toks)
    nd = n.cast("double")
    mwl = (F.aggregate(toks, F.lit(0),
                       lambda a, w: a + F.length(w)).cast("double")
           / nd)
    sym = F.regexp_count(text, F.lit(r"#|\.\.\.|…")).cast("double") / nd
    lines = F.split(text, "\n")
    nlines = F.size(lines).cast("double")
    bullet = (F.size(F.filter(
        lines, lambda ln: ln.rlike(r"^\s*[-*•‣▪]"))).cast("double")
        / nlines)
    ellip = (F.size(F.filter(
        lines, lambda ln: ln.rlike(r"(\.\.\.|…)\s*$"))).cast("double")
        / nlines)
    alpha_w = (F.size(F.filter(
        toks, lambda w: w.rlike("[A-Za-z]"))).cast("double") / nd)
    # required-word presence in ONE pass over the already-split tokens
    # (a whitespace-bounded occurrence of w in the text IS a token equal
    # to w) — the previous 8 per-word `rlike` columns re-scanned every
    # document 8 times (~132 us/doc at sf1)
    hits = F.size(F.array_intersect(
        F.transform(toks, F.lower),
        F.array(*[F.lit(w) for w in GOPHER_REQUIRED_WORDS])))
    keep = (
        (n >= min_words) & (n <= max_words)
        & (mwl >= min_mean_word_len) & (mwl <= max_mean_word_len)
        & (sym <= max_symbol_ratio)
        & (bullet <= max_bullet_line_frac)
        & (ellip <= max_ellipsis_line_frac)
        & (alpha_w >= min_alpha_word_frac)
        & (hits >= min_required_hits)
    )
    return {
        "n_words": n.cast("long"),
        "mean_word_len": mwl,
        "symbol_ratio": sym,
        "bullet_line_frac": bullet,
        "ellipsis_line_frac": ellip,
        "alpha_word_frac": alpha_w,
        "required_hits": hits.cast("int"),
        "keep": keep,
    }


# Documented SUBSET of the "List of Dirty, Naughty, Obscene or Otherwise
# Bad Words" C4 filters on (the full public list is ~400 entries and
# injectable via the ``bad_words=`` parameter in production); matching is
# whole-token after lowercasing, same contract as GOPHER_REQUIRED_WORDS.
C4_BAD_WORDS = ["fuck", "shit", "bitch", "cunt", "porn", "xxx"]

_C4_TERMINAL = r'[.!?"”]$'  # period/!/?/straight or right curly quote


def _c4_kept_lines(text, min_words_per_line: int) -> Column:
    """The C4 line filter as one array expression: keep lines that end
    in a terminal punctuation mark, carry >= ``min_words_per_line``
    whitespace tokens, and do not mention "javascript" (the cookie/JS
    boilerplate rule).  Empty tokens from leading/duplicate whitespace
    are dropped before counting (same hygiene as gopher)."""
    lines = F.split(text, "\n")
    return F.filter(
        lines,
        lambda ln: F.trim(ln).rlike(_C4_TERMINAL)
        & (F.size(F.filter(F.split(F.trim(ln), r"\s+"),
                           lambda w: F.length(w) > 0))
           >= min_words_per_line)
        & ~F.contains(F.lower(ln), F.lit("javascript")),
    )


def c4_clean_lines(text, *, min_words_per_line: int = 5) -> Column:
    """The C4 line-level INTERVENTION (Raffel et al. 2020 §2.2): the
    document with only its retained lines, newline-joined.  Pure
    Column expression — runs in the scan projection."""
    return F.array_join(_c4_kept_lines(text, min_words_per_line), "\n")


def c4_quality_flags(
    text, *,
    min_words_per_line: int = 5,
    min_sentences: int = 3,
    bad_words: list[str] | None = None,
) -> dict[str, Column]:
    """The C4 document-quality rules (Raffel et al. 2020, *Exploring the
    Limits of Transfer Learning with a Unified Text-to-Text
    Transformer*, §2.2) as pure Column expressions — the other canonical
    pre-training filter set, sibling of :func:`gopher_quality_flags`:

    * only lines ending in a terminal punctuation mark, with at least
      5 words, and not mentioning "javascript" are retained
      (``clean_text`` is the retained document, ``kept_line_frac`` the
      survival rate);
    * pages with fewer than 3 sentences (terminal punctuation marks in
      the retained text) are dropped;
    * pages containing "lorem ipsum", a curly brace ``{`` (code), or
      any word from the bad-word list (whole-token match, lowercased —
      :data:`C4_BAD_WORDS` is a documented subset of the public
      LDNOOBW list C4 uses) are dropped.

    The corpus-level rule — discard all but one of any three-sentence
    span occurring more than once — is corpus-wide state, not a row
    expression: see :func:`xclim_spark.llm.dedup.c4_span_dedup`.

    Engine-portable patterns (no lookaround) so a SQL oracle restates
    every rule.  Returns ``{name: Column}``; splat into ``select``.
    """
    bw = bad_words if bad_words is not None else C4_BAD_WORDS
    lines = F.split(text, "\n")
    kept = _c4_kept_lines(text, min_words_per_line)
    clean = F.array_join(kept, "\n")
    n_sent = F.regexp_count(clean, F.lit(r"[.!?]"))
    toks = F.filter(F.split(F.trim(F.lower(text)), r"\s+"),
                    lambda w: F.length(w) > 0)
    has_bad = F.size(F.array_intersect(
        toks, F.array(*[F.lit(w.lower()) for w in bw]))) > 0
    has_lorem = F.contains(F.lower(text), F.lit("lorem ipsum"))
    has_brace = F.contains(text, F.lit("{"))
    keep = ((n_sent >= min_sentences)
            & ~has_lorem & ~has_brace & ~has_bad)
    return {
        "n_lines": F.size(lines).cast("long"),
        "kept_line_frac": (F.size(kept).cast("double")
                           / F.size(lines)),
        "n_sentences": n_sent.cast("long"),
        "has_lorem": has_lorem,
        "has_brace": has_brace,
        "has_bad_word": has_bad,
        "clean_text": clean,
        "keep": keep,
    }


def unicode_normalize(text, form: str = "NFC") -> Column:
    """Unicode normalization (NFC/NFD/NFKC/NFKD) of a text column —
    the canonicalization step every multi-source corpus needs before
    hashing/dedup (the same logical document arrives precomposed from
    one crawl and decomposed from another; their md5s differ until
    normalized).

    Honest slow path: Spark exposes no JVM-side Unicode normalizer in
    ``pyspark.sql.functions``, so this is an Arrow ``pandas_udf`` over
    ``unicodedata.normalize`` — map-side, zero shuffle, and the ONLY
    Python in the pipeline stays inside the scan projection.  NFC
    output is oracle-checkable against DuckDB's ``nfc_normalize``.
    """
    import unicodedata

    from pyspark.sql.functions import pandas_udf

    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"unicode_normalize: unknown form {form!r}")

    @pandas_udf("string")
    def _norm(s):
        return s.map(lambda t: None if t is None
                     else unicodedata.normalize(form, t))

    return _norm(text if isinstance(text, Column) else F.col(text))


def language_id(text) -> Column:
    """Stopword-profile language id: the language whose stopword list hits
    the most tokens; 'und' (undetermined) when nothing hits."""
    scores = F.array(*[
        F.struct(
            _stopword_hits(text, sw).alias("hits"),
            F.lit(lang).alias("lang"),
        )
        for lang, sw in STOPWORDS.items()
    ])
    best = F.array_max(scores)
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def winnowing_fingerprints(text, k: int = 5, window: int = 4) -> Column:
    """Winnowing document fingerprints (Schleimer et al. 2003): hash all
    word k-grams, then keep the minimum hash of every sliding window of
    ``window`` consecutive k-gram hashes.  Returns the distinct fingerprint
    set (array<long>) — a position-robust signature for plagiarism-style
    overlap detection."""
    words = F.split(F.trim(text), r"\s+")

    # bind `words` (and then `grams`) as lambda variables so the split /
    # gram hashing evaluate once per row, not once per element (outer
    # expressions referenced inside HOF lambdas re-evaluate per element)
    def fp(w: Column) -> Column:
        grams = F.transform(
            F.sequence(F.lit(0), F.size(w) - k),
            lambda i: F.xxhash64(
                F.concat_ws(
                    " ", *[F.element_at(w, (i + j + 1).cast("int"))
                           for j in range(k)]
                )
            ),
        )

        def windows(g: Column) -> Column:
            mins = F.transform(
                F.sequence(F.lit(0), F.size(g) - window),
                lambda i: F.array_min(F.slice(g, i + 1, window)),
            )
            return F.array_distinct(mins)

        return F.when(
            F.size(w) >= k + window - 1,
            F.element_at(F.transform(F.array(grams), windows), 1),
        ).otherwise(F.array().cast("array<bigint>"))

    return F.element_at(F.transform(F.array(words), fp), 1)


# PII patterns kept PORTABLE across regex engines (Java in Spark, RE2 in
# DuckDB/Go tooling): no lookaround, no backreferences, ASCII classes
# only — so a detection count computed in the pipeline is reproducible
# by any downstream auditor.  Redaction applies them in THIS dict order
# (emails contain dots, so they redact before IPv4 could bite them).
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "phone": r"\+\d{1,3}[- ]\d{3}[- ]\d{3,4}[- ]\d{3,4}",
}


def pii_counts(text) -> dict[str, Column]:
    """Per-kind PII match counts (``{kind: Column}``) — pure
    ``regexp_count`` expressions, JVM-side and codegen-friendly; the
    training-data hygiene pass every large corpus pipeline runs before
    release.  Join the dict into a ``select`` with aliases."""
    return {kind: F.regexp_count(text, F.lit(pat))
            for kind, pat in PII_PATTERNS.items()}


def redact_pii(text, kinds: list[str] | None = None) -> Column:
    """Replace every PII match with its ``[KIND]`` token, applying
    :data:`PII_PATTERNS` in dict order (documented, so any engine
    reproduces the same redacted bytes).  ``kinds`` restricts which
    patterns apply."""
    col = text if isinstance(text, Column) else F.col(text)
    for kind, pat in PII_PATTERNS.items():
        if kinds is None or kind in kinds:
            col = F.regexp_replace(col, pat, f"[{kind.upper()}]")
    return col
