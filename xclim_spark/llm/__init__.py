"""LLM training-data pipeline operators: dedup, similarity, text analysis.

The components a 100 TB corpus pipeline needs, built Spark-first:

* :mod:`.dedup` — exact hash dedup, MinHash+LSH near-dedup, SimHash;
* :mod:`.similarity` — cosine top-k (brute force baseline + LSH-bucketed
  scale path) over embedding columns;
* :mod:`.text` — language id, quality scoring, token counting,
  fingerprinting;
* :mod:`.urls` — URL canonicalization, registered-domain extraction,
  canonical-URL dedup and domain-mix counts;
* :mod:`.search` — BM25 ranked retrieval over the corpus.
"""

from . import dedup, search, similarity, text, urls  # noqa: F401
