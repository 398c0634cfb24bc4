"""Pinned ranking math (pure, Spark-free). Float64 everywhere.

Two scorers (SURVEY.md §5 items 2-3):

- ``bm25``  — the new engine's headline scorer. Lucene-style non-negative
  idf. Constants pinned: k1=1.2, b=0.75 (BASELINE.md target table).
- ``reftf`` — the reference's legacy relevance, kept as a second mode so
  the reference's exact ranking semantics stay testable: absolute
  relevance = Σ tf / max tf over query lemmas on that doc
  (services/SearchServiceImpl.java:335-357), then normalized by the
  global max absolute relevance (SearchServiceImpl.java:233-244).

Determinism discipline (SURVEY.md §4 item 6): accumulate per-term scores
in lexicographic term order; tiebreak (score desc, doc_id asc).
"""

from __future__ import annotations

import math

from search_engine_spark import BM25_B, BM25_K1, PAGES_PERCENT_FOR_LEMMA


def bm25_idf(df: int, n_docs: int) -> float:
    """ln(1 + (N - df + 0.5) / (df + 0.5)) — always > 0."""
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def bm25_term_score(
    tf: float, doc_len: float, avg_doc_len: float, idf: float,
    k1: float = BM25_K1, b: float = BM25_B,
) -> float:
    norm = k1 * (1.0 - b + b * doc_len / avg_doc_len)
    return idf * tf * (k1 + 1.0) / (tf + norm)


def df_cutoff(n_docs: int) -> float:
    """Common-term threshold: docs × 5 / 100 (float, like the reference's
    ``pagesCount / 100 * pagesPercentForLemma``, SearchServiceImpl.java:137)."""
    return n_docs / 100.0 * PAGES_PERCENT_FOR_LEMMA


def query_killed_by_cutoff(dfs: list[int], n_docs: int) -> bool:
    """Reference rule (SearchServiceImpl.java:156-163): the query dies iff
    the RAREST term's df exceeds the cutoff. Terms are never individually
    dropped — common terms still participate in the conjunction. A term
    absent from the corpus has df=0, passes the cutoff, and empties the
    intersection instead. Empty query → no results."""
    if not dfs:
        return True
    return min(dfs) > df_cutoff(n_docs)
