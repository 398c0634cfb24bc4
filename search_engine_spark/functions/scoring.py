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


def explain_breakdown(
    terms: list[str],
    dfs: dict[str, int],
    n_docs: int,
    avg_len: float,
    doc_len: int,
    lemma_tfs: dict[str, int],
    in_scope: bool,
    combine: str = "and",
) -> dict:
    """Pure per-term scoring breakdown for ONE (query, doc) pair — the
    single source of the explain pins (lexicographic accumulation, the
    pinned evaluation shape, the AND-kill vs OR per-term-drop gates),
    shared by ``SearchEngine.explain`` and ``QueryServer.explain`` so
    the two serving paths cannot drift. ``terms`` must be sorted;
    ``lemma_tfs`` is the doc's {lemma: tf}. The total is bit-identical
    to the search kernels' relevance for any matched doc."""
    cutoff = df_cutoff(n_docs) if n_docs else 0
    killed = combine == "and" and query_killed_by_cutoff(
        list(dfs.values()), n_docs
    )
    out_terms, score, all_present = [], 0.0, True
    for t in terms:  # lexicographic accumulation (pinned)
        df = dfs[t]
        dropped = killed or (combine == "or" and df > cutoff)
        idf = bm25_idf(df, n_docs) if n_docs else 0.0
        tf = lemma_tfs.get(t, 0)
        present = tf > 0 and in_scope
        partial = 0.0
        if present and not dropped:
            partial = bm25_term_score(
                float(tf), float(doc_len), avg_len, idf, BM25_K1, BM25_B
            )
            score += partial
        if not present and not dropped:
            all_present = False
        out_terms.append(
            {
                "lemma": t, "df": df, "idf": idf, "tf": tf,
                "present": present, "dropped": bool(dropped),
                "partial": partial,
            }
        )
    usable = [x for x in out_terms if not x["dropped"]]
    matches = (
        in_scope
        and bool(usable)
        and not killed
        and (combine == "or" or all_present)
        and any(x["present"] for x in usable)
    )
    return {
        "matches": matches,
        "killed_by_cutoff": bool(killed),
        "in_scope": in_scope,
        "score": score,
        "doc_len": int(doc_len),
        "n_docs": n_docs,
        "avg_doc_len": avg_len,
        "df_cutoff": cutoff,
        "terms": out_terms,
    }
