"""Second-stage proximity rescoring over a bounded top-window — the
Lucene QueryRescorer / Elasticsearch ``rescore`` shape as public prior
art: the cheap first stage (BM25 over the inverted index) ranks the
corpus; an expensive second stage re-reads only the top ``window``
hits' text and sharpens their order by term proximity.

Pinned semantics (oracle.rescore_search is the twin):

- proximity = minimal covering window: the shortest contiguous span of
  the ANALYZED post-stopword lemma stream (the same position definition
  as phrase search) containing ALL query lemmas;
  ``prox = 1 / (1 + span - n_terms)`` ∈ (0, 1] — an adjacent run of the
  query terms scores exactly 1; a doc missing a term keeps prox 0;
- combined = first_stage_score + prox (ONE addition, float64 — the
  prox term acts as a bounded proximity boost, never reordering docs
  more than one BM25 point apart... unless they tie);
- final order (combined desc, doc_id asc), top-k.

Scale shape: the rescored side is ≤ ``window`` rows — it BROADCASTS
into the docs join (the snippet-materialization pattern), the span UDF
is an Arrow pandas pass over those rows only, and the final sort is a
``window``-row TakeOrderedAndProject. The corpus pays nothing beyond
the first stage.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def min_cover_span(pos_lists: list[list[int]]) -> int | None:
    """Shortest span [lo, hi] of the position stream containing at least
    one position from EVERY list (None if any list is empty) — the
    classic sorted-merge two-pointer minimal covering window."""
    if not pos_lists or any(not p for p in pos_lists):
        return None
    merged = sorted(
        (p, i) for i, plist in enumerate(pos_lists) for p in plist
    )
    need = len(pos_lists)
    have: dict[int, int] = {}
    best = None
    lo = 0
    for hi in range(len(merged)):
        have[merged[hi][1]] = have.get(merged[hi][1], 0) + 1
        while len(have) == need:
            span = merged[hi][0] - merged[lo][0] + 1
            if best is None or span < best:
                best = span
            t = merged[lo][1]
            have[t] -= 1
            if not have[t]:
                del have[t]
            lo += 1
    return best


def proximity_of(text: str, terms: list[str]) -> float:
    """prox(text, terms) per the module pins — pure (shared by the
    oracle twin and the Spark UDF)."""
    from search_engine_spark.functions.analyze import analyze

    if not terms:
        return 0.0
    stream = analyze(text)
    pos: dict[str, list[int]] = {t: [] for t in terms}
    for i, lem in enumerate(stream):
        if lem in pos:
            pos[lem].append(i)
    span = min_cover_span([pos[t] for t in terms])
    if span is None:
        return 0.0
    return 1.0 / (1 + span - len(terms))


def rescore_window(
    results: DataFrame,
    docs: DataFrame,
    terms: list[str],
    k: int = 10,
    window: int = 50,
) -> DataFrame:
    """(doc_id, score) first-stage results → top-``k`` (doc_id, score)
    where score = first_stage + proximity over the top-``window`` rows
    (rows beyond the window are dropped — the ES rescore contract)."""
    terms = sorted(set(terms))
    top = results.orderBy(F.desc("score"), F.asc("doc_id")).limit(window)
    joined = docs.select("doc_id", "text").join(
        F.broadcast(top), "doc_id"
    )

    @F.pandas_udf("double")
    def prox_udf(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: proximity_of(t or "", terms))

    return (
        joined.withColumn(
            "score", F.col("score") + prox_udf(F.col("text"))
        )
        .select("doc_id", "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
