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

from search_engine_spark.functions.rounding import round6


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


# -- MMR diversification (Carbonell & Goldstein 1998) --------------------------


def mmr_rerank(
    scored: DataFrame,
    docs: DataFrame,
    tokens_sql: str,
    k: int = 10,
    lam: float = 0.7,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, score, rank): Maximal Marginal Relevance re-ranking of a
    scored window — greedily pick the doc maximizing
    ``lam * rel - (1 - lam) * max_sim_to_picked`` so the top-``k``
    balances relevance against novelty (Carbonell & Goldstein 1998, the
    classic search-result-diversification second stage).

    Pinned semantics (``mmr_oracle_sql`` is the DuckDB twin):

    - candidate set = every row of ``scored`` (callers bound the window
      with their first-stage ``LIMIT`` — the ES rescore contract);
    - ``rel = score / max(score)`` over the window (one division);
    - ``sim`` = Jaccard over the DISTINCT token set of ``tokens_sql``
      (``|a ∩ b| / |a ∪ b|`` as one double division; 0.0 when the union
      is empty), vs each already-picked doc, reduced with float max;
    - pick order: argmax of ``round(lam * rel - (1-lam) * max_sim, 6)``
      with ties to lower id — the 6dp round BEFORE the argmax is the
      cross-engine pin (operators/ann.py family); the first pick
      reduces to ``round(lam * rel, 6)`` (max_sim = 0);
    - output rows carry the ORIGINAL first-stage score and the pick
      ``rank`` (1-based).

    Scale shape: the scored side is ≤ window rows and BROADCASTS into
    the docs join (the rescore/snippet pattern — the corpus pays one
    pruned join); the greedy selection is inherently sequential in k,
    so it runs as ONE bounded ``applyInPandas`` group over ≤ window
    rows — O(k · window) set intersections on one task, never
    corpus-sized."""
    mu = 1.0 - lam
    cand = docs.select(
        id_col,
        F.array_sort(F.array_distinct(F.expr(tokens_sql))).alias("_set"),
    ).join(F.broadcast(scored.select(id_col, "score")), id_col)

    def _kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        if pdf.empty:
            return pd.DataFrame(
                {"_id": pd.Series(dtype="int64"),
                 "score": pd.Series(dtype="float64"),
                 "rank": pd.Series(dtype="int32")}
            )
        ids = pdf["_id"].to_numpy(np.int64)
        scores = pdf["score"].to_numpy(np.float64)
        sets = [frozenset(s) for s in pdf["_set"]]
        rel = scores / scores.max()
        n = ids.size
        remaining = sorted(range(n), key=lambda i: ids[i])
        picked: list[int] = []
        out_id, out_sc, out_rk = [], [], []
        for rank in range(1, min(k, n) + 1):
            best_i, best_key = None, None
            for i in remaining:
                ms = 0.0
                for j in picked:
                    u = len(sets[i] | sets[j])
                    s = len(sets[i] & sets[j]) / u if u else 0.0
                    if s > ms:
                        ms = s
                # HALF_UP 6dp — the shared cross-engine pin (the DuckDB
                # twin's round(); np.round's half-even differs on midpoints)
                m = float(round6(lam * rel[i] - mu * ms))
                key = (-m, ids[i])
                if best_key is None or key < best_key:
                    best_i, best_key = i, key
            picked.append(best_i)
            remaining.remove(best_i)
            out_id.append(ids[best_i])
            out_sc.append(scores[best_i])
            out_rk.append(rank)
        return pd.DataFrame({"_id": out_id, "score": out_sc, "rank": out_rk})

    return (
        cand.select(F.col(id_col).alias("_id"), "score", "_set")
        .groupBy(F.lit(1).alias("_g"))
        .applyInPandas(
            lambda _, pdf: _kernel(pdf),
            schema="_id long, score double, rank int",
        )
        .select(F.col("_id").alias(id_col), "score", "rank")
    )


def mmr_oracle_sql(
    first_stage_sql: str,
    tokens_duck: str,
    k: int = 10,
    lam: float = 0.7,
    source_sql: str = "documents",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of ``mmr_rerank`` — the ``k`` greedy picks unrolled
    as chained CTEs, each an argmax over the same pinned
    ``round(lam*rel - (1-lam)*max_sim, 6)`` with (value desc, id asc)
    order. ``first_stage_sql`` must yield (``id_col``, score). The
    accumulated-picks CTEs are MATERIALIZED: each step references the
    previous picks twice (the NOT IN filter and the correlated
    max-sim), so DuckDB's default CTE inlining would expand the chain
    2^k-fold — measured as a hang at k=10 on 6 rows."""
    mu = 1.0 - lam
    jac = (
        "CASE WHEN len(list_distinct(c._set || p._set)) = 0 THEN 0.0 "
        "ELSE len(list_filter(c._set, x -> list_contains(p._set, x)))::DOUBLE"
        " / len(list_distinct(c._set || p._set)) END"
    )
    steps = [
        f"""p1 AS (
            SELECT c.{id_col} FROM cand c
            ORDER BY round({lam!r} * c.rel, 6) DESC, c.{id_col} ASC LIMIT 1),
        k1 AS MATERIALIZED (SELECT {id_col}, 1 AS rank FROM p1)"""
    ]
    for n in range(2, k + 1):
        steps.append(
            f"""p{n} AS (
            SELECT c.{id_col} FROM cand c
            WHERE c.{id_col} NOT IN (SELECT {id_col} FROM k{n - 1})
            ORDER BY round({lam!r} * c.rel - {mu!r} * coalesce(
                (SELECT max({jac}) FROM cand p
                 JOIN k{n - 1} pk ON p.{id_col} = pk.{id_col}), 0.0), 6)
                DESC, c.{id_col} ASC
            LIMIT 1),
        k{n} AS MATERIALIZED (SELECT * FROM k{n - 1}
                 UNION ALL SELECT {id_col}, {n} FROM p{n})"""
        )
    body = ",\n        ".join(steps)
    return f"""
        WITH first AS ({first_stage_sql}),
        cand AS (
            SELECT f.{id_col}, f.score,
                   f.score / (SELECT max(score) FROM first) AS rel,
                   list_sort(list_distinct({tokens_duck})) AS _set
            FROM first f JOIN {source_sql} d ON d.{id_col} = f.{id_col}),
        {body}
        SELECT c.{id_col}, c.score, kk.rank
        FROM k{k} kk JOIN cand c ON c.{id_col} = kk.{id_col}
    """
