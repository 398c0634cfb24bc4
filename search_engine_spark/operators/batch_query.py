"""Batch query scoring: N queries in one distributed pass.

The reference serves one query per HTTP call, one JDBC round-trip per
term/page (SearchServiceImpl.java — X10 anti-pattern). At cluster scale
the complementary shape is OFFLINE batch scoring: a whole query log
scored in one job (evaluation reruns, cache warming, relevance
regression sweeps). This operator makes the dictionary bind (J1) and
posting fetch (J2) literal **broadcast hash joins**: the per-(qid, term)
frame — terms, idfs, per-query term counts — is broadcast against the
postings table, then one hash aggregation per (qid, doc) applies the
conjunction and sums per-term BM25 scores, and a per-qid window takes
top-k.

Scoring semantics are pinned identically to the single-query paths
(float64, conjunctive AND, rarest-df cutoff per query, tiebreak
(score desc, doc_id asc)) — rank-identical to oracle.search per query.

Float determinism note: per-(qid, doc) summation order inside the hash
agg is partition-arrival order, not lexicographic term order, so scores
can differ from the oracle in the last ulp; to keep bit-identity the
per-term score is aggregated into term-slot columns only when the query
set shares one term count... instead we sum via sorted collect_list —
see ``_ordered_sum``: scores are accumulated with
``aggregate(array_sort(collect_list(struct(term, s))), 0.0d, acc+x)``
— a deterministic lexicographic left fold, bit-identical to the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from search_engine_spark.functions.analyze import query_lemmas
from search_engine_spark.functions.scoring import (
    bm25_idf,
    df_cutoff,
    query_killed_by_cutoff,
)
from search_engine_spark import BM25_B, BM25_K1
from search_engine_spark.operators.query import _scope_stats, _term_dfs


def bm25_batch_search(
    postings_flat: DataFrame,
    lemma_stats: DataFrame,
    doc_stats: DataFrame,
    queries: dict[str, str],
    scope: str | None = None,
    k: int = 10,
    combine: str = "and",
) -> DataFrame:
    """queries {qid: text} → DataFrame(qid, rank, doc_id, score), top-k
    per query, one distributed pass over postings. ``combine="or"`` uses
    the disjunctive semantics (per-term cutoff DROP, no all-terms gate —
    oracle.search(combine="or") is the per-query twin)."""
    spark: SparkSession = postings_flat.sparkSession
    n_docs, avg_len = _scope_stats(doc_stats, scope)

    # driver-side analysis + cutoff per query (tiny: |queries| rows)
    all_terms: set[str] = set()
    plans: list[tuple[str, list[str]]] = []
    for qid, text in queries.items():
        terms = query_lemmas(text)
        if not terms or n_docs == 0:
            continue
        all_terms.update(terms)
        plans.append((qid, terms))
    if not plans:
        return spark.createDataFrame(
            [], "qid string, rank int, doc_id long, score double"
        )
    dfs = _term_dfs(lemma_stats, sorted(all_terms), scope)
    cutoff = df_cutoff(n_docs)
    qrows = []
    for qid, terms in plans:
        if combine == "or":
            terms = [t for t in terms if dfs[t] <= cutoff]
            if not terms:
                continue
        elif query_killed_by_cutoff([dfs[t] for t in terms], n_docs):
            continue
        for t in terms:
            qrows.append((qid, t, bm25_idf(dfs[t], n_docs), len(terms)))
    if not qrows:
        return spark.createDataFrame(
            [], "qid string, rank int, doc_id long, score double"
        )
    qterms = spark.createDataFrame(
        qrows, "qid string, lemma string, idf double, n_terms int"
    )

    cand = postings_flat.filter(
        F.col("lemma").isin(sorted({r[1] for r in qrows}))
    )
    if scope is not None:
        cand = cand.filter(F.col("scope") == scope)

    # J1/J2 as a BroadcastHashJoin: tiny (qid, term) side ⋈ postings
    joined = cand.join(F.broadcast(qterms), "lemma")
    tf = F.col("tf").cast("double")
    dl = F.col("doc_len").cast("double")
    norm = F.lit(BM25_K1) * (
        F.lit(1.0 - BM25_B) + F.lit(BM25_B) * dl / F.lit(avg_len)
    )
    per_term = (
        F.col("idf") * tf * F.lit(BM25_K1 + 1.0) / (tf + norm)
    ).alias("_s")

    grouped = (
        joined.select("qid", "doc_id", "lemma", "n_terms", per_term)
        .groupBy("qid", "doc_id")
        .agg(
            F.count("*").alias("_nm"),
            F.first("n_terms").alias("_need"),
            # deterministic lexicographic left fold — bit-identical to the
            # oracle's sorted-term accumulation
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("lemma", "_s"))),
                F.lit(0.0),
                lambda acc, x: acc + x["_s"],
            ).alias("score"),
        )
    )
    if combine == "and":
        grouped = grouped.filter(F.col("_nm") == F.col("_need"))  # conjunction
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        grouped.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "doc_id", "score")
    )
