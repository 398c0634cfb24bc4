"""Index build: docs → tf postings → dictionary/stats tables.

All native Catalyst after the one tokenizer UDF (SURVEY.md §2.4 A1-A4,
A8). Reference analogs: per-page tf map (services/LemmaFinder.java:40-69),
df increment (services/WebParser.java:184-193), page counts
(repository/PageRepository.java:23-24).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_postings_flat(docs_tok: DataFrame) -> DataFrame:
    """(lemma, doc_id, tf) + carried (scope, doc_len) — A1.

    explode → hash agg with map-side partial aggregation (Catalyst does
    partial+final automatically). scope/doc_len are functionally
    dependent on doc_id, carried with first() so scoring never re-joins
    docs in the hot path.
    """
    exploded = docs_tok.select(
        "doc_id", "scope", "doc_len", F.explode("lemmas").alias("lemma")
    )
    return exploded.groupBy("lemma", "doc_id").agg(
        F.count("*").cast("int").alias("tf"),
        F.first("scope").alias("scope"),
        F.first("doc_len").alias("doc_len"),
    )


def build_lemma_stats(postings_flat: DataFrame) -> DataFrame:
    """(scope, lemma, df, cf) — A2. (doc_id, lemma) is unique after A1, so
    df = count(*) (no countDistinct shuffle)."""
    return postings_flat.groupBy("scope", "lemma").agg(
        F.count("*").alias("df"),
        F.sum("tf").alias("cf"),
    )


def build_doc_stats(docs: DataFrame) -> DataFrame:
    """(scope, n_docs, avg_doc_len, sum_doc_len) — A3/A8. sum kept so the
    global average is exactly reconstructible from scope rows."""
    return docs.groupBy("scope").agg(
        F.count("*").alias("n_docs"),
        F.avg("doc_len").alias("avg_doc_len"),
        F.sum("doc_len").alias("sum_doc_len"),
    )


def build_all(docs_tok: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame]:
    """postings_flat, lemma_stats, doc_stats from tokenized docs."""
    pf = build_postings_flat(docs_tok)
    return pf, build_lemma_stats(pf), build_doc_stats(docs_tok)
