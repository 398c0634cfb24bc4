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

    NARROW: tf is counted per doc inside the tokenizer UDF
    (functions/udfs.py), so the explode emits already-unique
    (doc_id, lemma) rows — no shuffle here at all. scope/doc_len are
    functionally dependent on doc_id and carried through so scoring
    never re-joins docs in the hot path. For a positional docs table use
    ``build_postings_flat_positional``.
    """
    return docs_tok.select(
        "doc_id", "scope", "doc_len", F.explode("lemma_counts").alias("lc")
    ).select(
        F.col("lc.lemma").alias("lemma"),
        "doc_id",
        F.col("lc.tf").alias("tf"),
        "scope",
        "doc_len",
    )


def build_postings_flat_positional(docs_tok: DataFrame) -> DataFrame:
    """A1 over a positional docs table (build_docs(positional=True)):
    same narrow explode, plus the per-posting position lists."""
    return docs_tok.select(
        "doc_id", "scope", "doc_len", F.explode("lemma_counts").alias("lc")
    ).select(
        F.col("lc.lemma").alias("lemma"),
        "doc_id",
        F.col("lc.tf").alias("tf"),
        "scope",
        "doc_len",
        F.col("lc.positions").alias("positions"),
    )


def build_lemma_stats(postings_flat: DataFrame) -> DataFrame:
    """(scope, lemma, df, cf) — A2. (doc_id, lemma) is unique after A1, so
    df = count(*) (no countDistinct shuffle)."""
    return postings_flat.groupBy("scope", "lemma").agg(
        F.count("*").alias("df"),
        F.sum("tf").alias("cf"),
    )


def lemma_stats_from_blocks(blocks: DataFrame) -> DataFrame:
    """(scope, lemma, df, cf) derived from the compressed POSTINGS table's
    block metadata — ~1000x fewer input rows than re-exploding docs (the
    blocks already aggregate 128 postings each). At 100 TB the corpus is
    never rescanned for dictionary stats."""
    return blocks.groupBy("scope", "lemma").agg(
        F.sum("count").cast("long").alias("df"),
        F.sum("sum_tf").cast("long").alias("cf"),
    )


def build_doc_stats(docs: DataFrame) -> DataFrame:
    """(scope, n_docs, avg_doc_len, sum_doc_len) — A3/A8. sum kept so the
    global average is exactly reconstructible from scope rows."""
    return docs.groupBy("scope").agg(
        F.count("*").alias("n_docs"),
        F.avg("doc_len").alias("avg_doc_len"),
        F.sum("doc_len").alias("sum_doc_len"),
    )


def statistics(docs: DataFrame, lemma_stats: DataFrame) -> DataFrame:
    """A7 — the statistics API equivalent (services/StatisticsServiceImpl.
    java:31-63): per-scope doc/lemma/token counts plus a grand-total row
    (scope=NULL) via ``rollup`` — one pass, Catalyst expands the grouping
    sets."""
    total = F.lit("<total>")  # rollup's NULL never equi-joins; use a sentinel
    doc_side = docs.rollup("scope").agg(
        F.count("*").alias("n_docs"),
        F.sum("doc_len").alias("n_tokens"),
    ).select(F.coalesce("scope", total).alias("scope"), "n_docs", "n_tokens")
    lemma_side = lemma_stats.rollup("scope").agg(
        F.count("*").alias("n_lemmas"),
        F.sum("cf").alias("n_postings_tf"),
    ).select(
        F.coalesce("scope", total).alias("scope"), "n_lemmas", "n_postings_tf"
    )
    return doc_side.join(lemma_side, ["scope"], "full_outer").select(
        "scope", "n_docs", "n_tokens", "n_lemmas", "n_postings_tf"
    )


def build_all(docs_tok: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame]:
    """postings_flat, lemma_stats, doc_stats from tokenized docs."""
    pf = build_postings_flat(docs_tok)
    return pf, build_lemma_stats(pf), build_doc_stats(docs_tok)
