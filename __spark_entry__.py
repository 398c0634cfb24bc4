"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: runs the REAL engine end-to-end (pandas-UDF
analyzer → docs with deterministic ids → tf/df/stats → conjunctive BM25
top-k → materialized results) over a transcripts view derived from the
sf0.001 ``documents`` table.

``queries()`` / ``oracle_sql()`` — one entry per SQL-expressible operator
(SURVEY.md §2 + the training-data-pipeline suite), implemented in
``search_engine_spark.contract`` as native-DataFrame / DuckDB twins.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF0001 = "/root/testdata/sf0.001"
FLAGSHIP_QUERY = "dup merge stream"


def _derived_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → transcripts shape (conv_id, turn_idx, role, text, tool, ts)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w = Window.partitionBy("source").orderBy("doc_id")
    return docs.select(
        F.col("source").alias("conv_id"),
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
        F.when(F.col("doc_id") % 2 == 0, "user").otherwise("assistant").alias("role"),
        F.col("text"),
        F.lit(None).cast("string").alias("tool"),
        F.to_timestamp(F.lit("2025-01-01 00:00:00")).alias("ts"),
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full headline path over sf0.001 — pandas-UDF analyzer →
    deterministic docs → compressed block postings (delta+varbyte,
    doc-range shards) → block-max WAND top-k → snippeted results.
    Driver checks rows >= 0 with a stable schema."""
    from search_engine_spark.functions.analyze import query_lemmas
    from search_engine_spark.operators.build import build_all
    from search_engine_spark.operators.compress import (
        build_postings_compressed,
        shard_spec,
    )
    from search_engine_spark.operators.docs import build_docs
    from search_engine_spark.operators.snippet import materialize_with_snippets
    from search_engine_spark.operators.wand import bm25_search_blocks

    transcripts = _derived_transcripts(spark, SF0001)
    docs_tok = build_docs(transcripts, with_lemmas=True)
    postings_flat, lemma_stats, doc_stats = build_all(docs_tok)
    n_docs = docs_tok.count()
    blocks = build_postings_compressed(
        postings_flat, range_size=shard_spec(n_docs, 4096)
    )
    results = bm25_search_blocks(
        blocks, lemma_stats, doc_stats, FLAGSHIP_QUERY, k=10, mode="wand"
    )
    return materialize_with_snippets(
        results, docs_tok.drop("lemma_counts"), query_lemmas(FLAGSHIP_QUERY)
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from search_engine_spark.contract import spark_queries

    return spark_queries()


def oracle_sql() -> dict[str, str]:
    from search_engine_spark.contract import duckdb_oracles

    return duckdb_oracles()
