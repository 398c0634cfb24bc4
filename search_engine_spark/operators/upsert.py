"""Incremental single-turn upsert (reference S7/J8, set-oriented).

Reference flow for ``POST /api/indexPage``: delete the page's postings,
decrement each affected lemma's df (dropping rows that reach 0), then
refetch and re-add (services/WebParser.java:212-243,
IndexingServiceImpl.java:86-118) — one row at a time over JDBC.

Spark re-expression over the checkpointed bucket layout (plans/job.py):
the incremental unit is the BUCKET. A delta of changed turns (text
updates for existing (conv_id, turn_idx) keys — doc identity is the key,
so doc_id is stable, unlike the reference's delete+reinsert id churn):

1. bind delta rows to their doc_id/bucket via the existing docs table;
2. per affected bucket: docs' = old docs anti-join delta keys ∪ re-
   tokenized delta rows (J8's anti-join form), swapped in atomically via
   a staging directory (the Iceberg deployment replaces this with
   ``MERGE INTO`` + snapshot commit);
3. rebuild that bucket's compressed postings from docs' — the whole
   bucket, bounded work, no partial-block surgery;
4. refresh lemma_stats/doc_stats from block metadata / docs (cheap;
   a lemma whose last posting vanished drops out, mirroring the
   reference's delete-at-df-0, WebParser.java:231-237).

Unchanged buckets are untouched — verified byte-level by
tests/test_upsert.py.
"""

from __future__ import annotations

import os
import shutil
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from search_engine_spark.functions.udfs import tokenize_lemmatize_counts
from search_engine_spark.operators.build import (
    build_doc_stats,
    build_postings_flat,
    lemma_stats_from_blocks,
)
from search_engine_spark.operators.compress import build_postings_compressed
from search_engine_spark.operators.docs import with_scope
from search_engine_spark.plans.job import IndexBuildJob


def _retokenized(delta: DataFrame, docs: DataFrame) -> DataFrame:
    """delta (transcripts schema) → full docs rows with PRESERVED doc_id
    and fresh text/lemma_counts/doc_len."""
    keyed = docs.select("doc_id", "conv_id", "turn_idx", "bucket")
    d = delta.join(keyed, ["conv_id", "turn_idx"], "inner")
    d = with_scope(d)
    d = d.withColumn("lemma_counts", tokenize_lemmatize_counts(F.col("text")))
    d = d.withColumn(
        "doc_len",
        F.expr("aggregate(lemma_counts, 0, (a, x) -> a + x.tf)").cast("int"),
    )
    return d.select(
        "doc_id", "conv_id", "turn_idx", "role", "tool", "ts",
        "scope", "text", "doc_len", "lemma_counts", "bucket",
    )


def _swap_in(spark, df: DataFrame, final_dir: str, staging_dir: str) -> None:
    """Write to staging, then directory-swap over the live path (sandbox
    stand-in for an Iceberg snapshot commit)."""
    df.write.mode("overwrite").parquet(staging_dir)
    if os.path.exists(final_dir):
        shutil.rmtree(final_dir)
    os.rename(staging_dir, final_dir)


def upsert_turns(job: IndexBuildJob, delta: DataFrame) -> dict:
    """Apply a delta of changed turns to a completed index build."""
    spark = job.spark
    out = job.out
    docs = spark.read.parquet(f"{out}/docs")
    # materialize the retokenized delta BEFORE any directory swap — its
    # plan reads the live docs table, which the swaps below replace
    staged = f"{out}/.staging_updated"
    _retokenized(delta, docs).write.mode("overwrite").parquet(staged)
    updated = spark.read.parquet(staged)
    n_updated = updated.count()
    buckets = sorted(
        r["bucket"] for r in updated.select("bucket").distinct().collect()
    )
    lineage = {
        r["key"]: r["value"]
        for r in spark.read.parquet(f"{out}/lineage").collect()
    }
    range_size = int(lineage["range_size"])

    t0 = time.time()
    for b in buckets:
        old_b = spark.read.parquet(f"{out}/docs/bucket={b}")
        upd_b = updated.filter(F.col("bucket") == b).drop("bucket")
        keys_b = upd_b.select("conv_id", "turn_idx")
        new_b = old_b.join(keys_b, ["conv_id", "turn_idx"], "left_anti").unionByName(
            upd_b
        )
        _swap_in(spark, new_b, f"{out}/docs/bucket={b}", f"{out}/.staging_docs_{b}")
        docs_b = spark.read.parquet(f"{out}/docs/bucket={b}")
        blocks_b = build_postings_compressed(
            build_postings_flat(docs_b), range_size=range_size
        )
        _swap_in(
            spark, blocks_b, f"{out}/postings/bucket={b}", f"{out}/.staging_post_{b}"
        )

    # stats refresh from small outputs (never rescans the corpus)
    blocks = spark.read.parquet(f"{out}/postings")
    lemma_stats_from_blocks(blocks).write.mode("overwrite").parquet(
        f"{out}/lemma_stats"
    )
    docs2 = spark.read.parquet(f"{out}/docs")
    build_doc_stats(docs2).write.mode("overwrite").parquet(f"{out}/doc_stats")

    shutil.rmtree(staged, ignore_errors=True)
    job._checkpoint("upsert", -1, n_updated, t0)
    return {"updated_turns": n_updated, "buckets_rebuilt": buckets}
