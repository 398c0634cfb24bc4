"""Index maintenance: bucket rebalance after incremental growth.

The incremental upsert (operators/upsert.py) appends never-seen turns to
the LAST bucket — correct and cheap per delta, but after enough inserts
that bucket holds many times the build-time ``per_bucket`` target, so
each subsequent upsert rebuilds an ever-growing tail and the
checkpoint/rebuild unit stops being bounded work. Every real engine has
this maintenance op: Lucene merges segments, Iceberg compacts data files
(``rewrite_data_files``), the reference simply rebuilds the whole site
from scratch (IndexingServiceImpl.java:173-193 clears and re-crawls).

``rebalance_buckets`` re-partitions the index into buckets of at most
``per_bucket`` docs WITHOUT changing any doc_id (ids are document
identity — search results are bit-identical before/after), using the
same conversation-start rule as the fresh build (plans/job.py
_stage_offsets): a conversation belongs to bucket
``conv_start_offset // per_bucket`` capped at the last bucket, so a
rebalance right after a fresh build is a no-op and bucket boundaries
remain aligned to conversation starts.

Crash safety: moving rows are materialized to a staging parquet BEFORE
any directory swap (the same read-before-overwrite discipline as
upsert_turns), each bucket is swapped with the recoverable
``_swap_in`` dance, and a crash mid-rebalance is repaired by
``recover_swaps`` + rerunning (the op is idempotent: re-running computes
the same targets from the same doc_ids).

At 100 TB this runs as a background job touching only the buckets whose
membership changed — the common case after N append-heavy upserts is
rewriting the overgrown tail bucket into ceil(tail/per_bucket) new ones
while every settled bucket is untouched.
"""

from __future__ import annotations

import os
import shutil
import time

from pyspark.sql import functions as F

from search_engine_spark.operators.build import (
    build_postings_flat,
    lemma_stats_from_blocks,
)
from search_engine_spark.operators.compress import build_postings_compressed
from search_engine_spark.operators.upsert import (
    _old_dir,
    _swap_in,
    recover_swaps,
)
from search_engine_spark.plans.job import IndexBuildJob
from search_engine_spark.schemas import LINEAGE


def bucket_sizes(spark, out: str) -> dict[int, int]:
    """Per-bucket doc counts (one small agg over the docs table) — the
    observability probe a rebalance decision keys off."""
    rows = (
        spark.read.parquet(f"{out}/docs")
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    return {int(r["bucket"]): int(r["n"]) for r in rows}


def _rebuild_bucket_postings(
    spark, out: str, b: int, range_size: int, positional: bool
) -> None:
    docs_b = spark.read.parquet(f"{out}/docs/bucket={b}")
    if positional:
        from search_engine_spark.operators.build import (
            build_postings_flat_positional,
        )

        pf = build_postings_flat_positional(docs_b)
    else:
        pf = build_postings_flat(docs_b)
    blocks = build_postings_compressed(
        pf, range_size=range_size, positional=positional
    )
    _swap_in(
        blocks,
        f"{out}/postings/bucket={b}",
        f"{out}/.staging_post_{b}",
        _old_dir(out, "post", b),
    )
    if os.path.exists(f"{out}/filters"):
        # the filters family (operators/filters.py) moves with the bucket
        from search_engine_spark.operators.filters import (
            FILTER_COLS,
            build_filter_blocks,
        )

        cols = FILTER_COLS
        try:
            lin = {
                r["key"]: r["value"]
                for r in spark.read.parquet(f"{out}/lineage").collect()
            }
            cols = tuple(
                c for c in lin.get("filter_cols", ",".join(cols)).split(",")
                if c
            )
        except Exception:
            pass
        fb = build_filter_blocks(docs_b, range_size, cols)
        _swap_in(
            fb,
            f"{out}/filters/bucket={b}",
            f"{out}/.staging_filt_{b}",
            _old_dir(out, "filt", b),
        )


def rebalance_buckets(job: IndexBuildJob, per_bucket: int | None = None) -> dict:
    """Re-bucket the index to ≤ ``per_bucket`` docs per bucket (default:
    the build-time target from lineage). doc_ids, postings content and
    stats values are unchanged — only the bucket layout (and therefore
    the incremental-rebuild unit) moves."""
    spark = job.spark
    out = job.out
    recover_swaps(out)
    lineage_rows = spark.read.parquet(f"{out}/lineage").collect()
    lineage = {r["key"]: r["value"] for r in lineage_rows}
    range_size = int(lineage["range_size"])
    old_n = int(lineage["n_buckets"])
    if per_bucket is None:
        if "per_bucket" in lineage:
            per_bucket = int(lineage["per_bucket"])
        else:  # the fresh build's ceil rule (plans/job.py _stage_offsets)
            per_bucket = max(1, -(-int(lineage["n_turns"]) // old_n))
    per_bucket = int(per_bucket)

    docs = spark.read.parquet(f"{out}/docs")
    positional = (
        "positions" in docs.schema["lemma_counts"].dataType.elementType.names
    )
    total = docs.count()
    new_n = max(1, -(-total // per_bucket))

    # target bucket per conversation: same conv-start rule as the build
    conv_targets = (
        docs.groupBy("conv_id")
        .agg((F.min("doc_id") - F.lit(1)).alias("_start"))
        .select(
            "conv_id",
            F.least(
                F.expr(f"CAST(_start DIV {per_bucket} AS INT)"),
                F.lit(new_n - 1),
            ).alias("_target"),
        )
    )
    moving = docs.join(conv_targets, "conv_id").filter(
        F.col("_target") != F.col("bucket")
    )
    # materialize BEFORE any swap — the plan reads the live bucket dirs
    staged = f"{out}/.staging_rebalance"
    moving.write.mode("overwrite").parquet(staged)
    moving = spark.read.parquet(staged)
    n_moved = moving.count()
    if n_moved == 0:
        shutil.rmtree(staged, ignore_errors=True)
        return {
            "moved_docs": 0, "buckets_rewritten": [],
            "n_buckets": old_n, "per_bucket": per_bucket,
        }
    affected = sorted(
        int(r["b"])
        for r in moving.select(F.col("bucket").alias("b"))
        .union(moving.select(F.col("_target").alias("b")))
        .distinct()
        .collect()
    )
    doc_cols = [c for c in docs.columns if c != "bucket"]

    t0 = time.time()
    rewritten = []
    for b in affected:
        if b >= new_n:  # source-only bucket beyond the new layout
            continue
        moved_out = moving.filter(F.col("bucket") == b).select("doc_id")
        try:
            stay_b = spark.read.parquet(f"{out}/docs/bucket={b}").join(
                F.broadcast(moved_out), "doc_id", "left_anti"
            )
        except Exception:  # brand-new bucket dir (tail split)
            stay_b = None
        in_b = moving.filter(F.col("_target") == b).select(*doc_cols)
        new_b = in_b if stay_b is None else stay_b.unionByName(in_b)
        _swap_in(
            new_b,
            f"{out}/docs/bucket={b}",
            f"{out}/.staging_docs_{b}",
            _old_dir(out, "docs", b),
        )
        _rebuild_bucket_postings(spark, out, b, range_size, positional)
        rewritten.append(b)
    # shrink: buckets whose every doc moved into the new layout
    for b in range(new_n, old_n):
        shutil.rmtree(f"{out}/docs/bucket={b}", ignore_errors=True)
        shutil.rmtree(f"{out}/postings/bucket={b}", ignore_errors=True)
        shutil.rmtree(f"{out}/filters/bucket={b}", ignore_errors=True)

    # lemma_stats re-derives from the (re-sharded) blocks — values are
    # identical, the invariant "stats come from current blocks" is kept;
    # doc_stats depends only on doc rows, which did not change.
    blocks = spark.read.parquet(f"{out}/postings")
    lemma_stats_from_blocks(blocks).write.mode("overwrite").parquet(
        f"{out}/lemma_stats"
    )

    # lineage: single row per key, updated in place (collected above, so
    # the overwrite never reads what it writes)
    updates = {
        "n_buckets": str(new_n),
        "per_bucket": str(per_bucket),
        "n_turns": str(total),
    }
    run_id = lineage_rows[0]["run_id"] if lineage_rows else job.run_id
    merged: dict[str, tuple] = {
        r["key"]: (r["run_id"], r["key"], r["value"], r["ts"])
        for r in lineage_rows
    }
    for k, v in updates.items():
        prev = merged.get(k)
        merged[k] = (prev[0] if prev else run_id, k, v, prev[3] if prev else None)
    spark.createDataFrame(list(merged.values()), LINEAGE).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{out}/lineage")

    shutil.rmtree(staged, ignore_errors=True)
    shutil.rmtree(f"{out}/.cache_postings_flat", ignore_errors=True)
    shutil.rmtree(f"{out}/.cache_variants", ignore_errors=True)
    job._checkpoint("rebalance", -1, n_moved, t0)
    return {
        "moved_docs": n_moved,
        "buckets_rewritten": rewritten,
        "n_buckets": new_n,
        "per_bucket": per_bucket,
    }
