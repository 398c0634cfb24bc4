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


_BLOCK_AUDIT_COLS = (
    "scope lemma block_id first_doc_id last_doc_id count sum_tf "
    "max_tf min_dl doc_ids tfs doc_lens"
).split()

_BLOCK_AUDIT_SCHEMA = (
    "n_blocks long, bad_count long, bad_sum_tf long, bad_max_tf long, "
    "bad_min_dl long, bad_first long, bad_last long, bad_sorted long, "
    "bad_shard long, bad_positions long"
)


def _audit_blocks_kernel(range_size: int, positional: bool):
    """mapInPandas kernel: decode every block and count invariant
    violations. Byte columns are pulled out ONCE as object arrays —
    never per-row pandas access (CLAUDE.md perf lesson)."""
    import numpy as np
    import pandas as pd

    from search_engine_spark.functions.codec import (
        delta_decode,
        varbyte_decode,
    )
    from search_engine_spark.operators.compress import decode_positions

    def kernel(batches):
        for pdf in batches:
            c = {
                "n_blocks": len(pdf), "bad_count": 0, "bad_sum_tf": 0,
                "bad_max_tf": 0, "bad_min_dl": 0, "bad_first": 0,
                "bad_last": 0, "bad_sorted": 0, "bad_shard": 0,
                "bad_positions": 0,
            }
            id_bufs = pdf["doc_ids"].to_numpy(object)
            tf_bufs = pdf["tfs"].to_numpy(object)
            dl_bufs = pdf["doc_lens"].to_numpy(object)
            pos_bufs = (
                pdf["positions"].to_numpy(object) if positional else None
            )
            firsts = pdf["first_doc_id"].to_numpy(np.int64)
            lasts = pdf["last_doc_id"].to_numpy(np.int64)
            counts = pdf["count"].to_numpy(np.int64)
            sum_tfs = pdf["sum_tf"].to_numpy(np.int64)
            max_tfs = pdf["max_tf"].to_numpy(np.int64)
            min_dls = pdf["min_dl"].to_numpy(np.int64)
            for i in range(len(pdf)):
                ids = delta_decode(varbyte_decode(id_bufs[i])).astype(
                    np.int64
                )
                tfs = varbyte_decode(tf_bufs[i]).astype(np.int64)
                dls = varbyte_decode(dl_bufs[i]).astype(np.int64)
                n = ids.size
                c["bad_count"] += int(
                    n != counts[i] or tfs.size != n or dls.size != n
                )
                if n == 0:
                    continue
                c["bad_sum_tf"] += int(tfs.sum() != sum_tfs[i])
                c["bad_max_tf"] += int(tfs.max() != max_tfs[i])
                c["bad_min_dl"] += int(dls.min() != min_dls[i])
                c["bad_first"] += int(ids[0] != firsts[i])
                c["bad_last"] += int(ids[-1] != lasts[i])
                c["bad_sorted"] += int(bool((np.diff(ids) <= 0).any()))
                # a block never spans more than one shard-range width.
                # The ``(doc_id-1)//range_size`` formula holds only for
                # fresh builds — merge shifts shard ids by a constant
                # (merge.py:14-19) — so cross-block shard placement is
                # audited structurally per bucket in verify_index.
                c["bad_shard"] += int(ids[-1] - ids[0] >= range_size)
                if positional:
                    try:
                        plists = decode_positions(pos_bufs[i], tfs)
                        ok = len(plists) == n and all(
                            p.size == t for p, t in zip(plists, tfs)
                        )
                    except Exception:
                        ok = False
                    c["bad_positions"] += int(not ok)
            yield pd.DataFrame([c])

    return kernel


def verify_index(spark, index_dir: str, deep: bool = True) -> dict:
    """Full-index integrity audit (the Lucene CheckIndex analog; the
    reference's only recovery story is a full re-crawl —
    IndexingServiceImpl.java:173-193 — this is the cheaper `fsck`).

    Structural checks (metadata-only aggs):
    - ``doc_ids``: doc_id unique AND dense 1..max (upserts append past
      the max, so density survives inserts);
    - ``doc_keys``: (conv_id, turn_idx) unique;
    - ``conv_offsets``: every registered conversation's first doc_id is
      exactly its pinned offset + 1 (the global-id anchor);
    - ``lemma_stats`` / ``doc_stats``: stored stats equal re-derivation
      from blocks / docs (exact row equality both directions);
    - ``shards``: per (bucket, shard) doc-id hulls from block metadata
      are ≤ range_size wide, disjoint, and monotone in shard id. This
      is the invariant that survives every layout op — fresh builds use
      ``(doc_id-1)//range_size``, merge shifts shard ids by a constant
      (merge.py:14-19), upsert/rebalance re-shard single buckets — so
      the audit is per bucket, never the global formula.

    Deep checks (``deep=True`` — decodes EVERY block, a full-index scan
    job, run like a compaction not a query):
    - ``blocks``: per-block decode vs stored metadata — count, Σtf,
      (max_tf, min_dl) WAND bounds, first/last ids, strictly-increasing
      ids, ≤ shard-width span, positional tf==len(positions);
    - ``alignment``: every posting's (doc_id, doc_len) pair exists in
      the docs table (orphan postings / drifted lengths).

    Returns {check: {"ok": bool, ...counts}}; raises nothing — the
    caller decides whether a violation is fatal."""
    out = index_dir.rstrip("/")
    docs = spark.read.parquet(f"{out}/docs")
    blocks = spark.read.parquet(f"{out}/postings")
    lineage = {
        r["key"]: r["value"]
        for r in spark.read.parquet(f"{out}/lineage").collect()
    }
    range_size = int(lineage["range_size"])
    positional = "positions" in blocks.columns
    report: dict[str, dict] = {}

    r = docs.agg(
        F.count("*").alias("n"),
        F.countDistinct("doc_id").alias("n_ids"),
        F.max("doc_id").alias("max_id"),
        F.min("doc_id").alias("min_id"),
        F.countDistinct("conv_id", "turn_idx").alias("n_keys"),
    ).head()
    report["doc_ids"] = {
        "ok": r["n"] == r["n_ids"] == r["max_id"] and r["min_id"] == 1,
        "n_docs": r["n"], "distinct_ids": r["n_ids"],
        "max_id": r["max_id"],
    }
    report["doc_keys"] = {"ok": r["n_keys"] == r["n"], "distinct": r["n_keys"]}

    conv_firsts = docs.groupBy("conv_id").agg(
        F.min("doc_id").alias("_first")
    )
    n_off_bad = (
        spark.read.parquet(f"{out}/conv_offsets")
        .join(conv_firsts, "conv_id", "left")
        .filter(
            F.col("_first").isNull()
            | (F.col("_first") != F.col("_conv_offset") + 1)
        )
        .count()
    )
    report["conv_offsets"] = {"ok": n_off_bad == 0, "bad_convs": n_off_bad}

    stored_ls = spark.read.parquet(f"{out}/lemma_stats").select(
        "scope", "lemma", "df", "cf"
    )
    derived_ls = lemma_stats_from_blocks(blocks)
    ls_extra = stored_ls.exceptAll(derived_ls).count()
    ls_missing = derived_ls.exceptAll(stored_ls).count()
    report["lemma_stats"] = {
        "ok": ls_extra == 0 and ls_missing == 0,
        "extra": ls_extra, "missing": ls_missing,
    }
    from search_engine_spark.operators.build import build_doc_stats

    stored_ds = spark.read.parquet(f"{out}/doc_stats").select(
        "scope", "n_docs", F.round("avg_doc_len", 9).alias("avg_doc_len"),
        "sum_doc_len",
    )
    derived_ds = build_doc_stats(docs).select(
        "scope", "n_docs", F.round("avg_doc_len", 9).alias("avg_doc_len"),
        "sum_doc_len",
    )
    ds_bad = stored_ds.exceptAll(derived_ds).count() + derived_ds.exceptAll(
        stored_ds
    ).count()
    report["doc_stats"] = {"ok": ds_bad == 0, "bad_rows": ds_bad}

    # per-bucket shard hulls from block METADATA (no decode): window is
    # partitioned by bucket — each partition holds ~per_bucket/range_size
    # rows, never the whole index
    from pyspark.sql import Window

    hulls = blocks.groupBy("bucket", "shard").agg(
        F.min("first_doc_id").alias("_lo"),
        F.max("last_doc_id").alias("_hi"),
    )
    w = Window.partitionBy("bucket").orderBy("shard")
    n_shard_bad = (
        hulls.withColumn("_prev_hi", F.lag("_hi").over(w))
        .filter(
            (F.col("_hi") - F.col("_lo") >= range_size)
            | (
                F.col("_prev_hi").isNotNull()
                & (F.col("_lo") <= F.col("_prev_hi"))
            )
        )
        .count()
    )
    report["shards"] = {"ok": n_shard_bad == 0, "bad_shards": n_shard_bad}

    if deep:
        audit_cols = _BLOCK_AUDIT_COLS + (["positions"] if positional else [])
        totals = (
            blocks.select(*audit_cols)
            .mapInPandas(
                _audit_blocks_kernel(range_size, positional),
                schema=_BLOCK_AUDIT_SCHEMA,
            )
            .groupBy()
            .sum()
            .head()
        )
        blk = {
            k[len("sum("):-1]: int(totals[k] or 0)
            for k in totals.asDict()
        }
        blk["ok"] = all(
            v == 0 for k, v in blk.items() if k.startswith("bad_")
        )
        report["blocks"] = blk

        # orphan/drift check: decoded (doc_id, doc_len) ⊆ docs
        def pairs_kernel(batches):
            import pandas as pd

            from search_engine_spark.operators.compress import decode_blocks

            for pdf in batches:
                ids, _tfs, dls = decode_blocks(
                    pdf["doc_ids"].to_numpy(object),
                    pdf["tfs"].to_numpy(object),
                    pdf["doc_lens"].to_numpy(object),
                )
                yield pd.DataFrame(
                    {"doc_id": ids, "dl": dls}
                ).drop_duplicates()

        posting_pairs = (
            blocks.select("doc_ids", "tfs", "doc_lens")
            .mapInPandas(pairs_kernel, schema="doc_id long, dl long")
            .distinct()
        )
        n_orphans = posting_pairs.join(
            docs.select(
                "doc_id", F.col("doc_len").cast("long").alias("dl")
            ),
            ["doc_id", "dl"],
            "left_anti",
        ).count()
        report["alignment"] = {"ok": n_orphans == 0, "orphans": n_orphans}

    report["ok"] = all(v["ok"] for v in report.values())
    return report


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
    shutil.rmtree(f"{out}/.cache_impact", ignore_errors=True)
    job._checkpoint("rebalance", -1, n_moved, t0)
    return {
        "moved_docs": n_moved,
        "buckets_rewritten": rewritten,
        "n_buckets": new_n,
        "per_bucket": per_bucket,
    }
