"""Incremental turn upsert (reference S4/S7/J8, set-oriented).

Reference flow for ``POST /api/indexPage``: validate, delete the page's
postings, decrement each affected lemma's df (dropping rows that reach 0),
then refetch and re-add — and crucially, a page the engine has NEVER seen
is simply indexed (services/WebParser.java:88-91, 212-243,
IndexingServiceImpl.java:86-118) — one row at a time over JDBC.

Spark re-expression over the checkpointed bucket layout (plans/job.py):
the incremental unit is the BUCKET. A delta of turns splits into

- UPDATES — existing (conv_id, turn_idx) keys keep their doc_id (doc
  identity is the key, so ids are stable, unlike the reference's
  delete+reinsert id churn);
- INSERTS — never-seen keys get doc_ids APPENDED at the end of the dense
  range (old_max + dense rank over the delta's (conv_id, turn_idx)
  order, via the same conv-offset operator the full build uses), so
  existing ids never move. Appended ids map to the last bucket under the
  build's ``offset // per_bucket`` rule, so queries need no special case.

Within-delta duplicates of one key collapse to the latest ``ts`` (same
MERGE semantics as streaming/ingest.py) BEFORE binding, so a dirty delta
cannot double-count postings.

Per affected bucket: docs' = old docs anti-join delta keys ∪ re-tokenized
delta rows (J8's anti-join form), swapped in via a crash-safe directory
dance (write staging → rename live aside → rename staging in → drop old;
a crash in any window is recovered on the next run — the Iceberg
deployment replaces all of this with ``MERGE INTO`` + snapshot commit);
then that bucket's compressed postings are rebuilt from docs' — the whole
bucket, bounded work, no partial-block surgery. Stats refresh from block
metadata / docs (cheap; a lemma whose last posting vanished drops out,
mirroring the reference's delete-at-df-0, WebParser.java:231-237).

Unchanged buckets are untouched — verified byte-level by tests/test_trim.py.
"""

from __future__ import annotations

import glob
import os
import shutil
import time

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from search_engine_spark.functions.udfs import tokenize_lemmatize_counts
from search_engine_spark.operators.build import (
    build_doc_stats,
    build_postings_flat,
    lemma_stats_from_blocks,
)
from search_engine_spark.operators.compress import build_postings_compressed
from search_engine_spark.operators.docs import (
    conv_offsets,
    docs_from_offsets,
    with_scope,
)
from search_engine_spark.plans.job import IndexBuildJob

_KEY = ["conv_id", "turn_idx"]


def _dedup_delta(delta: DataFrame) -> DataFrame:
    """Last write per turn key wins (ts desc), mirroring MERGE semantics —
    the same rule streaming/ingest.py applies per micro-batch. Without
    this, a delta repeating one key would union two doc rows and
    double-count postings."""
    w = Window.partitionBy(*_KEY).orderBy(F.desc("ts"))
    return (
        delta.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def _enrich(d: DataFrame, positional: bool = False) -> DataFrame:
    """scope + tokenization + doc_len for delta rows that already carry
    doc_id and bucket (shared by the update and insert branches)."""
    from search_engine_spark.functions.udfs import tokenize_lemmatize_positions

    tokfn = tokenize_lemmatize_positions if positional else tokenize_lemmatize_counts
    d = with_scope(d)
    d = d.withColumn("lemma_counts", tokfn(F.col("text")))
    d = d.withColumn(
        "doc_len",
        F.expr("aggregate(lemma_counts, 0, (a, x) -> a + x.tf)").cast("int"),
    )
    return d.select(
        "doc_id", "conv_id", "turn_idx", "role", "tool", "ts",
        "scope", "text", "doc_len", "lemma_counts", "bucket",
    )


def _retokenized(
    delta: DataFrame, docs: DataFrame, max_id: int, last_bucket: int
) -> DataFrame:
    """delta (transcripts schema, key-deduped) → full docs rows: existing
    keys keep their doc_id; new keys get appended ids past ``max_id``
    (dense, in the delta's own (conv_id, turn_idx) order). Positional
    indexes (docs carrying positions) retokenize positionally."""
    positional = (
        "positions" in docs.schema["lemma_counts"].dataType.elementType.names
    )
    keyed = docs.select("doc_id", *_KEY, "bucket")
    updates = delta.join(keyed, _KEY, "inner")
    new_rows = delta.join(keyed.select(*_KEY), _KEY, "left_anti")
    inserts = (
        docs_from_offsets(new_rows, conv_offsets(new_rows))
        .withColumn("doc_id", (F.col("doc_id") + F.lit(int(max_id))).cast("long"))
        .withColumn("bucket", F.lit(int(last_bucket)))
    )
    return _enrich(updates, positional).unionByName(_enrich(inserts, positional))


def _old_dir(out: str, kind: str, bucket: int) -> str:
    # dot-prefixed so Spark's partition discovery over docs/postings never
    # sees a half-swapped directory
    return f"{out}/.old_{kind}_{bucket}"


def _swap_in(df: DataFrame, final_dir: str, staging_dir: str, old_dir: str) -> None:
    """Crash-safe swap: write staging fully, move live aside, move staging
    in, then drop the old copy. Every crash window leaves either the live
    dir or a recoverable ``.old_*`` (see ``recover_swaps``) — never a
    missing bucket."""
    df.write.mode("overwrite").parquet(staging_dir)
    if os.path.exists(old_dir):
        shutil.rmtree(old_dir)
    if os.path.exists(final_dir):
        os.rename(final_dir, old_dir)
    os.rename(staging_dir, final_dir)
    shutil.rmtree(old_dir, ignore_errors=True)


def recover_swaps(out: str) -> list[str]:
    """Repair any interrupted ``_swap_in``: a leftover ``.old_{kind}_{b}``
    whose live dir is missing is renamed back (pre-upsert state — the
    idempotent rerun then reapplies the delta); one whose live dir exists
    is a completed swap and is dropped. Returns the restored paths."""
    kinds = {"docs": "docs", "post": "postings", "filt": "filters"}
    restored = []
    for old in glob.glob(f"{out}/.old_*_*"):
        name = os.path.basename(old)[len(".old_"):]
        kind, _, bucket = name.rpartition("_")
        if kind == "off":  # the (unbucketed) conv_offsets registry swap
            final = f"{out}/conv_offsets"
        else:
            final = f"{out}/{kinds.get(kind, 'postings')}/bucket={bucket}"
        if os.path.exists(final):
            shutil.rmtree(old, ignore_errors=True)
        else:
            os.rename(old, final)
            restored.append(final)
    return restored


def upsert_turns(
    job: IndexBuildJob,
    delta: DataFrame,
    rebalance_factor: float | None = None,
) -> dict:
    """Apply a delta of changed AND/OR new turns to a completed build.

    ``rebalance_factor`` (opt-in): after the upsert, if the tail bucket
    (where inserts append) exceeds ``factor × per_bucket`` docs, run
    ``maintenance.rebalance_buckets`` so the incremental-rebuild unit
    stays bounded across many append-heavy deltas; the rebalance summary
    is returned under ``"rebalanced"``. Off by default — layout changes
    are a deliberate maintenance action."""
    spark = job.spark
    out = job.out
    recover_swaps(out)
    docs = spark.read.parquet(f"{out}/docs")
    lineage = {
        r["key"]: r["value"]
        for r in spark.read.parquet(f"{out}/lineage").collect()
    }
    range_size = int(lineage["range_size"])
    last_bucket = int(lineage["n_buckets"]) - 1
    from search_engine_spark.operators.filters import FILTER_COLS

    has_filters = os.path.exists(f"{out}/filters")
    filter_cols = tuple(
        c
        for c in lineage.get("filter_cols", ",".join(FILTER_COLS)).split(",")
        if c
    )

    # ≤1-row agg collect — the broadcast-stats analog, not a driver loop
    max_id = docs.agg(F.max("doc_id").alias("m")).collect()[0]["m"] or 0

    # materialize the retokenized delta BEFORE any directory swap — its
    # plan reads the live docs table, which the swaps below replace
    staged = f"{out}/.staging_updated"
    _retokenized(_dedup_delta(delta), docs, max_id, last_bucket).write.mode(
        "overwrite"
    ).parquet(staged)
    updated = spark.read.parquet(staged)
    n_updated = updated.filter(F.col("doc_id") <= max_id).count()
    n_inserted = updated.count() - n_updated
    buckets = sorted(
        r["bucket"] for r in updated.select("bucket").distinct().collect()
    )

    t0 = time.time()
    positional = (
        "positions" in docs.schema["lemma_counts"].dataType.elementType.names
    )
    for b in buckets:
        old_b = spark.read.parquet(f"{out}/docs/bucket={b}")
        upd_b = updated.filter(F.col("bucket") == b).drop("bucket")
        keys_b = upd_b.select(*_KEY)
        new_b = old_b.join(keys_b, _KEY, "left_anti").unionByName(upd_b)
        _swap_in(
            new_b, f"{out}/docs/bucket={b}", f"{out}/.staging_docs_{b}",
            _old_dir(out, "docs", b),
        )
        docs_b = spark.read.parquet(f"{out}/docs/bucket={b}")
        if positional:
            from search_engine_spark.operators.build import (
                build_postings_flat_positional,
            )

            pf_b = build_postings_flat_positional(docs_b)
        else:
            pf_b = build_postings_flat(docs_b)
        blocks_b = build_postings_compressed(
            pf_b, range_size=range_size, positional=positional
        )
        _swap_in(
            blocks_b, f"{out}/postings/bucket={b}", f"{out}/.staging_post_{b}",
            _old_dir(out, "post", b),
        )
        if has_filters:
            # the filters family (operators/filters.py) rebuilds per
            # touched bucket exactly like term postings
            from search_engine_spark.operators.filters import (
                build_filter_blocks,
            )

            fb = build_filter_blocks(docs_b, range_size, filter_cols)
            _swap_in(
                fb, f"{out}/filters/bucket={b}",
                f"{out}/.staging_filt_{b}", _old_dir(out, "filt", b),
            )

    # stats refresh from small outputs (never rescans the corpus)
    blocks = spark.read.parquet(f"{out}/postings")
    lemma_stats_from_blocks(blocks).write.mode("overwrite").parquet(
        f"{out}/lemma_stats"
    )
    docs2 = spark.read.parquet(f"{out}/docs")
    build_doc_stats(docs2).write.mode("overwrite").parquet(f"{out}/doc_stats")

    # metadata invariants for merge (operators/merge.py): inserts extend
    # the dense id range past lineage's recorded n_turns and may add
    # never-seen conv_ids, which merge's doc offsets and conv-overlap
    # guard read. Refresh both from the POST-upsert tables (not this
    # run's insert count) so a rerun after a crash that died before this
    # step heals the metadata too.
    new_max = int(docs2.agg(F.max("doc_id")).head()[0] or 0)
    if new_max != int(lineage["n_turns"]):
        from search_engine_spark.schemas import LINEAGE

        lin_rows = spark.read.parquet(f"{out}/lineage").collect()
        patched = [
            (r["run_id"], r["key"],
             str(new_max) if r["key"] == "n_turns" else r["value"], r["ts"])
            for r in lin_rows
        ]
        spark.createDataFrame(patched, LINEAGE).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{out}/lineage")
    # register fully-inserted conversations: a conv absent from the
    # registry was never seen before this delta, so the delta carried ALL
    # its turns and its appended ids follow the dense per-conv formula
    # (offset = min(doc_id) - 1). Convs gaining extra turns later keep
    # their historical row — the registry's contract for merge is the
    # conv_id SET plus per-conv offsets valid at registration time.
    off_tbl = spark.read.parquet(f"{out}/conv_offsets")
    new_off = (
        updated.groupBy("conv_id")
        .agg(
            F.count("*").alias("_n"),
            (F.min("doc_id") - 1).cast("long").alias("_conv_offset"),
        )
        .join(off_tbl.select("conv_id"), "conv_id", "left_anti")
        .withColumn("bucket", F.lit(int(last_bucket)).cast("int"))
        .select(*off_tbl.columns)
    )
    if new_off.limit(1).count():
        _swap_in(
            off_tbl.unionByName(new_off),
            f"{out}/conv_offsets", f"{out}/.staging_off",
            _old_dir(out, "off", 0),
        )

    shutil.rmtree(staged, ignore_errors=True)
    # derived views (flat postings, fuzzy variant tables) are now stale
    shutil.rmtree(f"{out}/.cache_postings_flat", ignore_errors=True)
    shutil.rmtree(f"{out}/.cache_impact", ignore_errors=True)
    for vdir in glob.glob(f"{out}/.cache_variants*"):
        shutil.rmtree(vdir, ignore_errors=True)
    job._checkpoint("upsert", -1, n_updated + n_inserted, t0)
    summary = {
        "updated_turns": n_updated,
        "inserted_turns": n_inserted,
        "buckets_rebuilt": buckets,
    }
    if rebalance_factor:
        # deferred import: maintenance imports this module's swap helpers
        from search_engine_spark.operators.maintenance import (
            bucket_sizes,
            rebalance_buckets,
        )

        per_bucket = int(
            lineage.get(
                "per_bucket",
                -(-int(lineage["n_turns"]) // int(lineage["n_buckets"])),
            )
        )
        tail = bucket_sizes(spark, out).get(last_bucket, 0)
        if tail > rebalance_factor * per_bucket:
            summary["rebalanced"] = rebalance_buckets(job)
    return summary
