"""Index merge: combine two built indexes WITHOUT re-tokenizing — the
Lucene/Elasticsearch segment-merge analog (public prior art), re-expressed
for this engine's physical format.

Why it is cheap here: doc ids are dense 1-based per index, so merging B
after A is a CONSTANT-OFFSET id remap (off = |A's turns|); and the block
codec stores each block's first doc_id as an absolute varint at the head
of the ``doc_ids`` buffer with every later value a gap
(operators/compress.py ``_encode_frame``: ``gaps[block_starts] =
ids[block_starts]``), so remapping a block is patching ONE varint plus
two metadata columns — O(blocks) work, never O(postings), and the tf/dl
payloads (hence the WAND bounds max_tf/min_dl) are byte-identical.

Shard/bucket identity: B's shard ids shift by (max A shard + 1) and its
buckets by A's bucket count, keeping both id spaces disjoint. Shards only
ever need to be a consistent doc partition (every posting of a doc in one
shard — kernels do per-shard top-k then merge), which a constant shift
preserves; nothing requires shard ids to follow the ``(doc_id-1)//range``
formula globally (a doc-range shard already straddles bucket files, see
plans/job.py note).

Guards (raise ValueError): overlapping conv_ids (the merged id space must
stay a function of (conv_id, turn_idx)), mismatched ``positional`` /
``filter_cols`` / ``range_size`` lineage (future upserts rebuild buckets
with the recorded range_size, so it must be one number).

Equivalence pin (tests/test_merge.py): when B's conv_ids all sort after
A's, the merged index is IDENTICAL to a fresh build over the
concatenated corpus — same docs rows, same lemma_stats/doc_stats, same
search scores and doc ids — because the two-level id scheme assigns
exactly ``A's ids ++ (B's ids + off)`` in that case.

Scale shape: A's families move by HARDLINK manifest (the Iceberg
manifest-move analog — zero bytes copied; parquet part-files are
immutable, the same property operators/snapshots.py relies on, and the
append of B's rows only ever ADDS part files to the linked directories;
cross-device falls back to a byte copy); B's docs are a narrow map (no
shuffle, the
array-typed lemma_counts column never crosses an exchange); B's blocks
are a mapInPandas metadata patch; stats recompute from block metadata and
the docs scan via the SAME stage functions the build job uses
(build.py ``lemma_stats_from_blocks`` / ``build_doc_stats``) — the corpus
text is never re-read, nothing is re-tokenized, no posting is re-encoded.
"""

from __future__ import annotations

import os
import shutil
import time
import uuid
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from search_engine_spark.functions.codec import varbyte_decode, varbyte_encode


def _manifest_move(src: str, dst: str) -> None:
    """Materialize ``src`` at ``dst`` as a hardlink tree (Iceberg
    manifest-move analog): O(files) metadata ops, zero bytes copied.
    Safe because part-files are immutable — later writes into ``dst``
    only add new files or unlink, never modify shared inodes. The
    zero-byte ``_SUCCESS`` markers are recreated (a committer may
    O_TRUNC them, which would reach through a hardlink); anything
    unlinkable (cross-device) falls back to a byte copy."""
    for root, _dirs, files in os.walk(src):
        rel = os.path.relpath(root, src)
        out_root = dst if rel == "." else os.path.join(dst, rel)
        os.makedirs(out_root, exist_ok=True)
        for fn in files:
            sp, dp = os.path.join(root, fn), os.path.join(out_root, fn)
            if fn == "_SUCCESS":
                open(dp, "wb").close()
                continue
            try:
                os.link(sp, dp)
            except OSError:
                shutil.copy2(sp, dp)


def _patch_first_varint(buf: bytes, off: int) -> bytes:
    """Add ``off`` to the leading absolute varint of a block's doc_ids
    buffer (gaps after it are offset-invariant)."""
    i = 0
    while buf[i] & 0x80:
        i += 1
    first = int(varbyte_decode(buf[: i + 1])[0])
    return (
        varbyte_encode(np.array([first + off], dtype=np.uint64))
        + buf[i + 1:]
    )


def _remap_blocks(
    blocks: DataFrame, doc_off: int, shard_off: int, bucket_off: int
) -> DataFrame:
    """B's POSTINGS[_POS] rows (bucket partition column included) →
    remapped rows; one Arrow pass, payloads untouched except the head
    varint of ``doc_ids``."""
    schema = blocks.schema
    doc_off = int(doc_off)
    shard_off = int(shard_off)
    bucket_off = int(bucket_off)

    def patch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                continue
            pdf["first_doc_id"] = pdf["first_doc_id"] + doc_off
            pdf["last_doc_id"] = pdf["last_doc_id"] + doc_off
            pdf["shard"] = pdf["shard"] + shard_off
            pdf["bucket"] = pdf["bucket"] + bucket_off
            bufs = pdf["doc_ids"].to_numpy(object)
            pdf["doc_ids"] = [_patch_first_varint(b, doc_off) for b in bufs]
            yield pdf

    return blocks.mapInPandas(patch, schema=schema)


def _per_bucket_of(lin: dict) -> int:
    """Build-time bucket-size target of one input index: the pinned
    lineage key when present (plans/job.py writes it), else the legacy
    derivation from that input's own (n_turns, n_buckets)."""
    if "per_bucket" in lin:
        return int(lin["per_bucket"])
    return max(1, -(-int(lin["n_turns"]) // int(lin["n_buckets"])))


def _lineage_dict(spark: SparkSession, index_dir: str) -> dict[str, str]:
    return {
        r["key"]: r["value"]
        for r in spark.read.parquet(f"{index_dir}/lineage").collect()
    }


def merge_indexes(
    spark: SparkSession,
    dir_a: str,
    dir_b: str,
    out_dir: str,
    run_id: str | None = None,
) -> dict:
    """Merge index ``dir_b`` into/after ``dir_a``, writing a complete new
    index at ``out_dir`` (left untouched inputs). Returns a summary dict.
    See module docstring for semantics and guards."""
    from search_engine_spark.operators.build import (
        build_doc_stats,
        lemma_stats_from_blocks,
    )
    from search_engine_spark.schemas import CHECKPOINTS, LINEAGE, METRICS

    a, b = dir_a.rstrip("/"), dir_b.rstrip("/")
    out = out_dir.rstrip("/")
    if os.path.exists(out):
        raise ValueError(f"out_dir exists: {out}")
    lin_a, lin_b = _lineage_dict(spark, a), _lineage_dict(spark, b)
    for key in ("positional", "filter_cols", "range_size"):
        if lin_a.get(key) != lin_b.get(key):
            raise ValueError(
                f"lineage mismatch on {key!r}: "
                f"{lin_a.get(key)!r} vs {lin_b.get(key)!r}"
            )
    off_a = spark.read.parquet(f"{a}/conv_offsets")
    off_b = spark.read.parquet(f"{b}/conv_offsets")
    n_overlap = off_a.join(off_b, "conv_id", "inner").count()
    if n_overlap:
        raise ValueError(
            f"{n_overlap} conv_id(s) exist in both indexes — merge "
            "requires disjoint conversations (route updates through "
            "upsert_turns instead)"
        )
    # doc offsets come from the docs family itself (a max over parquet
    # column stats — no data pass), NOT lineage n_turns: upsert_turns
    # keeps lineage refreshed now, but indexes upserted by older code
    # have inserted ids past the recorded n_turns, and trusting the stale
    # number would assign duplicate doc_ids
    doc_off = int(
        spark.read.parquet(f"{a}/docs").agg(F.max("doc_id")).head()[0]
    )
    max_b = int(
        spark.read.parquet(f"{b}/docs").agg(F.max("doc_id")).head()[0]
    )
    bucket_off = int(lin_a["n_buckets"])
    shard_off = (
        int(
            spark.read.parquet(f"{a}/postings")
            .agg(F.max("shard")).head()[0]
        )
        + 1
    )
    t0 = time.time()
    run_id = run_id or f"merge-{uuid.uuid4().hex[:12]}"
    os.makedirs(out)

    # conv offsets: B shifts wholesale (id scheme: A's ids ++ B's + off)
    merged_off = off_a.unionByName(
        off_b.withColumn(
            "_conv_offset", (F.col("_conv_offset") + doc_off).cast("long")
        ).withColumn("bucket", F.col("bucket") + bucket_off)
    )
    merged_off.write.mode("overwrite").parquet(f"{out}/conv_offsets")

    # A's data families: hardlink manifest-move — no data pass
    families = ["docs", "postings"]
    has_filters = os.path.exists(f"{a}/filters")
    if has_filters != os.path.exists(f"{b}/filters"):
        raise ValueError("one index has a filters family, the other not")
    if has_filters:
        families.append("filters")
    for fam in families:
        _manifest_move(f"{a}/{fam}", f"{out}/{fam}")

    # B docs: narrow map (doc_id/bucket shift), appended per bucket
    docs_b = spark.read.parquet(f"{b}/docs").withColumn(
        "doc_id", (F.col("doc_id") + doc_off).cast("long")
    ).withColumn("bucket", F.col("bucket") + bucket_off)
    docs_b.write.mode("append").partitionBy("bucket").parquet(f"{out}/docs")

    # B postings (+ filter postings): O(blocks) metadata patch
    for fam in families[1:]:
        _remap_blocks(
            spark.read.parquet(f"{b}/{fam}"), doc_off, shard_off, bucket_off
        ).write.mode("append").partitionBy("bucket").parquet(f"{out}/{fam}")

    # stats: the job's own stage functions over the merged outputs —
    # block metadata + a narrow docs scan, the corpus is never re-read
    lemma_stats_from_blocks(
        spark.read.parquet(f"{out}/postings")
    ).write.mode("overwrite").parquet(f"{out}/lemma_stats")
    build_doc_stats(spark.read.parquet(f"{out}/docs")).write.mode(
        "overwrite"
    ).parquet(f"{out}/doc_stats")

    n_turns = doc_off + max_b
    lineage_rows = [
        (run_id, "input_path", f"merge({a}, {b})", None),
        (run_id, "n_turns", str(n_turns), None),
        (run_id, "n_buckets",
         str(bucket_off + int(lin_b["n_buckets"])), None),
        (run_id, "docs_per_shard", lin_a["docs_per_shard"], None),
        # coarsest build-time bucket target of the inputs — the rebalance
        # target for the concatenated layout (see plans/job.py lineage)
        (run_id, "per_bucket",
         str(max(_per_bucket_of(lin_a), _per_bucket_of(lin_b))), None),
        (run_id, "positional", lin_a["positional"], None),
        (run_id, "filter_cols", lin_a["filter_cols"], None),
        (run_id, "range_size", lin_a["range_size"], None),
    ]
    spark.createDataFrame(lineage_rows, LINEAGE).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{out}/lineage")
    from datetime import datetime, timezone

    started = datetime.fromtimestamp(t0, tz=timezone.utc)
    spark.createDataFrame(
        [(run_id, 0, "merge", "done", n_turns, started,
          datetime.now(timezone.utc), None)],
        CHECKPOINTS,
    ).coalesce(1).write.mode("overwrite").parquet(f"{out}/checkpoints")
    now = datetime.now(timezone.utc)
    spark.createDataFrame(
        [(run_id, "merge", "wall_sec_p0", float(time.time() - t0), now),
         (run_id, "merge", "rows_p0", float(n_turns), now)],
        METRICS,
    ).coalesce(1).write.mode("overwrite").parquet(f"{out}/metrics")
    from search_engine_spark.operators.snapshots import create_snapshot

    sid = create_snapshot(out, operation="merge", run_id=run_id)["snapshot_id"]
    return {
        "run_id": run_id,
        "out": out,
        "n_turns": n_turns,
        "doc_offset": doc_off,
        "shard_offset": shard_off,
        "bucket_offset": bucket_off,
        "snapshot_id": sid,
        "wall_sec": time.time() - t0,
    }


def merge_many(
    spark: SparkSession,
    dirs: list[str],
    out_dir: str,
    run_id: str | None = None,
) -> dict:
    """k-way index merge: each input is remapped ONCE with its cumulative
    offsets (doc/shard/bucket), so total work is O(Σ inputs) — a fold of
    pairwise ``merge_indexes`` would re-copy the growing accumulator k
    times (O(k·Σ)). Same guards and equivalence pin as the pairwise op:
    pairwise-disjoint conv_ids, identical positional/filter_cols/
    range_size lineage; when the inputs' conv ranges are sorted
    ascending, the result is table-identical to one fresh build."""
    from search_engine_spark.operators.build import (
        build_doc_stats,
        lemma_stats_from_blocks,
    )
    from search_engine_spark.schemas import CHECKPOINTS, LINEAGE, METRICS

    if len(dirs) < 2:
        raise ValueError("merge_many needs at least 2 indexes")
    dirs = [d.rstrip("/") for d in dirs]
    out = out_dir.rstrip("/")
    if os.path.exists(out):
        raise ValueError(f"out_dir exists: {out}")
    lins = [_lineage_dict(spark, d) for d in dirs]
    for key in ("positional", "filter_cols", "range_size"):
        vals = {lin.get(key) for lin in lins}
        if len(vals) > 1:
            raise ValueError(f"lineage mismatch on {key!r}: {sorted(map(str, vals))}")
    offs = [spark.read.parquet(f"{d}/conv_offsets") for d in dirs]
    # pairwise disjointness in one pass: any conv_id in >1 index fails
    from functools import reduce

    all_convs = reduce(
        DataFrame.unionByName, (o.select("conv_id") for o in offs)
    )
    n_dup = (
        all_convs.groupBy("conv_id").count().filter(F.col("count") > 1).count()
    )
    if n_dup:
        raise ValueError(
            f"{n_dup} conv_id(s) appear in more than one index — merge "
            "requires pairwise-disjoint conversations"
        )
    t0 = time.time()
    run_id = run_id or f"merge-{uuid.uuid4().hex[:12]}"
    os.makedirs(out)
    has_filters = os.path.exists(f"{dirs[0]}/filters")
    if any(os.path.exists(f"{d}/filters") != has_filters for d in dirs):
        raise ValueError("filters family present in some inputs, not all")
    families = ["postings"] + (["filters"] if has_filters else [])
    # per-input shard widths and doc-id maxes (tiny aggs over parquet
    # column stats) → cumulative offsets. Doc offsets use the ACTUAL max
    # doc_id, not lineage n_turns — see merge_indexes
    shard_maxes = [
        int(spark.read.parquet(f"{d}/postings").agg(F.max("shard")).head()[0])
        for d in dirs
    ]
    doc_maxes = [
        int(spark.read.parquet(f"{d}/docs").agg(F.max("doc_id")).head()[0])
        for d in dirs
    ]
    doc_off = shard_off = bucket_off = 0
    merged_off = None
    for i, (d, lin, off) in enumerate(zip(dirs, lins, offs)):
        if i == 0:
            for fam in ["docs", *families]:
                _manifest_move(f"{d}/{fam}", f"{out}/{fam}")
            merged_off = off
        else:
            docs_i = spark.read.parquet(f"{d}/docs").withColumn(
                "doc_id", (F.col("doc_id") + doc_off).cast("long")
            ).withColumn("bucket", F.col("bucket") + bucket_off)
            docs_i.write.mode("append").partitionBy("bucket").parquet(
                f"{out}/docs"
            )
            for fam in families:
                _remap_blocks(
                    spark.read.parquet(f"{d}/{fam}"),
                    doc_off, shard_off, bucket_off,
                ).write.mode("append").partitionBy("bucket").parquet(
                    f"{out}/{fam}"
                )
            merged_off = merged_off.unionByName(
                off.withColumn(
                    "_conv_offset",
                    (F.col("_conv_offset") + doc_off).cast("long"),
                ).withColumn("bucket", F.col("bucket") + bucket_off)
            )
        doc_off += doc_maxes[i]
        bucket_off += int(lin["n_buckets"])
        shard_off += shard_maxes[i] + 1
    merged_off.write.mode("overwrite").parquet(f"{out}/conv_offsets")
    lemma_stats_from_blocks(
        spark.read.parquet(f"{out}/postings")
    ).write.mode("overwrite").parquet(f"{out}/lemma_stats")
    build_doc_stats(spark.read.parquet(f"{out}/docs")).write.mode(
        "overwrite"
    ).parquet(f"{out}/doc_stats")
    lineage_rows = [
        (run_id, "input_path", f"merge({', '.join(dirs)})", None),
        (run_id, "n_turns", str(doc_off), None),
        (run_id, "n_buckets", str(bucket_off), None),
        (run_id, "docs_per_shard", lins[0]["docs_per_shard"], None),
        (run_id, "per_bucket",
         str(max(_per_bucket_of(lin) for lin in lins)), None),
        (run_id, "positional", lins[0]["positional"], None),
        (run_id, "filter_cols", lins[0]["filter_cols"], None),
        (run_id, "range_size", lins[0]["range_size"], None),
    ]
    spark.createDataFrame(lineage_rows, LINEAGE).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{out}/lineage")
    from datetime import datetime, timezone

    started = datetime.fromtimestamp(t0, tz=timezone.utc)
    now = datetime.now(timezone.utc)
    spark.createDataFrame(
        [(run_id, 0, "merge", "done", doc_off, started, now, None)],
        CHECKPOINTS,
    ).coalesce(1).write.mode("overwrite").parquet(f"{out}/checkpoints")
    spark.createDataFrame(
        [(run_id, "merge", "wall_sec_p0", float(time.time() - t0), now),
         (run_id, "merge", "rows_p0", float(doc_off), now)],
        METRICS,
    ).coalesce(1).write.mode("overwrite").parquet(f"{out}/metrics")
    from search_engine_spark.operators.snapshots import create_snapshot

    sid = create_snapshot(out, operation="merge", run_id=run_id)["snapshot_id"]
    return {
        "run_id": run_id,
        "out": out,
        "n_turns": doc_off,
        "n_indexes": len(dirs),
        "snapshot_id": sid,
        "wall_sec": time.time() - t0,
    }
