"""Resumable index-build job: per-partition checkpoints + lineage + metrics.

North-rule requirement: "resumable from checkpoint with per-partition
lineage + metrics tables". Reference analog: the site status heartbeat
(model/Site.java:13-21, services/WebParser.java:130-136) and the
cooperative-cancellation / restart flow (IndexingServiceImpl.java:36,
50-64) — but the reference restarts FROM SCRATCH on every run
(clearDataByUrlList, IndexingServiceImpl.java:173-193); this job resumes.

Partitioning scheme: conversations are split into ``n_buckets``
CONTIGUOUS ranges in conv_id order, sized by turn count from the offsets
table, so each bucket covers a contiguous doc_id range. A bucket is the
checkpoint unit: its docs and postings are rebuilt idempotently
(mode=overwrite on the bucket directory), and a checkpoint row is
appended only after the bucket's writes complete. On resume, buckets with
a committed checkpoint row are skipped; a bucket that crashed mid-write
has no row and is simply overwritten. The global doc_id assignment stays
correct across resumes because stage 0 pins the conversation-offset table
first (two-level id scheme, operators/docs.py).

Note: a doc-range shard (operators/compress.py) may straddle a bucket
boundary, in which case its blocks live in two bucket files; the query
path never relies on block_id uniqueness or file order (the WAND kernel
re-sorts decoded blocks), so this is benign — verified by
tests/test_job.py rank-identity.

Sandbox IO is plain parquet; on Iceberg the bucket commit becomes a
snapshot and the checkpoint row records its snapshot id (SURVEY.md §7.4
item 4).
"""

from __future__ import annotations

import shutil
import threading
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from search_engine_spark.operators.build import (
    build_doc_stats,
    build_postings_flat,
    lemma_stats_from_blocks,
)
from search_engine_spark.operators.compress import (
    DEFAULT_DOCS_PER_SHARD,
    build_postings_compressed,
    shard_spec,
)
from search_engine_spark.operators.docs import (
    conv_offsets,
    docs_from_offsets,
    enrich_docs,
)
from search_engine_spark.schemas import CHECKPOINTS, LINEAGE, METRICS


class IndexBuildJob:
    """Checkpointed transcripts → (docs, postings, lemma_stats, doc_stats)
    build. ``run()`` is idempotent: re-invoking after any crash completes
    exactly the missing work and converges to the same tables."""

    def __init__(
        self,
        spark: SparkSession,
        transcripts_path: str,
        out_dir: str,
        n_buckets: int = 8,
        docs_per_shard: int = DEFAULT_DOCS_PER_SHARD,
        run_id: str | None = None,
        positional: bool = False,
        filter_cols: tuple[str, ...] | None = None,
        snapshots: bool = True,
    ):
        from search_engine_spark.operators.filters import FILTER_COLS

        self.spark = spark
        self.transcripts_path = transcripts_path
        self.out = out_dir.rstrip("/")
        self.n_buckets = int(n_buckets)
        self.docs_per_shard = int(docs_per_shard)
        self.positional = bool(positional)
        # attribute columns indexed as non-scoring filter postings
        # (operators/filters.py); () disables the filters family
        self.filter_cols = FILTER_COLS if filter_cols is None else tuple(filter_cols)
        self.run_id = run_id or f"run-{uuid.uuid4().hex[:12]}"
        # snapshot the index on every completed mutation (Iceberg commit
        # semantics, operators/snapshots.py); off only for throwaway builds
        self.snapshots = bool(snapshots)
        # cooperative cancellation (reference: stop-flag machinery in
        # IndexingServiceImpl.java:36, 50-64 / WebParser.java:65-68)
        self._cancel = threading.Event()
        self.buckets_completed = 0  # progress probe for observers/tests

    # -- state tables -------------------------------------------------------

    def _append(self, rows: list, schema, name: str) -> None:
        self.spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(f"{self.out}/{name}")

    def _checkpoint(
        self,
        stage: str,
        partition_id: int,
        rows: int,
        t0: float,
        status: str = "done",
        last_error: str | None = None,
    ) -> None:
        from datetime import datetime, timezone

        started = datetime.fromtimestamp(t0, tz=timezone.utc)
        now = datetime.now(timezone.utc)
        self._append(
            [(self.run_id, partition_id, stage, status, rows, started, now,
              last_error)],
            CHECKPOINTS,
            "checkpoints",
        )
        if status != "done":
            return
        self._append(
            [
                (self.run_id, stage, f"wall_sec_p{partition_id}",
                 float(time.time() - t0), now),
                (self.run_id, stage, f"rows_p{partition_id}", float(rows), now),
            ],
            METRICS,
            "metrics",
        )

    def _done(self) -> set[tuple[str, int]]:
        try:
            cps = self.spark.read.parquet(f"{self.out}/checkpoints")
        except Exception:
            return set()
        return {
            (r["stage"], r["partition_id"])
            for r in cps.filter(F.col("status") == "done").collect()
        }

    # -- stages -------------------------------------------------------------

    def _stage_offsets(self, done: set) -> None:
        """Stage 0: pin conversation offsets + bucket assignment (the
        global-id anchor; everything downstream keys off this table)."""
        if ("offsets", 0) in done:
            return
        t0 = time.time()
        tr = self.spark.read.parquet(self.transcripts_path)
        off = conv_offsets(tr)
        total = tr.count()
        per_bucket = max(1, -(-total // self.n_buckets))  # ceil
        off = off.withColumn(
            "bucket",
            F.least(
                (F.col("_conv_offset") / F.lit(per_bucket)).cast("int"),
                F.lit(self.n_buckets - 1),
            ),
        )
        off.write.mode("overwrite").parquet(f"{self.out}/conv_offsets")
        self._append(
            [
                (self.run_id, "input_path", self.transcripts_path, None),
                (self.run_id, "n_turns", str(total), None),
                (self.run_id, "n_buckets", str(self.n_buckets), None),
                # the build-time bucket-size target; upserts refresh n_turns
                # as ids grow, so per_bucket is NOT derivable from lineage
                # later — rebalance_buckets keys off this pinned value
                (self.run_id, "per_bucket", str(per_bucket), None),
                (self.run_id, "docs_per_shard", str(self.docs_per_shard), None),
                (self.run_id, "positional", str(self.positional), None),
                (self.run_id, "filter_cols", ",".join(self.filter_cols), None),
                (self.run_id, "range_size",
                 str(shard_spec(total, self.docs_per_shard)), None),
            ],
            LINEAGE,
            "lineage",
        )
        self._checkpoint("offsets", 0, total, t0)

    def _stage_bucket(self, b: int, range_size: int, done: set) -> None:
        """Per-bucket: docs (tokenize once) then compressed postings."""
        off = self.spark.read.parquet(f"{self.out}/conv_offsets").filter(
            F.col("bucket") == b
        )
        if ("docs", b) not in done:
            t0 = time.time()
            tr = self.spark.read.parquet(self.transcripts_path)
            docs_b = enrich_docs(
                docs_from_offsets(tr, off), with_lemmas=True,
                positional=self.positional,
            )
            docs_b.write.mode("overwrite").parquet(f"{self.out}/docs/bucket={b}")
            n = self.spark.read.parquet(f"{self.out}/docs/bucket={b}").count()
            self._checkpoint("docs", b, n, t0)
        if ("postings", b) not in done:
            t0 = time.time()
            docs_b = self.spark.read.parquet(f"{self.out}/docs/bucket={b}")
            if self.positional:
                from search_engine_spark.operators.build import (
                    build_postings_flat_positional,
                )

                pf = build_postings_flat_positional(docs_b)
            else:
                pf = build_postings_flat(docs_b)
            blocks = build_postings_compressed(
                pf, range_size=range_size, positional=self.positional
            )
            blocks.write.mode("overwrite").parquet(
                f"{self.out}/postings/bucket={b}"
            )
            n = self.spark.read.parquet(f"{self.out}/postings/bucket={b}").count()
            self._checkpoint("postings", b, n, t0)
        if self.filter_cols and ("filters", b) not in done:
            # attribute filter postings (operators/filters.py): same
            # block format + doc-range sharding, separate table so
            # df/cf stats never see them
            from search_engine_spark.operators.filters import (
                build_filter_blocks,
            )

            t0 = time.time()
            docs_b = self.spark.read.parquet(f"{self.out}/docs/bucket={b}")
            build_filter_blocks(
                docs_b, range_size, self.filter_cols
            ).write.mode("overwrite").parquet(f"{self.out}/filters/bucket={b}")
            n = self.spark.read.parquet(f"{self.out}/filters/bucket={b}").count()
            self._checkpoint("filters", b, n, t0)

    def _stage_stats(self, done: set) -> bool:
        """Global stats from the small outputs (no corpus rescan).
        Returns whether the stage ran (vs already checkpointed)."""
        if ("stats", 0) in done:
            return False
        t0 = time.time()
        blocks = self.spark.read.parquet(f"{self.out}/postings")
        lemma_stats_from_blocks(blocks).write.mode("overwrite").parquet(
            f"{self.out}/lemma_stats"
        )
        docs = self.spark.read.parquet(f"{self.out}/docs")
        build_doc_stats(docs).write.mode("overwrite").parquet(
            f"{self.out}/doc_stats"
        )
        self._checkpoint("stats", 0, self.n_buckets, t0)
        return True

    # -- driver -------------------------------------------------------------

    def cancel(self) -> None:
        """Cooperative stop: the running ``run()`` finishes its current
        bucket (bucket commits stay atomic) and returns with
        ``cancelled=True``; a later ``run()`` resumes from the checkpoint
        exactly like a crash. Reference: GET /api/stopIndexing
        (ApiController.java:35-38, IndexingServiceImpl.java:50-64)."""
        self._cancel.set()

    def run(self, fail_after_buckets: int | None = None) -> dict:
        """Execute all missing stages. ``fail_after_buckets`` simulates a
        crash after that many bucket builds (resume tests). On an
        exception inside a bucket, a ``status="failed"`` checkpoint row
        records the error (reference: Site.lastError heartbeat,
        WebParser.java:130-136) before the exception propagates; failed
        rows never count as done, so resume redoes that bucket."""
        done = self._done()
        self._stage_offsets(done)
        lineage = {
            r["key"]: r["value"]
            for r in self.spark.read.parquet(f"{self.out}/lineage").collect()
        }
        range_size = int(lineage["range_size"])
        built = 0
        cancelled = False
        for b in range(self.n_buckets):
            if self._cancel.is_set():
                cancelled = True
                break
            if (
                ("docs", b) in done
                and ("postings", b) in done
                and (not self.filter_cols or ("filters", b) in done)
            ):
                continue
            t0 = time.time()
            try:
                self._stage_bucket(b, range_size, done)
            except Exception as e:  # record, then surface
                self._checkpoint(
                    "bucket", b, 0, t0, status="failed",
                    last_error=f"{type(e).__name__}: {e}"[:500],
                )
                raise
            built += 1
            self.buckets_completed = built
            if fail_after_buckets is not None and built >= fail_after_buckets:
                raise RuntimeError(
                    f"simulated crash after {built} buckets (test hook)"
                )
        if built:
            # drop the derived flat-postings view (api.SearchEngine) — it
            # belongs to the previous index epoch
            shutil.rmtree(
                f"{self.out}/.cache_postings_flat", ignore_errors=True
            )
            shutil.rmtree(
                f"{self.out}/.cache_impact", ignore_errors=True
            )
        stats_ran = False
        if not cancelled:
            stats_ran = self._stage_stats(done)
        snapshot_id = None
        if self.snapshots and not cancelled and (built or stats_ran):
            # completed mutation → Iceberg-style commit: the checkpoint
            # row records the snapshot id (SURVEY.md §7.4 item 4)
            from search_engine_spark.operators.snapshots import (
                create_snapshot,
            )

            t0 = time.time()
            manifest = create_snapshot(
                self.out, operation="build", run_id=self.run_id
            )
            snapshot_id = manifest["snapshot_id"]
            self._checkpoint("snapshot", snapshot_id, manifest["n_files"], t0)
        return {
            "run_id": self.run_id,
            "out": self.out,
            "buckets_built": built,
            "n_buckets": self.n_buckets,
            "cancelled": cancelled,
            "snapshot_id": snapshot_id,
        }

    # -- read side ----------------------------------------------------------

    def tables(self) -> dict[str, DataFrame]:
        import os

        r = self.spark.read
        extra = {}
        if os.path.exists(f"{self.out}/filters"):
            extra["filters"] = r.parquet(f"{self.out}/filters")
        return {
            **extra,
            "docs": r.parquet(f"{self.out}/docs"),
            "postings": r.parquet(f"{self.out}/postings"),
            "lemma_stats": r.parquet(f"{self.out}/lemma_stats"),
            "doc_stats": r.parquet(f"{self.out}/doc_stats"),
            "checkpoints": r.parquet(f"{self.out}/checkpoints"),
            "metrics": r.parquet(f"{self.out}/metrics"),
            "lineage": r.parquet(f"{self.out}/lineage"),
        }
