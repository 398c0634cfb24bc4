"""Structured Streaming ingestion: continuous index maintenance.

The reference's incremental path is a one-page-at-a-time HTTP upsert
(POST /api/indexPage → delete + refetch + re-add,
controllers/ApiController.java:40-43, services/WebParser.java:212-243).
The streaming re-expression: a file-source ``readStream`` over a drop
directory of transcript-delta parquet files, with ``foreachBatch``
applying the SAME batch upsert operator used for ad-hoc deltas
(operators/upsert.py) — exactly-once per micro-batch via the streaming
checkpoint + the upsert's idempotent bucket swap.

This is deliberately thin: all correctness lives in the shared batch
operator (SURVEY.md §2.10 — "a later streaming layer would be
readStream + foreachBatch(MERGE)"); watermarks/session windows have no
reference counterpart and stay out of scope.
"""

from __future__ import annotations

from pyspark.sql.streaming import StreamingQuery

from search_engine_spark.operators.upsert import upsert_turns
from search_engine_spark.plans.job import IndexBuildJob
from search_engine_spark.schemas import TRANSCRIPTS


def stream_upserts(
    job: IndexBuildJob,
    delta_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 8,
) -> StreamingQuery:
    """Start a stream that applies every delta file dropped into
    ``delta_dir`` to ``job``'s index. Returns the StreamingQuery
    (caller drives: processAllAvailable()/stop() in tests, awaitTermination
    in a service)."""
    spark = job.spark
    deltas = (
        spark.readStream.schema(TRANSCRIPTS)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(delta_dir)
    )

    def apply_batch(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # dedup within the micro-batch: last write per turn key wins
        # (ts tiebreak), mirroring MERGE semantics
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        w = Window.partitionBy("conv_id", "turn_idx").orderBy(F.desc("ts"))
        latest = (
            batch_df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        upsert_turns(job, latest)

    return (
        deltas.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime="1 second")
        .start()
    )
