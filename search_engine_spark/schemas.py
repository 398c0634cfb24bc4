"""All table schemas, declared explicitly — never inferred.

Reference analog: JPA fixed schema with DDL at startup
(model/*.java, application.yaml:23). FIXTURES.md §1-2 pins these shapes.
"""

from __future__ import annotations

from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# input (BASELINE.json input_hint)
TRANSCRIPTS = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("role", StringType()),
        StructField("text", StringType()),
        StructField("tool", StringType()),
        StructField("ts", TimestampType()),
    ]
)

# events stream table (TESTDATA.md: sf*/events.parquet) — batch contract
# queries q_events_* and streaming/sessions.py share this shape
EVENTS = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

# reference analog: page + site (model/Page.java:9-26, model/Site.java:8-28)
DOCS = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("role", StringType()),
        StructField("tool", StringType()),
        StructField("ts", TimestampType()),
        StructField("scope", StringType(), False),
        StructField("text", StringType()),
        StructField("doc_len", IntegerType(), False),
    ]
)

# reference analog: lemma dictionary (model/Lemma.java:9-27); df semantics
# per services/WebParser.java:184-193 (document frequency, scoped)
LEMMA_STATS = StructType(
    [
        StructField("scope", StringType(), False),
        StructField("lemma", StringType(), False),
        StructField("df", LongType(), False),
        StructField("cf", LongType(), False),
    ]
)

DOC_STATS = StructType(
    [
        StructField("scope", StringType(), False),
        StructField("n_docs", LongType(), False),
        StructField("avg_doc_len", DoubleType(), False),
        StructField("sum_doc_len", LongType(), False),
    ]
)

# reference analog: index posting rows (model/Index.java:8-28, rank=tf)
POSTINGS_FLAT = StructType(
    [
        StructField("lemma", StringType(), False),
        StructField("doc_id", LongType(), False),
        StructField("tf", IntegerType(), False),
    ]
)

# compressed block postings (FIXTURES.md §2); shard = doc_id range bucket
# (range-ALIGNED salt — operators/compress.py) so query-time WAND groups are
# doc-partitioned and the per-lemma merge is a pure ordered concat.
# (max_tf, min_dl) are the block-max WAND bound inputs: BM25's term score is
# increasing in tf, decreasing in dl, so score(max_tf, min_dl) upper-bounds
# every doc in the block under any scope's (idf, avgdl).
POSTINGS = StructType(
    [
        StructField("scope", StringType(), False),
        StructField("lemma", StringType(), False),
        StructField("shard", IntegerType(), False),
        StructField("block_id", IntegerType(), False),
        StructField("first_doc_id", LongType(), False),
        StructField("last_doc_id", LongType(), False),
        StructField("count", IntegerType(), False),
        StructField("sum_tf", LongType(), False),
        StructField("max_tf", IntegerType(), False),
        StructField("min_dl", IntegerType(), False),
        StructField("doc_ids", BinaryType(), False),
        StructField("tfs", BinaryType(), False),
        StructField("doc_lens", BinaryType(), False),
    ]
)

# positional variant: + per-block varbyte position lists (gap-encoded per
# posting, posting-first absolute; per-posting split by the tfs column).
# Separate schema so the non-positional path pays zero bytes for it.
POSTINGS_POS = StructType(
    POSTINGS.fields + [StructField("positions", BinaryType(), False)]
)

CHECKPOINTS = StructType(
    [
        StructField("run_id", StringType(), False),
        StructField("partition_id", IntegerType(), False),
        StructField("stage", StringType(), False),
        StructField("status", StringType(), False),
        StructField("rows", LongType(), False),
        StructField("started_ts", TimestampType()),
        StructField("finished_ts", TimestampType()),
        # reference analog: Site.lastError (model/Site.java:16-17) — set on
        # status="failed" rows, null on "done"
        StructField("last_error", StringType()),
    ]
)

LINEAGE = StructType(
    [
        StructField("run_id", StringType(), False),
        StructField("key", StringType(), False),
        StructField("value", StringType(), False),
        StructField("ts", TimestampType()),
    ]
)

METRICS = StructType(
    [
        StructField("run_id", StringType(), False),
        StructField("stage", StringType(), False),
        StructField("key", StringType(), False),
        StructField("value", DoubleType(), False),
        StructField("ts", TimestampType()),
    ]
)

# impact-ordered posting cache (operators/impact.py, `.cache_impact/`):
# per (scope, lemma, shard), postings sorted by the avgdl-free impact
# proxy (tf desc, dl asc, doc_id asc) and cut into BLOCK_SIZE-posting
# rank blocks; docs are RE-sorted by doc_id inside each block so the
# standard delta+varbyte codec applies unchanged. kind=0 rows are rank
# blocks ((next_tf, next_dl) = the first suffix posting in proxy order,
# -1/-1 when last); kind=1 rows are the per-distinct-tf residual strata
# (tf in max_tf, its min dl in min_dl; rank=-1, empty buffers).
IMPACT = StructType(
    [
        StructField("scope", StringType(), False),
        StructField("lemma", StringType(), False),
        StructField("shard", IntegerType(), False),
        StructField("kind", IntegerType(), False),
        StructField("rank", IntegerType(), False),
        StructField("count", IntegerType(), False),
        StructField("max_tf", IntegerType(), False),
        StructField("min_dl", IntegerType(), False),
        StructField("next_tf", IntegerType(), False),
        StructField("next_dl", IntegerType(), False),
        StructField("doc_ids", BinaryType(), False),
        StructField("tfs", BinaryType(), False),
        StructField("doc_lens", BinaryType(), False),
    ]
)

SEARCH_RESULT = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("score", DoubleType(), False),
    ]
)
