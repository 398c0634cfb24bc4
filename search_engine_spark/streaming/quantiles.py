"""Streaming windowed quantile telemetry: the mergeable log-linear
sketch (operators/sketch.py loghist_*) as a Structured Streaming
aggregation — per tumbling event-time window and group, the integer
bucket histogram of a value column, in append mode.

Why this composition is EXACT under streaming: the sketch's merge is a
bucket-wise integer add (associative + commutative), which is precisely
the contract Spark's stateful aggregation needs — however the feed is
micro-batched, re-ordered inside the watermark, or re-partitioned, the
per-(window, group, bucket) counts land identical to the batch run over
the closed feed (pinned in tests/test_streaming_quantiles.py against a
pure-pandas recount of the SAME bucket pin via int.bit_length). A
quantile is then a QUERY over the emitted histogram — the batch
read-off ``loghist_quantiles`` applies unchanged with the window start
as an extra group column — so the stream emits mergeable STATE (tiny:
≤ ~2·56·k buckets per group per window), never final answers that can't
be combined later across shards or re-windowed coarser.

Scale shape: the bucket expression is native SQL at the source (no
UDF), the only shuffle keys on (window, group, bucket), state is
bounded by |open windows| × |groups| × |buckets| regardless of row
rate, and the watermark bounds |open windows|. Public prior art: DDSketch
(Masson et al., VLDB 2019) is designed exactly for this mergeable
telemetry role; HdrHistogram interval recorders are the single-node
analog. No reference counterpart (the reference is batch-only).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from search_engine_spark.operators.sketch import (
    LOGHIST_K,
    LOGHIST_SCALE,
    loghist_bucketize,
)


def _windowed_hist(
    events: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    ts_col: str,
    window: str,
    scale: int,
    k: int,
) -> DataFrame:
    b = loghist_bucketize(
        events, value_col, [ts_col, *group_cols], scale, k
    )
    return (
        b.groupBy(F.window(ts_col, window).alias("w"), *group_cols, "bucket")
        .agg(F.count("*").cast("long").alias("cnt"))
        .select(
            F.col("w.start").alias("window_start"),
            *group_cols,
            "bucket",
            "cnt",
        )
    )


def loghist_stream(
    events: DataFrame,
    value_col: str = "value",
    group_cols: Sequence[str] = ("event_type",),
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "1 minute",
    scale: int = LOGHIST_SCALE,
    k: int = LOGHIST_K,
) -> DataFrame:
    """Streaming (window_start, group..., bucket, cnt) in append mode —
    one final histogram per closed window (each row emits exactly once,
    when the watermark passes the window end). ``events`` is a
    streaming DataFrame carrying (ts_col, value_col, group_cols)."""
    b = loghist_bucketize(
        events, value_col, [ts_col, *group_cols], scale, k
    ).withWatermark(ts_col, watermark)
    return (
        b.groupBy(F.window(ts_col, window).alias("w"), *group_cols, "bucket")
        .agg(F.count("*").cast("long").alias("cnt"))
        .select(
            F.col("w.start").alias("window_start"),
            *group_cols,
            "bucket",
            "cnt",
        )
    )


def loghist_windows_batch(
    events: DataFrame,
    value_col: str = "value",
    group_cols: Sequence[str] = ("event_type",),
    ts_col: str = "ts",
    window: str = "1 hour",
    scale: int = LOGHIST_SCALE,
    k: int = LOGHIST_K,
) -> DataFrame:
    """Batch twin of ``loghist_stream`` (identical plan minus the
    watermark) — the streaming result over a closed feed must equal it
    bucket-for-bucket."""
    return _windowed_hist(
        events, value_col, group_cols, ts_col, window, scale, k
    )


def windowed_quantiles(
    hist: DataFrame,
    group_cols: Sequence[str] = ("event_type",),
    ps: tuple[float, ...] = (0.5, 0.9, 0.99),
    scale: int = LOGHIST_SCALE,
    k: int = LOGHIST_K,
) -> DataFrame:
    """Quantiles per (window_start, group...) off an emitted histogram —
    the BATCH read-off applied with window_start as an extra group
    column (sketches are state; quantiles are a query over it)."""
    from search_engine_spark.operators.sketch import loghist_quantiles

    return loghist_quantiles(
        hist, ["window_start", *group_cols], ps, scale, k
    )
