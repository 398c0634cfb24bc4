"""Streaming trending terms: watermarked windowed document frequency of
the analyzed lemma stream — "what is the corpus suddenly talking about"
over a live transcript feed.

Per tumbling event-time window, the DOCUMENT frequency of every lemma
(one count per turn containing it, the same df semantics as the index
dictionary — tf within a turn does not inflate the trend). Append mode:
a (window, lemma) row emits exactly once, when the watermark passes the
window end, so downstream consumers (a trend dashboard, a hot-term
cache invalidator) see each window's final counts.

Scale shape: tokenize is the SAME Arrow pandas UDF as the index build
(one narrow pass), the windowed count shuffles on (window, lemma) —
hash-partitioned across executors, state bounded by |windows in the
watermark| × |active vocabulary|, no driver involvement. ``min_df``
prunes the singleton tail before it leaves the aggregation.

Batch twin: ``trending_terms_batch`` (identical plan minus the
watermark) — the streaming result over a closed feed must equal it
(tests/test_streaming_trending.py).

No reference counterpart (the reference is batch-only; public prior
art: Twitter-style trending topics / ES significant-text over date
histograms).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _lemma_events(turns: DataFrame) -> DataFrame:
    """(ts, lemma) one row per (turn, DISTINCT lemma) — tokenization via
    the index build's Arrow UDF; lemma_counts entries are unique per
    turn, so exploding them IS the distinct-lemma stream."""
    from search_engine_spark.functions.udfs import tokenize_lemmatize_counts

    return (
        turns.select(
            "ts", tokenize_lemmatize_counts(F.col("text")).alias("_lc")
        )
        .select("ts", F.explode("_lc").alias("_x"))
        .select("ts", F.col("_x.lemma").alias("lemma"))
    )


def trending_terms_stream(
    turns: DataFrame,
    window: str = "1 hour",
    watermark: str = "1 minute",
    min_df: int = 1,
) -> DataFrame:
    """Streaming (window_start, lemma, df) in append mode — see module
    docstring. ``turns`` is a streaming DataFrame with (ts, text)."""
    return (
        _lemma_events(turns)
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "lemma")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") >= min_df)
        .select(F.col("w.start").alias("window_start"), "lemma", "df")
    )


def trending_terms_batch(
    turns: DataFrame, window: str = "1 hour", min_df: int = 1
) -> DataFrame:
    """Batch twin of ``trending_terms_stream`` (same plan, no watermark)."""
    return (
        _lemma_events(turns)
        .groupBy(F.window("ts", window).alias("w"), "lemma")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") >= min_df)
        .select(F.col("w.start").alias("window_start"), "lemma", "df")
    )
