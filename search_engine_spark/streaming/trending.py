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


# -- topic-shift detection (window-over-window df ratio) ---------------------
#
# "what is the corpus SUDDENLY talking about": a (window, key) row is a
# shift when its df is >= min_ratio times the SAME key's df in the
# immediately preceding window (an absent previous window counts as 1 —
# emergent keys get ratio = df). Public prior art: ES significant-text
# over adjacent date-histogram buckets / burst detection (Kleinberg).
#
# The plan is ONE stateful aggregation, no self-join: every event
# contributes a "cur" row to its own window and a "prev" row to the NEXT
# window (ts + window), so groupBy(window, key) can sum both sides of
# the ratio together. This matters for streaming: a windowed-agg
# self-join on (key, window - 1) is a second stateful operator Spark
# does not support in append mode, while the tagged union keeps the
# whole thing inside the supported single-agg shape — and the batch twin
# is the identical plan minus the watermark (the contract twin
# events_topic_shifts pins the semantics against DuckDB SQL).


def _tagged_events(
    ev: DataFrame, ts_col: str, key_col: str, window: str
) -> DataFrame:
    """(wts, key, cur, prev): each event twice — once for its own window
    (cur=1), once shifted one window forward (prev=1)."""
    iv = F.expr(f"INTERVAL {window}")
    cur = ev.select(
        F.col(ts_col).alias("wts"), F.col(key_col).alias("key"),
        F.lit(1).alias("cur"), F.lit(0).alias("prev"),
    )
    nxt = ev.select(
        (F.col(ts_col) + iv).alias("wts"), F.col(key_col).alias("key"),
        F.lit(0).alias("cur"), F.lit(1).alias("prev"),
    )
    return cur.unionByName(nxt)


def _shift_agg(
    tagged: DataFrame, key_col: str, window: str, min_df: int,
    min_ratio: float,
) -> DataFrame:
    ratio = F.round(
        F.col("df") / F.greatest(F.col("prev_df"), F.lit(1)), 6
    )
    return (
        tagged.groupBy(F.window("wts", window).alias("w"), "key")
        .agg(F.sum("cur").alias("df"), F.sum("prev").alias("prev_df"))
        .filter(F.col("df") >= min_df)
        .withColumn("ratio", ratio)
        .filter(F.col("ratio") >= min_ratio)
        .select(
            F.col("w.start").alias("window_start"),
            F.col("key").alias(key_col), "df", "prev_df", "ratio",
        )
    )


def window_shifts_batch(
    events: DataFrame,
    ts_col: str,
    key_col: str,
    window: str = "1 hour",
    min_df: int = 2,
    min_ratio: float = 2.0,
) -> DataFrame:
    """Batch window-over-window shift detection over ANY keyed event
    stream: (window_start, key, df, prev_df, ratio) for keys whose
    per-window count jumped. ``ratio = round(df / max(prev_df, 1), 6)``
    (pinned — the DuckDB twin computes the same expression). One
    shuffle on (window, key); the tagged union doubles the map-side
    input but partial aggregation collapses it before the exchange."""
    return _shift_agg(
        _tagged_events(events, ts_col, key_col, window),
        key_col, window, min_df, min_ratio,
    )


def topic_shifts_batch(
    turns: DataFrame,
    window: str = "1 hour",
    min_df: int = 2,
    min_ratio: float = 2.0,
) -> DataFrame:
    """Batch twin of ``topic_shifts_stream``: trending-term shift
    detection over the analyzed lemma stream of a transcripts table."""
    return window_shifts_batch(
        _lemma_events(turns), "ts", "lemma", window, min_df, min_ratio
    )


def topic_shifts_stream(
    turns: DataFrame,
    window: str = "1 hour",
    watermark: str = "1 minute",
    min_df: int = 2,
    min_ratio: float = 2.0,
) -> DataFrame:
    """Streaming topic-shift detection in append mode — a
    (window_start, lemma, df, prev_df, ratio) row emits exactly once,
    when the window closes.

    Watermark compensation: the prev-tagged copies carry
    ``wts = ts + window``, which would advance the event-time clock a
    full window ahead of the real feed and make the engine drop
    still-arriving cur rows as late. The declared delay is therefore
    ``window + watermark``: max(wts) − (window + watermark) =
    max(real ts) − watermark — the effective clock is EXACTLY the one
    ``trending_terms_stream`` runs on, so window close times and late
    policies match, and a closed feed equals the batch twin
    (tests/test_streaming_trending.py)."""
    tagged = _tagged_events(_lemma_events(turns), "ts", "lemma", window)
    return _shift_agg(
        tagged.withWatermark("wts", f"{window} {watermark}"),
        "lemma", window, min_df, min_ratio,
    )
