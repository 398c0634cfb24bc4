"""Streaming trending terms (streaming/trending.py): the watermarked
windowed lemma-df stream over a closed transcript feed equals its batch
twin, which equals a pure-pandas analyze() recount."""

from __future__ import annotations

import pandas as pd
import pytest

from search_engine_spark.functions.analyze import analyze

SENTINEL_CONV = "conv-sentinel"


@pytest.fixture(scope="module")
def turns_pdf():
    from search_engine_spark.sources.corpus import generate_transcripts

    return generate_transcripts(60, seed=7)


def _expected(pdf: pd.DataFrame, min_df: int) -> set:
    rows = {}
    for ts, text in zip(pdf["ts"], pdf["text"]):
        w = pd.Timestamp(ts).floor("h")
        for lem in set(analyze(text)):
            rows[(w, lem)] = rows.get((w, lem), 0) + 1
    return {(w, l, n) for (w, l), n in rows.items() if n >= min_df}


def test_stream_trending_equals_batch_and_pandas(spark, turns_pdf, tmp_path):
    import os

    from search_engine_spark.schemas import TRANSCRIPTS
    from search_engine_spark.streaming.trending import (
        trending_terms_batch,
        trending_terms_stream,
    )
    from tests.test_streaming_sessions import _feed

    os.makedirs(f"{tmp_path}/in", exist_ok=True)
    pdf = turns_pdf.sort_values("ts").reset_index(drop=True)
    mid = len(pdf) // 2
    sentinel = pdf.iloc[:1].copy()
    sentinel["conv_id"] = SENTINEL_CONV
    sentinel["ts"] = pd.Series(
        [pdf["ts"].max() + pd.Timedelta(days=30)], dtype="datetime64[us]"
    ).values
    sentinel["text"] = "sentinelword"
    chunks = [pdf.iloc[:mid], pdf.iloc[mid:], sentinel]

    stream = (
        spark.readStream.schema(TRANSCRIPTS)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{tmp_path}/in")
    )
    got_df = _feed(
        spark, trending_terms_stream(stream, min_df=2), "trend", tmp_path,
        chunks,
    )
    horizon = pd.Timestamp(pdf["ts"].max())  # sentinel window is +30 d
    got = {
        (pd.Timestamp(r["window_start"]), r["lemma"], r["df"])
        for r in got_df.collect()
        if pd.Timestamp(r["window_start"]) <= horizon
    }
    want = _expected(turns_pdf, min_df=2)
    assert got == want and want

    batch = {
        (pd.Timestamp(r["window_start"]), r["lemma"], r["df"])
        for r in trending_terms_batch(
            spark.createDataFrame(turns_pdf, TRANSCRIPTS), min_df=2
        ).collect()
    }
    assert batch == want


def _expected_shifts(pdf: pd.DataFrame, min_df: int, min_ratio: float) -> set:
    rows = {}
    for ts, text in zip(pdf["ts"], pdf["text"]):
        w = pd.Timestamp(ts).floor("h")
        for lem in set(analyze(text)):
            rows[(w, lem)] = rows.get((w, lem), 0) + 1
    out = set()
    for (w, lem), df in rows.items():
        prev = rows.get((w - pd.Timedelta(hours=1), lem), 0)
        ratio = round(df / max(prev, 1), 6)
        if df >= min_df and ratio >= min_ratio:
            out.add((w, lem, df, prev, ratio))
    return out


def test_topic_shifts_stream_equals_batch_and_pandas(
    spark, turns_pdf, tmp_path
):
    """Window-over-window df-ratio shift detection: the single-agg
    tagged-union stream (append mode, compensated watermark) over a
    closed feed == the batch twin == a pure-pandas recount. The feed is
    split MID-WINDOW, so the test fails if the shifted prev rows advance
    the event-time clock and drop the second chunk's cur rows as late."""
    import os

    from search_engine_spark.schemas import TRANSCRIPTS
    from search_engine_spark.streaming.trending import (
        topic_shifts_batch,
        topic_shifts_stream,
    )
    from tests.test_streaming_sessions import _feed

    os.makedirs(f"{tmp_path}/in", exist_ok=True)
    pdf = turns_pdf.sort_values("ts").reset_index(drop=True)
    mid = len(pdf) // 2
    sentinel = pdf.iloc[:1].copy()
    sentinel["conv_id"] = SENTINEL_CONV
    sentinel["ts"] = pd.Series(
        [pdf["ts"].max() + pd.Timedelta(days=30)], dtype="datetime64[us]"
    ).values
    sentinel["text"] = "sentinelword"
    chunks = [pdf.iloc[:mid], pdf.iloc[mid:], sentinel]

    stream = (
        spark.readStream.schema(TRANSCRIPTS)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{tmp_path}/in")
    )
    got_df = _feed(
        spark,
        topic_shifts_stream(stream, min_df=2, min_ratio=1.5),
        "shifts", tmp_path, chunks,
    )
    horizon = pd.Timestamp(pdf["ts"].max())
    got = {
        (
            pd.Timestamp(r["window_start"]), r["lemma"], r["df"],
            r["prev_df"], r["ratio"],
        )
        for r in got_df.collect()
        if pd.Timestamp(r["window_start"]) <= horizon
    }
    want = _expected_shifts(turns_pdf, min_df=2, min_ratio=1.5)
    assert got == want and want
    # an emergent lemma (no previous window) must appear with prev_df=0
    assert any(p == 0 for (_, _, _, p, _) in want)

    batch = {
        (
            pd.Timestamp(r["window_start"]), r["lemma"], r["df"],
            r["prev_df"], r["ratio"],
        )
        for r in topic_shifts_batch(
            spark.createDataFrame(turns_pdf, TRANSCRIPTS),
            min_df=2, min_ratio=1.5,
        ).collect()
    }
    assert batch == want
