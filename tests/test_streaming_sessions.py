"""Streaming sessionization (applyInPandasWithState) and watermarked
tumbling counts equal their batch twins once the watermark closes all
real windows (a far-future sentinel event advances it)."""

from __future__ import annotations

import pandas as pd
import pytest

EVENTS = "/root/testdata/sf0.001/events.parquet"
GAP = 1800
SENTINEL_USER = 999_999


def _expected_sessions(pdf: pd.DataFrame, gap_sec: int) -> set:
    out = []
    for uid, g in pdf.sort_values("ts").groupby("user_id"):
        start = last = None
        n = 0
        for t in g["ts"]:
            if last is not None and (t - last).total_seconds() > gap_sec:
                out.append((uid, start, last, n))
                start, n = t, 0
            if start is None:
                start = t
            last = t
            n += 1
        if n:
            out.append((uid, start, last, n))
    return set(out)


@pytest.fixture(scope="module")
def events_pdf():
    return pd.read_parquet(EVENTS)


def _feed(spark, stream_df, name, base, chunks, outputMode="append"):
    """Start a memory-sink stream over ``base/in`` and feed parquet chunks
    one processAllAvailable at a time (deterministic micro-batch order —
    a single batch would late-drop the older chunk past the watermark)."""
    import os

    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(outputMode)
        .option("checkpointLocation", f"{base}/ckpt_{name}")
        .start()
    )
    try:
        for i, chunk in enumerate(chunks):
            chunk.to_parquet(os.path.join(f"{base}/in", f"c{i}.parquet"),
                             index=False)
            q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


def _chunks(events_pdf):
    """Two time-ordered halves + a far-future sentinel (advances the
    watermark far enough to time out every real session/window)."""
    ev = events_pdf.sort_values("ts").reset_index(drop=True)
    mid = len(ev) // 2
    sentinel = pd.DataFrame(
        {
            "event_id": [10**9],
            # µs precision: Spark cannot read parquet TIMESTAMP(NANOS)
            "ts": pd.Series(
                [ev["ts"].max() + pd.Timedelta(days=30)],
                dtype="datetime64[us]",
            ),
            "user_id": [SENTINEL_USER],
            "event_type": ["sentinel"],
            "value": [0.0],
            "props": ["{}"],
        }
    )
    return [ev.iloc[:mid], ev.iloc[mid:], sentinel]


def test_stream_sessions_match_batch(spark, events_pdf, tmp_path):
    import os

    from search_engine_spark.schemas import EVENTS as EVENTS_SCHEMA
    from search_engine_spark.streaming.sessions import sessionize_stream

    os.makedirs(f"{tmp_path}/in", exist_ok=True)
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{tmp_path}/in")
    )
    got_df = _feed(
        spark, sessionize_stream(stream, gap_sec=GAP), "sess", tmp_path,
        _chunks(events_pdf),
    )
    got = {
        (r["user_id"], pd.Timestamp(r["session_start"]),
         pd.Timestamp(r["session_end"]), r["n_events"])
        for r in got_df.collect()
        if r["user_id"] != SENTINEL_USER
    }
    assert got == _expected_sessions(events_pdf, GAP)
    # and the session COUNT per user equals the batch contract query
    from search_engine_spark.contract import q_events_sessions

    batch = {
        r["user_id"]: r["n_sessions"]
        for r in q_events_sessions(spark, "/root/testdata/sf0.001").collect()
    }
    stream_counts: dict[int, int] = {}
    for uid, *_ in got:
        stream_counts[uid] = stream_counts.get(uid, 0) + 1
    assert stream_counts == batch


def test_stream_hourly_counts_match_batch(spark, events_pdf, tmp_path):
    import os

    from search_engine_spark.schemas import EVENTS as EVENTS_SCHEMA
    from search_engine_spark.streaming.sessions import hourly_counts_stream

    os.makedirs(f"{tmp_path}/in", exist_ok=True)
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{tmp_path}/in")
    )
    got_df = _feed(
        spark, hourly_counts_stream(stream), "hrs", tmp_path,
        _chunks(events_pdf),
    )
    got = {
        (pd.Timestamp(r["hour"]), r["event_type"], r["n"])
        for r in got_df.collect()
        if r["event_type"] != "sentinel"
    }
    exp_pdf = events_pdf.copy()
    exp_pdf["hour"] = exp_pdf["ts"].dt.floor("h")
    exp = {
        (h, et, n)
        for (h, et), n in exp_pdf.groupby(["hour", "event_type"])
        .size()
        .items()
    }
    assert got == exp
