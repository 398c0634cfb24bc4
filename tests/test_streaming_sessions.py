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


def test_stream_sessions_late_event_split_and_bridge(spark, tmp_path):
    """A late in-watermark event OLDER than the open session must NOT
    fold forward into it: beyond-gap → its own earlier session (split);
    within-gap → the open session rewinds its start (bridge). Batch-twin
    semantics either way (the old kernel folded both into the open
    session because t - last is negative)."""
    import os

    from search_engine_spark.schemas import EVENTS as EVENTS_SCHEMA
    from search_engine_spark.streaming.sessions import sessionize_stream

    base = pd.Timestamp("2026-01-01")

    def ev(eid, uid, sec):
        return {
            "event_id": eid, "ts": base + pd.Timedelta(seconds=sec),
            "user_id": uid, "event_type": "click", "value": 0.0,
            "props": "{}",
        }

    # batch 1 opens sessions at t=1000s; batch 2 delivers older events:
    # user 1 at t=100s (gap 300 exceeded → split), user 2 at t=900s
    # (within gap → bridge); sentinel advances the watermark to close all
    b1 = pd.DataFrame([ev(1, 1, 1000), ev(2, 2, 1000)])
    b2 = pd.DataFrame([ev(3, 1, 100), ev(4, 2, 900)])
    sentinel = pd.DataFrame([ev(5, SENTINEL_USER, 10**7)])
    for df in (b1, b2, sentinel):
        df["ts"] = df["ts"].astype("datetime64[us]")

    os.makedirs(f"{tmp_path}/in", exist_ok=True)
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{tmp_path}/in")
    )
    got_df = _feed(
        spark,
        sessionize_stream(stream, gap_sec=300, watermark="1 hour"),
        "late", tmp_path, [b1, b2, sentinel],
    )
    got = {
        (r["user_id"], pd.Timestamp(r["session_start"]),
         pd.Timestamp(r["session_end"]), r["n_events"])
        for r in got_df.collect()
        if r["user_id"] != SENTINEL_USER
    }
    s = lambda sec: base + pd.Timedelta(seconds=sec)  # noqa: E731
    assert got == {
        (1, s(100), s(100), 1),     # split: the late event alone
        (1, s(1000), s(1000), 1),
        (2, s(900), s(1000), 2),    # bridge: start rewound to 900
    }
    # and equals the batch twin over the same feed
    assert got == _expected_sessions(pd.concat([b1, b2]), 300)


def test_stream_sessions_arbitrary_disorder(spark, tmp_path):
    """Exactness under ANY in-watermark disorder: a pre-session must stay
    OPEN (held in state) until the watermark passes it, so a yet-later
    event can still extend it (the one corner the single-open-session
    kernel got wrong), two pre-sessions can arrive interleaved, and an
    event can bridge two held sessions into one. Pin: streaming output ==
    batch lag()-gap sessionization of the full feed."""
    import os

    from search_engine_spark.schemas import EVENTS as EVENTS_SCHEMA
    from search_engine_spark.streaming.sessions import sessionize_stream

    base = pd.Timestamp("2026-01-01")

    def ev(eid, uid, sec):
        return {
            "event_id": eid, "ts": base + pd.Timedelta(seconds=sec),
            "user_id": uid, "event_type": "click", "value": 0.0,
            "props": "{}",
        }

    # user 1: open at 1000 → pre-session at 100 → 250 extends the
    #   pre-session AFTER it arrived (old kernel had already emitted it)
    # user 2: 2000 → 100 → 900 → 1500: the 1500 event bridges the held
    #   (100..900) session (if 900+gap>=1500... gap=700 → 900+700=1600>=1500)
    #   into the 2000 session? 2000-1500=500<=700 → ALL ONE session 100..2000
    #   (batch gaps: 800>700? 900-100=800 > 700 → split! sorted [100,900,
    #   1500,2000]: gaps 800,600,500 → sessions {100}, {900,1500,2000})
    chunks = [
        pd.DataFrame([ev(1, 1, 1000), ev(2, 2, 2000)]),
        pd.DataFrame([ev(3, 1, 100), ev(4, 2, 100)]),
        pd.DataFrame([ev(5, 1, 250), ev(6, 2, 900)]),
        pd.DataFrame([ev(7, 2, 1500)]),
        pd.DataFrame([ev(8, SENTINEL_USER, 10**7)]),
    ]
    for df in chunks:
        df["ts"] = df["ts"].astype("datetime64[us]")

    os.makedirs(f"{tmp_path}/in", exist_ok=True)
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{tmp_path}/in")
    )
    got_df = _feed(
        spark,
        sessionize_stream(stream, gap_sec=700, watermark="2 hours"),
        "disorder", tmp_path, chunks,
    )
    got = {
        (r["user_id"], pd.Timestamp(r["session_start"]),
         pd.Timestamp(r["session_end"]), r["n_events"])
        for r in got_df.collect()
        if r["user_id"] != SENTINEL_USER
    }
    all_events = pd.concat(chunks[:-1])
    assert got == _expected_sessions(all_events, 700)
    s = lambda sec: base + pd.Timedelta(seconds=sec)  # noqa: E731
    assert (1, s(100), s(250), 2) in got     # pre-session grew after emit-point
    assert (2, s(900), s(2000), 3) in got    # late 1500 bridged two held sessions


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
