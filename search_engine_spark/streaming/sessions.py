"""Stateful streaming analytics over the events stream.

Streaming twins of the batch contract queries (contract.py
q_events_sessions / q_events_hourly), expressed the Structured-Streaming
way:

- ``sessionize_stream`` — per-user session windows closed after
  ``gap_sec`` of event-time inactivity, as a CUSTOM STATEFUL OPERATOR via
  ``applyInPandasWithState`` (Arrow-batched; one state row per open
  session; event-time timeout driven by the watermark). This is the
  streaming shape the batch lag()-gap sessionization cannot take: state
  is bounded by |active users|, not |events|, and late events inside the
  watermark still fold into their session.
- ``hourly_counts_stream`` — watermarked tumbling-window counts
  (append mode: a window emits exactly once, when the watermark passes
  its end).

Scale notes: state is hash-partitioned by user_id across executors
(state store per shuffle partition); a 100-TB events stream shards by
the same key with no driver involvement. The pandas function touches
only one user's micro-batch slice at a time.

No reference counterpart (the reference is batch-only); this extends the
engine's event-analytics suite (SURVEY.md §2.9) to streams.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSIONS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
    ]
)

# open-session state: (start_epoch_us, last_epoch_us, n_events)
_STATE_SCHEMA = "start long, last long, n long"


def _emit(user: int, start: int, last: int, n: int) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [user],
            "session_start": [pd.Timestamp(start, unit="us")],
            "session_end": [pd.Timestamp(last, unit="us")],
            "n_events": [n],
        }
    )


def _session_fn(gap_sec: int):
    gap_us = int(gap_sec) * 1_000_000

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        user = int(key[0])
        if state.hasTimedOut:
            # watermark passed last+gap with no new events: close the
            # open session and drop the state row
            start, last, n = state.get
            state.remove()
            yield _emit(user, start, last, n)
            return
        ts: list[int] = []
        for pdf in pdfs:
            ts.extend(int(t.value // 1000) for t in pdf["ts"])
        ts.sort()
        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = ts[0], ts[0] - 1, 0  # sentinel: first event opens
        closed: list[pd.DataFrame] = []
        if n > 0:
            # late (in-watermark) events OLDER than the open session must
            # not fold forward into it (t - last is negative, never > gap
            # — the batch twin would count them as their own earlier
            # session). Sessionize them separately; if the newest of them
            # lands within gap of `start`, the open session extends
            # BACKWARDS (bridge), else the pre-sessions close immediately.
            # Remaining corner vs the batch twin: a closed pre-session
            # cannot absorb a yet-later event (state holds one open
            # session) — reachable only when out-of-order skew exceeds
            # (start - p_last) - gap, inside the watermark's own
            # out-of-order allowance.
            pre = [t for t in ts if t < start]
            ts = [t for t in ts if t >= start]
            if pre:
                p_start = p_last = pre[0]
                p_n = 1
                for t in pre[1:]:
                    if t - p_last > gap_us:
                        closed.append(_emit(user, p_start, p_last, p_n))
                        p_start, p_n = t, 0
                    p_last = t
                    p_n += 1
                if start - p_last <= gap_us:
                    start = p_start  # bridge: rewind the open session
                    n += p_n
                else:
                    closed.append(_emit(user, p_start, p_last, p_n))
        for t in ts:
            if n > 0 and t - last > gap_us:
                closed.append(_emit(user, start, last, n))
                start, n = t, 0
            last = max(last, t)  # interior late events never rewind `last`
            n += 1
        state.update((start, last, n))
        # event-time timeout: fire when the watermark passes last+gap
        state.setTimeoutTimestamp((last + gap_us) // 1000)
        yield from closed

    return fn


def sessionize_stream(
    events: DataFrame,
    gap_sec: int = 1800,
    watermark: str = "1 minute",
) -> DataFrame:
    """Streaming per-user sessionization (append mode): one output row
    per CLOSED session (user_id, session_start, session_end, n_events).
    ``events`` is a streaming DataFrame with (user_id, ts); sessions
    close when a user is silent for ``gap_sec`` of event time — either
    observed in-batch (a gap inside the data) or by watermark timeout.
    Batch twin: contract.q_events_sessions (counts these same sessions)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn(gap_sec),
            outputStructType=SESSIONS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def hourly_counts_stream(
    events: DataFrame, watermark: str = "1 minute"
) -> DataFrame:
    """Watermarked tumbling per-hour event_type counts (append mode);
    batch twin: contract.q_events_hourly."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("hour"), "event_type", "n")
    )
