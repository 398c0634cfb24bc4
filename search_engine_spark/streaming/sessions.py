"""Stateful streaming analytics over the events stream.

Streaming twins of the batch contract queries (contract.py
q_events_sessions / q_events_hourly), expressed the Structured-Streaming
way:

- ``sessionize_stream`` — per-user session windows closed after
  ``gap_sec`` of event-time inactivity, as a CUSTOM STATEFUL OPERATOR via
  ``applyInPandasWithState`` (Arrow-batched; event-time timeout driven by
  the watermark). State holds EVERY session the watermark hasn't passed
  (a session is emitted only once no admissible future event can touch
  it), so the output is exactly the batch lag()-gap sessionization of the
  non-dropped events under ARBITRARY in-watermark disorder — split,
  backward-bridge, and extend-after-pre-session all included. State is
  bounded by |active users| × (watermark/gap + 1), not |events|.
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

# held sessions (arrays, ascending by start): a session stays in state
# until the watermark passes last+gap, so ANY in-watermark event — however
# old — can still merge/bridge; emitted sessions are final. State size is
# bounded by the number of gap-separated sessions inside the watermark
# window (~watermark/gap + 1 per user), not by |events|.
_STATE_SCHEMA = "starts array<long>, lasts array<long>, ns array<long>"


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
        if state.exists:
            starts, lasts, ns = (list(x) for x in state.get)
        else:
            starts, lasts, ns = [], [], []

        if not state.hasTimedOut:
            import bisect

            ts: list[int] = []
            for pdf in pdfs:
                ts.extend(int(t.value // 1000) for t in pdf["ts"])
            ts.sort()
            # merge each event into the held (disjoint, start-ascending)
            # session set: join the predecessor if within gap of its end,
            # else the successor if within gap of its start (then the
            # event rewinds that session's start), else open a new
            # session. A predecessor-join can bridge into the successor.
            # Batch-twin exact for ANY in-watermark arrival order: an
            # event and its session meet iff they're within gap, which is
            # exactly the lag()-gap split rule on the sorted stream.
            for t in ts:
                i = bisect.bisect_right(starts, t)  # starts[i-1] <= t
                if i > 0 and t <= lasts[i - 1] + gap_us:
                    lasts[i - 1] = max(lasts[i - 1], t)
                    ns[i - 1] += 1
                    if (
                        i < len(starts)
                        and starts[i] - lasts[i - 1] <= gap_us
                    ):  # bridge: the grown session reaches the next one
                        lasts[i - 1] = lasts.pop(i)
                        ns[i - 1] += ns.pop(i)
                        starts.pop(i)
                elif i < len(starts) and starts[i] - t <= gap_us:
                    starts[i] = t  # rewind (no bridge: pred check failed)
                    ns[i] += 1
                else:
                    starts.insert(i, t)
                    lasts.insert(i, t)
                    ns.insert(i, 1)

        # close every session the watermark has passed: any future
        # admissible event has ts >= watermark, and can merge with a held
        # session iff ts <= last+gap — so last+gap < watermark makes the
        # session immutable. This one rule serves both the data path and
        # the timeout path; emitted sessions are FINAL (append mode).
        wm_us = state.getCurrentWatermarkMs() * 1000
        closed: list[pd.DataFrame] = []
        while starts and lasts[0] + gap_us < wm_us:
            closed.append(_emit(user, starts.pop(0), lasts.pop(0), ns.pop(0)))
        if starts:
            state.update((starts, lasts, ns))
            # re-arm: fire when the watermark passes the oldest open end
            # (must be strictly ahead of the current watermark)
            state.setTimeoutTimestamp(
                max((lasts[0] + gap_us) // 1000, state.getCurrentWatermarkMs() + 1)
            )
        elif state.exists:
            state.remove()
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
