"""Streaming exact deduplication over a document/turn stream.

``dedup_exact_stream`` — per-content-hash first-occurrence dedup as a
CUSTOM STATEFUL OPERATOR (``applyInPandasWithState``): every row gets a
FINAL decision ``(is_dup, first_id)`` where the original of a content key
is its minimal ``(ts, id)`` arrival, exactly the batch rule
``row_number() OVER (PARTITION BY key ORDER BY ts, id) > 1`` on the
non-late rows — under ARBITRARY in-watermark disorder. A continuously
ingested training corpus dedups online with the same semantics the batch
dedup_exact contract query pins offline.

How exactness works (the hold-until-watermark discipline of
streaming/sessions.py): a row's decision depends only on rows that sort
BEFORE it in ``(ts, id)``; any not-yet-arrived row has ``ts >= watermark``,
so once the watermark passes a pending row's ts, every possible
predecessor has arrived and the decision is safe to emit (append mode —
decisions are final). Released rows fold into a per-key champion
``min(ts, id)`` that persists so later duplicates of an old original are
still caught; pending rows are held in state arrays until their release.

State size: the champion is 2 longs per DISTINCT key (the irreducible
memory of exact global dedup — the same as batch ``dropDuplicates``
state); pending rows are bounded by the in-watermark arrivals of the key.
Keys hash-partition across executors (state store per shuffle partition),
so a 100-TB stream shards with no driver involvement.

No reference counterpart (the reference is batch-only); this extends the
training-data-pipeline dedup suite (operators/dedup.py) to streams.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

DEDUP_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("is_dup", BooleanType()),
        StructField("first_id", LongType()),
    ]
)

# champion = min (ts, id) over all RELEASED rows of this key (champ_id < 0
# = none yet); pending rows wait until the watermark passes their ts.
# Releases are globally (ts, id)-monotone per key: a row released later
# was admissible only with ts >= the watermark that released earlier rows,
# so folding the champion forward preserves the batch ordering exactly.
_STATE_SCHEMA = (
    "champ_ts long, champ_id long, pts array<long>, pids array<long>"
)


def _dedup_fn():
    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            champ_ts, champ_id, pts, pids = state.get
            pend = sorted(zip(list(pts), list(pids)))
        else:
            champ_ts, champ_id, pend = 0, -1, []
        if not state.hasTimedOut:
            for pdf in pdfs:
                pend.extend(
                    zip(
                        (int(t.value // 1000) for t in pdf["ts"]),
                        (int(i) for i in pdf["doc_id"]),
                    )
                )
            pend.sort()
        # release every pending row the watermark has passed: all its
        # possible (ts, id)-predecessors have arrived, so its decision
        # is final (append mode)
        wm_us = state.getCurrentWatermarkMs() * 1000
        rel_ids, rel_ts, rel_dup, rel_first = [], [], [], []
        n_rel = 0
        for t, i in pend:
            if t >= wm_us:
                break
            n_rel += 1
            if champ_id >= 0 and (champ_ts, champ_id) < (t, i):
                rel_dup.append(True)
                rel_first.append(champ_id)
            else:
                rel_dup.append(False)
                rel_first.append(i)
            rel_ids.append(i)
            rel_ts.append(t)
            if champ_id < 0 or (t, i) < (champ_ts, champ_id):
                champ_ts, champ_id = t, i
        pend = pend[n_rel:]
        if pend or champ_id >= 0:
            state.update(
                (
                    champ_ts,
                    champ_id,
                    [t for t, _ in pend],
                    [i for _, i in pend],
                )
            )
            if pend:
                # fire when the watermark passes the oldest pending ts
                # (must be strictly ahead of the current watermark)
                state.setTimeoutTimestamp(
                    max(pend[0][0] // 1000, state.getCurrentWatermarkMs() + 1)
                )
        elif state.exists:
            state.remove()
        if rel_ids:
            import numpy as np

            yield pd.DataFrame(
                {
                    "doc_id": np.asarray(rel_ids, dtype="int64"),
                    "ts": pd.to_datetime(
                        np.asarray(rel_ts, dtype="int64"), unit="us"
                    ),
                    "is_dup": np.asarray(rel_dup, dtype=bool),
                    "first_id": np.asarray(rel_first, dtype="int64"),
                }
            )

    return fn


def dedup_exact_stream(
    stream: DataFrame,
    key_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming first-occurrence dedup decisions: one output row per
    non-late input row, ``is_dup`` true iff an earlier ``(ts, id)`` row
    carried the same ``key_col`` content, ``first_id`` the original's id
    (itself when it IS the original). Exactly the batch
    ``row_number() OVER (PARTITION BY sha2(key) ORDER BY ts, id) > 1``
    rule under any in-watermark arrival order; decisions are final
    (append mode), emitted once the watermark passes the row's ts."""
    src = stream.withWatermark(ts_col, watermark).select(
        F.sha2(F.col(key_col).cast("string"), 256).alias("_key"),
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(ts_col).alias("ts"),
    )
    return src.groupBy("_key").applyInPandasWithState(
        _dedup_fn(),
        DEDUP_SCHEMA,
        _STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )
