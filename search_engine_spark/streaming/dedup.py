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

``lsh_candidates_stream`` extends the same discipline to NEAR-dup
detection: per-doc MinHash band signatures compute in narrow per-row SQL
(``band_signatures`` — shared verbatim with the batch twin), and the same
first-occurrence kernel runs per (band, bucket-signature) group, flagging
every doc whose bucket was already claimed by an earlier arrival.

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
    IntegerType,
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


def _decision_fn(band_from_key: bool = False, flag_col: str = "is_dup"):
    """First-occurrence decision kernel, shared by exact dedup (key =
    content hash) and LSH candidates (key = (band, bucket sig), echoed
    into the output): hold rows until the watermark passes their ts,
    fold released rows into a persistent champion min(ts, id), flag
    every non-champion release."""

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

            out = {
                "doc_id": np.asarray(rel_ids, dtype="int64"),
                "ts": pd.to_datetime(
                    np.asarray(rel_ts, dtype="int64"), unit="us"
                ),
                flag_col: np.asarray(rel_dup, dtype=bool),
                "first_id": np.asarray(rel_first, dtype="int64"),
            }
            if band_from_key:
                out["band"] = np.full(len(rel_ids), int(key[0]), dtype="int32")
            yield pd.DataFrame(out)

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
        _decision_fn(),
        DEDUP_SCHEMA,
        _STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )


# -- streaming MinHash-LSH near-dup candidate flags ---------------------------

LSH_CANDIDATES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("hit", BooleanType()),
        StructField("first_id", LongType()),
        StructField("band", IntegerType()),
    ]
)

# the batch twins' tokenizer / 3-shingle forms (contract.py TOKS_SQL /
# _SHINGLES_SPARK) — parameters so callers can re-pin, defaults identical
TOKENS_SQL = "regexp_extract_all(lower({col}), '[a-z0-9]+', 0)"
SHINGLES_SQL = (
    "transform(sequence(0, size(_t) - 3), i -> "
    "concat(_t[i], ' ', _t[i+1], ' ', _t[i+2]))"
)
# md5-based 60-bit shingle hash — operators/dedup.py TOKHASH_SQL
_TOKHASH = (
    "cast(conv(substring(md5(cast({col} as binary)), 1, 15), 16, 10) as bigint)"
)


def band_signatures(
    df: DataFrame,
    seeds_a: list[int],
    seeds_b: list[int],
    mod: int,
    n_bands: int,
    key_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str = "ts",
    tokens_sql: str = TOKENS_SQL,
) -> DataFrame:
    """(band, sig, doc_id, ts): per-doc MinHash band signatures computed
    entirely in narrow per-row SQL — tokens → 3-token shingles → md5-60bit
    hashes → per-seed ``array_min`` of ``(a·x + b) % mod`` → band concat.
    No explode-by-seed, no aggregation; works on batch AND streaming
    DataFrames (the streaming operator and its batch twin share this
    exact plan, so the signatures cannot drift apart). Docs with < 3
    tokens have no shingles and drop (the batch _shingles rule)."""
    rows_per_band = len(seeds_a) // n_bands
    x_expr = f"transform(_shs, s -> {_TOKHASH.format(col='s')} % {mod})"
    mh_cols = [
        F.expr(
            f"array_min(transform(_xs, x -> ({a}L * x + {b}L) % {mod}L))"
        ).alias(f"mh{i}")
        for i, (a, b) in enumerate(zip(seeds_a, seeds_b))
    ]
    sigs = (
        df.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.col(ts_col).alias("ts"),
            F.expr(tokens_sql.format(col=key_col)).alias("_t"),
        )
        .filter(F.size("_t") >= 3)
        .select("doc_id", "ts", F.expr(SHINGLES_SQL).alias("_shs"))
        .withColumn("_xs", F.expr(x_expr))
        .select("doc_id", "ts", *mh_cols)
    )
    return sigs.select(
        "doc_id",
        "ts",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(band).alias("band"),
                        F.concat_ws(
                            ",",
                            *[
                                F.col(f"mh{band * rows_per_band + r}").cast(
                                    "string"
                                )
                                for r in range(rows_per_band)
                            ],
                        ).alias("sig"),
                    )
                    for band in range(n_bands)
                ]
            )
        ).alias("bs"),
    ).select(
        F.col("bs.band").alias("band"),
        F.col("bs.sig").alias("sig"),
        "doc_id",
        "ts",
    )


def lsh_candidates_stream(
    stream: DataFrame,
    seeds_a: list[int],
    seeds_b: list[int],
    mod: int,
    n_bands: int,
    key_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str = "ts",
    watermark: str = "1 hour",
    tokens_sql: str = TOKENS_SQL,
) -> DataFrame:
    """Streaming MinHash-LSH near-dup candidate flags: one output row per
    (non-late doc with ≥3 tokens) × band, ``hit`` true iff an earlier
    ``(ts, id)`` doc shared that band's full minhash signature,
    ``first_id`` the bucket's first arrival. A doc is a near-dup
    CANDIDATE iff any of its ``n_bands`` rows hits (combine downstream —
    the exact-Jaccard verify of the batch pipeline stays an offline join,
    operators/dedup.py jaccard_pairs). Batch-twin rule per (band, sig)
    bucket: the minimal ``(ts, id)`` member is the original, everything
    later flags — exact under any in-watermark disorder (the
    ``dedup_exact_stream`` discipline, one state cell per OCCUPIED
    bucket).

    The whole signature computes in narrow per-row SQL (tokens → 3-token
    shingles → md5-60bit hashes → per-seed ``array_min`` of
    ``(a·x + b) % mod``) — no explode-by-seed, no pre-aggregation, so the
    ONLY stateful stage is the bucket kernel and the only shuffle is its
    (band, sig) partitioning. Pins (seeds, mod, hash, shingles) are the
    batch contract's — a streaming hit set matches what
    ``lsh_candidate_pairs`` finds offline on the same rows."""
    band_rows = band_signatures(
        stream.withWatermark(ts_col, watermark),
        seeds_a, seeds_b, mod, n_bands,
        key_col=key_col, id_col=id_col, ts_col=ts_col,
        tokens_sql=tokens_sql,
    )
    return band_rows.groupBy("band", "sig").applyInPandasWithState(
        _decision_fn(band_from_key=True, flag_col="hit"),
        LSH_CANDIDATES_SCHEMA,
        _STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )
