"""Streaming exact dedup (applyInPandasWithState) equals the batch
first-occurrence rule — row_number() over (key ORDER BY ts, id) — under
in-watermark disorder, including a duplicate of an OLD original arriving
long after the original's decision was emitted (champion persistence)."""

from __future__ import annotations

import os

import pandas as pd
import pytest

SENTINEL_ID = 10**9


def _expected(pdf: pd.DataFrame) -> set:
    out = set()
    for _, g in pdf.sort_values(["ts", "doc_id"]).groupby("text"):
        first = None
        for r in g.itertuples(index=False):
            if first is None:
                first = r.doc_id
                out.add((r.doc_id, pd.Timestamp(r.ts), False, r.doc_id))
            else:
                out.add((r.doc_id, pd.Timestamp(r.ts), True, first))
    return out


def _feed(spark, stream_df, name, base, chunks):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", f"{base}/ckpt_{name}")
        .start()
    )
    try:
        for i, chunk in enumerate(chunks):
            chunk.to_parquet(
                os.path.join(f"{base}/in", f"c{i}.parquet"), index=False
            )
            q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


def test_stream_dedup_matches_batch_rule(spark, tmp_path):
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    from search_engine_spark.streaming.dedup import dedup_exact_stream

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("text", StringType()),
        ]
    )
    base = pd.Timestamp("2026-01-01")

    def row(doc_id, sec, text):
        return {
            "doc_id": doc_id,
            "ts": base + pd.Timedelta(seconds=sec),
            "text": text,
        }

    # text A: original id=3 at t=100 arrives AFTER id=1 at t=1000 (the
    #   in-watermark disorder case — id=1 must still be the dup);
    # text B: two same-ts rows — tiebreak by id (id=4 original, id=5 dup);
    # text C: original at t=50; a dup arrives at t=9000, LONG after C's
    #   decision emitted (champion must persist past its release);
    # text D: unique — never a dup.
    chunks = [
        pd.DataFrame([row(1, 1000, "A"), row(4, 500, "B")]),
        pd.DataFrame([row(3, 100, "A"), row(5, 500, "B"), row(2, 50, "C")]),
        pd.DataFrame([row(6, 4000, "D")]),  # advances wm past A/B/C
        pd.DataFrame([row(7, 9000, "C")]),  # dup of the old original
        pd.DataFrame([row(SENTINEL_ID, 10**7, "Z")]),  # closes everything
    ]
    for df in chunks:
        df["ts"] = df["ts"].astype("datetime64[us]")

    os.makedirs(f"{tmp_path}/in", exist_ok=True)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{tmp_path}/in")
    )
    got_df = _feed(
        spark,
        dedup_exact_stream(stream, key_col="text", watermark="1 hour"),
        "dedup", tmp_path, chunks,
    )
    got = {
        (r["doc_id"], pd.Timestamp(r["ts"]), r["is_dup"], r["first_id"])
        for r in got_df.collect()
        if r["doc_id"] != SENTINEL_ID
    }
    assert got == _expected(pd.concat(chunks[:-1]))
    s = lambda sec: base + pd.Timedelta(seconds=sec)  # noqa: E731
    assert (1, s(1000), True, 3) in got   # disorder: later-arriving original
    assert (5, s(500), True, 4) in got    # same-ts tiebreak by id
    assert (7, s(9000), True, 2) in got   # dup of long-released original


def test_stream_lsh_candidates_match_batch_rule(spark, tmp_path):
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    from search_engine_spark.contract import HASH_MOD, MH_A, MH_B, N_BANDS
    from search_engine_spark.streaming.dedup import (
        band_signatures,
        lsh_candidates_stream,
    )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("text", StringType()),
        ]
    )
    base = pd.Timestamp("2026-01-01")

    def row(doc_id, sec, text):
        return {
            "doc_id": doc_id,
            "ts": base + pd.Timedelta(seconds=sec),
            "text": text,
        }

    t_dup = "alpha beta gamma delta epsilon zeta"
    t_near = "alpha beta gamma delta epsilon ZUMBA"  # shares a prefix of shingles
    chunks = [
        pd.DataFrame([row(1, 1000, t_dup), row(2, 2000, t_dup)]),
        # the ORIGINAL of the duplicate cluster arrives LAST (disorder)
        pd.DataFrame([row(3, 500, t_dup), row(4, 2500, t_near)]),
        pd.DataFrame([row(6, 20000, "omega psi chi phi upsilon")]),
        pd.DataFrame([row(SENTINEL_ID, 10**7, "one two three")]),
    ]
    for df in chunks:
        df["ts"] = df["ts"].astype("datetime64[us]")

    os.makedirs(f"{tmp_path}/in", exist_ok=True)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{tmp_path}/in")
    )
    got_df = _feed(
        spark,
        lsh_candidates_stream(
            stream, MH_A, MH_B, HASH_MOD, N_BANDS, watermark="1 hour"
        ),
        "lshcand", tmp_path, chunks,
    )
    got = {
        (r["band"], r["doc_id"], pd.Timestamp(r["ts"]), r["hit"],
         r["first_id"])
        for r in got_df.collect()
        if r["doc_id"] != SENTINEL_ID
    }

    # batch twin: identical band_signatures plan on the full feed, then
    # the first-arrival rule per (band, sig) bucket
    batch = band_signatures(
        spark.createDataFrame(pd.concat(chunks[:-1]), schema),
        MH_A, MH_B, HASH_MOD, N_BANDS,
    ).toPandas()
    want = set()
    for (band, _sig), g in batch.groupby(["band", "sig"]):
        g = g.sort_values(["ts", "doc_id"])
        first = int(g.iloc[0]["doc_id"])
        for r in g.itertuples(index=False):
            hit = int(r.doc_id) != first
            want.add(
                (band, int(r.doc_id), pd.Timestamp(r.ts), hit,
                 first if hit else int(r.doc_id))
            )
    assert got == want
    # the duplicate cluster: every band of docs 1 and 2 hits, original 3
    for b in range(N_BANDS):
        assert (b, 1, base + pd.Timedelta(seconds=1000), True, 3) in got
        assert (b, 2, base + pd.Timedelta(seconds=2000), True, 3) in got
        assert (b, 3, base + pd.Timedelta(seconds=500), False, 3) in got
    # doc-level candidate set (any-band hit): exactly the dup cluster tail
    cands = {d for b, d, t, h, f in got if h}
    assert {1, 2} <= cands and 6 not in cands and 3 not in cands
