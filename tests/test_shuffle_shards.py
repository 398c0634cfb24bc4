"""Deterministic training-export shuffle: md5 shard/sort pins vs a
Python reference, partitioning invariance, epoch salts, and the
materialized shard layout (one repartition + in-partition sort)."""

from __future__ import annotations

import hashlib

from search_engine_spark.operators.curate import (
    shuffle_assign,
    write_training_shards,
)

N = 7


def _ref(key: int, salt: str = "") -> tuple[int, str]:
    h = hashlib.md5(f"{salt}{key}".encode()).hexdigest()
    return int(h[:8], 16) % N, h


def test_assignment_matches_reference_and_partitioning(spark):
    rows = [(i, f"text {i}") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for parts in (1, 13):
        got = {
            r["doc_id"]: (r["shard"], r["sort_key"])
            for r in shuffle_assign(df.repartition(parts), N).collect()
        }
        assert got == {i: _ref(i) for i, _ in rows}
    # every shard populated, no pathological skew on 300 uniform keys
    counts = [0] * N
    for s, _ in got.values():
        counts[s] += 1
    assert min(counts) > 0 and max(counts) < 3 * (300 // N)


def test_salt_changes_permutation(spark):
    df = spark.createDataFrame([(i,) for i in range(64)], "doc_id long")
    a = {r["doc_id"]: r["sort_key"]
         for r in shuffle_assign(df, N, salt="epoch1").collect()}
    b = {r["doc_id"]: r["sort_key"]
         for r in shuffle_assign(df, N, salt="epoch2").collect()}
    assert a == {i: _ref(i, "epoch1")[1] for i in range(64)}
    assert all(a[i] != b[i] for i in range(64))
    order_a = sorted(range(64), key=lambda i: a[i])
    order_b = sorted(range(64), key=lambda i: b[i])
    assert order_a != order_b  # a fresh epoch is a fresh permutation


def test_written_shards_are_sorted_and_complete(spark, tmp_path):
    rows = [(i, f"doc number {i}") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = str(tmp_path / "shards")
    write_training_shards(df, out, N)
    back = spark.read.parquet(out)
    assert back.count() == 200
    got = back.select("shard", "sort_key", "doc_id").collect()
    per = {}
    for r in got:
        per.setdefault(r["shard"], []).append((r["sort_key"], r["doc_id"]))
    assert set(per) == {s for s, _ in (_ref(i) for i, _ in rows)}
    for s, pairs in per.items():
        assert {d for _, d in pairs} == {
            i for i, _ in rows if _ref(i)[0] == s
        }
    # each shard's file order IS the sort_key order (loaders stream it)
    pdf = spark.read.parquet(out).toPandas()
    for s, grp in pdf.groupby("shard"):
        ks = list(grp["sort_key"])
        assert ks == sorted(ks), s
