"""Feature-hashing vectorizer pins: md5 60-bit hash / sign / bucket,
signed integer bucket sums with cancellation, integer norm-square, unit
L2 norm — against a from-scratch Python reference."""

from __future__ import annotations

import hashlib
import math

from search_engine_spark.operators.text import hashing_vectors

DIM = 16


def _h(term: str) -> int:
    return int(hashlib.md5(term.encode()).hexdigest()[:15], 16)


def _ref(texts: dict[int, str]) -> dict[tuple[int, int], float]:
    import re

    out = {}
    for did, text in texts.items():
        s: dict[int, int] = {}
        for t in re.findall(r"[a-z0-9]+", text.lower()):
            h = _h(t)
            b = (h // 2) % DIM
            s[b] = s.get(b, 0) + (1 if h % 2 == 0 else -1)
        s = {b: v for b, v in s.items() if v != 0}
        norm = math.sqrt(sum(v * v for v in s.values()))
        for b, v in s.items():
            out[(did, b)] = round(v / norm, 6)
    return out


def test_matches_reference_and_unit_norm(spark):
    texts = {
        0: "the quick brown fox jumps over the lazy dog",
        1: "pack my box with five dozen liquor jugs",
        2: "the the the the",                      # single-bucket doc
        3: "Spark SQL 123 spark sql 123",
    }
    df = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    rows = hashing_vectors(df, dim=DIM).collect()
    got = {(r["doc_id"], r["bucket"]): r["weight"] for r in rows}
    assert got == _ref(texts)
    for did in texts:
        ss = sum(w * w for (d, _), w in got.items() if d == did)
        assert abs(ss - 1.0) < 1e-4  # unit L2 norm (6dp rounding slack)


def test_sign_cancellation_drops_zero_buckets(spark):
    # find two tokens that share a bucket with opposite signs
    import itertools

    cand = None
    for a, b in itertools.combinations(
        [f"w{i}" for i in range(200)], 2
    ):
        ha, hb = _h(a), _h(b)
        if (ha // 2) % DIM == (hb // 2) % DIM and ha % 2 != hb % 2:
            cand = (a, b)
            break
    assert cand, "no colliding opposite-sign token pair in probe set"
    df = spark.createDataFrame(
        [(0, f"{cand[0]} {cand[1]} anchor")], "doc_id long, text string"
    )
    rows = hashing_vectors(df, dim=DIM).collect()
    bucket = (_h(cand[0]) // 2) % DIM
    anchor_bucket = (_h("anchor") // 2) % DIM
    got_buckets = {r["bucket"] for r in rows}
    assert bucket not in got_buckets or bucket == anchor_bucket
    assert anchor_bucket in got_buckets
