"""Hashed linear classifier pins: integer-exact fixed-point gradients
(any partitioning), pinned sigmoid round and floor(x+0.5) update —
against a from-scratch Python reference; the probe actually learns its
label token's bucket; featureless docs score 0.5."""

from __future__ import annotations

import hashlib
import math
import re

import pytest

from search_engine_spark.operators.classify import (
    SCALE,
    predict_linear,
    train_linear,
)
from search_engine_spark.operators.text import hashing_vectors

DIM = 16


def _hashed(text: str, dim: int = DIM) -> dict[int, float]:
    s: dict[int, int] = {}
    for t in re.findall(r"[a-z0-9]+", text.lower()):
        h = int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
        b = (h // 2) % dim
        s[b] = s.get(b, 0) + (1 if h % 2 == 0 else -1)
    s = {b: v for b, v in s.items() if v != 0}
    norm = math.sqrt(sum(v * v for v in s.values()))
    return {b: round(v / norm, 6) for b, v in s.items()}


def _ref_train(texts, labels, iters, lr, dim: int = DIM):
    X6 = {
        i: {b: int(round(w * SCALE)) for b, w in _hashed(t, dim).items()}
        for i, t in texts.items()
    }
    w6 = [0] * dim
    n = len(labels)
    for _ in range(iters):
        g = [0] * dim
        for i, y in labels.items():
            m12 = sum(x * w6[b] for b, x in X6[i].items())
            p6 = int(round(1.0 / (1.0 + math.exp(-(m12 / 1e12))) * SCALE))
            for b, x in X6[i].items():
                g[b] += (p6 - y * SCALE) * x
        w6 = [
            w6[b] - math.floor(lr * g[b] / (n * SCALE) + 0.5)
            for b in range(dim)
        ]
    return w6


@pytest.fixture(scope="module")
def corpus():
    pos = [f"tag alpha{i} beta{i % 3} gamma common words here" for i in range(12)]
    neg = [f"alpha{i} beta{i % 3} delta common words other text" for i in range(12)]
    texts = {i: t for i, t in enumerate(pos + neg)}
    labels = {i: (1 if i < len(pos) else 0) for i in texts}
    return texts, labels


def test_train_matches_reference(spark, corpus):
    texts, labels = corpus
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    feats = hashing_vectors(docs, dim=DIM)
    ldf = spark.createDataFrame(
        list(labels.items()), "doc_id long, label int"
    )
    got = train_linear(feats, ldf, DIM, iters=3, lr=1.0)
    ref = _ref_train(texts, labels, 3, 1.0)
    assert got == ref
    # the probe learned the class-separating tokens: the label token's
    # bucket pulls positive, an all-negative-class token's pulls
    # negative (gamma/here are equally predictive of the positive
    # class, so "tag is THE max" would over-pin — top-group suffices)
    def bucket_sign(tok: str) -> tuple[int, int]:
        h = int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)
        return (h // 2) % DIM, (1 if h % 2 == 0 else -1)

    tb, ts = bucket_sign("tag")
    db, ds = bucket_sign("delta")
    assert got[tb] * ts > 0
    assert got[db] * ds < 0


def test_train_high_dim_no_plan_blowup(spark, corpus):
    """dim=4096 trains through the broadcast-weights join — the earlier
    ``element_at(array(<dim literals>))`` form exploded the expression
    tree at production hashing dims. Weights must still match the
    integer-exact reference bit-for-bit."""
    dim = 4096
    texts, labels = corpus
    docs = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    feats = hashing_vectors(docs, dim=dim)
    ldf = spark.createDataFrame(list(labels.items()), "doc_id long, label int")
    got = train_linear(feats, ldf, dim, iters=2, lr=1.0)
    assert got == _ref_train(texts, labels, 2, 1.0, dim=dim)
    assert any(v != 0 for v in got)


def test_predict_separates_classes(spark, corpus):
    texts, labels = corpus
    docs = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    feats = hashing_vectors(docs, dim=DIM)
    ldf = spark.createDataFrame(list(labels.items()), "doc_id long, label int")
    w6 = train_linear(feats, ldf, DIM, iters=3, lr=1.0)
    scores = {
        r["doc_id"]: r["score"]
        for r in predict_linear(feats, ldf, w6).collect()
    }
    pos = [scores[i] for i, y in labels.items() if y == 1]
    neg = [scores[i] for i, y in labels.items() if y == 0]
    assert min(pos) > max(neg)  # clean synthetic separation


def test_featureless_doc_scores_half(spark):
    docs = spark.createDataFrame(
        [(0, "actual words"), (1, "???!!!")], "doc_id long, text string"
    )
    feats = hashing_vectors(docs, dim=DIM)
    ldf = spark.createDataFrame([(0, 1), (1, 0)], "doc_id long, label int")
    w6 = train_linear(feats, ldf, DIM, iters=2, lr=1.0)
    scores = {
        r["doc_id"]: r["score"]
        for r in predict_linear(feats, ldf, w6).collect()
    }
    assert scores[1] == 0.5  # margin-0 pin


def test_duckdb_twin_smoke(spark, corpus):
    """The unrolled-CTE twin trains the same weights on the same corpus
    — driver-independent pin (the contract runs it on documents)."""
    import duckdb

    from search_engine_spark.operators.classify import logreg_oracle_sql

    texts, labels = corpus
    docs = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    feats = hashing_vectors(docs, dim=DIM)
    ldf = spark.createDataFrame(list(labels.items()), "doc_id long, label int")
    w6 = train_linear(feats, ldf, DIM, iters=3, lr=1.0)

    con = duckdb.connect()
    vals = ", ".join(f"({i}, '{t}')" for i, t in texts.items())
    con.sql(f"CREATE VIEW documents AS SELECT * FROM (VALUES {vals}) t(doc_id, text)")
    sql = logreg_oracle_sql(
        DIM, 3, lr=1.0,
        label_sql="CASE WHEN list_contains("
        "regexp_extract_all(lower(text), '[a-z0-9]+'), 'tag') "
        "THEN 1 ELSE 0 END",
    )
    got = {int(b): w for b, w in con.sql(sql).fetchall()}
    assert got == {b: round(w6[b] / SCALE, 6) for b in range(DIM)}
