"""Percolator (operators/percolate.py): compile guards, batch matches vs
a Python reference AND the DuckDB twin, candidate-index correctness
(registration under the smallest required token never loses a match),
and the streaming micro-batch run equals the batch run."""

from __future__ import annotations

import re

import duckdb
import pandas as pd
import pytest

from search_engine_spark.operators.percolate import (
    compile_queries,
    percolate,
    percolate_oracle_sql,
)

QUERIES = [
    (1, "spark window"),
    (2, "merge batch"),
    (3, "customer -slow"),
    (4, "vector group table"),
    (5, "query key -agg"),
    (6, "spark (window | batch)"),      # AND + OR group
    (7, "(merge | vector) -slow"),      # groups-only + exclusion
    (8, "(query | key) (table | group)"),  # two groups, no plain atom
    (9, '"merge batch"'),               # exact phrase (round 4)
    (10, '"merge batch"~2 -slow'),      # sloppy phrase + exclusion
    (11, '"query scan" (table | group)'),  # phrase + OR group
]


def _ref(pdf: pd.DataFrame, queries) -> set:
    from oracle.oracle import phrase_match_doc

    out = set()
    for qid, req, groups, exc, phrases in compile_queries(queries):
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            seq = re.findall(r"[a-z0-9]+", str(text).lower())
            toks = set(seq)
            if not (req <= toks and all(g & toks for g in groups)
                    and not (exc & toks)):
                continue
            if phrases:
                pos = {}
                for i, t in enumerate(seq):
                    pos.setdefault(t, []).append(i)
                if not all(
                    phrase_match_doc([pos.get(t, []) for t in ph], slop)
                    for ph, slop in phrases
                ):
                    continue
            out.add((doc_id, qid))
    return out


@pytest.fixture(scope="module")
def docs_pdf():
    return pd.read_parquet("/root/testdata/sf0.001/documents.parquet")[
        ["doc_id", "text"]
    ]


def test_compile_guards():
    assert compile_queries([(1, "A b -C")]) == [
        (1, frozenset({"a", "b"}), (), frozenset({"c"}), ())
    ]
    assert compile_queries([(2, "a (B | c) -d")]) == [
        (2, frozenset({"a"}), (frozenset({"b", "c"}),), frozenset({"d"}),
         ())
    ]
    # phrases keep order + duplicates and fold into required
    assert compile_queries([(9, '"B a b"~3 -c')]) == [
        (9, frozenset({"a", "b"}), (), frozenset({"c"}),
         ((("b", "a", "b"), 3),))
    ]
    # groups-only queries are legal (the OR bounds the match set)
    assert compile_queries([(3, "(x | y)")])[0][1] == frozenset()
    with pytest.raises(ValueError, match="empty group"):
        compile_queries([(4, "a ( | )")])
    with pytest.raises(ValueError, match="negated groups"):
        compile_queries([(5, "a -(b | c)")])
    with pytest.raises(ValueError, match="no required"):
        compile_queries([(1, "-only -negs")])
    with pytest.raises(ValueError, match="duplicate"):
        compile_queries([(1, "a"), (1, "b")])
    with pytest.raises(ValueError, match="negated phrases"):
        compile_queries([(1, 'a -"b c"')])
    with pytest.raises(ValueError, match="empty phrase"):
        compile_queries([(1, 'a ""')])


def test_batch_matches_reference_and_duckdb(spark, docs_pdf):
    df = spark.createDataFrame(docs_pdf)
    got = {
        (r["doc_id"], r["query_id"])
        for r in percolate(df, QUERIES).collect()
    }
    assert got == _ref(docs_pdf, QUERIES)
    con = duckdb.connect()
    con.register("docs", docs_pdf)
    want = set(
        map(tuple, con.execute(percolate_oracle_sql("docs", QUERIES)).fetchall())
    )
    assert got == want and got, len(got)


def test_exclusion_and_candidate_index(spark):
    # 'slow' docs must NOT match q3 even though 'customer' is present;
    # a query whose registration token is absent can never match
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "customer fast path",
                "customer slow path",
                "spark only window here",
            ],
        }
    )
    got = {
        (r["doc_id"], r["query_id"])
        for r in percolate(spark.createDataFrame(pdf), QUERIES).collect()
    }
    assert got == {(1, 3), (3, 1), (3, 6)}  # q6: spark + (window|batch)


def test_streaming_equals_batch(spark, docs_pdf, tmp_path):
    import os

    from pyspark.sql import types as T

    os.makedirs(f"{tmp_path}/in", exist_ok=True)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{tmp_path}/in")
    )
    q = (
        percolate(stream, QUERIES)
        .writeStream.format("memory")
        .queryName("perc")
        .outputMode("append")
        .option("checkpointLocation", f"{tmp_path}/ckpt")
        .start()
    )
    try:
        mid = len(docs_pdf) // 2
        for i, chunk in enumerate([docs_pdf.iloc[:mid], docs_pdf.iloc[mid:]]):
            chunk.to_parquet(f"{tmp_path}/in/c{i}.parquet", index=False)
            q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["doc_id"], r["query_id"])
        for r in spark.table("perc").collect()
    }
    assert got == _ref(docs_pdf, QUERIES)


def test_phrase_slop_reachability_not_greedy(spark):
    """The pinned [[0],[1,2],[4]] incompleteness case at the percolate
    level: 'a b b x c' matches "a b c"~1 only via the 0→2→4 chain a
    greedy smallest-next matcher misses — engine and DuckDB twin agree."""
    pdf = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["a b b x c", "a b x x c", "a b c"],
    })
    qs = [(1, '"a b c"~1'), (2, '"a b c"')]
    got = {
        (r["doc_id"], r["query_id"])
        for r in percolate(spark.createDataFrame(pdf), qs).collect()
    }
    assert got == {(1, 1), (3, 1), (3, 2)}
    con = duckdb.connect()
    con.register("docs", pdf)
    want = set(
        map(tuple, con.execute(percolate_oracle_sql("docs", qs)).fetchall())
    )
    assert got == want


def test_registry_matches_and_refresh(spark, docs_pdf, tmp_path):
    """AlertRegistry: broadcast-backed percolation equals the closure
    path; a mid-stream refresh() takes effect on the NEXT micro-batch
    (foreachBatch re-resolves the broadcast per batch), and the epoch
    is reported to the sink."""
    import os

    from pyspark.sql import types as T

    from search_engine_spark.operators.percolate import AlertRegistry

    reg = AlertRegistry(spark, QUERIES)
    # batch parity with the closure-constant path
    sdf = spark.createDataFrame(docs_pdf)
    got = {
        (r["doc_id"], r["query_id"]) for r in reg.percolate(sdf).collect()
    }
    assert got == _ref(docs_pdf, QUERIES)
    # bad refresh never swaps the set
    epoch0 = reg.epoch
    with pytest.raises(ValueError, match="required"):
        reg.refresh([(1, "-only -exclusions")])
    assert reg.epoch == epoch0

    # streaming with a refresh between micro-batches
    os.makedirs(f"{tmp_path}/in", exist_ok=True)
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{tmp_path}/in")
    )
    seen: list[tuple[int, set]] = []

    def sink(matches, batch_id, epoch):
        seen.append((
            epoch,
            {(r["doc_id"], r["query_id"]) for r in matches.collect()},
        ))

    q = (
        reg.attach(stream, sink)
        .option("checkpointLocation", f"{tmp_path}/ckpt")
        .start()
    )
    try:
        mid = len(docs_pdf) // 2
        docs_pdf.iloc[:mid].to_parquet(f"{tmp_path}/in/c0.parquet",
                                       index=False)
        q.processAllAvailable()
        NEW = [(100, "stream window"), (101, "merge -slow")]
        reg.refresh(NEW)
        docs_pdf.iloc[mid:].to_parquet(f"{tmp_path}/in/c1.parquet",
                                       index=False)
        q.processAllAvailable()
    finally:
        q.stop()
    assert len(seen) == 2
    (e0, m0), (e1, m1) = seen
    assert e1 == e0 + 1
    assert m0 == _ref(docs_pdf.iloc[:mid], QUERIES)
    assert m1 == _ref(docs_pdf.iloc[mid:], NEW)  # new alerts, old docs gone


def test_alert_rates(spark, docs_pdf):
    """Per-alert rate metrics: batch roll-up equals a pandas count; the
    windowed form buckets by tumbling window."""
    import pandas as pd

    from search_engine_spark.operators.percolate import alert_rates

    sdf = spark.createDataFrame(docs_pdf)
    matches = percolate(sdf, QUERIES)
    got = {
        (r["query_id"], r["n_matches"])
        for r in alert_rates(matches).collect()
    }
    ref = pd.Series(
        [q for _, q in _ref(docs_pdf, QUERIES)]
    ).value_counts().to_dict()
    assert got == {(int(q), int(n)) for q, n in ref.items()}

    # windowed: synthetic timestamps spanning two tumbling windows
    ts_pdf = pd.DataFrame({
        "query_id": [1, 1, 2, 1],
        "ts": pd.to_datetime([
            "2025-01-01 00:00:30", "2025-01-01 00:01:00",
            "2025-01-01 00:00:10", "2025-01-01 00:07:00",
        ]),
    })
    rates = alert_rates(
        spark.createDataFrame(ts_pdf), ts_col="ts", window="5 minutes"
    ).collect()
    by_key = {
        (str(r["window_start"]), r["query_id"]): r["n_matches"]
        for r in rates
    }
    assert by_key == {
        ("2025-01-01 00:00:00", 1): 2,
        ("2025-01-01 00:00:00", 2): 1,
        ("2025-01-01 00:05:00", 1): 1,
    }
