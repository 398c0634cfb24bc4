"""Curation operators (operators/curate.py): connected components, sequence
packing, stratified sampling, quality funnel — each against an in-test
Python reference on synthetic inputs (the contract twins cover the DuckDB
side at sf0.01)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F


def _union_find_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Reference: min-id component label per node incident to an edge."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@pytest.mark.parametrize(
    "edges",
    [
        # two triangles joined by a bridge + a separate pair + a long path
        [(1, 2), (2, 3), (3, 1), (3, 7), (7, 8), (8, 9), (9, 7),
         (20, 21), (30, 31), (31, 32), (32, 33), (33, 34)],
        # star + chain with shuffled, duplicated, reversed edges
        [(5, 1), (1, 9), (9, 5), (100, 50), (50, 100), (50, 25),
         (200, 201)],
        # single edge
        [(2, 1)],
    ],
)
def test_connected_components_matches_union_find(spark, edges):
    from search_engine_spark.operators.curate import connected_components

    df = spark.createDataFrame(edges, "a_id long, b_id long")
    got = {
        (r["node"], r["component"])
        for r in connected_components(df).collect()
    }
    exp = set(_union_find_components(edges).items())
    assert got == exp


def test_connected_components_empty(spark):
    from search_engine_spark.operators.curate import connected_components

    df = spark.createDataFrame([], "a_id long, b_id long")
    assert connected_components(df).collect() == []


def test_dedup_clusters_sizes(spark):
    from search_engine_spark.operators.curate import dedup_clusters

    edges = [(1, 2), (2, 3), (10, 11)]
    df = spark.createDataFrame(edges, "a_id long, b_id long")
    rows = {
        r["doc_id"]: (r["component"], r["cluster_size"])
        for r in dedup_clusters(df).collect()
    }
    assert rows == {
        1: (1, 3), 2: (1, 3), 3: (1, 3),
        10: (10, 2), 11: (10, 2),
    }


def test_pack_sequences_matches_python_cumsum(spark):
    from search_engine_spark.operators.curate import pack_sequences

    toks = [7, 100, 250, 3, 9, 512, 1, 1, 300, 40]
    rows = [(i * 37 + 2, t) for i, t in enumerate(toks)]  # sparse ids
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = {
        r["doc_id"]: r["bin"]
        for r in pack_sequences(df, budget=256).collect()
    }
    off = 0
    exp = {}
    for doc_id, t in sorted(rows):
        exp[doc_id] = off // 256
        off += t
    assert got == exp


def test_pack_sequences_no_unpartitioned_window(spark):
    from search_engine_spark.operators.curate import pack_sequences

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"), F.lit(10).alias("n_tokens")
    )
    plan = pack_sequences(df, budget=64)._jdf.queryExecution().executedPlan().toString()
    # the bucketed cumsum must never fall back to a global (single
    # partition) window
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition" in line:
            assert "_bkt" in line, line


def test_stratified_sample_deterministic_and_exact(spark):
    from search_engine_spark.operators.curate import (
        _hex_threshold,
        stratified_sample,
    )

    rows = [(i, ["en", "ru", "zh"][i % 3]) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    fracs = {"en": 0.5, "zh": 0.25}
    got = sorted(
        r["doc_id"]
        for r in stratified_sample(df, fracs, 0.1).collect()
    )

    def keep(doc_id: int, lang: str) -> bool:
        h = hashlib.md5(str(doc_id).encode()).hexdigest()[:8]
        return h < _hex_threshold(fracs.get(lang, 0.1))

    exp = sorted(i for i, lang in rows if keep(i, lang))
    assert got == exp
    # re-run after repartition: identical sample (partitioning-independent)
    got2 = sorted(
        r["doc_id"]
        for r in stratified_sample(df.repartition(7), fracs, 0.1).collect()
    )
    assert got2 == got


def test_hex_threshold_keep_all(spark):
    """fraction >= 1.0 must keep EVERY row — including the ~2^-32 whose
    md5 prefix is exactly 'ffffffff' (a strict < 'ffffffff' dropped
    them). The sentinel 'g' sorts above all 8-hex-digit strings."""
    from search_engine_spark.operators.curate import (
        _hex_threshold,
        stratified_sample,
    )

    assert _hex_threshold(1.0) == "g"
    assert "ffffffff" < "g"  # the previously-dropped edge keeps
    assert _hex_threshold(0.0) == "00000000"
    assert _hex_threshold(0.5) == "80000000"
    df = spark.createDataFrame(
        [(i, "en") for i in range(100)], "doc_id long, lang string"
    )
    assert stratified_sample(df, {"en": 1.0}).count() == 100


def test_stratified_sample_no_shuffle(spark):
    from search_engine_spark.operators.curate import stratified_sample

    df = spark.range(100).select(
        F.col("id").alias("doc_id"), F.lit("en").alias("lang")
    )
    plan = (
        stratified_sample(df, {"en": 0.5})
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_chunk_windows_pins(spark):
    """Sliding-window chunking: start/step rule, short-tail chunk,
    single-chunk doc, empty doc, raw-text preservation, guards."""
    import pytest

    from search_engine_spark.operators.curate import chunk_windows

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j"),       # 10 tokens
            (2, "One, TWO;  three"),          # 3 tokens, punct/case kept
            (3, ""),                          # empty → no chunks
            (4, "x " * 4),                    # exactly window → 1 chunk
        ],
        "doc_id long, text string",
    )
    rows = {
        (r["doc_id"], r["chunk_idx"]): (r["n_tokens"], r["chunk"])
        for r in chunk_windows(docs, window=4, overlap=1).collect()
    }
    # doc 1: starts 0,3,6,9 (step 3) → sizes 4,4,4,1
    assert rows[(1, 0)] == (4, "a b c d")
    assert rows[(1, 1)] == (4, "d e f g")
    assert rows[(1, 2)] == (4, "g h i j")
    assert rows[(1, 3)] == (1, "j")
    assert rows[(2, 0)] == (3, "One, TWO; three")  # raw tokens, single space
    assert rows[(4, 0)] == (4, "x x x x")
    assert {d for d, _ in rows} == {1, 2, 4}  # empty doc 3 absent
    with pytest.raises(ValueError, match="overlap"):
        chunk_windows(docs, window=4, overlap=4)
    # map-only: no exchange in the physical plan
    plan = (
        chunk_windows(docs, window=4, overlap=1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_mixture_rates_and_sample_composition(spark):
    """mixture_rates: pinned rate math incl. the rate-1 cap, only
    targeted sources appear; the rates dict then feeds
    stratified_sample(strata_col='source') and the realized sample's
    per-source token mass tracks the target mixture."""
    from search_engine_spark.operators.curate import (
        mixture_rates,
        stratified_sample,
    )

    rows = [
        (i, ["web", "code", "tiny"][i % 3], 100 + (i * 37) % 50)
        for i in range(3000)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    totals = {}
    for _, s, n in rows:
        totals[s] = totals.get(s, 0) + n
    target = {"web": 0.6, "code": 0.4, "tiny": 0.0}
    budget = 60_000
    got = {
        r["source"]: r
        for r in mixture_rates(df, target, budget).collect()
    }
    assert set(got) == set(target)
    for s, r in got.items():
        assert r["n_tokens"] == totals[s]
        assert r["rate"] == round(
            min(1.0, budget * target[s] / totals[s]), 6
        )
    # a source whose share exceeds its corpus caps at 1
    capped = mixture_rates(df, {"tiny": 1.0}, 10**9).collect()
    assert capped[0]["rate"] == 1.0
    # untargeted sources are absent, not rate-0 rows
    assert len(mixture_rates(df, {"web": 1.0}, budget).collect()) == 1

    rates = {s: got[s]["rate"] for s in got}
    sample = stratified_sample(
        df, rates, default_fraction=0.0, strata_col="source",
        key_col="doc_id",
    )
    mass = {
        r["source"]: r["tok"]
        for r in sample.groupBy("source")
        .agg(F.sum("n_tokens").alias("tok"))
        .collect()
    }
    assert "tiny" not in mass  # rate 0 → nothing sampled
    # realized token mass within 25% of each source's budget share
    for s in ("web", "code"):
        assert abs(mass[s] - budget * target[s]) < 0.25 * budget * target[s]


def test_quality_funnel_counts(spark):
    from search_engine_spark.operators.curate import quality_funnel

    import itertools

    words = [
        "".join(p) for p in itertools.product("abcdefgh", repeat=3)
    ][:80]
    docs = spark.createDataFrame(
        [
            (1, "short"),                                # too_short
            (2, " ".join(["xy"] * 100)),                 # low_diversity
            (3, " ".join("1234567890" for _ in range(30))),  # high_digit
            (4, " ".join(words)),                        # kept
        ],
        "doc_id long, text string",
    )
    rules = [
        ("too_short", "length(text) < 200"),
        (
            "high_digit",
            "length(regexp_replace(text, '[^0-9]', '')) * 5 > length(text)",
        ),
        (
            "low_diversity",
            "size(array_distinct(regexp_extract_all(lower(text),"
            " '[a-z0-9]+', 0))) * 5 <"
            " size(regexp_extract_all(lower(text), '[a-z0-9]+', 0)) * 2",
        ),
    ]
    got = {r["stage"]: r["n_docs"] for r in quality_funnel(docs, rules).collect()}
    assert got == {
        "too_short": 1, "high_digit": 1, "low_diversity": 1, "kept": 1
    }


# ---------------------------------------------------------------------------
# decontamination
# ---------------------------------------------------------------------------


def _sh_df(spark, rows, idcol):
    return spark.createDataFrame(rows, f"{idcol} long, sh string")


def test_decontaminate_threshold_and_ordering(spark):
    """Integer threshold semantics: >= num/den of the eval item's
    shingles, inclusive at the boundary; output ordered (doc, eval)."""
    from search_engine_spark.operators.curate import decontaminate

    # eval item 100 has 5 shingles; docs share 5, 4 (boundary), 3 of them
    ev = _sh_df(
        spark, [(100, f"s{i}") for i in range(5)], "eval_id"
    )
    docs = _sh_df(
        spark,
        [(1, f"s{i}") for i in range(5)]
        + [(2, f"s{i}") for i in range(4)] + [(2, "zz")]
        + [(3, f"s{i}") for i in range(3)] + [(3, "yy"), (3, "xx")],
        "doc_id",
    )
    got = decontaminate(docs, ev, 4, 5).collect()
    assert [(r.doc_id, r.eval_id, r.n_shared, r.eval_total) for r in got] == [
        (1, 100, 5, 5),
        (2, 100, 4, 5),  # 4/5 inclusive
    ]


def test_decontaminate_df_cap_drops_boilerplate(spark):
    """Shingles in > max_shingle_df docs are evidence for NOBODY, and
    eval_total shrinks to the matchable remainder."""
    from search_engine_spark.operators.curate import decontaminate

    # "hot" appears in 3 docs (> cap 2) — only s0/s1 remain matchable
    ev = _sh_df(spark, [(9, "hot"), (9, "s0"), (9, "s1")], "eval_id")
    docs = _sh_df(
        spark,
        [(1, "hot"), (2, "hot"), (3, "hot"), (1, "s0"), (1, "s1"), (2, "s0")],
        "doc_id",
    )
    got = decontaminate(docs, ev, 4, 5, max_shingle_df=2).collect()
    # doc 1: 2/2 matchable -> flagged; doc 2: 1/2 < 4/5; doc 3: only hot
    assert [(r.doc_id, r.n_shared, r.eval_total) for r in got] == [(1, 2, 2)]


def test_decontaminate_plan_broadcasts_eval(spark):
    """The corpus-side shingle join must be a BroadcastHashJoin (no
    shuffle of the big side) when broadcast_eval is on."""
    from search_engine_spark.operators.curate import decontaminate

    ev = _sh_df(spark, [(1, "a")], "eval_id")
    docs = _sh_df(spark, [(1, "a"), (2, "b")], "doc_id")
    plan = decontaminate(docs, ev)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
