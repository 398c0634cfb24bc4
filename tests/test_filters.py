"""Attribute-filtered search (operators/filters.py): non-scoring filter
postings over the docs' role/tool columns. Rank identity is asserted
across all implementations — oracle / flat / blocks{exact,wand} ×
{and,or} / SearchEngine — plus a kernel-level hypothesis property
(filter-aware kernels ≡ brute-force filter of untruncated exact results)
and an upsert test (the filters family rebuilds with its bucket).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings

from oracle import oracle as orc
from search_engine_spark.operators.filters import (
    build_filter_flat,
    filter_groups,
)
from search_engine_spark.operators.query import bm25_search
from search_engine_spark.operators.wand import bm25_search_blocks
from search_engine_spark.schemas import TRANSCRIPTS
from tests.test_spark_engine import HOT_TERM, RARE, VOCAB
from tests.test_wand_property import _blocks_frame, corpus_strategy


# -- normalization ------------------------------------------------------------


def test_filter_groups_normalization():
    assert filter_groups(None) == ()
    assert filter_groups({}) == ()
    assert filter_groups({"role": "user"}) == (("role=user",),)
    # values sorted unique within a group, columns sorted across groups
    assert filter_groups({"tool": ["z", "a", "a"], "role": "user"}) == (
        ("role=user",),
        ("tool=a", "tool=z"),
    )
    with pytest.raises(ValueError, match="not indexed"):
        filter_groups({"conv_id": "x"})
    with pytest.raises(ValueError, match="no values"):
        filter_groups({"role": []})


# -- calendar date family ------------------------------------------------------


def _expand_cover(lemmas) -> set[str]:
    """Brute-force expansion of a cover back to its day strings."""
    from datetime import date, timedelta

    days: set[str] = set()
    for lem in lemmas:
        tag, v = lem.split("=", 1)[1].split(":", 1)
        if tag == "d":
            days.add(v)
        elif tag == "m":
            y, m = map(int, v.split("-"))
            cur = date(y, m, 1)
            while cur.month == m:
                days.add(cur.isoformat())
                cur += timedelta(days=1)
        else:
            y = int(v)
            cur = date(y, 1, 1)
            while cur.year == y:
                days.add(cur.isoformat())
                cur += timedelta(days=1)
    return days


def test_date_cover_minimal_and_exact():
    from datetime import date, timedelta

    from search_engine_spark.operators.filters import date_cover

    assert date_cover("2025-01-03", "2025-01-05") == (
        "date=d:2025-01-03", "date=d:2025-01-04", "date=d:2025-01-05",
    )
    assert date_cover("2025-01-01", "2025-12-31") == ("date=y:2025",)
    assert date_cover("2025-02-01", "2025-02-28") == ("date=m:2025-02",)
    cov = date_cover("2024-12-30", "2026-02-03")
    assert "date=y:2025" in cov and "date=m:2026-01" in cov
    with pytest.raises(ValueError, match="empty date range"):
        date_cover("2025-01-02", "2025-01-01")

    # property: expansion == exact day enumeration for a sweep of ranges
    rng = np.random.default_rng(7)
    base = date(2023, 11, 20)
    for _ in range(60):
        a = base + timedelta(days=int(rng.integers(0, 500)))
        b = a + timedelta(days=int(rng.integers(0, 900)))
        cov = date_cover(a.isoformat(), b.isoformat())
        exact = {
            (a + timedelta(days=i)).isoformat()
            for i in range((b - a).days + 1)
        }
        assert _expand_cover(cov) == exact, (a, b)
        # minimality: never more lemmas than days, and any span covering
        # a whole year compresses below day count
        assert len(cov) <= (b - a).days + 1


def test_date_group_forms():
    assert filter_groups({"date": "2025-01-03"}) == (
        ("date=d:2025-01-03",),
    )
    assert filter_groups({"date": ["2025-01-05", "2025-01-03"]}) == (
        ("date=d:2025-01-03", "date=d:2025-01-05"),
    )
    assert filter_groups(
        {"date": {"from": "2025-01-01", "to": "2025-12-31"}}
    ) == (("date=y:2025",),)
    with pytest.raises(ValueError, match="from"):
        filter_groups({"date": {"frm": "2025-01-01"}})
    with pytest.raises(ValueError):
        filter_groups({"date": "01/02/2025"})  # malformed day


def test_null_ts_emits_no_date_postings(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "scope": ["s", "s"],
            "ts": [pd.Timestamp("2025-01-03"), pd.NaT],
            "role": ["user", None],
        }
    )
    sdf = spark.createDataFrame(pdf)
    rows = build_filter_flat(sdf, cols=("date", "role")).collect()
    lemmas = sorted((r["lemma"], r["doc_id"]) for r in rows)
    assert lemmas == [
        ("date=d:2025-01-03", 1),
        ("date=m:2025-01", 1),
        ("date=y:2025", 1),
        ("role=user", 1),
    ]


# -- rank identity across every implementation -------------------------------


CASES = [
    # (qid, query, scope, k, offset, combine, filters, must_bite)
    ("f01_role", RARE, None, 10, 0, "and", {"role": "assistant"}, True),
    ("f02_multi_value", RARE, None, 10, 0, "and",
     {"role": ["user", "assistant"]}, False),
    ("f03_scoped", RARE, "scope-1", 10, 0, "and", {"role": "user"}, False),
    ("f04_or", f"{RARE} {VOCAB[40]}", None, 10, 0, "or",
     {"role": "assistant"}, True),
    # tool is NULL on ~90% of docs — NULL never matches a filter
    ("f05_null_never_matches", RARE, None, 10, 0, "and",
     {"tool": ["bash", "search", "browser", "editor"]}, True),
    ("f06_and_columns", f"{HOT_TERM} {RARE}", None, 10, 0, "and",
     {"role": "tool", "tool": ["bash", "search", "browser", "editor"]},
     True),
    ("f07_paginated", RARE, None, 5, 3, "and", {"role": "user"}, False),
    # the shared corpus spans 2025-01-01 .. 2025-01-13 (conv start =
    # epoch + conv_idx hours) — mid-range date filters bite
    ("f08_date_range", RARE, None, 10, 0, "and",
     {"date": {"from": "2025-01-03", "to": "2025-01-07"}}, True),
    ("f09_date_days", RARE, None, 10, 0, "and",
     {"date": ["2025-01-02", "2025-01-04", "2025-01-06"]}, True),
    ("f10_date_and_role", RARE, None, 10, 0, "and",
     {"date": {"from": "2025-01-01", "to": "2025-01-09"},
      "role": "assistant"}, True),
    ("f11_date_or_mode", f"{RARE} {VOCAB[40]}", None, 10, 0, "or",
     {"date": {"from": "2025-01-02", "to": "2025-01-08"}}, True),
]


@pytest.mark.parametrize(
    "qid,query,scope,k,offset,combine,filters,must_bite", CASES
)
def test_filters_rank_identity(
    spark, engine_tables, base_index_dir, oracle_idx,
    qid, query, scope, k, offset, combine, filters, must_bite,
):
    from search_engine_spark.sources.io import read_table

    exp = orc.search(
        oracle_idx, query, scope=scope, k=k, offset=offset,
        combine=combine, filters=filters,
    )
    if must_bite:
        base = orc.search(
            oracle_idx, query, scope=scope, k=k, offset=offset,
            combine=combine,
        )
        assert exp != base, qid  # the filter must actually change results

    flat = bm25_search(
        engine_tables["postings_flat"], engine_tables["lemma_stats"],
        engine_tables["doc_stats"], query,
        scope=scope, k=k, offset=offset, combine=combine,
        filters=filters,
        filter_postings_flat=build_filter_flat(engine_tables["docs"]),
    ).collect()
    assert [(r["doc_id"], r["score"]) for r in flat] == exp, qid

    blocks = read_table(spark, f"{base_index_dir['index']}/postings")
    flt = read_table(spark, f"{base_index_dir['index']}/filters")
    ls = read_table(spark, f"{base_index_dir['index']}/lemma_stats")
    ds = read_table(spark, f"{base_index_dir['index']}/doc_stats")
    for mode in ("exact", "wand"):
        got = bm25_search_blocks(
            blocks, ls, ds, query, scope=scope, k=k, offset=offset,
            mode=mode, combine=combine, filters=filters,
            filter_postings=flt,
        ).collect()
        assert [(r["doc_id"], r["score"]) for r in got] == exp, (qid, mode)


def test_filters_nonempty_somewhere(oracle_idx):
    """The headline single-column case must return real rows (an all-empty
    parity suite would prove nothing)."""
    assert orc.search(oracle_idx, RARE, k=10, filters={"role": "assistant"})
    assert orc.search(oracle_idx, RARE, k=10, filters={"role": "user"})


def test_filters_compose_with_exclusion(
    spark, engine_tables, base_index_dir, oracle_idx
):
    from search_engine_spark.sources.io import read_table
    from tests.test_not import _effective_exclusion

    filters = {"role": ["user", "assistant"]}
    excl_word = _effective_exclusion(oracle_idx, RARE)
    excl = orc.query_lemmas(excl_word)
    exp = orc.search(
        oracle_idx, RARE, k=10, exclude=excl, filters=filters
    )

    flat = bm25_search(
        engine_tables["postings_flat"], engine_tables["lemma_stats"],
        engine_tables["doc_stats"], RARE, k=10, exclude_terms=excl,
        filters=filters,
        filter_postings_flat=build_filter_flat(engine_tables["docs"]),
    ).collect()
    assert [(r["doc_id"], r["score"]) for r in flat] == exp

    blocks = read_table(spark, f"{base_index_dir['index']}/postings")
    flt = read_table(spark, f"{base_index_dir['index']}/filters")
    ls = read_table(spark, f"{base_index_dir['index']}/lemma_stats")
    ds = read_table(spark, f"{base_index_dir['index']}/doc_stats")
    for mode in ("exact", "wand"):
        got = bm25_search_blocks(
            blocks, ls, ds, RARE, k=10, mode=mode,
            exclude_terms=excl, filters=filters, filter_postings=flt,
        ).collect()
        assert [(r["doc_id"], r["score"]) for r in got] == exp, mode


def test_filters_unknown_value_is_empty(
    spark, engine_tables, base_index_dir, oracle_idx
):
    """A filter value no doc carries empties the result in every
    implementation (the value has no filter postings anywhere)."""
    from search_engine_spark.sources.io import read_table

    filters = {"role": "nonexistent"}
    assert orc.search(oracle_idx, RARE, k=10, filters=filters) == []
    got = bm25_search(
        engine_tables["postings_flat"], engine_tables["lemma_stats"],
        engine_tables["doc_stats"], RARE, k=10, filters=filters,
        filter_postings_flat=build_filter_flat(engine_tables["docs"]),
    ).collect()
    assert got == []
    blocks = read_table(spark, f"{base_index_dir['index']}/postings")
    flt = read_table(spark, f"{base_index_dir['index']}/filters")
    ls = read_table(spark, f"{base_index_dir['index']}/lemma_stats")
    ds = read_table(spark, f"{base_index_dir['index']}/doc_stats")
    for mode in ("exact", "wand"):
        got = bm25_search_blocks(
            blocks, ls, ds, RARE, k=10, mode=mode,
            filters=filters, filter_postings=flt,
        ).collect()
        assert got == [], mode


def test_filters_require_postings_table(engine_tables):
    with pytest.raises(ValueError, match="filter postings"):
        bm25_search(
            engine_tables["postings_flat"], engine_tables["lemma_stats"],
            engine_tables["doc_stats"], RARE, k=10,
            filters={"role": "user"},
        )


def test_date_filter_multi_granularity_postings(spark, small_pdf):
    """A corpus whose turns span >2 years exercises the month/year cover
    lemmas against REAL postings (the shared corpus only spans days):
    flat engine == oracle on a range whose cover mixes all three
    granularities."""
    from search_engine_spark.operators.build import build_all
    from search_engine_spark.operators.docs import build_docs
    from search_engine_spark.operators.filters import date_cover
    from search_engine_spark.schemas import TRANSCRIPTS

    mod = small_pdf.copy()
    mod["ts"] = (
        mod["ts"] + pd.to_timedelta(np.arange(len(mod)) % 900, unit="D")
    ).astype("datetime64[us]")
    frm, to = "2025-06-01", "2026-12-31"
    cov = date_cover(frm, to)
    assert any(l.startswith("date=y:") for l in cov)
    assert any(l.startswith("date=m:") for l in cov)

    idx = orc.build_index(mod)
    filters = {"date": {"from": frm, "to": to}}
    exp = orc.search(idx, RARE, k=10, filters=filters)
    base = orc.search(idx, RARE, k=10)
    assert exp and exp != base

    sdf = spark.createDataFrame(mod, schema=TRANSCRIPTS)
    docs = build_docs(sdf, with_lemmas=True)
    pf, ls, ds = build_all(docs)
    got = bm25_search(
        pf, ls, ds, RARE, k=10, filters=filters,
        filter_postings_flat=build_filter_flat(docs),
    ).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == exp


# -- API facade ---------------------------------------------------------------


def test_filters_via_api(spark, base_index_dir, oracle_idx):
    from search_engine_spark.api import SearchEngine

    eng = SearchEngine(spark, base_index_dir["index"])
    exp = orc.search(oracle_idx, RARE, k=10, filters={"role": "assistant"})
    res = eng.search(RARE, limit=10, filters={"role": "assistant"})
    assert [d["relevance"] for d in res["data"]] == [
        s for _, s in exp[: len(res["data"])]
    ]
    assert len(res["data"]) == min(10, len(exp))

    # the result cache keys on the filters — a different filter on the
    # same query must not serve stale rows
    exp_u = orc.search(oracle_idx, RARE, k=10, filters={"role": "user"})
    res_u = eng.search(RARE, limit=10, filters={"role": "user"})
    assert [d["relevance"] for d in res_u["data"]] == [
        s for _, s in exp_u[: len(res_u["data"])]
    ]
    assert res_u["data"] != res["data"]

    with pytest.raises(ValueError, match="not indexed"):
        eng.search(RARE, filters={"ts": "2025"})
    with pytest.raises(ValueError, match="bm25"):
        eng.search(RARE, filters={"role": "user"}, scorer="reftf")
    # an index built with filter_cols=() has no filters family
    eng._filter_blocks = None
    with pytest.raises(ValueError, match="no filters family"):
        eng.search(RARE, filters={"role": "user"})


def test_date_filter_via_api(spark, base_index_dir, oracle_idx):
    from search_engine_spark.api import SearchEngine

    eng = SearchEngine(spark, base_index_dir["index"])
    assert eng._filter_cols == ("date", "role", "tool")
    filters = {"date": {"from": "2025-01-02", "to": "2025-01-06"}}
    exp = orc.search(oracle_idx, RARE, k=10, filters=filters)
    assert exp
    res = eng.search(RARE, limit=10, filters=filters)
    assert [d["relevance"] for d in res["data"]] == [
        s for _, s in exp[: len(res["data"])]
    ]
    # an index whose lineage predates the date family must error, not
    # silently match nothing
    eng._filter_cols = ("role", "tool")
    with pytest.raises(ValueError, match="not indexed"):
        eng.search(RARE, filters={"date": "2025-01-02"})


# -- upsert keeps the filters family in sync ----------------------------------


def test_filters_rebuilt_on_upsert(
    spark, small_pdf, base_index_dir, tmp_path_factory
):
    """Flip a turn's role (and text) via upsert_turns: the filtered search
    over the upserted index is bit-identical to an oracle built fresh over
    the modified corpus — stale filter postings would exclude the doc."""
    import shutil

    from search_engine_spark.api import SearchEngine
    from search_engine_spark.operators.upsert import upsert_turns
    from search_engine_spark.plans.job import IndexBuildJob

    dst = str(tmp_path_factory.mktemp("idxfilt") / "idx")
    shutil.copytree(base_index_dir["index"], dst)

    mod = small_pdf.copy()
    victim = mod.index[11]
    assert mod.loc[victim, "role"] != "tool"
    mod.loc[victim, "role"] = "tool"
    mod.loc[victim, "tool"] = "editor"
    mod.loc[victim, "text"] = f"{RARE} {RARE} {RARE} filter sync probe"

    job = IndexBuildJob(
        spark, base_index_dir["corpus"], dst,
        n_buckets=4, docs_per_shard=256, run_id="base",
    )
    delta = mod.loc[[victim]].copy()
    upsert_turns(job, spark.createDataFrame(delta, schema=TRANSCRIPTS))

    idx2 = orc.build_index(mod)
    exp = orc.search(idx2, RARE, k=10, filters={"tool": "editor"})
    assert exp, "the upserted doc must be findable through the new filter"

    eng = SearchEngine(spark, dst)
    res = eng.search(RARE, limit=10, filters={"tool": "editor"})
    assert [d["relevance"] for d in res["data"]] == [s for _, s in exp]
    # and the doc no longer matches its OLD role filter
    exp_old = orc.search(idx2, RARE, k=10, filters={"role": "user"})
    res_old = eng.search(RARE, limit=10, filters={"role": "user"})
    assert [d["relevance"] for d in res_old["data"]] == [
        s for _, s in exp_old[: len(res_old["data"])]
    ]


# -- kernel-level property ----------------------------------------------------


@given(corpus_strategy)
@settings(max_examples=100, deadline=None)
def test_kernels_with_filters_random(cfg):
    """All four kernels with filter groups ≡ brute-force filter of the
    UNtruncated exact result (filter-then-cut, never cut-then-filter).
    Docs get a synthetic 3-value attribute; the filter allows 2 values
    via a 2-lemma group, plus a second single-lemma group column."""
    from search_engine_spark.operators import compress as C
    from search_engine_spark.operators.wand import (
        _shard_exact_kernel,
        _shard_or_exact_kernel,
        _shard_or_wand_kernel,
        _shard_wand_kernel,
    )

    rng = np.random.default_rng(cfg["seed"])
    docs = np.arange(1, cfg["n_docs"] + 1)
    doc_lens = {int(d): int(rng.integers(1, 200)) for d in docs}
    terms = [f"t{j}" for j in range(cfg["n_terms"])]
    term_postings = {}
    for t in terms:
        mask = rng.random(docs.size) < cfg["density"]
        chosen = docs[mask]
        if chosen.size == 0:
            chosen = docs[:1]
        term_postings[t] = {int(d): int(rng.integers(1, 30)) for d in chosen}
    # synthetic attributes: role ∈ {r0,r1,r2} on every doc; flag on ~40%
    # (docs without it model NULL — they never match the flag group)
    roles = rng.integers(0, 3, size=docs.size)
    flag = rng.random(docs.size) < 0.4
    for v in range(3):
        sel = docs[roles == v]
        if sel.size:
            term_postings[f"role={v}"] = {int(d): 1 for d in sel}
    if flag.any():
        term_postings["flag=on"] = {int(d): 1 for d in docs[flag]}
    groups = (("role=0", "role=1"), ("flag=on",))
    allowed = set(
        int(d) for d, r, fl in zip(docs, roles, flag) if r in (0, 1) and fl
    )
    scope_of_doc = lambda d: f"s{d % 3}"  # noqa: E731
    old = C.BLOCK_SIZE
    C.BLOCK_SIZE = 16
    try:
        pdf = _blocks_frame(term_postings, doc_lens, scope_of_doc)
    finally:
        C.BLOCK_SIZE = old
    idfs = [float(rng.uniform(0.1, 5.0)) for _ in terms]
    avg_len = float(rng.uniform(5, 150))
    m = cfg["k"]

    def canon(df):
        return sorted(
            zip(df["doc_id"].astype(int), df["score"].astype(float)),
            key=lambda r: (-r[1], r[0]),
        )

    for combine, kexact, kwand in (
        ("and", _shard_exact_kernel, _shard_wand_kernel),
        ("or", _shard_or_exact_kernel, _shard_or_wand_kernel),
    ):
        full = canon(kexact(terms, idfs, avg_len, 10**9)(pdf))
        ref = [r for r in full if r[0] in allowed][:m]
        got_e = canon(
            kexact(terms, idfs, avg_len, m, (), groups)(pdf)
        )
        got_w = canon(
            kwand(terms, idfs, avg_len, m, (), groups)(pdf)
        )
        assert got_e == ref, combine
        assert got_w == ref, combine


# -- facets compose with filters + calendar histogram -------------------------


def test_facet_counts_calendar_derivation(engine_tables):
    """The derived day/month/year facets (operators/query.py
    CALENDAR_FACETS) equal a pandas strftime groupby over the same
    result set — UTC on both sides (sources/session.py pins the session
    timezone)."""
    from search_engine_spark.operators.query import bm25_search, facet_counts

    results = bm25_search(
        engine_tables["postings_flat"],
        engine_tables["lemma_stats"],
        engine_tables["doc_stats"],
        RARE,
        k=50,
    )
    hit_ids = {r["doc_id"] for r in results.collect()}
    assert hit_ids  # a non-trivial result set (RARE passes the cutoff)
    docs_pdf = (
        engine_tables["docs"].select("doc_id", "role", "ts").toPandas()
    )
    sub = docs_pdf[docs_pdf["doc_id"].isin(hit_ids)]
    for col, fmt in (("day", "%Y-%m-%d"), ("month", "%Y-%m"), ("year", "%Y")):
        got = {
            (r[col], r["role"]): r["n_docs"]
            for r in facet_counts(
                results, engine_tables["docs"], [col, "role"]
            ).collect()
        }
        want = (
            sub.groupby([sub["ts"].dt.strftime(fmt), "role"])
            .size()
            .to_dict()
        )
        assert got == want and sum(got.values()) == len(hit_ids), col
        if col == "day":
            assert len({d for d, _ in want}) > 1  # the histogram bins


def test_facets_api_with_filters_and_day(spark, base_index_dir, oracle_idx):
    """SearchEngine.facets(filters=...) restricts the match set with the
    pinned filter semantics (oracle.search(filters=...) is the twin) and
    the 'day' facet_col yields the date-histogram panel."""
    from search_engine_spark.api import SearchEngine

    eng = SearchEngine(spark, base_index_dir["index"])
    docs_pdf = eng._docs.select("doc_id", "role", "ts").toPandas()

    base = eng.facets(RARE, facet_cols=("day",), depth=10_000)
    for filters in (None, {"role": "user"}):  # filtered LAST (checked below)
        exp_ids = {
            d for d, _ in orc.search(
                oracle_idx, RARE, k=10_000, filters=filters
            )
        }
        sub = docs_pdf[docs_pdf["doc_id"].isin(exp_ids)]
        want = sub.groupby(sub["ts"].dt.strftime("%Y-%m-%d")).size().to_dict()
        fac = eng.facets(
            RARE, facet_cols=("day",), depth=10_000, filters=filters
        )
        got = {f["day"]: f["n_docs"] for f in fac["facets"]}
        assert got == want, filters
    assert fac["facets"] != base["facets"]  # the role filter bites

    # (day, role) two-column panel under a date-range filter
    filters = {"date": {"from": "2025-01-02", "to": "2025-01-06"}}
    exp_ids = {
        d for d, _ in orc.search(oracle_idx, RARE, k=10_000, filters=filters)
    }
    sub = docs_pdf[docs_pdf["doc_id"].isin(exp_ids)]
    want = (
        sub.groupby([sub["ts"].dt.strftime("%Y-%m-%d"), "role"])
        .size()
        .to_dict()
    )
    fac = eng.facets(
        RARE, facet_cols=("day", "role"), depth=10_000, filters=filters
    )
    assert {(f["day"], f["role"]): f["n_docs"] for f in fac["facets"]} == want
    assert all(
        "2025-01-02" <= f["day"] <= "2025-01-06" for f in fac["facets"]
    )

    with pytest.raises(ValueError, match="not indexed"):
        eng.facets(RARE, filters={"conv_id": "x"})
    with pytest.raises(ValueError, match="positional"):
        eng.facets(RARE, match="phrase")  # base index is non-positional
