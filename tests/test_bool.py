"""Boolean query language (functions/boolquery.py): parser semantics,
oracle.bool_search ≡ the flat AND/OR/-term modes on their common
subset, engine (wand.bool_search_blocks / QueryServer.bool_search /
SearchEngine match="bool") rank-identical to the oracle on nested
queries incl. scope / filters / cursor composition."""

from __future__ import annotations

import pytest

from oracle import oracle as orc
from search_engine_spark.functions.analyze import query_lemmas
from search_engine_spark.functions.boolquery import (
    all_lemmas,
    parse_bool,
    positive_lemmas,
    prune_over_cutoff,
)
from search_engine_spark.operators.compress import build_postings_compressed
from search_engine_spark.operators.wand import bool_search_blocks
from tests.test_spark_engine import HOT_TERM, RARE, VOCAB

R2, R3, R4 = str(VOCAB[310]), str(VOCAB[320]), str(VOCAB[305])

NESTED = [
    "{r} {r2}",
    "{r} OR {r2}",
    "({r} OR {r2}) AND NOT {r3}",
    "{r} -{r2}",
    "{r} OR ({r2} AND {r3})",
    "{hot} OR {r}",                      # hot lemma drops per-term
    "({r} OR {r2}) ({r3} OR {r4})",      # implicit AND of groups
    "{r} AND NOT ({r2} OR {r3})",        # negated group
    "NOT NOT {r}",                       # involution
]


def _fmt(q: str) -> str:
    return q.format(r=RARE, r2=R2, r3=R3, r4=R4, hot=HOT_TERM)


@pytest.fixture(scope="module")
def blocks(engine_tables):
    return build_postings_compressed(
        engine_tables["postings_flat"], range_size=256
    ).cache()


def _lem(word: str) -> str:
    (l,) = query_lemmas(word)
    return l


# -- parser ------------------------------------------------------------------


def test_parser_shapes():
    r, r2, r3 = _lem(RARE), _lem(R2), _lem(R3)
    assert parse_bool(RARE) == ("term", r)
    assert parse_bool(f"{RARE} {R2}") == (
        "and", (("term", r), ("term", r2)), ()
    )
    # OR binds looser than AND
    assert parse_bool(f"{RARE} {R2} OR {R3}") == (
        "or", (("and", (("term", r), ("term", r2)), ()), ("term", r3))
    )
    # -term and NOT are the same edge; NOT NOT cancels
    assert parse_bool(f"{RARE} -{R2}") == parse_bool(f"{RARE} NOT {R2}")
    assert parse_bool(f"NOT NOT {RARE}") == ("term", r)
    # a pure-negative group flattens into the parent's negative list
    assert parse_bool(f"{RARE} AND (NOT {R2})") == parse_bool(f"{RARE} -{R2}")
    # vacuous atoms (stopwords) vanish; all-vacuous → None
    assert parse_bool(f"the {RARE}") == ("term", r)
    assert parse_bool("the a") is None
    assert parse_bool("") is None


def test_parser_errors():
    for bad in ["(", ")", f"({RARE}", f"{RARE})", f"{RARE} OR", "AND",
                f"{RARE} AND", f'"{RARE}"']:
        with pytest.raises(ValueError):
            parse_bool(bad)


def test_lemma_sets_and_prune():
    r, r2, r3 = _lem(RARE), _lem(R2), _lem(R3)
    t = parse_bool(f"({RARE} OR {R2}) AND NOT {R3}")
    assert positive_lemmas(t) == sorted([r, r2])
    assert all_lemmas(t) == sorted([r, r2, r3])
    # negated subtrees are never pruned; positive drops per-term
    assert prune_over_cutoff(t, {r}) == ("and", (("term", r2),), (("term", r3),))
    assert prune_over_cutoff(t, {r, r2}) is None
    # an AND whose positives all drop dies with its negations
    t2 = parse_bool(f"{RARE} OR ({R2} -{R3})")
    assert prune_over_cutoff(t2, {r2}) == ("term", r)


# -- oracle ≡ flat modes on the common subset ---------------------------------


def test_oracle_bool_equivalences(oracle_idx):
    q_and, q_or = f"{RARE} {R2}", f"{RARE} OR {R2}"
    assert orc.bool_search(oracle_idx, q_and, k=50) == orc.search(
        oracle_idx, q_and, k=50
    )
    assert orc.bool_search(oracle_idx, q_or, k=50) == orc.search(
        oracle_idx, f"{RARE} {R2}", k=50, combine="or"
    )
    # per-term cutoff drop (OR-mode style) — hot OR rare ≡ or-mode
    assert orc.bool_search(oracle_idx, f"{HOT_TERM} OR {RARE}", k=50) == (
        orc.search(oracle_idx, f"{HOT_TERM} {RARE}", k=50, combine="or")
    )
    # ...but hot AND rare diverges DELIBERATELY: and-mode keeps the hot
    # term (it only dies when the RAREST lemma is over cutoff) and scores
    # the hot∧rare conjunction; boolean drops the hot term per-term
    # (OR-mode-style cutoff everywhere) and searches the rest
    assert orc.bool_search(oracle_idx, f"{HOT_TERM} {RARE}", k=50) == (
        orc.search(oracle_idx, RARE, k=50)
    )
    and_mode = orc.search(oracle_idx, f"{HOT_TERM} {RARE}", k=50)
    assert and_mode and and_mode != orc.bool_search(
        oracle_idx, f"{HOT_TERM} {RARE}", k=50
    )
    # -term ≡ exclude
    assert orc.bool_search(oracle_idx, f"{RARE} -{R2}", k=50) == orc.search(
        oracle_idx, RARE, k=50, exclude=query_lemmas(R2)
    )
    # pure-negative matches nothing
    assert orc.bool_search(oracle_idx, f"NOT {RARE}", k=50) == []


def test_oracle_bool_nontrivial_nesting(oracle_idx):
    """The OR-of-AND query really differs from every flat mode, and its
    scoring sums ALL present positive lemmas (a doc matched via the OR's
    left arm still scores the right arm's lemmas when present)."""
    q = _fmt("{r} OR ({r2} AND {r3})")
    got = orc.bool_search(oracle_idx, q, k=10_000)
    assert got
    flat_or = orc.search(
        oracle_idx, f"{RARE} {R2} {R3}", k=10_000, combine="or"
    )
    assert got != flat_or  # matching differs (b alone doesn't match)
    ids = {d for d, _ in got}
    or_scores = dict(flat_or)
    assert all(abs(or_scores[d] - s) < 1e-12 for d, s in got)


# -- engine rank identity ------------------------------------------------------


def _collect(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


def test_blocks_bool_rank_identity(blocks, engine_tables, oracle_idx):
    t = engine_tables
    checked = 0
    for q in NESTED:
        q = _fmt(q)
        exp = orc.bool_search(oracle_idx, q, k=10)
        got = _collect(
            bool_search_blocks(
                blocks, t["lemma_stats"], t["doc_stats"], q, k=10
            )
        )
        assert got == exp, q
        checked += bool(exp)
    assert checked >= 6


def test_blocks_bool_scope_filters_cursor(blocks, engine_tables, oracle_idx):
    from search_engine_spark.operators.filters import build_filter_blocks

    t = engine_tables
    fblocks = build_filter_blocks(t["docs"], range_size=256).cache()
    q = _fmt("({r} OR {r2}) AND NOT {r3}")
    exp = orc.bool_search(oracle_idx, q, scope="scope-1", k=10)
    assert _collect(
        bool_search_blocks(
            blocks, t["lemma_stats"], t["doc_stats"], q,
            scope="scope-1", k=10,
        )
    ) == exp
    flt = {"role": "user"}
    exp = orc.bool_search(oracle_idx, q, k=10, filters=flt)
    assert exp != orc.bool_search(oracle_idx, q, k=10)  # filter bites
    assert _collect(
        bool_search_blocks(
            blocks, t["lemma_stats"], t["doc_stats"], q, k=10,
            filters=flt, filter_postings=fblocks,
        )
    ) == exp
    full = orc.bool_search(oracle_idx, q, k=10_000)
    assert len(full) > 6
    cur = (full[1][1], full[1][0])
    assert _collect(
        bool_search_blocks(
            blocks, t["lemma_stats"], t["doc_stats"], q, k=4, after=cur
        )
    ) == full[2:6]
    with pytest.raises(ValueError, match="offset"):
        bool_search_blocks(
            blocks, t["lemma_stats"], t["doc_stats"], q, k=4, offset=2,
            after=cur,
        )


def test_query_server_bool(spark, base_index_dir, oracle_idx):
    from search_engine_spark.operators.serve import QueryServer

    srv = QueryServer(spark, base_index_dir["index"], cache_blocks=False)
    checked = 0
    for q in NESTED:
        q = _fmt(q)
        exp = orc.bool_search(oracle_idx, q, k=10)
        assert srv.bool_search(q, k=10) == exp, q
        checked += bool(exp)
    assert checked >= 6
    q = _fmt("({r} OR {r2}) AND NOT {r3}")
    exp = orc.bool_search(oracle_idx, q, k=10, filters={"role": "user"})
    assert srv.bool_search(q, k=10, filters={"role": "user"}) == exp
    from search_engine_spark.functions.boolquery import compile_synonyms

    syn = compile_synonyms([[RARE, R2]])
    assert srv.bool_search(f"{RARE} {R3}", k=10, synonyms=syn) == (
        orc.bool_search(oracle_idx, f"{RARE} {R3}", k=10, synonyms=syn)
    )


# -- synonyms ------------------------------------------------------------------


def test_compile_and_expand_synonyms():
    from search_engine_spark.functions.boolquery import (
        compile_synonyms,
        expand_synonyms,
    )

    r, r2, r3 = _lem(RARE), _lem(R2), _lem(R3)
    syn = compile_synonyms([[RARE, R2], [R2, R3]])
    assert syn[r] == (r2,)
    assert set(syn[r2]) == {r, r3}  # union over shared-member groups
    t = expand_synonyms(parse_bool(f"{RARE} -{R3}"), syn)
    # positive atom expands to a sorted OR group; the negation does not
    assert t == (
        "and",
        (("or", tuple(("term", l) for l in sorted([r, r2]))),),
        (("term", r3),),
    )
    # stopword-only groups compile away; unknown lemmas expand to nothing
    assert compile_synonyms([["the", "a"]]) == {}
    assert expand_synonyms(parse_bool(RARE), {}) == ("term", r)


def test_oracle_synonyms_equal_handwritten_or(oracle_idx):
    from search_engine_spark.functions.boolquery import compile_synonyms

    syn = compile_synonyms([[RARE, R2]])
    got = orc.bool_search(oracle_idx, f"{RARE} {R3}", k=50, synonyms=syn)
    hand = orc.bool_search(oracle_idx, f"({RARE} OR {R2}) {R3}", k=50)
    assert got == hand and got
    # expansion precedes the cutoff gate: a HOT synonym drops per-term,
    # leaving the original query untouched
    syn_hot = compile_synonyms([[RARE, HOT_TERM]])
    assert orc.bool_search(oracle_idx, RARE, k=50, synonyms=syn_hot) == (
        orc.bool_search(oracle_idx, RARE, k=50)
    )


def test_blocks_synonyms_rank_identity(blocks, engine_tables, oracle_idx):
    from search_engine_spark.functions.boolquery import compile_synonyms

    t = engine_tables
    syn = compile_synonyms([[RARE, R2], [R3, R4]])
    for q in [f"{RARE} {R3}", f"{RARE} OR {R3}", f"{RARE} -{R4}"]:
        exp = orc.bool_search(oracle_idx, q, k=10, synonyms=syn)
        got = _collect(
            bool_search_blocks(
                blocks, t["lemma_stats"], t["doc_stats"], q, k=10,
                synonyms=syn,
            )
        )
        assert got == exp, q
        assert exp


def test_api_synonyms(spark, base_index_dir, oracle_idx):
    from search_engine_spark.api import SearchEngine
    from search_engine_spark.functions.boolquery import compile_synonyms

    eng = SearchEngine(spark, base_index_dir["index"])
    syn = compile_synonyms([[RARE, R2]])
    exp = orc.bool_search(oracle_idx, f"{RARE} {R3}", k=10, synonyms=syn)
    out = eng.search(f"{RARE} {R3}", match="bool", limit=10, synonyms=syn)
    assert [round(d["relevance"], 9) for d in out["data"]] == [
        round(s, 9) for _, s in exp
    ]
    with pytest.raises(ValueError, match="synonyms"):
        eng.search(RARE, synonyms=syn)


def test_api_bool_match(spark, base_index_dir, oracle_idx):
    from search_engine_spark.api import SearchEngine

    eng = SearchEngine(spark, base_index_dir["index"])
    q = _fmt("({r} OR {r2}) AND NOT {r3}")
    exp = orc.bool_search(oracle_idx, q, k=10)
    out = eng.search(q, match="bool", limit=10)
    assert out["result"] is True
    assert [round(d["relevance"], 9) for d in out["data"]] == [
        round(s, 9) for _, s in exp
    ]
    assert all(d["snippet"] for d in out["data"])
    # cursor chaining through the API
    page1 = eng.search(q, match="bool", limit=3)
    nxt = page1["next_after"]
    page2 = eng.search(q, match="bool", limit=3, after=tuple(nxt))
    full = orc.bool_search(oracle_idx, q, k=6)
    assert [round(d["relevance"], 9) for d in page1["data"] + page2["data"]] \
        == [round(s, 9) for _, s in full]
    with pytest.raises(ValueError, match="bool"):
        eng.search(q, match="bool", fuzzy=True)


# -- boosts --------------------------------------------------------------------


def test_parse_bool_boosted():
    from search_engine_spark.functions.boolquery import parse_bool_boosted

    r, r2, r3 = _lem(RARE), _lem(R2), _lem(R3)
    t, w = parse_bool_boosted(f"{RARE}^2.5 {R2}")
    assert t == parse_bool(f"{RARE} {R2}")  # tree unchanged by boosts
    assert w == {r: 2.5}
    # group boosts multiply through nesting
    _, w = parse_bool_boosted(f"({RARE}^2 {R2})^3")
    assert w == {r: 6.0, r2: 3.0}
    # duplicate positive occurrences take the max weight
    _, w = parse_bool_boosted(f"{RARE}^2 OR ({R2} {RARE}^5)")
    assert w == {r: 5.0}
    _, w = parse_bool_boosted(f"{RARE}^2 OR {RARE}")  # plain occ = 1.0 < 2
    assert w == {r: 2.0}
    # negations never weigh (boost inert) and ^1 compiles away
    _, w = parse_bool_boosted(f"{RARE} -{R2}^4 AND NOT ({R3}^9)")
    assert w == {}
    assert parse_bool_boosted(f"{RARE}^1.0")[1] == {}
    for bad in [f"{RARE}^", f"{RARE}^x", f"{RARE} ^2", "^2", f"{RARE}^-2",
                f"{RARE}^0"]:
        with pytest.raises(ValueError):
            parse_bool_boosted(bad)


def test_expand_weights_synonym_inheritance():
    from search_engine_spark.functions.boolquery import (
        compile_synonyms,
        expand_weights,
    )

    r, r2, r3 = _lem(RARE), _lem(R2), _lem(R3)
    syn = compile_synonyms([[RARE, R2], [RARE, R3]])
    out = expand_weights({r: 2.0}, syn)
    assert out == {r: 2.0, r2: 2.0, r3: 2.0}  # synonyms inherit
    out = expand_weights({r: 0.5, r2: 3.0}, syn)
    assert out[r2] == 3.0  # own explicit weight beats inherited (max)


def test_oracle_boost_semantics(oracle_idx):
    # power-of-two boost: (2*idf)*core == 2*(idf*core) bit-exactly, so a
    # single-term boosted query doubles every score exactly
    plain = orc.bool_search(oracle_idx, RARE, k=50)
    boosted = orc.bool_search(oracle_idx, f"{RARE}^2", k=50)
    assert boosted == [(d, 2.0 * s) for d, s in plain]
    # ^1 is exactly the unboosted query; boost never changes the match set
    assert orc.bool_search(oracle_idx, f"{RARE}^1 {R2}", k=50) == (
        orc.bool_search(oracle_idx, f"{RARE} {R2}", k=50)
    )
    assert {d for d, _ in orc.bool_search(oracle_idx, f"{RARE}^7 {R2}", k=50)} == {
        d for d, _ in orc.bool_search(oracle_idx, f"{RARE} {R2}", k=50)
    }
    # cutoff ignores weights: a boosted hot term still drops per-term
    assert orc.bool_search(oracle_idx, f"{HOT_TERM}^9 OR {RARE}", k=50) == (
        orc.bool_search(oracle_idx, RARE, k=50)
    )


def test_blocks_boost_rank_identity(blocks, engine_tables, oracle_idx):
    from search_engine_spark.functions.boolquery import compile_synonyms

    t = engine_tables
    syn = compile_synonyms([[RARE, R2]])
    cases = [
        (f"{RARE}^2.5 {R3}", None),
        (f"({RARE} OR {R2})^3 -{R4}", None),
        (f"{RARE}^0.25 OR {R3}^4", None),
        (f"{RARE}^2 {R3}", syn),  # synonym lemmas inherit the boost
    ]
    for q, s in cases:
        exp = orc.bool_search(oracle_idx, q, k=10, synonyms=s)
        got = _collect(
            bool_search_blocks(
                blocks, t["lemma_stats"], t["doc_stats"], q, k=10, synonyms=s
            )
        )
        assert got == exp, q
        assert exp, q


def test_server_and_api_boost(spark, base_index_dir, oracle_idx):
    from search_engine_spark.api import SearchEngine
    from search_engine_spark.operators.serve import QueryServer

    q = f"{RARE}^3 OR {R2}^0.5"
    exp = orc.bool_search(oracle_idx, q, k=10)
    srv = QueryServer(spark, base_index_dir["index"])
    assert srv.bool_search(q, k=10) == exp
    eng = SearchEngine(spark, base_index_dir["index"])
    out = eng.search(q, match="bool", limit=10)
    assert [round(d["relevance"], 9) for d in out["data"]] == [
        round(s, 9) for _, s in exp
    ]
