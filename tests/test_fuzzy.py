"""Fuzzy matching + suggest (operators/fuzzy.py): the SymSpell delete-
neighborhood candidate join must EQUAL the brute-force levenshtein scan
for edit distance <= 1; corrections feed the standard pinned BM25 plan;
suggest equals a driver-side recomputation. Cross-engine parity is the
``fuzzy_match`` / ``suggest_prefix`` contract twins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from search_engine_spark.functions.analyze import query_lemmas
from search_engine_spark.operators.fuzzy import (
    correct_terms,
    fuzzy_match,
    fuzzy_search,
    suggest,
    term_deletes,
)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(
                prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)
            ))
        prev = cur
    return prev[-1]


def test_term_deletes_covers_edit_distance_one():
    """The SymSpell guarantee: ed(a,b) <= 1 ⇒ D1(a) ∩ D1(b) != ∅ —
    exhaustively over a small alphabet (all strings of length <= 4)."""
    import itertools

    words = [
        "".join(w)
        for n in range(1, 5)
        for w in itertools.product("abc", repeat=n)
    ]
    for a in words:
        for b in words:
            share = bool(set(term_deletes(a)) & set(term_deletes(b)))
            if _lev(a, b) <= 1:
                assert share, (a, b)
            # and the verify step kills any over-generation:
            # candidates are only ACCEPTED when levenshtein <= 1


@pytest.fixture(scope="module")
def dictionary(engine_tables):
    rows = (
        engine_tables["lemma_stats"]
        .groupBy("lemma")
        .agg(F.sum("df").alias("df"), F.sum("cf").alias("cf"))
        .collect()
    )
    return {r["lemma"]: (int(r["df"]), int(r["cf"])) for r in rows}


@pytest.fixture(scope="module")
def cutoff(engine_tables):
    from search_engine_spark.functions.scoring import df_cutoff

    n_docs = sum(
        r["n_docs"] for r in engine_tables["doc_stats"].collect()
    )
    return df_cutoff(n_docs)


def _pick_typo(dictionary, cutoff):
    """A (lemma, typo) pair where the typo analyzes to itself, is absent
    from the dictionary, is edit distance 1 from a real lemma, and EVERY
    ed-1 candidate survives the 5% df cutoff (so the corrected query is
    not killed and search tests see results)."""
    usable = sorted(
        (lem for lem, (df, _) in dictionary.items()
         if 3 <= df <= cutoff and len(lem) >= 5),
        key=lambda x: (-dictionary[x][0], x),
    )
    for lemma in usable:
        for typo in (
            lemma[:2] + "q" + lemma[3:],   # substitution
            lemma[:3] + "q" + lemma[3:],   # insertion
        ):
            if typo in dictionary or query_lemmas(typo) != [typo]:
                continue
            cands = [
                lem for lem in dictionary if _lev(lem, typo) <= 1
            ]
            if cands and all(dictionary[c][0] <= cutoff for c in cands):
                return lemma, typo
    raise AssertionError("no usable (lemma, typo) pair in fixture corpus")


def test_fuzzy_match_equals_brute_force(engine_tables, dictionary, cutoff):
    lemma, typo = _pick_typo(dictionary, cutoff)
    got = {
        r["lemma"]: (int(r["df"]), int(r["dist"]))
        for r in fuzzy_match(engine_tables["lemma_stats"], typo).collect()
    }
    brute = {
        lem: (df, _lev(lem, typo))
        for lem, (df, _) in dictionary.items()
        if _lev(lem, typo) <= 1
    }
    assert got == brute
    assert lemma in got and got[lemma][1] == 1


def test_correct_terms(engine_tables, dictionary, cutoff):
    lemma, typo = _pick_typo(dictionary, cutoff)
    ls = engine_tables["lemma_stats"]
    # known terms pass through untouched
    assert correct_terms(ls, [lemma]) == [lemma]
    # the typo resolves to the best (df desc, lemma asc) ed-1 candidate
    cands = sorted(
        ((df, lem) for lem, (df, _) in dictionary.items()
         if _lev(lem, typo) <= 1),
        key=lambda x: (-x[0], x[1]),
    )
    assert correct_terms(ls, [typo]) == [cands[0][1]]
    # hopeless garbage is dropped
    assert correct_terms(ls, ["zzqqzzqqzz"]) == []


def test_fuzzy_search_rank_identical_to_corrected_query(
    engine_tables, dictionary, cutoff
):
    from search_engine_spark.operators.query import bm25_from_terms

    _, typo = _pick_typo(dictionary, cutoff)
    t = engine_tables
    got = fuzzy_search(
        t["postings_flat"], t["lemma_stats"], t["doc_stats"], typo, k=10
    ).collect()
    corrected = correct_terms(t["lemma_stats"], [typo])
    exp = bm25_from_terms(
        t["postings_flat"], t["lemma_stats"], t["doc_stats"], corrected, k=10
    ).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == [
        (r["doc_id"], r["score"]) for r in exp
    ]
    assert got  # the corrected query actually matched documents


def test_suggest_matches_driver_recompute(engine_tables, dictionary):
    prefix = sorted(dictionary)[len(dictionary) // 2][:2]
    got = [
        (r["lemma"], int(r["cf"]))
        for r in suggest(engine_tables["lemma_stats"], prefix, k=5).collect()
    ]
    exp = sorted(
        ((lem, cf) for lem, (_, cf) in dictionary.items()
         if lem.startswith(prefix)),
        key=lambda x: (-x[1], x[0]),
    )[:5]
    assert got == exp


def test_server_fuzzy_and_suggest(spark, base_index_dir, dictionary, cutoff):
    from search_engine_spark.operators.serve import QueryServer

    srv = QueryServer(spark, base_index_dir["index"], cache_blocks=False)
    lemma, typo = _pick_typo(dictionary, cutoff)
    exact = srv.search(lemma, k=10)
    # fuzzy on a clean query is a no-op; on the typo it recovers results
    assert srv.search(lemma, k=10, fuzzy=True) == exact
    fuzzy_hits = srv.search(typo, k=10, fuzzy=True)
    assert fuzzy_hits  # without fuzzy the typo would return nothing
    assert srv.search(typo, k=10) == []
    sugg = srv.suggest(lemma[:3], k=5)
    assert any(t == lemma for t, _ in sugg) or len(sugg) == 5


def test_variant_table_path_identical_and_pushed(
    spark, base_index_dir, dictionary, cutoff, tmp_path
):
    """The persisted (variant, lemma) table (the serving path) must give
    byte-identical candidates to the inline neighborhood generation, and
    the query-variant filter must reach its parquet scan (In(variant)
    in PushedFilters — a row-group-pruned point lookup at scale)."""
    from search_engine_spark.operators.fuzzy import (
        fuzzy_match,
        write_variant_table,
    )

    ls = spark.read.parquet(f"{base_index_dir['index']}/lemma_stats")
    vpath = str(tmp_path / "variants")
    write_variant_table(ls, vpath)
    variants = spark.read.parquet(vpath)
    _, typo = _pick_typo(dictionary, cutoff)
    inline = sorted(map(tuple, fuzzy_match(ls, typo).collect()))
    via_table = sorted(
        map(tuple, fuzzy_match(ls, typo, variants=variants).collect())
    )
    assert via_table == inline and via_table
    plan = (
        fuzzy_match(ls, typo, variants=variants)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "In(variant" in plan


def test_suggest_plan_pushes_prefix_filter(spark, base_index_dir):
    """The prefix filter must reach the parquet scan of the dictionary
    (StartsWith in PushedFilters) and the top-k must be
    TakeOrderedAndProject — no global sort, no window."""
    from search_engine_spark.operators.fuzzy import suggest

    ls = spark.read.parquet(f"{base_index_dir['index']}/lemma_stats")
    plan = suggest(ls, "me", k=5)._jdf.queryExecution().executedPlan().toString()
    assert "StartsWith" in plan
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan