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


def test_term_deletes_covers_edit_distance_two():
    """Depth-2 guarantee: ed(a,b) <= 2 ⇒ D2(a) ∩ D2(b) != ∅ —
    exhaustively over all strings of length <= 4 on {a,b,c}. This is
    the recall property the fuzzy_match2 contract twin rests on (the
    levenshtein <= 2 verify step provides the matching precision)."""
    import itertools

    words = [
        "".join(w)
        for n in range(1, 5)
        for w in itertools.product("abc", repeat=n)
    ]
    d2 = {w: set(term_deletes(w, max_dist=2)) for w in words}
    for a in words:
        for b in words:
            if _lev(a, b) <= 2:
                assert d2[a] & d2[b], (a, b)


def test_term_deletes_depth_matches_sql_expression(spark):
    """The driver-side ``term_deletes`` and the native SQL expression
    used for the dictionary side must generate the SAME neighborhood
    (sorted-set equality) at both depths — otherwise query variants and
    table variants could disagree and drop candidates."""
    from pyspark.sql import functions as F

    from search_engine_spark.operators.fuzzy import lemma_variants

    words = ["merge", "ab", "a", "stream", "xx"]
    df = spark.createDataFrame([(w,) for w in words], ["lemma"])
    for dist in (1, 2):
        got = {
            w: set()
            for w in words
        }
        for r in lemma_variants(df, max_dist=dist).collect():
            got[r["lemma"]].add(r["variant"])
        for w in words:
            assert got[w] == set(term_deletes(w, max_dist=dist)), (w, dist)


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


def _pick_typo2(dictionary, cutoff):
    """A (lemma, typo2) pair at exactly edit distance 2: typo2 analyzes
    to itself, is absent from the dictionary, and is NOT within distance
    1 of any dictionary term (so max_dist=1 correction finds nothing and
    max_dist=2 is what recovers it)."""
    lemma, _ = _pick_typo(dictionary, cutoff)
    base = sorted(
        (lem for lem, (df, _) in dictionary.items()
         if 3 <= df <= cutoff and len(lem) >= 6),
        key=lambda x: (-dictionary[x][0], x),
    ) or [lemma]
    for lem in base:
        for typo2 in (
            lem[:2] + "qq" + lem[4:],          # two substitutions
            lem[:2] + "q" + lem[3:5] + "q" + lem[6:],  # spread subs
        ):
            if typo2 in dictionary or query_lemmas(typo2) != [typo2]:
                continue
            if _lev(lem, typo2) != 2:
                continue
            if any(_lev(d, typo2) <= 1 for d in dictionary):
                continue
            return lem, typo2
    raise AssertionError("no usable (lemma, typo2) pair in fixture corpus")


def test_fuzzy_match2_equals_brute_force(engine_tables, dictionary, cutoff):
    """Engine candidates at max_dist=2 == driver brute-force levenshtein
    scan, in the pinned (dist asc, df desc, lemma asc) order."""
    _, typo2 = _pick_typo2(dictionary, cutoff)
    got = [
        (r["lemma"], int(r["df"]), int(r["dist"]))
        for r in fuzzy_match(
            engine_tables["lemma_stats"], typo2, max_dist=2
        ).collect()
    ]
    brute = sorted(
        (
            (lem, df, _lev(lem, typo2))
            for lem, (df, _) in dictionary.items()
            if _lev(lem, typo2) <= 2
        ),
        key=lambda x: (x[2], -x[1], x[0]),
    )[:64]
    assert got == brute
    assert got, "typo2 must have at least one distance-2 candidate"


def test_correct_terms_depth2(engine_tables, dictionary, cutoff):
    """max_dist=2 recovers a 2-edit typo that max_dist=1 drops, and a
    distance-1 candidate always outranks distance-2 ones."""
    ls = engine_tables["lemma_stats"]
    _, typo = _pick_typo(dictionary, cutoff)
    _, typo2 = _pick_typo2(dictionary, cutoff)
    # depth-1 correction unchanged when run at depth 2: dist sorts first,
    # and within dist==1 the (df desc, lemma asc) ranking is the same —
    # unless an exact-distance-1 candidate is outranked by nothing.
    best_d2 = sorted(
        ((_lev(lem, typo), -df, lem) for lem, (df, _) in dictionary.items()
         if _lev(lem, typo) <= 2),
        key=lambda x: x,
    )[0][2]
    assert correct_terms(ls, [typo], max_dist=2) == [best_d2]
    # the 2-edit typo: dropped at depth 1, recovered at depth 2
    assert correct_terms(ls, [typo2]) == []
    expect2 = sorted(
        ((_lev(lem, typo2), -df, lem) for lem, (df, _) in dictionary.items()
         if _lev(lem, typo2) <= 2),
        key=lambda x: x,
    )[0][2]
    assert correct_terms(ls, [typo2], max_dist=2) == [expect2]


def test_variant_table_depth2_parity(
    spark, base_index_dir, dictionary, cutoff, tmp_path
):
    """The persisted depth-2 variant table gives byte-identical
    candidates to inline depth-2 generation (the serving path)."""
    from search_engine_spark.operators.fuzzy import (
        fuzzy_match,
        write_variant_table,
    )

    ls = spark.read.parquet(f"{base_index_dir['index']}/lemma_stats")
    vpath = str(tmp_path / "variants_d2")
    write_variant_table(ls, vpath, max_dist=2)
    variants = spark.read.parquet(vpath)
    _, typo2 = _pick_typo2(dictionary, cutoff)
    inline = [
        tuple(r)
        for r in fuzzy_match(ls, typo2, max_dist=2).collect()
    ]
    via_table = [
        tuple(r)
        for r in fuzzy_match(
            ls, typo2, variants=variants, max_dist=2
        ).collect()
    ]
    assert via_table == inline and via_table


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