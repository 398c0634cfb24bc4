"""Fuzzy term matching + prefix suggest over the index dictionary.

The reference has no fuzzy/typo path (its query analysis is exact lemma
lookup — SearchServiceImpl.java:190-217); this extends the engine the
same way ``more_like_this`` does, using only public techniques:

- **Fuzzy matching** is SymSpell-style (Wolf Garbe's symmetric-delete
  algorithm, public): for edit distance <= 1, any pair (a, b) with
  ``levenshtein(a, b) <= 1`` shares at least one member of
  ``D1(x) = {x} ∪ {x minus one char}`` (substitution: delete the
  differing position from both; insert/delete: the longer's deletion
  equals the shorter; equality: the strings themselves). Candidate
  generation is therefore an EQUI-JOIN on the delete-variant key —
  the 100-TB shape (hash join / pushed IN filter on a precomputable
  variant table) — instead of a ``levenshtein`` scan of the whole
  dictionary per query. Candidates are then verified with a native
  ``levenshtein <= 1`` filter, so the result set EQUALS the brute-force
  scan exactly; the DuckDB contract twin (``fuzzy_match``) IS that
  brute-force scan.
- **Prefix suggest** ranks dictionary completions of a prefix by
  collection frequency: a ``startswith`` filter (pushed to the parquet
  scan of lemma_stats) → one small agg over scopes →
  TakeOrderedAndProject. No UDFs anywhere in this module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_FUZZY_CANDIDATES = 64  # safety rail on pathological short terms


def term_deletes(term: str) -> list[str]:
    """D1(term): the term itself plus every single-character deletion
    (deduped, sorted — driver-side, |term|+1 strings)."""
    return sorted({term} | {term[:i] + term[i + 1:] for i in range(len(term))})


# native deletion-neighborhood: {t} ∪ one-char deletions, deduped.
# substring(t, 1, i-1) || substring(t, i+1) deletes position i (1-based).
_DELETES_SQL = (
    "array_distinct(concat(array({col}), "
    "transform(sequence(1, length({col})), "
    "i -> concat(substring({col}, 1, i - 1), substring({col}, i + 1)))))"
)


def lemma_variants(lemmas: DataFrame, col: str = "lemma") -> DataFrame:
    """(variant, {col}): the deletion-neighborhood index of a dictionary.
    Row inflation is (len+1) per term — bounded by max lemma length, not
    corpus size. At scale this table is computed ONCE per index build,
    persisted bucketed by ``variant``, and refreshed on upsert; queries
    then hit it with a pushed ``variant IN (...)`` filter."""
    return lemmas.select(
        F.explode(F.expr(_DELETES_SQL.format(col=col))).alias("variant"),
        F.col(col),
    )


def write_variant_table(lemma_stats: DataFrame, path: str) -> None:
    """Materialize the deletion-neighborhood index once per index epoch:
    (variant, lemma) range-partitioned AND sorted by ``variant`` so the
    per-query ``variant IN (...)`` filter prunes to 1-2 files via
    parquet min/max stats instead of scanning the whole table. Rows are
    already unique — ``array_distinct`` dedupes within a lemma and the
    lemma differs across rows. Variants are scope-independent (scoped
    df is joined back at query time)."""
    (
        lemma_variants(lemma_stats.select("lemma").distinct())
        .repartitionByRange(F.col("variant"))
        .sortWithinPartitions("variant")
        .write.mode("overwrite")
        .parquet(path)
    )


def fuzzy_match(
    lemma_stats: DataFrame,
    term: str,
    scope: str | None = None,
    max_candidates: int = MAX_FUZZY_CANDIDATES,
    variants: DataFrame | None = None,
) -> DataFrame:
    """Dictionary lemmas within edit distance 1 of ``term`` →
    DataFrame(lemma, df, dist), ranked (df desc, lemma asc).

    Plan: pushed ``variant IN D1(term)`` filter on the variant table
    (a persisted parquet via ``write_variant_table`` when ``variants``
    is given — row-group-pruned point lookup, the serving path — else
    generated inline from the dictionary) → ``levenshtein <= 1`` verify
    on the few survivors → join scoped df → TakeOrderedAndProject.
    The IN list is |term|+1 strings computed driver-side."""
    ls = lemma_stats
    if scope is not None:
        ls = ls.filter(F.col("scope") == scope)
    dic = ls.groupBy("lemma").agg(F.sum("df").alias("df"))
    qvars = term_deletes(term)
    var_src = (
        variants if variants is not None
        else lemma_variants(dic.select("lemma"))
    )
    cand = (
        var_src.filter(F.col("variant").isin(qvars))
        .select("lemma")
        .distinct()
    )
    return (
        dic.join(cand, "lemma")
        .withColumn("dist", F.levenshtein(F.col("lemma"), F.lit(term)))
        .filter(F.col("dist") <= 1)
        .orderBy(F.desc("df"), F.asc("lemma"))
        .limit(max_candidates)
        .select("lemma", "df", "dist")
    )


def correct_terms(
    lemma_stats: DataFrame,
    terms: list[str],
    scope: str | None = None,
    variants: DataFrame | None = None,
) -> list[str]:
    """Spell-correct analyzed query lemmas against the dictionary:
    a term present in the dictionary (df > 0 in scope) passes through;
    an absent term is replaced by its best edit-distance-1 candidate
    (df desc, lemma asc — the SymSpell ranking); a term with no
    candidate is dropped. Driver-side: one ≤|terms|-row dictionary
    lookup plus one small candidate query per UNKNOWN term (typos are
    the rare case), each the broadcast-stats analog."""
    ls = lemma_stats
    if scope is not None:
        ls = ls.filter(F.col("scope") == scope)
    known = {
        r["lemma"]
        for r in ls.filter(F.col("lemma").isin(terms))
        .select("lemma")
        .distinct()
        .collect()
    }
    out: list[str] = []
    for t in terms:
        if t in known:
            out.append(t)
            continue
        best = fuzzy_match(
            lemma_stats, t, scope=scope, variants=variants
        ).head(1)
        if best:
            out.append(best[0]["lemma"])
    return sorted(set(out))


def fuzzy_search(
    postings_flat: DataFrame,
    lemma_stats: DataFrame,
    doc_stats: DataFrame,
    query: str,
    scope: str | None = None,
    k: int = 10,
    offset: int = 0,
    combine: str = "and",
) -> DataFrame:
    """``bm25_search`` with typo tolerance: analyzed query lemmas absent
    from the dictionary are spell-corrected (edit distance 1) before the
    standard pinned-semantics BM25 plan runs. A query whose terms all
    exist is EXACTLY ``bm25_search`` (same plan, same floats)."""
    from search_engine_spark.functions.analyze import query_lemmas
    from search_engine_spark.operators.query import _empty, bm25_from_terms

    terms = query_lemmas(query)
    if not terms:
        return _empty(postings_flat.sparkSession)
    corrected = correct_terms(lemma_stats, terms, scope)
    if not corrected:
        return _empty(postings_flat.sparkSession)
    return bm25_from_terms(
        postings_flat, lemma_stats, doc_stats, corrected,
        scope=scope, k=k, offset=offset, combine=combine,
    )


def suggest(
    lemma_stats: DataFrame,
    prefix: str,
    k: int = 10,
    scope: str | None = None,
) -> DataFrame:
    """Prefix completions → DataFrame(lemma, cf), ranked (cf desc,
    lemma asc), top-k. ``startswith`` compiles to a pushed
    ``StringStartsWith`` filter on the lemma_stats scan; the agg input
    is only the matching dictionary slice; top-k is
    TakeOrderedAndProject — no window, no full sort."""
    ls = lemma_stats.filter(F.col("lemma").startswith(prefix))
    if scope is not None:
        ls = ls.filter(F.col("scope") == scope)
    return (
        ls.groupBy("lemma")
        .agg(F.sum("cf").alias("cf"))
        .orderBy(F.desc("cf"), F.asc("lemma"))
        .limit(k)
    )
