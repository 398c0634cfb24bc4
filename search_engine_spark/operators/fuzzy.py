"""Fuzzy term matching + prefix suggest over the index dictionary.

The reference has no fuzzy/typo path (its query analysis is exact lemma
lookup — SearchServiceImpl.java:190-217); this extends the engine the
same way ``more_like_this`` does, using only public techniques:

- **Fuzzy matching** is SymSpell-style (Wolf Garbe's symmetric-delete
  algorithm, public): for edit distance <= d, any pair (a, b) with
  ``levenshtein(a, b) <= d`` shares at least one member of
  ``Dd(x) = {x} ∪ {x minus up to d chars}`` (substitution: delete the
  differing position from both; insert/delete: the longer's deletion
  equals the shorter; equality: the strings themselves — and depth-2
  composes two such steps). Candidate generation is therefore an
  EQUI-JOIN on the delete-variant key — the 100-TB shape (hash join /
  pushed IN filter on a precomputable variant table) — instead of a
  ``levenshtein`` scan of the whole dictionary per query. Candidates
  are then verified with a native ``levenshtein <= d`` filter, so the
  result set EQUALS the brute-force scan exactly; the DuckDB contract
  twins (``fuzzy_match`` for d=1, ``fuzzy_match2`` for d=2) ARE that
  brute-force scan. d=2 is opt-in: the variant table grows from
  ~(len+1) to ~(len²/2) rows per term and candidate buckets get
  hotter, so serving indexes persist the depth the deployment needs.
- **Prefix suggest** ranks dictionary completions of a prefix by
  collection frequency: a ``startswith`` filter (pushed to the parquet
  scan of lemma_stats) → one small agg over scopes →
  TakeOrderedAndProject. No UDFs anywhere in this module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_FUZZY_CANDIDATES = 64  # safety rail on pathological short terms


def term_deletes(term: str, max_dist: int = 1) -> list[str]:
    """D_max_dist(term): the term plus every deletion of up to
    ``max_dist`` characters (deduped, sorted — driver-side; |term|+1
    strings at depth 1, ~len²/2 at depth 2)."""
    out = {term}
    frontier = {term}
    for _ in range(max_dist):
        frontier = {
            w[:i] + w[i + 1:] for w in frontier for i in range(len(w))
        }
        out |= frontier
    return sorted(out)


# native deletion-neighborhood: {t} ∪ one-char deletions, deduped.
# substring(t, 1, i-1) || substring(t, i+1) deletes position i (1-based).
_DELETES_SQL = (
    "array_distinct(concat(array({col}), "
    "transform(sequence(1, length({col})), "
    "i -> concat(substring({col}, 1, i - 1), substring({col}, i + 1)))))"
)

# depth-2 = D1 composed with itself: D1 contains the identity, so
# flatten(transform(D1(t), x -> D1(x))) is exactly {deletions of 0, 1
# or 2 chars} — no separate pair enumeration (and no descending-
# sequence edge case for short terms).
_DELETES2_SQL = (
    "array_distinct(flatten(transform(" + _DELETES_SQL + ", "
    "x -> " + _DELETES_SQL.format(col="x") + ")))"
)


def _deletes_sql(col: str, max_dist: int) -> str:
    if max_dist == 1:
        return _DELETES_SQL.format(col=col)
    if max_dist == 2:
        return _DELETES2_SQL.format(col=col)
    raise ValueError(f"max_dist must be 1 or 2, got {max_dist}")


def lemma_variants(
    lemmas: DataFrame, col: str = "lemma", max_dist: int = 1
) -> DataFrame:
    """(variant, {col}): the deletion-neighborhood index of a dictionary.
    Row inflation is (len+1) per term at depth 1, ~len²/2 at depth 2 —
    bounded by max lemma length, not corpus size. At scale this table is
    computed ONCE per index build, persisted bucketed by ``variant``,
    and refreshed on upsert; queries then hit it with a pushed
    ``variant IN (...)`` filter."""
    return lemmas.select(
        F.explode(F.expr(_deletes_sql(col, max_dist))).alias("variant"),
        F.col(col),
    )


def write_variant_table(
    lemma_stats: DataFrame, path: str, max_dist: int = 1
) -> None:
    """Materialize the deletion-neighborhood index once per index epoch:
    (variant, lemma) range-partitioned AND sorted by ``variant`` so the
    per-query ``variant IN (...)`` filter prunes to 1-2 files via
    parquet min/max stats instead of scanning the whole table. Rows are
    already unique — ``array_distinct`` dedupes within a lemma and the
    lemma differs across rows. Variants are scope-independent (scoped
    df is joined back at query time). ``max_dist=2`` persists the
    depth-2 neighborhood (~len²/2 rows per term) for edit-distance-2
    serving."""
    (
        lemma_variants(
            lemma_stats.select("lemma").distinct(), max_dist=max_dist
        )
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
    max_dist: int = 1,
) -> DataFrame:
    """Dictionary lemmas within edit distance ``max_dist`` of ``term`` →
    DataFrame(lemma, df, dist). Ranking is pinned per depth: at
    ``max_dist=1`` all matches are equally close, so (df desc, lemma
    asc); at ``max_dist=2`` a near miss must beat a frequent-but-far
    term, so (dist asc, df desc, lemma asc). Both orders are total —
    the LIMIT cut is deterministic and mirrored in the DuckDB twins.

    Plan: pushed ``variant IN D(term)`` filter on the variant table
    (a persisted parquet via ``write_variant_table`` when ``variants``
    is given — row-group-pruned point lookup, the serving path; it must
    have been written with at least this ``max_dist`` or candidates are
    silently missed — else generated inline from the dictionary) →
    ``levenshtein <= max_dist`` verify on the few survivors → join
    scoped df → TakeOrderedAndProject. The IN list (≤ |term|+1 strings
    at depth 1, ~len²/2 at depth 2) is computed driver-side."""
    ls = lemma_stats
    if scope is not None:
        ls = ls.filter(F.col("scope") == scope)
    dic = ls.groupBy("lemma").agg(F.sum("df").alias("df"))
    qvars = term_deletes(term, max_dist)
    var_src = (
        variants if variants is not None
        else lemma_variants(dic.select("lemma"), max_dist=max_dist)
    )
    cand = (
        var_src.filter(F.col("variant").isin(qvars))
        .select("lemma")
        .distinct()
    )
    order = (
        [F.desc("df"), F.asc("lemma")]
        if max_dist <= 1
        else [F.asc("dist"), F.desc("df"), F.asc("lemma")]
    )
    return (
        dic.join(cand, "lemma")
        .withColumn("dist", F.levenshtein(F.col("lemma"), F.lit(term)))
        .filter(F.col("dist") <= max_dist)
        .orderBy(*order)
        .limit(max_candidates)
        .select("lemma", "df", "dist")
    )


def correct_terms(
    lemma_stats: DataFrame,
    terms: list[str],
    scope: str | None = None,
    variants: DataFrame | None = None,
    max_dist: int = 1,
) -> list[str]:
    """Spell-correct analyzed query lemmas against the dictionary:
    a term present in the dictionary (df > 0 in scope) passes through;
    an absent term is replaced by its best edit-distance-``max_dist``
    candidate (the pinned ``fuzzy_match`` ranking — at depth 2 a
    distance-1 correction always beats a distance-2 one); a term with
    no candidate is dropped. Driver-side: one ≤|terms|-row dictionary
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
            lemma_stats, t, scope=scope, variants=variants,
            max_dist=max_dist,
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
    max_dist: int = 1,
) -> DataFrame:
    """``bm25_search`` with typo tolerance: analyzed query lemmas absent
    from the dictionary are spell-corrected (edit distance ``max_dist``)
    before the standard pinned-semantics BM25 plan runs. A query whose
    terms all exist is EXACTLY ``bm25_search`` (same plan, same floats)."""
    from search_engine_spark.functions.analyze import query_lemmas
    from search_engine_spark.operators.query import _empty, bm25_from_terms

    terms = query_lemmas(query)
    if not terms:
        return _empty(postings_flat.sparkSession)
    corrected = correct_terms(lemma_stats, terms, scope, max_dist=max_dist)
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


WILDCARD_MAX_EXPANSIONS = 8  # Lucene-PrefixQuery-style bounded rewrite


def expand_prefix(
    lemma_stats: DataFrame,
    prefix: str,
    scope: str | None = None,
    k: int = WILDCARD_MAX_EXPANSIONS,
) -> list[str]:
    """Wildcard rewrite (the ``term*`` query syntax): the top-k
    dictionary lemmas completing ``prefix``, ranked (cf desc, lemma
    asc) — exactly ``suggest``'s pinned ranking, so the expansion set
    is deterministic and bounded (the public Lucene top-terms rewrite
    for PrefixQuery). Driver-side ≤ k-row collect, the broadcast-stats
    analog; the dictionary scan is a pushed StringStartsWith +
    TakeOrderedAndProject (see ``suggest``). The expanded lemmas then
    run through the standard pinned OR plans — an unbounded wildcard
    never reaches the posting lists."""
    return [
        r["lemma"] for r in suggest(lemma_stats, prefix, k=k, scope=scope).collect()
    ]
