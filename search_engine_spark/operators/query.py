"""Query path: exact BM25 (and legacy reftf) over flat postings.

Spark lifecycle (SURVEY.md §3.1): query string → driver-side analysis →
bind against (tiny, collected) stats → df-cutoff prune → postings scan
pruned to query lemmas via an ``IN`` predicate (pushed into the parquet
scan) → native hash-agg conjunction + scoring → TakeOrderedAndProject.

Float determinism (SURVEY.md §4 item 6): per-term scores are aggregated
into SEPARATE columns (one agg per query term — at most one posting per
(doc, term), so no reordered float additions), then summed left-to-right
in lexicographic term order — bit-identical to the oracle's accumulation.
idf is computed driver-side with the same libm ``math.log``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from search_engine_spark import BM25_B, BM25_K1
from search_engine_spark.functions.analyze import query_lemmas
from search_engine_spark.functions.scoring import (
    bm25_idf,
    df_cutoff,
    query_killed_by_cutoff,
)
from search_engine_spark.schemas import SEARCH_RESULT


def _empty(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([], SEARCH_RESULT)


def _scope_stats(doc_stats: DataFrame, scope: str | None) -> tuple[int, float]:
    """(n_docs, avg_doc_len) for the scope, or global. doc_stats has one
    row per scope (4 here) — a driver collect, the broadcast-stats analog."""
    rows = doc_stats.collect()
    if scope is not None:
        rows = [r for r in rows if r["scope"] == scope]
    n = sum(r["n_docs"] for r in rows)
    if n == 0:
        return 0, 0.0
    total_len = sum(r["sum_doc_len"] for r in rows)
    return n, total_len / n


def _term_dfs(
    lemma_stats: DataFrame, terms: list[str], scope: str | None
) -> dict[str, int]:
    """Per-term document frequency in scope (J1 — the dictionary lookup;
    the filtered side is ≤ |terms| × |scopes| rows)."""
    ls = lemma_stats.filter(F.col("lemma").isin(terms))
    if scope is not None:
        ls = ls.filter(F.col("scope") == scope)
    agg = ls.groupBy("lemma").agg(F.sum("df").alias("df")).collect()
    found = {r["lemma"]: int(r["df"]) for r in agg}
    return {t: found.get(t, 0) for t in terms}


def _candidates(
    postings_flat: DataFrame, terms: list[str], scope: str | None
) -> DataFrame:
    """Postings of the query terms — the ``IN`` filter reaches the parquet
    scan as a pushed filter (partition/file pruning once postings are
    bucketed by lemma). Reference analog J2 (posting-list fetch)."""
    cand = postings_flat.filter(F.col("lemma").isin(terms))
    if scope is not None:
        cand = cand.filter(F.col("scope") == scope)
    return cand


def _paginate(scored: DataFrame, k: int, offset: int) -> DataFrame:
    """orderBy + offset + limit → one TakeOrderedAndProject(limit=offset+k,
    offset=offset): per-partition top-(offset+k), k-row global merge, no
    window anywhere (O2, SearchServiceImpl.java:359-364)."""
    top = scored.orderBy(F.desc("score"), F.asc("doc_id"))
    if offset > 0:
        top = top.offset(offset)
    return top.limit(k).select("doc_id", "score")


def bm25_search(
    postings_flat: DataFrame,
    lemma_stats: DataFrame,
    doc_stats: DataFrame,
    query: str,
    scope: str | None = None,
    k: int = 10,
    offset: int = 0,
    combine: str = "and",
    exclude_terms: list[str] | None = None,
    filters: dict | None = None,
    filter_postings_flat: DataFrame | None = None,
) -> DataFrame:
    """Top-k BM25 → DataFrame(doc_id, score), pinned semantics
    (oracle.search is the twin). ``combine``: "and" = conjunction with the
    whole-query cutoff kill; "or" = disjunction with per-term cutoff DROP
    (see oracle.search docstring). ``exclude_terms``: analyzed lemmas
    whose docs drop from the candidates before top-k (``-term`` syntax;
    oracle.search ``exclude`` is the twin). ``filters`` +
    ``filter_postings_flat``: attribute restriction (operators/filters.py
    semantics; the flat analog of the blocks path's filter postings)."""
    terms = query_lemmas(query)
    if not terms:
        return _empty(postings_flat.sparkSession)
    return bm25_from_terms(
        postings_flat, lemma_stats, doc_stats, terms,
        scope=scope, k=k, offset=offset, combine=combine,
        exclude_terms=exclude_terms, filters=filters,
        filter_postings_flat=filter_postings_flat,
    )


def bm25_from_terms(
    postings_flat: DataFrame,
    lemma_stats: DataFrame,
    doc_stats: DataFrame,
    terms: list[str],
    *,
    scope: str | None = None,
    k: int = 10,
    offset: int = 0,
    combine: str = "and",
    exclude_doc_id: int | None = None,
    exclude_terms: list[str] | None = None,
    filters: dict | None = None,
    filter_postings_flat: DataFrame | None = None,
) -> DataFrame:
    """Terms-based core of ``bm25_search`` (callers pass pre-analyzed
    lemmas — the query path via ``query_lemmas``, more-like-this via the
    source doc's interesting terms). Terms are deduped and sorted here so
    the per-term float accumulation order stays pinned regardless of
    caller.

    ``exclude_terms`` (the ``-term`` query syntax): docs holding ANY
    excluded lemma leave the candidate set BEFORE the top-k cut — a
    left-anti join on the excluded lemmas' postings (pushed ``IN``
    scan, same shape as the positive fetch). Pinned: gates see positive
    terms only; positive ∩ excluded → empty; no cutoff on exclusions."""
    from search_engine_spark.operators.filters import filter_groups

    spark = postings_flat.sparkSession
    terms = sorted(set(terms))
    if not terms:
        return _empty(spark)
    excl = sorted(set(exclude_terms or []))
    if excl and set(excl) & set(terms):
        return _empty(spark)
    groups = filter_groups(filters)
    if groups and filter_postings_flat is None:
        raise ValueError(
            "filters=... needs the flat filter postings "
            "(operators/filters.build_filter_flat)"
        )
    n_docs, avg_len = _scope_stats(doc_stats, scope)
    if n_docs == 0:
        return _empty(spark)
    dfs = _term_dfs(lemma_stats, terms, scope)
    if combine == "or":
        cutoff = df_cutoff(n_docs)
        terms = [t for t in terms if dfs[t] <= cutoff]
        if not terms:
            return _empty(spark)
    elif query_killed_by_cutoff(list(dfs.values()), n_docs):
        return _empty(spark)

    cand = _candidates(postings_flat, terms, scope)
    if exclude_doc_id is not None:
        cand = cand.filter(F.col("doc_id") != int(exclude_doc_id))
    tf = F.col("tf").cast("double")
    dl = F.col("doc_len").cast("double")
    # norm written EXACTLY like scoring.bm25_term_score:
    # k1 * (1.0 - b + b * doc_len / avg_doc_len)
    norm = F.lit(BM25_K1) * (
        F.lit(1.0 - BM25_B) + F.lit(BM25_B) * dl / F.lit(avg_len)
    )
    aggs = []
    for i, t in enumerate(terms):  # lexicographic (query_lemmas sorts)
        idf = bm25_idf(dfs[t], n_docs)
        per_term = F.lit(idf) * tf * F.lit(BM25_K1 + 1.0) / (tf + norm)
        aggs.append(
            F.max(F.when(F.col("lemma") == t, per_term)).alias(f"_s{i}")
        )
    aggs.append(F.count("*").alias("_nmatch"))
    grouped = cand.groupBy("doc_id").agg(*aggs)
    if combine == "and":
        grouped = grouped.filter(F.col("_nmatch") == len(terms))
    total = F.lit(0.0)
    for i in range(len(terms)):  # left-to-right, matches oracle's += order
        # missing term → +0.0, exact in IEEE for the positive partials
        term_col = F.col(f"_s{i}")
        total = total + (
            F.coalesce(term_col, F.lit(0.0)) if combine == "or" else term_col
        )
    scored = grouped.select("doc_id", total.alias("score"))
    if excl:
        ex = postings_flat.filter(F.col("lemma").isin(excl))
        if scope is not None:
            ex = ex.filter(F.col("scope") == scope)
        scored = scored.join(
            ex.select("doc_id").distinct(), "doc_id", "left_anti"
        )
    for g in groups:
        # one semi-join per filtered column: the group's values OR via
        # the pushed ``IN (lemma)`` scan, columns AND by stacking joins
        # (same slot as exclusion — after gates, before the top-k cut)
        fp = filter_postings_flat.filter(F.col("lemma").isin(list(g)))
        if scope is not None:
            fp = fp.filter(F.col("scope") == scope)
        scored = scored.join(
            fp.select("doc_id").distinct(), "doc_id", "left_semi"
        )
    return _paginate(scored, k, offset)


def reftf_search(
    postings_flat: DataFrame,
    lemma_stats: DataFrame,
    doc_stats: DataFrame,
    query: str,
    scope: str | None = None,
    k: int = 10,
    offset: int = 0,
) -> DataFrame:
    """The reference's legacy relevance, kept as a second scorer mode:
    absolute = Σtf / max tf per doc (SearchServiceImpl.java:335-357),
    normalized by the global max absolute (SearchServiceImpl.java:233-244)."""
    spark = postings_flat.sparkSession
    terms = query_lemmas(query)
    if not terms:
        return _empty(spark)
    n_docs, _ = _scope_stats(doc_stats, scope)
    if n_docs == 0:
        return _empty(spark)
    dfs = _term_dfs(lemma_stats, terms, scope)
    if query_killed_by_cutoff(list(dfs.values()), n_docs):
        return _empty(spark)

    cand = _candidates(postings_flat, terms, scope)
    grouped = (
        cand.groupBy("doc_id")
        .agg(
            F.sum(F.col("tf").cast("double")).alias("_sum_tf"),
            F.max(F.col("tf").cast("double")).alias("_max_tf"),
            F.count("*").alias("_nmatch"),
        )
        .filter(F.col("_nmatch") == len(terms))
        .select("doc_id", (F.col("_sum_tf") / F.col("_max_tf")).alias("_abs"))
    )
    mx = grouped.agg(F.max("_abs").alias("_gmax"))
    scored = grouped.crossJoin(F.broadcast(mx)).select(
        "doc_id", (F.col("_abs") / F.col("_gmax")).alias("score")
    )
    return _paginate(scored, k, offset)


MLT_MAX_TERMS = 25


def more_like_this(
    docs: DataFrame,
    postings_flat: DataFrame,
    lemma_stats: DataFrame,
    doc_stats: DataFrame,
    doc_id: int,
    scope: str | None = None,
    k: int = 10,
    max_terms: int = MLT_MAX_TERMS,
) -> DataFrame:
    """Related-document search, the Lucene MoreLikeThis analog re-pinned
    to this engine's semantics (oracle.more_like_this is the twin):

    1. interesting terms = the source doc's ``max_terms`` RAREST lemmas
       (df asc, lemma asc — rarest-first mirrors O3), df from the
       dictionary, terms absent from the scope dropped;
    2. those terms run as a disjunctive (OR) BM25 query — per-term
       cutoff drop, pinned lexicographic accumulation — with the source
       doc excluded from candidates.

    Driver work is one point-lookup on docs (pushed ``doc_id =`` filter)
    plus the ≤|lemmas|-row dictionary collect; the scored plan is the
    standard OR plan (pushed ``IN`` scan → one hash-agg →
    TakeOrderedAndProject), so scale behavior equals a |max_terms|-term
    query, independent of corpus size."""
    spark = postings_flat.sparkSession
    row = (
        docs.filter(F.col("doc_id") == int(doc_id))
        .select("lemma_counts")
        .head()
    )
    if row is None or not row["lemma_counts"]:
        return _empty(spark)
    lemmas = sorted({x["lemma"] for x in row["lemma_counts"]})
    dfs = _term_dfs(lemma_stats, lemmas, scope)
    ranked = sorted((dfs[t], t) for t in lemmas if dfs[t] > 0)
    terms = [t for _, t in ranked[:max_terms]]
    if not terms:
        return _empty(spark)
    return bm25_from_terms(
        postings_flat, lemma_stats, doc_stats, terms,
        scope=scope, k=k, combine="or", exclude_doc_id=doc_id,
    )


# calendar facet names derived from docs.ts (UTC session timezone —
# sources/session.py pins it; same calendar the date FILTER family uses,
# operators/filters.py). Requested as plain facet_cols entries; a real
# docs column of the same name would win, but docs has none of these.
CALENDAR_FACETS = {"day": "yyyy-MM-dd", "month": "yyyy-MM", "year": "yyyy"}


def facet_counts(
    results: DataFrame, docs: DataFrame, facet_cols: list[str]
) -> DataFrame:
    """Search-UI facets: per-value doc counts over a result set. The
    results side is ≤ k rows (a top-k output), so it broadcasts (J4's
    pattern) and the agg groups at most k rows — no shuffle of docs.

    ``facet_cols`` entries may be docs columns (scope, role, tool, ...)
    or the derived calendar names ``day``/``month``/``year``
    (``date_format(ts)``, the date-histogram facet) — derivation happens
    AFTER the broadcast-join cut, so the format runs on ≤ k rows."""
    exprs = [
        F.date_format("ts", CALENDAR_FACETS[c]).alias(c)
        if c in CALENDAR_FACETS and c not in docs.columns
        else F.col(c)
        for c in facet_cols
    ]
    return (
        docs.join(F.broadcast(results.select("doc_id")), "doc_id")
        .select(*exprs)
        .groupBy(*facet_cols)
        .agg(F.count("*").alias("n_docs"))
    )


def collapse_results(
    results: DataFrame,
    docs: DataFrame,
    key_col: str,
    per_key: int = 1,
) -> DataFrame:
    """Field collapsing (the Elasticsearch ``collapse`` analog): keep at
    most ``per_key`` results per value of a docs column — for transcript
    search, ``collapse_results(res, docs, "conv_id")`` returns one hit
    per conversation. The survivors keep the pinned global order
    (score desc, doc_id asc); within a key the same order picks the
    keepers.

    The operator is EXACT over the rows it is given; depth policy is the
    caller's (``SearchEngine.search(collapse=...)`` collapses its deep
    page — pinned, mirrored by the tests' oracle composition).

    Scale shape: ``results`` is a top-k/deep page (≤ thousands of rows),
    so the docs join broadcasts the RESULT side (docs is never shuffled)
    and the window partitions by the collapse key — never a
    single-partition window."""
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.desc("score"), F.asc("doc_id"))
    )
    return (
        docs.select("doc_id", key_col)
        .join(F.broadcast(results), "doc_id")
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= per_key)
        .select("doc_id", "score", key_col)
        .orderBy(F.desc("score"), F.asc("doc_id"))
    )


def materialize_results(results: DataFrame, docs: DataFrame) -> DataFrame:
    """J4 — join the k-row result back to docs for presentation, grouped
    by conversation with stable turn ordering (north rule). Broadcasts
    the tiny result side."""
    return (
        docs.join(F.broadcast(results), "doc_id")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .select(
            "doc_id", "conv_id", "turn_idx", "role", "scope", "score", "text"
        )
    )
