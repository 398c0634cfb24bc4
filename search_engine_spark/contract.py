"""Driver-contract queries: Spark DataFrame implementations + DuckDB twins.

Every SQL-expressible operator from SURVEY.md §2 (and the training-data
pipeline operators: dedup, similarity search, text analysis) is registered
here as a (spark_fn, duckdb_sql) pair over the driver's parquet tables
(documents / embeddings / events / lineitem / ...). The driver compares
row-count + schema + order-insensitive value-hash at sf=0.01.

Determinism rules used throughout:
- contract tokenization is NATIVE regex (``[a-z0-9]+`` on lower(text)) so
  both engines tokenize identically (the pandas-UDF lemmatizer is pytest-
  verified against the oracle instead — SURVEY.md §5 item 4);
- every float column is round(x, 6) on BOTH sides; float folds use
  explicit left-to-right accumulation (Spark ``aggregate`` / DuckDB
  ``list_reduce``);
- all hash math is md5-based (identical hex in both engines) reduced to
  int64 with identical modular arithmetic;
- every aggregate/computed column is aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# pinned constants
# ---------------------------------------------------------------------------

TOKS_SQL = "regexp_extract_all(lower(text), '[a-z0-9]+', 0)"          # Spark
TOKS_DUCK = "regexp_extract_all(lower(text), '[a-z0-9]+')"            # DuckDB

CONJ_TERMS = ["batch", "dup", "scan"]
SUMTF_TERMS = ["dup", "key", "window"]
BM25_TERMS = ["dup", "merge"]
BM25_K1, BM25_B = 1.2, 0.75
CUTOFF_TERMS = ["batch", "dup", "merge", "the"]

HASH_MOD = 1_000_000_007
N_MINHASH = 16
N_BANDS = 4  # 4 rows per band
JACCARD_THRESHOLD = 0.8
N_PLANES = 8  # hyperplane LSH for ANN
EMB_DIM = 64

# minhash seeds — pinned, embedded literally in both engines
MH_A = [((i + 1) * 2654435761) % (2**31) | 1 for i in range(N_MINHASH)]
MH_B = [((i + 1) * 40503 * 65537) % (2**31) for i in range(N_MINHASH)]

STOP_TERMS = ["a", "the"]

MLT_DOC_ID = 7  # more-like-this source doc
MLT_TOP_TERMS = 25  # Lucene-MLT "interesting terms" budget

# curation suite pins (operators/curate.py twins)
PACK_BUDGET = 256  # tokens per training-sequence bin
SAMPLE_FRACS = {"en": 0.5, "zh": 0.3}  # per-stratum keep fractions
SAMPLE_DEFAULT = 0.15
# funnel rules: first failing rule claims the doc; integer-only math so
# both engines compare exactly (digits*5 > chars  ⇔  digit ratio > 0.2;
# distinct*5 < total*2  ⇔  type/token ratio < 0.4)
# decontamination pins: eval set = first DECON_PREFIX_TOKENS tokens of
# every doc with doc_id % DECON_MOD == DECON_REM (deterministic synthetic
# benchmark — its items genuinely appear in the corpus); shingles seen in
# more than DECON_MAX_DF docs are boilerplate, not evidence; a doc is
# contaminated when it holds >= 4/5 of an item's matchable shingles
DECON_MOD, DECON_REM = 11, 3
DECON_PREFIX_TOKENS = 12
DECON_MAX_DF = 50
DECON_NUM, DECON_DEN = 4, 5

_FUNNEL_RULES_SPARK = [
    ("too_short", "length(text) < 200"),
    (
        "high_digit",
        "length(regexp_replace(text, '[^0-9]', '')) * 5 > length(text)",
    ),
    (
        "low_diversity",
        f"size(array_distinct({TOKS_SQL})) * 5 < size({TOKS_SQL}) * 2",
    ),
]


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# tokenized-documents building blocks (shared by several queries)
# ---------------------------------------------------------------------------


def _doc_terms(spark, sf_dir) -> DataFrame:
    """(doc_id, term) one row per token occurrence."""
    return (
        _read(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.expr(TOKS_SQL)).alias("term"))
    )


def _tf(spark, sf_dir) -> DataFrame:
    return (
        _doc_terms(spark, sf_dir)
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )


_TF_DUCK = f"""
    SELECT doc_id, term, count(*) AS tf
    FROM (SELECT doc_id, unnest({TOKS_DUCK}) AS term FROM documents)
    GROUP BY doc_id, term
"""

_SHINGLES_SPARK = (
    "transform(sequence(0, size(_t) - 3), i -> "
    "concat(_t[i], ' ', _t[i+1], ' ', _t[i+2]))"
)

_SHINGLES_DUCK = f"""
    SELECT doc_id,
           list_distinct([_t[i] || ' ' || _t[i+1] || ' ' || _t[i+2]
                          for i in range(1, len(_t) - 1)]) AS shs
    FROM (SELECT doc_id, {TOKS_DUCK} AS _t FROM documents)
    WHERE len(_t) >= 3
"""


def _shingles(spark, sf_dir) -> DataFrame:
    """(doc_id, sh) — DISTINCT 3-token shingles per doc."""
    return (
        _read(spark, sf_dir, "documents")
        .select("doc_id", F.expr(TOKS_SQL).alias("_t"))
        .filter(F.size("_t") >= 3)
        .select("doc_id", F.explode(F.expr(_SHINGLES_SPARK)).alias("sh"))
        .distinct()
    )


_SHINGLES_FLAT_DUCK = f"""
    SELECT doc_id, unnest(shs) AS sh FROM ({_SHINGLES_DUCK})
"""

# md5-based 60-bit token hash, identical in both engines (Spark form is
# the single source of truth in operators/dedup.py)
from search_engine_spark.operators.dedup import TOKHASH_SQL as _TOKHASH_SPARK  # noqa: E402
from search_engine_spark.operators.text import (  # noqa: E402
    lang_id_oracle_sql as _lang_id_oracle_sql,
    lang_id_pipeline_oracle_sql as _lang_id_pipeline_oracle_sql,
    train_lang_profiles_oracle_sql as _train_lang_profiles_oracle_sql,
)
from search_engine_spark.operators.sketch import (
    loghist_oracle_sql as _loghist_oracle_sql,
    loghist_refined_oracle_sql as _loghist_refined_oracle_sql,
    sampled_quantiles_oracle_sql as _sampled_quantiles_oracle_sql,
)

_TOKHASH_DUCK = "(('0x' || substr(md5({col}), 1, 15))::BIGINT)"


# ---------------------------------------------------------------------------
# 1-7: search-engine stages (SURVEY.md §2.4-2.6)
# ---------------------------------------------------------------------------


def q_tf(spark, sf_dir):
    """A1 — per-(doc, term) term frequency."""
    return _tf(spark, sf_dir)


def q_df(spark, sf_dir):
    """A2 — per-term document frequency + collection frequency."""
    return (
        _tf(spark, sf_dir)
        .groupBy("term")
        .agg(F.count("*").alias("df"), F.sum("tf").alias("cf"))
    )


def q_doc_stats(spark, sf_dir):
    """A3/A8 — corpus size + average document length (token count)."""
    return (
        _read(spark, sf_dir, "documents")
        .select(F.size(F.expr(TOKS_SQL)).cast("long").alias("_len"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("_len").alias("sum_doc_len"),
            F.round(F.avg("_len"), 6).alias("avg_doc_len"),
        )
    )


def q_conjunction(spark, sf_dir):
    """J3/U1 — docs containing ALL query terms (one-shuffle group-count
    form, skew-safe; reference: SearchServiceImpl.java:166-188)."""
    tf = _tf(spark, sf_dir).filter(F.col("term").isin(CONJ_TERMS))
    return (
        tf.groupBy("doc_id")
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") == len(CONJ_TERMS))
        .select("doc_id")
    )


def q_cutoff_terms(spark, sf_dir):
    """X2 — the 5%-df common-term cutoff: which query terms are usable."""
    docs = _read(spark, sf_dir, "documents")
    n_docs = docs.count()
    return (
        _tf(spark, sf_dir)
        .filter(F.col("term").isin(CUTOFF_TERMS))
        .groupBy("term")
        .agg(F.count("*").alias("df"))
        .select(
            "term",
            "df",
            (F.col("df") <= F.lit(n_docs / 100.0 * 5.0)).alias("usable"),
        )
    )


def q_sumtf_topk(spark, sf_dir):
    """A5/O1/O2 — the reference's legacy Σtf/max-tf relevance, top-10 with
    (score desc, doc_id asc) tiebreak (SearchServiceImpl.java:335-357)."""
    tf = _tf(spark, sf_dir).filter(F.col("term").isin(SUMTF_TERMS))
    scored = (
        tf.groupBy("doc_id")
        .agg(
            F.count("*").alias("_n"),
            F.sum("tf").alias("_sum"),
            F.max("tf").alias("_max"),
        )
        .filter(F.col("_n") == len(SUMTF_TERMS))
        .select(
            "doc_id",
            F.round(F.col("_sum").cast("double") / F.col("_max"), 6).alias("score"),
        )
    )
    # orderBy().limit() → TakeOrderedAndProject (per-partition top-k +
    # k-row merge); a global row_number() window would single-partition
    # the whole scored set. Rank is implied by (score desc, doc_id asc).
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(10)


def _bm25_per_term(spark, sf_dir, terms, weights=None):
    """(doc_id, _s) one row per (doc, query-term) BM25 partial score —
    shared by the AND and OR top-k twins. ``weights`` ({term: boost})
    folds in as ``weight * idf`` — the same single pinned multiply as
    the boolean-kernel boost path (boolquery.parse_bool_boosted)."""
    docs = _read(spark, sf_dir, "documents")
    lens = docs.select(
        "doc_id", F.size(F.expr(TOKS_SQL)).cast("double").alias("dl")
    )
    stats = lens.agg(
        F.count("*").alias("n"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    n, avgdl = stats["n"], stats["avgdl"]
    tf = _tf(spark, sf_dir).filter(F.col("term").isin(terms))
    dfs = tf.groupBy("term").agg(F.count("*").alias("df"))
    return (
        tf.join(dfs, "term")
        .join(lens, "doc_id")
        .withColumn(
            "_idf",
            F.log(
                F.lit(1.0)
                + (F.lit(float(n)) - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ),
        )
        .withColumn(
            "_idf",
            F.col("_idf") if not weights else (
                F.coalesce(
                    F.create_map(
                        *[F.lit(x) for t, w in sorted(weights.items())
                          for x in (t, float(w))]
                    )[F.col("term")],
                    F.lit(1.0),
                ) * F.col("_idf")
            ),
        )
        .withColumn(
            "_s",
            F.col("_idf")
            * F.col("tf")
            * F.lit(BM25_K1 + 1.0)
            / (
                F.col("tf")
                + F.lit(BM25_K1)
                * (F.lit(1.0 - BM25_B) + F.lit(BM25_B) * F.col("dl") / F.lit(avgdl))
            ),
        )
    )


def q_bm25_topk(spark, sf_dir):
    """Flagship scoring math in pure SQL form: conjunctive BM25 top-10
    (k1=1.2, b=0.75, Lucene idf), both engines computing ln identically."""
    per = _bm25_per_term(spark, sf_dir, BM25_TERMS)
    scored = (
        per.groupBy("doc_id")
        .agg(F.count("*").alias("_nm"), F.round(F.sum("_s"), 6).alias("score"))
        .filter(F.col("_nm") == len(BM25_TERMS))
        .select("doc_id", "score")
    )
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(10)


def q_bm25_search_after(spark, sf_dir):
    """Cursor (search_after) pagination in SQL form: the 10 rows strictly
    AFTER the 5th-ranked row of the bm25_topk ranking, filtered by
    (score, doc_id) cursor comparison — NOT by OFFSET. The pinned order
    is total, so the two are provably equal; the engine-side kernels
    (operators/wand.py ``_after_cut``, oracle.search ``after``) serve the
    cursor form at O(k) per page. The cursor row itself is resolved
    relationally on both sides (a 1-row broadcast), so the twin stays
    self-contained."""
    per = _bm25_per_term(spark, sf_dir, BM25_TERMS)
    scored = (
        per.groupBy("doc_id")
        .agg(F.count("*").alias("_nm"), F.round(F.sum("_s"), 6).alias("score"))
        .filter(F.col("_nm") == len(BM25_TERMS))
        .select("doc_id", "score")
    )
    cursor = (
        scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(5)
        .orderBy(F.asc("score"), F.desc("doc_id")).limit(1)  # the 5th row
        .select(F.col("score").alias("c_s"), F.col("doc_id").alias("c_d"))
    )
    return (
        scored.crossJoin(F.broadcast(cursor))
        .filter(
            (F.col("score") < F.col("c_s"))
            | ((F.col("score") == F.col("c_s")) & (F.col("doc_id") > F.col("c_d")))
        )
        .select("doc_id", "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
    )


IMPACT_TERMS = ["dup", "merge"]
IMPACT_E = 8


def q_impact_prefix(spark, sf_dir):
    """Impact-ordered layout semantics (operators/impact.py) in
    relational form: per term, the top-``IMPACT_E`` postings by the
    avgdl-free impact proxy (tf desc, dl asc, doc_id asc — the pinned
    order that makes build-time selection sound for any (idf, avgdl))
    as kind=0 rows, plus the per-distinct-tf min-dl residual strata of
    every REMAINING posting as kind=1 rows (doc_id = -1) — the exact
    (prefix, residual-descriptor) pair the rank-prefix venues certify
    against. Window-free: per-term orderBy().limit() is
    TakeOrderedAndProject; the rest resolves by left-anti join."""
    docs = _read(spark, sf_dir, "documents")
    lens = docs.select(
        "doc_id", F.size(F.expr(TOKS_SQL)).cast("long").alias("dl")
    )
    base = (
        _tf(spark, sf_dir)
        .filter(F.col("term").isin(IMPACT_TERMS))
        .join(lens, "doc_id")
        .select("term", "doc_id", "tf", "dl")
    )
    tops = None
    for t in IMPACT_TERMS:
        top = (
            base.filter(F.col("term") == t)
            .orderBy(F.desc("tf"), F.asc("dl"), F.asc("doc_id"))
            .limit(IMPACT_E)
        )
        tops = top if tops is None else tops.unionByName(top)
    rest = base.join(
        tops.select("term", "doc_id"), ["term", "doc_id"], "left_anti"
    )
    strata = (
        rest.groupBy("term", "tf")
        .agg(F.min("dl").alias("dl"))
        .select(
            "term", F.lit(1).alias("kind"),
            F.lit(-1).cast("long").alias("doc_id"), "tf", "dl",
        )
    )
    return tops.select(
        "term", F.lit(0).alias("kind"), "doc_id", "tf", "dl"
    ).unionByName(strata)


NOT_TERM = "window"  # excludes 6 of bm25_topk's 10 — non-trivial twin
WC_PREFIX, WC_TERM, WC_K = "me", "dup", 8  # wildcard "dup me*"


def q_bm25_not_topk(spark, sf_dir):
    """Negative-term query (the ``-term`` syntax, operators/query.py /
    operators/wand.py ``exclude_terms``): conjunctive BM25 over
    BM25_TERMS minus every doc containing NOT_TERM — the anti-join runs
    BEFORE the top-k cut (excluding after would fake ranks)."""
    per = _bm25_per_term(spark, sf_dir, BM25_TERMS)
    excl = (
        _tf(spark, sf_dir)
        .filter(F.col("term") == NOT_TERM)
        .select("doc_id")
        .distinct()
    )
    scored = (
        per.groupBy("doc_id")
        .agg(F.count("*").alias("_nm"), F.round(F.sum("_s"), 6).alias("score"))
        .filter(F.col("_nm") == len(BM25_TERMS))
        .join(excl, "doc_id", "left_anti")
        .select("doc_id", "score")
    )
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(10)


BOOL_TERMS = ("dup", "key", "merge")  # positives of the boolean twin


def q_bm25_bool_topk(spark, sf_dir):
    """Boolean-matching BM25 in SQL form — the relational twin of the
    boolean query engine (functions/boolquery.py syntax, operators/
    wand.py bool_search_blocks, oracle.bool_search): the fixed query
    ``(dup OR merge) AND key AND NOT window``. Pinned boolean scoring:
    a matched doc scores EVERY positive lemma it contains (a doc that
    matched via 'dup' still scores 'merge' when present), negations are
    non-scoring, anti-join before the top-k cut."""
    per = _bm25_per_term(spark, sf_dir, list(BOOL_TERMS))
    have = (
        per.groupBy("doc_id")
        .agg(
            *[
                F.max((F.col("term") == t).cast("int")).alias(f"h_{t}")
                for t in BOOL_TERMS
            ],
            F.round(F.sum("_s"), 6).alias("score"),
        )
        .filter(
            ((F.col("h_dup") == 1) | (F.col("h_merge") == 1))
            & (F.col("h_key") == 1)
        )
    )
    excl = (
        _tf(spark, sf_dir)
        .filter(F.col("term") == NOT_TERM)
        .select("doc_id")
        .distinct()
    )
    return (
        have.join(excl, "doc_id", "left_anti")
        .select("doc_id", "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
    )


def q_bm25_synonym_topk(spark, sf_dir):
    """Query-time synonym expansion in SQL form (functions/boolquery.py
    ``expand_synonyms`` + the boolean kernel): the query ``dup key``
    with synonym groups {dup≡merge, key≡window} expands to
    ``(dup OR merge) AND (key OR window)``; every PRESENT expansion
    lemma contributes its own idf-weighted partial (pinned re-pin of
    Lucene SynonymQuery blending — see expand_synonyms)."""
    terms = ["dup", "key", "merge", "window"]
    per = _bm25_per_term(spark, sf_dir, terms)
    have = (
        per.groupBy("doc_id")
        .agg(
            *[
                F.max((F.col("term") == t).cast("int")).alias(f"h_{t}")
                for t in terms
            ],
            F.round(F.sum("_s"), 6).alias("score"),
        )
        .filter(
            ((F.col("h_dup") == 1) | (F.col("h_merge") == 1))
            & ((F.col("h_key") == 1) | (F.col("h_window") == 1))
        )
    )
    return (
        have.select("doc_id", "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
    )


def q_bm25_boost_topk(spark, sf_dir):
    """Term-boost scoring in SQL form (boolquery ``dup^2.5 merge``):
    the boosted term's partial uses ``2.5 * idf`` (one pinned multiply,
    mirroring the boolean kernel's driver-side idf fold); conjunctive
    top-10, so ranks shift toward docs where the boosted term's tf
    saturation dominates."""
    per = _bm25_per_term(spark, sf_dir, BM25_TERMS, weights={"dup": 2.5})
    scored = (
        per.groupBy("doc_id")
        .agg(F.count("*").alias("_nm"), F.round(F.sum("_s"), 6).alias("score"))
        .filter(F.col("_nm") == len(BM25_TERMS))
        .select("doc_id", "score")
    )
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(10)


FILTER_LANG = "en"  # ~44% of documents — the filter bites the top-10


def q_bm25_filtered_topk(spark, sf_dir):
    """Attribute-filtered BM25 (operators/filters.py semantics):
    conjunctive BM25 over BM25_TERMS restricted to documents whose
    ``lang`` is FILTER_LANG. Non-scoring — survivors keep their
    unfiltered scores; the restriction applies BEFORE the top-k cut
    (filter-then-cut, like ``-term`` exclusion). The filter side routes
    through the library's build_filter_flat/filter_groups so the twin
    pins its NULL-drop + OR-within/AND-across column semantics."""
    from search_engine_spark.operators.filters import (
        build_filter_flat,
        filter_groups,
    )

    per = _bm25_per_term(spark, sf_dir, BM25_TERMS)
    scored = (
        per.groupBy("doc_id")
        .agg(F.count("*").alias("_nm"), F.round(F.sum("_s"), 6).alias("score"))
        .filter(F.col("_nm") == len(BM25_TERMS))
        .select("doc_id", "score")
    )
    docs = _read(spark, sf_dir, "documents").withColumn("scope", F.lit("-"))
    flt = build_filter_flat(docs, cols=("lang",))
    for g in filter_groups({"lang": FILTER_LANG}, available=("lang",)):
        scored = scored.join(
            flt.filter(F.col("lemma").isin(list(g)))
            .select("doc_id")
            .distinct(),
            "doc_id",
            "left_semi",
        )
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(10)


def q_collapse_by_source(spark, sf_dir):
    """Field collapsing (operators/query.py collapse_results): the OR
    BM25 scored set reduced to ≤1 hit per ``source``, global pinned
    order, top-10 — the one-hit-per-conversation presentation shape.
    The window partitions by the collapse key (never single-partition);
    the results side broadcasts into the docs join."""
    from search_engine_spark.operators.query import collapse_results

    per = _bm25_per_term(spark, sf_dir, BM25_TERMS)
    scored = (
        per.groupBy("doc_id")
        .agg(F.round(F.sum("_s"), 6).alias("score"))
        .select("doc_id", "score")
    )
    docs = _read(spark, sf_dir, "documents")
    return collapse_results(scored, docs, "source", per_key=1).limit(10)


def q_wildcard_or_topk(spark, sf_dir):
    """Prefix-wildcard query ("dup me*"): the wildcard rewrites to the
    top-WC_K dictionary completions by collection frequency
    (operators/fuzzy.py expand_prefix — the bounded Lucene-style
    top-terms rewrite), then the expanded term set scores through the
    standard OR BM25 plan. The twin computes the same expansion with
    LIKE + ORDER BY cf DESC, term ASC LIMIT."""
    from search_engine_spark.operators.fuzzy import expand_prefix

    dic = (
        _tf(spark, sf_dir)
        .groupBy("term")
        .agg(F.sum("tf").cast("long").alias("cf"))
        .withColumnRenamed("term", "lemma")
    )
    exp = expand_prefix(dic, WC_PREFIX, k=WC_K)
    terms = sorted(set(exp) | {WC_TERM})
    per = _bm25_per_term(spark, sf_dir, terms)
    scored = (
        per.groupBy("doc_id")
        .agg(F.round(F.sum("_s"), 6).alias("score"))
        .select("doc_id", "score")
    )
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(10)


def q_bm25_or_topk(spark, sf_dir):
    """Disjunctive (OR / weak-AND result set) BM25 top-10: same per-term
    math, no all-terms gate — the oracle twin for the engine's
    combine='or' block-max weak-AND path (operators/wand.py)."""
    per = _bm25_per_term(spark, sf_dir, BM25_TERMS)
    scored = (
        per.groupBy("doc_id")
        .agg(F.round(F.sum("_s"), 6).alias("score"))
        .select("doc_id", "score")
    )
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(10)


def q_phrase_match(spark, sf_dir):
    """Positional phrase predicate in native-token SQL form: docs whose
    token stream contains the exact consecutive bigram 'merge batch'.
    (The engine's positional-index phrase path — varbyte position lists +
    per-shard verify kernel, operators/wand.py — is pytest-verified
    against oracle.phrase_search in tests/test_phrase.py; this twin pins
    the predicate semantics both engines can express.)"""
    docs = _read(spark, sf_dir, "documents").select(
        "doc_id", F.expr(TOKS_SQL).alias("_t")
    )
    pred = (
        "exists(zip_with("
        "slice(_t, 1, greatest(size(_t) - 1, 0)), "
        "slice(_t, 2, greatest(size(_t) - 1, 0)), "
        "(a, b) -> a = 'merge' AND b = 'batch'), x -> x)"
    )
    return docs.filter(F.expr(pred)).select("doc_id")


def q_more_like_this(spark, sf_dir):
    """Related-document search (Lucene MoreLikeThis analog, integer-score
    contract form; the BM25-weighted library op is operators/query.py
    more_like_this): the source doc's 25 rarest DISTINCT terms
    (df asc, term asc — the "interesting terms" selection) become an OR
    query; candidates rank by how many interesting terms they share
    (count desc, doc_id asc), top 10. Plan shape: the interesting-term
    side is ≤25 rows (broadcast), candidates come from one pushed-filter
    scan + one hash-agg + TakeOrderedAndProject — a |terms|-bounded
    query, independent of corpus size."""
    dt = _doc_terms(spark, sf_dir).distinct()
    dfs = dt.groupBy("term").agg(F.count("*").alias("df"))
    interesting = (
        dt.filter(F.col("doc_id") == MLT_DOC_ID)
        .join(dfs, "term")
        .orderBy(F.asc("df"), F.asc("term"))
        .limit(MLT_TOP_TERMS)
        .select("term")
    )
    return (
        dt.filter(F.col("doc_id") != MLT_DOC_ID)
        .join(F.broadcast(interesting), "term")
        .groupBy("doc_id")
        .agg(F.count("*").alias("shared_terms"))
        .orderBy(F.desc("shared_terms"), F.asc("doc_id"))
        .limit(10)
    )


def q_facet_counts(spark, sf_dir):
    """Faceted search (the aggregation panel beside results): per-
    (lang, source) doc counts over the CONJ_TERMS conjunction's result
    set. Two-phase: match (group-count conjunction, one shuffle on
    doc_id), then join facet columns and one tiny agg — the match side
    is small, so AQE broadcasts it into the docs scan."""
    matches = q_conjunction(spark, sf_dir)
    docs = _read(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    return (
        docs.join(matches, "doc_id")
        .groupBy("lang", "source")
        .agg(F.count("*").alias("n_docs"))
    )


FUZZY_TERM = "merg"      # 1-edit typo of the corpus term "merge"
FUZZY2_TERM = "mrg"      # 2-edit typo of "merge" (two deletions)
SUGGEST_PREFIX = "st"    # completes to stream/... in the corpus
SUGGEST_K = 10


def q_fuzzy_match(spark, sf_dir):
    """Typo-tolerant term lookup (operators/fuzzy.py fuzzy_match —
    SymSpell deletion-neighborhood candidates verified with native
    levenshtein; the DuckDB twin is the brute-force levenshtein scan the
    candidate join provably equals for edit distance <= 1)."""
    from search_engine_spark.operators.fuzzy import fuzzy_match

    dic = (
        _tf(spark, sf_dir)
        .groupBy("term")
        .agg(F.count("*").alias("df"))
        .withColumnRenamed("term", "lemma")
    )
    return fuzzy_match(dic, FUZZY_TERM).select(
        F.col("lemma").alias("term"),
        F.col("df"),
        F.col("dist").cast("int").alias("dist"),
    )


def q_fuzzy_match2(spark, sf_dir):
    """Edit-distance-2 term lookup (operators/fuzzy.py fuzzy_match with
    max_dist=2 — SymSpell depth-2 deletion-neighborhood candidates
    verified with native levenshtein; the DuckDB twin is the brute-force
    levenshtein <= 2 scan the candidate join provably equals). Ranked
    (dist asc, df desc, term asc) — a near miss beats a frequent-but-
    far term; the total order makes the LIMIT cut deterministic."""
    from search_engine_spark.operators.fuzzy import fuzzy_match

    dic = (
        _tf(spark, sf_dir)
        .groupBy("term")
        .agg(F.count("*").alias("df"))
        .withColumnRenamed("term", "lemma")
    )
    return fuzzy_match(dic, FUZZY2_TERM, max_dist=2).select(
        F.col("lemma").alias("term"),
        F.col("df"),
        F.col("dist").cast("int").alias("dist"),
    )


def q_suggest_prefix(spark, sf_dir):
    """Search-box autocomplete (operators/fuzzy.py suggest): top-k
    dictionary completions of a prefix by collection frequency; pushed
    StartsWith filter + TakeOrderedAndProject, total (cf desc, term asc)
    order so the LIMIT cut is deterministic in both engines."""
    from search_engine_spark.operators.fuzzy import suggest

    dic = (
        _tf(spark, sf_dir)
        .groupBy("term")
        .agg(F.sum("tf").alias("cf"))
        .withColumnRenamed("term", "lemma")
    )
    return suggest(dic, SUGGEST_PREFIX, k=SUGGEST_K).select(
        F.col("lemma").alias("term"), F.col("cf")
    )


def q_docs_ids(spark, sf_dir):
    """§2.9 — deterministic dense doc_id assignment (the engine's
    two-level offset operator) cross-checked against SQL row_number."""
    from search_engine_spark.operators.docs import assign_doc_ids

    docs = _read(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("doc_id")
    tr = docs.select(
        F.col("source").alias("conv_id"),
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
    )
    return assign_doc_ids(tr).select(
        "conv_id", "turn_idx", F.col("doc_id").alias("doc_id_new")
    )


# ---------------------------------------------------------------------------
# 8-11: deduplication suite
# ---------------------------------------------------------------------------


def q_dedup_exact(spark, sf_dir):
    """Exact dedup via content hash — groups sized >= 1 summarized."""
    from search_engine_spark.operators.dedup import exact_dedup_summary

    return exact_dedup_summary(_read(spark, sf_dir, "documents"))


def q_dedup_ngram_jaccard(spark, sf_dir):
    """Exact 3-shingle Jaccard >= 0.8 pairs (the near-dup ground truth)."""
    from search_engine_spark.operators.dedup import jaccard_pairs

    return jaccard_pairs(_shingles(spark, sf_dir), JACCARD_THRESHOLD)


def q_dedup_minhash_lsh(spark, sf_dir):
    """MinHash(16) + LSH(4 bands × 4 rows) candidate pairs, then exact
    Jaccard verification >= 0.8 — the scale path for near-dup detection
    (shingle→minhash→band→bucket-join), served by the library operator
    (operators/dedup.py: vectorized signature kernel, no seed crossJoin)."""
    from search_engine_spark.operators.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(
        _shingles(spark, sf_dir), JACCARD_THRESHOLD,
        MH_A, MH_B, HASH_MOD, N_BANDS,
    )


def q_dedup_simhash(spark, sf_dir):
    """63-bit SimHash fingerprint per doc (tf-weighted token hashes),
    served by the library operator (operators/dedup.py: one NumPy pass
    per batch — no 63×-per-posting explode)."""
    from search_engine_spark.operators.dedup import simhash

    return simhash(_tf(spark, sf_dir))


# ---------------------------------------------------------------------------
# 12-13: similarity search over embeddings
# ---------------------------------------------------------------------------


def _query_vec(spark, sf_dir) -> list[float]:
    row = (
        _read(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == 0)
        .select("embedding")
        .collect()[0]
    )
    return [float(x) for x in row["embedding"]]


def q_ann_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-10 vs vec 0 (baseline ANN path), served by
    the library operator (operators/ann.py: ordered-fold NumPy kernel)."""
    from search_engine_spark.operators.ann import cosine_topk

    return cosine_topk(
        _read(spark, sf_dir, "embeddings"), _query_vec(spark, sf_dir),
        k=10, exclude_id=0,
    )


def q_significant_terms(spark, sf_dir):
    """Significant-terms aggregation in SQL form (operators/
    significant.py, ES JLH as prior art): foreground = docs containing
    'dup'; which other terms are over-represented there vs the corpus.
    Pinned float shape ``(fg/nf - bg/nd) * ((fg/nf) / (bg/nd))``,
    fg_df ≥ 2, fgPct > bgPct, (jlh desc, term asc) top-15."""
    from search_engine_spark.operators.significant import significant_terms

    tf = _tf(spark, sf_dir)
    fg_ids = tf.filter(F.col("term") == "dup").select("doc_id").distinct()
    fg_tf = tf.join(F.broadcast(fg_ids), "doc_id").select("term")
    bg = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_fg = fg_ids.count()
    n_docs = _read(spark, sf_dir, "documents").count()
    return significant_terms(
        fg_tf, bg, n_fg=n_fg, n_docs=n_docs, k=15, term_col="term"
    )


def q_hybrid_rrf_topk(spark, sf_dir):
    """Hybrid retrieval: reciprocal-rank fusion of the lexical OR-mode
    BM25 top-50 ('dup merge') with the semantic cosine top-50 (vs vec 0,
    self excluded) — operators/hybrid.py ``rrf_fuse`` (rrf_k=60). Both
    lists rank by their ROUNDED scores so ranks can't flip on last-ulp
    float differences between engines; doc_id ≡ vec_id (1:1 tables)."""
    from search_engine_spark.operators.ann import cosine_topk
    from search_engine_spark.operators.hybrid import rrf_fuse

    per = _bm25_per_term(spark, sf_dir, BM25_TERMS)
    lex = (
        per.groupBy("doc_id")
        .agg(F.round(F.sum("_s"), 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(50)
    )
    sem = cosine_topk(
        _read(spark, sf_dir, "embeddings"), _query_vec(spark, sf_dir),
        k=50, exclude_id=0,
    ).select(F.col("vec_id").alias("doc_id"), F.col("sim").alias("score"))
    return rrf_fuse([lex, sem], topk=10)


def q_kmeans_assign(spark, sf_dir):
    """Lloyd's k-means (k=4, 2 update rounds + final assign) over the
    embeddings — operators/ann.py ``kmeans``: per-iteration narrow
    mapInPandas partial-aggregation, broadcast centroid matrix, pinned
    6dp rounding of init/centroids/distances so the DuckDB replay of
    the same iterations lands on identical assignments."""
    from search_engine_spark.operators.ann import kmeans

    out, _ = kmeans(_read(spark, sf_dir, "embeddings"), k=4, iters=2)
    return out


def q_mmr_diversify(spark, sf_dir):
    """MMR result diversification (operators/rescore.py mmr_rerank,
    Carbonell & Goldstein 1998): first stage = OR-mode BM25 top-20 over
    ('dup','merge'); greedy picks maximize round(0.7*rel - 0.3*max_jac,
    6) with ties to lower doc_id; k=10."""
    from search_engine_spark.operators.rescore import mmr_rerank

    per = _bm25_per_term(spark, sf_dir, BM25_TERMS)
    first = (
        per.groupBy("doc_id")
        .agg(F.round(F.sum("_s"), 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(20)
    )
    return mmr_rerank(
        first, _read(spark, sf_dir, "documents"), TOKS_SQL, k=10, lam=0.7
    )


def q_rescore_proximity(spark, sf_dir):
    """Second-stage proximity rescoring in SQL form (operators/
    rescore.py pins, ES rescore-window as prior art): first stage =
    OR-mode BM25 top-50 over ('dup','merge'); prox = 1/(1 + span - 2)
    where span = min |i-j| + 1 over the two terms' token positions (the
    2-term minimal covering window); combined = round(score + prox, 6),
    docs beyond the window dropped, top-10."""
    per = _bm25_per_term(spark, sf_dir, BM25_TERMS)
    first = (
        per.groupBy("doc_id")
        .agg(F.round(F.sum("_s"), 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(50)
    )
    toks = _read(spark, sf_dir, "documents").select(
        "doc_id", F.expr(TOKS_SQL).alias("_t")
    )
    # positions only for the windowed docs — the corpus never pays
    pos = (
        toks.join(F.broadcast(first.select("doc_id")), "doc_id")
        .select("doc_id", F.posexplode("_t").alias("i", "tok"))
        .filter(F.col("tok").isin(BM25_TERMS))
    )
    pa = pos.filter(F.col("tok") == "dup").select(
        "doc_id", F.col("i").alias("ia")
    )
    pb = pos.filter(F.col("tok") == "merge").select(
        "doc_id", F.col("i").alias("ib")
    )
    span = (
        pa.join(pb, "doc_id")
        .groupBy("doc_id")
        .agg(F.min(F.abs(F.col("ia") - F.col("ib")) + 1).alias("span"))
    )
    return (
        first.join(span, "doc_id", "left")
        .select(
            "doc_id",
            F.round(
                F.col("score")
                + F.coalesce(
                    F.lit(1.0) / (F.lit(1) + F.col("span") - F.lit(2)),
                    F.lit(0.0),
                ),
                6,
            ).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
    )


CLUSTER_FRACS = {"0": 0.6, "1": 0.3, "2": 0.3, "3": 0.6}


def q_cluster_sample(spark, sf_dir):
    """Per-cluster quota sampling — the curation move of rebalancing a
    corpus across SEMANTIC clusters (downsample dominant topics): kmeans
    topic buckets (operators/ann.py) composed with the deterministic
    md5-threshold Bernoulli sampler (operators/curate.py) keyed on
    vec_id — same sample at any cluster size, predicate scan-pushable."""
    from search_engine_spark.operators.ann import kmeans
    from search_engine_spark.operators.curate import stratified_sample

    assign, _ = kmeans(_read(spark, sf_dir, "embeddings"), k=4, iters=2)
    a = assign.withColumn("centroid", F.col("centroid").cast("string"))
    out = stratified_sample(
        a, CLUSTER_FRACS, 0.0, strata_col="centroid", key_col="vec_id"
    )
    return out.select(
        "vec_id", F.col("centroid").cast("int").alias("centroid")
    )


def _plane_sign_sql(j: str, d: str) -> str:
    """Deterministic ±1 hyperplane component for (plane j, dim d) — same
    integer arithmetic in both engines."""
    return (
        f"(case when (({j} * 64 + {d} + 1) * 2654435761) % 97 < 48 "
        f"then -1.0 else 1.0 end)"
    )


def q_ann_lsh_buckets(spark, sf_dir):
    """Hyperplane-LSH bucket id per vector — the scale path for ANN
    (search only the query's bucket instead of the full corpus), served
    by the library operator (operators/ann.py: one matmul-shaped pass per
    Arrow batch against the broadcast plane matrix — no posexplode)."""
    from search_engine_spark.operators.ann import lsh_buckets, pinned_sign_matrix

    return lsh_buckets(
        _read(spark, sf_dir, "embeddings"),
        pinned_sign_matrix(N_PLANES, EMB_DIM),
    )


# ---------------------------------------------------------------------------
# 14-16: text analysis
# ---------------------------------------------------------------------------


def q_text_quality(spark, sf_dir):
    """Quality metrics per doc: token count, avg token length, stopword
    ratio, digit ratio (library operator: operators/text.py)."""
    from search_engine_spark.operators.text import text_quality

    return text_quality(
        _read(spark, sf_dir, "documents"), TOKS_SQL, STOP_TERMS
    )


def q_token_counts(spark, sf_dir):
    """Token counting two ways per doc: whitespace words and a BPE-ish
    pre-tokenization regex (letter runs / digit runs / single
    punctuation), the shapes a training-data pipeline budgets with
    (library operator: operators/text.py)."""
    from search_engine_spark.operators.text import token_counts

    return token_counts(_read(spark, sf_dir, "documents"))


def q_ann_ivf_assign(spark, sf_dir):
    """IVF coarse quantizer: assign each embedding to its nearest of 8
    deterministic centroids (the partition step of IVF ANN — search then
    probes only the query's cell instead of the full corpus). Served by
    the library operator (operators/ann.py: batch matmul against the
    broadcast centroid matrix, dots rounded to 6dp before the argmax so
    float accumulation order can't flip near-ties, ties to lower id)."""
    from search_engine_spark.operators.ann import ivf_assign, pinned_sign_matrix

    return ivf_assign(
        _read(spark, sf_dir, "embeddings"),
        pinned_sign_matrix(8, EMB_DIM, row_offset=13),
    )


def q_ann_ivf_topk(spark, sf_dir):
    """Full IVF ANN search (the scale path): top-10 by cosine vs vec 0,
    scoring ONLY vectors assigned to the query's 2 nearest of 8 pinned
    centroids (operators/ann.py ivf_topk — fused assign+mask+score
    kernel, no shuffle before the TakeOrderedAndProject merge)."""
    from search_engine_spark.operators.ann import ivf_topk, pinned_sign_matrix

    return ivf_topk(
        _read(spark, sf_dir, "embeddings"),
        pinned_sign_matrix(8, EMB_DIM, row_offset=13),
        _query_vec(spark, sf_dir),
        k=10, nprobe=2, exclude_id=0,
    )


PQ_M_SUB, PQ_KSUB, PQ_ITERS = 4, 4, 2


def _pq_codebooks(spark, sf_dir):
    from search_engine_spark.operators.ann import pq_train

    return pq_train(
        _read(spark, sf_dir, "embeddings"),
        m_sub=PQ_M_SUB, ksub=PQ_KSUB, iters=PQ_ITERS,
    )


def q_ann_pq_codes(spark, sf_dir):
    """Product-quantization codes: train per-subspace codebooks (pinned
    Lloyd's — the kmeans family pins) and encode every embedding as
    m_sub small ints (operators/ann.py pq_train/pq_encode). PQ is the
    storage layer of billion-vector ANN: search scans the ~dim·4/m_sub×
    smaller codes table, never the raw vectors. Output one row per
    (vector, subspace) so the hash compare sees scalar columns."""
    from search_engine_spark.operators.ann import pq_encode

    codes = pq_encode(
        _read(spark, sf_dir, "embeddings"), _pq_codebooks(spark, sf_dir)
    )
    return codes.select(
        "vec_id",
        F.posexplode("codes").alias("subspace", "code"),
    ).select(
        "vec_id",
        F.col("subspace").cast("int").alias("subspace"),
        F.col("code").cast("int").alias("code"),
    )


def q_ann_pq_adc_topk(spark, sf_dir):
    """PQ ANN search by asymmetric distance (ADC): top-10 nearest vec 0
    by the LUT-fold approximate squared L2 over the CODES table
    (operators/ann.py pq_topk — driver-side m_sub×ksub lookup table,
    left-to-right subspace fold, narrow scan + TakeOrderedAndProject)."""
    from search_engine_spark.operators.ann import pq_encode, pq_topk

    cb = _pq_codebooks(spark, sf_dir)
    codes = pq_encode(_read(spark, sf_dir, "embeddings"), cb)
    return pq_topk(
        codes, cb, _query_vec(spark, sf_dir), k=10, exclude_id=0
    )


def q_ann_ivfpq_topk(spark, sf_dir):
    """IVF+PQ composed search (the canonical billion-vector index —
    FAISS IVFPQ shape): fused coarse-assign+encode kernel
    (operators/ann.py ivfpq_encode), restrict to the query's 2 probed
    cells, then ADC over the surviving codes. In the materialized layout
    (ivfpq_write_partitioned) the cell restriction is a PARTITION filter;
    here it computes inline so the twin is self-contained."""
    from search_engine_spark.operators.ann import (
        ivf_probe_cells,
        ivfpq_encode,
        pinned_sign_matrix,
        pq_topk,
    )

    emb = _read(spark, sf_dir, "embeddings")
    C = pinned_sign_matrix(8, EMB_DIM, row_offset=13)
    cb = _pq_codebooks(spark, sf_dir)
    qvec = _query_vec(spark, sf_dir)
    cells = ivf_probe_cells(C, qvec, nprobe=2)
    codes = ivfpq_encode(emb, C, cb).filter(F.col("centroid").isin(cells))
    return pq_topk(codes, cb, qvec, k=10, exclude_id=0)


def q_dedup_embedding_cosine(spark, sf_dir):
    """Embedding-cosine near-dup pairs: candidates restricted to equal
    hyperplane-LSH buckets (the scale path — avoids the all-pairs
    quadratic join), verified by exact cosine >= 0.35 (the synthetic
    embeddings' high-similarity tail; a real corpus would use ~0.95)."""
    from search_engine_spark.operators.ann import (
        cosine_pairs_lsh,
        pinned_sign_matrix,
    )

    return cosine_pairs_lsh(
        _read(spark, sf_dir, "embeddings"),
        pinned_sign_matrix(N_PLANES, EMB_DIM),
        threshold=0.35,
    )


def q_lang_id(spark, sf_dir):
    """Character-n-gram language-ID (Cavnar & Trenkle profile scoring)
    over the TRAINED profile table (functions/langdata.py: top-40
    n-grams per language of the deterministic multilingual seed corpus;
    held-out accuracy asserted in tests/test_langid.py). Library
    operator: operators/text.py, which also documents why accuracy
    against the synthetic corpus's random ``lang`` labels is not the
    target here — this twin pins ENGINE PARITY of the scoring shape."""
    from search_engine_spark.operators.text import lang_id_ngram

    return lang_id_ngram(_read(spark, sf_dir, "documents"))


def q_lang_profiles(spark, sf_dir):
    """The language-profile TRAINER (operators/text.py
    train_lang_profiles): per ``lang`` label of the documents table, the
    top-10 most frequent character n-grams, rank = row_number under
    (cnt desc, tg asc) — integer counts, no float path."""
    from search_engine_spark.operators.text import train_lang_profiles

    return train_lang_profiles(_read(spark, sf_dir, "documents"), n_top=10)


def q_lang_id_e2e(spark, sf_dir):
    """Train-then-score language ID as ONE composed distributed plan
    (operators/text.py lang_id_pipeline): profiles trained from the
    documents table's lang labels feed the n-gram scorer as a broadcast
    DataFrame — no driver collect between the stages. Argmax pin:
    min(struct(-cnt, lang)), field-order struct comparison in both
    engines."""
    from search_engine_spark.operators.text import lang_id_pipeline

    docs = _read(spark, sf_dir, "documents")
    return lang_id_pipeline(docs, docs, n_top=10)


def q_fingerprint(spark, sf_dir):
    """Order-sensitive document fingerprint: left-fold polynomial rolling
    hash over the token stream, mod 1e9+7 (library operator:
    operators/text.py)."""
    from search_engine_spark.operators.text import fingerprint

    return fingerprint(
        _read(spark, sf_dir, "documents"), TOKS_SQL, _TOKHASH_SPARK, HASH_MOD
    )


def q_lm_logppl(spark, sf_dir):
    """CCNet-style LM quality score: per-doc log10-perplexity under a
    self-trained interpolated bigram model (operators/text.py lm_logppl
    — pinned vocab/smoothing/fold shapes shared with the DuckDB twin)."""
    from search_engine_spark.operators.text import lm_logppl

    return lm_logppl(_read(spark, sf_dir, "documents"), vocab_size=256, lam=0.7)


def q_textrank(spark, sf_dir):
    """Corpus keywords by TextRank (Mihalcea & Tarau 2004): weighted
    PageRank over the word-adjacency graph, 10 pinned iterations with
    6dp per-iteration rounding (operators/text.py textrank_keywords),
    top-20 by (score desc, term asc)."""
    from search_engine_spark.operators.text import textrank_keywords

    return textrank_keywords(_read(spark, sf_dir, "documents"), k=20)


def q_collocations_pmi(spark, sf_dir):
    """Adjacent-word collocations by pointwise mutual information
    (operators/text.py collocations — Church & Hanks 1990): bigrams with
    corpus count >= 5 over the lowercase [a-z]+ token stream, pmi
    computed with the pinned float expression shape shared with the
    DuckDB twin."""
    from search_engine_spark.operators.text import collocations

    return collocations(_read(spark, sf_dir, "documents"), min_count=5)


# ---------------------------------------------------------------------------
# 17-18: event-stream analytics (windows / sessionization)
# ---------------------------------------------------------------------------


def q_stats_rollup(spark, sf_dir):
    """A7 — per-source doc/token counts + grand total via rollup
    (statistics API analog, StatisticsServiceImpl.java:31-63)."""
    docs = _read(spark, sf_dir, "documents")
    return (
        docs.rollup("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.size(F.expr(TOKS_SQL))).cast("long").alias("n_tokens"),
        )
        .select(
            F.coalesce("source", F.lit("<total>")).alias("source"),
            "n_docs",
            "n_tokens",
        )
    )


def q_events_hourly(spark, sf_dir):
    """Tumbling 1h window per event_type: count + value sum."""
    ev = _read(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", "ts").alias("hour"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("value_sum"),
        )
    )


def q_events_topic_shifts(spark, sf_dir):
    """Window-over-window shift detection (streaming/trending.py
    window_shifts_batch — the batch twin of the append-mode streaming
    topic-shift detector): event types whose hourly count is >= 1.5x
    the previous hour's (absent previous hour counts as 1). The Spark
    plan is the streaming-safe single aggregation over tagged cur/prev
    event copies; the oracle is the equivalent self-join SQL."""
    from search_engine_spark.streaming.trending import window_shifts_batch

    ev = _read(spark, sf_dir, "events")
    return window_shifts_batch(
        ev, "ts", "event_type", window="1 hour", min_df=2, min_ratio=1.5
    )


def q_events_quantiles(spark, sf_dir):
    """Exact value quantiles (p50/p90/p99, linear interpolation) per
    event_type — the latency-style analytics rollup. Spark ``percentile``
    and DuckDB ``quantile_cont`` pin the same sorted-order interpolation
    h = (n-1)p; a PARTITIONED aggregate, no global sort."""
    ev = _read(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
    )


def q_events_quantiles_sampled(spark, sf_dir):
    """Approximate per-type quantiles from the DETERMINISTIC md5-hash
    sample (library operator: operators/sketch.py sampled_quantiles) —
    the 100-TB path beside the exact rollup: the aggregation state holds
    only the sampled values, the sample is partition-invariant and the
    predicate pushes to the scan."""
    from search_engine_spark.operators.sketch import sampled_quantiles

    return sampled_quantiles(
        _read(spark, sf_dir, "events"), "value", "event_id",
        ["event_type"], fraction=0.25,
    )


def q_events_quantiles_loghist(spark, sf_dir):
    """Per-type quantiles from the MERGEABLE log-linear bucket sketch
    (library operator: operators/sketch.py loghist_quantiles_from —
    HdrHistogram layout, DDSketch-family guarantees): integer bucket
    counts merge bucket-wise (associative/commutative, so shards and
    days sketch independently and combine exactly), the bucket
    expression is native SQL at the scan, and the read-off is a bounded
    theta-join cumsum — no window, no per-value state."""
    from search_engine_spark.operators.sketch import loghist_quantiles_from

    return loghist_quantiles_from(
        _read(spark, sf_dir, "events"), "value", ["event_type"]
    )


def q_events_quantiles_loghist_merged(spark, sf_dir):
    """MERGE path of the log-linear sketch, proven in the correctness
    gate: the events table splits into 3 arbitrary parts, each part
    sketches independently, the sketches combine by bucket-wise integer
    add (loghist_merge), and the read-off must equal the UNSPLIT DuckDB
    oracle exactly — the mergeability contract (shards/days sketch
    independently, combine exactly) as a driver-checked row."""
    from search_engine_spark.operators.sketch import (
        loghist_merge,
        loghist_quantiles,
        loghist_sketch,
    )

    ev = _read(spark, sf_dir, "events")
    parts = [
        loghist_sketch(ev.filter(f"event_id % 3 = {i}"), "value",
                       ["event_type"])
        for i in range(3)
    ]
    return loghist_quantiles(
        loghist_merge(parts, ["event_type"]), ["event_type"]
    )


def q_events_quantiles_loghist_refined(spark, sf_dir):
    """REFINED read-off of the log-linear sketch (round 4 — CLAUDE.md
    #9d): the sums sketch carries a per-bucket HUGEINT/decimal(38,0)
    fixed-point value sum, and the quantile answers with the chosen
    bucket's MEAN instead of its lower edge — error well under one
    bucket width in practice, exact when the bucket holds one distinct
    value, while the merge contract stays bucket-wise integer add.
    Split-merge composed here too, so the driver row also re-proves
    mergeability of the refined columns."""
    from search_engine_spark.operators.sketch import (
        loghist_merge_sums,
        loghist_quantiles_refined,
        loghist_sketch_sums,
    )

    ev = _read(spark, sf_dir, "events")
    parts = [
        loghist_sketch_sums(ev.filter(f"event_id % 3 = {i}"), "value",
                            ["event_type"])
        for i in range(3)
    ]
    return loghist_quantiles_refined(
        loghist_merge_sums(parts, ["event_type"]), ["event_type"]
    )


def q_top_docs_per_lang(spark, sf_dir):
    """Per-group top-k via a PARTITIONED window (the scale-correct
    grouped-top-k shape — rank within lang, never a global sort): the 3
    largest docs by n_chars per language."""
    from pyspark.sql import Window

    docs = _read(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    return (
        docs.select("lang", "doc_id", "n_chars",
                    F.row_number().over(w).alias("rnk"))
        .filter(F.col("rnk") <= 3)
    )


DATE_FROM, DATE_TO = "2024-01-05", "2024-01-17"  # mid-range: bites


def q_events_date_filter(spark, sf_dir):
    """Date-range restriction through the calendar filter-posting family
    (operators/filters.py): events become pseudo-docs, post under their
    UTC day/month/year lemmas, and the inclusive range [DATE_FROM,
    DATE_TO] expands to its minimal ``date_cover`` lemma group — the
    semi-join on that group must select EXACTLY the rows DuckDB selects
    with a plain BETWEEN on CAST(ts AS DATE). Counts per event_type pin
    the selection."""
    from search_engine_spark.operators.filters import (
        build_filter_flat,
        filter_groups,
    )

    ev = _read(spark, sf_dir, "events")
    docs = ev.select(
        F.col("event_id").alias("doc_id"), "ts", F.lit("-").alias("scope")
    )
    flt = build_filter_flat(docs, cols=("date",))
    sel = ev.withColumnRenamed("event_id", "doc_id")
    for g in filter_groups(
        {"date": {"from": DATE_FROM, "to": DATE_TO}}, available=("date",)
    ):
        sel = sel.join(
            flt.filter(F.col("lemma").isin(list(g)))
            .select("doc_id")
            .distinct(),
            "doc_id",
            "left_semi",
        )
    return sel.groupBy("event_type").agg(F.count("*").alias("n_events"))


def q_events_sessions(spark, sf_dir):
    """30-min-gap sessionization per user → session count (lag + window)."""
    ev = _read(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    flagged = ev.withColumn(
        "new_s",
        F.when(gap.isNull() | (gap > 1800), F.lit(1)).otherwise(F.lit(0)),
    )
    return flagged.groupBy("user_id").agg(F.sum("new_s").alias("n_sessions"))


# ---------------------------------------------------------------------------
# 19-20: relational coverage (joins / rollups over TPC-H-ish tables)
# ---------------------------------------------------------------------------


def q_tpch_pricing(spark, sf_dir):
    """TPC-H Q1-style pricing summary over lineitem."""
    li = _read(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 6).alias("sum_base_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def q_tpch_top_customers(spark, sf_dir):
    """Broadcast-join orders ⋈ customer ⋈ nation, top-10 by revenue."""
    o = _read(spark, sf_dir, "orders")
    c = _read(spark, sf_dir, "customer")
    n = _read(spark, sf_dir, "nation")
    rev = (
        o.groupBy("o_custkey").agg(F.round(F.sum("o_totalprice"), 6).alias("revenue"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("c_custkey").alias("custkey"),
            F.col("n_name").alias("nation"),
            "revenue",
        )
    )
    return rev.orderBy(F.desc("revenue"), F.asc("custkey")).limit(10)


def q_tpch_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: orders ⋈ lineitem on the order key with date
    predicates PUSHED to both parquet scans, revenue = Σ extendedprice·
    (1−discount) per (orderkey, orderdate, priority), top-10. Float pin:
    each revenue term is ONE IEEE multiply then a cast to decimal(18,4)
    (deterministic HALF_UP at 4dp both engines), and the SUM runs in
    decimal — exact and order-free under any partitioning (the
    classifier's integer-gradient trick); one final round6 double. Plan:
    both sides filter at the scan, partial aggs map-side, TakeOrdered
    for the top-k — no global sort."""
    o = _read(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1998-01-01"
    )
    li = _read(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1998-01-01"
    )
    rev = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(
                    F.expr(
                        "cast(l_extendedprice * (1.0 - l_discount) "
                        "as decimal(18,4))"
                    )
                ).cast("double"),
                6,
            ).alias("revenue")
        )
        .select(
            F.col("l_orderkey").alias("orderkey"),
            F.col("o_orderdate").alias("orderdate"),
            F.col("o_orderpriority").alias("priority"),
            "revenue",
        )
    )
    return rev.orderBy(F.desc("revenue"), F.asc("orderkey")).limit(10)


# ---------------------------------------------------------------------------
# curation suite: cluster resolution, packing, sampling, funnel
# ---------------------------------------------------------------------------


def q_dedup_clusters(spark, sf_dir):
    """Near-dup PAIRS resolved into duplicate CLUSTERS: MinHash-LSH
    verified pairs → distributed connected components (alternating
    large-star/small-star, operators/curate.py) → (doc_id, component =
    min id in the cluster = the canonical keeper, cluster_size)."""
    from search_engine_spark.operators.curate import dedup_clusters
    from search_engine_spark.operators.dedup import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(
        _shingles(spark, sf_dir), JACCARD_THRESHOLD,
        MH_A, MH_B, HASH_MOD, N_BANDS,
    )
    return dedup_clusters(pairs)


def q_pack_bins(spark, sf_dir):
    """Offset-based sequence packing: docs concatenated in doc_id order,
    bin = floor(start_offset / budget) via the prefix-bucketed distributed
    cumsum (operators/curate.py) — per-bin rollup."""
    from search_engine_spark.operators.curate import pack_bins

    docs = _read(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.expr("regexp_extract_all(text, '[^\\\\s]+', 0)"))
        .cast("long")
        .alias("n_tokens"),
    )
    return pack_bins(docs, PACK_BUDGET)


def q_stratified_sample(spark, sf_dir):
    """Deterministic per-language Bernoulli sample (md5-threshold
    predicate, operators/curate.py) — same sample on any cluster size."""
    from search_engine_spark.operators.curate import stratified_sample

    return stratified_sample(
        _read(spark, sf_dir, "documents"), SAMPLE_FRACS, SAMPLE_DEFAULT
    ).select("doc_id", "lang")


MIX_TARGET = {"src0": 0.5, "src1": 0.3, "src2": 0.2}
MIX_BUDGET = 4000
CHUNK_W, CHUNK_OV = 40, 10


def q_chunk_windows(spark, sf_dir):
    """Sliding-window chunking (operators/curate.py chunk_windows):
    40-token windows advancing 30, whitespace tokens of the raw text —
    the fixed-context training-sample preparation step. Map-only
    higher-order-function pass, no shuffle."""
    from search_engine_spark.operators.curate import chunk_windows

    return chunk_windows(
        _read(spark, sf_dir, "documents"), CHUNK_W, CHUNK_OV
    )


# stored percolator queries (operators/percolate.py): pinned alert set —
# AND + NOT semantics over the contract tokenizer; one source of truth for
# the Spark kernel and the generated DuckDB twin
PERC_QUERIES = [
    (1, "spark window"),
    (2, "merge batch"),
    (3, "customer -slow"),
    (4, "vector group table"),
    (5, "query key -agg"),
    # round 4: phrase alerts — ordered-sequence constraints decided by
    # the pinned reachability sweep (oracle.phrase_match_doc); the
    # DuckDB twin states the same predicate as nested EXISTS chains
    (6, '"merge batch"'),
    (7, '"query scan"~1 -slow'),
]


def q_percolate(spark, sf_dir):
    """Reverse search (ES-percolator analog, operators/percolate.py):
    which stored alert queries match each document — shuffle-free narrow
    mapInPandas with a token→queries candidate index; the same operator
    runs unchanged on a streaming DataFrame (test_percolate.py)."""
    from search_engine_spark.operators.percolate import percolate

    return percolate(_read(spark, sf_dir, "documents"), PERC_QUERIES)


def q_percolate_rates(spark, sf_dir):
    """Per-alert match counts through the BROADCAST registry path
    (operators/percolate.py AlertRegistry — the refreshable 10^6-alert
    shape) + the rate roll-up: same matches as ``percolate``, compiled
    set distributed as a Spark broadcast variable instead of a task
    closure."""
    from search_engine_spark.operators.percolate import (
        AlertRegistry,
        alert_rates,
    )

    reg = AlertRegistry(spark, PERC_QUERIES)
    return alert_rates(reg.percolate(_read(spark, sf_dir, "documents")))


def q_kmv_distinct(spark, sf_dir):
    """KMV distinct-count sketch (operators/sketch.py): estimated
    distinct texts per source from the k=16 smallest pinned 60-bit md5
    hashes — the COUNT(DISTINCT) replacement whose shuffle is ≤ k rows
    per group per partition at any scale. Groups under 16 distinct take
    the exact fallback, so both branches are contract-covered."""
    from search_engine_spark.operators.sketch import kmv_distinct

    return kmv_distinct(
        _read(spark, sf_dir, "documents"), "text", k=16,
        group_cols=["source"],
    )


def q_frequent_tokens(spark, sf_dir):
    """Misra–Gries heavy hitters (operators/sketch.py frequent_items):
    every token in ≥ 3.4% of all token occurrences, with EXACT counts —
    candidate pass bounded at ⌈500/17⌉ counters per partition, exact
    recount of candidates only; never a full-vocabulary shuffle."""
    from search_engine_spark.operators.sketch import frequent_items

    toks = _read(spark, sf_dir, "documents").select(
        F.explode(F.expr(TOKS_SQL)).alias("tok")
    )
    return frequent_items(toks, "tok", 17, 500)


def q_mixture_rates(spark, sf_dir):
    """Token-budget data mixing (operators/curate.py mixture_rates):
    per-source Bernoulli keep-rates hitting a target token mixture —
    rate = round(least(1, budget*prop/source_tokens), 6) over the
    documents table's n_chars budget column. The rates feed
    stratified_sample(strata_col='source') to materialize the mix."""
    from search_engine_spark.operators.curate import mixture_rates

    return mixture_rates(
        _read(spark, sf_dir, "documents"), MIX_TARGET, MIX_BUDGET,
        tokens_col="n_chars",
    )


def q_quality_funnel(spark, sf_dir):
    """Curation funnel: each doc claimed by the first failing quality rule
    (operators/curate.py) — (stage, n_docs) in one conditional agg pass."""
    from search_engine_spark.operators.curate import quality_funnel

    return quality_funnel(
        _read(spark, sf_dir, "documents"), _FUNNEL_RULES_SPARK
    )


def q_redact_pii(spark, sf_dir):
    """PII scrub (operators/text.py redact_pii): pinned email/ipv4/
    long-digit rules, counts on the original text, sequential
    replacement in rule order. The synthetic corpus holds no PII, so
    the query INJECTS it deterministically per doc (same injection in
    the twin) — the redactions are real, not vacuous zero-counts."""
    from search_engine_spark.operators.text import redact_pii

    docs = _read(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" mail u"), F.col("doc_id").cast("string"),
            F.lit("@ex.io ip 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".7 acct "),
            (F.col("doc_id") * 37 + 100000000).cast("string"),
        ).alias("text"),
    )
    return redact_pii(docs).select(
        "doc_id", "n_email", "n_ipv4", "n_idnum", "text"
    )


def q_repetition_signals(spark, sf_dir):
    """Gopher-style within-document repetition signals (operators/
    text.py repetition_signals): most-frequent-token ratio and
    duplicate 2-/3-gram ratios over the shared token stream — the
    quality thresholds of Rae et al. 2021 table A1. Map-only
    higher-order-function pass, zero shuffle, zero Python."""
    from search_engine_spark.operators.text import repetition_signals

    return repetition_signals(_read(spark, sf_dir, "documents"), TOKS_SQL)


def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination (operators/curate.py decontaminate):
    flag training docs holding >= 4/5 of an eval item's matchable
    3-shingles. Eval shingles and the doc-shingle join both broadcast;
    the boilerplate df-cap (> DECON_MAX_DF docs) is exercised too."""
    from search_engine_spark.operators.curate import decontaminate

    eval_sh = (
        _read(spark, sf_dir, "documents")
        .filter((F.col("doc_id") % DECON_MOD) == DECON_REM)
        .select(
            F.col("doc_id").alias("eval_id"),
            F.slice(F.expr(TOKS_SQL), 1, DECON_PREFIX_TOKENS).alias("_t"),
        )
        .filter(F.size("_t") >= 3)
        .select("eval_id", F.explode(F.expr(_SHINGLES_SPARK)).alias("sh"))
        .distinct()
    )
    return decontaminate(
        _shingles(spark, sf_dir), eval_sh,
        DECON_NUM, DECON_DEN, max_shingle_df=DECON_MAX_DF,
    )


# ---------------------------------------------------------------------------
# conversation suite (operators/conversations.py twins) — the driver's
# tables carry no transcripts, so a transcripts-shaped view is DERIVED
# from documents with pinned arithmetic, identically in both engines:
# conv = doc_id % CONV_MOD, turn = doc_id div CONV_MOD (unique per conv),
# role alternates by parity, tool by residue mod 7
# ---------------------------------------------------------------------------

CONV_MOD = 101
CTX_PREV = 3  # context_windows: previous-turn budget
CONV_BUDGET = 120  # assemble_samples: tokens per training sample
SPAN_W = 8  # duplicate_spans: tokens per gram

_CONV_DUCK = f"""
    SELECT 'c' || (doc_id % {CONV_MOD})::VARCHAR AS conv_id,
           (doc_id // {CONV_MOD})::BIGINT AS turn_idx,
           CASE WHEN doc_id % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
           text,
           CASE WHEN doc_id % 7 = 3 THEN 'search'
                WHEN doc_id % 7 = 5 THEN 'python' END AS tool
    FROM documents
"""


def _conv(spark, sf_dir) -> DataFrame:
    d = _read(spark, sf_dir, "documents")
    return d.select(
        F.concat(
            F.lit("c"), (F.col("doc_id") % CONV_MOD).cast("string")
        ).alias("conv_id"),
        F.expr(f"doc_id div {CONV_MOD}").cast("long").alias("turn_idx"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("user"))
        .otherwise(F.lit("assistant"))
        .alias("role"),
        "text",
        F.when(F.col("doc_id") % 7 == 3, F.lit("search"))
        .when(F.col("doc_id") % 7 == 5, F.lit("python"))
        .alias("tool"),
    )


def q_conv_stats(spark, sf_dir):
    """Per-conversation rollup (operators/conversations.py
    conversation_stats): turn/role/tool counts and token budget — the
    curation-filter input for dialogue data. One hash agg."""
    from search_engine_spark.operators.conversations import (
        conversation_stats,
    )

    return conversation_stats(_conv(spark, sf_dir))


def q_conv_context(spark, sf_dir):
    """(context, target) next-turn-prediction pairs
    (operators/conversations.py context_windows): each assistant turn
    with its previous <= CTX_PREV turns rendered as the prompt. One
    partitioned window."""
    from search_engine_spark.operators.conversations import context_windows

    return context_windows(_conv(spark, sf_dir), CTX_PREV)


def q_conv_samples(spark, sf_dir):
    """Fixed-token-budget conversation segmentation
    (operators/conversations.py assemble_samples): offset-based
    turn-boundary splits into ~CONV_BUDGET-token training samples."""
    from search_engine_spark.operators.conversations import assemble_samples

    return assemble_samples(_conv(spark, sf_dir), CONV_BUDGET)


def q_tool_transitions(spark, sf_dir):
    """Tool-call bigram transition counts (operators/conversations.py
    tool_transitions): agent-behavior analytics over the tool stream."""
    from search_engine_spark.operators.conversations import tool_transitions

    return tool_transitions(_conv(spark, sf_dir))


def q_dup_spans(spark, sf_dir):
    """Exact substring-level duplication (operators/dedup.py
    duplicate_spans, Lee et al. 2022 at SPAN_W-token granularity):
    per-doc count of width-grams shared verbatim with other docs —
    catches partial copies that doc-level MinHash/SimHash miss."""
    from search_engine_spark.operators.dedup import duplicate_spans

    return duplicate_spans(_read(spark, sf_dir, "documents"), SPAN_W)


HASHVEC_DIM = 32  # hashing_vectors: feature-hashing dimensionality


def q_hashing_vectors(spark, sf_dir):
    """Feature-hashing doc vectors (operators/text.py hashing_vectors,
    Weinberger et al. 2009): sparse L2-normalized hashed-tf rows —
    model-free embeddings for the ANN suite. Integer signed bucket
    sums and an integer norm-square, so the only float op is one
    pinned round(s / sqrt(ss), 6)."""
    from search_engine_spark.operators.text import hashing_vectors

    return hashing_vectors(_read(spark, sf_dir, "documents"), dim=HASHVEC_DIM)


PRF_FEEDBACK_K = 10  # prf_expand: feedback depth
PRF_EXPAND_N = 3  # prf_expand: expansion terms kept
PRF_BETA = 0.4  # prf_expand: expansion weight


def q_prf_expand(spark, sf_dir):
    """Pseudo-relevance-feedback expansion (QueryServer.search_prf /
    oracle.prf_search are the full-engine pins; this is the
    contract-tokenizer twin of the operator math): OR-BM25 top-10 over
    the seed terms → JLH significant terms of that feedback set
    (fg_df ≥ 2, fg_pct > bg_pct, seeds excluded, top PRF_EXPAND_N by
    (jlh desc, term asc)) → weighted OR rerun with seeds at 1.0 and
    expansions at PRF_BETA (the single ``weight * idf`` boost
    multiply). All stages stay DataFrames — the expansion list is a
    3-row broadcast join, never a driver round-trip."""
    seeds = BM25_TERMS
    per1 = _bm25_per_term(spark, sf_dir, seeds)
    fb = (
        per1.groupBy("doc_id")
        .agg(F.round(F.sum("_s"), 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(PRF_FEEDBACK_K)
        .select("doc_id")
    )
    tfall = _tf(spark, sf_dir)
    nf = fb.agg(F.count("*").cast("double").alias("nf"))
    docs = _read(spark, sf_dir, "documents")
    nd = docs.agg(F.count("*").cast("double").alias("nd"))
    fgc = (
        tfall.join(F.broadcast(fb), "doc_id")
        .groupBy("term")
        .agg(F.count("*").alias("fg_df"))
        .filter(F.col("fg_df") >= 2)
    )
    bgc = tfall.groupBy("term").agg(F.count("*").alias("bg_df"))
    sig = (
        fgc.join(bgc, "term")
        .crossJoin(F.broadcast(nf))
        .crossJoin(F.broadcast(nd))
        .withColumn("fg_pct", F.col("fg_df").cast("double") / F.col("nf"))
        .withColumn("bg_pct", F.col("bg_df").cast("double") / F.col("nd"))
        .filter(F.col("fg_pct") > F.col("bg_pct"))
        .filter(~F.col("term").isin(seeds))
        .withColumn(
            "jlh",
            F.round(
                (F.col("fg_pct") - F.col("bg_pct"))
                * (F.col("fg_pct") / F.col("bg_pct")),
                6,
            ),
        )
        .orderBy(F.desc("jlh"), F.asc("term"))
        .limit(PRF_EXPAND_N)
        .select("term", F.lit(float(PRF_BETA)).alias("w"))
    )
    weights = spark.createDataFrame(
        [(t, 1.0) for t in seeds], "term STRING, w DOUBLE"
    ).unionByName(sig)
    lens = docs.select(
        "doc_id", F.size(F.expr(TOKS_SQL)).cast("double").alias("dl")
    )
    stats = lens.agg(F.count("*").alias("n"), F.avg("dl").alias("avgdl")).collect()[0]
    n, avgdl = stats["n"], stats["avgdl"]
    tf2 = tfall.join(F.broadcast(weights), "term")
    dfs2 = tf2.groupBy("term").agg(F.count("*").alias("df"))
    per2 = (
        tf2.join(dfs2, "term")
        .join(lens, "doc_id")
        .withColumn(
            "_idf",
            F.col("w")
            * F.log(
                F.lit(1.0)
                + (F.lit(float(n)) - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ),
        )
        .withColumn(
            "_s",
            F.col("_idf")
            * F.col("tf")
            * F.lit(BM25_K1 + 1.0)
            / (
                F.col("tf")
                + F.lit(BM25_K1)
                * (F.lit(1.0 - BM25_B) + F.lit(BM25_B) * F.col("dl") / F.lit(avgdl))
            ),
        )
    )
    return (
        per2.groupBy("doc_id")
        .agg(F.round(F.sum("_s"), 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
    )


SHUFFLE_SHARDS_N = 8  # shuffle_shards: training-export shard count


def q_shuffle_shards(spark, sf_dir):
    """Deterministic global training-data shuffle (operators/curate.py
    shuffle_assign): pseudorandom shard + within-shard total order from
    md5(salt || key) — identical at any partitioning or cluster size,
    no RNG state. The one-shuffle export materializer
    (write_training_shards) builds on this assignment."""
    from search_engine_spark.operators.curate import shuffle_assign

    return shuffle_assign(
        _read(spark, sf_dir, "documents"), SHUFFLE_SHARDS_N
    ).select("doc_id", "shard", "sort_key")


LOGREG_ITERS = 3  # logreg_weights: gradient-descent iterations


def q_logreg_weights(spark, sf_dir):
    """Hashed linear classifier training (operators/classify.py,
    fastText/DCLM-style curation probe): logistic regression over the
    hashing_vectors features with integer-exact fixed-point gradients
    (order-free sums — the only float ops are the pinned rounded
    sigmoid and the floor(x+0.5) driver update). Label here = presence
    of the 'dup' token (a deterministic stand-in; real use plugs any
    0/1 column). Output = the learned 6dp weight vector."""
    from search_engine_spark.operators.classify import train_linear
    from search_engine_spark.operators.text import hashing_vectors

    docs = _read(spark, sf_dir, "documents")
    feats = hashing_vectors(docs, dim=HASHVEC_DIM)
    labels = docs.select(
        "doc_id",
        F.expr(f"if(array_contains({TOKS_SQL}, 'dup'), 1, 0)").alias("label"),
    )
    w6 = train_linear(feats, labels, HASHVEC_DIM, iters=LOGREG_ITERS, lr=1.0)
    return spark.createDataFrame(
        [(b, round(w6[b] / 1_000_000, 6)) for b in range(HASHVEC_DIM)],
        "bucket INT, weight DOUBLE",
    )


def q_logreg_scores(spark, sf_dir):
    """Corpus scoring under the trained probe (operators/classify.py
    predict_linear): the integer margin + the one pinned sigmoid per
    doc — the scan-shaped 'score 100 TB under the cheap classifier'
    pass; featureless docs pin to 0.5."""
    from search_engine_spark.operators.classify import (
        predict_linear,
        train_linear,
    )
    from search_engine_spark.operators.text import hashing_vectors

    docs = _read(spark, sf_dir, "documents")
    feats = hashing_vectors(docs, dim=HASHVEC_DIM)
    labels = docs.select(
        "doc_id",
        F.expr(f"if(array_contains({TOKS_SQL}, 'dup'), 1, 0)").alias("label"),
    )
    w6 = train_linear(feats, labels, HASHVEC_DIM, iters=LOGREG_ITERS, lr=1.0)
    return predict_linear(feats, labels, w6)


SEMDEDUP_TAU = 0.3  # semdedup: within-cluster cosine prune threshold
# (the synthetic embeddings' high-similarity tail; real corpora ~0.95)


def q_semdedup(spark, sf_dir):
    """SemDeDup (operators/dedup.py semdedup, Abbas et al. 2023):
    k-means topic clusters (the pinned 6dp kmeans), then within-cluster
    cosine pruning — keep=false iff a lower-id cluster member has
    round(cos, 6) >= SEMDEDUP_TAU. Cosine sums fold left-to-right in
    dimension order on both engines."""
    from search_engine_spark.operators.dedup import semdedup

    return semdedup(
        _read(spark, sf_dir, "embeddings"), k=4, iters=2,
        threshold=SEMDEDUP_TAU,
    )


BPE_MERGES_N = 8  # bpe_merges: learned merge count
BPE_TOP_V = 300  # bpe_merges: word-count vocabulary truncation


def q_bpe_merges(spark, sf_dir):
    """Distributed BPE tokenizer training (operators/bpe.py, Sennrich
    et al. 2016): BPE_MERGES_N merges learned over the top-BPE_TOP_V
    word-count table of the documents corpus. Merge pick pinned
    (count desc, pair asc); greedy left-to-right apply pinned by the
    double-separator replace (same literal `replace` semantics in
    Spark, DuckDB and Python). Integer counts — no float pins. The
    merge list is the operator's (tiny) output; the heavy operands
    (corpus word-count pass, per-iteration pair aggregation) ran
    distributed."""
    from search_engine_spark.operators.bpe import bpe_train, word_counts

    wc = word_counts(_read(spark, sf_dir, "documents"), top_v=BPE_TOP_V)
    merges = bpe_train(wc, BPE_MERGES_N)
    return spark.createDataFrame(
        [(i + 1, p, c) for i, (p, c) in enumerate(merges)],
        "merge_rank INT, pair STRING, cnt BIGINT",
    )


def bpe_merges_duck(n_merges: int, top_v: int | None) -> str:
    """Unrolled-CTE DuckDB twin of the BPE trainer: m0..mN repr tables
    (word → double-space-joined symbols + </w>), per-iteration pair
    counts p_i, pinned pick b_i, merge-apply m_i via the same padded
    double-separator literal replace. `§ §` is the never-matching
    fallback pattern once the vocabulary exhausts (symbols are
    [a-z0-9]+ or </w>)."""
    lim = f"LIMIT {top_v}" if top_v is not None else ""
    parts = [
        f"""
        WITH w AS MATERIALIZED (
            SELECT word, count(*)::BIGINT AS freq FROM (
                SELECT unnest({TOKS_DUCK}) AS word FROM documents)
            GROUP BY word ORDER BY freq DESC, word ASC {lim}
        ),
        m0 AS MATERIALIZED (
            SELECT word, freq,
                   trim(regexp_replace(word, '(.)', '\\1  ', 'g'))
                     || '  </w>' AS repr
            FROM w
        )"""
    ]
    for i in range(1, n_merges + 1):
        parts.append(f"""
        p{i} AS (
            SELECT s[i] || ' ' || s[i+1] AS pair, sum(freq)::BIGINT AS cnt
            FROM (SELECT freq, str_split(repr, '  ') AS s,
                         unnest(range(1, len(str_split(repr, '  ')))) AS i
                  FROM m{i - 1})
            GROUP BY 1
        ),
        b{i} AS MATERIALIZED (
            SELECT pair, cnt FROM p{i} ORDER BY cnt DESC, pair ASC LIMIT 1
        ),
        m{i} AS MATERIALIZED (
            SELECT word, freq,
                   trim(regexp_replace(
                       replace(' ' || repr || ' ',
                               ' ' || replace(coalesce((SELECT pair FROM b{i}),
                                                       '§ §'), ' ', '  ') || ' ',
                               ' ' || replace(coalesce((SELECT pair FROM b{i}),
                                                       '§ §'), ' ', '') || ' '),
                       ' +', '  ', 'g')) AS repr
            FROM m{i - 1}
        )""")
    ranks = "\n            UNION ALL ".join(
        f"SELECT {i} AS merge_rank, pair, cnt FROM b{i}"
        for i in range(1, n_merges + 1)
    )
    return (
        ",".join(parts)
        + f"\n        SELECT * FROM ({ranks}) ORDER BY merge_rank"
    )


# ---------------------------------------------------------------------------
# DuckDB oracle SQL twins
# ---------------------------------------------------------------------------

_THD = _TOKHASH_DUCK.format(col="sh")
_THD_TERM = _TOKHASH_DUCK.format(col="term")
_SEEDS_DUCK = ", ".join(
    f"({i}, {MH_A[i]}::BIGINT, {MH_B[i]}::BIGINT)" for i in range(N_MINHASH)
)

_JACCARD_VERIFY_DUCK = f"""
    sizes AS (SELECT doc_id, count(*) AS sz
              FROM ({_SHINGLES_FLAT_DUCK}) GROUP BY doc_id),
    common AS (
        SELECT c.a_id, c.b_id, count(*) AS _c
        FROM cand c
        JOIN ({_SHINGLES_FLAT_DUCK}) sa ON sa.doc_id = c.a_id
        JOIN ({_SHINGLES_FLAT_DUCK}) sb ON sb.doc_id = c.b_id AND sb.sh = sa.sh
        GROUP BY c.a_id, c.b_id)
    SELECT common.a_id, common.b_id,
           round(_c::DOUBLE / (za.sz + zb.sz - _c), 6) AS jaccard
    FROM common
    JOIN sizes za ON za.doc_id = common.a_id
    JOIN sizes zb ON zb.doc_id = common.b_id
    WHERE round(_c::DOUBLE / (za.sz + zb.sz - _c), 6) >= {JACCARD_THRESHOLD}
"""


def _oracle_sql_map() -> dict[str, str]:
    plane_sign = _plane_sign_sql("j", "d")
    minhash_pairs = f"""
            WITH sh AS ({_SHINGLES_FLAT_DUCK}),
            hx AS (SELECT doc_id, {_THD} % {HASH_MOD} AS x FROM sh),
            seeds(i, a, b) AS (VALUES {_SEEDS_DUCK}),
            sigs AS (
                SELECT doc_id, i, min((a * x + b) % {HASH_MOD}) AS mh
                FROM hx CROSS JOIN seeds GROUP BY doc_id, i),
            bands AS (
                SELECT doc_id, (i // {N_MINHASH // N_BANDS}) AS band,
                       string_agg(mh::VARCHAR, ',' ORDER BY i) AS sig
                FROM sigs GROUP BY doc_id, band),
            cand AS (
                SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
                FROM bands a JOIN bands b
                  ON a.band = b.band AND a.sig = b.sig
                 AND a.doc_id < b.doc_id),
            {_JACCARD_VERIFY_DUCK}
    """
    return {
        "tf": _TF_DUCK,
        "df": f"""
            SELECT term, count(*) AS df, sum(tf)::BIGINT AS cf
            FROM ({_TF_DUCK}) GROUP BY term
        """,
        "doc_stats": f"""
            SELECT count(*) AS n_docs,
                   sum(len({TOKS_DUCK}))::BIGINT AS sum_doc_len,
                   round(avg(len({TOKS_DUCK})), 6) AS avg_doc_len
            FROM documents
        """,
        "conjunction": f"""
            SELECT doc_id FROM ({_TF_DUCK})
            WHERE term IN ('batch', 'dup', 'scan')
            GROUP BY doc_id HAVING count(*) = 3
        """,
        "cutoff_terms": f"""
            WITH n AS (SELECT count(*) AS n_docs FROM documents)
            SELECT term, count(*) AS df,
                   (count(*) <= (SELECT n_docs FROM n) / 100.0 * 5.0) AS usable
            FROM ({_TF_DUCK})
            WHERE term IN ('batch', 'dup', 'merge', 'the')
            GROUP BY term
        """,
        "sumtf_topk": f"""
            WITH scored AS (
                SELECT doc_id,
                       round(sum(tf)::DOUBLE / max(tf), 6) AS score
                FROM ({_TF_DUCK})
                WHERE term IN ('dup', 'key', 'window')
                GROUP BY doc_id HAVING count(*) = 3)
            SELECT doc_id, score FROM scored
            ORDER BY score DESC, doc_id ASC LIMIT 10
        """,
        "bm25_topk": f"""
            WITH lens AS (
                SELECT doc_id, len({TOKS_DUCK})::DOUBLE AS dl FROM documents),
            st AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM lens),
            tf AS (SELECT * FROM ({_TF_DUCK}) WHERE term IN ('dup', 'merge')),
            dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
            per AS (
                SELECT tf.doc_id,
                       ln(1.0 + ((SELECT n FROM st) - dfs.df + 0.5)
                                 / (dfs.df + 0.5))
                       * tf.tf * {BM25_K1 + 1.0}
                       / (tf.tf + {BM25_K1} * ({1.0 - BM25_B} + {BM25_B}
                          * lens.dl / (SELECT avgdl FROM st))) AS _s
                FROM tf JOIN dfs USING (term) JOIN lens USING (doc_id)),
            scored AS (
                SELECT doc_id, round(sum(_s), 6) AS score
                FROM per GROUP BY doc_id HAVING count(*) = 2)
            SELECT doc_id, score FROM scored
            ORDER BY score DESC, doc_id ASC LIMIT 10
        """,
        "significant_terms": f"""
            WITH tf AS ({_TF_DUCK}),
            fg AS (SELECT DISTINCT doc_id FROM tf WHERE term = 'dup'),
            nf AS (SELECT count(*)::DOUBLE AS n FROM fg),
            nd AS (SELECT count(*)::DOUBLE AS n FROM documents),
            fgc AS (
                SELECT term, count(*) AS fg_df
                FROM tf JOIN fg USING (doc_id)
                GROUP BY term HAVING count(*) >= 2),
            bgc AS (SELECT term, count(*) AS bg_df FROM tf GROUP BY term),
            j AS (
                SELECT term, fg_df, bg_df,
                       (fg_df::DOUBLE / (SELECT n FROM nf)) AS fg_pct,
                       (bg_df::DOUBLE / (SELECT n FROM nd)) AS bg_pct
                FROM fgc JOIN bgc USING (term))
            SELECT term, fg_df, bg_df,
                   round((fg_pct - bg_pct) * (fg_pct / bg_pct), 6) AS jlh
            FROM j WHERE fg_pct > bg_pct
            ORDER BY jlh DESC, term ASC LIMIT 15
        """,
        "bm25_boost_topk": f"""
            WITH lens AS (
                SELECT doc_id, len({TOKS_DUCK})::DOUBLE AS dl FROM documents),
            st AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM lens),
            tf AS (SELECT * FROM ({_TF_DUCK}) WHERE term IN ('dup', 'merge')),
            dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
            per AS (
                SELECT tf.doc_id,
                       (CASE tf.term WHEN 'dup' THEN 2.5 ELSE 1.0 END
                        * ln(1.0 + ((SELECT n FROM st) - dfs.df + 0.5)
                                    / (dfs.df + 0.5)))
                       * tf.tf * {BM25_K1 + 1.0}
                       / (tf.tf + {BM25_K1} * ({1.0 - BM25_B} + {BM25_B}
                          * lens.dl / (SELECT avgdl FROM st))) AS _s
                FROM tf JOIN dfs USING (term) JOIN lens USING (doc_id)),
            scored AS (
                SELECT doc_id, round(sum(_s), 6) AS score
                FROM per GROUP BY doc_id HAVING count(*) = 2)
            SELECT doc_id, score FROM scored
            ORDER BY score DESC, doc_id ASC LIMIT 10
        """,
        "impact_prefix": f"""
            WITH lens AS (
                SELECT doc_id, len({TOKS_DUCK})::BIGINT AS dl
                FROM documents),
            tf AS (SELECT * FROM ({_TF_DUCK})
                   WHERE term IN ('{IMPACT_TERMS[0]}',
                                  '{IMPACT_TERMS[1]}')),
            base AS (
                SELECT tf.term, tf.doc_id, tf.tf, lens.dl
                FROM tf JOIN lens USING (doc_id)),
            tops AS (
                (SELECT * FROM base WHERE term = '{IMPACT_TERMS[0]}'
                 ORDER BY tf DESC, dl ASC, doc_id ASC LIMIT {IMPACT_E})
                UNION ALL
                (SELECT * FROM base WHERE term = '{IMPACT_TERMS[1]}'
                 ORDER BY tf DESC, dl ASC, doc_id ASC LIMIT {IMPACT_E})),
            rest AS (
                SELECT b.* FROM base b
                WHERE NOT EXISTS (
                    SELECT 1 FROM tops t
                    WHERE t.term = b.term AND t.doc_id = b.doc_id))
            SELECT term, 0 AS kind, doc_id, tf, dl FROM tops
            UNION ALL
            SELECT term, 1 AS kind, -1::BIGINT AS doc_id, tf,
                   min(dl) AS dl
            FROM rest GROUP BY term, tf
        """,
        "bm25_search_after": f"""
            WITH lens AS (
                SELECT doc_id, len({TOKS_DUCK})::DOUBLE AS dl FROM documents),
            st AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM lens),
            tf AS (SELECT * FROM ({_TF_DUCK}) WHERE term IN ('dup', 'merge')),
            dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
            per AS (
                SELECT tf.doc_id,
                       ln(1.0 + ((SELECT n FROM st) - dfs.df + 0.5)
                                 / (dfs.df + 0.5))
                       * tf.tf * {BM25_K1 + 1.0}
                       / (tf.tf + {BM25_K1} * ({1.0 - BM25_B} + {BM25_B}
                          * lens.dl / (SELECT avgdl FROM st))) AS _s
                FROM tf JOIN dfs USING (term) JOIN lens USING (doc_id)),
            scored AS (
                SELECT doc_id, round(sum(_s), 6) AS score
                FROM per GROUP BY doc_id HAVING count(*) = 2),
            cur AS (
                SELECT score AS c_s, doc_id AS c_d FROM scored
                ORDER BY score DESC, doc_id ASC LIMIT 1 OFFSET 4)
            SELECT s.doc_id, s.score FROM scored s, cur
            WHERE s.score < cur.c_s
               OR (s.score = cur.c_s AND s.doc_id > cur.c_d)
            ORDER BY s.score DESC, s.doc_id ASC LIMIT 10
        """,
        "bm25_not_topk": f"""
            WITH lens AS (
                SELECT doc_id, len({TOKS_DUCK})::DOUBLE AS dl FROM documents),
            st AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM lens),
            tf AS (SELECT * FROM ({_TF_DUCK}) WHERE term IN ('dup', 'merge')),
            dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
            per AS (
                SELECT tf.doc_id,
                       ln(1.0 + ((SELECT n FROM st) - dfs.df + 0.5)
                                 / (dfs.df + 0.5))
                       * tf.tf * {BM25_K1 + 1.0}
                       / (tf.tf + {BM25_K1} * ({1.0 - BM25_B} + {BM25_B}
                          * lens.dl / (SELECT avgdl FROM st))) AS _s
                FROM tf JOIN dfs USING (term) JOIN lens USING (doc_id)),
            scored AS (
                SELECT doc_id, round(sum(_s), 6) AS score
                FROM per GROUP BY doc_id HAVING count(*) = 2)
            SELECT doc_id, score FROM scored
            WHERE doc_id NOT IN (
                SELECT doc_id FROM ({_TF_DUCK}) WHERE term = '{NOT_TERM}')
            ORDER BY score DESC, doc_id ASC LIMIT 10
        """,
        "bm25_bool_topk": f"""
            WITH lens AS (
                SELECT doc_id, len({TOKS_DUCK})::DOUBLE AS dl FROM documents),
            st AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM lens),
            tf AS (SELECT * FROM ({_TF_DUCK})
                   WHERE term IN ('dup', 'key', 'merge')),
            dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
            per AS (
                SELECT tf.doc_id, tf.term,
                       ln(1.0 + ((SELECT n FROM st) - dfs.df + 0.5)
                                 / (dfs.df + 0.5))
                       * tf.tf * {BM25_K1 + 1.0}
                       / (tf.tf + {BM25_K1} * ({1.0 - BM25_B} + {BM25_B}
                          * lens.dl / (SELECT avgdl FROM st))) AS _s
                FROM tf JOIN dfs USING (term) JOIN lens USING (doc_id)),
            have AS (
                SELECT doc_id,
                       max(CASE WHEN term = 'dup' THEN 1 ELSE 0 END) AS h_dup,
                       max(CASE WHEN term = 'key' THEN 1 ELSE 0 END) AS h_key,
                       max(CASE WHEN term = 'merge' THEN 1 ELSE 0 END)
                           AS h_merge,
                       round(sum(_s), 6) AS score
                FROM per GROUP BY doc_id)
            SELECT doc_id, score FROM have
            WHERE (h_dup = 1 OR h_merge = 1) AND h_key = 1
              AND doc_id NOT IN (
                SELECT doc_id FROM ({_TF_DUCK}) WHERE term = '{NOT_TERM}')
            ORDER BY score DESC, doc_id ASC LIMIT 10
        """,
        "bm25_synonym_topk": f"""
            WITH lens AS (
                SELECT doc_id, len({TOKS_DUCK})::DOUBLE AS dl FROM documents),
            st AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM lens),
            tf AS (SELECT * FROM ({_TF_DUCK})
                   WHERE term IN ('dup', 'key', 'merge', 'window')),
            dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
            per AS (
                SELECT tf.doc_id, tf.term,
                       ln(1.0 + ((SELECT n FROM st) - dfs.df + 0.5)
                                 / (dfs.df + 0.5))
                       * tf.tf * {BM25_K1 + 1.0}
                       / (tf.tf + {BM25_K1} * ({1.0 - BM25_B} + {BM25_B}
                          * lens.dl / (SELECT avgdl FROM st))) AS _s
                FROM tf JOIN dfs USING (term) JOIN lens USING (doc_id)),
            have AS (
                SELECT doc_id,
                       max(CASE WHEN term = 'dup' THEN 1 ELSE 0 END) AS h_dup,
                       max(CASE WHEN term = 'key' THEN 1 ELSE 0 END) AS h_key,
                       max(CASE WHEN term = 'merge' THEN 1 ELSE 0 END)
                           AS h_merge,
                       max(CASE WHEN term = 'window' THEN 1 ELSE 0 END)
                           AS h_window,
                       round(sum(_s), 6) AS score
                FROM per GROUP BY doc_id)
            SELECT doc_id, score FROM have
            WHERE (h_dup = 1 OR h_merge = 1) AND (h_key = 1 OR h_window = 1)
            ORDER BY score DESC, doc_id ASC LIMIT 10
        """,
        "bm25_filtered_topk": f"""
            WITH lens AS (
                SELECT doc_id, len({TOKS_DUCK})::DOUBLE AS dl FROM documents),
            st AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM lens),
            tf AS (SELECT * FROM ({_TF_DUCK}) WHERE term IN ('dup', 'merge')),
            dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
            per AS (
                SELECT tf.doc_id,
                       ln(1.0 + ((SELECT n FROM st) - dfs.df + 0.5)
                                 / (dfs.df + 0.5))
                       * tf.tf * {BM25_K1 + 1.0}
                       / (tf.tf + {BM25_K1} * ({1.0 - BM25_B} + {BM25_B}
                          * lens.dl / (SELECT avgdl FROM st))) AS _s
                FROM tf JOIN dfs USING (term) JOIN lens USING (doc_id)),
            scored AS (
                SELECT doc_id, round(sum(_s), 6) AS score
                FROM per GROUP BY doc_id HAVING count(*) = 2)
            SELECT doc_id, score FROM scored
            WHERE doc_id IN (
                SELECT doc_id FROM documents
                WHERE lang IS NOT NULL AND lang = '{FILTER_LANG}')
            ORDER BY score DESC, doc_id ASC LIMIT 10
        """,
        "collapse_by_source": f"""
            WITH lens AS (
                SELECT doc_id, len({TOKS_DUCK})::DOUBLE AS dl FROM documents),
            st AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM lens),
            tf AS (SELECT * FROM ({_TF_DUCK}) WHERE term IN ('dup', 'merge')),
            dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
            per AS (
                SELECT tf.doc_id,
                       ln(1.0 + ((SELECT n FROM st) - dfs.df + 0.5)
                                 / (dfs.df + 0.5))
                       * tf.tf * {BM25_K1 + 1.0}
                       / (tf.tf + {BM25_K1} * ({1.0 - BM25_B} + {BM25_B}
                          * lens.dl / (SELECT avgdl FROM st))) AS _s
                FROM tf JOIN dfs USING (term) JOIN lens USING (doc_id)),
            scored AS (
                SELECT doc_id, round(sum(_s), 6) AS score
                FROM per GROUP BY doc_id),
            j AS (
                SELECT s.doc_id, s.score, d.source,
                       row_number() OVER (
                           PARTITION BY d.source
                           ORDER BY s.score DESC, s.doc_id ASC) AS rk
                FROM scored s JOIN documents d USING (doc_id))
            SELECT doc_id, score, source FROM j WHERE rk <= 1
            ORDER BY score DESC, doc_id ASC LIMIT 10
        """,
        "wildcard_or_topk": f"""
            WITH base_tf AS ({_TF_DUCK}),
            cfs AS (SELECT term, sum(tf)::BIGINT AS cf
                    FROM base_tf GROUP BY term),
            exp AS (SELECT term FROM cfs WHERE term LIKE '{WC_PREFIX}%'
                    ORDER BY cf DESC, term ASC LIMIT {WC_K}),
            qt AS (SELECT term FROM exp UNION SELECT '{WC_TERM}'),
            lens AS (
                SELECT doc_id, len({TOKS_DUCK})::DOUBLE AS dl FROM documents),
            st AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM lens),
            tf AS (SELECT * FROM base_tf
                   WHERE term IN (SELECT term FROM qt)),
            dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
            per AS (
                SELECT tf.doc_id,
                       ln(1.0 + ((SELECT n FROM st) - dfs.df + 0.5)
                                 / (dfs.df + 0.5))
                       * tf.tf * {BM25_K1 + 1.0}
                       / (tf.tf + {BM25_K1} * ({1.0 - BM25_B} + {BM25_B}
                          * lens.dl / (SELECT avgdl FROM st))) AS _s
                FROM tf JOIN dfs USING (term) JOIN lens USING (doc_id)),
            scored AS (
                SELECT doc_id, round(sum(_s), 6) AS score
                FROM per GROUP BY doc_id)
            SELECT doc_id, score FROM scored
            ORDER BY score DESC, doc_id ASC LIMIT 10
        """,
        "rescore_proximity": f"""
            WITH lens AS (
                SELECT doc_id, len({TOKS_DUCK})::DOUBLE AS dl FROM documents),
            st AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM lens),
            tf AS (SELECT * FROM ({_TF_DUCK}) WHERE term IN ('dup', 'merge')),
            dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
            per AS (
                SELECT tf.doc_id,
                       ln(1.0 + ((SELECT n FROM st) - dfs.df + 0.5)
                                 / (dfs.df + 0.5))
                       * tf.tf * {BM25_K1 + 1.0}
                       / (tf.tf + {BM25_K1} * ({1.0 - BM25_B} + {BM25_B}
                          * lens.dl / (SELECT avgdl FROM st))) AS _s
                FROM tf JOIN dfs USING (term) JOIN lens USING (doc_id)),
            lex AS (
                SELECT doc_id, round(sum(_s), 6) AS score
                FROM per GROUP BY doc_id
                ORDER BY score DESC, doc_id ASC LIMIT 50),
            t AS (SELECT doc_id, {TOKS_DUCK} AS _t FROM documents
                  WHERE doc_id IN (SELECT doc_id FROM lex)),
            pa AS (SELECT doc_id,
                          unnest([i for i in range(len(_t))
                                  if _t[i + 1] = 'dup']) AS ia FROM t),
            pb AS (SELECT doc_id,
                          unnest([i for i in range(len(_t))
                                  if _t[i + 1] = 'merge']) AS ib FROM t),
            sp AS (SELECT doc_id, min(abs(ia - ib) + 1) AS span
                   FROM pa JOIN pb USING (doc_id) GROUP BY doc_id)
            SELECT lex.doc_id,
                   round(lex.score
                         + coalesce(1.0 / (1 + sp.span - 2), 0.0), 6)
                       AS score
            FROM lex LEFT JOIN sp USING (doc_id)
            ORDER BY score DESC, doc_id ASC LIMIT 10
        """,
        "bm25_or_topk": f"""
            WITH lens AS (
                SELECT doc_id, len({TOKS_DUCK})::DOUBLE AS dl FROM documents),
            st AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM lens),
            tf AS (SELECT * FROM ({_TF_DUCK}) WHERE term IN ('dup', 'merge')),
            dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
            per AS (
                SELECT tf.doc_id,
                       ln(1.0 + ((SELECT n FROM st) - dfs.df + 0.5)
                                 / (dfs.df + 0.5))
                       * tf.tf * {BM25_K1 + 1.0}
                       / (tf.tf + {BM25_K1} * ({1.0 - BM25_B} + {BM25_B}
                          * lens.dl / (SELECT avgdl FROM st))) AS _s
                FROM tf JOIN dfs USING (term) JOIN lens USING (doc_id)),
            scored AS (
                SELECT doc_id, round(sum(_s), 6) AS score
                FROM per GROUP BY doc_id)
            SELECT doc_id, score FROM scored
            ORDER BY score DESC, doc_id ASC LIMIT 10
        """,
        "phrase_match": f"""
            WITH t AS (SELECT doc_id, {TOKS_DUCK} AS _t FROM documents)
            SELECT doc_id FROM t
            WHERE len([i for i in range(1, len(_t))
                       if _t[i] = 'merge' AND _t[i + 1] = 'batch']) > 0
        """,
        "more_like_this": f"""
            WITH dt AS (
                SELECT DISTINCT doc_id, term
                FROM (SELECT doc_id, unnest({TOKS_DUCK}) AS term
                      FROM documents)),
            dfs AS (SELECT term, count(*) AS df FROM dt GROUP BY term),
            interesting AS (
                SELECT dt.term FROM dt JOIN dfs USING (term)
                WHERE dt.doc_id = {MLT_DOC_ID}
                ORDER BY dfs.df ASC, dt.term ASC LIMIT {MLT_TOP_TERMS})
            SELECT dt.doc_id, count(*) AS shared_terms
            FROM dt JOIN interesting USING (term)
            WHERE dt.doc_id != {MLT_DOC_ID}
            GROUP BY dt.doc_id
            ORDER BY shared_terms DESC, doc_id ASC LIMIT 10
        """,
        "facet_counts": f"""
            WITH matches AS (
                SELECT doc_id FROM ({_TF_DUCK})
                WHERE term IN ('batch', 'dup', 'scan')
                GROUP BY doc_id HAVING count(*) = 3)
            SELECT lang, source, count(*) AS n_docs
            FROM documents JOIN matches USING (doc_id)
            GROUP BY lang, source
        """,
        "fuzzy_match": f"""
            WITH dict AS (
                SELECT term, count(*) AS df FROM ({_TF_DUCK}) GROUP BY term)
            SELECT term, df, levenshtein(term, '{FUZZY_TERM}')::INT AS dist
            FROM dict
            WHERE levenshtein(term, '{FUZZY_TERM}') <= 1
            ORDER BY df DESC, term ASC LIMIT 64
        """,
        "fuzzy_match2": f"""
            WITH dict AS (
                SELECT term, count(*) AS df FROM ({_TF_DUCK}) GROUP BY term)
            SELECT term, df, levenshtein(term, '{FUZZY2_TERM}')::INT AS dist
            FROM dict
            WHERE levenshtein(term, '{FUZZY2_TERM}') <= 2
            ORDER BY dist ASC, df DESC, term ASC LIMIT 64
        """,
        "suggest_prefix": f"""
            WITH dict AS (
                SELECT term, sum(tf)::BIGINT AS cf
                FROM ({_TF_DUCK}) GROUP BY term)
            SELECT term, cf FROM dict
            WHERE term LIKE '{SUGGEST_PREFIX}%'
            ORDER BY cf DESC, term ASC LIMIT {SUGGEST_K}
        """,
        "docs_ids": """
            WITH tr AS (
                SELECT source AS conv_id,
                       (row_number() OVER (PARTITION BY source ORDER BY doc_id)
                        - 1)::INT AS turn_idx
                FROM documents)
            SELECT conv_id, turn_idx,
                   row_number() OVER (ORDER BY conv_id, turn_idx) AS doc_id_new
            FROM tr
        """,
        "dedup_exact": """
            SELECT count(*) AS n_docs,
                   count(DISTINCT md5(text)) AS n_distinct_texts
            FROM documents
        """,
        "dedup_ngram_jaccard": f"""
            WITH sh AS ({_SHINGLES_FLAT_DUCK}),
            sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
            common AS (
                SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS _c
                FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
                GROUP BY a.doc_id, b.doc_id)
            SELECT a_id, b_id,
                   round(_c::DOUBLE / (za.sz + zb.sz - _c), 6) AS jaccard
            FROM common
            JOIN sizes za ON za.doc_id = a_id
            JOIN sizes zb ON zb.doc_id = b_id
            WHERE round(_c::DOUBLE / (za.sz + zb.sz - _c), 6)
                  >= {JACCARD_THRESHOLD}
        """,
        "dedup_minhash_lsh": minhash_pairs,
        "dedup_clusters": f"""
            WITH RECURSIVE pairs AS ({minhash_pairs}),
            edges AS (SELECT a_id AS u, b_id AS v FROM pairs
                      UNION SELECT b_id, a_id FROM pairs),
            reach(node, r) AS (
                SELECT u, u FROM edges
                UNION
                SELECT e.v, reach.r FROM reach JOIN edges e
                  ON e.u = reach.node),
            comp AS (SELECT node, min(r) AS component
                     FROM reach GROUP BY node),
            sizes AS (SELECT component, count(*) AS cluster_size
                      FROM comp GROUP BY component)
            SELECT node AS doc_id, component, cluster_size
            FROM comp JOIN sizes USING (component)
        """,
        "dedup_simhash": f"""
            WITH tf AS (SELECT doc_id, term, tf, {_THD_TERM} AS th
                        FROM ({_TF_DUCK})),
            contrib AS (
                SELECT doc_id, bit,
                       sum(tf * (((th >> bit) & 1) * 2 - 1)) AS s
                FROM tf CROSS JOIN (SELECT unnest(range(63)) AS bit)
                GROUP BY doc_id, bit)
            SELECT doc_id,
                   sum(CASE WHEN s > 0 THEN 1::BIGINT << bit ELSE 0 END)::BIGINT
                       AS simhash
            FROM contrib GROUP BY doc_id
        """,
        "ann_cosine_topk": """__FILLED_AT_RUNTIME__""",
        "ann_lsh_buckets": f"""
            WITH dims AS (
                SELECT vec_id, d0::INT AS d, embedding[d0 + 1]::DOUBLE AS v
                FROM embeddings, (SELECT unnest(range(64)) AS d0)),
            planes AS (
                SELECT j::INT AS j, d::INT AS d, {plane_sign} AS s
                FROM (SELECT unnest(range({N_PLANES})) AS j),
                     (SELECT unnest(range({EMB_DIM})) AS d)),
            proj AS (
                SELECT vec_id, j, sum(v * s) AS p
                FROM dims JOIN planes USING (d)
                GROUP BY vec_id, j)
            SELECT vec_id,
                   sum(CASE WHEN p > 0 THEN 1::BIGINT << j ELSE 0 END)::BIGINT
                       AS bucket
            FROM proj GROUP BY vec_id
        """,
        "text_quality": f"""
            WITH t AS (SELECT doc_id, {TOKS_DUCK} AS _t FROM documents)
            SELECT doc_id,
                   len(_t)::BIGINT AS n_tokens,
                   round(CASE WHEN len(_t) > 0 THEN
                       list_reduce(list_prepend(0, [length(x) for x in _t]),
                                   (a, b) -> a + b)::DOUBLE / len(_t)
                       ELSE 0.0 END, 6) AS avg_token_len,
                   round(CASE WHEN len(_t) > 0 THEN
                       len([x for x in _t if x = 'a' OR x = 'the'])::DOUBLE
                       / len(_t) ELSE 0.0 END, 6) AS stop_ratio,
                   round(CASE WHEN len(_t) > 0 THEN
                       len([x for x in _t if regexp_matches(x, '^[0-9]+$')])::DOUBLE
                       / len(_t) ELSE 0.0 END, 6) AS digit_ratio
            FROM t
        """,
        "token_counts": """
            SELECT doc_id,
                   len(regexp_extract_all(text, '[^\\s]+'))::BIGINT
                       AS n_ws_tokens,
                   len(regexp_extract_all(lower(text),
                       '[a-z]+|[0-9]|[^a-z0-9\\s]'))::BIGINT AS n_bpe_tokens
            FROM documents
        """,
        "ann_ivf_assign": f"""
            WITH dims AS (
                SELECT vec_id, d0::INT AS d, embedding[d0 + 1]::DOUBLE AS v
                FROM embeddings, (SELECT unnest(range(64)) AS d0)),
            cents AS (
                SELECT c::INT AS c, d::INT AS d, {_plane_sign_sql("(c + 13)", "d")} AS s
                FROM (SELECT unnest(range(8)) AS c),
                     (SELECT unnest(range({EMB_DIM})) AS d)),
            dots AS (
                SELECT vec_id, c, round(sum(v * s), 6) AS dot
                FROM dims JOIN cents USING (d) GROUP BY vec_id, c)
            SELECT vec_id, c AS centroid
            FROM dots
            QUALIFY row_number() OVER (
                PARTITION BY vec_id ORDER BY dot DESC, c ASC) = 1
        """,
        "dedup_embedding_cosine": f"""
            WITH dims AS (
                SELECT vec_id, d0::INT AS d, embedding[d0 + 1]::DOUBLE AS v
                FROM embeddings, (SELECT unnest(range(64)) AS d0)),
            planes AS (
                SELECT j::INT AS j, d::INT AS d, {_plane_sign_sql("j", "d")} AS s
                FROM (SELECT unnest(range({N_PLANES})) AS j),
                     (SELECT unnest(range({EMB_DIM})) AS d)),
            proj AS (
                SELECT vec_id, j, sum(v * s) AS p
                FROM dims JOIN planes USING (d) GROUP BY vec_id, j),
            buckets AS (
                SELECT vec_id,
                       sum(CASE WHEN p > 0 THEN 1::BIGINT << j ELSE 0 END)::BIGINT
                           AS bucket
                FROM proj GROUP BY vec_id),
            e AS (SELECT b.vec_id, b.bucket, embedding
                  FROM embeddings JOIN buckets b USING (vec_id))
            SELECT * FROM (
                SELECT a.vec_id AS a_id, b.vec_id AS b_id,
                       round(
                         list_reduce(list_prepend(0.0,
                             [a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE
                              for i in range(1, {EMB_DIM + 1})]), (x, y) -> x + y)
                         / (sqrt(list_reduce(list_prepend(0.0,
                             [a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE
                              for i in range(1, {EMB_DIM + 1})]), (x, y) -> x + y))
                          * sqrt(list_reduce(list_prepend(0.0,
                             [b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE
                              for i in range(1, {EMB_DIM + 1})]), (x, y) -> x + y)))
                       , 6) AS cos
                FROM e a JOIN e b
                  ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
            WHERE cos >= 0.35
        """,
        "lang_id": _lang_id_oracle_sql(),
        "lang_profiles": _train_lang_profiles_oracle_sql(n_top=10),
        "lang_id_e2e": _lang_id_pipeline_oracle_sql(n_top=10),
        "fingerprint": f"""
            WITH t AS (SELECT doc_id, {TOKS_DUCK} AS _t FROM documents)
            SELECT doc_id,
                   list_reduce(
                       list_prepend(0::BIGINT,
                           [{_TOKHASH_DUCK.format(col="x")} % {HASH_MOD}
                            for x in _t]),
                       (acc, x) -> (acc * 31 + x) % {HASH_MOD}) AS fingerprint
            FROM t
        """,
        "lm_logppl": _lm_logppl_duck(),
        "textrank_keywords": _textrank_duck(),
        "mmr_diversify": _mmr_duck(),
        "collocations_pmi": """
            WITH toks AS (
                SELECT regexp_extract_all(lower(text), '[a-z]+') AS t
                FROM documents),
            uni AS (
                SELECT u.w, count(*) AS n
                FROM toks, unnest(t) AS u(w) GROUP BY 1),
            bi AS (
                SELECT t[i] AS a, t[i + 1] AS b, count(*) AS n_ab
                FROM toks, unnest(range(1, len(t))) AS r(i)
                GROUP BY 1, 2),
            tot AS (
                SELECT (SELECT sum(n)::DOUBLE FROM uni) AS tot_uni,
                       (SELECT sum(n_ab)::DOUBLE FROM bi) AS tot_bi)
            SELECT a, b, n_ab,
                   round(ln((n_ab::DOUBLE / tot_bi)
                         / ((ua.n::DOUBLE / tot_uni)
                            * (ub.n::DOUBLE / tot_uni))), 6) AS pmi
            FROM bi
            JOIN uni ua ON ua.w = a
            JOIN uni ub ON ub.w = b
            CROSS JOIN tot
            WHERE n_ab >= 5
        """,
        "stats_rollup": f"""
            SELECT coalesce(source, '<total>') AS source,
                   count(*) AS n_docs,
                   sum(len({TOKS_DUCK}))::BIGINT AS n_tokens
            FROM documents GROUP BY ROLLUP (source)
        """,
        "events_hourly": """
            SELECT date_trunc('hour', ts) AS hour, event_type,
                   count(*) AS n_events, round(sum(value), 6) AS value_sum
            FROM events GROUP BY 1, 2
        """,
        "events_date_filter": f"""
            SELECT event_type, count(*) AS n_events
            FROM events
            WHERE ts IS NOT NULL
              AND CAST(ts AS DATE) BETWEEN DATE '{DATE_FROM}'
                                       AND DATE '{DATE_TO}'
            GROUP BY event_type
        """,
        "events_topic_shifts": """
            WITH counts AS (
                SELECT date_trunc('hour', ts) AS h, event_type,
                       count(*) AS df
                FROM events GROUP BY 1, 2)
            SELECT c.h AS window_start, c.event_type, c.df,
                   coalesce(p.df, 0) AS prev_df,
                   round(c.df / greatest(coalesce(p.df, 0), 1), 6) AS ratio
            FROM counts c LEFT JOIN counts p
              ON p.event_type = c.event_type
             AND p.h = c.h - INTERVAL 1 HOUR
            WHERE c.df >= 2
              AND round(c.df / greatest(coalesce(p.df, 0), 1), 6) >= 1.5
        """,
        "events_quantiles": """
            SELECT event_type,
                   round(quantile_cont(value, 0.5), 6) AS p50,
                   round(quantile_cont(value, 0.9), 6) AS p90,
                   round(quantile_cont(value, 0.99), 6) AS p99
            FROM events GROUP BY event_type
        """,
        "events_quantiles_sampled": _sampled_quantiles_oracle_sql(
            "value", "event_id", ["event_type"], fraction=0.25
        ),
        "events_quantiles_loghist": _loghist_oracle_sql(
            "value", ["event_type"], table="events"
        ),
        # merged partial sketches must equal the UNSPLIT oracle — the
        # merge-invariance contract is itself driver-checked
        "events_quantiles_loghist_merged": _loghist_oracle_sql(
            "value", ["event_type"], table="events"
        ),
        "events_quantiles_loghist_refined": _loghist_refined_oracle_sql(
            "value", ["event_type"], table="events"
        ),
        "top_docs_per_lang": """
            SELECT lang, doc_id, n_chars,
                   row_number() OVER (
                       PARTITION BY lang
                       ORDER BY n_chars DESC, doc_id ASC) AS rnk
            FROM documents QUALIFY rnk <= 3
        """,
        "events_sessions": """
            WITH g AS (
                SELECT user_id,
                       CASE WHEN lag(ts) OVER w IS NULL
                                 OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                            THEN 1 ELSE 0 END AS new_s
                FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts))
            SELECT user_id, sum(new_s)::BIGINT AS n_sessions FROM g GROUP BY user_id
        """,
        "tpch_pricing": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 6) AS sum_qty,
                   round(sum(l_extendedprice), 6) AS sum_base_price,
                   round(avg(l_discount), 6) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= DATE '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "tpch_top_customers": """
            WITH rev AS (
                SELECT o_custkey, round(sum(o_totalprice), 6) AS revenue
                FROM orders GROUP BY o_custkey)
            SELECT c_custkey AS custkey, n_name AS nation, revenue
            FROM rev
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            ORDER BY revenue DESC, c_custkey ASC LIMIT 10
        """,
        "tpch_shipping_priority": """
            SELECT l_orderkey AS orderkey,
                   o_orderdate AS orderdate,
                   o_orderpriority AS priority,
                   round(CAST(sum(
                       CAST(l_extendedprice * (1.0 - l_discount)
                            AS DECIMAL(18,4))
                   ) AS DOUBLE), 6) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            WHERE o_orderdate < TIMESTAMP '1998-01-01'
              AND l_shipdate > TIMESTAMP '1998-01-01'
            GROUP BY l_orderkey, o_orderdate, o_orderpriority
            ORDER BY revenue DESC, l_orderkey ASC LIMIT 10
        """,
        "pack_bins": f"""
            WITH t AS (
                SELECT doc_id,
                       len(regexp_extract_all(text, '[^\\s]+'))::BIGINT
                           AS n_tokens
                FROM documents),
            c AS (
                SELECT doc_id, n_tokens,
                       coalesce(sum(n_tokens) OVER (
                           ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING), 0) AS _off
                FROM t)
            SELECT (_off // {PACK_BUDGET})::BIGINT AS bin,
                   count(*) AS n_docs,
                   sum(n_tokens)::BIGINT AS tokens
            FROM c GROUP BY bin
        """,
        "stratified_sample": _stratified_sample_duck(),
        "percolate": _percolate_duck(),
        "percolate_rates": f"""
            SELECT query_id, count(*) AS n_matches
            FROM ({{}}) GROUP BY query_id
        """.format(_percolate_duck()),
        "kmv_distinct": _kmv_distinct_duck(),
        "frequent_tokens": _frequent_tokens_duck(),
        "mixture_rates": _mixture_rates_duck(),
        "chunk_windows": _chunk_windows_duck(),
        "quality_funnel": f"""
            SELECT CASE
                WHEN length(text) < 200 THEN 'too_short'
                WHEN length(regexp_replace(text, '[^0-9]', '', 'g')) * 5
                     > length(text) THEN 'high_digit'
                WHEN len(list_distinct({TOKS_DUCK})) * 5
                     < len({TOKS_DUCK}) * 2 THEN 'low_diversity'
                ELSE 'kept' END AS stage,
                count(*) AS n_docs
            FROM documents GROUP BY stage
        """,
        "redact_pii": _redact_pii_duck(),
        "repetition_signals": _repetition_signals_duck(),
        "decontaminate": f"""
            WITH doc_sh AS ({_SHINGLES_FLAT_DUCK}),
            eval_sh AS (
                SELECT eval_id, unnest(list_distinct(
                    [_t[i] || ' ' || _t[i+1] || ' ' || _t[i+2]
                     for i in range(1, len(_t) - 1)])) AS sh
                FROM (SELECT doc_id AS eval_id,
                             list_slice({TOKS_DUCK}, 1,
                                        {DECON_PREFIX_TOKENS}) AS _t
                      FROM documents
                      WHERE doc_id % {DECON_MOD} = {DECON_REM})
                WHERE len(_t) >= 3
            ),
            hot AS (SELECT sh FROM doc_sh
                    GROUP BY sh HAVING count(*) > {DECON_MAX_DF}),
            ds AS (SELECT * FROM doc_sh
                   WHERE sh NOT IN (SELECT sh FROM hot)),
            ev AS (SELECT * FROM eval_sh
                   WHERE sh NOT IN (SELECT sh FROM hot)),
            totals AS (SELECT eval_id, count(*)::BIGINT AS eval_total
                       FROM ev GROUP BY eval_id),
            shared AS (
                SELECT d.doc_id, e.eval_id, count(*)::BIGINT AS n_shared
                FROM ds d JOIN ev e USING (sh)
                GROUP BY d.doc_id, e.eval_id)
            SELECT doc_id, eval_id, n_shared, eval_total
            FROM shared JOIN totals USING (eval_id)
            WHERE n_shared * {DECON_DEN} >= eval_total * {DECON_NUM}
            ORDER BY doc_id, eval_id
        """,
    }


def _redact_pii_duck() -> str:
    from search_engine_spark.operators.text import redact_pii_oracle_sql

    injected = (
        "(SELECT doc_id, text || ' mail u' || doc_id"
        " || '@ex.io ip 10.0.' || (doc_id % 256) || '.7 acct '"
        " || (doc_id * 37 + 100000000) AS text FROM documents)"
    )
    return (
        "SELECT doc_id, n_email, n_ipv4, n_idnum, text FROM ("
        + redact_pii_oracle_sql(source_sql=injected)
        + ")"
    )


def _repetition_signals_duck() -> str:
    from search_engine_spark.operators.text import (
        repetition_signals_oracle_sql,
    )

    return repetition_signals_oracle_sql(TOKS_DUCK)


def _stratified_sample_duck() -> str:
    from search_engine_spark.operators.curate import (
        stratified_sample_oracle_sql,
    )

    inner = stratified_sample_oracle_sql(SAMPLE_FRACS, SAMPLE_DEFAULT)
    return f"SELECT doc_id, lang FROM ({inner})"


def _percolate_duck() -> str:
    from search_engine_spark.operators.percolate import percolate_oracle_sql

    return percolate_oracle_sql("documents", PERC_QUERIES)


def _kmv_distinct_duck() -> str:
    from search_engine_spark.operators.sketch import kmv_distinct_sql

    return kmv_distinct_sql("documents", "text", 16, group_cols=["source"])


def _mmr_duck() -> str:
    from search_engine_spark.operators.rescore import mmr_oracle_sql

    first = """WITH lens AS (
                SELECT doc_id, len({toks})::DOUBLE AS dl FROM documents),
            st AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM lens),
            tf AS (SELECT * FROM ({tfq}) WHERE term IN ('dup', 'merge')),
            dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
            per AS (
                SELECT tf.doc_id,
                       ln(1.0 + ((SELECT n FROM st) - dfs.df + 0.5)
                                 / (dfs.df + 0.5))
                       * tf.tf * {K1P1}
                       / (tf.tf + {K1} * ({OMB} + {B}
                          * lens.dl / (SELECT avgdl FROM st))) AS _s
                FROM tf JOIN dfs USING (term) JOIN lens USING (doc_id))
            SELECT doc_id, round(sum(_s), 6) AS score
            FROM per GROUP BY doc_id
            ORDER BY score DESC, doc_id ASC LIMIT 20""".format(
        toks=TOKS_DUCK, tfq=_TF_DUCK,
        K1P1=BM25_K1 + 1.0, K1=BM25_K1, OMB=1.0 - BM25_B, B=BM25_B,
    )
    return mmr_oracle_sql(first, TOKS_DUCK, k=10, lam=0.7)


def _textrank_duck() -> str:
    from search_engine_spark.operators.text import textrank_oracle_sql

    return textrank_oracle_sql(k=20)


def _lm_logppl_duck() -> str:
    from search_engine_spark.operators.text import lm_logppl_oracle_sql

    return lm_logppl_oracle_sql(vocab_size=256, lam=0.7)


def _frequent_tokens_duck() -> str:
    from search_engine_spark.operators.sketch import frequent_items_sql

    toks = (
        "(SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+', 0))"
        " AS tok FROM documents)"
    )
    return frequent_items_sql(toks, "tok", 17, 500)


def _mixture_rates_duck() -> str:
    from search_engine_spark.operators.curate import (
        mixture_rates_oracle_sql,
    )

    return mixture_rates_oracle_sql(MIX_TARGET, MIX_BUDGET)


def _chunk_windows_duck() -> str:
    from search_engine_spark.operators.curate import (
        chunk_windows_oracle_sql,
    )

    return chunk_windows_oracle_sql(CHUNK_W, CHUNK_OV)


def spark_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "tf": q_tf,
        "df": q_df,
        "doc_stats": q_doc_stats,
        "conjunction": q_conjunction,
        "cutoff_terms": q_cutoff_terms,
        "sumtf_topk": q_sumtf_topk,
        "bm25_topk": q_bm25_topk,
        "bm25_search_after": q_bm25_search_after,
        "impact_prefix": q_impact_prefix,
        "bm25_not_topk": q_bm25_not_topk,
        "bm25_bool_topk": q_bm25_bool_topk,
        "bm25_synonym_topk": q_bm25_synonym_topk,
        "bm25_boost_topk": q_bm25_boost_topk,
        "significant_terms": q_significant_terms,
        "bm25_or_topk": q_bm25_or_topk,
        "rescore_proximity": q_rescore_proximity,
        "wildcard_or_topk": q_wildcard_or_topk,
        "bm25_filtered_topk": q_bm25_filtered_topk,
        "collapse_by_source": q_collapse_by_source,
        "phrase_match": q_phrase_match,
        "more_like_this": q_more_like_this,
        "facet_counts": q_facet_counts,
        "fuzzy_match": q_fuzzy_match,
        "fuzzy_match2": q_fuzzy_match2,
        "suggest_prefix": q_suggest_prefix,
        "docs_ids": q_docs_ids,
        "dedup_exact": q_dedup_exact,
        "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
        "dedup_minhash_lsh": q_dedup_minhash_lsh,
        "dedup_simhash": q_dedup_simhash,
        "ann_cosine_topk": q_ann_cosine_topk,
        "hybrid_rrf_topk": q_hybrid_rrf_topk,
        "kmeans_assign": q_kmeans_assign,
        "cluster_sample": q_cluster_sample,
        "ann_lsh_buckets": q_ann_lsh_buckets,
        "ann_ivf_assign": q_ann_ivf_assign,
        "ann_ivf_topk": q_ann_ivf_topk,
        "ann_pq_codes": q_ann_pq_codes,
        "ann_pq_adc_topk": q_ann_pq_adc_topk,
        "ann_ivfpq_topk": q_ann_ivfpq_topk,
        "dedup_embedding_cosine": q_dedup_embedding_cosine,
        "token_counts": q_token_counts,
        "text_quality": q_text_quality,
        "lang_id": q_lang_id,
        "lang_profiles": q_lang_profiles,
        "lang_id_e2e": q_lang_id_e2e,
        "fingerprint": q_fingerprint,
        "lm_logppl": q_lm_logppl,
        "textrank_keywords": q_textrank,
        "mmr_diversify": q_mmr_diversify,
        "collocations_pmi": q_collocations_pmi,
        "stats_rollup": q_stats_rollup,
        "events_hourly": q_events_hourly,
        "events_topic_shifts": q_events_topic_shifts,
        "events_quantiles": q_events_quantiles,
        "events_quantiles_sampled": q_events_quantiles_sampled,
        "events_quantiles_loghist": q_events_quantiles_loghist,
        "events_quantiles_loghist_merged": q_events_quantiles_loghist_merged,
        "events_quantiles_loghist_refined": q_events_quantiles_loghist_refined,
        "top_docs_per_lang": q_top_docs_per_lang,
        "events_date_filter": q_events_date_filter,
        "events_sessions": q_events_sessions,
        "tpch_pricing": q_tpch_pricing,
        "tpch_top_customers": q_tpch_top_customers,
        "tpch_shipping_priority": q_tpch_shipping_priority,
        "dedup_clusters": q_dedup_clusters,
        "pack_bins": q_pack_bins,
        "stratified_sample": q_stratified_sample,
        "percolate": q_percolate,
        "percolate_rates": q_percolate_rates,
        "kmv_distinct": q_kmv_distinct,
        "frequent_tokens": q_frequent_tokens,
        "mixture_rates": q_mixture_rates,
        "chunk_windows": q_chunk_windows,
        "quality_funnel": q_quality_funnel,
        "redact_pii": q_redact_pii,
        "repetition_signals": q_repetition_signals,
        "decontaminate": q_decontaminate,
        "conv_stats": q_conv_stats,
        "conv_context": q_conv_context,
        "conv_samples": q_conv_samples,
        "tool_transitions": q_tool_transitions,
        "dup_spans": q_dup_spans,
        "bpe_merges": q_bpe_merges,
        "semdedup": q_semdedup,
        "hashing_vectors": q_hashing_vectors,
        "logreg_weights": q_logreg_weights,
        "shuffle_shards": q_shuffle_shards,
        "prf_expand": q_prf_expand,
        "logreg_scores": q_logreg_scores,
    }


def duckdb_oracles() -> dict[str, str]:
    from search_engine_spark.operators.conversations import (
        assemble_samples_oracle_sql,
        context_windows_oracle_sql,
        conversation_stats_oracle_sql,
        tool_transitions_oracle_sql,
    )
    from search_engine_spark.operators.dedup import duplicate_spans_oracle_sql

    m = _oracle_sql_map()
    conv_tbl = f"({_CONV_DUCK})"
    m["conv_stats"] = conversation_stats_oracle_sql(table=conv_tbl)
    m["conv_context"] = context_windows_oracle_sql(CTX_PREV, table=conv_tbl)
    m["conv_samples"] = assemble_samples_oracle_sql(
        CONV_BUDGET, table=conv_tbl
    )
    m["tool_transitions"] = tool_transitions_oracle_sql(table=conv_tbl)
    m["dup_spans"] = duplicate_spans_oracle_sql(SPAN_W)
    m["bpe_merges"] = bpe_merges_duck(BPE_MERGES_N, BPE_TOP_V)
    from search_engine_spark.operators.text import hashing_vectors_oracle_sql

    m["hashing_vectors"] = hashing_vectors_oracle_sql(HASHVEC_DIM)
    from search_engine_spark.operators.classify import logreg_oracle_sql

    m["logreg_weights"] = logreg_oracle_sql(
        HASHVEC_DIM, LOGREG_ITERS, lr=1.0
    )
    from search_engine_spark.operators.classify import logreg_scores_oracle_sql

    m["logreg_scores"] = logreg_scores_oracle_sql(
        HASHVEC_DIM, LOGREG_ITERS, lr=1.0
    )
    from search_engine_spark.operators.curate import shuffle_assign_oracle_sql

    m["shuffle_shards"] = shuffle_assign_oracle_sql(SHUFFLE_SHARDS_N)
    _seeds_in = ", ".join(f"'{t}'" for t in BM25_TERMS)
    _seeds_rows = " UNION ALL ".join(
        f"SELECT '{t}' AS term, 1.0 AS w" for t in BM25_TERMS
    )
    m["prf_expand"] = f"""
        WITH lens AS (
            SELECT doc_id, len({TOKS_DUCK})::DOUBLE AS dl FROM documents),
        st AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM lens),
        tfall AS ({_TF_DUCK}),
        tf1 AS (SELECT * FROM tfall WHERE term IN ({_seeds_in})),
        dfs1 AS (SELECT term, count(*) AS df FROM tf1 GROUP BY term),
        per1 AS (
            SELECT tf1.doc_id,
                   ln(1.0 + ((SELECT n FROM st) - dfs1.df + 0.5)
                             / (dfs1.df + 0.5))
                   * tf1.tf * {BM25_K1 + 1.0}
                   / (tf1.tf + {BM25_K1} * ({1.0 - BM25_B} + {BM25_B}
                      * lens.dl / (SELECT avgdl FROM st))) AS _s
            FROM tf1 JOIN dfs1 USING (term) JOIN lens USING (doc_id)),
        fb AS (
            SELECT doc_id FROM (
                SELECT doc_id, round(sum(_s), 6) AS score
                FROM per1 GROUP BY doc_id)
            ORDER BY score DESC, doc_id ASC LIMIT {PRF_FEEDBACK_K}),
        nf AS (SELECT count(*)::DOUBLE AS n FROM fb),
        nd AS (SELECT count(*)::DOUBLE AS n FROM documents),
        fgc AS (
            SELECT term, count(*) AS fg_df
            FROM tfall JOIN fb USING (doc_id)
            GROUP BY term HAVING count(*) >= 2),
        bgc AS (SELECT term, count(*) AS bg_df FROM tfall GROUP BY term),
        sig AS (
            SELECT term, {PRF_BETA} AS w FROM (
                SELECT term,
                       round((fg_pct - bg_pct) * (fg_pct / bg_pct), 6)
                         AS jlh
                FROM (
                    SELECT term,
                           fg_df::DOUBLE / (SELECT n FROM nf) AS fg_pct,
                           bg_df::DOUBLE / (SELECT n FROM nd) AS bg_pct
                    FROM fgc JOIN bgc USING (term)
                    WHERE term NOT IN ({_seeds_in}))
                WHERE fg_pct > bg_pct
                ORDER BY jlh DESC, term ASC LIMIT {PRF_EXPAND_N})),
        weights AS ({_seeds_rows} UNION ALL SELECT term, w FROM sig),
        tf2 AS (
            SELECT tfall.doc_id, tfall.term, tfall.tf, weights.w
            FROM tfall JOIN weights USING (term)),
        dfs2 AS (SELECT term, count(*) AS df FROM tf2 GROUP BY term),
        per2 AS (
            SELECT tf2.doc_id,
                   tf2.w * ln(1.0 + ((SELECT n FROM st) - dfs2.df + 0.5)
                             / (dfs2.df + 0.5))
                   * tf2.tf * {BM25_K1 + 1.0}
                   / (tf2.tf + {BM25_K1} * ({1.0 - BM25_B} + {BM25_B}
                      * lens.dl / (SELECT avgdl FROM st))) AS _s
            FROM tf2 JOIN dfs2 USING (term) JOIN lens USING (doc_id))
        SELECT doc_id, round(sum(_s), 6) AS score
        FROM per2 GROUP BY doc_id
        ORDER BY score DESC, doc_id ASC LIMIT 10
    """
    # ann_cosine_topk needs the query vector embedded literally; DuckDB can
    # read it from the registered embeddings view itself.
    m["ann_cosine_topk"] = f"""
        WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        scored AS (
            SELECT e.vec_id,
                   round(
                     list_reduce(list_prepend(0.0,
                         [e.embedding[i]::DOUBLE * q.qe[i]::DOUBLE
                          for i in range(1, {EMB_DIM + 1})]), (a, b) -> a + b)
                     / (sqrt(list_reduce(list_prepend(0.0,
                         [e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE
                          for i in range(1, {EMB_DIM + 1})]), (a, b) -> a + b))
                        * sqrt(list_reduce(list_prepend(0.0,
                         [q.qe[i]::DOUBLE * q.qe[i]::DOUBLE
                          for i in range(1, {EMB_DIM + 1})]), (a, b) -> a + b)))
                   , 6) AS sim
            FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 0)
        SELECT vec_id, sim FROM scored
        ORDER BY sim DESC, vec_id ASC LIMIT 10
    """
    m["hybrid_rrf_topk"] = f"""
        WITH lens AS (
            SELECT doc_id, len({TOKS_DUCK})::DOUBLE AS dl FROM documents),
        st AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM lens),
        tf AS (SELECT * FROM ({_TF_DUCK}) WHERE term IN ('dup', 'merge')),
        dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        per AS (
            SELECT tf.doc_id,
                   ln(1.0 + ((SELECT n FROM st) - dfs.df + 0.5)
                             / (dfs.df + 0.5))
                   * tf.tf * {BM25_K1 + 1.0}
                   / (tf.tf + {BM25_K1} * ({1.0 - BM25_B} + {BM25_B}
                      * lens.dl / (SELECT avgdl FROM st))) AS _s
            FROM tf JOIN dfs USING (term) JOIN lens USING (doc_id)),
        lex AS (
            SELECT doc_id, round(sum(_s), 6) AS score
            FROM per GROUP BY doc_id
            ORDER BY score DESC, doc_id ASC LIMIT 50),
        lexr AS (
            SELECT doc_id, row_number() OVER (
                ORDER BY score DESC, doc_id ASC) AS r FROM lex),
        q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        sem AS (
            SELECT e.vec_id AS doc_id,
                   round(
                     list_reduce(list_prepend(0.0,
                         [e.embedding[i]::DOUBLE * q.qe[i]::DOUBLE
                          for i in range(1, {EMB_DIM + 1})]), (a, b) -> a + b)
                     / (sqrt(list_reduce(list_prepend(0.0,
                         [e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE
                          for i in range(1, {EMB_DIM + 1})]), (a, b) -> a + b))
                        * sqrt(list_reduce(list_prepend(0.0,
                         [q.qe[i]::DOUBLE * q.qe[i]::DOUBLE
                          for i in range(1, {EMB_DIM + 1})]), (a, b) -> a + b)))
                   , 6) AS score
            FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 0
            ORDER BY score DESC, doc_id ASC LIMIT 50),
        semr AS (
            SELECT doc_id, row_number() OVER (
                ORDER BY score DESC, doc_id ASC) AS r FROM sem),
        fused AS (
            SELECT doc_id,
                   round(coalesce(1.0 / (60 + l.r), 0.0)
                         + coalesce(1.0 / (60 + s.r), 0.0), 6) AS rrf
            FROM lexr l FULL OUTER JOIN semr s USING (doc_id))
        SELECT doc_id, rrf FROM fused ORDER BY rrf DESC, doc_id ASC LIMIT 10
    """
    _KM_ASSIGN = """
        SELECT vec_id, c FROM (
            SELECT dims.vec_id, cc.c,
                   round(sum((v - cv) * (v - cv)), 6) AS dist
            FROM dims JOIN {cents} cc USING (d)
            GROUP BY dims.vec_id, cc.c)
        QUALIFY row_number() OVER (
            PARTITION BY vec_id ORDER BY dist ASC, c ASC) = 1
    """
    _KM_UPDATE = """
        {new} AS (
            SELECT a.c, d, round(avg(v), 6) AS cv
            FROM dims JOIN {assign} a USING (vec_id) GROUP BY a.c, d),
        {out} AS (
            SELECT p.c, p.d, coalesce(n.cv, p.cv) AS cv
            FROM {prev} p LEFT JOIN {new} n ON p.c = n.c AND p.d = n.d)
    """
    m["kmeans_assign"] = (
        f"""
        WITH dims AS (
            SELECT vec_id, d0::INT AS d, embedding[d0 + 1]::DOUBLE AS v
            FROM embeddings, (SELECT unnest(range({EMB_DIM})) AS d0)),
        c0 AS (SELECT vec_id::INT AS c, d, round(v, 6) AS cv
               FROM dims WHERE vec_id < 4),
        a0 AS ({_KM_ASSIGN.format(cents="c0")}),
        """
        + _KM_UPDATE.format(new="c1n", assign="a0", out="c1", prev="c0")
        + f""",
        a1 AS ({_KM_ASSIGN.format(cents="c1")}),
        """
        + _KM_UPDATE.format(new="c2n", assign="a1", out="c2", prev="c1")
        + f""",
        af AS ({_KM_ASSIGN.format(cents="c2")})
        SELECT vec_id, c AS centroid FROM af
        """
    )
    # -- product quantization twins: the same kmeans-family pins, one
    # quantizer per subspace (s = d // dsub, dd = d % dsub) -------------
    _DSUB = EMB_DIM // PQ_M_SUB
    _PQ_ASSIGN = """
        SELECT vec_id, s, j FROM (
            SELECT sd.vec_id, sd.s, cb.j,
                   round(sum((sd.v - cb.cv) * (sd.v - cb.cv)), 6) AS dist
            FROM sdims sd JOIN {cb} cb ON cb.s = sd.s AND cb.dd = sd.dd
            GROUP BY sd.vec_id, sd.s, cb.j)
        QUALIFY row_number() OVER (
            PARTITION BY vec_id, s ORDER BY dist ASC, j ASC) = 1
    """
    _PQ_UPDATE = """
        {new} AS (
            SELECT a.s, a.j, sd.dd, round(avg(sd.v), 6) AS cv
            FROM sdims sd JOIN {assign} a
              ON a.vec_id = sd.vec_id AND a.s = sd.s
            GROUP BY a.s, a.j, sd.dd),
        {out} AS (
            SELECT p.s, p.j, p.dd, coalesce(n.cv, p.cv) AS cv
            FROM {prev} p LEFT JOIN {new} n
              ON p.s = n.s AND p.j = n.j AND p.dd = n.dd)
    """
    _PQ_PRELUDE = (
        f"""
        WITH dims AS (
            SELECT vec_id, d0::INT AS d, embedding[d0 + 1]::DOUBLE AS v
            FROM embeddings, (SELECT unnest(range({EMB_DIM})) AS d0)),
        sdims AS (
            SELECT vec_id, (d // {_DSUB})::INT AS s, (d % {_DSUB})::INT AS dd, v
            FROM dims),
        cb0 AS (SELECT (d // {_DSUB})::INT AS s, vec_id::INT AS j,
                       (d % {_DSUB})::INT AS dd, round(v, 6) AS cv
                FROM dims WHERE vec_id < {PQ_KSUB}),
        a0 AS ({_PQ_ASSIGN.format(cb="cb0")}),
        """
        + _PQ_UPDATE.format(new="c1n", assign="a0", out="cb1", prev="cb0")
        + f""",
        a1 AS ({_PQ_ASSIGN.format(cb="cb1")}),
        """
        + _PQ_UPDATE.format(new="c2n", assign="a1", out="cb2", prev="cb1")
        + f""",
        af AS ({_PQ_ASSIGN.format(cb="cb2")})
        """
    )
    m["ann_pq_codes"] = (
        _PQ_PRELUDE
        + "SELECT vec_id, s AS subspace, j AS code FROM af"
    )
    m["ann_pq_adc_topk"] = (
        _PQ_PRELUDE
        + """,
        q AS (SELECT s, dd, v FROM sdims WHERE vec_id = 0),
        lut AS (
            SELECT cb.s, cb.j,
                   round(sum((q.v - cb.cv) * (q.v - cb.cv)), 6) AS pd
            FROM cb2 cb JOIN q ON q.s = cb.s AND q.dd = cb.dd
            GROUP BY cb.s, cb.j),
        adc AS (
            SELECT c.vec_id,
                   round(list_reduce(
                       list_prepend(0.0, list(l.pd ORDER BY l.s)),
                       (a, b) -> a + b), 6) AS dist
            FROM af c JOIN lut l ON l.s = c.s AND l.j = c.j
            WHERE c.vec_id <> 0 GROUP BY c.vec_id)
        SELECT vec_id, dist FROM adc ORDER BY dist ASC, vec_id ASC LIMIT 10
        """
    )
    m["ann_ivfpq_topk"] = (
        _PQ_PRELUDE
        + f""",
        cents AS (
            SELECT c::INT AS c, d::INT AS d,
                   {_plane_sign_sql("(c + 13)", "d")} AS s
            FROM (SELECT unnest(range(8)) AS c),
                 (SELECT unnest(range({EMB_DIM})) AS d)),
        dots AS (
            SELECT vec_id, c, round(sum(v * s), 6) AS dot
            FROM dims JOIN cents USING (d) GROUP BY vec_id, c),
        assign AS (
            SELECT vec_id, c AS centroid FROM dots
            QUALIFY row_number() OVER (
                PARTITION BY vec_id ORDER BY dot DESC, c ASC) = 1),
        qv AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        qdots AS (
            SELECT c, round(sum(qe[d + 1]::DOUBLE * s), 6) AS dot
            FROM qv CROSS JOIN cents GROUP BY c),
        probe AS (SELECT c FROM qdots ORDER BY dot DESC, c ASC LIMIT 2),
        q AS (SELECT s, dd, v FROM sdims WHERE vec_id = 0),
        lut AS (
            SELECT cb.s, cb.j,
                   round(sum((q.v - cb.cv) * (q.v - cb.cv)), 6) AS pd
            FROM cb2 cb JOIN q ON q.s = cb.s AND q.dd = cb.dd
            GROUP BY cb.s, cb.j),
        adc AS (
            SELECT c.vec_id,
                   round(list_reduce(
                       list_prepend(0.0, list(l.pd ORDER BY l.s)),
                       (a, b) -> a + b), 6) AS dist
            FROM af c JOIN lut l ON l.s = c.s AND l.j = c.j
            WHERE c.vec_id <> 0 AND c.vec_id IN (
                SELECT vec_id FROM assign
                WHERE centroid IN (SELECT c FROM probe))
            GROUP BY c.vec_id)
        SELECT vec_id, dist FROM adc ORDER BY dist ASC, vec_id ASC LIMIT 10
        """
    )
    from search_engine_spark.operators.curate import _hex_threshold

    _h = "substring(md5(vec_id::VARCHAR), 1, 8)"
    _arms = " OR ".join(
        f"(centroid = {s} AND {_h} < '{_hex_threshold(f)}')"
        for s, f in sorted(CLUSTER_FRACS.items())
    )
    m["cluster_sample"] = (
        f"WITH km AS ({m['kmeans_assign']}) "
        f"SELECT vec_id, centroid FROM km WHERE {_arms}"
    )
    _dot_ab = (
        "list_reduce(list_prepend(0.0, "
        f"[ea.embedding[i]::DOUBLE * eb.embedding[i]::DOUBLE "
        f"for i in range(1, {EMB_DIM + 1})]), (a, b) -> a + b)"
    )

    def _norm(alias: str) -> str:
        return (
            "sqrt(list_reduce(list_prepend(0.0, "
            f"[{alias}.embedding[i]::DOUBLE * {alias}.embedding[i]::DOUBLE "
            f"for i in range(1, {EMB_DIM + 1})]), (a, b) -> a + b))"
        )

    m["semdedup"] = f"""
        WITH km AS MATERIALIZED ({m['kmeans_assign']}),
        pairs AS (
            SELECT ka.vec_id AS i, kb.vec_id AS j
            FROM km ka JOIN km kb
              ON ka.centroid = kb.centroid AND kb.vec_id < ka.vec_id),
        sim AS (
            SELECT p.i,
                   round({_dot_ab} / ({_norm('ea')} * {_norm('eb')}), 6)
                     AS c
            FROM pairs p
            JOIN embeddings ea ON ea.vec_id = p.i
            JOIN embeddings eb ON eb.vec_id = p.j),
        dropped AS (SELECT DISTINCT i FROM sim WHERE c >= {SEMDEDUP_TAU})
        SELECT km.vec_id, km.centroid,
               km.vec_id NOT IN (SELECT i FROM dropped) AS keep
        FROM km
    """
    m["ann_ivf_topk"] = f"""
        WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        dims AS (
            SELECT vec_id, d0::INT AS d, embedding[d0 + 1]::DOUBLE AS v
            FROM embeddings, (SELECT unnest(range({EMB_DIM})) AS d0)),
        cents AS (
            SELECT c::INT AS c, d::INT AS d, {_plane_sign_sql("(c + 13)", "d")} AS s
            FROM (SELECT unnest(range(8)) AS c),
                 (SELECT unnest(range({EMB_DIM})) AS d)),
        dots AS (
            SELECT vec_id, c, round(sum(v * s), 6) AS dot
            FROM dims JOIN cents USING (d) GROUP BY vec_id, c),
        assign AS (
            SELECT vec_id, c AS centroid FROM dots
            QUALIFY row_number() OVER (
                PARTITION BY vec_id ORDER BY dot DESC, c ASC) = 1),
        qdots AS (
            SELECT c, round(sum(qe[d + 1]::DOUBLE * s), 6) AS dot
            FROM q CROSS JOIN cents GROUP BY c),
        probe AS (SELECT c FROM qdots ORDER BY dot DESC, c ASC LIMIT 2),
        scored AS (
            SELECT e.vec_id,
                   round(
                     list_reduce(list_prepend(0.0,
                         [e.embedding[i]::DOUBLE * q.qe[i]::DOUBLE
                          for i in range(1, {EMB_DIM + 1})]), (a, b) -> a + b)
                     / (sqrt(list_reduce(list_prepend(0.0,
                         [e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE
                          for i in range(1, {EMB_DIM + 1})]), (a, b) -> a + b))
                        * sqrt(list_reduce(list_prepend(0.0,
                         [q.qe[i]::DOUBLE * q.qe[i]::DOUBLE
                          for i in range(1, {EMB_DIM + 1})]), (a, b) -> a + b)))
                   , 6) AS sim
            FROM embeddings e
            JOIN assign a USING (vec_id)
            CROSS JOIN q
            WHERE a.centroid IN (SELECT c FROM probe) AND e.vec_id <> 0)
        SELECT vec_id, sim FROM scored
        ORDER BY sim DESC, vec_id ASC LIMIT 10
    """
    return m
