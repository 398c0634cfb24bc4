"""search_engine_spark — a PySpark-native inverted-index + BM25 engine.

Brand-new engine (NOT a port) with the query/data-processing capabilities of
the reference Java engine ``AlekseyMG/search-engine`` (crawler → lemma-based
inverted index in MySQL → ranked search), re-expressed Spark-first over a
table of multi-turn conversation transcripts
(conv_id, turn_idx, role, text, tool, ts).

Layout
------
functions/  pure, Spark-free cores (analyzer, varbyte codec, text stats)
            plus their vectorized pandas-UDF wrappers
operators/  DataFrame-level operators: docs build, index build, BM25 query
            (exact + block-max WAND), dedup, similarity, snippets
sources/    IO abstraction (parquet now, Iceberg-shaped API) + deterministic
            synthetic transcript corpus generator
plans/      checkpoint / lineage / metrics tables, resumable build driver
streaming/  incremental MERGE-style upsert path

Reference citations in docstrings use ``path:line`` into /root/reference.
"""

__version__ = "0.1.0"

# Public API (lazy re-exports, PEP 562 — keeps bare `import
# search_engine_spark` free of pyspark/pandas import cost and cycles).
_PUBLIC = {
    "SearchEngine": "search_engine_spark.api",
    "QueryServer": "search_engine_spark.operators.serve",
    "IndexBuildJob": "search_engine_spark.plans.job",
    "upsert_turns": "search_engine_spark.operators.upsert",
    "bm25_search_blocks": "search_engine_spark.operators.wand",
    "phrase_search_blocks": "search_engine_spark.operators.wand",
    "more_like_this": "search_engine_spark.operators.query",
    "facet_counts": "search_engine_spark.operators.query",
    "fuzzy_match": "search_engine_spark.operators.fuzzy",
    "fuzzy_search": "search_engine_spark.operators.fuzzy",
    "suggest": "search_engine_spark.operators.fuzzy",
    "rebalance_buckets": "search_engine_spark.operators.maintenance",
    "bucket_sizes": "search_engine_spark.operators.maintenance",
    "verify_index": "search_engine_spark.operators.maintenance",
    # training-data-pipeline suite
    "exact_dedup_summary": "search_engine_spark.operators.dedup",
    "jaccard_pairs": "search_engine_spark.operators.dedup",
    "minhash_lsh_pairs": "search_engine_spark.operators.dedup",
    "simhash": "search_engine_spark.operators.dedup",
    "cosine_topk": "search_engine_spark.operators.ann",
    "cosine_pairs_lsh": "search_engine_spark.operators.ann",
    "lsh_buckets": "search_engine_spark.operators.ann",
    "ivf_assign": "search_engine_spark.operators.ann",
    "ivf_topk": "search_engine_spark.operators.ann",
    "ivf_write_partitioned": "search_engine_spark.operators.ann",
    "ivf_topk_pruned": "search_engine_spark.operators.ann",
    "connected_components": "search_engine_spark.operators.curate",
    "dedup_clusters": "search_engine_spark.operators.curate",
    "pack_sequences": "search_engine_spark.operators.curate",
    "pack_bins": "search_engine_spark.operators.curate",
    "stratified_sample": "search_engine_spark.operators.curate",
    "quality_funnel": "search_engine_spark.operators.curate",
    "lang_id_ngram": "search_engine_spark.operators.text",
    "text_quality": "search_engine_spark.operators.text",
    "token_counts": "search_engine_spark.operators.text",
    "fingerprint": "search_engine_spark.operators.text",
    "sessionize_stream": "search_engine_spark.streaming.sessions",
    "hourly_counts_stream": "search_engine_spark.streaming.sessions",
    "kmv_distinct": "search_engine_spark.operators.sketch",
    "frequent_items": "search_engine_spark.operators.sketch",
    "loghist_sketch": "search_engine_spark.operators.sketch",
    "loghist_merge": "search_engine_spark.operators.sketch",
    "loghist_quantiles": "search_engine_spark.operators.sketch",
    "loghist_sketch_sums": "search_engine_spark.operators.sketch",
    "loghist_merge_sums": "search_engine_spark.operators.sketch",
    "loghist_quantiles_refined": "search_engine_spark.operators.sketch",
    "percolate": "search_engine_spark.operators.percolate",
    "compile_queries": "search_engine_spark.operators.percolate",
    "AlertRegistry": "search_engine_spark.operators.percolate",
    "alert_rates": "search_engine_spark.operators.percolate",
    "build_impact_cache": "search_engine_spark.operators.impact",
    "duplicate_spans": "search_engine_spark.operators.dedup",
    "lm_logppl": "search_engine_spark.operators.text",
    "textrank_keywords": "search_engine_spark.operators.text",
    "mmr_rerank": "search_engine_spark.operators.rescore",
    # conversation suite (transcripts are multi-turn dialogues)
    "conversation_stats": "search_engine_spark.operators.conversations",
    "context_windows": "search_engine_spark.operators.conversations",
    "assemble_samples": "search_engine_spark.operators.conversations",
    "tool_transitions": "search_engine_spark.operators.conversations",
}


def __getattr__(name: str):
    mod = _PUBLIC.get(name)
    if mod is None:
        raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
    import importlib

    return getattr(importlib.import_module(mod), name)


def __dir__():
    return sorted(set(globals()) | set(_PUBLIC))

BM25_K1 = 1.2
BM25_B = 0.75
# Common-term cutoff: a query dies if its *rarest* term's df exceeds this
# percentage of the scope's doc count (reference: application.yaml:47,
# services/SearchServiceImpl.java:137,157 — `pagesCount / 100 * pagesPercentForLemma`).
PAGES_PERCENT_FOR_LEMMA = 5.0
# Posting block size (doc_ids per compressed block) for block-max WAND.
BLOCK_SIZE = 128
