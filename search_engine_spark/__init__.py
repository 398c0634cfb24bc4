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

BM25_K1 = 1.2
BM25_B = 0.75
# Common-term cutoff: a query dies if its *rarest* term's df exceeds this
# percentage of the scope's doc count (reference: application.yaml:47,
# services/SearchServiceImpl.java:137,157 — `pagesCount / 100 * pagesPercentForLemma`).
PAGES_PERCENT_FOR_LEMMA = 5.0
# Posting block size (doc_ids per compressed block) for block-max WAND.
BLOCK_SIZE = 128
