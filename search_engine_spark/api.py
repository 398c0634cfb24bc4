"""User-facing engine facade: the reference's REST API surface as Python.

Endpoint parity (controllers/ApiController.java):

| reference                               | here                          |
|-----------------------------------------|-------------------------------|
| GET  /api/search?query&site&offset&limit| SearchEngine.search(...)      |
| GET  /api/statistics                    | SearchEngine.statistics()     |
| GET  /api/startIndexing                 | SearchEngine.start_indexing() |
| POST /api/indexPage?url=                | SearchEngine.index_turns(...) |

Response shapes mirror the reference DTOs (api/response/SearchResponse.
java:9-21; dto/SearchItem.java:13-19; StatisticsServiceImpl.java:31-63):
``search`` returns {"result": bool, "count": int, "data": [{"site"(→scope),
"uri"(→conv_id#turn), "title", "snippet", "relevance"}]} serialized from
the engine's DataFrames. A repeated-query result cache mirrors
SearchServiceImpl.java:26-28, 45-51.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from search_engine_spark.functions.analyze import query_lemmas
from search_engine_spark.operators.build import statistics as stats_op
from search_engine_spark.operators.snippet import materialize_with_snippets
from search_engine_spark.operators.wand import bm25_search_blocks
from search_engine_spark.plans.job import IndexBuildJob
from search_engine_spark.sources.io import read_table


class SearchEngine:
    """Query + maintenance facade over a built index directory."""

    def __init__(self, spark: SparkSession, index_dir: str):
        self.spark = spark
        self.index_dir = index_dir.rstrip("/")
        self._blocks = read_table(spark, f"{self.index_dir}/postings")
        self._lemma_stats = read_table(spark, f"{self.index_dir}/lemma_stats")
        self._doc_stats = read_table(spark, f"{self.index_dir}/doc_stats")
        self._docs = read_table(spark, f"{self.index_dir}/docs")
        # repeated-query result cache (SearchServiceImpl.java:26-28)
        self._cache_key: tuple | None = None
        self._cache_rows: list[dict] | None = None

    # -- GET /api/search ----------------------------------------------------

    def search(
        self,
        query: str,
        scope: str | None = None,
        offset: int = 0,
        limit: int = 20,  # API defaults (ApiController.java:48-51)
        scorer: str = "bm25",
    ) -> dict:
        key = (query, scope, scorer)
        if self._cache_key == key and self._cache_rows is not None:
            data = self._cache_rows[offset:offset + limit]
            return {"result": True, "count": len(self._cache_rows), "data": data}

        terms = query_lemmas(query)
        if scorer == "bm25":
            # fetch a deep page once (cacheable), slice driver-side
            deep = 10 * (offset + limit)
            results = bm25_search_blocks(
                self._blocks, self._lemma_stats, self._doc_stats,
                query, scope=scope, k=deep, offset=0, mode="wand",
            )
        else:
            # legacy reference scorer (Σtf/max-tf + global-max norm) —
            # served from flat postings derived on the fly from docs
            from search_engine_spark.operators.build import build_postings_flat
            from search_engine_spark.operators.query import reftf_search

            deep = 10 * (offset + limit)
            results = reftf_search(
                build_postings_flat(self._docs), self._lemma_stats,
                self._doc_stats, query, scope=scope, k=deep, offset=0,
            )
        rows = materialize_with_snippets(
            results, self._docs.drop("lemma_counts", "bucket"), terms
        ).collect()
        data = [
            {
                "site": r["scope"],
                "siteName": r["scope"],
                "uri": f"{r['conv_id']}#{r['turn_idx']}",
                "title": (r["text"] or "")[:64],
                "snippet": r["snippet"],
                "relevance": r["score"],
            }
            for r in rows
        ]
        self._cache_key, self._cache_rows = key, data
        return {
            "result": True,
            "count": len(data),
            "data": data[offset:offset + limit],
        }

    # -- GET /api/statistics -------------------------------------------------

    def statistics(self) -> dict:
        rows = stats_op(self._docs, self._lemma_stats).collect()
        per = {r["scope"]: r for r in rows if r["scope"] != "<total>"}
        total = next(r for r in rows if r["scope"] == "<total>")
        return {
            "result": True,
            "statistics": {
                "total": {
                    "sites": len(per),
                    "pages": total["n_docs"],
                    "lemmas": total["n_lemmas"],
                },
                "detailed": [
                    {
                        "url": s,
                        "pages": r["n_docs"],
                        "lemmas": r["n_lemmas"],
                    }
                    for s, r in sorted(per.items())
                ],
            },
        }

    # -- GET /api/startIndexing ----------------------------------------------

    @classmethod
    def start_indexing(
        cls,
        spark: SparkSession,
        transcripts_path: str,
        index_dir: str,
        n_buckets: int = 8,
    ) -> "SearchEngine":
        """Full (re)build via the checkpointed job, then open the index."""
        IndexBuildJob(spark, transcripts_path, index_dir, n_buckets=n_buckets).run()
        return cls(spark, index_dir)

    # -- POST /api/indexPage ---------------------------------------------------

    def index_turns(self, delta) -> dict:
        """Incremental upsert of changed turns (delta: transcripts-shaped
        DataFrame). Invalidates the result cache."""
        from search_engine_spark.operators.upsert import upsert_turns

        job = IndexBuildJob(self.spark, "", self.index_dir)
        summary = upsert_turns(job, delta)
        self._cache_key = self._cache_rows = None
        # re-open swapped tables (file listings changed)
        self.__init__(self.spark, self.index_dir)
        return {"result": True, **summary}
