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
from pyspark.sql import functions as F

from search_engine_spark.functions.analyze import query_lemmas
from search_engine_spark.operators.build import statistics as stats_op
from search_engine_spark.operators.snippet import materialize_with_snippets
from search_engine_spark.operators.wand import bm25_search_blocks
from search_engine_spark.plans.job import IndexBuildJob
from search_engine_spark.sources.io import read_table


class SearchEngine:
    """Query + maintenance facade over a built index directory."""

    def __init__(self, spark: SparkSession, index_dir: str):
        import os

        self.spark = spark
        self.index_dir = index_dir.rstrip("/")
        # a time-travel view rooted inside snapshots/v{N} is read-only:
        # mutating a committed snapshot would corrupt history
        parent, base = os.path.split(self.index_dir)
        self._snapshot_view = (
            os.path.basename(parent) == "snapshots" and base.startswith("v")
        )
        self._blocks = read_table(spark, f"{self.index_dir}/postings")
        self._lemma_stats = read_table(spark, f"{self.index_dir}/lemma_stats")
        self._doc_stats = read_table(spark, f"{self.index_dir}/doc_stats")
        self._docs = read_table(spark, f"{self.index_dir}/docs")
        # attribute filter postings (operators/filters.py) — absent on
        # indexes built with filter_cols=(). The families actually
        # indexed come from the lineage table (tiny collect), so a
        # filter on an unindexed family errors instead of silently
        # matching nothing.
        from search_engine_spark.operators.filters import FILTER_COLS

        self._filter_blocks = None
        self._filter_cols: tuple[str, ...] = ()
        if os.path.exists(f"{self.index_dir}/filters"):
            self._filter_blocks = read_table(
                spark, f"{self.index_dir}/filters"
            )
            self._filter_cols = FILTER_COLS
            try:
                lin = {
                    r["key"]: r["value"]
                    for r in spark.read.parquet(
                        f"{self.index_dir}/lineage"
                    ).collect()
                }
                self._filter_cols = tuple(
                    c
                    for c in lin.get(
                        "filter_cols", ",".join(FILTER_COLS)
                    ).split(",")
                    if c
                )
            except Exception:
                pass
        # repeated-query result cache (SearchServiceImpl.java:26-28)
        self._cache_key: tuple | None = None
        self._cache_rows: list[dict] | None = None
        self._cache_ids: list[int] = []
        # True when the priming fetch returned fewer rows than it asked
        # for — the cache then holds EVERY match and any offset is valid
        self._cache_exhausted: bool = False

    # -- GET /api/search ----------------------------------------------------

    def search(
        self,
        query: str,
        scope: str | None = None,
        offset: int = 0,
        limit: int = 20,  # API defaults (ApiController.java:48-51)
        scorer: str = "bm25",
        combine: str = "and",  # "or" = disjunctive weak-AND (bm25 only)
        match: str = "term",   # "phrase" = positional adjacency (needs a
        slop: int = 0,         #   positional index); slop = allowed gaps
        fuzzy: bool = False,   # spell-correct unknown terms
        fuzzy_dist: int = 1,   # max edit distance for corrections (1 or 2)
        collapse: str | None = None,  # docs column: ≤ collapse_limit hits
        collapse_limit: int = 1,      #   per value (e.g. one per conv_id)
        filters: dict | None = None,  # {col: value-or-list} attribute
        #   restriction via filter postings (operators/filters.py)
        after: tuple[float, int] | None = None,  # (relevance, doc_id)
        #   cursor from a previous page's "next_after" — deep pagination
        #   at O(limit) per page (replaces offset; wand.py _after_cut)
        synonyms: dict | None = None,  # {lemma: synonym lemmas}
        #   (boolquery.compile_synonyms) — query-time OR-group
        #   expansion; needs match="bool" (any query string parses)
        rescore_window: int = 0,  # >0: second-stage proximity rescore
        #   of the top-N first-stage hits (operators/rescore.py —
        #   combined = bm25 + min-cover-span prox); term match only,
        #   replaces neither filters nor the gates; no cursor/collapse
    ) -> dict:
        from search_engine_spark.operators.filters import (
            filter_groups,
            split_field_quals,
        )

        # in-query field qualifiers (role:assistant, date:A..B) become
        # filters — same pinned non-scoring semantics, every match mode
        query, quals = split_field_quals(query)
        if quals:
            overlap = sorted(set(quals) & set(filters or {}))
            if overlap:
                raise ValueError(
                    f"filter column(s) {overlap} given both as field "
                    "qualifiers and in filters="
                )
            filters = {**(filters or {}), **quals}

        if synonyms and match != "bool":
            raise ValueError(
                "synonyms= needs match='bool' (a plain term query is "
                "valid boolean syntax — implicit AND)"
            )
        if rescore_window and (
            match != "term" or scorer != "bm25"
            or after is not None or collapse is not None
        ):
            raise ValueError(
                "rescore_window needs match='term' + scorer='bm25' and "
                "composes with neither after= cursors (rescoring changes "
                "scores) nor collapse="
            )

        if filters and self._filter_blocks is None:
            raise ValueError(
                "this index has no filters family (built with "
                "filter_cols=()); rebuild with IndexBuildJob defaults"
            )
        if after is not None:
            after = (float(after[0]), int(after[1]))
            if offset:
                raise ValueError(
                    "after=... replaces offset pagination — pass offset=0"
                )
            if scorer != "bm25":
                raise ValueError("after needs scorer='bm25'")
            if collapse is not None:
                raise ValueError(
                    "after does not compose with collapse (a collapse "
                    "keeper depends on rows before the cursor) — page "
                    "collapsed results with offset"
                )
        # validates + normalizes against the families THIS index built
        fkey = filter_groups(filters, available=self._filter_cols)
        if fkey and scorer != "bm25":
            raise ValueError("filters need scorer='bm25'")
        skey = (
            tuple(sorted((l, tuple(s)) for l, s in synonyms.items()))
            if synonyms
            else None
        )
        key = (
            query, scope, scorer, combine, match, slop, fuzzy, fuzzy_dist,
            collapse, collapse_limit, fkey, after, skey, rescore_window,
        )
        if (
            self._cache_key == key
            and self._cache_rows is not None
            # a deeper page than the priming fetch covered must refetch —
            # slicing past the cached depth would fake an empty tail
            and (
                self._cache_exhausted
                or offset + limit <= len(self._cache_rows)
            )
        ):
            data = self._cache_rows[offset:offset + limit]
            ids = self._cache_ids[offset:offset + limit]
            return {
                "result": True,
                "count": len(self._cache_rows),
                "data": data,
                "next_after": (
                    [data[-1]["relevance"], ids[-1]] if data else None
                ),
            }

        if match == "bool":
            # boolean query syntax (functions/boolquery.py): nested
            # AND/OR/NOT/parens with implicit AND — the syntax carries
            # its own negation/grouping, so the -term/wildcard splitting
            # below does not apply. Served by operators/wand.py
            # bool_search_blocks (oracle.bool_search is the twin).
            if fuzzy or scorer != "bm25" or combine != "and":
                raise ValueError(
                    "match='bool' needs scorer='bm25', combine='and', "
                    "fuzzy=False (the syntax carries its own operators)"
                )
            from search_engine_spark.functions.boolquery import (
                parse_bool,
                positive_lemmas,
            )
            from search_engine_spark.operators.wand import bool_search_blocks

            deep = 10 * (offset + limit)
            results = bool_search_blocks(
                self._blocks, self._lemma_stats, self._doc_stats, query,
                scope=scope, k=deep, offset=0, filters=filters,
                filter_postings=self._filter_blocks, after=after,
                synonyms=synonyms,
            )
            # snippet highlighting uses the positive lemmas incl.
            # synonym expansions (negated subtrees are non-scoring and
            # never bolded); like OR mode, the highlight set is the
            # UNpruned query — cutoff-dropped lemmas simply never appear
            # in the matched docs' top ranks
            from search_engine_spark.functions.boolquery import (
                expand_synonyms,
            )

            terms = positive_lemmas(expand_synonyms(parse_bool(query), synonyms))
        else:
            # query syntax: "-token" exclusions (split_negations) and
            # "token*" prefix wildcards (split_wildcards → bounded top-cf
            # dictionary expansion, OR mode only)
            from search_engine_spark.functions.analyze import (
                split_negations,
                split_wildcards,
            )

            pos_q, neg_q = split_negations(query)
            excl_terms = query_lemmas(neg_q) if neg_q else []
            pos_q, prefixes = split_wildcards(pos_q)
            expansions: list[str] = []
            if prefixes:
                if match == "phrase" or scorer != "bm25":
                    raise ValueError("wildcards need scorer='bm25' term match")
                if combine != "or":
                    raise ValueError(
                        "a wildcard expands to MANY lemmas — requiring all of "
                        "them (combine='and') is never what you mean; use "
                        "combine='or'"
                    )
                from search_engine_spark.operators.fuzzy import expand_prefix

                for p in prefixes:  # sorted unique → deterministic
                    expansions.extend(
                        expand_prefix(self._lemma_stats, p, scope=scope)
                    )
            terms = query_lemmas(pos_q)
            if match == "phrase":
                if excl_terms:
                    raise ValueError("phrase search does not support -term")
                if "positions" not in self._blocks.columns:
                    raise ValueError(
                        "phrase search needs a positional index "
                        "(IndexBuildJob(..., positional=True))"
                    )
                from search_engine_spark.operators.wand import phrase_search_blocks

                deep = 10 * (offset + limit)
                results = phrase_search_blocks(
                    self._blocks, self._lemma_stats, self._doc_stats,
                    pos_q, scope=scope, k=deep, offset=0, slop=slop,
                    filters=filters, filter_postings=self._filter_blocks,
                    after=after,
                )
            elif scorer == "bm25":
                # fetch a deep page once (cacheable), slice driver-side;
                # a rescore window wider than the page must be fetched in
                # full — oracle.rescore_search / QueryServer pin the first
                # stage at k=window, and silently rescoring only the page
                # depth would rank differently from both
                deep = max(10 * (offset + limit), rescore_window)
                if fuzzy:
                    # typo tolerance (operators/fuzzy.py): unknown analyzed
                    # lemmas are replaced by their best edit-distance-
                    # ``fuzzy_dist`` dictionary candidate, then the standard
                    # blocks plan runs
                    from search_engine_spark.operators.fuzzy import correct_terms
                    from search_engine_spark.operators.wand import (
                        bm25_blocks_from_terms,
                    )

                    corrected = correct_terms(
                        self._lemma_stats, terms, scope,
                        variants=self._variants(fuzzy_dist),
                        max_dist=fuzzy_dist,
                    )
                    # exclusions and wildcard expansions pass through
                    # UNcorrected (pinned: only explicit scored terms are
                    # spell-corrected; expansions are in-dictionary already)
                    terms = sorted(set(corrected) | set(expansions))
                    results = bm25_blocks_from_terms(
                        self._blocks, self._lemma_stats, self._doc_stats,
                        terms, scope=scope, k=deep, offset=0, mode="wand",
                        combine=combine, exclude_terms=excl_terms,
                        filters=filters, filter_postings=self._filter_blocks,
                        after=after,
                    )
                else:
                    from search_engine_spark.operators.wand import (
                        bm25_blocks_from_terms,
                    )

                    terms = sorted(set(terms) | set(expansions))
                    results = bm25_blocks_from_terms(
                        self._blocks, self._lemma_stats, self._doc_stats,
                        terms, scope=scope, k=deep, offset=0, mode="wand",
                        combine=combine, exclude_terms=excl_terms,
                        filters=filters, filter_postings=self._filter_blocks,
                        after=after,
                    )
            else:
                # legacy reference scorer (Σtf/max-tf + global-max norm) —
                # served from a flat-postings view materialized ONCE per index
                # epoch (a per-query corpus re-explode is a full scan at scale)
                from search_engine_spark.operators.query import reftf_search

                if excl_terms:
                    raise ValueError("scorer='reftf' does not support -term")
                deep = 10 * (offset + limit)
                results = reftf_search(
                    self._flat_postings(), self._lemma_stats,
                    self._doc_stats, pos_q, scope=scope, k=deep, offset=0,
                )
        if rescore_window:
            # second-stage proximity rescore of the top-`rescore_window`
            # first-stage hits (operators/rescore.py; ≤window rows
            # broadcast into the docs join — the corpus pays nothing)
            from search_engine_spark.operators.rescore import rescore_window as _rescore

            results = _rescore(
                results, self._docs, terms, k=deep, window=rescore_window
            )
        if collapse is not None:
            # field collapsing on the DEEP page (pinned depth policy):
            # ≤ collapse_limit hits per value of a docs column, global
            # order preserved (operators/query.py collapse_results)
            from search_engine_spark.operators.query import collapse_results

            results = collapse_results(
                results, self._docs, collapse, collapse_limit
            ).select("doc_id", "score")
        if match == "phrase":
            # chain-precise bolding: highlight the matched phrase itself
            from search_engine_spark.functions.analyze import analyze

            rows = materialize_with_snippets(
                results, self._docs.drop("lemma_counts", "bucket"), terms,
                phrase_seq=analyze(pos_q), slop=slop,
            ).collect()
        else:
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
        ids = [r["doc_id"] for r in rows]
        self._cache_key, self._cache_rows = key, data
        self._cache_ids = ids
        # a short page proves exhaustion only when nothing truncated it
        # AFTER the first stage: collapse compresses the deep page (80
        # collapsed rows from a full 200-row fetch says nothing about
        # deeper matches), so collapsed caches are never marked
        # exhausted — deeper offsets refetch at a deeper first stage.
        # (rescore is fine: beyond-window docs are dropped by contract,
        # so its ≤window result set really is the whole result set.)
        self._cache_exhausted = collapse is None and len(data) < deep
        # count is the fetched depth (a lower bound when the deep page
        # filled up), matching the reference's capped-result behavior
        page, page_ids = data[offset:offset + limit], ids[offset:offset + limit]
        return {
            "result": True,
            "count": len(data),
            "data": page,
            # cursor for the page after this one — pass back as after=
            "next_after": (
                [page[-1]["relevance"], page_ids[-1]] if page else None
            ),
        }

    def more_like_this(self, doc_id: int, scope: str | None = None,
                       limit: int = 10) -> dict:
        """Related documents for a result the user clicked (Lucene
        MoreLikeThis analog; operators/query.py more_like_this — rarest
        source lemmas as an OR query, source excluded)."""
        from search_engine_spark.operators.query import materialize_results
        from search_engine_spark.operators.query import (
            more_like_this as mlt_op,
        )

        results = mlt_op(
            self._docs, self._flat_postings(), self._lemma_stats,
            self._doc_stats, doc_id, scope=scope, k=limit,
        )
        rows = materialize_results(
            results, self._docs.drop("lemma_counts", "bucket")
        ).collect()
        return {
            "result": True,
            "count": len(rows),
            "data": [
                {
                    "site": r["scope"],
                    "uri": f"{r['conv_id']}#{r['turn_idx']}",
                    "title": (r["text"] or "")[:64],
                    "relevance": r["score"],
                }
                for r in rows
            ],
        }

    def facets(
        self,
        query: str,
        facet_cols: tuple[str, ...] = ("scope", "role"),
        scope: str | None = None,
        combine: str = "and",
        depth: int = 1000,
        match: str = "term",
        slop: int = 0,
        filters: dict | None = None,
    ) -> dict:
        """Facet panel for a query: per-value doc counts over the top-
        ``depth`` results (operators/query.py facet_counts — the ≤depth
        result side broadcasts, docs are never shuffled). ``facet_cols``
        may include the derived calendar facets ``day``/``month``/
        ``year`` (the date-histogram panel). ``filters``/``match``/
        ``slop`` restrict the match set with the same pinned semantics
        as ``search`` (attribute filter postings / positional phrase)."""
        from search_engine_spark.operators.filters import filter_groups
        from search_engine_spark.operators.query import facet_counts

        if filters and self._filter_blocks is None:
            raise ValueError(
                "this index has no filters family (built with "
                "filter_cols=()); rebuild with IndexBuildJob defaults"
            )
        filter_groups(filters, available=self._filter_cols)  # validate
        if match == "phrase":
            if "positions" not in self._blocks.columns:
                raise ValueError(
                    "phrase search needs a positional index "
                    "(IndexBuildJob(..., positional=True))"
                )
            from search_engine_spark.operators.wand import (
                phrase_search_blocks,
            )

            results = phrase_search_blocks(
                self._blocks, self._lemma_stats, self._doc_stats, query,
                scope=scope, k=depth, offset=0, slop=slop,
                filters=filters, filter_postings=self._filter_blocks,
            )
        else:
            results = bm25_search_blocks(
                self._blocks, self._lemma_stats, self._doc_stats, query,
                scope=scope, k=depth, offset=0, mode="wand",
                combine=combine, filters=filters,
                filter_postings=self._filter_blocks,
            )
        rows = facet_counts(results, self._docs, list(facet_cols)).collect()
        return {
            "result": True,
            "facets": [
                {**{c: r[c] for c in facet_cols}, "n_docs": r["n_docs"]}
                for r in sorted(
                    rows, key=lambda r: tuple(str(r[c]) for c in facet_cols)
                )
            ],
        }

    def explain(
        self,
        query: str,
        doc_id: int,
        scope: str | None = None,
        combine: str = "and",
    ) -> dict:
        """Scoring explanation for one (query, doc) pair — the Lucene
        ``explain`` analog: per-term df/idf/tf/partial plus the total,
        computed with the SAME pinned functions and lexicographic
        accumulation order as the search kernels, so for any doc in a
        search's results ``explain(...)["score"]`` equals its returned
        relevance BIT-IDENTICALLY. Gates are reported, not hidden: in
        AND mode an over-cutoff term kills the whole query
        (``killed_by_cutoff``); in OR mode it drops per-term
        (``dropped``). ``matches`` says whether the search would return
        this doc at unbounded k. One pushed point-lookup on docs
        (doc_id filter) + the broadcast-stats collects — no corpus scan."""
        from search_engine_spark.functions.scoring import explain_breakdown
        from search_engine_spark.operators.query import (
            _scope_stats,
            _term_dfs,
        )

        terms = sorted(set(query_lemmas(query)))
        rows = (
            self._docs.filter(F.col("doc_id") == int(doc_id))
            .select("doc_len", "scope", "lemma_counts")
            .collect()
        )
        if not rows:
            raise ValueError(f"unknown doc_id {doc_id}")
        doc = rows[0]
        in_scope = scope is None or doc["scope"] == scope
        n_docs, avg_len = _scope_stats(self._doc_stats, scope)
        dfs = _term_dfs(self._lemma_stats, terms, scope)
        tf_of = {x["lemma"]: int(x["tf"]) for x in (doc["lemma_counts"] or [])}
        return {
            "result": True,
            "doc_id": int(doc_id),
            **explain_breakdown(
                terms, dfs, n_docs, avg_len, doc["doc_len"], tf_of,
                in_scope, combine,
            ),
        }

    def significant_terms(
        self,
        query: str,
        k: int = 10,
        scope: str | None = None,
        combine: str = "and",
        depth: int = 100,
        min_fg_df: int = 2,
        filters: dict | None = None,
    ) -> dict:
        """Terms disproportionately frequent in the query's matched docs
        vs the corpus (operators/significant.py — ES significant_terms /
        JLH as public prior art). The foreground is the top-``depth``
        result sample (the ES sampler-agg shape): its ids broadcast into
        a docs lemma_counts explode, background df comes from the
        dictionary — the corpus is never re-aggregated. Query terms
        themselves usually top the list (they are in ~100% of the
        foreground); callers can drop them from the panel if unwanted."""
        from search_engine_spark.operators.query import _scope_stats
        from search_engine_spark.operators.significant import (
            significant_for_ids,
        )

        if filters and self._filter_blocks is None:
            raise ValueError(
                "this index has no filters family (built with "
                "filter_cols=()); rebuild with IndexBuildJob defaults"
            )
        results = bm25_search_blocks(
            self._blocks, self._lemma_stats, self._doc_stats, query,
            scope=scope, k=depth, offset=0, mode="wand", combine=combine,
            filters=filters, filter_postings=self._filter_blocks,
        )
        ids = [r["doc_id"] for r in results.collect()]  # ≤ depth rows
        if not ids:
            return {"result": True, "terms": []}
        n_docs, _ = _scope_stats(self._doc_stats, scope)
        rows = significant_for_ids(
            self._docs, self._lemma_stats, ids, scope, n_docs, k=k,
            min_fg_df=min_fg_df,
        ).collect()
        return {
            "result": True,
            "terms": [
                {
                    "term": r["lemma"],
                    "fg_df": int(r["fg_df"]),
                    "bg_df": int(r["bg_df"]),
                    "score": r["jlh"],
                }
                for r in rows
            ],
        }

    def suggest(
        self, prefix: str, limit: int = 10, scope: str | None = None
    ) -> dict:
        """Search-box autocomplete: dictionary completions of ``prefix``
        ranked by collection frequency (operators/fuzzy.py suggest —
        pushed prefix filter, TakeOrderedAndProject)."""
        from search_engine_spark.operators.fuzzy import suggest as suggest_op

        rows = suggest_op(
            self._lemma_stats, prefix.strip().lower(), k=limit, scope=scope
        ).collect()
        return {
            "result": True,
            "suggestions": [
                {"term": r["lemma"], "weight": int(r["cf"])} for r in rows
            ],
        }

    def _variants(self, max_dist: int = 1):
        """Persisted (variant, lemma) deletion-neighborhood table, built
        once per index epoch and per requested depth (upserts delete
        them — same lifecycle as the flat-postings cache). Depth 2 gets
        its own table (``.cache_variants_d2``): it is ~len/2× larger and
        only fuzzy_dist=2 queries pay for it."""
        import os

        from search_engine_spark.operators.fuzzy import write_variant_table

        suffix = "" if max_dist <= 1 else f"_d{max_dist}"
        path = f"{self.index_dir}/.cache_variants{suffix}"
        if not os.path.exists(path):
            write_variant_table(self._lemma_stats, path, max_dist=max_dist)
        return read_table(self.spark, path)

    def _flat_postings(self):
        """(lemma, doc_id, tf, scope, doc_len) parquet view derived from
        docs, written once per index epoch (upserts/rebuilds delete it).
        Queries then hit a pushed ``IN (lemma)`` parquet filter instead of
        re-exploding the corpus per request."""
        import os

        from search_engine_spark.operators.build import build_postings_flat

        path = f"{self.index_dir}/.cache_postings_flat"
        if not os.path.exists(path):
            build_postings_flat(self._docs).write.mode("overwrite").parquet(path)
        return read_table(self.spark, path)

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

    # -- GET /api/startIndexing / /api/stopIndexing ---------------------------

    _active_job: IndexBuildJob | None = None  # singleton, like the
    # reference's IndexingService (one indexing run at a time)

    @classmethod
    def start_indexing(
        cls,
        spark: SparkSession,
        transcripts_path: str,
        index_dir: str,
        n_buckets: int = 8,
    ) -> "SearchEngine":
        """Full (re)build via the checkpointed job, then open the index.
        ``stop_indexing()`` from another thread cancels cooperatively; a
        cancelled build raises RuntimeError (resume by calling again)."""
        job = IndexBuildJob(
            spark, transcripts_path, index_dir, n_buckets=n_buckets
        )
        cls._active_job = job
        try:
            res = job.run()
        finally:
            cls._active_job = None
        if res["cancelled"]:
            raise RuntimeError(
                "indexing cancelled after "
                f"{res['buckets_built']} buckets (resume: start_indexing again)"
            )
        return cls(spark, index_dir)

    @classmethod
    def stop_indexing(cls) -> dict:
        """GET /api/stopIndexing (ApiController.java:35-38): flag the
        active build to stop after its current bucket."""
        job = cls._active_job
        if job is None:
            return {"result": False, "error": "indexing is not running"}
        job.cancel()
        return {"result": True}

    # -- POST /api/indexPage ---------------------------------------------------

    def index_turns(self, delta, snapshot: bool = True) -> dict:
        """Incremental upsert of changed turns (delta: transcripts-shaped
        DataFrame). Invalidates the result cache and commits a snapshot
        (Iceberg semantics — operators/snapshots.py)."""
        from search_engine_spark.operators.snapshots import create_snapshot
        from search_engine_spark.operators.upsert import upsert_turns

        self._guard_mutation()
        job = IndexBuildJob(self.spark, "", self.index_dir)
        summary = upsert_turns(job, delta)
        if snapshot:
            summary["snapshot_id"] = create_snapshot(
                self.index_dir, operation="upsert", run_id=job.run_id
            )["snapshot_id"]
        self._cache_key = self._cache_rows = None
        self._cache_ids = []
        # re-open swapped tables (file listings changed)
        self.__init__(self.spark, self.index_dir)
        return {"result": True, **summary}

    def _guard_mutation(self) -> None:
        if self._snapshot_view:
            raise RuntimeError(
                "read-only snapshot view: open the live index to mutate "
                "(or rollback() the live index to this snapshot)"
            )

    # -- snapshots (Iceberg-style commits; operators/snapshots.py) ------------

    def snapshot(self, operation: str = "manual") -> dict:
        """Commit the current index state as a new snapshot; returns the
        manifest."""
        from search_engine_spark.operators.snapshots import create_snapshot

        self._guard_mutation()
        return create_snapshot(self.index_dir, operation=operation)

    def snapshots(self) -> list[dict]:
        """History log: all retained snapshot manifests, oldest first."""
        from search_engine_spark.operators.snapshots import list_snapshots

        return list_snapshots(self.index_dir)

    def rollback(self, snapshot_id: int) -> dict:
        """Restore the live index to ``snapshot_id`` (a NEW snapshot
        records the rollback; history is never erased) and re-open."""
        from search_engine_spark.operators import snapshots as snap

        self._guard_mutation()
        manifest = snap.rollback(self.index_dir, snapshot_id)
        self.__init__(self.spark, self.index_dir)
        return manifest

    @classmethod
    def at_snapshot(
        cls, spark: SparkSession, index_dir: str, snapshot_id: int
    ) -> "SearchEngine":
        """Time-travel: a read-only engine over snapshot ``snapshot_id``
        of ``index_dir`` (the snapshot tree mirrors the index layout, so
        every query path works unchanged)."""
        from search_engine_spark.operators.snapshots import snapshot_dir

        return cls(spark, snapshot_dir(index_dir.rstrip("/"), snapshot_id))

    # -- maintenance -----------------------------------------------------------

    def rebalance(
        self, per_bucket: int | None = None, snapshot: bool = True
    ) -> dict:
        """Re-bucket the index to the per_bucket target after append-heavy
        upserts (operators/maintenance.py — the segment-merge/compaction
        analog; doc_ids and search results are unchanged)."""
        from search_engine_spark.operators.maintenance import rebalance_buckets
        from search_engine_spark.operators.snapshots import create_snapshot

        self._guard_mutation()
        job = IndexBuildJob(self.spark, "", self.index_dir)
        summary = rebalance_buckets(job, per_bucket)
        if snapshot and summary.get("moved_docs"):
            summary["snapshot_id"] = create_snapshot(
                self.index_dir, operation="rebalance", run_id=job.run_id
            )["snapshot_id"]
        self._cache_key = self._cache_rows = None
        self._cache_ids = []
        self.__init__(self.spark, self.index_dir)
        return {"result": True, **summary}
