"""Long-lived query serving: dictionary + corpus stats cached once.

The functional path (``bm25_search_blocks``) resolves stats with two
driver collects per query — correct, but at ~0.2s/job it dominates p50
latency for a serving process answering many queries. ``QueryServer``
amortizes them:

- ``doc_stats`` (one row per scope — 4 here) collected once at open;
- the dictionary (per-term df) collected ONCE when small enough
  (``preload_dict_max_rows`` guard — the in-memory term dictionary every
  native engine keeps; at 10^12-turn scale the dictionary exceeds driver
  memory, so the guard falls back to per-query pushed-filter lookups that
  are memoized, bounding driver memory by the QUERIED vocabulary);
- the postings blocks DataFrame persisted (binary columns — cheap to
  cache, unlike array<struct> rows; see CLAUDE.md perf notes).

Each query then runs AT MOST one Spark job: pruned block scan → per-shard
kernel → TakeOrderedAndProject. Reference analog: the always-resident
MySQL indexes + in-process caches of the Spring service
(services/SearchServiceImpl.java:26-28).

Adaptive execution venue: when the queried lemmas' total df (a zero-cost
cached-dictionary lookup) is under ``local_df_budget``, the pruned
blocks are broadcast-sized, so the server fetches them once into a
per-lemma driver cache (one pushed point-scan per COLD lemma, zero Spark
jobs on warm ones) and runs the SAME shard kernels in-process
(``wand.run_kernel_local``) — the serving analog of a broadcast-join
size threshold. Hot terms stay distributed. Applies to term and boolean
search; rank/score-identical to the distributed path by shared-kernel
construction (test_serve.py, test_bool.py).

Full API parity from cached stats (each parity-tested against the
SearchEngine or oracle twin in tests/test_serve.py): ``search`` (term
queries incl. fuzzy, wildcards, ``-term``, filters, cursors,
``rescore_window=``, ``collapse=``), ``phrase``, ``bool_search``
(+synonyms/boosts), ``explain``, ``significant_terms``,
``more_like_this``, ``facets``, ``suggest``. The docs family loads
lazily (point lookups / broadcast joins only — never persisted, its
array<struct> column is the known persist() trap).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from search_engine_spark.functions.analyze import query_lemmas
from search_engine_spark.functions.scoring import (
    bm25_idf,
    df_cutoff,
    query_killed_by_cutoff,
)
from search_engine_spark.operators.wand import _blocks_core, prune_blocks


class QueryServer:
    """Serving facade over a built index directory. ``search()`` returns
    driver-side rows [(doc_id, score)] — endpoint semantics."""

    def __init__(
        self,
        spark: SparkSession,
        index_dir: str,
        cache_blocks: bool = True,
        preload_dict_max_rows: int = 2_000_000,
        local_df_budget: int = 200_000,
        local_cache_bytes: int = 256 << 20,
        hybrid_max_fetch_blocks: int = 4096,
        hot_df_budget: int = 4_000_000,
        fuse_cache_bytes: int = 256 << 20,
        result_cache_size: int = 256,
        selective_max_fetch_blocks: int = 16_384,
        selective_meta_max_rows: int = 262_144,
        selective_min_blocks: int = 4_096,
    ):
        self.spark = spark
        self.index_dir = index_dir.rstrip("/")
        self._preload_dict_max_rows = int(preload_dict_max_rows)
        self.blocks = spark.read.parquet(f"{self.index_dir}/postings")
        if cache_blocks:
            self.blocks = self.blocks.persist()
        self._lemma_stats = spark.read.parquet(f"{self.index_dir}/lemma_stats")
        # scope stats: one row per scope, collected once
        self._scope_rows = spark.read.parquet(
            f"{self.index_dir}/doc_stats"
        ).collect()
        # dictionary: (scope, lemma) -> df; full preload behind a row guard.
        # _df_totals memoizes the cross-scope per-lemma sum so an unscoped
        # query is an O(1) lookup, not an O(|dict|) Python scan per term
        self._dfs: dict[tuple[str, str], int] = {}
        self._df_totals: dict[str, int] = {}
        self._all_loaded = False
        n_dict = self._lemma_stats.count()
        if n_dict <= preload_dict_max_rows:
            for r in self._lemma_stats.select("scope", "lemma", "df").collect():
                self._add_df(r["scope"], r["lemma"], int(r["df"]))
            self._all_loaded = True
        self._known_terms: set[str] = set()
        # attribute filter postings: loaded lazily on the first filtered
        # query (persisted like blocks — same binary-column layout)
        self._filter_blocks = None
        self._cache_blocks = cache_blocks
        # docs family: loaded lazily on the first explain / significant /
        # rescored query (point lookups push doc_id filters to the scan —
        # NOT persisted: its array<struct> lemma_counts column is exactly
        # the layout the CLAUDE.md persist() warning is about)
        self._docs = None
        # driver-local execution for SMALL posting sets: when the queried
        # terms' TOTAL df (cached dictionary — zero-cost decision) is
        # under `local_df_budget`, the pruned blocks are broadcast-sized,
        # so the server collects them once (per-lemma LRU) and runs the
        # SAME shard kernels in-process — zero Spark jobs on a warm term,
        # one pushed point-scan on a cold one. Rank/score-identical to
        # the distributed path (wand.blocks_core_local shares the kernel
        # closures); hot terms stay distributed. The adaptive
        # local-vs-scatter choice is the serving analog of a broadcast
        # join threshold: 200k postings ≈ 2 MB of varbyte blocks, well
        # inside Spark's own 10 MB broadcast default. =0 disables.
        self.local_df_budget = int(local_df_budget)
        self._block_cache: dict[str, object] = {}
        self._block_cache_sizes: dict[str, int] = {}
        # positional (phrase) blocks cache separately — their frames
        # carry the positions payload, so mixing layouts would corrupt
        # the concat; both caches share the one bytes cap
        self._pos_block_cache: dict[str, object] = {}
        self._pos_block_sizes: dict[str, int] = {}
        self._block_cache_cap = int(local_cache_bytes)
        # hot∧rare hybrid venue: block METADATA cache (scope/shard/
        # first/last arrays per lemma — ~40 B/block, no payloads; a
        # metadata-only columnar scan on cold miss) lets a conjunction
        # with one local-budget-sized term fetch ONLY the hot blocks
        # that hold a rare-side candidate. The knob caps the pushed
        # ``first_doc_id IN (...)`` list — i.e. the number of NEEDED
        # HOT BLOCKS fetched, not the rare-side candidate count;
        # =0 disables the venue.
        self.hybrid_max_fetch_blocks = int(hybrid_max_fetch_blocks)
        # the fetch-efficiency gate: decline the venue when candidates
        # touch more than this fraction of the hot side's blocks
        # (nothing left to skip — the plain pruned scan wins)
        self.hybrid_fetch_frac = 0.25
        self._meta_cache: dict[str, object] = {}
        # DISTRIBUTED selective-fetch venue (round 4 — the sub-O(df_hot)
        # answer when postings exceed every driver budget): conjunctions
        # compute candidates IN the cluster (wand.needed_hot_blocks
        # cogroup) and fetch only candidate-holding hot blocks;
        # single-term top-k selects blocks by the (max_tf, min_dl)
        # score bound from a metadata-only scan with an exact
        # residual-θ check (wand.select_blocks_by_bound), escalating
        # to the full scan when the check fails. =0 disables both.
        self.selective_max_fetch_blocks = int(selective_max_fetch_blocks)
        self.selective_meta_max_rows = int(selective_meta_max_rows)
        self.selective_min_blocks = int(selective_min_blocks)
        # single-term selection keeps ≥ max(2m, this) postings per shard
        # before skipping; raising it trades fetch for fewer escalations
        self.selective_floor_postings = 256
        # ELITE per-term summaries (round 4 — the stopword-split layout
        # realized as a BOUNDED summary): top-elite_top postings by the
        # avgdl-free impact proxy + per-tf residual strata, built once
        # per (term, scope) per epoch by a distributed per-shard reduce
        # (wand.elite_reduce_kernel), then single-term top-k serves
        # driver-side with an exact residual certificate — memory per
        # term is O(elite_top), so a 10^10-df stopword fits where the
        # HOT venue's whole-postings cache cannot. =0 disables.
        self.elite_top = 1024
        self._elite_memos: dict = {}
        # IMPACT-ORDERED rank-prefix venues (round 4, operators/
        # impact.py — the layout answer behind the elite summaries):
        # when the index carries a `.cache_impact/` family, a single
        # hot term or a conjunction's hot partners fetch only ranks
        # [0, R) of their impact-sorted postings (a pushed ``rank < R``
        # range predicate — parquet row-group pruning, no IN-lists, no
        # candidate-count caps), exact by the per-shard residual
        # certificate with geometric escalation. This is the venue
        # that stays sub-O(df_hot) when candidates blanket the hot
        # side and the selective IN-list venues must decline.
        # ``impact_rounds=0`` disables. The floor matches the other
        # over-budget venues' (measured, BASELINE.md round 4b): a
        # certified round is one job, but certification FAILURES cost
        # escalation round-trips, and below a few thousand
        # cache-resident blocks the single full-scan job wins
        # (measured 3.1 s impact vs 0.54 s full on a 5k-block
        # conjunction at 1.05M turns — rounds, not bytes). At 10^12
        # docs every mid-df term clears the floor by orders of
        # magnitude and the scan itself dominates.
        self.impact_rounds = 3
        self.impact_escalate = 8
        self.impact_min_blocks = 4096
        # adaptive start depth: the rank prefix that CERTIFIED for a
        # (terms, scope) class is remembered for the epoch, so
        # steady-state queries of that class pay ONE job at the right
        # depth instead of re-walking the escalation ladder (measured:
        # each round is a ~0.65 s scheduling round-trip at 1.05M turns
        # however little it reads)
        self._impact_depth: dict = {}
        self._impact_manifest: dict | None = None
        self._impact_blocks = None
        self._impact_skip: set = set()
        # HOT serving venue (the both-hot conjunction answer): queries
        # whose lemma df-sum exceeds the local budget but fits
        # ``hot_df_budget`` ALSO run driver-side — first use pays one
        # pushed point-scan into the bytes-capped block cache plus one
        # fused decode, memoized per (scope → shard, lemma) in the FUSE
        # MEMO below; warm both-hot conjunctions then cost a couple of
        # searchsorted passes (~ms) instead of a Spark job that re-scans
        # and re-decodes a stopword-grade term's postings every query
        # (measured 1.2 s at 1M turns). This is the classic serving-node
        # postings RAM cache; at 100-TB corpus scale a hot term's df
        # exceeds the budget and the query stays on the distributed
        # path, which is untouched. =0 disables (as does
        # local_df_budget=0 — the master off-switch for driver venues).
        self.hot_df_budget = int(hot_df_budget)
        self._fuse_cache_cap = int(fuse_cache_bytes)
        self._fuse_memos: dict[object, dict] = {}
        # repeated-query RESULT cache (the reference's last-result cache,
        # SearchServiceImpl.java:45-51, generalized to an LRU over the
        # full call signature): an identical repeat costs a dict lookup.
        # Always sound within one epoch — every venue is deterministic
        # over immutable files — and refresh() swaps in a fresh server,
        # so an epoch switch empties it by construction. =0 disables
        # (bench does, to measure the engine rather than memoization).
        self.result_cache_size = int(result_cache_size)
        self._result_cache: dict[tuple, list] = {}

    @classmethod
    def at_snapshot(
        cls,
        spark: SparkSession,
        index_dir: str,
        snapshot_id: int | None = None,
        **kwargs,
    ) -> "QueryServer":
        """Time-travel SERVING: a server rooted at a snapshot tree
        (operators/snapshots.py — the snapshot mirrors the live index
        layout, so every venue — local, hot, hybrid, distributed — and
        every cache works unchanged over the immutable point-in-time
        files). ``snapshot_id=None`` pins the CURRENT snapshot at open
        time: unlike a server on the live directory, later commits can
        never change what this server answers (the repeatable-read
        serving mode; ``refresh()`` on it re-opens the same snapshot).
        The SearchEngine twin is ``SearchEngine.at_snapshot``."""
        from search_engine_spark.operators.snapshots import (
            current_snapshot_id,
            snapshot_dir,
        )

        root = index_dir.rstrip("/")
        if snapshot_id is None:
            snapshot_id = current_snapshot_id(root)
            if snapshot_id is None:
                raise ValueError(f"{root} has no snapshots")
        return cls(spark, snapshot_dir(root, snapshot_id), **kwargs)

    def refresh(self) -> None:
        """Re-open the index after an external mutation (upsert /
        rebalance / merge / snapshot rollback committed by another
        process): reload stats + dictionary and drop EVERY driver cache
        (block payloads, positional blocks, block metadata, fuzzy
        memos) — the serving analog of an index refresh. A long-lived
        server otherwise intentionally keeps serving the epoch it
        opened: parquet part-files are immutable and the snapshot layer
        never rewrites them in place, so the open epoch stays
        consistent; ``refresh()`` is the explicit epoch switch.

        Crash-safe: the NEW epoch's state is built first (a fresh
        server opened on the same directory); only after that
        succeeds does the swap happen and the OLD epoch's persisted
        frames unpersist. If the re-open raises mid-way (e.g. a
        concurrent commit swapping index files), this server keeps
        serving its old epoch with every cache intact."""
        old_blocks = self.blocks if self._cache_blocks else None
        old_filters = self._filter_blocks if self._cache_blocks else None
        fresh = QueryServer(
            self.spark,
            self.index_dir,
            cache_blocks=self._cache_blocks,
            preload_dict_max_rows=self._preload_dict_max_rows,
            local_df_budget=self.local_df_budget,
            local_cache_bytes=self._block_cache_cap,
            hybrid_max_fetch_blocks=self.hybrid_max_fetch_blocks,
            hot_df_budget=self.hot_df_budget,
            fuse_cache_bytes=self._fuse_cache_cap,
            result_cache_size=self.result_cache_size,
        )
        old_impact = self._impact_blocks if self._cache_blocks else None
        self.__dict__.update(fresh.__dict__)  # atomic epoch switch
        if old_blocks is not None:
            old_blocks.unpersist()
        if old_filters is not None:
            old_filters.unpersist()
        if old_impact is not None:
            old_impact.unpersist()

    def _docs_table(self):
        if self._docs is None:
            self._docs = self.spark.read.parquet(f"{self.index_dir}/docs")
        return self._docs

    def _filters_table(self):
        import os

        if self._filter_blocks is None:
            path = f"{self.index_dir}/filters"
            if not os.path.exists(path):
                raise ValueError(
                    "this index has no filters family (built with "
                    "filter_cols=()); rebuild with IndexBuildJob defaults"
                )
            self._filter_blocks = self.spark.read.parquet(path)
            if self._cache_blocks:
                self._filter_blocks = self._filter_blocks.persist()
        return self._filter_blocks

    # -- stats ---------------------------------------------------------------

    def _scope_stats(self, scope: str | None) -> tuple[int, float]:
        rows = self._scope_rows
        if scope is not None:
            rows = [r for r in rows if r["scope"] == scope]
        n = sum(r["n_docs"] for r in rows)
        if n == 0:
            return 0, 0.0
        return n, sum(r["sum_doc_len"] for r in rows) / n

    def _add_df(self, scope: str, lemma: str, df: int) -> None:
        """Record one dictionary row in both caches. Callers never load
        the same (scope, lemma) twice (preload is all-or-nothing; lazy
        fills are gated by _known_terms), so += never double-counts."""
        self._dfs[(scope, lemma)] = df
        self._df_totals[lemma] = self._df_totals.get(lemma, 0) + df

    def _term_dfs(self, terms: list[str], scope: str | None) -> dict[str, int]:
        missing = [
            t for t in terms if t not in self._known_terms
        ] if not self._all_loaded else []
        if missing:
            rows = (
                self._lemma_stats.filter(F.col("lemma").isin(missing))
                .select("scope", "lemma", "df")
                .collect()
            )
            for r in rows:
                self._add_df(r["scope"], r["lemma"], int(r["df"]))
            self._known_terms.update(missing)
        if scope is not None:
            return {t: self._dfs.get((scope, t), 0) for t in terms}
        return {t: self._df_totals.get(t, 0) for t in terms}

    def _local_blocks(
        self, lemmas: list[str], scope: str | None, positional: bool = False
    ):
        """Pruned block rows for ``lemmas`` as ONE pandas frame, served
        from the per-lemma driver cache; cold lemmas fetch with a single
        pushed ``lemma IN (...)`` point-scan. Eviction drops the oldest
        cached lemma not needed by the current query."""
        import pandas as pd

        cache = self._pos_block_cache if positional else self._block_cache
        sizes = self._pos_block_sizes if positional else self._block_cache_sizes
        missing = [l for l in lemmas if l not in cache]
        if missing:
            got = prune_blocks(
                self.blocks, missing, None, with_positions=positional
            ).toPandas()
            byte_cols = ("doc_ids", "tfs", "doc_lens") + (
                ("positions",) if positional else ()
            )
            for lem in missing:
                frame = got[got["lemma"] == lem].reset_index(drop=True)
                cache[lem] = frame
                sizes[lem] = int(
                    sum(len(b) for col in byte_cols for b in frame[col])
                ) + 256 * len(frame)
            # bounded driver memory (one cap across both caches): evict
            # oldest lemmas not needed by the current query until under
            need = set(lemmas)
            total = lambda: (  # noqa: E731
                sum(self._block_cache_sizes.values())
                + sum(self._pos_block_sizes.values())
            )
            extra = [l for l in cache if l not in need]
            while total() > self._block_cache_cap and extra:
                drop = extra.pop(0)
                cache.pop(drop)
                sizes.pop(drop)
            other_c, other_s = (
                (self._block_cache, self._block_cache_sizes)
                if positional
                else (self._pos_block_cache, self._pos_block_sizes)
            )
            extra = list(other_c)
            while total() > self._block_cache_cap and extra:
                drop = extra.pop(0)
                other_c.pop(drop)
                other_s.pop(drop)
        pdf = pd.concat(
            [cache[lem] for lem in lemmas], ignore_index=True
        )
        if scope is not None:
            pdf = pdf[pdf["scope"] == scope].reset_index(drop=True)
        return pdf

    def _local_venue(self, lemmas: list[str]) -> bool:
        """Venue decision: total cross-scope df of the queried lemmas
        (what a cold fetch actually collects) under the broadcast-sized
        budget — a zero-job cached-dictionary lookup."""
        if self.local_df_budget <= 0:
            return False
        totals = self._term_dfs(sorted(set(lemmas)), None)
        return sum(totals.values()) <= self.local_df_budget

    def _cached(self, key: tuple, fn):
        """LRU result-cache wrapper for the public query methods."""
        if self.result_cache_size <= 0:
            return fn()
        hit = self._result_cache.get(key)
        if hit is not None:
            self._result_cache[key] = self._result_cache.pop(key)  # bump
            return list(hit)
        out = fn()
        self._result_cache[key] = list(out)
        while len(self._result_cache) > self.result_cache_size:
            self._result_cache.pop(next(iter(self._result_cache)))
        return out

    @staticmethod
    def _freeze(d: dict | None):
        if not d:
            return None
        import json

        return json.dumps(d, sort_keys=True, default=str)

    def _hot_venue(self, lemmas: list[str]) -> bool:
        """Second-tier venue decision: lemma df-sum over the LOCAL
        budget but under the HOT budget still serves driver-side (block
        cache + fuse memo). Disabled together with the local venue
        (local_df_budget=0) so a forced-distributed caller gets the
        distributed plan."""
        if self.hot_df_budget <= 0 or self.local_df_budget <= 0:
            return False
        totals = self._term_dfs(sorted(set(lemmas)), None)
        return sum(totals.values()) <= self.hot_df_budget

    def _fuse_memo(self, scope: str | None) -> dict:
        """Per-scope decoded-postings memo for the driver venues (keys
        (shard, lemma) → sorted fused arrays; wand._memo_gather). Scoped
        and unscoped fuses differ (frames are scope-filtered), hence one
        memo per scope value."""
        memo = self._fuse_memos.get(scope)
        if memo is None:
            memo = self._fuse_memos[scope] = {}
        return memo

    def _trim_fuse(self) -> None:
        """Bound the fuse memos: evict oldest-inserted entries across
        all scopes until under ``fuse_cache_bytes``."""
        def entry_bytes(v) -> int:
            # non-positional entries are array triples; positional ones
            # carry a list of per-posting position arrays as element 4
            return int(sum(
                sum(x.nbytes for x in a) if isinstance(a, list) else a.nbytes
                for a in v
            ))

        total = sum(
            entry_bytes(v) for m in self._fuse_memos.values()
            for v in m.values()
        )
        for memo in list(self._fuse_memos.values()):
            while total > self._fuse_cache_cap and memo:
                k = next(iter(memo))
                total -= entry_bytes(memo.pop(k))
            if total <= self._fuse_cache_cap:
                break

    def _block_meta(self, lemma: str, source: str = "postings"):
        """Per-lemma block metadata (scope, shard, first, last arrays)
        from a metadata-ONLY scan — parquet is columnar, so the payload
        byte columns are never read. ~40 B/block driver-side, LRU-capped.
        ``source``: "postings" (term blocks) or "filters" (the
        attribute-filter family — same POSTINGS layout)."""
        import numpy as np

        key = (source, lemma)
        meta = self._meta_cache.get(key)
        if meta is None:
            table = (
                self.blocks if source == "postings"
                else self._filters_table()
            )
            pdf = (
                table.filter(F.col("lemma") == lemma)
                .select("scope", "shard", "first_doc_id", "last_doc_id")
                .toPandas()
            )
            meta = (
                pdf["scope"].to_numpy(object),
                pdf["first_doc_id"].to_numpy(np.int64),
                pdf["last_doc_id"].to_numpy(np.int64),
            )
            self._meta_cache[key] = meta
            while len(self._meta_cache) > 256:
                self._meta_cache.pop(next(iter(self._meta_cache)))
        return meta

    def _hybrid_blocks(self, required: list[str], others: list[str],
                       scope: str | None, positional: bool = False,
                       filter_lemmas: tuple[str, ...] = ()):
        """Hot∧rare hybrid venue: when some REQUIRED lemma(s) fit the
        local budget but a hot partner does not, resolve the rare side
        from the driver block cache, decode its candidate doc_ids, and
        fetch ONLY the hot blocks whose range holds a candidate — a
        pushed ``first_doc_id IN (...)`` point-scan (exact across
        shards: shards partition the doc-id space, so a needed block's
        first can't collide with another shard's; cross-lemma
        collisions merely fetch a superset the kernel
        membership-checks anyway). The shared kernels then run
        driver-side: with df(rare) candidates the touched hot blocks
        are ≤ |candidates|, so the whole query costs O(df_rare)
        instead of O(df_hot) — the classic skip-pointer win, realized
        at the SCAN, which at 10^12 docs is the difference between
        reading 4 GB of a stopword-grade term's blocks and 40 KB.

        ``required``: positive lemmas EVERY match must contain (AND
        conjuncts; the full term set of a phrase; a bool tree's
        top-level plain-term conjuncts) — their postings' intersection
        upper-bounds the match set, which is what makes the candidate
        restriction sound. ``others``: every other lemma the kernel
        reads (exclusions, OR-branch / negated lemmas) — of a non-
        required lemma the kernel only ever needs membership/payloads
        AT candidate docs, so candidate-fetched blocks suffice.
        ``positional=True`` carries the positions payload through both
        the cache and the point-fetch (the phrase kernel's layout).

        ``filter_lemmas``: attribute-filter lemmas (operators/filters.py
        groups, flattened) — candidate-fetched from the FILTER family
        (same POSTINGS layout/sharding): filter postings are typically
        HOT (an attribute value covers a large doc fraction), so the
        venue never loads them whole; a candidate doc holding the
        attribute necessarily lies in a fetched filter block, and a
        shard whose filter group has no fetched rows correctly matches
        nothing there (no candidate in that shard carries the
        attribute — ``wand._gather_required``'s empty-group rule).

        Returns a collected kernel-ready blocks frame, or None to fall
        back to the distributed path. Rank/score-identical by
        construction: same kernels, and the required-conjunct bound
        restricts results to rare-side candidates, whose hot postings
        are all fetched."""
        import numpy as np
        import pandas as pd

        from search_engine_spark.operators.wand import (
            decoded_doc_ids,
            needed_first_docs,
        )

        if self.hybrid_max_fetch_blocks <= 0 or self.local_df_budget <= 0:
            return None
        if not required:
            return None
        lemmas = sorted(set(required) | set(others))
        totals = self._term_dfs(lemmas, None)
        # greedy local side: required terms by df asc while under budget
        rare, cum = [], 0
        for t in sorted(set(required), key=lambda t: (totals[t], t)):
            if cum + totals[t] > self.local_df_budget:
                break
            rare.append(t)
            cum += totals[t]
        if not rare:
            return None  # even the rarest required term is hot
        # small non-required lemmas ride the same cached local fetch;
        # hot ones are candidate-fetched like hot required terms
        # (membership at candidates is all the kernel needs of them)
        local_side = list(rare)
        for e in sorted(set(others), key=lambda t: (totals[t], t)):
            if cum + totals[e] > self.local_df_budget:
                continue
            local_side.append(e)
            cum += totals[e]
        hot = [l for l in lemmas if l not in set(local_side)]
        flt = sorted(set(filter_lemmas))
        if not hot and not flt:
            return None  # fully local — the local venue's case
        local_pdf = self._local_blocks(
            sorted(local_side), scope, positional=positional
        )
        cand = None
        for t in rare:
            ids = decoded_doc_ids(local_pdf, t)
            cand = ids if cand is None else np.intersect1d(
                cand, ids, assume_unique=False
            )
            if cand.size == 0:
                return local_pdf.iloc[0:0]  # AND over empty → empty
        # fetch-efficiency gate, decided on METADATA (cheap, cached):
        # the venue only wins when the candidates touch a small slice
        # of the hot side's blocks — when candidates are spread over
        # most blocks (df_rare ≳ hot block count), nothing can be
        # skipped and the plain pruned scan is strictly better; a huge
        # IN-list also bloats planning. Both caps are per-decision,
        # not per-lemma, so one dense hot term vetoes the venue.
        # Filter lemmas contribute to the same caps but fetch from the
        # FILTER family with their own IN-list.
        def _needed(lemma_list, source):
            out: set[int] = set()
            n_total = 0
            for h in lemma_list:
                scopes, f, l = self._block_meta(h, source)
                if scope is not None:
                    m = scopes == scope
                    scopes, f, l = scopes[m], f[m], l[m]
                n_total += f.size
                need = needed_first_docs(scopes, f, l, cand)
                out.update(int(x) for x in need)
            return out, n_total

        firsts, n_blocks_total = _needed(hot, "postings")
        flt_firsts, flt_total = _needed(flt, "filters")
        n_fetch = len(firsts) + len(flt_firsts)
        if n_fetch > self.hybrid_max_fetch_blocks:
            return None  # IN-list would bloat — distributed wins
        if (n_blocks_total + flt_total) and n_fetch > self.hybrid_fetch_frac * (
            n_blocks_total + flt_total
        ):
            return None  # touching most blocks anyway — nothing to skip
        parts = [local_pdf]
        if firsts:
            parts.append(
                prune_blocks(
                    self.blocks, hot, scope, with_positions=positional
                )
                .filter(F.col("first_doc_id").isin(sorted(firsts)))
                .toPandas()
            )
        if flt_firsts:
            parts.append(
                prune_blocks(self._filters_table(), flt, scope)
                .filter(F.col("first_doc_id").isin(sorted(flt_firsts)))
                .toPandas()
            )
        return pd.concat(parts, ignore_index=True)

    # -- distributed selective-fetch venue (round 4) -------------------------

    def _selective_and(
        self, terms, excl, groups, scope, idfs, avg_len, k, offset,
        mode, combine, after,
    ):
        """Distributed hybrid for conjunctions whose RARE side exceeds
        every driver budget (at 10^12 docs even a mid-df term does):
        job 1 cogroups the rarest required term's block rows with the
        hot lemmas' block METADATA by shard (wand.needed_hot_blocks) —
        candidates never leave the cluster; only the ≤|candidates|
        needed-block KEYS collect — then job 2 runs the ordinary
        per-shard kernels over (rare blocks ∪ candidate-holding hot
        blocks), fetched via a pushed ``first_doc_id IN (...)``
        point-scan exactly like the driver hybrid venue. EXACT with no
        residual check: a dropped hot block holds no candidate, and
        every AND match is a candidate (excluded / attribute-filter
        lemmas only ever matter AT candidates, so their blocks
        candidate-fetch the same way — filters from the FILTER family
        with their own IN-list; wand._gather_required's empty-group
        rule stays correct per shard as in ``_hybrid_blocks``).

        Gates mirror the hybrid venue but on df ESTIMATES (the exact
        hot block count is what we refuse to collect at scale):
        est_blocks(t) = ceil(df_t / BLOCK_SIZE); decline when the
        estimated needed-block count exceeds ``selective_max_fetch_
        blocks`` or ``hybrid_fetch_frac`` of the hot side. Returns
        [(doc_id, score)] or None to fall through."""
        import numpy as np

        from search_engine_spark.operators.compress import BLOCK_SIZE
        from search_engine_spark.operators.wand import needed_hot_blocks

        if self.selective_max_fetch_blocks <= 0:
            return None
        if combine != "and" and len(terms) > 1:
            return None
        totals = self._term_dfs(sorted(set(terms) | set(excl)), scope)
        flt = sorted({l for g in groups for l in g})
        rarest = min(terms, key=lambda t: (totals[t], t))
        df_rare = totals[rarest]
        if df_rare <= 0:
            return None
        hot_post = sorted(
            (set(terms) - {rarest}) | set(excl), key=str
        )
        if not hot_post and not flt:
            return None
        # engage only when the hot side is big enough that the full
        # pruned scan is genuinely SCAN-bound: the venue's extra job
        # (candidate cogroup) costs a fixed scheduling round-trip, so
        # under ~selective_min_blocks of hot blocks (cache-resident at
        # serving sizes) one full scan is strictly cheaper — measured
        # 0.67 s full vs 2.0 s selective at 409 hot blocks on the 1.05M
        # bench index. At 10^12 docs a mid-df term alone clears the
        # floor by orders of magnitude.
        est_blocks = {
            h: -(-totals[h] // BLOCK_SIZE) for h in hot_post
        }
        # filter lemmas have no lemma_stats rows; their exact block
        # count comes from the hybrid venue's metadata cache (attribute
        # vocabularies are bounded, so this stays driver-affordable)
        for h in flt:
            scopes_f, f_first, _ = self._block_meta(h, "filters")
            est_blocks[("f", h)] = (
                int((scopes_f == scope).sum()) if scope is not None
                else f_first.size
            )
        total_est = sum(est_blocks.values())
        if total_est < self.selective_min_blocks:
            return None  # hot side too small for selection to matter
        needed_est = sum(min(df_rare, b) for b in est_blocks.values())
        if needed_est > self.selective_max_fetch_blocks:
            return None
        if needed_est > self.hybrid_fetch_frac * total_est:
            return None  # touching most blocks anyway
        rare_blocks = prune_blocks(self.blocks, [rarest], scope)
        meta_cols = ["shard", "scope", "lemma", "first_doc_id",
                     "last_doc_id"]
        metas = []
        if hot_post:
            mp = self.blocks.filter(F.col("lemma").isin(hot_post))
            if scope is not None:
                mp = mp.filter(F.col("scope") == scope)
            metas.append(
                mp.select(*meta_cols).withColumn("family", F.lit("postings"))
            )
        if flt:
            mf = self._filters_table().filter(F.col("lemma").isin(flt))
            if scope is not None:
                mf = mf.filter(F.col("scope") == scope)
            metas.append(
                mf.select(*meta_cols).withColumn("family", F.lit("filters"))
            )
        hot_meta = metas[0]
        for m_ in metas[1:]:
            hot_meta = hot_meta.unionByName(m_)
        needed = needed_hot_blocks(rare_blocks, hot_meta, [rarest]).collect()
        if len(needed) > self.selective_max_fetch_blocks:
            return None  # estimate was optimistic — IN-list would bloat
        post_firsts = sorted(
            {int(r["first_doc_id"]) for r in needed
             if r["family"] == "postings"}
        )
        flt_firsts = sorted(
            {int(r["first_doc_id"]) for r in needed
             if r["family"] == "filters"}
        )
        parts = [rare_blocks]
        if post_firsts:
            parts.append(
                prune_blocks(self.blocks, hot_post, scope).filter(
                    F.col("first_doc_id").isin(post_firsts)
                )
            )
        if flt_firsts:
            parts.append(
                prune_blocks(self._filters_table(), flt, scope).filter(
                    F.col("first_doc_id").isin(flt_firsts)
                )
            )
        blocks = parts[0]
        for p in parts[1:]:
            blocks = blocks.unionByName(p)
        rows = _blocks_core(
            blocks, terms, idfs, avg_len, k, offset, mode, combine,
            excl, groups, after,
        ).collect()
        return [(r["doc_id"], r["score"]) for r in rows]

    def _elite_summary(self, term: str, scope: str | None):
        """(ids, tfs, dls, strata_tf, strata_min_dl) for one term — the
        global top-``elite_top`` postings by the impact proxy plus the
        per-tf residual strata of everything else. Built by ONE
        distributed per-shard reduce over the term's blocks (the same
        scan a full query pays, reduced to ≤ shards × elite_top rows),
        then memoized for the epoch — every later query on the term is
        driver-side math over ≤ elite_top postings, no Spark jobs.
        When the impact cache covers the term, the reduce is replaced
        by a pushed rank-prefix read (``_elite_from_impact``) —
        O(shards × elite_top) instead of O(df), the persisted form of
        this memo."""
        import numpy as np

        from search_engine_spark.operators.wand import (
            ELITE_ROWS,
            elite_reduce_kernel,
            merge_elite_summaries,
        )

        key = (term, scope)
        hit = self._elite_memos.get(key)
        if hit is None:
            hit = self._elite_from_impact(term, scope)
        if hit is None:
            rows = (
                prune_blocks(self.blocks, [term], scope)
                .groupBy("shard")
                .applyInPandas(
                    elite_reduce_kernel(self.elite_top), schema=ELITE_ROWS
                )
                .toPandas()
            )
            hit = merge_elite_summaries(rows, self.elite_top)
        if key not in self._elite_memos:
            self._elite_memos[key] = hit
            while len(self._elite_memos) > 512:
                self._elite_memos.pop(next(iter(self._elite_memos)))
        return hit

    def _elite_from_impact(self, term: str, scope: str | None):
        """Elite summary from the impact-ordered cache, when it covers
        the term: ranks [0, ceil(E/128)) of every (scope, lemma,
        shard) group necessarily contain the shard's true top-E by the
        proxy (the layout IS the proxy order), so one pushed
        ``rank < r`` read — O(shards × E) rows instead of the O(df)
        reduce — yields identical elite candidates; the residual
        strata fold the fetched-but-spilled postings' EXACT (tf, dl)
        pairs plus each scope group's suffix descriptor
        ((next_tf, next_dl) and its global strata below next_tf) —
        bounds that are valid for any (idf, avgdl) and at most
        slightly looser than the reduce's rest-only strata
        (conservative: looser residuals only ever DECLINE a
        certificate). None when the cache is absent or skips the
        term."""
        import numpy as np
        import pandas as pd

        from search_engine_spark.operators.compress import BLOCK_SIZE
        from search_engine_spark.operators.impact import prune_impact
        from search_engine_spark.operators.wand import (
            _gather_term,
            merge_elite_summaries,
        )

        if self.elite_top <= 0:
            return None
        max_rank = self._impact_info()["terms"].get(term)
        if max_rank is None:
            return None
        r = max(1, -(-self.elite_top // BLOCK_SIZE))
        pdf = prune_impact(
            self._impact_table(), [term], scope, r
        ).toPandas()
        k0 = pdf[pdf["kind"] == 0]
        k1 = pdf[pdf["kind"] == 1]
        if k0.empty:
            z = np.empty(0, dtype=np.int64)
            return z, z.copy(), z.copy(), z.copy(), z.copy()
        rows = []
        for shard, sub in k0.groupby("shard", sort=False):
            ids, tfs, dls = _gather_term(sub)
            order = np.lexsort((ids, dls, -tfs))
            keep, rest = order[:self.elite_top], order[self.elite_top:]
            rows.append(pd.DataFrame(
                {"doc_id": ids[keep], "tf": tfs[keep], "dl": dls[keep],
                 "kind": 0}
            ))
            if rest.size:
                rows.append(pd.DataFrame(
                    {"doc_id": -1, "tf": tfs[rest], "dl": dls[rest],
                     "kind": 1}
                ))
            for sc, g in sub.groupby("scope", sort=False):
                i = int(g["rank"].to_numpy().argmax())
                nt = int(g["next_tf"].iloc[i])
                nd = int(g["next_dl"].iloc[i])
                if nt < 0:
                    continue  # scope group fully inside the prefix
                s_tf, s_dl = [nt], [nd]
                st = k1[
                    (k1["shard"] == shard) & (k1["scope"] == sc)
                    & (k1["max_tf"] < nt)
                ]
                if len(st):
                    s_tf += st["max_tf"].tolist()
                    s_dl += st["min_dl"].tolist()
                rows.append(pd.DataFrame(
                    {"doc_id": -1, "tf": s_tf, "dl": s_dl, "kind": 1}
                ))
        return merge_elite_summaries(
            pd.concat(rows, ignore_index=True), self.elite_top
        )

    def _elite_single(
        self, term, scope, idfs, avg_len, k, offset, mode, after,
    ):
        """Single-term top-k from the elite summary with an exact
        certificate: score the ≤ elite_top summarized postings with the
        pinned evaluation shape, take the pinned (score desc, doc_id
        asc) top-m, and accept iff the m-th score STRICTLY beats the
        residual bound max over strata of score(tf, min_dl) — every
        non-elite posting of stratum tf scores ≤ that stratum's bound
        under ANY (idf, avgdl), the same monotonicity pin as the block
        WAND bounds. Strata empty (df ≤ elite_top) means the summary IS
        the whole postings list — exact unconditionally. None → fall
        through (the full path serves; the memo stays for next time).
        Certification failures after the build cost only driver-side
        arithmetic — the one-time reduce is the only Spark job this
        venue ever runs per (term, scope, epoch)."""
        import numpy as np

        from search_engine_spark.operators.wand import (
            _after_cut,
            _term_scores,
        )

        if self.elite_top <= 0:
            return None
        ids, tfs, dls, s_tf, s_dl = self._elite_summary(term, scope)
        if ids.size == 0:
            return []
        m = offset + k
        scores = _term_scores(tfs, dls, idfs[0], avg_len)
        cand, cscores = _after_cut(ids, scores, after)
        order = np.lexsort((cand, -cscores))[:m]
        exhaustive = s_tf.size == 0
        if not exhaustive:
            residual = float(
                _term_scores(s_tf, s_dl, idfs[0], avg_len).max()
            )
            if order.size < m or not (
                float(cscores[order[-1]]) > residual
            ):
                return None
        return [
            (int(cand[i]), float(cscores[i])) for i in order[offset:]
        ]

    def _elite_multi(
        self, terms, excl, groups, scope, idfs, avg_len, k, offset,
        mode, combine, after,
    ):
        """Multi-term top-k past EVERY budget (the both-hot answer when
        even the serving cache can't hold the postings): candidates =
        the union of every positive term's elite ids (≤ |terms|·E).
        A true match outside the candidate set has ALL its postings
        non-elite, so its score is ≤ Σ_t strata-residual(t) — the
        certificate. Candidates' exact scores come from ONE pushed
        ``first_doc_id IN (...)`` point-fetch of all query lemmas'
        (and exclusions' / attribute filters') candidate-holding
        blocks — the hybrid venue's fetch — run through the SHARED
        kernels (blocks_core_local), so scores are pinned-identical by
        construction. Extra docs that ride along in fetched blocks are
        either fully covered (exact, a bonus) or outside the candidate
        set (bounded by the same residual; in OR mode their partial
        sums UNDERestimate, which the certificate makes harmless —
        computed < θ). Accept iff the merged m-th score strictly beats
        the summed residuals; a term set whose strata are ALL empty is
        fully summarized and needs no certificate. None → fall through
        to the distributed paths.

        Warm cost: one point-fetch Spark job per query (the one-time
        per-term elite reduces amortize across the epoch); memory
        stays O(|terms|·E) however hot the terms are."""
        import numpy as np
        import pandas as pd

        from search_engine_spark.operators.wand import (
            _term_scores,
            blocks_core_local,
            needed_first_docs,
        )

        if self.elite_top <= 0 or self.hybrid_max_fetch_blocks <= 0:
            return None
        if combine not in ("and", "or"):
            return None
        # scan-bound floor (same reasoning as _selective_and): warm
        # serving costs one point-fetch job per query, so it only beats
        # the single full-scan job when the query's postings are big
        # enough that scanning them dominates a scheduling round-trip
        from search_engine_spark.operators.compress import BLOCK_SIZE

        totals = self._term_dfs(sorted(set(terms)), scope)
        if sum(
            -(-totals[t] // BLOCK_SIZE) for t in set(terms)
        ) < self.selective_min_blocks:
            return None
        cand_parts, resid_sum, all_exhaustive = [], 0.0, True
        for t, idf in zip(terms, idfs):
            ids, tfs, dls, s_tf, s_dl = self._elite_summary(t, scope)
            cand_parts.append(ids)
            if s_tf.size:
                all_exhaustive = False
                resid_sum += float(
                    _term_scores(s_tf, s_dl, idf, avg_len).max()
                )
        cand = np.unique(np.concatenate(cand_parts)) if cand_parts else (
            np.empty(0, dtype=np.int64)
        )
        if cand.size == 0:
            return []
        flt = sorted({l for g in groups for l in g})

        def _needed(lemma_list, source):
            out: set[int] = set()
            for h in lemma_list:
                scopes, f, l = self._block_meta(h, source)
                if scope is not None:
                    msk = scopes == scope
                    scopes, f, l = scopes[msk], f[msk], l[msk]
                need = needed_first_docs(scopes, f, l, cand)
                out.update(int(x) for x in need)
            return out

        lemmas = sorted(set(terms) | set(excl))
        firsts = _needed(lemmas, "postings")
        flt_firsts = _needed(flt, "filters") if flt else set()
        if len(firsts) + len(flt_firsts) > self.hybrid_max_fetch_blocks:
            return None
        parts = []
        if firsts:
            parts.append(
                prune_blocks(self.blocks, lemmas, scope)
                .filter(F.col("first_doc_id").isin(sorted(firsts)))
                .toPandas()
            )
        if flt_firsts:
            parts.append(
                prune_blocks(self._filters_table(), flt, scope)
                .filter(F.col("first_doc_id").isin(sorted(flt_firsts)))
                .toPandas()
            )
        if not parts:
            return []
        pdf = pd.concat(parts, ignore_index=True)
        m = offset + k
        merged = blocks_core_local(
            pdf, terms, idfs, avg_len, m, 0, mode, combine, excl,
            after, req_groups=tuple(groups),
        )
        if not all_exhaustive:
            if len(merged) < m:
                return None  # an uncovered match could still fill it
            if not (merged[m - 1][1] > resid_sum):
                return None
        return merged[offset:]

    def _elite_phrase(
        self, seq, uniq, idfs, avg_len, k, offset, slop, groups, after,
        scope,
    ):
        """Phrase twin of ``_elite_multi`` (round 4): a phrase is
        conjunctive over its terms, so a match outside the union of
        the terms' elite ids has ONLY non-elite postings and scores
        ≤ the summed per-term strata residuals — the same certificate,
        position-blind (the bound needs no positional reasoning: it
        bounds BM25, and a non-candidate match's score is what the
        certificate compares against θ). Candidates point-fetch their
        POSITIONAL blocks (complete per-block position payloads, so
        the reachability verify is exact on fetched docs); ride-along
        docs are either fully covered (exact, a bonus) or outside the
        union (under the residual). Phrases with fewer than m verified
        matches can never certify against non-empty strata — a
        selective phrase falls through after one point-fetch job; the
        venue pays off exactly on the HOT phrases ("of the"-grade)
        whose full positional scan is the expensive path. Attribute
        filters candidate-fetch from the filter family (non-positional
        rows; the kernel only reads their doc_ids)."""
        import numpy as np
        import pandas as pd

        from search_engine_spark.operators.compress import BLOCK_SIZE
        from search_engine_spark.operators.wand import (
            _shard_phrase_kernel,
            _term_scores,
            needed_first_docs,
            run_kernel_local,
        )

        if self.elite_top <= 0 or self.hybrid_max_fetch_blocks <= 0:
            return None
        totals = self._term_dfs(sorted(set(uniq)), scope)
        if sum(
            -(-totals[t] // BLOCK_SIZE) for t in set(uniq)
        ) < self.selective_min_blocks:
            return None
        cand_parts, resid_sum, all_exhaustive = [], 0.0, True
        for t, idf in zip(uniq, idfs):
            ids, tfs, dls, s_tf, s_dl = self._elite_summary(t, scope)
            cand_parts.append(ids)
            if s_tf.size:
                all_exhaustive = False
                resid_sum += float(
                    _term_scores(s_tf, s_dl, idf, avg_len).max()
                )
        cand = np.unique(np.concatenate(cand_parts))
        if cand.size == 0:
            return []
        flt = sorted({l for g in groups for l in g})

        def _needed(lemma_list, source):
            out: set[int] = set()
            for h in lemma_list:
                scopes, f, l = self._block_meta(h, source)
                if scope is not None:
                    msk = scopes == scope
                    scopes, f, l = scopes[msk], f[msk], l[msk]
                need = needed_first_docs(scopes, f, l, cand)
                out.update(int(x) for x in need)
            return out

        firsts = _needed(uniq, "postings")
        flt_firsts = _needed(flt, "filters") if flt else set()
        if len(firsts) + len(flt_firsts) > self.hybrid_max_fetch_blocks:
            return None
        parts = []
        if firsts:
            parts.append(
                prune_blocks(self.blocks, uniq, scope, with_positions=True)
                .filter(F.col("first_doc_id").isin(sorted(firsts)))
                .toPandas()
            )
        if flt_firsts:
            fp = (
                prune_blocks(self._filters_table(), flt, scope)
                .filter(F.col("first_doc_id").isin(sorted(flt_firsts)))
                .toPandas()
            )
            fp["positions"] = None
            parts.append(fp)
        if not parts:
            return []
        pdf = pd.concat(parts, ignore_index=True)
        m = offset + k
        kernel = _shard_phrase_kernel(
            seq, uniq, idfs, avg_len, m, slop, tuple(groups), after
        )
        merged = run_kernel_local(pdf, kernel, m, 0)
        if not all_exhaustive:
            if len(merged) < m:
                return None  # an uncovered match could still fill it
            if not (merged[m - 1][1] > resid_sum):
                return None
        return merged[offset:]

    @staticmethod
    def _needs_positive(tree) -> bool:
        """True iff EVERY match of the bool tree must contain at least
        one positive lemma — the condition that makes the elite-union
        candidate bound sound for bool queries. AND: all positive
        children hold, so one guaranteeing child suffices; OR: any
        child may be the satisfied one, so all must guarantee."""
        if tree[0] == "term":
            return True
        if tree[0] == "and":
            return any(
                QueryServer._needs_positive(c) for c in tree[1]
            )
        return bool(tree[1]) and all(
            QueryServer._needs_positive(c) for c in tree[1]
        )

    def _elite_bool(
        self, tree, terms, idfs, avg_len, k, offset, groups, after,
        scope,
    ):
        """Bool-tree twin of ``_elite_multi``: candidates = union of
        every positive lemma's elite ids; a match outside the union has
        only non-elite positive postings, so its score ≤ the summed
        per-term strata residuals (boosted idfs included — ``idfs``
        already folds the ``a^2`` weights, and the bound is monotone
        under any positive idf). Candidate point-fetch covers ALL tree
        lemmas (negated ones only matter AT candidates; a ride-along
        doc with a missed negation is outside the union, hence under
        the residual and below θ whenever the certificate passes — the
        same argument that covers missed exclusions in _elite_multi).
        Declines trees that can match on pure negation
        (``_needs_positive``) and below the scan-bound floor."""
        import numpy as np

        from search_engine_spark.functions.boolquery import all_lemmas
        from search_engine_spark.operators.compress import BLOCK_SIZE
        from search_engine_spark.operators.wand import (
            _shard_bool_kernel,
            _term_scores,
            needed_first_docs,
            run_kernel_local,
        )

        if self.elite_top <= 0 or self.hybrid_max_fetch_blocks <= 0:
            return None
        if not terms or not self._needs_positive(tree):
            return None
        totals = self._term_dfs(sorted(set(terms)), scope)
        if sum(
            -(-totals[t] // BLOCK_SIZE) for t in set(terms)
        ) < self.selective_min_blocks:
            return None
        cand_parts, resid_sum, all_exhaustive = [], 0.0, True
        for t, idf in zip(terms, idfs):
            ids, tfs, dls, s_tf, s_dl = self._elite_summary(t, scope)
            cand_parts.append(ids)
            if s_tf.size:
                all_exhaustive = False
                resid_sum += float(
                    _term_scores(s_tf, s_dl, idf, avg_len).max()
                )
        cand = np.unique(np.concatenate(cand_parts))
        if cand.size == 0:
            return []
        flt = sorted({l for g in groups for l in g})

        def _needed(lemma_list, source):
            out: set[int] = set()
            for h in lemma_list:
                scopes, f, l = self._block_meta(h, source)
                if scope is not None:
                    msk = scopes == scope
                    scopes, f, l = scopes[msk], f[msk], l[msk]
                need = needed_first_docs(scopes, f, l, cand)
                out.update(int(x) for x in need)
            return out

        lemmas = sorted(set(all_lemmas(tree)))
        firsts = _needed(lemmas, "postings")
        flt_firsts = _needed(flt, "filters") if flt else set()
        if len(firsts) + len(flt_firsts) > self.hybrid_max_fetch_blocks:
            return None
        import pandas as pd

        parts = []
        if firsts:
            parts.append(
                prune_blocks(self.blocks, lemmas, scope)
                .filter(F.col("first_doc_id").isin(sorted(firsts)))
                .toPandas()
            )
        if flt_firsts:
            parts.append(
                prune_blocks(self._filters_table(), flt, scope)
                .filter(F.col("first_doc_id").isin(sorted(flt_firsts)))
                .toPandas()
            )
        if not parts:
            return []
        pdf = pd.concat(parts, ignore_index=True)
        m = offset + k
        kernel = _shard_bool_kernel(
            tree, terms, idfs, avg_len, m, tuple(groups), after
        )
        merged = run_kernel_local(pdf, kernel, m, 0)
        if not all_exhaustive:
            if len(merged) < m:
                return None
            if not (merged[m - 1][1] > resid_sum):
                return None
        return merged[offset:]

    # -- impact-ordered rank-prefix venues (operators/impact.py) -------------

    def _impact_info(self) -> dict:
        """The impact cache's manifest ({lemma: max_rank}); {} when the
        index has no `.cache_impact/` family. Loaded once per epoch
        (refresh() swaps a fresh server, re-detecting the cache)."""
        if self._impact_manifest is None:
            from search_engine_spark.operators.impact import load_manifest

            m = load_manifest(self.index_dir)
            self._impact_manifest = m if m is not None else {"terms": {}}
        return self._impact_manifest

    def _impact_table(self):
        if self._impact_blocks is None:
            from search_engine_spark.operators.impact import impact_blocks

            self._impact_blocks = impact_blocks(self.spark, self.index_dir)
            if self._cache_blocks:
                self._impact_blocks = self._impact_blocks.persist()
        return self._impact_blocks

    def _impact_rounds_iter(self, m: int, max_rank: int, start_r=None):
        """Geometric rank-prefix schedule: start where the prefix holds
        ≥ max(2m, floor) postings per shard (or at ``start_r``, the
        depth memo's last certified prefix), escalate ×impact_escalate,
        and clamp the LAST eligible round to full coverage (max_rank+1)
        — a full-coverage round emits no sentinels, so it is certified
        by construction and costs the same bytes the full scan would,
        without the extra escape job."""
        from search_engine_spark.operators.compress import BLOCK_SIZE

        r = max(
            1,
            -(-max(2 * m, self.selective_floor_postings) // BLOCK_SIZE),
        )
        if start_r is not None:
            r = max(r, start_r)
        for _ in range(self.impact_rounds):
            r_eff = min(r, max_rank + 1)
            yield r_eff
            if r_eff > max_rank:
                return  # full coverage already ran — certified
            r *= self.impact_escalate

    def _impact_single(
        self, term, scope, idfs, avg_len, k, offset, after, excl=(),
    ):
        """Single-term top-k over the impact-ordered prefix: ranks
        [0, R) score exactly (one term — trivially the pinned shape),
        and the merge accepts iff the m-th score strictly beats every
        shard's residual (operators/impact.py docstring). Unlike
        ``_selective_single``'s per-128-doc-block bounds, the prefix
        bounds DECREASE along the layout, so flat-tf corpora certify
        as soon as doc lengths differentiate — the measured saturation
        class. Mode-independent (every fetched posting is scored).
        None → escalate exhausted / cache absent → caller falls
        through."""
        from search_engine_spark.operators.compress import BLOCK_SIZE
        from search_engine_spark.operators.impact import (
            impact_single_kernel,
            merge_certified,
            prune_impact,
        )
        from search_engine_spark.schemas import SEARCH_RESULT

        if self.impact_rounds <= 0:
            return None
        max_rank = self._impact_info()["terms"].get(term)
        excl = tuple(sorted(excl))
        skip_key = (term, scope, excl, "imp")
        if max_rank is None or skip_key in self._impact_skip:
            return None
        df = self._term_dfs([term], scope)[term]
        if -(-df // BLOCK_SIZE) < self.impact_min_blocks:
            return None  # scan-bound floor (venue cost model)
        m = offset + k
        left = (
            prune_blocks(self.blocks, list(excl), scope) if excl else None
        )
        depth_key = ("s", term, scope)
        for r in self._impact_rounds_iter(
            m, max_rank, self._impact_depth.get(depth_key)
        ):
            right = prune_impact(self._impact_table(), [term], scope, r)
            if excl:
                # ``term -spam`` shape: exclusions anchor (full
                # doc-ordered fetch — they must be DECIDED, not
                # bounded) via a cogroup; the residual certificate is
                # unchanged (dropping excluded docs only shrinks the
                # suffix)
                from search_engine_spark.operators.impact import (
                    impact_single_excl_kernel,
                )

                rows = (
                    left.groupBy("shard")
                    .cogroup(right.groupBy("shard"))
                    .applyInPandas(
                        impact_single_excl_kernel(
                            term, idfs[0], avg_len, m, excl, after
                        ),
                        schema=SEARCH_RESULT,
                    )
                    .collect()
                )
            else:
                rows = (
                    right.groupBy("shard")
                    .applyInPandas(
                        impact_single_kernel(
                            term, idfs[0], avg_len, m, after
                        ),
                        schema=SEARCH_RESULT,
                    )
                    .collect()
                )
            out = merge_certified(rows, k, offset)
            if out is not None:
                self._impact_depth[depth_key] = r
                return out
        self._impact_skip.add(skip_key)
        return None

    def _impact_and(
        self, terms, excl, groups, scope, idfs, avg_len, k, offset,
        after,
    ):
        """Conjunction venue over the impact layout — the class every
        other over-budget venue declines: df_rare too big for
        candidate IN-lists (selective/_elite fetch caps), postings too
        big for any driver cache. Anchors (the rarest term + any term
        without impact coverage + exclusions) scan their doc-ordered
        postings in full — O(df_anchor), the lower bound any
        conjunction pays — while hot partners contribute only ranks
        [0, R): membership in the prefix scores exactly, absence is
        bounded by the per-shard residual, and the merged certificate
        (operators/impact.py merge_certified) makes the answer exact
        or escalates. Cost: O(df_anchor + shards·R·128) per round vs
        the full path's O(Σ df). Attribute filters fall through to
        the full path (candidate-level filter fetch belongs to the
        selective venues)."""
        from search_engine_spark.operators.compress import BLOCK_SIZE
        from search_engine_spark.operators.impact import (
            impact_and_kernel,
            merge_certified,
            prune_impact,
        )
        from search_engine_spark.schemas import SEARCH_RESULT

        if self.impact_rounds <= 0 or groups or len(terms) < 2:
            return None
        covered = self._impact_info()["terms"]
        totals = self._term_dfs(sorted(set(terms) | set(excl)), scope)
        rarest = min(terms, key=lambda t: (totals[t], t))
        anchors = sorted({t for t in terms if t not in covered} | {rarest})
        partners = [t for t in terms if t not in anchors]
        if not partners:
            return None
        if sum(
            -(-totals[t] // BLOCK_SIZE) for t in partners
        ) < self.impact_min_blocks:
            return None  # partners too small — full scan is cheaper
        key = (tuple(sorted(terms)), tuple(sorted(excl)), scope, "imp")
        if key in self._impact_skip:
            return None
        max_rank = max(covered[t] for t in partners)
        left = prune_blocks(self.blocks, anchors + sorted(excl), scope)
        m = offset + k
        kern = impact_and_kernel(
            anchors, partners, terms, idfs, avg_len, m,
            tuple(sorted(excl)), after,
        )
        depth_key = ("a", tuple(sorted(partners)), scope)
        for r in self._impact_rounds_iter(
            m, max_rank, self._impact_depth.get(depth_key)
        ):
            right = prune_impact(self._impact_table(), partners, scope, r)
            rows = (
                left.groupBy("shard")
                .cogroup(right.groupBy("shard"))
                .applyInPandas(kern, schema=SEARCH_RESULT)
                .collect()
            )
            out = merge_certified(rows, k, offset)
            if out is not None:
                self._impact_depth[depth_key] = r
                return out
        self._impact_skip.add(key)
        return None

    def _block_meta_bounds(self, lemma: str, scope: str | None):
        """One term's block metadata incl. the WAND bound inputs
        (shard, first, count, max_tf, min_dl arrays) from a
        metadata-only columnar scan; None when the term's block count
        exceeds ``selective_meta_max_rows`` (at that scale the
        selection itself must go distributed — the documented
        follow-up). Cached per (lemma, scope)."""
        import numpy as np

        key = ("bounds", lemma, scope)
        meta = self._meta_cache.get(key)
        if meta is None:
            t = self.blocks.filter(F.col("lemma") == lemma)
            if scope is not None:
                t = t.filter(F.col("scope") == scope)
            t = t.select("shard", "first_doc_id", "count", "max_tf",
                         "min_dl")
            pdf = t.limit(self.selective_meta_max_rows + 1).toPandas()
            if len(pdf) > self.selective_meta_max_rows:
                meta = "over"
            else:
                meta = (
                    pdf["shard"].to_numpy(np.int64),
                    pdf["first_doc_id"].to_numpy(np.int64),
                    pdf["count"].to_numpy(np.int64),
                    pdf["max_tf"].to_numpy(np.int64),
                    pdf["min_dl"].to_numpy(np.int64),
                )
            self._meta_cache[key] = meta
            while len(self._meta_cache) > 256:
                self._meta_cache.pop(next(iter(self._meta_cache)))
        return None if meta == "over" else meta

    def _selective_single(
        self, term, scope, idfs, avg_len, k, offset, mode, after,
    ):
        """Impact-selective distributed top-k for ONE term (round 4):
        select the blocks whose (max_tf, min_dl) score bound can reach
        the top-m from a metadata-only scan (wand.select_blocks_by_
        bound), fetch and score only those, and accept the merged
        result iff its m-th score strictly beats the best skipped
        bound — otherwise return None and the caller's full scan runs
        (exactness by escalation, never by hope). Single-positive-term
        only: with several OR terms a partially-fetched doc would get
        a PARTIAL score sum, which no residual argument repairs.

        Block-level impact selection is weak when per-block maxima
        saturate — a 128-posting block's max_tf is an extreme value
        over 128 docs, so on flat tf distributions most blocks share
        the top bound and certification can't succeed (the exact
        best_sel ≤ residual decline catches the fully-flat case for
        free). A term that DID escalate once is remembered in an
        epoch-lived skip memo so steady-state serving never pays the
        double job twice; the durable fix for this class is the
        impact-ORDERED posting layout (postings sorted by impact, not
        doc) noted as the follow-up in CLAUDE.md."""
        import numpy as np

        from search_engine_spark.operators.wand import (
            _shard_exact_kernel,
            _shard_wand_kernel,
            select_blocks_by_bound,
        )
        from search_engine_spark.schemas import SEARCH_RESULT

        if self.selective_max_fetch_blocks <= 0:
            return None
        skip = getattr(self, "_selective_skip", None)
        if skip is None:
            skip = self._selective_skip = set()
        if (term, scope) in skip:
            return None
        meta = self._block_meta_bounds(term, scope)
        if meta is None:
            return None
        shards, firsts, counts, mtf, mdl = meta
        if firsts.size < self.selective_min_blocks:
            return None
        m = offset + k
        sel_firsts, residual, best_sel = select_blocks_by_bound(
            shards, firsts, counts, mtf, mdl, idfs[0], avg_len, m,
            floor_postings=self.selective_floor_postings,
        )
        if (
            sel_firsts.size >= firsts.size
            or sel_firsts.size > self.selective_max_fetch_blocks
            or sel_firsts.size > self.hybrid_fetch_frac * firsts.size
        ):
            return None
        if not (best_sel > residual):
            # no score can exceed best_sel, so θ > residual is already
            # impossible — decline for free instead of fetching and
            # escalating (exact reasoning, not a tuning heuristic)
            return None
        blocks = prune_blocks(self.blocks, [term], scope).filter(
            F.col("first_doc_id").isin([int(x) for x in sel_firsts])
        )
        kern = {"wand": _shard_wand_kernel, "exact": _shard_exact_kernel}[
            mode
        ]([term], idfs, avg_len, m, (), (), after)
        rows = (
            blocks.groupBy("shard")
            .applyInPandas(kern, schema=SEARCH_RESULT)
            .collect()
        )
        ids = np.array([r["doc_id"] for r in rows], dtype=np.int64)
        scores = np.array([r["score"] for r in rows], dtype=np.float64)
        order = np.lexsort((ids, -scores))[:m]
        if order.size < m or not (float(scores[order[-1]]) > residual):
            # a skipped block could still reach the top-m — escalate,
            # and remember: this term's bound distribution can't
            # certify at this block granularity (see docstring)
            skip.add((term, scope))
            return None
        return [
            (int(ids[i]), float(scores[i])) for i in order[offset:]
        ]

    # -- query ---------------------------------------------------------------

    def _variants(self, max_dist: int = 1):
        """Persisted deletion-neighborhood table (variant, lemma), built
        once per index epoch and depth on first fuzzy use (upserts delete
        them like the flat-postings cache); fuzzy lookups then run as a
        pushed ``variant IN (...)`` parquet point-read instead of
        regenerating the neighborhood of the whole dictionary per query."""
        import os

        from search_engine_spark.operators.fuzzy import write_variant_table

        suffix = "" if max_dist <= 1 else f"_d{max_dist}"
        path = f"{self.index_dir}/.cache_variants{suffix}"
        if not os.path.exists(path):
            write_variant_table(self._lemma_stats, path, max_dist=max_dist)
        return self.spark.read.parquet(path)

    def _fuzzy_correct(
        self, terms: list[str], scope: str | None, max_dist: int = 1
    ) -> list[str]:
        """Serving-path spell correction: uses the cached dictionary to
        spot unknown terms (no Spark job when all terms are known), then
        one small candidate query per typo (operators/fuzzy.py)."""
        from search_engine_spark.operators.fuzzy import fuzzy_match

        dfs = self._term_dfs(terms, scope)
        out = []
        variants = None
        for t in terms:
            if dfs[t] > 0:
                out.append(t)
                continue
            if variants is None:
                variants = self._variants(max_dist)
            best = fuzzy_match(
                self._lemma_stats, t, scope=scope, variants=variants,
                max_dist=max_dist,
            ).head(1)
            if best:
                out.append(best[0]["lemma"])
        return sorted(set(out))

    def suggest(
        self, prefix: str, k: int = 10, scope: str | None = None
    ) -> list[tuple[str, int]]:
        """Prefix completions [(lemma, cf)] ranked cf desc, lemma asc."""
        from search_engine_spark.operators.fuzzy import suggest as suggest_op

        rows = suggest_op(self._lemma_stats, prefix, k=k, scope=scope).collect()
        return [(r["lemma"], int(r["cf"])) for r in rows]

    def _prepare(
        self,
        query: str,
        scope: str | None,
        combine: str,
        fuzzy: bool,
        fuzzy_dist: int,
    ):
        """Shared term-query first stage: analysis, wildcard/negation
        splitting, fuzzy correction, cached-stats resolution, cutoff
        gates, pruned block scan. Returns ``None`` when the query
        provably matches nothing, else
        ``(blocks, terms, rescore_terms, idfs, avg_len, excl)`` ready
        for a kernel (``search``/``facets`` both build on it)."""
        from search_engine_spark.functions.analyze import (
            split_negations,
            split_wildcards,
        )

        pos_q, neg_q = split_negations(query)
        excl = query_lemmas(neg_q) if neg_q else []
        pos_q, prefixes = split_wildcards(pos_q)
        expansions: list[str] = []
        if prefixes:
            if combine != "or":
                raise ValueError("wildcards require combine='or'")
            from search_engine_spark.operators.fuzzy import expand_prefix

            for p in prefixes:  # sorted unique → deterministic
                expansions.extend(
                    expand_prefix(self._lemma_stats, p, scope=scope)
                )
        terms = sorted(set(query_lemmas(pos_q)) | set(expansions))
        if not terms:
            return None
        if excl and set(excl) & set(terms):
            return None  # exclusion wins (oracle.search pin)
        if fuzzy:
            # exclusions pass through UNcorrected (api.py pin)
            terms = self._fuzzy_correct(terms, scope, fuzzy_dist)
            if not terms:
                return None
            if excl and set(excl) & set(terms):
                return None  # a correction may land on an excluded lemma
        n_docs, avg_len = self._scope_stats(scope)
        if n_docs == 0:
            return None
        dfs = self._term_dfs(terms, scope)
        # proximity rescoring spans the UNpruned scored-term set — an
        # OR-cutoff-dropped term still narrows the covering window
        # (oracle.rescore_search pin: terms = query_lemmas(query))
        rescore_terms = sorted(set(terms))
        if combine == "or":
            cutoff = df_cutoff(n_docs)
            terms = [t for t in terms if dfs[t] <= cutoff]
            if not terms:
                return None
        elif query_killed_by_cutoff(list(dfs.values()), n_docs):
            return None
        idfs = [bm25_idf(dfs[t], n_docs) for t in terms]
        blocks = prune_blocks(self.blocks, terms + excl, scope)
        return blocks, terms, rescore_terms, idfs, avg_len, excl

    def search(
        self,
        query: str,
        scope: str | None = None,
        k: int = 10,
        offset: int = 0,
        mode: str = "wand",
        combine: str = "and",
        fuzzy: bool = False,
        fuzzy_dist: int = 1,
        filters: dict | None = None,
        after: tuple[float, int] | None = None,
        rescore_window: int = 0,
        collapse: str | None = None,
        collapse_limit: int = 1,
    ) -> list[tuple[int, float]]:
        key = ("search", query, scope, k, offset, mode, combine, fuzzy,
               fuzzy_dist, self._freeze(filters), after, rescore_window,
               collapse, collapse_limit)
        return self._cached(key, lambda: self._search_impl(
            query, scope, k, offset, mode, combine, fuzzy, fuzzy_dist,
            filters, after, rescore_window, collapse, collapse_limit,
        ))

    def _search_impl(
        self,
        query: str,
        scope: str | None = None,
        k: int = 10,
        offset: int = 0,
        mode: str = "wand",
        combine: str = "and",
        fuzzy: bool = False,
        fuzzy_dist: int = 1,
        filters: dict | None = None,
        after: tuple[float, int] | None = None,
        rescore_window: int = 0,
        collapse: str | None = None,
        collapse_limit: int = 1,
    ) -> list[tuple[int, float]]:
        from search_engine_spark.operators.filters import filter_groups

        groups = filter_groups(filters)
        if groups:
            self._filters_table()  # errors early on a filterless index
        if after is not None and offset:
            raise ValueError(
                "after=(score, doc_id) replaces offset pagination — pass "
                "offset=0 with a cursor"
            )
        if rescore_window and (after is not None or collapse is not None):
            raise ValueError(
                "rescore_window composes with neither after= cursors "
                "(rescoring changes scores) nor collapse="
            )
        if collapse is not None and after is not None:
            raise ValueError(
                "after does not compose with collapse (a collapse keeper "
                "depends on rows before the cursor) — page collapsed "
                "results with offset"
            )
        prep = self._prepare(query, scope, combine, fuzzy, fuzzy_dist)
        if prep is None:
            return []
        blocks, terms, rescore_terms, idfs, avg_len, excl = prep
        if groups:
            flt = prune_blocks(
                self._filters_table(), [l for g in groups for l in g], scope
            )
            blocks = blocks.unionByName(flt)
        if rescore_window:
            # second-stage proximity rescore (operators/rescore.py —
            # same pins as SearchEngine.search(rescore_window=);
            # oracle.rescore_search is the twin): first stage fetches the
            # top-`window` rows, the ≤window rescored side broadcasts
            # into the docs join, final TakeOrderedAndProject at k
            from search_engine_spark.operators.rescore import (
                rescore_window as _rescore,
            )

            first = _blocks_core(
                blocks, terms, idfs, avg_len, rescore_window, 0, mode,
                combine, excl, groups, None,
            )
            rows = _rescore(
                first, self._docs_table(), rescore_terms, k=offset + k,
                window=rescore_window,
            ).collect()
            return [(r["doc_id"], r["score"]) for r in rows][offset:]
        if collapse is not None:
            # field collapsing on the deep page — the SearchEngine's
            # pinned depth policy (deep = 10*(offset+k), collapse, slice;
            # operators/query.py collapse_results)
            from search_engine_spark.operators.query import collapse_results

            deep = 10 * (offset + k)
            first = _blocks_core(
                blocks, terms, idfs, avg_len, deep, 0, mode, combine,
                excl, groups, None,
            )
            rows = (
                collapse_results(
                    first, self._docs_table(), collapse, collapse_limit
                )
                .limit(offset + k)
                .collect()
            )
            return [(r["doc_id"], r["score"]) for r in rows][offset:]
        lemmas = sorted(set(terms) | set(excl))
        if not groups and self._local_venue(lemmas):
            from search_engine_spark.operators.wand import blocks_core_local

            out = blocks_core_local(
                self._local_blocks(lemmas, scope), terms, idfs,
                avg_len, k, offset, mode, combine, excl, after,
                fuse_memo=self._fuse_memo(scope),
            )
            self._trim_fuse()
            return out
        if not groups and self._hot_venue(lemmas):
            # HOT venue (the both-hot conjunction answer): over the
            # local budget but inside the serving cache — fetch whole,
            # fuse once into the memo, answer every later query from
            # RAM with zero Spark jobs. Preferred over the hybrid
            # venue when both fit: hybrid point-fetches per QUERY,
            # this venue per EPOCH.
            from search_engine_spark.operators.wand import blocks_core_local

            out = blocks_core_local(
                self._local_blocks(lemmas, scope), terms, idfs,
                avg_len, k, offset, mode, combine, excl, after,
                fuse_memo=self._fuse_memo(scope),
            )
            self._trim_fuse()
            return out
        if combine == "and":
            # hot∧rare hybrid (df-sum past even the hot budget):
            # candidates from the local rare side, hot blocks
            # point-fetched by candidate range; attribute filters ride
            # as candidate-fetched FILTER-family blocks
            hyb = self._hybrid_blocks(
                terms, excl, scope,
                filter_lemmas=tuple(l for g in groups for l in g),
            )
            if hyb is not None:
                from search_engine_spark.operators.wand import (
                    blocks_core_local,
                )

                return blocks_core_local(
                    hyb, terms, idfs, avg_len, k, offset, mode,
                    combine, excl, after, req_groups=tuple(groups),
                )
        # distributed selective-fetch venues (round 4): same kernels,
        # candidate- or bound-restricted block FETCH; rank-identical —
        # _selective_and by construction, _selective_single by its
        # residual-θ check (None → fall through to the full scan)
        if len(terms) == 1 and not excl and not groups:
            sel = self._elite_single(
                terms[0], scope, idfs, avg_len, k, offset, mode, after,
            )
            if sel is not None:
                return sel
            sel = self._impact_single(
                terms[0], scope, idfs, avg_len, k, offset, after,
            )
            if sel is not None:
                return sel
            sel = self._selective_single(
                terms[0], scope, idfs, avg_len, k, offset, mode, after,
            )
            if sel is not None:
                return sel
        else:
            # elite candidates + hybrid point-fetch + shared kernels:
            # the bounded-memory answer for multi-term queries (incl.
            # both-hot AND and hot OR) past every cache budget
            sel = self._elite_multi(
                terms, excl, groups, scope, idfs, avg_len, k, offset,
                mode, combine, after,
            )
            if sel is not None:
                return sel
            if combine == "and" or len(terms) == 1:
                sel = self._selective_and(
                    terms, excl, groups, scope, idfs, avg_len, k,
                    offset, mode, combine, after,
                )
                if sel is not None:
                    return sel
            if combine == "and":
                # impact-layout conjunction: the venue of last resort
                # before the full scan — the only one whose cost stays
                # sub-O(df_hot) when candidates exceed every IN-list
                # cap (selective/elite declined above)
                sel = self._impact_and(
                    terms, excl, groups, scope, idfs, avg_len, k,
                    offset, after,
                )
                if sel is not None:
                    return sel
            if len(terms) == 1 and excl and not groups:
                # single positive term + exclusions ("hot -spam"):
                # the term rides its rank prefix, exclusions anchor
                sel = self._impact_single(
                    terms[0], scope, idfs, avg_len, k, offset, after,
                    excl=tuple(excl),
                )
                if sel is not None:
                    return sel
        rows = _blocks_core(
            blocks, terms, idfs, avg_len, k, offset, mode, combine, excl,
            groups, after,
        ).collect()
        return [(r["doc_id"], r["score"]) for r in rows]

    def facets(
        self,
        query: str,
        facet_cols: tuple[str, ...] = ("scope", "role"),
        scope: str | None = None,
        combine: str = "and",
        depth: int = 1000,
        filters: dict | None = None,
    ) -> list[dict]:
        """Facet panel from the serving session — the same pinned
        semantics as ``SearchEngine.facets`` (per-value doc counts over
        the top-``depth`` sample via operators/query.py facet_counts,
        incl. the derived ``day``/``month``/``year`` calendar facets)
        with stats from the cached dictionary. Returns
        [{**facet values, "n_docs"}] sorted by the facet value tuple."""
        from search_engine_spark.operators.filters import filter_groups
        from search_engine_spark.operators.query import facet_counts

        groups = filter_groups(filters)
        if groups:
            self._filters_table()
        prep = self._prepare(query, scope, combine, False, 1)
        if prep is None:
            return []
        blocks, terms, _, idfs, avg_len, excl = prep
        if groups:
            flt = prune_blocks(
                self._filters_table(), [l for g in groups for l in g], scope
            )
            blocks = blocks.unionByName(flt)
        lemmas = sorted(set(terms) | set(excl))
        if not groups and (
            self._local_venue(lemmas) or self._hot_venue(lemmas)
        ):
            # first stage on the driver venues: the ≤depth (doc, score)
            # rows broadcast back into the facet-values docs join — one
            # Spark job instead of two
            from search_engine_spark.operators.wand import blocks_core_local

            pairs = blocks_core_local(
                self._local_blocks(lemmas, scope), terms, idfs, avg_len,
                depth, 0, "wand", combine, excl, None,
                fuse_memo=self._fuse_memo(scope),
            )
            self._trim_fuse()
            if not pairs:
                return []
            results = self.spark.createDataFrame(
                [(int(d), float(s)) for d, s in pairs],
                "doc_id bigint, score double",
            )
        else:
            results = _blocks_core(
                blocks, terms, idfs, avg_len, depth, 0, "wand", combine,
                excl, groups, None,
            )
        rows = facet_counts(
            results, self._docs_table(), list(facet_cols)
        ).collect()
        return [
            {**{c: r[c] for c in facet_cols}, "n_docs": r["n_docs"]}
            for r in sorted(
                rows, key=lambda r: tuple(str(r[c]) for c in facet_cols)
            )
        ]

    def phrase(
        self,
        query: str,
        scope: str | None = None,
        k: int = 10,
        offset: int = 0,
        slop: int = 0,
        filters: dict | None = None,
        after: tuple[float, int] | None = None,
    ) -> list[tuple[int, float]]:
        key = ("phrase", query, scope, k, offset, slop,
               self._freeze(filters), after)
        return self._cached(key, lambda: self._phrase_impl(
            query, scope, k, offset, slop, filters, after,
        ))

    def _phrase_impl(
        self,
        query: str,
        scope: str | None = None,
        k: int = 10,
        offset: int = 0,
        slop: int = 0,
        filters: dict | None = None,
        after: tuple[float, int] | None = None,
    ) -> list[tuple[int, float]]:
        """Phrase/proximity search from the serving session — the same
        pinned semantics as ``wand.phrase_search_blocks`` (oracle
        ``phrase_search`` twin) but stats come from the cached
        dictionary, so a steady-state phrase query is ONE Spark job."""
        from search_engine_spark.functions.analyze import analyze
        from search_engine_spark.operators.filters import filter_groups
        from search_engine_spark.operators.wand import (
            _paginate,
            _shard_phrase_kernel,
        )
        from search_engine_spark.schemas import SEARCH_RESULT

        if "positions" not in self.blocks.columns:
            raise ValueError(
                "phrase search needs a positional index "
                "(IndexBuildJob(..., positional=True))"
            )
        if after is not None and offset:
            raise ValueError(
                "after=(score, doc_id) replaces offset pagination — pass "
                "offset=0 with a cursor"
            )
        groups = filter_groups(filters)
        if groups:
            self._filters_table()
        seq = analyze(query)  # ordered, duplicates kept
        if not seq:
            return []
        uniq = sorted(set(seq))
        n_docs, avg_len = self._scope_stats(scope)
        if n_docs == 0:
            return []
        dfs = self._term_dfs(uniq, scope)
        if query_killed_by_cutoff(list(dfs.values()), n_docs):
            return []
        if len(seq) == 1 and dfs[uniq[0]] > df_cutoff(n_docs):
            return []  # single-term gate (wand.phrase_search_blocks pin)
        idfs = [bm25_idf(dfs[t], n_docs) for t in uniq]
        blocks = prune_blocks(self.blocks, uniq, scope, with_positions=True)
        if groups:
            flt = prune_blocks(
                self._filters_table(), [l for g in groups for l in g], scope
            )
            blocks = blocks.unionByName(flt, allowMissingColumns=True)
        kernel = _shard_phrase_kernel(
            seq, uniq, idfs, avg_len, offset + k, slop, tuple(groups), after
        )
        if not groups and (
            self._local_venue(uniq) or self._hot_venue(uniq)
        ):
            # hot tier included: a phrase with a stopword-grade member
            # pays one positional fetch into the bytes-capped cache and
            # one positional gather into the fuse memo ((shard, lemma,
            # "pos") keys); warm repeats skip both
            from search_engine_spark.operators.wand import run_kernel_local

            kernel_m = _shard_phrase_kernel(
                seq, uniq, idfs, avg_len, offset + k, slop,
                tuple(groups), after, fuse_memo=self._fuse_memo(scope),
            )
            out = run_kernel_local(
                self._local_blocks(uniq, scope, positional=True),
                kernel_m, k, offset,
            )
            self._trim_fuse()
            return out
        # hot∧rare hybrid: a phrase is conjunctive over ALL its terms,
        # so every term is required and the rare side's candidates
        # bound the matches; hot positional blocks point-fetch by
        # candidate range, attribute filters as filter-family blocks
        hyb = self._hybrid_blocks(
            uniq, [], scope, positional=True,
            filter_lemmas=tuple(l for g in groups for l in g),
        )
        if hyb is not None:
            from search_engine_spark.operators.wand import (
                run_kernel_local,
            )

            return run_kernel_local(hyb, kernel, k, offset)
        # elite candidates + positional point-fetch for phrases past
        # every budget (round 4): rank-identical by the summed-residual
        # certificate; None → full distributed positional scan
        sel = self._elite_phrase(
            seq, uniq, idfs, avg_len, k, offset, slop, groups, after,
            scope,
        )
        if sel is not None:
            return sel
        per_shard = blocks.groupBy("shard").applyInPandas(
            kernel, schema=SEARCH_RESULT
        )
        rows = _paginate(per_shard, k, offset).collect()
        return [(r["doc_id"], r["score"]) for r in rows]

    def bool_search(
        self,
        query: str,
        scope: str | None = None,
        k: int = 10,
        offset: int = 0,
        filters: dict | None = None,
        after: tuple[float, int] | None = None,
        synonyms: dict | None = None,
    ) -> list[tuple[int, float]]:
        key = ("bool", query, scope, k, offset, self._freeze(filters),
               after, self._freeze(synonyms))
        return self._cached(key, lambda: self._bool_search_impl(
            query, scope, k, offset, filters, after, synonyms,
        ))

    def _bool_search_impl(
        self,
        query: str,
        scope: str | None = None,
        k: int = 10,
        offset: int = 0,
        filters: dict | None = None,
        after: tuple[float, int] | None = None,
        synonyms: dict | None = None,
    ) -> list[tuple[int, float]]:
        """Boolean query (functions/boolquery.py syntax — nested
        AND/OR/NOT/parens) from the serving session: the same pinned
        semantics as ``wand.bool_search_blocks`` (oracle.bool_search
        twin) but stats resolve from the cached dictionary, so a
        steady-state boolean query is ONE Spark job. ``synonyms``
        expands positive term atoms to OR groups pre-cutoff; ``a^2``
        boosts fold into the idf (wand.bool_search_blocks twin)."""
        from search_engine_spark.functions.boolquery import (
            all_lemmas,
            expand_synonyms,
            expand_weights,
            parse_bool_boosted,
            positive_lemmas,
            prune_over_cutoff,
        )
        from search_engine_spark.operators.filters import filter_groups
        from search_engine_spark.operators.wand import (
            _paginate,
            _shard_bool_kernel,
        )
        from search_engine_spark.schemas import SEARCH_RESULT

        tree, weights = parse_bool_boosted(query)
        tree = expand_synonyms(tree, synonyms)
        weights = expand_weights(weights, synonyms)
        if tree is None:
            return []
        if after is not None and offset:
            raise ValueError(
                "after=(score, doc_id) replaces offset pagination — pass "
                "offset=0 with a cursor"
            )
        groups = filter_groups(filters)
        if groups:
            self._filters_table()
        n_docs, avg_len = self._scope_stats(scope)
        if n_docs == 0:
            return []
        pos = positive_lemmas(tree)
        dfs = self._term_dfs(pos, scope)
        cutoff = df_cutoff(n_docs)
        tree = prune_over_cutoff(tree, {t for t in pos if dfs[t] > cutoff})
        if tree is None:
            return []
        terms = positive_lemmas(tree)
        idfs = [
            weights[t] * bm25_idf(dfs[t], n_docs) if t in weights
            else bm25_idf(dfs[t], n_docs)
            for t in terms
        ]
        blocks = prune_blocks(self.blocks, all_lemmas(tree), scope)
        if groups:
            flt = prune_blocks(
                self._filters_table(), [l for g in groups for l in g], scope
            )
            blocks = blocks.unionByName(flt)
        kernel = _shard_bool_kernel(
            tree, terms, idfs, avg_len, offset + k, tuple(groups), after
        )
        lemmas = sorted(set(all_lemmas(tree)))
        if not groups and (
            self._local_venue(lemmas) or self._hot_venue(lemmas)
        ):
            # the hot tier rides the same driver venue: bool trees mix
            # hot OR-branches with rare conjuncts, and the fuse memo
            # makes the hot side a one-time decode (hybrid still wins
            # when it applies, but it only fires below, on decline of
            # this branch — order: cheapest venue that fits)
            from search_engine_spark.operators.wand import run_kernel_local

            kernel_m = _shard_bool_kernel(
                tree, terms, idfs, avg_len, offset + k, tuple(groups),
                after, fuse_memo=self._fuse_memo(scope),
            )
            out = run_kernel_local(
                self._local_blocks(lemmas, scope), kernel_m, k, offset
            )
            self._trim_fuse()
            return out
        if tree[0] == "and":
            # hot∧rare hybrid: the tree's top-level plain-term positive
            # conjuncts upper-bound the match set (every match contains
            # each of them), so candidates resolve from the rare ones
            # and hot blocks point-fetch by candidate range; OR-branch
            # and negated lemmas only need candidate membership, and
            # attribute filters ride as candidate-fetched filter blocks
            req = sorted({c[1] for c in tree[1] if c[0] == "term"})
            hyb = self._hybrid_blocks(
                req, sorted(set(lemmas) - set(req)), scope,
                filter_lemmas=tuple(l for g in groups for l in g),
            )
            if hyb is not None:
                from search_engine_spark.operators.wand import (
                    run_kernel_local,
                )

                return run_kernel_local(hyb, kernel, k, offset)
        # elite candidates + point-fetch for bool trees past every
        # budget (round 4): rank-identical by the summed-residual
        # certificate; None → full distributed
        sel = self._elite_bool(
            tree, terms, idfs, avg_len, k, offset, groups, after, scope,
        )
        if sel is not None:
            return sel
        per_shard = blocks.groupBy("shard").applyInPandas(
            kernel, schema=SEARCH_RESULT
        )
        rows = _paginate(per_shard, k, offset).collect()
        return [(r["doc_id"], r["score"]) for r in rows]

    def search_prf(
        self,
        query: str,
        scope: str | None = None,
        k: int = 10,
        offset: int = 0,
        feedback_k: int = 10,
        expand_n: int = 4,
        beta: float = 0.4,
        min_fg_df: int = 2,
        mode: str = "wand",
    ) -> list[tuple[int, float]]:
        """Pseudo-relevance-feedback query expansion (Rocchio/RM3
        recipe; ES' significant-terms expansion as prior art): OR
        first stage → JLH significant terms of the top-``feedback_k``
        docs → weighted OR rerun with the ``expand_n`` best non-query
        terms at weight ``beta`` (base terms weigh 1.0). The weight is
        the boost pin — ONE multiply ``boosted_idf = weight * idf``
        before the pinned evaluation shape; per-term cutoff drops see
        dfs only, never weights; accumulation stays lexicographic.
        ``oracle.prf_search`` is the twin (test_prf.py). Venue:
        adaptive local/distributed like ``search``; two extra Spark
        jobs over stage 1 (the significant-terms aggregation) — at
        scale the expansion stage touches only the ≤feedback_k
        foreground docs plus a dictionary semi-join, never the corpus."""
        from search_engine_spark.operators.significant import (
            significant_for_ids,
        )
        from search_engine_spark.operators.wand import blocks_core_local

        base = sorted(set(query_lemmas(query)))
        if not base:
            return []
        first = self.search(
            query, scope=scope, k=feedback_k, combine="or", mode=mode
        )
        if not first:
            return []
        ids = [d for d, _ in first]
        n_docs, avg_len = self._scope_stats(scope)
        if n_docs == 0:
            return []
        rows = significant_for_ids(
            self._docs_table(), self._lemma_stats, ids, scope, n_docs,
            k=expand_n + len(base), min_fg_df=min_fg_df,
        ).collect()
        base_set = set(base)
        exp = [
            r["lemma"] for r in rows if r["lemma"] not in base_set
        ][:expand_n]
        weights = {t: 1.0 for t in base}
        weights.update({t: beta for t in exp})
        dfs = self._term_dfs(sorted(weights), scope)
        cutoff = df_cutoff(n_docs)
        terms = [t for t in sorted(weights) if dfs[t] <= cutoff]
        if not terms:
            return []
        idfs = [weights[t] * bm25_idf(dfs[t], n_docs) for t in terms]
        if self._local_venue(terms) or self._hot_venue(terms):
            out = blocks_core_local(
                self._local_blocks(terms, scope), terms, idfs,
                avg_len, k, offset, mode, "or",
                fuse_memo=self._fuse_memo(scope),
            )
            self._trim_fuse()
            return out
        rows2 = _blocks_core(
            prune_blocks(self.blocks, terms, scope), terms, idfs,
            avg_len, k, offset, mode, "or",
        ).collect()
        return [(r["doc_id"], r["score"]) for r in rows2]

    def more_like_this(
        self,
        doc_id: int,
        scope: str | None = None,
        k: int = 10,
        max_terms: int | None = None,
    ) -> list[tuple[int, float]]:
        """Related documents from the serving session — the same pinned
        semantics as ``operators/query.py more_like_this`` (oracle
        ``more_like_this`` twin: the source doc's ``max_terms`` rarest
        lemmas as an OR query, source excluded) but dfs resolve from the
        cached dictionary and the OR query runs on the blocks kernels.
        Source exclusion fetches k+1 rows and drops the source
        driver-side: the top-k excluding one doc is always contained in
        the top-(k+1) including it."""
        from search_engine_spark.operators.query import MLT_MAX_TERMS

        if max_terms is None:
            max_terms = MLT_MAX_TERMS
        row = (
            self._docs_table().filter(F.col("doc_id") == int(doc_id))
            .select("lemma_counts")
            .head()
        )
        if row is None or not row["lemma_counts"]:
            return []
        lemmas = sorted({x["lemma"] for x in row["lemma_counts"]})
        n_docs, avg_len = self._scope_stats(scope)
        if n_docs == 0:
            return []
        dfs = self._term_dfs(lemmas, scope)
        ranked = sorted((dfs[t], t) for t in lemmas if dfs[t] > 0)
        cutoff = df_cutoff(n_docs)
        terms = sorted(
            t for _, t in ranked[:max_terms] if dfs[t] <= cutoff
        )
        if not terms:
            return []
        idfs = [bm25_idf(dfs[t], n_docs) for t in terms]
        if self._local_venue(terms) or self._hot_venue(terms):
            from search_engine_spark.operators.wand import blocks_core_local

            rows_l = blocks_core_local(
                self._local_blocks(terms, scope), terms, idfs, avg_len,
                k + 1, 0, "wand", "or", [], None,
                fuse_memo=self._fuse_memo(scope),
            )
            self._trim_fuse()
            return [(d, s) for d, s in rows_l if d != int(doc_id)][:k]
        blocks = prune_blocks(self.blocks, terms, scope)
        rows = _blocks_core(
            blocks, terms, idfs, avg_len, k + 1, 0, "wand", "or", [], (),
            None,
        ).collect()
        out = [
            (r["doc_id"], r["score"]) for r in rows
            if r["doc_id"] != int(doc_id)
        ]
        return out[:k]

    def explain(
        self,
        query: str,
        doc_id: int,
        scope: str | None = None,
        combine: str = "and",
    ) -> dict:
        """Per-term scoring breakdown for one (query, doc) pair — the
        same pinned computation as ``SearchEngine.explain`` (shared
        ``functions/scoring.py explain_breakdown``), but term dfs and
        scope stats resolve from the server's cached dictionary: a
        steady-state explain is ONE pushed doc_id point-lookup on the
        docs family (zero Spark jobs for the stats)."""
        from search_engine_spark.functions.scoring import explain_breakdown

        terms = sorted(set(query_lemmas(query)))
        rows = (
            self._docs_table().filter(F.col("doc_id") == int(doc_id))
            .select("doc_len", "scope", "lemma_counts")
            .collect()
        )
        if not rows:
            raise ValueError(f"unknown doc_id {doc_id}")
        doc = rows[0]
        in_scope = scope is None or doc["scope"] == scope
        n_docs, avg_len = self._scope_stats(scope)
        dfs = self._term_dfs(terms, scope)
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
    ) -> list[dict]:
        """Terms disproportionately frequent in the query's matched docs
        vs the corpus — same pins as ``SearchEngine.significant_terms``
        (shared ``operators/significant.py significant_for_ids``; JLH
        scoring, foreground = the top-``depth`` result sample), with the
        first stage served from the cached dictionary. Returns
        [{"term", "fg_df", "bg_df", "score"}] ranked (jlh desc, term
        asc)."""
        from search_engine_spark.operators.significant import (
            significant_for_ids,
        )

        first = self.search(
            query, scope=scope, k=depth, combine=combine, filters=filters
        )
        ids = [d for d, _ in first]
        if not ids:
            return []
        n_docs, _ = self._scope_stats(scope)
        rows = significant_for_ids(
            self._docs_table(), self._lemma_stats, ids, scope, n_docs,
            k=k, min_fg_df=min_fg_df,
        ).collect()
        return [
            {
                "term": r["lemma"],
                "fg_df": int(r["fg_df"]),
                "bg_df": int(r["bg_df"]),
                "score": r["jlh"],
            }
            for r in rows
        ]
