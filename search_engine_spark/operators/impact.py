"""Impact-ordered posting layout (`.cache_impact/`): sub-O(df_hot)
DISTRIBUTED top-k past every driver budget.

The round-4 serving venues (elite summaries, selective fetch) bound the
COMMON over-budget query classes, but CLAUDE.md's own audit names the
residual gap: a distributed conjunction whose rare-side candidates
exceed the IN-list caps — and a single hot term whose 128-posting block
bounds saturate — still scans O(df_hot) posting bytes. The durable fix
is a LAYOUT, not a venue: store each hot term's postings sorted by
impact, so a bounded RANK-RANGE scan (a pushed ``rank < R`` predicate —
plain parquet row-group pruning, no IN-lists) provably contains the
top-k, with an exact certificate and geometric escalation when it does
not. Public technique: impact-ordered / frequency-sorted indexes (Anh &
Moffat, "Pruned query evaluation using pre-computed impacts", SIGIR'06;
Persin/Zobel/Sacks-Davis frequency-sorted lists), grafted onto this
engine's block codec and rank-identity pins.

Layout (schema ``schemas.IMPACT``, one derived parquet family per
index, hidden-prefix so snapshots/upserts treat it as a cache):

- per (scope, lemma, shard), postings sort by the AVGDL-FREE impact
  proxy ``(tf desc, dl asc, doc_id asc)`` — BM25's term score is
  increasing in tf and decreasing in dl for ANY (idf, avgdl)
  (functions/scoring.py pin), so the build-time order is sound for
  every future query and scope, the same argument that makes the elite
  summaries (wand.elite_reduce_kernel) stats-free;
- the proxy stream cuts into BLOCK_SIZE-posting ``rank`` blocks
  (rank 0 = highest impact); inside each block docs RE-sORT by doc_id
  so the standard delta+varbyte codec applies unchanged (kind=0 rows);
- each block stores ``(next_tf, next_dl)`` — the first SUFFIX posting
  in proxy order (-1/-1 on the last block);
- kind=1 rows are the per-distinct-tf strata ``(tf → min dl)`` of the
  whole (scope, lemma, shard) list (rank = -1, so one pushed
  ``rank < R`` fetches strata + prefix together).

Residual bound — the exactness device. After fetching ranks [0, R) of
one (scope, lemma, shard) list, every UNFETCHED posting scores at most

    residual = max( score(next_tf, next_dl),
                    max over strata with tf < next_tf of
                        score(tf_s, min_dl_s) )

for ANY (idf, avgdl): a suffix posting with tf == next_tf has
dl ≥ next_dl (proxy order: within a tf stratum dl ascends), one with
tf < next_tf is dominated by its stratum's (tf_s, min_dl_s), and
tf > next_tf cannot appear in the suffix (tf descends). Unlike the
per-128-doc-block (max_tf, min_dl) bounds of the doc-ordered layout —
extreme values over random doc ranges, which saturate on flat tf
distributions (the measured _selective_single failure mode) — these
bounds DECREASE along the proxy order, so certification succeeds
whenever scores differentiate at all.

Query shapes served (operators/serve.py wires them as venues):

- single term: fetch ranks < R, score, top-m; exact iff the m-th score
  STRICTLY beats the max per-shard residual (strict '>' everywhere —
  a tie could admit a smaller doc_id from the suffix);
- conjunction: ANCHOR terms (the rarest + any term without impact
  coverage) scan their full doc-ordered postings; their intersection
  is the candidate set; hot partners resolve membership from their
  rank-< R prefixes. A candidate matched in EVERY partner scores
  exactly (the pinned lexicographic accumulation); one missed by some
  partner is bounded by exact-parts + that partner's residual, summed
  in the SAME lexicographic order with the residual substituted per
  term — componentwise ≥ the true lex-order float sum, and IEEE
  addition is monotone componentwise at fixed order, so ub_float ≥
  true_float (no ulp hole). Certificate: the merged m-th matched
  score strictly beats every shard's max unmatched ub.

Escalation: on certificate failure the caller re-runs with R×8 (a few
rounds, then falls through to the full scan + an epoch skip memo).
Termination: at full coverage residuals are -inf, unmatched ubs are
-inf (the doc provably lacks the term), no sentinels emit, and the
merge is unconditionally exact.

Reference analog: the reference scores every match then sorts
(services/SearchServiceImpl.java:104-116); this file is the scale
redesign of that scan for terms whose postings no longer fit anything.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from search_engine_spark.operators.compress import BLOCK_SIZE, _encode_frame
from search_engine_spark.operators.wand import (
    _after_cut,
    _gather_excluded,
    _gather_term,
    _intersect_candidates,
    _term_scores,
)
from search_engine_spark.schemas import IMPACT

IMPACT_DIR = ".cache_impact"
MANIFEST = "manifest.json"

_EMPTY = {
    "doc_id": "int64",
    "score": "float64",
}


def _empty_result() -> pd.DataFrame:
    return pd.DataFrame({"doc_id": [], "score": []}).astype(_EMPTY)


# -- builder -----------------------------------------------------------------


def _impact_encode_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    """One (scope, lemma, shard) group of doc-ordered POSTINGS blocks →
    IMPACT rows. Decode-fuse, proxy-sort, chunk into ranks, re-sort
    each chunk by doc_id, and reuse the columnar block encoder (chunk
    boundaries land exactly on the encoder's 128-posting block cuts,
    so ``block_id`` IS the rank and every block's first doc_id stays
    absolute)."""
    ids, tfs, dls = _gather_term(pdf)
    n = ids.size
    if n == 0:  # unreachable (groups are non-empty) — typed for safety
        return pd.DataFrame(
            {f.name: [] for f in IMPACT.fields}
        ).astype({c: "int32" for c in (
            "shard", "kind", "rank", "count", "max_tf", "min_dl",
            "next_tf", "next_dl",
        )})
    proxy = np.lexsort((ids, dls, -tfs))  # the elite proxy, pinned
    p_ids, p_tfs, p_dls = ids[proxy], tfs[proxy], dls[proxy]
    # per-chunk doc_id re-sort (chunks are disjoint posting sets, so
    # within-chunk sorting never reorders across rank boundaries)
    starts = np.arange(0, n, BLOCK_SIZE)
    order = np.concatenate(
        [s + np.argsort(p_ids[s:s + BLOCK_SIZE], kind="stable")
         for s in starts]
    )
    flat = pd.DataFrame(
        {
            "scope": pdf["scope"].iloc[0],
            "lemma": pdf["lemma"].iloc[0],
            "shard": np.int32(pdf["shard"].iloc[0]),
            "doc_id": p_ids[order],
            "tf": p_tfs[order],
            "doc_len": p_dls[order],
        }
    )
    enc = _encode_frame(flat, np.array([0], dtype=np.int64))
    nb = len(enc)
    nxt = starts + BLOCK_SIZE  # first suffix posting per rank
    next_tf = np.full(nb, -1, dtype=np.int64)
    next_dl = np.full(nb, -1, dtype=np.int64)
    has = nxt < n
    next_tf[has] = p_tfs[nxt[has]]
    next_dl[has] = p_dls[nxt[has]]
    blocks = pd.DataFrame(
        {
            "scope": enc["scope"],
            "lemma": enc["lemma"],
            "shard": enc["shard"],
            "kind": np.zeros(nb, dtype=np.int32),
            "rank": enc["block_id"],
            "count": enc["count"],
            "max_tf": enc["max_tf"],
            "min_dl": enc["min_dl"],
            "next_tf": next_tf.astype(np.int32),
            "next_dl": next_dl.astype(np.int32),
            "doc_ids": enc["doc_ids"],
            "tfs": enc["tfs"],
            "doc_lens": enc["doc_lens"],
        }
    )
    uniq_tf = np.unique(tfs)
    strata = pd.DataFrame(
        {
            "scope": pdf["scope"].iloc[0],
            "lemma": pdf["lemma"].iloc[0],
            "shard": np.int32(pdf["shard"].iloc[0]),
            "kind": np.ones(uniq_tf.size, dtype=np.int32),
            "rank": np.full(uniq_tf.size, -1, dtype=np.int32),
            "count": np.zeros(uniq_tf.size, dtype=np.int32),
            "max_tf": uniq_tf.astype(np.int32),
            "min_dl": np.array(
                [int(dls[tfs == t].min()) for t in uniq_tf], dtype=np.int32
            ),
            "next_tf": np.full(uniq_tf.size, -1, dtype=np.int32),
            "next_dl": np.full(uniq_tf.size, -1, dtype=np.int32),
            "doc_ids": [b""] * uniq_tf.size,
            "tfs": [b""] * uniq_tf.size,
            "doc_lens": [b""] * uniq_tf.size,
        }
    )
    return pd.concat([blocks, strata], ignore_index=True)


def build_impact_cache(
    spark: SparkSession,
    index_dir: str,
    min_df: int = 65_536,
    scope: str | None = None,
) -> dict:
    """Build (or rebuild) the impact-ordered cache for every lemma whose
    cross-scope df ≥ ``min_df`` — the stopword-split threshold: only
    terms big enough to hurt the doc-ordered scan pay the extra
    storage. ONE Spark job: postings of qualifying lemmas → per
    (scope, lemma, shard) proxy encode → parquet sorted by
    (lemma, rank) so a serving fetch pushes ``lemma IN (...) AND
    rank < R`` straight into parquet row-group pruning (strata rows
    carry rank = -1 and ride every prefix fetch for free).

    Derived data, crash-safe swap: written to a temp dir then renamed;
    upsert/trim/rebalance DROP the cache (like `.cache_postings_flat`)
    and snapshots exclude it via the hidden-dot prefix — exactness
    never depends on it being present or fresh relative to anything
    but the postings family it was built from.

    Returns the manifest dict ({lemma: max_rank}, min_df, block_size).
    """
    out = f"{index_dir.rstrip('/')}/{IMPACT_DIR}"
    stats = spark.read.parquet(f"{index_dir}/lemma_stats")
    hot = (
        stats.groupBy("lemma")
        .agg(F.sum("df").alias("df"))
        .filter(F.col("df") >= int(min_df))
        .select("lemma")
    )
    blocks = spark.read.parquet(f"{index_dir}/postings")
    picked = blocks.join(F.broadcast(hot), "lemma")
    rows = (
        picked.groupBy("scope", "lemma", "shard")
        .applyInPandas(_impact_encode_kernel, schema=IMPACT)
        .repartition("lemma")
        .sortWithinPartitions("lemma", "rank", "scope", "shard")
    )
    tmp = f"{out}.tmp"
    (
        rows.write.mode("overwrite")
        .option("parquet.block.size", 8 * 1024 * 1024)
        .parquet(f"{tmp}/blocks")
    )
    ranks = (
        spark.read.parquet(f"{tmp}/blocks")
        .groupBy("lemma")
        .agg(F.max("rank").alias("max_rank"))
        .collect()
    )
    manifest = {
        "min_df": int(min_df),
        "block_size": BLOCK_SIZE,
        "terms": {r["lemma"]: int(r["max_rank"]) for r in ranks},
    }
    with open(f"{tmp}/{MANIFEST}", "w") as f:
        json.dump(manifest, f)
    import shutil

    if os.path.exists(out):
        shutil.rmtree(out)
    os.replace(tmp, out)
    return manifest


def load_manifest(index_dir: str) -> dict | None:
    """The impact cache's manifest, or None when the cache is absent."""
    path = f"{index_dir.rstrip('/')}/{IMPACT_DIR}/{MANIFEST}"
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def impact_blocks(spark: SparkSession, index_dir: str) -> DataFrame:
    return spark.read.parquet(
        f"{index_dir.rstrip('/')}/{IMPACT_DIR}/blocks"
    )


def prune_impact(
    blocks: DataFrame, terms: list[str], scope: str | None, r: int
) -> DataFrame:
    """Term/scope/rank-prefix filter, all pushed to the parquet scan.
    ``rank < r`` selects ranks [0, r) AND the kind=1 strata rows
    (rank = -1) in one predicate."""
    out = blocks.filter(
        F.col("lemma").isin(terms) & (F.col("rank") < int(r))
    )
    if scope is not None:
        out = out.filter(F.col("scope") == scope)
    return out.select(
        "shard", "scope", "lemma", "kind", "rank", "count", "max_tf",
        "min_dl", "next_tf", "next_dl", "doc_ids", "tfs", "doc_lens",
    )


# -- residuals ---------------------------------------------------------------


def _term_residual(
    k0: pd.DataFrame, k1: pd.DataFrame, idf: float, avg_len: float
) -> float:
    """Max score any UNFETCHED posting of this (lemma, shard) can reach,
    per the module-docstring bound; -inf when every scope group is
    fully fetched. Evaluated per SCOPE group (scope lists are
    independent proxy streams) and maxed — tight because shards
    partition docs, so a candidate's missing posting lives in THIS
    shard's suffix or nowhere."""
    res = -np.inf
    for sc, sub in k0.groupby("scope", sort=False):
        row = sub.iloc[int(sub["rank"].to_numpy().argmax())]
        nt, nd = int(row["next_tf"]), int(row["next_dl"])
        if nt < 0:
            continue  # fully fetched scope group
        r = float(
            _term_scores(
                np.array([nt], dtype=np.int64),
                np.array([nd], dtype=np.int64),
                idf, avg_len,
            )[0]
        )
        if len(k1):
            st = k1[(k1["scope"] == sc) & (k1["max_tf"] < nt)]
            if len(st):
                r = max(r, float(_term_scores(
                    st["max_tf"].to_numpy(np.int64),
                    st["min_dl"].to_numpy(np.int64),
                    idf, avg_len,
                ).max()))
        res = max(res, r)
    return res


# -- kernels -----------------------------------------------------------------


def impact_single_kernel(term: str, idf: float, avg_len: float, m: int,
                         after=None):
    """Per-shard grouped-map fn over a rank-prefix IMPACT frame of ONE
    term: score every fetched posting (the exact pinned shape — one
    term, so accumulation order is trivial), local top-m, and a
    sentinel row (doc_id = -1, score = residual) when the shard has an
    unfetched suffix. Driver-side ``merge_certified`` turns the union
    into an exact answer or an escalation signal."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        k0 = pdf[pdf["kind"] == 0]
        if k0.empty:
            return _empty_result()
        ids, tfs, dls = _gather_term(k0)
        scores = _term_scores(tfs, dls, idf, avg_len)
        cand, cscores = _after_cut(ids, scores, after)
        if cand.size > m:
            sel = np.lexsort((cand, -cscores))[:m]
            cand, cscores = cand[sel], cscores[sel]
        residual = _term_residual(
            k0, pdf[pdf["kind"] == 1], idf, avg_len
        )
        out = pd.DataFrame({"doc_id": cand, "score": cscores})
        if np.isfinite(residual):
            out = pd.concat(
                [out, pd.DataFrame({"doc_id": [-1], "score": [residual]})],
                ignore_index=True,
            )
        return out.astype(_EMPTY)

    return fn


def impact_single_excl_kernel(
    term: str,
    idf: float,
    avg_len: float,
    m: int,
    excl_terms: tuple = (),
    after=None,
):
    """Per-shard COGROUP fn for ONE positive term with exclusions
    (``hot -spam`` shape): left = the excluded lemmas' doc-ordered
    blocks (full — exclusions must be decided, not bounded), right =
    the term's rank-prefix IMPACT rows. Fetched postings drop the
    excluded docs, score exactly, top-m; the residual still bounds
    every unfetched posting (dropping excluded docs only shrinks the
    suffix), so the single-term certificate applies unchanged."""

    def fn(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        k0 = right[right["kind"] == 0]
        if k0.empty:
            return _empty_result()
        excl = _gather_excluded(left, list(excl_terms))
        ids, tfs, dls = _gather_term(k0)
        if excl is not None:
            keep = ~np.isin(ids, excl, assume_unique=True)
            ids, tfs, dls = ids[keep], tfs[keep], dls[keep]
        scores = _term_scores(tfs, dls, idf, avg_len)
        cand, cscores = _after_cut(ids, scores, after)
        if cand.size > m:
            sel = np.lexsort((cand, -cscores))[:m]
            cand, cscores = cand[sel], cscores[sel]
        residual = _term_residual(
            k0, right[right["kind"] == 1], idf, avg_len
        )
        out = pd.DataFrame({"doc_id": cand, "score": cscores})
        if np.isfinite(residual):
            out = pd.concat(
                [out,
                 pd.DataFrame({"doc_id": [-1], "score": [residual]})],
                ignore_index=True,
            )
        return out.astype(_EMPTY)

    return fn


def impact_and_kernel(
    anchors: list[str],
    impact_terms: list[str],
    terms: list[str],
    idfs: list[float],
    avg_len: float,
    m: int,
    excl_terms: tuple = (),
    after=None,
):
    """Per-shard COGROUP fn (left = doc-ordered POSTINGS blocks of the
    anchor + excluded lemmas, right = rank-prefix IMPACT rows of the
    hot partners): anchor intersection → candidates; one lexicographic
    scoring pass where a partner's contribution is its exact term
    score when the candidate sits in the fetched prefix and its
    RESIDUAL otherwise. Fully-matched candidates emerge with exact
    pinned scores (np.where picks the exact branch, accumulation
    order = the lexicographic term loop); partially-matched ones
    emerge with a sound upper bound (see module docstring), whose
    shard max emits as the sentinel row. ``terms``/``idfs`` are the
    full positive term list in lexicographic order (anchors and
    partners interleaved as they fall)."""
    anchor_set = set(anchors)

    def fn(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            return _empty_result()
        excl = _gather_excluded(left, list(excl_terms))
        per_anchor = {}
        for t in anchors:
            tp = left[left["lemma"] == t]
            if tp.empty:
                return _empty_result()
            per_anchor[t] = _gather_term(tp)
        cand = _intersect_candidates(
            [per_anchor[t] for t in anchors]
        )
        if excl is not None and cand.size:
            cand = cand[~np.isin(cand, excl, assume_unique=True)]
        if cand.size == 0:
            return _empty_result()
        imp = {}
        for t in impact_terms:
            k0 = right[(right["lemma"] == t) & (right["kind"] == 0)]
            if k0.empty:
                return _empty_result()  # partner absent from shard
            gathered = _gather_term(k0)
            idf_t = idfs[terms.index(t)]
            res = _term_residual(
                k0, right[(right["lemma"] == t) & (right["kind"] == 1)],
                idf_t, avg_len,
            )
            imp[t] = (*gathered, res)
        acc = np.zeros(cand.size, dtype=np.float64)
        found_all = np.ones(cand.size, dtype=bool)
        for t, idf in zip(terms, idfs):  # lexicographic (pinned)
            if t in anchor_set:
                ids, tfs, dls = per_anchor[t]
                pos = np.searchsorted(ids, cand)
                acc += _term_scores(tfs[pos], dls[pos], idf, avg_len)
                continue
            ids, tfs, dls, res = imp[t]
            pos = np.minimum(np.searchsorted(ids, cand), ids.size - 1)
            fnd = ids[pos] == cand
            acc += np.where(
                fnd, _term_scores(tfs[pos], dls[pos], idf, avg_len), res
            )
            found_all &= fnd
        matched, mscores = cand[found_all], acc[found_all]
        matched, mscores = _after_cut(matched, mscores, after)
        if matched.size > m:
            sel = np.lexsort((matched, -mscores))[:m]
            matched, mscores = matched[sel], mscores[sel]
        out = pd.DataFrame({"doc_id": matched, "score": mscores})
        ub = acc[~found_all]
        ub = ub[np.isfinite(ub)]  # -inf = provable non-match
        if ub.size:
            out = pd.concat(
                [out,
                 pd.DataFrame({"doc_id": [-1], "score": [float(ub.max())]})],
                ignore_index=True,
            )
        return out.astype(_EMPTY)

    return fn


def merge_certified(
    rows, k: int, offset: int
) -> list[tuple[int, float]] | None:
    """Driver merge of per-shard kernel outputs: sentinel rows
    (doc_id = -1) carry shard residuals / unmatched upper bounds. No
    sentinels → the union is provably complete → exact top-k
    unconditionally (even with < m rows). Otherwise exact iff ≥ m
    matched rows exist AND the m-th (pinned (score desc, doc_id asc)
    order) STRICTLY beats every sentinel. None = escalate."""
    m = offset + k
    ids, scores, sentinels = [], [], []
    for r in rows:
        if r["doc_id"] < 0:
            sentinels.append(r["score"])
        else:
            ids.append(r["doc_id"])
            scores.append(r["score"])
    ids_a = np.asarray(ids, dtype=np.int64)
    sc_a = np.asarray(scores, dtype=np.float64)
    order = np.lexsort((ids_a, -sc_a))[:m]
    out = [(int(ids_a[i]), float(sc_a[i])) for i in order]
    if sentinels:
        if len(out) < m or not (out[m - 1][1] > max(sentinels)):
            return None
    return out[offset:]
