"""Top-k BM25 over compressed block postings: exact path + block-max WAND.

The reference scores every matched page then sorts
(services/SearchServiceImpl.java:104-116) — O(candidates). Here top-k runs
per doc-range shard (shards are disjoint doc partitions by construction —
operators/compress.py), each shard emitting its own exact top-(offset+k)
via a grouped-map pandas stage, then a global
``orderBy(score desc, doc_id asc).limit(offset+k)`` merge
(TakeOrderedAndProject on ≤ shards×(offset+k) rows).

Two per-shard kernels, both NumPy over decoded blocks:

- ``exact``    — decode all query-term blocks, conjunctive intersect,
  score everything. Validates WAND (SURVEY.md §4 item 3).
- ``wand``     — block-max WAND (Broder et al.; Ding & Suel), conjunctive
  variant: iterate the rarest term's blocks in doc_id order; skip a block
  when (a) any other term has no overlapping block (conjunction cannot
  hold) or (b) the top-k heap is full and the block's score upper bound
  ``Σ_t idf_t · s(max_tf_t, min_dl_t)`` is strictly below the current
  k-th score θ (strict '<' keeps equal-score ties exact: earlier shards
  process lower doc_ids first, and ties break (score desc, doc_id asc)).
  Safe-up-to-k: results are rank-identical to exact.

Float determinism: per-term scores accumulate in lexicographic term order
with the same evaluation shape as functions/scoring.bm25_term_score —
``idf * tf * (k1+1) / (tf + k1*(1-b + b*dl/avgdl))`` in float64, so
exact/WAND/flat/oracle all produce bit-identical scores.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from search_engine_spark import BM25_B, BM25_K1
from search_engine_spark.functions.analyze import query_lemmas
from search_engine_spark.functions.codec import (
    delta_decode,
    delta_decode_segmented,
    varbyte_decode,
)
from search_engine_spark.functions.scoring import bm25_idf, query_killed_by_cutoff
from search_engine_spark.operators.query import (
    _paginate,
    _scope_stats,
    _term_dfs,
)
from search_engine_spark.schemas import SEARCH_RESULT


def _term_scores(tfs: np.ndarray, dls: np.ndarray, idf: float, avg_len: float) -> np.ndarray:
    """Vectorized bm25_term_score — identical op order to scoring.py."""
    tf = tfs.astype(np.float64)
    norm = BM25_K1 * (1.0 - BM25_B + BM25_B * dls.astype(np.float64) / avg_len)
    return idf * tf * (BM25_K1 + 1.0) / (tf + norm)


def _decode_one(row) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    ids = delta_decode(varbyte_decode(row.doc_ids)).astype(np.int64)
    tfs = varbyte_decode(row.tfs).astype(np.int64)
    dls = varbyte_decode(row.doc_lens).astype(np.int64)
    return ids, tfs, dls


def _fused_ids(pdf: pd.DataFrame) -> np.ndarray:
    """All blocks' doc_ids in pdf row order, ONE decode pass: the block
    buffers concatenate into a single valid varbyte stream (values never
    span buffers) and the per-block-absolute deltas resolve with a
    segmented cumsum keyed by the ``count`` column."""
    gaps = varbyte_decode(b"".join(pdf["doc_ids"].to_numpy(object)))
    return delta_decode_segmented(
        gaps, pdf["count"].to_numpy(np.int64)
    ).astype(np.int64)


def _gather_term(pdf: pd.DataFrame) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """All blocks of one term in one shard → sorted (ids, tfs, dls).
    Blocks from different scope groups interleave in doc_id, so sort.
    Decoding is FUSED across blocks (one varbyte pass per column +
    segmented delta cumsum) — per-block numpy calls cost ~6x the decode
    itself on many-block terms; byte columns are pulled as object
    arrays once (row-wise pandas access costs multiples of the decode)."""
    ids = _fused_ids(pdf)
    tfs = varbyte_decode(b"".join(pdf["tfs"].to_numpy(object))).astype(
        np.int64
    )
    dls = varbyte_decode(
        b"".join(pdf["doc_lens"].to_numpy(object))
    ).astype(np.int64)
    order = np.argsort(ids, kind="stable")  # doc_ids are unique per term
    return ids[order], tfs[order], dls[order]


def _memo_gather(tp: pd.DataFrame, memo, lemma: str):
    """``_gather_term`` through the serving-layer FUSE MEMO: a
    dict keyed (shard, lemma) holding the sorted fused (ids, tfs, dls)
    triple, owned by the QueryServer and passed ONLY on the driver-local
    venue over FULL per-lemma frames (the hybrid venue's frames are
    partial point-fetches and must never populate it; the distributed
    path never sees it, so nothing extra pickles into executors). The
    memo turns the per-query decode of a hot term — the dominant cost
    of a warm both-hot conjunction — into a one-time cost per epoch;
    arrays are identical to a fresh decode, so rank identity is free."""
    if memo is None:
        return _gather_term(tp)
    key = (tp["shard"].iloc[0], lemma)
    hit = memo.get(key)
    if hit is None:
        hit = _gather_term(tp)
        memo[key] = hit
    return hit


def _intersect_candidates(
    per_term: list[tuple[np.ndarray, np.ndarray, np.ndarray]],
) -> np.ndarray:
    """Conjunctive doc_id intersection in ascending-size order
    (reference X1) over per-term sorted-unique id arrays."""
    order = sorted(range(len(per_term)), key=lambda i: per_term[i][0].size)
    cand = per_term[order[0]][0]
    for i in order[1:]:
        if cand.size == 0:
            break
        cand = cand[np.isin(cand, per_term[i][0], assume_unique=True)]
    return cand


def _intersect_score(
    per_term: list[tuple[np.ndarray, np.ndarray, np.ndarray]],
    idfs: list[float],
    avg_len: float,
) -> tuple[np.ndarray, np.ndarray]:
    """Conjunctive intersection (ascending-size order — reference X1) then
    float64 scoring accumulated in the ORIGINAL (lexicographic) term order."""
    cand = _intersect_candidates(per_term)
    if cand.size == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    scores = np.zeros(cand.size, dtype=np.float64)
    for (ids, tfs, dls), idf in zip(per_term, idfs):  # lexicographic
        pos = np.searchsorted(ids, cand)
        scores += _term_scores(tfs[pos], dls[pos], idf, avg_len)
    return cand, scores


def _union_score(
    per_term: list[tuple[np.ndarray, np.ndarray, np.ndarray]],
    idfs: list[float],
    avg_len: float,
) -> tuple[np.ndarray, np.ndarray]:
    """Disjunctive scoring: every doc holding ≥1 term, contributions
    accumulated in the ORIGINAL (lexicographic) term order — += lands on
    disjoint positions per term, so per-doc addition order equals the
    term-loop order, bit-identical to the oracle."""
    nonempty = [p[0] for p in per_term if p[0].size]
    if not nonempty:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    cand = np.unique(np.concatenate(nonempty))
    scores = np.zeros(cand.size, dtype=np.float64)
    for (ids, tfs, dls), idf in zip(per_term, idfs):  # lexicographic
        if ids.size == 0:
            continue
        pos = np.searchsorted(cand, ids)
        scores[pos] += _term_scores(tfs, dls, idf, avg_len)
    return cand, scores


def _gather_excluded(pdf: pd.DataFrame, excl_terms: list[str]):
    """Sorted unique doc_ids holding ANY excluded lemma in this shard
    (``-term`` query syntax), or None. Exclusion postings live in the
    SAME doc-range shard as the scored terms, so the membership set is
    local — decoded once per shard, O(excluded postings), the kernel
    analog of the flat path's left-anti join."""
    if not excl_terms:
        return None
    ep = pdf[pdf["lemma"].isin(excl_terms)]
    if ep.empty:
        return None
    return np.unique(_fused_ids(ep))


def _drop_excluded(
    cand: np.ndarray, excl, *aligned: np.ndarray
) -> tuple[np.ndarray, ...]:
    """Mask ``cand`` (unique doc_ids) and any aligned arrays against the
    excluded-doc set."""
    if excl is None or cand.size == 0:
        return (cand, *aligned)
    keep = ~np.isin(cand, excl, assume_unique=True)
    if keep.all():
        return (cand, *aligned)
    return (cand[keep], *(a[keep] for a in aligned))


def _gather_required(pdf: pd.DataFrame, groups):
    """Shard-local doc_ids passing the attribute filters (operators/
    filters.py): per group (one per filtered column), the union of its
    filter lemmas' doc_ids; groups intersect. None when unfiltered; an
    EMPTY array when some group has no postings in this shard (no doc
    here carries the attribute — the shard contributes nothing). One
    linear decode of the shard's filter blocks, the required-side twin
    of ``_gather_excluded``."""
    if not groups:
        return None
    req = None
    for g in groups:
        gp = pdf[pdf["lemma"].isin(g)]
        if gp.empty:
            return np.empty(0, dtype=np.int64)
        ids = np.unique(_fused_ids(gp))
        req = ids if req is None else req[np.isin(req, ids, assume_unique=True)]
        if req.size == 0:
            return req
    return req


def _keep_required(
    cand: np.ndarray, req, *aligned: np.ndarray
) -> tuple[np.ndarray, ...]:
    """Mask ``cand`` (unique doc_ids) and aligned arrays down to the
    required (filter-passing) set. ``req=None`` = unfiltered."""
    if req is None or cand.size == 0:
        return (cand, *aligned)
    keep = np.isin(cand, req, assume_unique=True)
    if keep.all():
        return (cand, *aligned)
    return (cand[keep], *(a[keep] for a in aligned))


def _after_cut(
    cand: np.ndarray, scores: np.ndarray, after
) -> tuple[np.ndarray, np.ndarray]:
    """Cursor-pagination filter: keep only rows strictly AFTER
    ``after=(score, doc_id)`` in the pinned (score desc, doc_id asc)
    order. Scores are bit-identical across kernels and the oracle (the
    rank-identity invariant), so the float equality in the tiebreak arm
    is exact, not approximate. ``after=None`` = no cursor."""
    if after is None or cand.size == 0:
        return cand, scores
    s0, d0 = after
    keep = (scores < s0) | ((scores == s0) & (cand > d0))
    if keep.all():
        return cand, scores
    return cand[keep], scores[keep]


def _heap_push(heap: list, m: int, cand: np.ndarray, scores: np.ndarray) -> None:
    for d, s in zip(cand.tolist(), scores.tolist()):
        item = (s, -d)
        if len(heap) < m:
            heapq.heappush(heap, item)
        elif item > heap[0]:
            heapq.heapreplace(heap, item)


def _heap_frame(heap: list) -> pd.DataFrame:
    if not heap:
        return pd.DataFrame({"doc_id": [], "score": []}).astype(
            {"doc_id": "int64", "score": "float64"}
        )
    return pd.DataFrame(
        {"doc_id": [-d for s, d in heap], "score": [s for s, d in heap]}
    )


def _shard_or_exact_kernel(
    terms, idfs, avg_len, m, excl_terms=(), req_groups=(), after=None,
    fuse_memo=None,
):
    """Per-shard grouped-map fn: exact disjunctive scoring, local top-m."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        excl = _gather_excluded(pdf, excl_terms)
        req = _gather_required(pdf, req_groups)
        per_term = []
        for t in terms:
            tp = pdf[pdf["lemma"] == t]
            if tp.empty:
                z = np.empty(0, dtype=np.int64)
                per_term.append((z, z, z))
            else:
                per_term.append(_memo_gather(tp, fuse_memo, t))
        cand, scores = _union_score(per_term, idfs, avg_len)
        cand, scores = _drop_excluded(cand, excl, scores)
        cand, scores = _keep_required(cand, req, scores)
        cand, scores = _after_cut(cand, scores, after)
        if cand.size > m:
            sel = np.lexsort((cand, -scores))[:m]
            cand, scores = cand[sel], scores[sel]
        return pd.DataFrame({"doc_id": cand, "score": scores})

    return fn


def _shard_or_wand_kernel(
    terms, idfs, avg_len, m, excl_terms=(), req_groups=(), after=None,
    fuse_memo=None,
):
    """Per-shard grouped-map fn: block-max WEAK-AND (disjunctive WAND,
    Broder et al.): sweep doc-id SEGMENTS (the partition induced by all
    block boundaries — within a segment each term's active block set is
    constant), skipping a whole segment once the top-m heap is full and
    Σ_t max-active-block-upper-bound < θ. Results are rank-identical to
    the exact OR scorer (safe-up-to-m: the bound dominates every doc's
    true score in the segment)."""
    n_terms = len(terms)

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        excl = _gather_excluded(pdf, excl_terms)
        req = _gather_required(pdf, req_groups)
        if req is not None and req.size == 0:
            return _heap_frame([])  # a filter group is absent here
        metas = []
        for t in terms:
            tp = pdf[pdf["lemma"] == t].reset_index(drop=True)
            ub = (
                _term_scores(
                    tp["max_tf"].to_numpy(np.int64),
                    tp["min_dl"].to_numpy(np.int64),
                    idfs[len(metas)], avg_len,
                )
                if len(tp)
                else np.empty(0)
            )
            metas.append(
                {
                    "first": tp["first_doc_id"].to_numpy(np.int64),
                    "last": tp["last_doc_id"].to_numpy(np.int64),
                    "ub": ub,
                    # raw byte columns as object arrays — same reason as
                    # the conjunctive kernel: per-block .iloc access costs
                    # ~7× the varbyte decode itself
                    "doc_ids_b": tp["doc_ids"].to_numpy(object),
                    "tfs_b": tp["tfs"].to_numpy(object),
                    "dls_b": tp["doc_lens"].to_numpy(object),
                    "decoded": {},
                    # serving fuse memo: the whole-term sorted triple
                    # replaces the per-segment active-block concat with
                    # one [lo, hi] slice — identical arrays (postings in
                    # the segment all lie in blocks overlapping it, ids
                    # unique per term), one-time decode per epoch
                    "full": None
                    if (fuse_memo is None or len(tp) == 0)
                    else _memo_gather(tp, fuse_memo, t),
                }
            )
        if fuse_memo is not None:
            # serving venue, everything fused: the weak-AND segment
            # sweep degenerates into a Python loop over ~2×blocks
            # segments that saves no decode (all decoded once into the
            # memo) — the vectorized exact union is strictly faster and
            # rank-identical (weak-AND is pinned safe-up-to-m vs the
            # exact OR scorer).
            per_term = [m_["full"] or (np.empty(0, np.int64),) * 3
                        for m_ in metas]
            cand, scores = _union_score(per_term, idfs, avg_len)
            cand, scores = _drop_excluded(cand, excl, scores)
            cand, scores = _keep_required(cand, req, scores)
            cand, scores = _after_cut(cand, scores, after)
            if cand.size > m:
                sel = np.lexsort((cand, -scores))[:m]
                cand, scores = cand[sel], scores[sel]
            return pd.DataFrame({"doc_id": cand, "score": scores})

        bounds = np.unique(
            np.concatenate(
                [m_["first"] for m_ in metas] + [m_["last"] + 1 for m_ in metas]
            )
        )
        if bounds.size < 2:
            return _heap_frame([])
        heap: list[tuple[float, int]] = []
        for si in range(bounds.size - 1):
            lo, hi = int(bounds[si]), int(bounds[si + 1]) - 1  # inclusive
            active = []
            seg_ub = 0.0
            for ti in range(n_terms):
                m_ = metas[ti]
                mask = (m_["first"] <= hi) & (m_["last"] >= lo)
                idxs = np.flatnonzero(mask)
                active.append(idxs)
                if idxs.size:
                    seg_ub += float(m_["ub"][idxs].max())
            if seg_ub == 0.0:
                continue  # no active blocks in this gap
            if len(heap) >= m and seg_ub < heap[0][0]:
                continue  # weak-AND segment skip
            per_term = []
            for ti in range(n_terms):
                m_ = metas[ti]
                idxs = active[ti]
                if idxs.size == 0:
                    z = np.empty(0, dtype=np.int64)
                    per_term.append((z, z, z))
                    continue
                if m_["full"] is not None:
                    ids, tfs, dls = m_["full"]
                    a = np.searchsorted(ids, lo, side="left")
                    b = np.searchsorted(ids, hi, side="right")
                    per_term.append((ids[a:b], tfs[a:b], dls[a:b]))
                    continue
                parts = []
                for ri in idxs:
                    ri = int(ri)
                    hit = m_["decoded"].get(ri)
                    if hit is None:
                        hit = (
                            delta_decode(
                                varbyte_decode(m_["doc_ids_b"][ri])
                            ).astype(np.int64),
                            varbyte_decode(m_["tfs_b"][ri]).astype(np.int64),
                            varbyte_decode(m_["dls_b"][ri]).astype(np.int64),
                        )
                        m_["decoded"][ri] = hit
                    parts.append(hit)
                ids = np.concatenate([p[0] for p in parts])
                tfs = np.concatenate([p[1] for p in parts])
                dls = np.concatenate([p[2] for p in parts])
                order = np.argsort(ids, kind="stable")
                ids, tfs, dls = ids[order], tfs[order], dls[order]
                a = np.searchsorted(ids, lo, side="left")
                b = np.searchsorted(ids, hi, side="right")
                per_term.append((ids[a:b], tfs[a:b], dls[a:b]))
            cand, scores = _union_score(per_term, idfs, avg_len)
            # exclusion/filter/cursor before the heap: θ only ever
            # reflects ADMISSIBLE docs, so the weak-AND segment skip
            # stays exact (the bound still dominates every admissible
            # doc's true score; pre-cursor docs simply never enter θ)
            cand, scores = _drop_excluded(cand, excl, scores)
            cand, scores = _keep_required(cand, req, scores)
            cand, scores = _after_cut(cand, scores, after)
            _heap_push(heap, m, cand, scores)
        return _heap_frame(heap)

    return fn


def _shard_exact_kernel(
    terms, idfs, avg_len, m, excl_terms=(), req_groups=(), after=None,
    fuse_memo=None,
):
    """Per-shard grouped-map fn: exact conjunctive scoring, local top-m."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        excl = _gather_excluded(pdf, excl_terms)
        req = _gather_required(pdf, req_groups)
        per_term = []
        for t in terms:
            tp = pdf[pdf["lemma"] == t]
            if tp.empty:
                return pd.DataFrame({"doc_id": [], "score": []}).astype(
                    {"doc_id": "int64", "score": "float64"}
                )
            per_term.append(_memo_gather(tp, fuse_memo, t))
        cand, scores = _intersect_score(per_term, idfs, avg_len)
        cand, scores = _drop_excluded(cand, excl, scores)
        cand, scores = _keep_required(cand, req, scores)
        cand, scores = _after_cut(cand, scores, after)
        if cand.size > m:
            # local top-m with (score desc, doc_id asc) — lexsort keys
            sel = np.lexsort((cand, -scores))[:m]
            cand, scores = cand[sel], scores[sel]
        return pd.DataFrame({"doc_id": cand, "score": scores})

    return fn


def _shard_wand_kernel(
    terms, idfs, avg_len, m, excl_terms=(), req_groups=(), after=None,
    fuse_memo=None,
):
    """Per-shard grouped-map fn: conjunctive block-max WAND, local top-m."""
    n_terms = len(terms)

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_id": [], "score": []}).astype(
            {"doc_id": "int64", "score": "float64"}
        )
        # block metadata per term
        metas = []
        for t in terms:
            tp = pdf[pdf["lemma"] == t].reset_index(drop=True)
            if tp.empty:
                return empty
            metas.append(
                {
                    "scope": tp["scope"].to_numpy(),
                    "first": tp["first_doc_id"].to_numpy(np.int64),
                    "last": tp["last_doc_id"].to_numpy(np.int64),
                    "max_tf": tp["max_tf"].to_numpy(np.int64),
                    "min_dl": tp["min_dl"].to_numpy(np.int64),
                    "count": int(tp["count"].sum()),
                    "counts": tp["count"].to_numpy(np.int64),
                    # raw byte columns as object arrays: per-block access
                    # must be a plain array index — a pandas .iloc +
                    # itertuples round-trip per block measured ~2 ms/call,
                    # 7× the actual varbyte decode
                    "doc_ids_b": tp["doc_ids"].to_numpy(object),
                    "tfs_b": tp["tfs"].to_numpy(object),
                    "dls_b": tp["doc_lens"].to_numpy(object),
                    "decoded": {},  # block row idx -> (ids, tfs, dls)
                }
            )
        shard_key = pdf["shard"].iloc[0] if fuse_memo is not None else None
        rarest = min(range(n_terms), key=lambda i: metas[i]["count"])
        others = [i for i in range(n_terms) if i != rarest]
        excl = _gather_excluded(pdf, excl_terms)
        req = _gather_required(pdf, req_groups)
        if req is not None and req.size == 0:
            return empty  # a filter group is absent from this shard

        def full_term_memo(ti: int):
            hit = fuse_memo.get((shard_key, terms[ti]))
            if hit is None:
                meta = metas[ti]
                ids = delta_decode_segmented(
                    varbyte_decode(b"".join(meta["doc_ids_b"])),
                    meta["counts"],
                ).astype(np.int64)
                tfs = varbyte_decode(b"".join(meta["tfs_b"])).astype(
                    np.int64
                )
                dls = varbyte_decode(b"".join(meta["dls_b"])).astype(
                    np.int64
                )
                order = np.argsort(ids, kind="stable")
                hit = (ids[order], tfs[order], dls[order])
                fuse_memo[(shard_key, terms[ti])] = hit
            return hit

        if fuse_memo is not None:
            # serving venue with the fuse memo: every term's sorted
            # fused triple is (or becomes) a one-time decode per epoch,
            # after which the vectorized exact intersection beats the
            # block-max sweep (whose skips only save DECODE work — all
            # decoded here — while its per-block Python loop costs
            # ~0.1 s on a 100-block term). Rank/score-identical: WAND
            # is pinned safe-up-to-m vs the exact scorer everywhere.
            per_term = [full_term_memo(ti) for ti in range(n_terms)]
            cand, scores = _intersect_score(per_term, idfs, avg_len)
            cand, scores = _drop_excluded(cand, excl, scores)
            cand, scores = _keep_required(cand, req, scores)
            cand, scores = _after_cut(cand, scores, after)
            if cand.size > m:
                sel = np.lexsort((cand, -scores))[:m]
                cand, scores = cand[sel], scores[sel]
            return pd.DataFrame({"doc_id": cand, "score": scores})

        def decode_block(ti: int, ri: int):
            meta = metas[ti]
            hit = meta["decoded"].get(ri)
            if hit is None:
                hit = (
                    delta_decode(
                        varbyte_decode(meta["doc_ids_b"][ri])
                    ).astype(np.int64),
                    varbyte_decode(meta["tfs_b"][ri]).astype(np.int64),
                    varbyte_decode(meta["dls_b"][ri]).astype(np.int64),
                )
                meta["decoded"][ri] = hit
            return hit

        def full_term(ti: int):
            """Whole-term fused decode (sorted): one varbyte pass per
            column + segmented delta cumsum — O(total postings), no
            per-block numpy-call overhead. Cached on the meta, and —
            on the serving venue — in the cross-query fuse memo, so a
            warm hot term never decodes again this epoch."""
            meta = metas[ti]
            full = meta.get("full")
            if full is None and fuse_memo is not None:
                full = fuse_memo.get((shard_key, terms[ti]))
                if full is not None:
                    meta["full"] = full
            if full is None:
                ids = delta_decode_segmented(
                    varbyte_decode(b"".join(meta["doc_ids_b"])),
                    meta["counts"],
                ).astype(np.int64)
                tfs = varbyte_decode(b"".join(meta["tfs_b"])).astype(
                    np.int64
                )
                dls = varbyte_decode(b"".join(meta["dls_b"])).astype(
                    np.int64
                )
                order = np.argsort(ids, kind="stable")
                full = (ids[order], tfs[order], dls[order])
                meta["full"] = full
                if fuse_memo is not None:
                    fuse_memo[(shard_key, terms[ti])] = full
            return full

        # hot∧rare fast path: when the rare term's candidate count
        # reaches a dense term's BLOCK count, the sweep will touch
        # essentially every block of that term anyway (candidates are
        # spread over the whole doc range) — the per-block decode loop
        # then costs ~6x the decode itself in numpy-call overhead
        # (measured: 5k-block hot term). Fuse-decode such terms once up
        # front; sparse terms keep the decode-only-touched-blocks path.
        for oi in others:
            if metas[rarest]["count"] >= metas[oi]["first"].size:
                full_term(oi)

        # dense-conjunction fast path (the distributed BOTH-HOT answer):
        # when EVERY partner term pre-fused (the rare side's candidates
        # blanket their block ranges) and the rare side itself spans
        # many blocks, block-max skipping has nothing left to save —
        # partner decode is already paid, and θ rarely clears the upper
        # bounds of dense blocks — while the sweep still pays a Python
        # loop + heap per rare block. Fuse the rare side too and take
        # the vectorized exact-intersect tail; rank/score-identical
        # (WAND is pinned safe-up-to-m vs the exact scorer).
        if (
            others
            and all(metas[oi].get("full") is not None for oi in others)
            and metas[rarest]["first"].size > 64
        ):
            per_term = [full_term(ti) for ti in range(n_terms)]
            cand, scores = _intersect_score(per_term, idfs, avg_len)
            cand, scores = _drop_excluded(cand, excl, scores)
            cand, scores = _keep_required(cand, req, scores)
            cand, scores = _after_cut(cand, scores, after)
            if cand.size > m:
                sel = np.lexsort((cand, -scores))[:m]
                cand, scores = cand[sel], scores[sel]
            return pd.DataFrame({"doc_id": cand, "score": scores})

        def scope_groups(ti: int):
            """Per-scope (firsts, lasts, row_idx) triples, each sorted by
            first_doc_id. Within one (term, scope) block ranges are
            disjoint (the encoder batches a SORTED posting stream), so a
            candidate doc_id maps to at most one block per group via a
            single vectorized searchsorted; ranges only interleave
            ACROSS scope groups."""
            meta = metas[ti]
            groups = meta.get("scope_groups")
            if groups is None:
                groups = []
                scopes = meta["scope"]
                for sc in pd.unique(scopes):
                    idx = np.flatnonzero(scopes == sc)
                    order = np.argsort(meta["first"][idx], kind="stable")
                    idx = idx[order]
                    groups.append(
                        (meta["first"][idx], meta["last"][idx], idx)
                    )
                meta["scope_groups"] = groups
            return groups

        def term_lookup(ti: int, cand: np.ndarray):
            """Membership + (tf, dl) gather of ``cand`` (sorted doc_ids)
            against one term's blocks. Vectorized candidate→block mapping
            (searchsorted over per-scope block starts), then decode ONLY
            the blocks that actually hold a candidate — the hot term's
            blocks that the rare block's few candidates never touch stay
            varbyte-encoded, and the Python loop is over touched blocks,
            not all overlapping blocks (the old per-rare-block decode-all
            + concat + argsort was O(rare_blocks × hot_blocks)). Terms
            pre-fused by ``full_term`` short-circuit to one searchsorted
            against the whole sorted posting array."""
            full = metas[ti].get("full")
            if full is not None:
                ids, tfs, dls = full
                pos = np.searchsorted(ids, cand)
                pos_c = np.minimum(pos, ids.size - 1)
                found = ids[pos_c] == cand
                return (
                    found,
                    np.where(found, tfs[pos_c], 0),
                    np.where(found, dls[pos_c], 0),
                )
            found = np.zeros(cand.size, dtype=bool)
            tfs_out = np.zeros(cand.size, dtype=np.int64)
            dls_out = np.zeros(cand.size, dtype=np.int64)
            for firsts_s, lasts_s, rows_s in scope_groups(ti):
                blk = np.searchsorted(firsts_s, cand, side="right") - 1
                blk_c = np.maximum(blk, 0)
                in_range = (blk >= 0) & (cand <= lasts_s[blk_c]) & ~found
                if not in_range.any():
                    continue
                for b in np.unique(blk_c[in_range]).tolist():
                    sel_mask = in_range & (blk_c == b)
                    ids, tfs, dls = decode_block(ti, int(rows_s[b]))
                    sub = cand[sel_mask]
                    pos = np.searchsorted(ids, sub)
                    pos = np.minimum(pos, ids.size - 1)
                    hit = ids[pos] == sub
                    sel = np.flatnonzero(sel_mask)[hit]
                    found[sel] = True
                    tfs_out[sel] = tfs[pos[hit]]
                    dls_out[sel] = dls[pos[hit]]
            return found, tfs_out, dls_out

        heap: list[tuple[float, int]] = []  # (score, -doc_id) min-heap
        rmeta = metas[rarest]
        r_order = np.argsort(rmeta["first"], kind="stable")
        for rb in r_order:
            rb = int(rb)
            fb, lb = int(rmeta["first"][rb]), int(rmeta["last"][rb])
            overlaps = []
            dead = False
            for oi in others:
                om = metas[oi]
                mask = (om["first"] <= lb) & (om["last"] >= fb)
                if not mask.any():
                    dead = True
                    break
                overlaps.append(np.flatnonzero(mask))
            if dead:
                continue
            if len(heap) >= m:
                theta = heap[0][0]
                ub = _term_scores(
                    np.array([rmeta["max_tf"][rb]]),
                    np.array([rmeta["min_dl"][rb]]),
                    idfs[rarest], avg_len,
                )[0]
                for oi, ov in zip(others, overlaps):
                    om = metas[oi]
                    ub += _term_scores(
                        np.array([om["max_tf"][ov].max()]),
                        np.array([om["min_dl"][ov].min()]),
                        idfs[oi], avg_len,
                    )[0]
                if ub < theta:
                    continue  # block-max skip
            cand, r_tfs, r_dls = decode_block(rarest, rb)
            # drop excluded / filtered-out docs from the rare block's
            # candidates up front: θ only ever reflects scorable docs,
            # so the block-max skip stays exact
            cand, r_tfs, r_dls = _drop_excluded(cand, excl, r_tfs, r_dls)
            cand, r_tfs, r_dls = _keep_required(cand, req, r_tfs, r_dls)
            if cand.size == 0:
                continue
            per_tf: dict[int, tuple[np.ndarray, np.ndarray]] = {
                rarest: (r_tfs, r_dls)
            }
            # progressively filter the rare block's candidates through the
            # other terms, globally-rarest first (reference X1 order);
            # term_lookup touches only hot blocks whose doc range actually
            # holds a surviving candidate
            order_o = sorted(
                range(len(others)), key=lambda j: metas[others[j]]["count"]
            )
            for j in order_o:
                oi = others[j]
                found, tfs_o, dls_o = term_lookup(oi, cand)
                if not found.any():
                    dead = True
                    break
                if not found.all():
                    cand = cand[found]
                    for ti, (a, b) in per_tf.items():
                        per_tf[ti] = (a[found], b[found])
                    tfs_o, dls_o = tfs_o[found], dls_o[found]
                per_tf[oi] = (tfs_o, dls_o)
            if dead:
                continue
            # float64 scoring accumulated in the ORIGINAL (lexicographic)
            # term order — same values and op order as _intersect_score,
            # so exact/WAND stay bit-identical
            scores = np.zeros(cand.size, dtype=np.float64)
            for ti in range(n_terms):
                tfs_t, dls_t = per_tf[ti]
                scores += _term_scores(tfs_t, dls_t, idfs[ti], avg_len)
            # cursor filter before the heap (scores are only known here,
            # so pre-cursor blocks still decode — θ stays exact because
            # it reflects only admissible docs and block UBs dominate
            # every doc's true score)
            cand, scores = _after_cut(cand, scores, after)
            for d, s in zip(cand.tolist(), scores.tolist()):
                item = (s, -d)
                if len(heap) < m:
                    heapq.heappush(heap, item)
                elif item > heap[0]:
                    heapq.heapreplace(heap, item)
        if not heap:
            return empty
        return pd.DataFrame(
            {"doc_id": [-d for s, d in heap], "score": [s for s, d in heap]}
        )

    return fn


def bm25_search_blocks(
    postings: DataFrame,
    lemma_stats: DataFrame,
    doc_stats: DataFrame,
    query: str,
    scope: str | None = None,
    k: int = 10,
    offset: int = 0,
    mode: str = "wand",
    combine: str = "and",
    exclude_terms: list[str] | None = None,
    filters: dict | None = None,
    filter_postings: DataFrame | None = None,
    after: tuple[float, int] | None = None,
) -> DataFrame:
    """Top-k BM25 over POSTINGS blocks; rank-identical to the flat path
    and the oracle. ``mode`` ∈ {"wand", "exact"}; ``combine`` ∈ {"and",
    "or"} — "or" drops over-cutoff terms per-term (oracle.search twin) and
    runs the weak-AND (disjunctive block-max) kernel when mode="wand".
    ``exclude_terms``: analyzed lemmas whose docs drop from candidates
    before the top-k cut (``-term`` syntax; see bm25_blocks_from_terms).
    ``filters`` + ``filter_postings``: attribute restriction served from
    the filter-postings table (operators/filters.py). ``after``: cursor
    pagination — see bm25_blocks_from_terms."""
    terms = query_lemmas(query)
    if not terms:
        return _empty(postings.sparkSession)
    return bm25_blocks_from_terms(
        postings, lemma_stats, doc_stats, terms,
        scope=scope, k=k, offset=offset, mode=mode, combine=combine,
        exclude_terms=exclude_terms, filters=filters,
        filter_postings=filter_postings, after=after,
    )


def bm25_blocks_from_terms(
    postings: DataFrame,
    lemma_stats: DataFrame,
    doc_stats: DataFrame,
    terms: list[str],
    *,
    scope: str | None = None,
    k: int = 10,
    offset: int = 0,
    mode: str = "wand",
    combine: str = "and",
    exclude_terms: list[str] | None = None,
    filters: dict | None = None,
    filter_postings: DataFrame | None = None,
    after: tuple[float, int] | None = None,
) -> DataFrame:
    """Terms-based core of ``bm25_search_blocks`` (callers pass
    pre-analyzed lemmas — fuzzy-corrected queries, more-like-this).
    Terms are deduped and sorted so the per-term accumulation order
    stays pinned regardless of caller.

    ``exclude_terms``: excluded lemmas' blocks ride the SAME pruned
    scan (they shard by doc range like everything else, so each
    shard's exclusion set is local to the kernel); gates see positive
    terms only; positive ∩ excluded → empty; no cutoff on exclusions
    (oracle.search ``exclude`` is the twin).

    ``filters``: {column: value-or-list} attribute restriction
    (operators/filters.py semantics; oracle.search ``filters`` is the
    twin). ``filter_postings`` is the index's ``filters/`` blocks table
    (same POSTINGS schema and doc-range sharding) — the needed filter
    lemmas' blocks union into the kernel scan and each shard intersects
    its candidates with its local filter set; non-scoring, gates
    untouched, applied before the top-k cut.

    ``after``: (score, doc_id) cursor for deep pagination — return the
    top-k of the rows strictly AFTER the cursor in the pinned
    (score desc, doc_id asc) order (oracle.search ``after`` is the
    twin). Unlike ``offset`` (whose deep page costs O(offset+k) heap
    per shard), a cursor page costs O(k) however deep it is — the
    kernels drop pre-cursor docs at admission, so page 1000 shuffles
    the same ≤ shards×k rows as page 1. Mutually exclusive with
    ``offset`` (cutoff gates are stats-driven and see no cursor)."""
    from search_engine_spark.functions.scoring import df_cutoff
    from search_engine_spark.operators.filters import filter_groups

    spark = postings.sparkSession
    terms = sorted(set(terms))
    if not terms:
        return _empty(spark)
    if after is not None and offset:
        raise ValueError(
            "after=(score, doc_id) replaces offset pagination — pass "
            "offset=0 with a cursor"
        )
    excl = sorted(set(exclude_terms or []))
    if excl and set(excl) & set(terms):
        return _empty(spark)
    groups = filter_groups(filters)
    if groups and filter_postings is None:
        raise ValueError(
            "filters=... needs the index's filter-postings table "
            "(filter_postings); build with IndexBuildJob (filters stage)"
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
    idfs = [bm25_idf(dfs[t], n_docs) for t in terms]
    blocks = prune_blocks(postings, terms + excl, scope)
    if groups:
        flt = prune_blocks(
            filter_postings, [l for g in groups for l in g], scope
        )
        blocks = blocks.unionByName(flt)
    return _blocks_core(
        blocks, terms, idfs, avg_len, k, offset, mode, combine, excl,
        groups, after,
    )


def _blocks_core(
    blocks: DataFrame,
    terms: list[str],
    idfs: list[float],
    avg_len: float,
    k: int,
    offset: int,
    mode: str,
    combine: str,
    excl_terms: list[str] | None = None,
    req_groups: tuple = (),
    after: tuple[float, int] | None = None,
) -> DataFrame:
    """Scoring core once stats are resolved: per-shard kernels →
    TakeOrderedAndProject merge. ``blocks`` must already be filtered to
    the query terms (plus any excluded/filter lemmas) and scope, and
    pruned to the kernel columns."""
    m = offset + k
    kernels = {
        ("and", "wand"): _shard_wand_kernel,
        ("and", "exact"): _shard_exact_kernel,
        ("or", "wand"): _shard_or_wand_kernel,
        ("or", "exact"): _shard_or_exact_kernel,
    }
    kernel = kernels[(combine, mode)](
        terms, idfs, avg_len, m, tuple(excl_terms or ()), tuple(req_groups),
        after,
    )
    per_shard = blocks.groupBy("shard").applyInPandas(kernel, schema=SEARCH_RESULT)
    return _paginate(per_shard, k, offset)


def blocks_core_local(
    blocks_pdf: pd.DataFrame,
    terms: list[str],
    idfs: list[float],
    avg_len: float,
    k: int,
    offset: int,
    mode: str,
    combine: str,
    excl_terms: list[str] | None = None,
    after: tuple[float, int] | None = None,
    req_groups: tuple = (),
    fuse_memo: dict | None = None,
) -> list[tuple[int, float]]:
    """Driver-local twin of ``_blocks_core``: the SAME per-shard kernel
    closures run over an already-collected blocks frame (grouped by
    shard in Python), merged with the SAME (score desc, doc_id asc)
    total order. Rank/score-identical to the distributed path by
    construction — one code path for the math, two execution venues.
    Serving uses this for small posting sets (see QueryServer), where a
    distributed barrier costs more than the postings themselves.
    ``req_groups``: attribute-filter lemma groups — their (filter-family)
    block rows must be present in ``blocks_pdf``. ``fuse_memo``: the
    server's cross-query decoded-postings memo (see ``_memo_gather``) —
    pass it ONLY with full per-lemma frames, never hybrid point-fetches."""
    m = offset + k
    kernels = {
        ("and", "wand"): _shard_wand_kernel,
        ("and", "exact"): _shard_exact_kernel,
        ("or", "wand"): _shard_or_wand_kernel,
        ("or", "exact"): _shard_or_exact_kernel,
    }
    kernel = kernels[(combine, mode)](
        terms, idfs, avg_len, m, tuple(excl_terms or ()), tuple(req_groups),
        after, fuse_memo=fuse_memo,
    )
    return run_kernel_local(blocks_pdf, kernel, k, offset)


def run_kernel_local(
    blocks_pdf: pd.DataFrame, kernel, k: int, offset: int
) -> list[tuple[int, float]]:
    """Run any per-shard kernel closure driver-side over a collected
    blocks frame and merge with the pinned (score desc, doc_id asc)
    total order — the in-process venue every kernel (term/bool/phrase)
    shares with its ``applyInPandas`` twin."""
    parts = [
        kernel(sub)
        for _, sub in blocks_pdf.groupby("shard", sort=True)
    ]
    parts = [p for p in parts if len(p)]
    if not parts:
        return []
    merged = pd.concat(parts, ignore_index=True)
    scores = merged["score"].to_numpy(np.float64)
    ids = merged["doc_id"].to_numpy(np.int64)
    order = np.lexsort((ids, -scores))[offset:offset + k]
    return [(int(ids[i]), float(scores[i])) for i in order]


def _shard_bool_kernel(
    tree, terms, idfs, avg_len, m, req_groups=(), after=None,
    fuse_memo=None,
):
    """Per-shard grouped-map fn: boolean-AST matching + exact scoring.

    Shards partition docs by id range, so every lemma of a given doc —
    positive, negated, or filter — decodes in the SAME shard; the set
    algebra over the AST is therefore shard-local and exact (the same
    locality argument as ``_gather_excluded``). Matching evaluates the
    tree bottom-up over sorted unique doc_id arrays (intersection
    ascending by size, unions via np.unique, negations via masked
    isin); scoring then sums ``_term_scores`` over the positive lemmas
    in lexicographic order — += lands on disjoint positions per term,
    so per-doc accumulation order equals the term-loop order,
    bit-identical to oracle.bool_search."""
    from search_engine_spark.functions.boolquery import all_lemmas

    lemmas = all_lemmas(tree)

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        req = _gather_required(pdf, req_groups)
        z = np.empty(0, dtype=np.int64)
        per = {}
        for t in lemmas:
            tp = pdf[pdf["lemma"] == t]
            per[t] = (z, z, z) if tp.empty else _memo_gather(tp, fuse_memo, t)

        def ev(node) -> np.ndarray:
            if node[0] == "term":
                return per[node[1]][0]
            if node[0] == "or":
                parts = [p for c in node[1] if (p := ev(c)).size]
                if not parts:
                    return z
                return np.unique(np.concatenate(parts))
            pos, negs = node[1], node[2]
            if not pos:
                return z  # pure-negative clause matches nothing
            parts = sorted((ev(c) for c in pos), key=lambda a: a.size)
            cand = parts[0]
            for p in parts[1:]:
                if cand.size == 0:
                    return cand
                cand = cand[np.isin(cand, p, assume_unique=True)]
            for nchild in negs:
                if cand.size == 0:
                    return cand
                ns = ev(nchild)
                if ns.size:
                    cand = cand[~np.isin(cand, ns, assume_unique=True)]
            return cand

        cand = ev(tree)
        scores = np.zeros(cand.size, dtype=np.float64)
        for t, idf in zip(terms, idfs):  # lexicographic (pinned)
            ids, tfs, dls = per[t]
            if ids.size == 0 or cand.size == 0:
                continue
            mask = np.isin(cand, ids, assume_unique=True)
            if not mask.any():
                continue
            at = np.searchsorted(ids, cand[mask])
            scores[mask] += _term_scores(tfs[at], dls[at], idf, avg_len)
        cand, scores = _keep_required(cand, req, scores)
        cand, scores = _after_cut(cand, scores, after)
        if cand.size > m:
            sel = np.lexsort((cand, -scores))[:m]
            cand, scores = cand[sel], scores[sel]
        return pd.DataFrame({"doc_id": cand, "score": scores})

    return fn


def bool_search_blocks(
    postings: DataFrame,
    lemma_stats: DataFrame,
    doc_stats: DataFrame,
    query: str,
    *,
    scope: str | None = None,
    k: int = 10,
    offset: int = 0,
    filters: dict | None = None,
    filter_postings: DataFrame | None = None,
    after: tuple[float, int] | None = None,
    synonyms: dict | None = None,
) -> DataFrame:
    """Top-k BM25 over a BOOLEAN query (functions/boolquery.py syntax:
    nested AND/OR/NOT/parens, ``-term``, implicit AND) served from
    compressed block postings; rank-identical to oracle.bool_search.

    Driver side resolves stats and applies the per-term df cutoff
    (OR-mode style — over-cutoff positive lemmas drop from the tree,
    negated subtrees are never pruned); the pruned AST then travels
    into one per-shard kernel that fetches ONLY the tree's lemmas
    (filter pushed to the parquet scan via ``prune_blocks``), so the
    scan cost is the same as an equivalent flat AND/OR query — the
    boolean structure costs set algebra over already-decoded arrays,
    not extra IO. Candidates are bounded by the rarest positive
    conjunct per AND clause (ascending-size intersection order).

    ``filters``/``filter_postings``/``after`` compose exactly as in
    ``bm25_blocks_from_terms`` (non-scoring attribute restriction;
    O(k) cursor pagination). ``synonyms`` ({lemma: synonym lemmas},
    boolquery.compile_synonyms) expands positive term atoms to OR
    groups before the cutoff gate — the synonym lemmas' blocks simply
    join the pruned scan. Boost syntax (``a^2``, ``(...)^3`` —
    parse_bool_boosted) folds into the idf driver-side
    (``boosted_idf = weight * idf``, the same pinned multiply as
    oracle.bool_search), so the kernel float path is untouched."""
    from search_engine_spark.functions.boolquery import (
        all_lemmas,
        expand_synonyms,
        expand_weights,
        parse_bool_boosted,
        positive_lemmas,
        prune_over_cutoff,
    )
    from search_engine_spark.functions.scoring import df_cutoff
    from search_engine_spark.operators.filters import filter_groups

    spark = postings.sparkSession
    tree, weights = parse_bool_boosted(query)
    tree = expand_synonyms(tree, synonyms)
    weights = expand_weights(weights, synonyms)
    if tree is None:
        return _empty(spark)
    if after is not None and offset:
        raise ValueError(
            "after=(score, doc_id) replaces offset pagination — pass "
            "offset=0 with a cursor"
        )
    groups = filter_groups(filters)
    if groups and filter_postings is None:
        raise ValueError(
            "filters=... needs the index's filter-postings table "
            "(filter_postings); build with IndexBuildJob (filters stage)"
        )
    n_docs, avg_len = _scope_stats(doc_stats, scope)
    if n_docs == 0:
        return _empty(spark)
    pos = positive_lemmas(tree)
    dfs = _term_dfs(lemma_stats, pos, scope)
    cutoff = df_cutoff(n_docs)
    tree = prune_over_cutoff(tree, {t for t in pos if dfs[t] > cutoff})
    if tree is None:
        return _empty(spark)
    terms = positive_lemmas(tree)
    idfs = [
        weights[t] * bm25_idf(dfs[t], n_docs) if t in weights
        else bm25_idf(dfs[t], n_docs)
        for t in terms
    ]
    blocks = prune_blocks(postings, all_lemmas(tree), scope)
    if groups:
        flt = prune_blocks(
            filter_postings, [l for g in groups for l in g], scope
        )
        blocks = blocks.unionByName(flt)
    kernel = _shard_bool_kernel(
        tree, terms, idfs, avg_len, offset + k, tuple(groups), after
    )
    per_shard = blocks.groupBy("shard").applyInPandas(
        kernel, schema=SEARCH_RESULT
    )
    return _paginate(per_shard, k, offset)


def prune_blocks(
    postings: DataFrame, terms: list[str], scope: str | None,
    with_positions: bool = False,
) -> DataFrame:
    """Term/scope filter (pushed to the parquet scan) + column pruning to
    exactly what the kernels read."""
    blocks = postings.filter(F.col("lemma").isin(terms))
    if scope is not None:
        blocks = blocks.filter(F.col("scope") == scope)
    cols = [
        "shard", "scope", "lemma", "first_doc_id", "last_doc_id",
        "count", "max_tf", "min_dl", "doc_ids", "tfs", "doc_lens",
    ]
    if with_positions:
        cols.append("positions")
    return blocks.select(*cols)


# -- phrase / proximity search over positional blocks ------------------------


def _gather_term_positional(pdf: pd.DataFrame):
    """All blocks of one term in one shard → sorted (ids, tfs, dls) plus
    the per-posting position arrays, reordered consistently."""
    from search_engine_spark.operators.compress import decode_positions

    ids_p, tfs_p, dls_p, plists = [], [], [], []
    for r in pdf.itertuples(index=False):
        ids, tfs, dls = _decode_one(r)
        ids_p.append(ids)
        tfs_p.append(tfs)
        dls_p.append(dls)
        plists.extend(decode_positions(r.positions, tfs))
    ids = np.concatenate(ids_p)
    tfs = np.concatenate(tfs_p)
    dls = np.concatenate(dls_p)
    order = np.argsort(ids, kind="stable")
    return (
        ids[order], tfs[order], dls[order],
        [plists[i] for i in order.tolist()],
    )


def _memo_gather_positional(tp: pd.DataFrame, memo, lemma: str):
    """``_gather_term_positional`` through the serving fuse memo —
    3-tuple keys (shard, lemma, "pos") keep positional entries disjoint
    from the non-positional layout's (shard, lemma) keys in the same
    per-scope memo. Same rules as ``_memo_gather``: full frames only."""
    if memo is None:
        return _gather_term_positional(tp)
    key = (tp["shard"].iloc[0], lemma, "pos")
    hit = memo.get(key)
    if hit is None:
        hit = _gather_term_positional(tp)
        memo[key] = hit
    return hit


def _shard_phrase_kernel(
    seq_terms, uniq_terms, idfs, avg_len, m, slop, req_groups=(), after=None,
    fuse_memo=None,
):
    """Per-shard grouped-map fn: conjunctive candidates → positional
    phrase verify (ordered chain, ≤ slop lemmas between consecutive
    terms) → BM25 scoring of verified docs, local top-m. ``req_groups``:
    attribute filter lemma groups (operators/filters.py) — candidates
    intersect the shard-local filter set BEFORE the (more expensive)
    position verify."""
    from oracle.oracle import phrase_match_doc  # pure position matcher

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_id": [], "score": []}).astype(
            {"doc_id": "int64", "score": "float64"}
        )
        req = _gather_required(pdf, req_groups)
        if req is not None and req.size == 0:
            return empty  # a filter group is absent from this shard
        gathered = {}
        for t in uniq_terms:
            tp = pdf[pdf["lemma"] == t]
            if tp.empty:
                return empty
            gathered[t] = _memo_gather_positional(tp, fuse_memo, t)
        per_term = [gathered[t][:3] for t in uniq_terms]
        # conjunctive intersection (ascending-size, as _intersect_score)
        order = sorted(
            range(len(uniq_terms)), key=lambda i: per_term[i][0].size
        )
        cand = per_term[order[0]][0]
        for i in order[1:]:
            cand = cand[np.isin(cand, per_term[i][0], assume_unique=True)]
            if cand.size == 0:
                return empty
        (cand,) = _keep_required(cand, req)
        if cand.size == 0:
            return empty
        # position verify per candidate (candidate sets are small after
        # the conjunction; the chain check is O(Σ positions) per doc)
        keep = []
        for d in cand.tolist():
            lists = []
            for t in seq_terms:
                ids_t, _, _, pl_t = gathered[t]
                pos = int(np.searchsorted(ids_t, d))
                lists.append(pl_t[pos].tolist())
            if phrase_match_doc(lists, slop):
                keep.append(d)
        if not keep:
            return empty
        verified = np.asarray(keep, dtype=np.int64)
        scores = np.zeros(verified.size, dtype=np.float64)
        for (ids, tfs, dls), idf in zip(per_term, idfs):  # lexicographic
            pos = np.searchsorted(ids, verified)
            scores += _term_scores(tfs[pos], dls[pos], idf, avg_len)
        verified, scores = _after_cut(verified, scores, after)
        if verified.size > m:
            sel = np.lexsort((verified, -scores))[:m]
            verified, scores = verified[sel], scores[sel]
        return pd.DataFrame({"doc_id": verified, "score": scores})

    return fn


def phrase_search_blocks(
    postings_pos: DataFrame,
    lemma_stats: DataFrame,
    doc_stats: DataFrame,
    query: str,
    scope: str | None = None,
    k: int = 10,
    offset: int = 0,
    slop: int = 0,
    filters: dict | None = None,
    filter_postings: DataFrame | None = None,
    after: tuple[float, int] | None = None,
) -> DataFrame:
    """Top-k phrase/proximity search over POSITIONAL blocks
    (POSTINGS_POS, built with ``build_docs(positional=True)``):
    the query's analyzed lemma SEQUENCE must appear in order with at most
    ``slop`` extra lemmas between consecutive terms; matching docs score
    with the same pinned BM25 (oracle.phrase_search is the twin).
    ``filters`` + ``filter_postings``: attribute restriction exactly as
    in ``bm25_blocks_from_terms`` — the filter lemmas' (non-positional)
    blocks union into the kernel scan with null positions; non-scoring,
    applied before the position verify and the top-k cut."""
    from search_engine_spark.functions.analyze import analyze
    from search_engine_spark.operators.filters import filter_groups

    spark = postings_pos.sparkSession
    seq = analyze(query)  # ordered, duplicates kept
    if not seq:
        return _empty(spark)
    uniq = sorted(set(seq))
    groups = filter_groups(filters)
    if groups and filter_postings is None:
        raise ValueError(
            "filters=... needs the index's filter-postings table "
            "(filter_postings); build with IndexBuildJob (filters stage)"
        )
    if after is not None and offset:
        raise ValueError(
            "after=(score, doc_id) replaces offset pagination — pass "
            "offset=0 with a cursor"
        )
    n_docs, avg_len = _scope_stats(doc_stats, scope)
    if n_docs == 0:
        return _empty(spark)
    dfs = _term_dfs(lemma_stats, uniq, scope)
    if query_killed_by_cutoff(list(dfs.values()), n_docs):
        return _empty(spark)
    idfs = [bm25_idf(dfs[t], n_docs) for t in uniq]
    blocks = prune_blocks(postings_pos, uniq, scope, with_positions=True)
    if groups:
        flt = prune_blocks(
            filter_postings, [l for g in groups for l in g], scope
        )
        blocks = blocks.unionByName(flt, allowMissingColumns=True)
    m = offset + k
    kernel = _shard_phrase_kernel(
        seq, uniq, idfs, avg_len, m, slop, tuple(groups), after
    )
    per_shard = blocks.groupBy("shard").applyInPandas(kernel, schema=SEARCH_RESULT)
    if len(seq) == 1:
        # single-term gate (SearchServiceImpl.java:136-139): the oracle
        # kills a single-term "phrase" whose match count exceeds the
        # cutoff; a single term trivially phrase-matches all its docs, and
        # per-scope df <= cutoff was already enforced above, so only the
        # GLOBAL unscoped case can differ — handled by the df check
        from search_engine_spark.functions.scoring import df_cutoff

        if dfs[uniq[0]] > df_cutoff(n_docs):
            return _empty(spark)
    return _paginate(per_shard, k, offset)


def _empty(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([], SEARCH_RESULT)


def decoded_doc_ids(pdf: pd.DataFrame, lemma: str) -> np.ndarray:
    """Sorted doc_ids of ``lemma`` across a collected blocks frame —
    one fused varbyte pass + segmented delta cumsum (the full_term
    shape), used by the serving hybrid venue to turn a rare term's
    cached blocks into the candidate set."""
    sub = pdf[pdf["lemma"] == lemma]
    if sub.empty:
        return np.empty(0, dtype=np.int64)
    ids = delta_decode_segmented(
        varbyte_decode(b"".join(sub["doc_ids"].to_numpy(object))),
        sub["count"].to_numpy(np.int64),
    ).astype(np.int64)
    ids.sort()
    return ids


def needed_hot_blocks(
    rare_blocks: DataFrame,
    hot_meta: DataFrame,
    rare_terms: list[str],
) -> DataFrame:
    """Distributed candidate→block mapping for the SELECTIVE-FETCH
    distributed venue (serve.QueryServer._selective_and): cogroup the
    rare (bounding) terms' full block rows with the hot lemmas'
    block METADATA by shard; each task decodes its shard's candidate
    set (intersection of the rare terms' postings) and emits the
    (family, lemma, first_doc_id) keys of exactly the hot blocks whose
    range holds a candidate — ``needed_first_docs``, the same mapping
    the hybrid venue computes driver-side, executed where the rare
    postings already are. Nothing wide ever moves: the metadata side
    is ~40 B/block (byte payloads pruned at the scan) and the output
    is one row per NEEDED block.

    A shard where some rare term is absent (or the intersection is
    empty) emits nothing — conjunctive semantics make its matches
    empty, so no hot block of that shard is needed."""
    out_schema = "family string, lemma string, first_doc_id long"

    def fn(rare_pdf: pd.DataFrame, meta_pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"family": [], "lemma": [], "first_doc_id": []}
        ).astype({"family": "object", "lemma": "object",
                  "first_doc_id": "int64"})
        if rare_pdf.empty or meta_pdf.empty:
            return empty
        cand = None
        for t in rare_terms:
            ids = decoded_doc_ids(rare_pdf, t)
            if ids.size == 0:
                return empty
            cand = ids if cand is None else np.intersect1d(
                cand, ids, assume_unique=True
            )
            if cand.size == 0:
                return empty
        parts = []
        for (fam, lem), sub in meta_pdf.groupby(["family", "lemma"]):
            firsts = needed_first_docs(
                sub["scope"].to_numpy(object),
                sub["first_doc_id"].to_numpy(np.int64),
                sub["last_doc_id"].to_numpy(np.int64),
                cand,
            )
            if firsts.size:
                parts.append(pd.DataFrame(
                    {"family": fam, "lemma": lem, "first_doc_id": firsts}
                ))
        if not parts:
            return empty
        return pd.concat(parts, ignore_index=True)

    return (
        rare_blocks.groupBy("shard")
        .cogroup(hot_meta.groupBy("shard"))
        .applyInPandas(fn, schema=out_schema)
    )


def select_blocks_by_bound(
    shards: np.ndarray,
    firsts: np.ndarray,
    counts: np.ndarray,
    max_tfs: np.ndarray,
    min_dls: np.ndarray,
    idf: float,
    avg_len: float,
    m: int,
    floor_postings: int = 256,
) -> tuple[np.ndarray, float]:
    """Impact selection over one term's block metadata (the round-4
    sub-O(df) single-term path): per shard, order blocks by score
    upper bound ``_term_scores(max_tf, min_dl)`` descending (tiebreak
    first_doc_id asc — deterministic) and keep blocks until the
    selected posting count reaches ``max(2*m, floor_postings)``;
    everything else is skipped. Returns (selected firsts, residual,
    best_selected) where ``residual`` is the max bound over ALL skipped
    blocks (-inf if none) and ``best_selected`` the max bound over the
    kept ones: every unexamined doc scores ≤ its block bound ≤ residual
    (the pinned (max_tf, min_dl) WAND bound), so a merged result whose
    m-th score strictly exceeds ``residual`` is provably the exact
    top-m — the caller escalates to the full scan otherwise. Since no
    actual score can exceed ``best_selected``, ``residual ≥
    best_selected`` (homogeneous bounds — common when tf/dl barely
    vary) makes certification IMPOSSIBLE: the caller declines before
    paying any fetch, an exact decision, not a heuristic."""
    bounds = _term_scores(
        max_tfs.astype(np.int64), min_dls.astype(np.int64), idf, avg_len
    )
    target = max(2 * m, floor_postings)
    keep = np.zeros(firsts.size, dtype=bool)
    residual = -np.inf
    for sh in np.unique(shards):
        idx = np.flatnonzero(shards == sh)
        order = idx[np.lexsort((firsts[idx], -bounds[idx]))]
        cum = np.cumsum(counts[order])
        n_take = int(np.searchsorted(cum, target, side="left")) + 1
        keep[order[:n_take]] = True
        if n_take < order.size:
            residual = max(residual, float(bounds[order[n_take:]].max()))
    best_selected = float(bounds[keep].max()) if keep.any() else -np.inf
    return firsts[keep], residual, best_selected


ELITE_ROWS = "doc_id long, tf long, dl long, kind int"


def elite_reduce_kernel(e_top: int):
    """Per-shard grouped-map reducer for the ELITE term summary (round
    4 — the stopword-split answer as a BOUNDED summary instead of a
    layout migration): decode one term's blocks in this shard and emit

    - kind=0 rows: the shard's top-``e_top`` postings by the avgdl-free
      impact proxy (tf desc, dl asc, doc_id asc) — BM25's term score is
      increasing in tf and decreasing in dl for ANY (idf, avgdl), so
      the proxy needs no query-time stats;
    - kind=1 rows: per distinct tf value of the REMAINING postings, the
      min dl — (tf, min_dl) strata whose query-time score bound
      dominates every non-elite posting of the stratum (far tighter
      than one global (max_tf, min_dl) pair, which saturates on flat
      tf distributions).

    Output is ≤ e_top + |distinct tf| rows per shard regardless of df —
    the reduction that lets a driver summarize a 10^10-df stopword in
    shards × e_top rows."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        ids, tfs, dls = _gather_term(pdf)
        if ids.size == 0:
            return pd.DataFrame(
                {"doc_id": [], "tf": [], "dl": [], "kind": []}
            ).astype({"doc_id": "int64", "tf": "int64", "dl": "int64",
                      "kind": "int32"})
        order = np.lexsort((ids, dls, -tfs))
        keep = order[:e_top]
        rest = order[e_top:]
        out = {
            "doc_id": ids[keep], "tf": tfs[keep], "dl": dls[keep],
            "kind": np.zeros(keep.size, dtype=np.int32),
        }
        if rest.size:
            rt, rd = tfs[rest], dls[rest]
            uniq = np.unique(rt)
            mins = np.array(
                [int(rd[rt == t].min()) for t in uniq], dtype=np.int64
            )
            out = {
                "doc_id": np.concatenate(
                    [out["doc_id"], np.full(uniq.size, -1, dtype=np.int64)]
                ),
                "tf": np.concatenate([out["tf"], uniq]),
                "dl": np.concatenate([out["dl"], mins]),
                "kind": np.concatenate(
                    [out["kind"], np.ones(uniq.size, dtype=np.int32)]
                ),
            }
        return pd.DataFrame(out)

    return fn


def merge_elite_summaries(
    pdf: pd.DataFrame, e_top: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Driver-side merge of the per-shard ``elite_reduce_kernel`` rows →
    (ids, tfs, dls) of the GLOBAL top-``e_top`` by the same proxy order
    plus (strata_tf, strata_min_dl) covering every other posting: shard
    candidates that miss the global cut fold their EXACT (tf, dl) into
    the strata, so the residual bound stays per-stratum tight."""
    cand = pdf[pdf["kind"] == 0]
    ids = cand["doc_id"].to_numpy(np.int64)
    tfs = cand["tf"].to_numpy(np.int64)
    dls = cand["dl"].to_numpy(np.int64)
    order = np.lexsort((ids, dls, -tfs))
    keep, spill = order[:e_top], order[e_top:]
    strata = pdf[pdf["kind"] == 1]
    s_tf = np.concatenate([strata["tf"].to_numpy(np.int64), tfs[spill]])
    s_dl = np.concatenate([strata["dl"].to_numpy(np.int64), dls[spill]])
    if s_tf.size:
        uniq = np.unique(s_tf)
        mins = np.array(
            [int(s_dl[s_tf == t].min()) for t in uniq], dtype=np.int64
        )
    else:
        uniq = np.empty(0, dtype=np.int64)
        mins = np.empty(0, dtype=np.int64)
    return ids[keep], tfs[keep], dls[keep], uniq, mins


def needed_first_docs(
    scopes: np.ndarray,
    firsts: np.ndarray,
    lasts: np.ndarray,
    cand: np.ndarray,
) -> np.ndarray:
    """Which blocks hold a candidate: per scope group (ranges disjoint
    within one (lemma, scope) — the encoder batches a sorted stream),
    vectorized searchsorted of the sorted candidates against block
    starts; returns the unique first_doc_id values of touched blocks.
    The same candidate→block mapping the WAND kernel uses, applied at
    FETCH time so untouched hot blocks never leave the parquet scan."""
    out = []
    for sc in pd.unique(scopes):
        idx = np.flatnonzero(scopes == sc)
        order = np.argsort(firsts[idx], kind="stable")
        f, l = firsts[idx][order], lasts[idx][order]
        pos = np.searchsorted(f, cand, side="right") - 1
        ok = pos >= 0
        hit = pos[ok][cand[ok] <= l[pos[ok]]]
        if hit.size:
            out.append(f[np.unique(hit)])
    if not out:
        return np.empty(0, dtype=np.int64)
    return np.unique(np.concatenate(out))
