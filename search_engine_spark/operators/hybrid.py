"""Hybrid retrieval: reciprocal-rank fusion (RRF) of ranked lists.

Fuses a lexical (BM25) ranking with a semantic (embedding-cosine)
ranking — or any number of ranked lists — by rank position alone, so
the lists' incomparable score scales never need calibration:

    rrf(doc) = Σ_lists 1 / (rrf_k + rank_list(doc))

with the standard rrf_k = 60 (Cormack, Clarke & Büttcher, "Reciprocal
rank fusion outperforms Condorcet and individual rank learning
methods", SIGIR 2009 — public literature; Lucene/Elasticsearch ship the
same formula as their hybrid-search default).

Pinned determinism (the contract twin hashes values):

- rank = 1-based row_number under (score desc, id asc) per list — pass
  scores ALREADY rounded if the upstream float path differs between
  engines (rank flips change RRF materially, unlike last-ulp scores);
- a doc missing from a list contributes exactly 0.0 for it;
- the fusion sum folds in LIST ORDER, left to right (float addition is
  not associative);
- final order: (rrf desc, id asc).

Scale note: the inputs are top-N RESULT LISTS (each already cut to N ≤
a few hundred rows by TakeOrderedAndProject upstream), not
corpus-scale relations — the per-list single-partition rank window and
the full-outer-join chain are bounded by construction, the same
"small collected side" argument as the broadcast stats in
operators/query.py. The corpus-scale work (scoring/top-N) happens in
the upstream operators (wand.py kernels, ann.cosine_topk), which are
the distributed paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_RRF_K = 60


def rrf_fuse(
    lists: list[DataFrame],
    rrf_k: int = DEFAULT_RRF_K,
    topk: int = 10,
    id_col: str = "doc_id",
    score_col: str = "score",
    out_col: str = "rrf",
) -> DataFrame:
    """Fuse ranked top-N lists (columns: id_col, score_col) into a
    top-``topk`` (id_col, out_col) ranking by reciprocal-rank fusion.
    See the module docstring for the pinned semantics.

    Precondition (asserted): each input list must be a BOUNDED top-N
    result with UNIQUE ids. The window-free rank counts strictly-before
    rows per (id, score) group, so duplicate ids would collapse into
    one rank entry (row_number would not), and the O(N²) theta-join is
    only safe because N is a result-list length, not a corpus size."""
    if not lists:
        raise ValueError("rrf_fuse needs at least one ranked list")
    for df in lists:
        if id_col not in df.columns or score_col not in df.columns:
            raise ValueError(
                f"rrf_fuse input needs columns ({id_col}, {score_col}); "
                f"got {df.columns}"
            )
    parts = []
    for i, df in enumerate(lists):
        # rank WITHOUT a window: for a bounded top-N list with unique
        # ids, row_number under (score desc, id asc) ==
        # 1 + |rows strictly before| — an O(N²) theta-join that stays
        # fully parallel and never raises the single-partition
        # WindowExec (a constant partitionBy gets folded away and
        # warns anyway; the N² is ≤ 10⁴ rows for N=100). Same trick as
        # the docs.py terminal cumsum.
        a = df.select(
            F.col(id_col).alias("_id"), F.col(score_col).alias("_sc")
        )
        b = df.select(
            F.col(id_col).alias("_id2"), F.col(score_col).alias("_sc2")
        )
        before = (F.col("_sc2") > F.col("_sc")) | (
            (F.col("_sc2") == F.col("_sc")) & (F.col("_id2") < F.col("_id"))
        )
        ranked = (
            a.join(F.broadcast(b), before, "left")
            .groupBy("_id", "_sc")
            .agg((F.lit(1) + F.count("_id2")).alias("_rank"))
        )
        parts.append(
            ranked.select(
                F.col("_id").alias(id_col),
                (
                    F.lit(1.0)
                    / (F.lit(float(rrf_k)) + F.col("_rank"))
                ).alias(f"_c{i}"),
            )
        )
    fused = parts[0]
    for p in parts[1:]:
        fused = fused.join(p, id_col, "full_outer")
    total = F.coalesce(F.col("_c0"), F.lit(0.0))
    for i in range(1, len(parts)):  # explicit left-to-right float fold
        total = total + F.coalesce(F.col(f"_c{i}"), F.lit(0.0))
    return (
        fused.select(F.col(id_col), F.round(total, 6).alias(out_col))
        .orderBy(F.desc(out_col), F.asc(id_col))
        .limit(topk)
    )
