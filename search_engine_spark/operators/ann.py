"""Embedding similarity operators: brute-force cosine top-k, hyperplane
LSH bucketing, IVF coarse assignment, LSH-bucketed near-dup pairs,
k-means clustering, and product quantization (train/encode/ADC top-k).

Production kernels for the contract's embedding queries: one Arrow batch
→ one NumPy matmul against a broadcast plane/centroid matrix (shipped to
workers as a closure constant — a few KiB), instead of the
posexplode × plane-join form (4,096 intermediate rows per 64-dim vector).
The contract queries (contract.py) now call these operators; their DuckDB
twins remain the correctness oracle.

Float determinism: dot products and norms accumulate LEFT-TO-RIGHT over
the dimension axis (``np.cumsum`` is a sequential fold), mirroring the
pinned ``F.aggregate`` / DuckDB ``list_reduce`` evaluation the contract
uses everywhere; rounding to 6dp happens Spark-side (native ``F.round``)
wherever the value is an output column.

Scale notes: every operator here is a narrow map over the embeddings scan
(no shuffle) except the final ``orderBy().limit(k)`` merge of cosine_topk
(TakeOrderedAndProject) and the near-dup bucket self-join, whose
candidate volume is bounded by bucket sizes — the point of LSH.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from search_engine_spark.functions.rounding import round6


def pinned_sign_matrix(n_rows: int, dim: int, row_offset: int = 0) -> np.ndarray:
    """±1 matrix from pinned integer arithmetic — identical to the
    contract's ``_plane_sign_sql``: entry (r, d) = -1 iff
    ``((r + row_offset) * dim + d + 1) * 2654435761 % 97 < 48``."""
    r = np.arange(n_rows, dtype=object).reshape(-1, 1) + row_offset
    d = np.arange(dim, dtype=object).reshape(1, -1)
    h = ((r * dim + d + 1) * 2654435761) % 97  # object dtype: exact ints
    return np.where(h.astype(np.int64) < 48, -1.0, 1.0)


def _ordered_dot(E: np.ndarray, w: np.ndarray) -> np.ndarray:
    """Σ_d E[:, d] * w[d] accumulated strictly left-to-right in float64 —
    bit-identical to the F.aggregate / list_reduce fold."""
    return np.cumsum(E * w[None, :], axis=1)[:, -1]


def _batch_matrix(pdf: pd.DataFrame, vec_col: str) -> np.ndarray:
    return np.array(pdf[vec_col].to_list(), dtype=np.float64)


def lsh_buckets(
    emb: DataFrame,
    planes: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, bucket): bucket bit j set iff the ordered-fold projection onto
    plane j is > 0. One matmul-shaped pass per Arrow batch; the plane
    matrix rides along as a closure constant."""
    S = np.ascontiguousarray(planes, dtype=np.float64)
    weights = (np.int64(1) << np.arange(S.shape[0], dtype=np.int64))

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            E = _batch_matrix(pdf, vec_col)
            P = np.stack([_ordered_dot(E, S[j]) for j in range(S.shape[0])], axis=1)
            bucket = ((P > 0).astype(np.int64) * weights[None, :]).sum(axis=1)
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(), "bucket": bucket})

    return emb.select(id_col, vec_col).mapInPandas(
        kern, schema=f"{id_col} long, bucket long"
    )


def ivf_assign(
    emb: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, centroid): nearest centroid by max dot product, dots rounded
    to 6dp before the argmax (HALF_UP, matching Spark/DuckDB ``round``)
    so unpinned accumulation order can't flip near-ties; remaining ties go
    to the lowest centroid id (np.argmax takes the first maximum)."""
    C = np.ascontiguousarray(centroids, dtype=np.float64)

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            E = _batch_matrix(pdf, vec_col)
            D = np.stack([_ordered_dot(E, C[c]) for c in range(C.shape[0])], axis=1)
            D = round6(D)
            cent = D.argmax(axis=1).astype(np.int32)
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(), "centroid": cent})

    return emb.select(id_col, vec_col).mapInPandas(
        kern, schema=f"{id_col} long, centroid int"
    )


def cosine_scores(
    emb: DataFrame,
    query_vec: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "sim",
) -> DataFrame:
    """(id, sim): cosine similarity to ``query_vec``, ordered-fold dot and
    norms, raw float64 (callers round natively if the value is output)."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = 0.0
    for v in query_vec:  # same scalar fold as the contract's driver loop
        qn = qn + float(v) * float(v)
    qn = float(np.sqrt(qn))

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            E = _batch_matrix(pdf, vec_col)
            dot = _ordered_dot(E, q)
            na = np.cumsum(E * E, axis=1)[:, -1]
            sim = dot / (np.sqrt(na) * qn)
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(), out_col: sim})

    return emb.select(id_col, vec_col).mapInPandas(
        kern, schema=f"{id_col} long, {out_col} double"
    )


def cosine_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    exclude_id: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k (the exact ANN baseline): per-batch kernel
    scores, native 6dp round, TakeOrderedAndProject merge."""
    src = emb
    if exclude_id is not None:
        src = src.filter(F.col(id_col) != exclude_id)
    scored = cosine_scores(src, query_vec, id_col, vec_col).select(
        id_col, F.round(F.col("sim"), 6).alias("sim")
    )
    return scored.orderBy(F.desc("sim"), F.asc(id_col)).limit(k)


def ivf_probe_cells(
    centroids: np.ndarray, query_vec: list[float], nprobe: int
) -> list[int]:
    """The ``nprobe`` centroid ids nearest the query (max rounded dot,
    ties to lower id) — a tiny driver-side computation (|centroids| dots),
    the IVF analog of collecting broadcast stats."""
    C = np.ascontiguousarray(centroids, dtype=np.float64)
    q = np.asarray(query_vec, dtype=np.float64)
    d = _ordered_dot(C, q)
    d = round6(d)
    order = sorted(range(C.shape[0]), key=lambda c: (-d[c], c))
    return sorted(order[: int(nprobe)])


def ivf_topk(
    emb: DataFrame,
    centroids: np.ndarray,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 2,
    exclude_id: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN search (the scale path over brute force): score ONLY
    vectors whose nearest centroid is one of the query's ``nprobe``
    closest cells. One fused kernel per Arrow batch does assign → cell
    mask → cosine, so the plan is a narrow scan + TakeOrderedAndProject —
    no shuffle, and the scored fraction is ~nprobe/|centroids| of the
    corpus. With a materialized assignment as a partition column the scan
    itself would prune to the probed cells (the 100-TB layout); here the
    mask runs in the same pass as scoring."""
    C = np.ascontiguousarray(centroids, dtype=np.float64)
    cells = np.array(ivf_probe_cells(C, query_vec, nprobe), dtype=np.int64)
    q = np.asarray(query_vec, dtype=np.float64)
    qn = 0.0
    for v in query_vec:  # same scalar fold as cosine_scores
        qn = qn + float(v) * float(v)
    qn = float(np.sqrt(qn))

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            E = _batch_matrix(pdf, vec_col)
            D = np.stack([_ordered_dot(E, C[c]) for c in range(C.shape[0])], axis=1)
            D = round6(D)
            cent = D.argmax(axis=1).astype(np.int64)
            ids = pdf[id_col].to_numpy()
            mask = np.isin(cent, cells)
            if exclude_id is not None:
                mask &= ids != exclude_id
            if not mask.any():
                continue
            E2 = E[mask]
            dot = _ordered_dot(E2, q)
            na = np.cumsum(E2 * E2, axis=1)[:, -1]
            yield pd.DataFrame(
                {id_col: ids[mask], "sim": dot / (np.sqrt(na) * qn)}
            )

    scored = emb.select(id_col, vec_col).mapInPandas(
        kern, schema=f"{id_col} long, sim double"
    )
    return (
        scored.select(id_col, F.round(F.col("sim"), 6).alias("sim"))
        .orderBy(F.desc("sim"), F.asc(id_col))
        .limit(k)
    )


def ivf_write_partitioned(
    emb: DataFrame,
    centroids: np.ndarray,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize the IVF layout: embeddings written with their centroid
    assignment as a PARTITION COLUMN (``centroid=<c>/`` directories).
    This is the 100-TB shape ``ivf_topk`` documents: a probed search then
    reads only nprobe/|centroids| of the files — partition pruning at the
    scan, not a post-scan filter."""
    assign = ivf_assign(emb, centroids, id_col, vec_col)
    (
        emb.join(assign, id_col)
        .write.mode("overwrite")
        .partitionBy("centroid")
        .parquet(path)
    )


def ivf_topk_pruned(
    spark,
    path: str,
    centroids: np.ndarray,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 2,
    exclude_id: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF search over a layout written by ``ivf_write_partitioned``: the
    ``centroid IN (probe cells)`` predicate is a partition filter, so
    non-probed cells are never read (verify: the scan's PartitionFilters /
    inputFiles). Rank-identical to ``ivf_topk`` on the same data."""
    cells = ivf_probe_cells(centroids, query_vec, nprobe)
    src = spark.read.parquet(path).filter(F.col("centroid").isin(cells))
    return cosine_topk(src, query_vec, k, exclude_id, id_col, vec_col)


def cosine_pairs_lsh(
    emb: DataFrame,
    planes: np.ndarray,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate pairs (a_id, b_id, cos >= threshold): candidates are
    restricted to EQUAL LSH buckets (never the all-pairs quadratic join),
    then verified by exact pairwise cosine in a vectorized kernel."""
    buckets = lsh_buckets(emb, planes, id_col, vec_col)
    e = emb.join(buckets, id_col).select(
        F.col(id_col), "bucket",
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    a = e.select(
        F.col(id_col).alias("a_id"), "bucket", F.col("_v").alias("_va")
    )
    b = e.select(
        F.col(id_col).alias("b_id"), "bucket", F.col("_v").alias("_vb")
    )
    cand = a.join(b, "bucket").filter(F.col("a_id") < F.col("b_id"))

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            A = np.array(pdf["_va"].to_list(), dtype=np.float64)
            B = np.array(pdf["_vb"].to_list(), dtype=np.float64)
            dot = np.cumsum(A * B, axis=1)[:, -1]
            na = np.cumsum(A * A, axis=1)[:, -1]
            nb = np.cumsum(B * B, axis=1)[:, -1]
            cos = dot / (np.sqrt(na) * np.sqrt(nb))
            yield pd.DataFrame(
                {"a_id": pdf["a_id"].to_numpy(),
                 "b_id": pdf["b_id"].to_numpy(), "cos": cos}
            )

    scored = cand.select("a_id", "b_id", "_va", "_vb").mapInPandas(
        kern, schema="a_id long, b_id long, cos double"
    )
    return scored.select(
        "a_id", "b_id", F.round(F.col("cos"), 6).alias("cos")
    ).filter(F.col("cos") >= threshold)


# -- product quantization (PQ): train / encode / ADC top-k --------------------


def _pq_assign_codes(Xs: np.ndarray, C: np.ndarray) -> np.ndarray:
    """Per-row, per-subspace nearest codeword: Xs is [n, m_sub, dsub], C
    is [m_sub, ksub, dsub]; returns codes [n, m_sub]. Same pin as
    ``_assign_ids``: argmin of the 6dp-ROUNDED squared L2 distance, ties
    to the LOWER code (np.argmin picks the first minimum)."""
    n, m_sub, _ = Xs.shape
    codes = np.empty((n, m_sub), dtype=np.int32)
    for s in range(m_sub):
        d2 = ((Xs[:, s, None, :] - C[s][None, :, :]) ** 2).sum(axis=2)
        codes[:, s] = np.argmin(round6(d2), axis=1)
    return codes


def pq_train(
    emb: DataFrame,
    m_sub: int = 4,
    ksub: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Product-quantization codebooks (Jégou, Douze & Schmid, "Product
    Quantization for Nearest Neighbor Search", TPAMI 2011): the embedding
    dimension splits into ``m_sub`` contiguous subspaces and each trains
    its own ``ksub``-codeword Lloyd's quantizer. Returns codebooks
    [m_sub, ksub, dsub]. A PQ code is m_sub small ints per vector
    (~dim·4/m_sub× compression), the storage layer that makes
    billion-vector ANN feasible — search scans CODES, not vectors.

    Pinned determinism (the contract twin ``ann_pq_codes`` replays the
    same pins in SQL — exactly the ``kmeans`` family pins):
    - init: subspace slices of the ksub lowest-id vectors, rounded 6dp;
    - assignment: argmin of the 6dp-rounded squared L2 per subspace,
      ties to the lower code;
    - update: per-dimension mean over members, rounded 6dp (an empty
      cell keeps its previous codeword);
    - ``iters`` update rounds (the final assignment is ``pq_encode``).

    Scale shape: ALL subspaces train in the SAME mapInPandas pass per
    iteration (one narrow scan emitting ≤ m_sub·ksub partial
    (count, sum-vector) rows per task) — ``iters`` passes total, not
    m_sub×iters; the driver reduces ≤ tasks·m_sub·ksub tiny rows in
    pinned (subspace, code, partition) order. No corpus shuffle."""
    rows = (
        emb.orderBy(id_col)
        .select(F.col(vec_col).cast("array<double>").alias("_v"))
        .limit(ksub)
        .collect()
    )
    if len(rows) < ksub:
        raise ValueError(f"ksub={ksub} but only {len(rows)} vectors")
    V0 = np.array([r["_v"] for r in rows], dtype=np.float64)
    dim = V0.shape[1]
    if dim % m_sub:
        raise ValueError(f"dim={dim} not divisible by m_sub={m_sub}")
    dsub = dim // m_sub
    C = round6(V0).reshape(ksub, m_sub, dsub).transpose(1, 0, 2).copy()
    src = emb.select(F.col(vec_col).cast("array<double>").alias("_v"))

    for _ in range(iters):
        Cb = C  # broadcast closure constant (m_sub×ksub×dsub floats)

        def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            from pyspark import TaskContext

            pid = TaskContext.get().partitionId()
            for pdf in batches:
                if pdf.empty:
                    continue
                X = np.array(pdf["_v"].to_list(), dtype=np.float64)
                Xs = X.reshape(X.shape[0], Cb.shape[0], -1)
                codes = _pq_assign_codes(Xs, Cb)
                recs = []
                for s in range(Cb.shape[0]):
                    for j in range(Cb.shape[1]):
                        m = codes[:, s] == j
                        if not m.any():
                            continue
                        recs.append(
                            {
                                "s": s,
                                "j": j,
                                "pid": pid,
                                "n": int(m.sum()),
                                "sm": Xs[m, s, :].sum(axis=0).tobytes(),
                            }
                        )
                if recs:
                    yield pd.DataFrame(recs)

        got = src.mapInPandas(
            partials, schema="s int, j int, pid int, n long, sm binary"
        ).collect()
        sums = np.zeros((m_sub, ksub, dsub))
        counts = np.zeros((m_sub, ksub), dtype=np.int64)
        for r in sorted(got, key=lambda r: (r["s"], r["j"], r["pid"])):
            sums[r["s"], r["j"]] += np.frombuffer(r["sm"], dtype=np.float64)
            counts[r["s"], r["j"]] += r["n"]
        C = np.where(
            (counts > 0)[:, :, None],
            round6(sums / np.maximum(counts, 1)[:, :, None].astype(np.float64)),
            C,
        )
    return C


def pq_encode(
    emb: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>): each vector's nearest codeword per
    subspace — the materialization step of PQ (store codes, drop the raw
    vectors from the search path). One narrow mapInPandas pass, codebooks
    as a closure constant; same assignment pin as ``pq_train``."""
    Cb = np.ascontiguousarray(codebooks, dtype=np.float64)

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            X = _batch_matrix(pdf, vec_col)
            Xs = X.reshape(X.shape[0], Cb.shape[0], -1)
            codes = _pq_assign_codes(Xs, Cb)
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), "codes": list(codes)}
            )

    return emb.select(id_col, vec_col).mapInPandas(
        kern, schema=f"{id_col} long, codes array<int>"
    )


def pq_adc_lut(codebooks: np.ndarray, query_vec: list[float]) -> np.ndarray:
    """Asymmetric-distance lookup table [m_sub, ksub]: entry (s, j) is
    the 6dp-rounded squared L2 distance between the query's subspace-s
    slice and codeword j — a tiny driver-side computation (the PQ analog
    of collecting broadcast stats)."""
    Cb = np.ascontiguousarray(codebooks, dtype=np.float64)
    m_sub, _, dsub = Cb.shape
    q = np.asarray(query_vec, dtype=np.float64).reshape(m_sub, dsub)
    return round6(((q[:, None, :] - Cb) ** 2).sum(axis=2))


def pq_topk(
    codes_df: DataFrame,
    codebooks: np.ndarray,
    query_vec: list[float],
    k: int = 10,
    exclude_id: int | None = None,
    id_col: str = "vec_id",
) -> DataFrame:
    """PQ ANN search by asymmetric distance computation (ADC): the
    approximate distance of a coded vector is a LEFT-TO-RIGHT fold over
    its subspace codes of the query's lookup table — m_sub array gathers
    and adds per vector, never a vector op against raw embeddings. The
    scan reads ONLY the codes table (~dim·4/m_sub× smaller than the
    vectors — the reason PQ scales to 100 TB); plan is a narrow
    mapInPandas → TakeOrderedAndProject, no shuffle.

    Determinism: per-subspace LUT entries are 6dp-rounded
    (``pq_adc_lut``), the fold over subspaces is left-to-right in
    subspace order, and the output distance rounds natively to 6dp —
    the DuckDB twin replays the identical ordered fold
    (``list_reduce`` over ``list(... ORDER BY s)``). Ties break
    (dist asc, id asc)."""
    lut = pq_adc_lut(codebooks, query_vec)

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            codes = np.array(pdf["codes"].to_list(), dtype=np.int64)
            dist = np.zeros(codes.shape[0], dtype=np.float64)
            for s in range(lut.shape[0]):  # ordered fold, subspace order
                dist = dist + lut[s, codes[:, s]]
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), "dist": dist}
            )

    src = codes_df
    if exclude_id is not None:
        src = src.filter(F.col(id_col) != exclude_id)
    scored = src.select(id_col, "codes").mapInPandas(
        kern, schema=f"{id_col} long, dist double"
    )
    return (
        scored.select(id_col, F.round(F.col("dist"), 6).alias("dist"))
        .orderBy(F.asc("dist"), F.asc(id_col))
        .limit(k)
    )


def ivfpq_encode(
    emb: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, centroid, codes): IVF coarse assignment AND PQ codes in ONE
    fused kernel pass (no join between the two maps — the vectors decode
    from Arrow once). This is the row shape of the IVF+PQ layout, the
    canonical billion-vector index (Jégou et al. 2011; FAISS IVFPQ):
    coarse cell for partition pruning, codes for in-cell ADC."""
    C = np.ascontiguousarray(centroids, dtype=np.float64)
    Cb = np.ascontiguousarray(codebooks, dtype=np.float64)

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            E = _batch_matrix(pdf, vec_col)
            D = np.stack([_ordered_dot(E, C[c]) for c in range(C.shape[0])], axis=1)
            D = round6(D)
            cent = D.argmax(axis=1).astype(np.int32)
            Xs = E.reshape(E.shape[0], Cb.shape[0], -1)
            codes = _pq_assign_codes(Xs, Cb)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "centroid": cent,
                    "codes": list(codes),
                }
            )

    return emb.select(id_col, vec_col).mapInPandas(
        kern, schema=f"{id_col} long, centroid int, codes array<int>"
    )


def ivfpq_write_partitioned(
    emb: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize the IVF+PQ layout: the CODES table written with the
    coarse cell as a partition column (``centroid=<c>/``). The index is
    ~dim·4/m_sub× smaller than the vectors AND a probed search reads
    only nprobe/|centroids| of it — both compressions compound, which is
    how a 100-TB embedding corpus becomes a few-TB scannable index."""
    ivfpq_encode(emb, centroids, codebooks, id_col, vec_col).write.mode(
        "overwrite"
    ).partitionBy("centroid").parquet(path)


def ivfpq_topk(
    spark,
    path: str,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 2,
    exclude_id: int | None = None,
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF+PQ ANN search over a layout from ``ivfpq_write_partitioned``:
    ``centroid IN (probe cells)`` is a PARTITION filter (non-probed cells
    are never read), then ADC over the surviving codes (``pq_topk``
    semantics — identical pins, so results equal ``pq_topk`` restricted
    to the probed cells' vectors). Plan: pruned codes scan → LUT-fold
    kernel → TakeOrderedAndProject; no shuffle, no raw vectors."""
    cells = ivf_probe_cells(centroids, query_vec, nprobe)
    src = spark.read.parquet(path).filter(F.col("centroid").isin(cells))
    return pq_topk(src, codebooks, query_vec, k, exclude_id, id_col)


# -- k-means clustering (Lloyd's algorithm, deterministic pins) ---------------


def _assign_ids(X: np.ndarray, C: np.ndarray) -> np.ndarray:
    """Per-row nearest centroid: argmin_c round(Σ_d (x_d - c_d)², 6),
    ties to the LOWER centroid id (np.argmin picks the first minimum).
    The 6dp round is the cross-engine pin — the DuckDB twin computes the
    same rounded distance, so last-ulp summation differences can't flip
    an assignment."""
    d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    return np.argmin(round6(d2), axis=1)


def kmeans(
    emb: DataFrame,
    k: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, np.ndarray]:
    """Lloyd's k-means over an embedding column — the corpus-clustering
    primitive of a curation pipeline (topic bucketing, per-cluster
    sampling quotas). Returns (assignments (id_col, centroid), final
    centroid matrix).

    Pinned determinism (the contract twin ``kmeans_assign`` replays the
    same pins in SQL):
    - init: the k lowest-id vectors, rounded to 6dp;
    - assignment: argmin of the 6dp-ROUNDED squared L2 distance, ties to
      the lower centroid id;
    - update: per-dimension mean over members, rounded to 6dp (an empty
      cluster keeps its previous centroid);
    - ``iters`` update rounds, then one final assignment pass.

    Scale shape: each iteration is ONE narrow mapInPandas pass over the
    embeddings scan (centroids broadcast as a closure constant, a k×d
    NumPy matrix) emitting ≤ k partial (count, sum-vector) rows per
    task — the classic partial-aggregation k-means; the driver reduces
    ≤ tasks×k tiny rows (sorted by (cluster, partition) for a pinned
    fold order). No corpus shuffle at any step."""
    dim_row = emb.select(F.size(vec_col).alias("_d")).limit(1).collect()
    if not dim_row:
        raise ValueError("kmeans on an empty embeddings table")
    C = round6(
        np.array(
            [
                r["_v"]
                for r in emb.orderBy(id_col)
                .select(F.col(vec_col).cast("array<double>").alias("_v"))
                .limit(k)
                .collect()
            ],
            dtype=np.float64,
        )
    )
    if C.shape[0] < k:
        raise ValueError(f"k={k} but only {C.shape[0]} vectors")
    src = emb.select(id_col, F.col(vec_col).cast("array<double>").alias("_v"))

    for _ in range(iters):
        Cb = C  # broadcast closure constant (k×d floats)

        def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            from pyspark import TaskContext

            pid = TaskContext.get().partitionId()
            for pdf in batches:
                if pdf.empty:
                    continue
                X = np.array(pdf["_v"].to_list(), dtype=np.float64)
                a = _assign_ids(X, Cb)
                rows = []
                for c in range(Cb.shape[0]):
                    m = a == c
                    if not m.any():
                        continue
                    rows.append(
                        {
                            "c": c,
                            "pid": pid,
                            "n": int(m.sum()),
                            "s": X[m].sum(axis=0).tobytes(),
                        }
                    )
                if rows:
                    yield pd.DataFrame(rows)

        got = src.select("_v").mapInPandas(
            partials, schema="c int, pid int, n long, s binary"
        ).collect()
        sums = {c: np.zeros(C.shape[1]) for c in range(k)}
        counts = {c: 0 for c in range(k)}
        for r in sorted(got, key=lambda r: (r["c"], r["pid"])):  # pinned fold
            sums[r["c"]] = sums[r["c"]] + np.frombuffer(r["s"], dtype=np.float64)
            counts[r["c"]] += r["n"]
        C = np.vstack(
            [
                round6(sums[c] / counts[c]) if counts[c] else C[c]
                for c in range(k)
            ]
        )

    Cf = C

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.array(pdf["_v"].to_list(), dtype=np.float64)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "centroid": _assign_ids(X, Cf).astype(np.int32),
                }
            )

    out = src.mapInPandas(assign, schema=f"{id_col} long, centroid int")
    return out, C
