"""SemDeDup pins: lowest-id survivor per within-cluster cosine
neighborhood, 6dp rounded cosine with left-to-right dim-order folds,
clusters never compared across — against a from-scratch Python
reference replaying the same pinned kmeans."""

from __future__ import annotations

import numpy as np
import pytest

from search_engine_spark.functions.rounding import round6
from search_engine_spark.operators.dedup import semdedup


def _ref_kmeans_assign(X: np.ndarray, k: int, iters: int) -> np.ndarray:
    C = round6(X[:k])

    def assign(C):
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        return np.argmin(round6(d2), axis=1)

    for _ in range(iters):
        a = assign(C)
        C = np.array(
            [
                round6(X[a == c].mean(axis=0)) if (a == c).any() else C[c]
                for c in range(k)
            ]
        )
    return assign(C)


def _ref_semdedup(X: np.ndarray, k: int, iters: int, tau: float):
    a = _ref_kmeans_assign(X, k, iters)
    n = len(X)
    keep = np.ones(n, dtype=bool)
    for i in range(n):
        for j in range(i):
            if a[i] != a[j]:
                continue
            dot = sq_i = sq_j = 0.0
            for d in range(X.shape[1]):
                dot += X[i, d] * X[j, d]
                sq_i += X[i, d] * X[i, d]
                sq_j += X[j, d] * X[j, d]
            c = float(round6(dot / (np.sqrt(sq_i) * np.sqrt(sq_j))))
            if c >= tau:
                keep[i] = False
                break
    return a, keep


@pytest.fixture(scope="module")
def vecs():
    rng = np.random.default_rng(7)
    base = rng.normal(size=(40, 8))
    # plant near-dup chains: 5 vectors each with a tiny-perturbation twin
    for i in range(5):
        base[30 + i] = base[i * 3] + rng.normal(scale=0.01, size=8)
    return np.round(base, 3)


def test_semdedup_matches_reference(spark, vecs):
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    got = {
        r["vec_id"]: (r["centroid"], r["keep"])
        for r in semdedup(df, k=3, iters=2, threshold=0.9).collect()
    }
    a, keep = _ref_semdedup(vecs.astype(np.float64), 3, 2, 0.9)
    assert len(got) == len(vecs)
    for i in range(len(vecs)):
        assert got[i] == (a[i], bool(keep[i])), i
    # the planted twins actually exercised the drop path
    assert sum(1 for _, kp in got.values() if not kp) >= 4


def test_block_streaming_identical_to_single_block(spark, vecs):
    """The bounded-memory row-block kernel (block_rows ≪ cluster size,
    here forced with k=1 so one cluster holds all 40 vectors and a
    7-row block ⇒ many block-pairs) must produce EXACTLY the keep
    flags of the one-shot full-matrix form (block_rows ≥ n)."""
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    big = {
        (r["vec_id"], r["centroid"], r["keep"])
        for r in semdedup(
            df, k=1, iters=1, threshold=0.9, block_rows=1_000_000
        ).collect()
    }
    small = {
        (r["vec_id"], r["centroid"], r["keep"])
        for r in semdedup(df, k=1, iters=1, threshold=0.9, block_rows=7).collect()
    }
    assert small == big
    assert any(not kp for (_, _, kp) in big)  # the drop path fired


def test_lowest_id_survives_identical_vectors(spark):
    v = [1.0, 0.0, 0.0, 0.0]
    rows = [(i, v) for i in range(4)] + [
        (4, [0.0, 1.0, 0.0, 0.0]),
        (5, [0.0, 0.0, 1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r["vec_id"]: r["keep"] for r in
           semdedup(df, k=2, iters=1, threshold=0.99).collect()}
    dup_flags = [got[i] for i in range(4)]
    assert dup_flags[0] is True and dup_flags[1:] == [False, False, False]
