"""ANN operator properties: IVF top-k equals brute force restricted to
the probed cells, and its physical plan stays shuffle-free up to the
top-k merge. (Value-level correctness vs DuckDB is the contract twin
``ann_ivf_topk`` — these tests pin the operator's semantics and plan.)"""

from __future__ import annotations

import pytest

from search_engine_spark.functions.rounding import round6

EMB = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{EMB}/embeddings.parquet")


@pytest.fixture(scope="module")
def qvec(emb):
    row = emb.filter("vec_id = 0").collect()[0]
    return [float(v) for v in row["embedding"]]


def test_ivf_topk_equals_bruteforce_on_probed_cells(spark, emb, qvec):
    from pyspark.sql import functions as F

    from search_engine_spark.operators.ann import (
        cosine_topk,
        ivf_assign,
        ivf_probe_cells,
        ivf_topk,
        pinned_sign_matrix,
    )

    C = pinned_sign_matrix(8, 64, row_offset=13)
    cells = ivf_probe_cells(C, qvec, nprobe=2)
    assert len(cells) == 2 and cells == sorted(cells)

    got = ivf_topk(emb, C, qvec, k=10, nprobe=2, exclude_id=0).collect()

    # brute force over exactly the probed subset must agree bit-for-bit
    assign = ivf_assign(emb, C)
    probed_ids = {
        r["vec_id"]
        for r in assign.filter(F.col("centroid").isin(cells)).collect()
    }
    sub = emb.filter(F.col("vec_id").isin(list(probed_ids)))
    exp = cosine_topk(sub, qvec, k=10, exclude_id=0).collect()
    assert [(r["vec_id"], r["sim"]) for r in got] == [
        (r["vec_id"], r["sim"]) for r in exp
    ]
    assert all(r["vec_id"] in probed_ids for r in got)


def test_ivf_partitioned_layout_prunes_scan(spark, emb, qvec, tmp_path):
    import os

    from search_engine_spark.operators.ann import (
        ivf_probe_cells,
        ivf_topk,
        ivf_topk_pruned,
        ivf_write_partitioned,
        pinned_sign_matrix,
    )

    C = pinned_sign_matrix(8, 64, row_offset=13)
    path = str(tmp_path / "ivf")
    ivf_write_partitioned(emb, C, path)
    # every cell directory exists or is simply absent (no stray data files;
    # _SUCCESS markers and .crc checksums are committer metadata)
    assert all(
        d.startswith(("centroid=", "_", "."))
        for d in os.listdir(path)
    )
    assert any(d.startswith("centroid=") for d in os.listdir(path))

    got = ivf_topk_pruned(spark, path, C, qvec, k=10, nprobe=2,
                          exclude_id=0)
    probe = ivf_probe_cells(C, qvec, nprobe=2)
    cells = {f"centroid={c}" for c in probe}
    # partition pruning: only probed cell directories are ever read.
    # input_file_name() reflects the files the executed scan touched
    # (inputFiles() would list the whole relation pre-pruning).
    from pyspark.sql import functions as F

    src = spark.read.parquet(path).filter(F.col("centroid").isin(probe))
    read_dirs = {
        r[0].split("/")[-2]
        for r in src.select(F.input_file_name()).distinct().collect()
    }
    assert read_dirs <= cells and read_dirs
    # and the filter is a partition filter in the plan, not a row filter
    plan = src._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "centroid" in plan.split(
        "PartitionFilters:"
    )[1].split("]")[0]

    exp = ivf_topk(emb, C, qvec, k=10, nprobe=2, exclude_id=0).collect()
    assert [(r["vec_id"], r["sim"]) for r in got.collect()] == [
        (r["vec_id"], r["sim"]) for r in exp
    ]


def test_ivf_topk_plan_no_shuffle(spark, emb, qvec):
    from search_engine_spark.operators.ann import ivf_topk, pinned_sign_matrix

    plan = (
        ivf_topk(emb, pinned_sign_matrix(8, 64, row_offset=13), qvec, k=10)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # narrow scan → fused python kernel → TakeOrderedAndProject: the only
    # data movement is the k-row merge, no Exchange anywhere
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan


def _pq_reference(X, m_sub, ksub, iters):
    """Single-process PQ replica with the operator's exact pins (6dp
    init/codeword/distance rounding, lower-code ties, empty cell keeps
    its codeword); X rows must be sorted by id."""
    import numpy as np

    dsub = X.shape[1] // m_sub
    C = (
        round6(X[:ksub].astype(np.float64))
        .reshape(ksub, m_sub, dsub)
        .transpose(1, 0, 2)
        .copy()
    )
    Xs = X.astype(np.float64).reshape(X.shape[0], m_sub, dsub)

    def assign():
        codes = np.empty((X.shape[0], m_sub), dtype=np.int64)
        for s in range(m_sub):
            d2 = ((Xs[:, s, None, :] - C[s][None, :, :]) ** 2).sum(axis=2)
            codes[:, s] = np.argmin(round6(d2), axis=1)
        return codes

    for _ in range(iters):
        codes = assign()
        for s in range(m_sub):
            for j in range(ksub):
                m = codes[:, s] == j
                if m.any():
                    C[s][j] = round6(Xs[m, s, :].mean(axis=0))
    return C, assign()


def test_pq_train_encode_match_reference(spark, emb):
    import numpy as np

    from search_engine_spark.operators.ann import pq_encode, pq_train

    rows = emb.orderBy("vec_id").collect()
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    ids = [int(r["vec_id"]) for r in rows]
    want_C, want_codes = _pq_reference(X, m_sub=4, ksub=4, iters=2)

    C = pq_train(emb, m_sub=4, ksub=4, iters=2)
    assert C.shape == (4, 4, 16)
    assert np.allclose(C, want_C)

    got = {r["vec_id"]: list(r["codes"]) for r in pq_encode(emb, C).collect()}
    assert got == {
        i: [int(c) for c in want_codes[r]] for r, i in enumerate(ids)
    }
    # codes use the whole range on this data (nontrivial quantizer)
    flat = {c for cs in got.values() for c in cs}
    assert flat == set(range(4))


def test_pq_topk_adc_and_plan(spark, emb, qvec):
    import numpy as np

    from search_engine_spark.operators.ann import (
        pq_adc_lut,
        pq_encode,
        pq_topk,
        pq_train,
    )

    C = pq_train(emb, m_sub=4, ksub=4, iters=2)
    codes = pq_encode(emb, C)
    got = pq_topk(codes, C, qvec, k=10, exclude_id=0)
    plan = got._jdf.queryExecution().executedPlan().toString()
    # codes scan → python kernel → k-row merge; no shuffle anywhere
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan

    rows = got.collect()
    assert len(rows) == 10
    dists = [r["dist"] for r in rows]
    assert dists == sorted(dists) and all(d >= 0 for d in dists)
    assert all(r["vec_id"] != 0 for r in rows)
    # ADC distance is exactly the left-to-right LUT fold over the codes
    lut = pq_adc_lut(C, qvec)
    code_map = {r["vec_id"]: list(r["codes"]) for r in codes.collect()}
    for r in rows:
        acc = np.float64(0.0)
        for s, c in enumerate(code_map[r["vec_id"]]):
            acc = acc + lut[s, c]
        assert r["dist"] == round(float(acc), 6)


def test_ivfpq_layout_prunes_and_matches_pq(spark, emb, qvec, tmp_path):
    import os

    from pyspark.sql import functions as F

    from search_engine_spark.operators.ann import (
        ivf_assign,
        ivf_probe_cells,
        ivfpq_topk,
        ivfpq_write_partitioned,
        pinned_sign_matrix,
        pq_encode,
        pq_topk,
        pq_train,
    )

    C = pinned_sign_matrix(8, 64, row_offset=13)
    cb = pq_train(emb, m_sub=4, ksub=4, iters=2)
    path = str(tmp_path / "ivfpq")
    ivfpq_write_partitioned(emb, C, cb, path)
    assert any(d.startswith("centroid=") for d in os.listdir(path))

    got = ivfpq_topk(spark, path, C, cb, qvec, k=10, nprobe=2, exclude_id=0)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "centroid" in plan.split(
        "PartitionFilters:"
    )[1].split("]")[0]
    assert "Exchange" not in plan

    # equals plain PQ ADC restricted to the probed cells' vectors
    cells = ivf_probe_cells(C, qvec, nprobe=2)
    probed = {
        r["vec_id"]
        for r in ivf_assign(emb, C).filter(
            F.col("centroid").isin(cells)
        ).collect()
    }
    sub_codes = pq_encode(
        emb.filter(F.col("vec_id").isin(list(probed))), cb
    )
    exp = pq_topk(sub_codes, cb, qvec, k=10, exclude_id=0).collect()
    assert [(r["vec_id"], r["dist"]) for r in got.collect()] == [
        (r["vec_id"], r["dist"]) for r in exp
    ]


def _kmeans_reference(X, k, iters):
    """Single-process Lloyd's replica with the operator's exact pins
    (6dp init/centroid/distance rounding, lower-id ties, empty cluster
    keeps its centroid)."""
    import numpy as np

    C = round6(X[:k].astype(np.float64))
    for _ in range(iters):
        d2 = round6(((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2))
        a = np.argmin(d2, axis=1)
        C = np.vstack([
            round6(X[a == c].mean(axis=0)) if (a == c).any() else C[c]
            for c in range(k)
        ])
    d2 = round6(((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2))
    return np.argmin(d2, axis=1), C


def test_kmeans_matches_reference_and_plan(spark, emb):
    import numpy as np

    from search_engine_spark.operators.ann import kmeans

    rows = emb.orderBy("vec_id").collect()
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    ids = np.array([r["vec_id"] for r in rows])
    want_a, want_C = _kmeans_reference(X, k=4, iters=2)

    out, C = kmeans(emb, k=4, iters=2)
    got = {r["vec_id"]: r["centroid"] for r in out.collect()}
    assert np.allclose(C, want_C)  # 6dp-rounded centroids agree
    assert got == {int(i): int(c) for i, c in zip(ids, want_a)}
    # every cluster non-trivial on this data and ids partition the input
    assert set(got) == set(int(i) for i in ids)
    assert len(set(got.values())) > 1
    # plan: narrow map over the scan — no shuffle (Exchange) anywhere
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
