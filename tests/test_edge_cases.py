"""Edge-case guards: encoder batch-boundary carry; resume over a
partially-written bucket (crash between data write and checkpoint row)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from search_engine_spark.operators import compress as C


def _frame(rows):
    return pd.DataFrame(
        rows, columns=["scope", "lemma", "shard", "doc_id", "tf", "doc_len"]
    )


def test_encoder_carry_across_many_batches():
    """A single group split across 5 Arrow batches, plus group changes at
    every batch boundary position — decoded output must equal input."""
    rows = []
    # group A: 40 rows (spans batches of size 10)
    for i in range(40):
        rows.append(("s0", "aaa", 0, i + 1, 1 + i % 3, 10))
    # group B: 1 row exactly at a boundary
    rows.append(("s0", "bbb", 0, 7, 2, 11))
    # group C: 9 rows (ends mid-batch)
    for i in range(9):
        rows.append(("s0", "ccc", 0, i + 3, 5, 12))
    pdf = _frame(rows)
    batches = [pdf.iloc[i:i + 10].reset_index(drop=True) for i in range(0, len(pdf), 10)]
    out = pd.concat(list(C._encode_partition(iter(batches))), ignore_index=True)

    decoded = {}
    for r in out.itertuples(index=False):
        ids, tfs, dls = C.decode_blocks([r.doc_ids], [r.tfs], [r.doc_lens])
        assert r.count == ids.size
        for i, t, d in zip(ids.tolist(), tfs.tolist(), dls.tolist()):
            decoded[(r.lemma, i)] = (t, d)
    expected = {
        (r.lemma, r.doc_id): (r.tf, r.doc_len) for r in pdf.itertuples(index=False)
    }
    assert decoded == expected


def test_encoder_block_boundary_exact_multiple():
    """Group size an exact multiple of BLOCK_SIZE → no empty trailing block."""
    n = C.BLOCK_SIZE * 3
    pdf = _frame([("s0", "xxx", 0, i + 1, 1, 5) for i in range(n)])
    out = pd.concat(
        list(C._encode_partition(iter([pdf]))), ignore_index=True
    )
    assert list(out["count"]) == [C.BLOCK_SIZE] * 3
    assert list(out["block_id"]) == [0, 1, 2]


def test_encoder_empty_and_single_row_batches():
    pdf = _frame([("s0", "solo", 2, 99, 7, 3)])
    empty = _frame([])
    out = pd.concat(
        list(C._encode_partition(iter([empty, pdf, empty]))), ignore_index=True
    )
    assert len(out) == 1 and out["count"].iat[0] == 1
    ids, tfs, dls = C.decode_blocks(
        [out["doc_ids"].iat[0]], [out["tfs"].iat[0]], [out["doc_lens"].iat[0]]
    )
    assert ids.tolist() == [99] and tfs.tolist() == [7] and dls.tolist() == [3]


def test_resume_overwrites_uncommitted_partial_bucket(
    spark, base_index_dir, tmp_path_factory, small_pdf
):
    """Crash window: bucket data partially written but no checkpoint row.
    Resume must rebuild that bucket and converge to the clean state."""
    import shutil

    from search_engine_spark.plans.job import IndexBuildJob
    from tests.test_job import _decoded_postings

    out = str(tmp_path_factory.mktemp("partial") / "idx")
    shutil.copytree(base_index_dir["index"], out)

    # simulate the crash: bucket 2's outputs half-deleted, checkpoint rows
    # for bucket 2 removed (as if the crash hit before _checkpoint)
    import glob
    import os

    for f in glob.glob(f"{out}/postings/bucket=2/*.parquet")[::2]:
        os.remove(f)
    cps = spark.read.parquet(f"{out}/checkpoints").filter(
        "NOT (partition_id = 2 AND stage IN ('docs', 'postings'))"
    )
    cps_pdf = cps.toPandas()
    shutil.rmtree(f"{out}/checkpoints")
    spark.createDataFrame(
        cps_pdf, spark.read.parquet(f"{base_index_dir['index']}/checkpoints").schema
    ).write.mode("overwrite").parquet(f"{out}/checkpoints")

    job = IndexBuildJob(
        spark, base_index_dir["corpus"], out, n_buckets=4, docs_per_shard=256,
        run_id="recover",
    )
    summary = job.run()
    assert summary["buckets_built"] == 1  # only the damaged bucket

    clean = spark.read.parquet(f"{base_index_dir['index']}/postings")
    recovered = spark.read.parquet(f"{out}/postings")
    assert _decoded_postings(recovered) == _decoded_postings(clean)
