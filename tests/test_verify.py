"""verify_index (operators/maintenance.py): the CheckIndex-style audit
passes on a healthy index (fresh build AND after an insert upsert) and
pinpoints seeded corruption in block metadata and stored stats."""

from __future__ import annotations

import glob
import shutil

import pandas as pd
import pytest

from search_engine_spark.schemas import TRANSCRIPTS


@pytest.fixture()
def private_index(base_index_dir, tmp_path_factory):
    """Function-scoped mutable copy (corruption tests poison it)."""
    dst = str(tmp_path_factory.mktemp("idxver") / "idx")
    shutil.copytree(base_index_dir["index"], dst)
    return {"corpus": base_index_dir["corpus"], "index": dst}


def test_verify_fresh_index_passes(spark, base_index_dir):
    from search_engine_spark.operators.maintenance import verify_index

    rep = verify_index(spark, base_index_dir["index"])
    assert rep["ok"], rep
    assert rep["blocks"]["n_blocks"] > 0
    for check in (
        "doc_ids", "doc_keys", "conv_offsets", "lemma_stats",
        "doc_stats", "shards", "blocks", "alignment",
    ):
        assert rep[check]["ok"], (check, rep[check])


def test_verify_passes_after_insert_upsert(spark, small_pdf, private_index):
    from search_engine_spark.operators.maintenance import verify_index
    from search_engine_spark.operators.upsert import upsert_turns
    from search_engine_spark.plans.job import IndexBuildJob

    job = IndexBuildJob(
        spark, private_index["corpus"], private_index["index"],
        n_buckets=4, docs_per_shard=256, run_id="base",
    )
    proto = small_pdf.iloc[0]
    delta = pd.DataFrame([
        {
            "conv_id": f"zzzz-{c:04d}", "turn_idx": t, "role": "user",
            "text": f"zephyr quail {c} vortex {t}",
            "tool": proto["tool"], "ts": proto["ts"],
        }
        for c in range(5)
        for t in range(3)
    ])
    upsert_turns(job, spark.createDataFrame(delta, schema=TRANSCRIPTS))
    rep = verify_index(spark, private_index["index"])
    assert rep["ok"], rep


def _poison_parquet(path_glob: str, mutate) -> None:
    """Rewrite ONE parquet file under ``path_glob`` through pyarrow with
    ``mutate(pandas_frame) -> pandas_frame`` applied, schema preserved.
    Drops the Hadoop ``.crc`` sidecar of the mutated file — otherwise
    ChecksumFileSystem rejects the rewrite before Spark ever sees it."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    f = sorted(
        p for p in glob.glob(path_glob) if p.endswith(".parquet")
    )[0]
    table = pq.read_table(f)
    pdf = mutate(table.to_pandas())
    pq.write_table(
        pa.Table.from_pandas(pdf, schema=table.schema, preserve_index=False),
        f,
    )
    crc = os.path.join(os.path.dirname(f), f".{os.path.basename(f)}.crc")
    if os.path.exists(crc):
        os.remove(crc)


def test_verify_detects_block_and_stats_corruption(spark, private_index):
    from search_engine_spark.operators.maintenance import verify_index

    out = private_index["index"]

    def break_blocks(pdf):
        pdf.loc[pdf.index[0], "max_tf"] = 1_000_000
        # second block: teleport to a bogus shard — its hull then overlaps
        # a legit shard's hull inside the same bucket (shards check)
        pdf.loc[pdf.index[1], "shard"] = 999_999
        return pdf

    _poison_parquet(f"{out}/postings/bucket=0/*.parquet", break_blocks)

    def break_df(pdf):
        pdf.loc[pdf.index[0], "df"] = pdf.loc[pdf.index[0], "df"] + 7
        return pdf

    _poison_parquet(f"{out}/lemma_stats/*.parquet", break_df)

    rep = verify_index(spark, out)
    assert not rep["ok"]
    assert rep["blocks"]["bad_max_tf"] >= 1
    assert rep["shards"]["bad_shards"] >= 1
    assert not rep["lemma_stats"]["ok"]
    # untouched families still verify
    assert rep["doc_ids"]["ok"] and rep["conv_offsets"]["ok"]


def test_audit_kernel_positional_branch(spark, transcripts_sdf):
    """The positional decode check runs on positional blocks (built
    inline — no extra index-dir build) and reports zero violations."""
    from pyspark.sql import functions as F

    from search_engine_spark.operators.build import (
        build_postings_flat_positional,
    )
    from search_engine_spark.operators.compress import (
        build_postings_compressed,
    )
    from search_engine_spark.operators.docs import build_docs
    from search_engine_spark.operators.maintenance import (
        _BLOCK_AUDIT_COLS,
        _BLOCK_AUDIT_SCHEMA,
        _audit_blocks_kernel,
    )

    docs = build_docs(
        transcripts_sdf.filter(F.col("conv_id") < "conv-00000020"),
        with_lemmas=True,
        positional=True,
    )
    blocks = build_postings_compressed(
        build_postings_flat_positional(docs), range_size=64, positional=True
    )
    totals = (
        blocks.select(*_BLOCK_AUDIT_COLS, "positions")
        .mapInPandas(
            _audit_blocks_kernel(64, True), schema=_BLOCK_AUDIT_SCHEMA
        )
        .groupBy()
        .sum()
        .head()
    )
    t = totals.asDict()
    assert t["sum(n_blocks)"] > 0
    assert all(
        (v or 0) == 0 for k, v in t.items() if "bad_" in k
    ), t
