"""Insert path of the incremental upsert (reference S4: POST /api/indexPage
indexes a never-seen page — IndexingServiceImpl.java:86-118), plus delta
key-dedup and the crash-safe swap recovery."""

from __future__ import annotations

import os
import shutil

import pandas as pd
import pytest

from oracle import oracle as orc
from search_engine_spark.schemas import TRANSCRIPTS


@pytest.fixture()
def copy_index(base_index_dir, tmp_path_factory):
    """Function-scoped override of the shared module fixture: every test
    here mutates the index, so each gets its own copy."""
    dst = str(tmp_path_factory.mktemp("idxins") / "idx")
    shutil.copytree(base_index_dir["index"], dst)
    return {"corpus": base_index_dir["corpus"], "index": dst}


def _mk_job(spark, copy_index):
    from search_engine_spark.plans.job import IndexBuildJob

    return IndexBuildJob(
        spark, copy_index["corpus"], copy_index["index"],
        n_buckets=4, docs_per_shard=256, run_id="base",
    )


def _delta_rows(small_pdf, rows):
    """Build a transcripts-shaped pdf from (conv_id, turn_idx, text) tuples,
    borrowing role/tool/ts dtypes from the corpus."""
    proto = small_pdf.iloc[0]
    return pd.DataFrame(
        [
            {
                "conv_id": c, "turn_idx": t, "role": "user",
                "text": x, "tool": proto["tool"], "ts": proto["ts"],
            }
            for c, t, x in rows
        ]
    )


def test_insert_tail_keys_equals_fresh_build(
    spark, small_pdf, copy_index, tmp_path_factory
):
    """A delta mixing an update with never-seen keys that sort after every
    existing (conv_id, turn_idx) produces tables IDENTICAL to a fresh
    build over the combined corpus (appended ids == fresh dense ids)."""
    from search_engine_spark.operators.upsert import upsert_turns
    from search_engine_spark.plans.job import IndexBuildJob
    from tests.test_job import _decoded_postings

    job = _mk_job(spark, copy_index)
    new = _delta_rows(small_pdf, [
        ("zzzz-00000001", 0, "fresh zanzibar insertion alpha"),
        ("zzzz-00000001", 1, "fresh zanzibar insertion beta"),
    ])
    mod = small_pdf.copy()
    victim = mod.index[7]
    mod.loc[victim, "text"] = "updated gamma insertion text"
    upd = mod.loc[[victim]]
    delta = pd.concat([upd, new], ignore_index=True)

    summary = upsert_turns(job, spark.createDataFrame(delta, schema=TRANSCRIPTS))
    assert summary["updated_turns"] == 1
    assert summary["inserted_turns"] == 2

    combined = pd.concat([mod, new], ignore_index=True)
    combined["ts"] = combined["ts"].astype("datetime64[us]")  # no NANOS parquet
    base2 = tmp_path_factory.mktemp("insfresh")
    corpus2 = str(base2 / "tr.parquet")
    combined.sort_values(["conv_id", "turn_idx"]).to_parquet(
        corpus2, index=False, row_group_size=512
    )
    fresh = IndexBuildJob(
        spark, corpus2, str(base2 / "idx"), n_buckets=4, docs_per_shard=256,
        run_id="fresh",
    )
    fresh.run()

    a, b = job.tables(), fresh.tables()
    docs_a = {r["doc_id"]: (r["conv_id"], r["turn_idx"], r["text"])
              for r in a["docs"].collect()}
    docs_b = {r["doc_id"]: (r["conv_id"], r["turn_idx"], r["text"])
              for r in b["docs"].collect()}
    assert docs_a == docs_b
    assert _decoded_postings(a["postings"]) == _decoded_postings(b["postings"])
    ls_a = {(r["scope"], r["lemma"]): (r["df"], r["cf"])
            for r in a["lemma_stats"].collect()}
    ls_b = {(r["scope"], r["lemma"]): (r["df"], r["cf"])
            for r in b["lemma_stats"].collect()}
    assert ls_a == ls_b


def test_insert_mid_sort_key_is_searchable(spark, small_pdf, copy_index):
    """A new key that sorts BETWEEN existing conversations gets an
    appended id (old ids stay put) and is immediately searchable with
    oracle-identical scoring."""
    from search_engine_spark.operators.upsert import upsert_turns
    from search_engine_spark.operators.wand import bm25_search_blocks

    job = _mk_job(spark, copy_index)
    old_max = job.tables()["docs"].agg({"doc_id": "max"}).collect()[0][0]
    new = _delta_rows(small_pdf, [
        ("conv-00000100x", 0, "qqzzunique midsort insertion probe"),
    ])
    summary = upsert_turns(job, spark.createDataFrame(new, schema=TRANSCRIPTS))
    assert summary["inserted_turns"] == 1 and summary["updated_turns"] == 0

    t = job.tables()
    row = t["docs"].filter("conv_id = 'conv-00000100x'").collect()
    assert len(row) == 1 and row[0]["doc_id"] == old_max + 1

    combined = pd.concat([small_pdf, new], ignore_index=True)
    idx = orc.build_index(
        combined.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    exp = orc.search(idx, "qqzzunique", k=10)
    got = bm25_search_blocks(
        t["postings"], t["lemma_stats"], t["doc_stats"], "qqzzunique", k=10,
        mode="wand",
    ).collect()
    # ids differ (appended vs dense) but the hit set/scores must match
    assert len(got) == len(exp) == 1
    assert got[0]["score"] == exp[0][1]
    assert got[0]["doc_id"] == old_max + 1


def test_delta_key_dedup_last_write_wins(spark, small_pdf, copy_index):
    """Two delta rows for one never-seen key collapse to the latest ts —
    no duplicate doc rows, no double-counted postings."""
    from search_engine_spark.operators.upsert import upsert_turns

    job = _mk_job(spark, copy_index)
    proto = small_pdf.iloc[0]
    ts0 = proto["ts"]
    dup = pd.DataFrame([
        {"conv_id": "zzzz-00000002", "turn_idx": 0, "role": "user",
         "text": "stale version", "tool": proto["tool"], "ts": ts0},
        {"conv_id": "zzzz-00000002", "turn_idx": 0, "role": "user",
         "text": "final version", "tool": proto["tool"],
         "ts": ts0 + pd.Timedelta(hours=1)},
    ])
    summary = upsert_turns(job, spark.createDataFrame(dup, schema=TRANSCRIPTS))
    assert summary["inserted_turns"] == 1
    rows = job.tables()["docs"].filter("conv_id = 'zzzz-00000002'").collect()
    assert len(rows) == 1 and rows[0]["text"] == "final version"


def test_recover_swaps(spark, copy_index):
    """Both crash windows of _swap_in are repaired: a live dir moved aside
    with no replacement is restored; a leftover .old after a completed
    swap is dropped."""
    from search_engine_spark.operators.upsert import recover_swaps

    out = copy_index["index"]
    live = f"{out}/docs/bucket=1"
    aside = f"{out}/.old_docs_1"
    os.rename(live, aside)  # crash between rename-aside and rename-in
    restored = recover_swaps(out)
    assert restored == [live] and os.path.exists(live)
    assert not os.path.exists(aside)

    done_old = f"{out}/.old_post_2"  # crash after swap, before cleanup
    shutil.copytree(f"{out}/postings/bucket=2", done_old)
    assert recover_swaps(out) == []
    assert not os.path.exists(done_old)
    assert os.path.exists(f"{out}/postings/bucket=2")
