"""Bucket rebalance (operators/maintenance.py): after append-heavy
upserts the tail bucket is overgrown; rebalance re-buckets to the
per_bucket target without changing doc_ids, search results, or stats."""

from __future__ import annotations

import shutil

import pandas as pd
import pytest

from search_engine_spark.schemas import TRANSCRIPTS


@pytest.fixture()
def copy_index(base_index_dir, tmp_path_factory):
    """Function-scoped: every test here mutates the index."""
    dst = str(tmp_path_factory.mktemp("idxreb") / "idx")
    shutil.copytree(base_index_dir["index"], dst)
    return {"corpus": base_index_dir["corpus"], "index": dst}


def _mk_job(spark, copy_index):
    from search_engine_spark.plans.job import IndexBuildJob

    return IndexBuildJob(
        spark, copy_index["corpus"], copy_index["index"],
        n_buckets=4, docs_per_shard=256, run_id="base",
    )


def _insert_delta(small_pdf, n_convs: int, turns_per_conv: int = 3):
    proto = small_pdf.iloc[0]
    rows = []
    for c in range(n_convs):
        for t in range(turns_per_conv):
            rows.append({
                "conv_id": f"zzzz-{c:08d}", "turn_idx": t, "role": "user",
                "text": f"zephyr quail {c} vortex {t} amber lattice",
                "tool": proto["tool"], "ts": proto["ts"],
            })
    return pd.DataFrame(rows)


def _search_all(spark, index_dir):
    from search_engine_spark.operators.serve import QueryServer

    srv = QueryServer(spark, index_dir, cache_blocks=False)
    out = {}
    for name, q, scope, combine in [
        ("plain", "zephyr quail", None, "and"),
        ("scoped", "vortex", "scope-1", "and"),
        ("or", "amber merge", None, "or"),
        ("old_corpus", "dup merge", None, "and"),
    ]:
        out[name] = srv.search(q, scope=scope, k=20, combine=combine)
    return out


def test_rebalance_after_fresh_build_is_noop(spark, copy_index):
    from search_engine_spark.operators.maintenance import rebalance_buckets

    res = rebalance_buckets(_mk_job(spark, copy_index))
    assert res["moved_docs"] == 0
    assert res["buckets_rewritten"] == []
    assert res["n_buckets"] == 4


def test_rebalance_splits_overgrown_tail(spark, small_pdf, copy_index):
    from search_engine_spark.operators.maintenance import (
        bucket_sizes,
        rebalance_buckets,
    )
    from search_engine_spark.operators.upsert import upsert_turns

    job = _mk_job(spark, copy_index)
    out = copy_index["index"]

    # grow the tail: ~3x the per-bucket target of new turns
    lineage = {
        r["key"]: r["value"]
        for r in spark.read.parquet(f"{out}/lineage").collect()
    }
    per_bucket = -(-int(lineage["n_turns"]) // int(lineage["n_buckets"]))
    n_new = 3 * per_bucket
    delta = _insert_delta(small_pdf, -(-n_new // 3))
    upsert_turns(job, spark.createDataFrame(delta, schema=TRANSCRIPTS))

    sizes_before = bucket_sizes(spark, out)
    assert sizes_before[3] > 2 * per_bucket  # tail is overgrown
    docs_before = (
        spark.read.parquet(f"{out}/docs")
        .select("doc_id", "conv_id", "turn_idx", "text")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    stats_before = (
        spark.read.parquet(f"{out}/lemma_stats")
        .groupBy("lemma")
        .sum("df", "cf")
        .toPandas()
        .sort_values("lemma")
        .reset_index(drop=True)
    )
    results_before = _search_all(spark, out)

    res = rebalance_buckets(job)
    assert res["moved_docs"] > 0
    assert res["n_buckets"] > 4

    sizes_after = bucket_sizes(spark, out)
    assert len(sizes_after) == res["n_buckets"]
    # every bucket near target: the conv-start rule can spill at most one
    # conversation's tail past each boundary
    max_conv = int(
        pd.concat([small_pdf, delta]).groupby("conv_id").size().max()
    )
    assert max(sizes_after.values()) <= per_bucket + max_conv
    # untouched settled buckets kept their files
    assert 0 not in res["buckets_rewritten"]

    # identity: doc rows, stats values, search results all unchanged
    docs_after = (
        spark.read.parquet(f"{out}/docs")
        .select("doc_id", "conv_id", "turn_idx", "text")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(docs_before, docs_after)
    stats_after = (
        spark.read.parquet(f"{out}/lemma_stats")
        .groupBy("lemma")
        .sum("df", "cf")
        .toPandas()
        .sort_values("lemma")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(stats_before, stats_after)
    assert _search_all(spark, out) == results_before

    # second rebalance is a no-op; lineage now carries the new layout
    res2 = rebalance_buckets(job)
    assert res2["moved_docs"] == 0
    lineage2 = {
        r["key"]: r["value"]
        for r in spark.read.parquet(f"{out}/lineage").collect()
    }
    assert int(lineage2["n_buckets"]) == res["n_buckets"]


def test_upsert_still_works_after_rebalance(spark, small_pdf, copy_index):
    from search_engine_spark.operators.maintenance import rebalance_buckets
    from search_engine_spark.operators.serve import QueryServer
    from search_engine_spark.operators.upsert import upsert_turns

    job = _mk_job(spark, copy_index)
    out = copy_index["index"]
    delta = _insert_delta(small_pdf, 120)  # 360 new turns over 4x90 target
    upsert_turns(job, spark.createDataFrame(delta, schema=TRANSCRIPTS))
    rebalance_buckets(job)

    # an update + an insert against the rebalanced layout
    proto = small_pdf.iloc[0]
    delta2 = pd.DataFrame([
        {"conv_id": "zzzz-00000005", "turn_idx": 0, "role": "user",
         "text": "rebalanced overwrite xylophone", "tool": proto["tool"],
         "ts": proto["ts"]},
        {"conv_id": "zzzz-99999999", "turn_idx": 0, "role": "user",
         "text": "post rebalance insert xylophone", "tool": proto["tool"],
         "ts": proto["ts"]},
    ])
    summary = upsert_turns(job, spark.createDataFrame(delta2, schema=TRANSCRIPTS))
    assert summary["updated_turns"] == 1
    assert summary["inserted_turns"] == 1
    srv = QueryServer(spark, out, cache_blocks=False)
    hits = srv.search("xylophone", k=10)
    assert len(hits) == 2


def test_upsert_auto_rebalance_trigger(spark, small_pdf, copy_index):
    from search_engine_spark.operators.maintenance import bucket_sizes
    from search_engine_spark.operators.upsert import upsert_turns

    job = _mk_job(spark, copy_index)
    out = copy_index["index"]
    lineage = {
        r["key"]: r["value"]
        for r in spark.read.parquet(f"{out}/lineage").collect()
    }
    per_bucket = -(-int(lineage["n_turns"]) // int(lineage["n_buckets"]))

    # small delta: below the factor, no rebalance
    d1 = _insert_delta(small_pdf, 2)
    s1 = upsert_turns(
        job, spark.createDataFrame(d1, schema=TRANSCRIPTS),
        rebalance_factor=2.0,
    )
    assert "rebalanced" not in s1

    # big delta: tail passes 2x per_bucket, auto-rebalance fires
    d2 = _insert_delta(small_pdf, per_bucket)  # 3*per_bucket new turns
    d2 = d2[~d2["conv_id"].isin(d1["conv_id"])]
    s2 = upsert_turns(
        job, spark.createDataFrame(d2, schema=TRANSCRIPTS),
        rebalance_factor=2.0,
    )
    assert s2["rebalanced"]["moved_docs"] > 0
    assert s2["rebalanced"]["n_buckets"] > 4
    sizes = bucket_sizes(spark, out)
    assert max(sizes.values()) <= 2 * per_bucket
