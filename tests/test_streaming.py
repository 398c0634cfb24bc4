"""Structured Streaming ingestion: deltas dropped into a directory are
folded into the index; results equal a fresh build of the final corpus."""

from __future__ import annotations

import pytest

from oracle import oracle as orc


@pytest.fixture(scope="module")
def stream_env(spark, copy_index, tmp_path_factory):
    from search_engine_spark.plans.job import IndexBuildJob

    base = tmp_path_factory.mktemp("stream")
    job = IndexBuildJob(
        spark, copy_index["corpus"], copy_index["index"],
        n_buckets=4, docs_per_shard=256, run_id="stream-base",
    )
    return job, base


def test_stream_upserts_applied(stream_env, spark, small_pdf):
    import os

    from search_engine_spark.operators.wand import bm25_search_blocks
    from search_engine_spark.streaming.ingest import stream_upserts

    job, base = stream_env
    delta_dir = str(base / "deltas")
    os.makedirs(delta_dir, exist_ok=True)

    q = stream_upserts(job, delta_dir, str(base / "ckpt"))
    try:
        mod = small_pdf.copy()
        victims = mod.index[[10, 700]]
        for i, v in enumerate(victims):
            mod.loc[v, "text"] = f"streamed quux{i} correction"
        # two delta files → two micro-batch inputs (tool typed as string —
        # an all-null object column would be written as parquet null type)
        for i, v in enumerate(victims):
            d = mod.loc[[v]].copy()
            d["tool"] = d["tool"].astype("string")
            d.to_parquet(f"{delta_dir}/d{i}.parquet", index=False)
        q.processAllAvailable()
    finally:
        q.stop()

    idx = orc.build_index(mod)
    t = job.tables()
    exp = orc.search(idx, "quux0 streamed", k=5)
    got = [
        (r["doc_id"], r["score"])
        for r in bm25_search_blocks(
            t["postings"], t["lemma_stats"], t["doc_stats"],
            "quux0 streamed", k=5, mode="wand",
        ).collect()
    ]
    assert got == [(d, s) for d, s in exp]
    assert exp  # the streamed text is actually findable
