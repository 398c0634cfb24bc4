"""Checkpointed build job: resume correctness + lineage/metrics tables
(SURVEY.md §5 item 5 "resume-from-checkpoint == single-run output";
FIXTURES.md §4 resume fixture)."""

from __future__ import annotations

import pytest

from oracle import oracle as orc
from search_engine_spark.operators.wand import bm25_search_blocks
from search_engine_spark.plans.job import IndexBuildJob
from tests.test_spark_engine import QUERY_CASES, _rows




def _decoded_postings(blocks_df) -> dict:
    from search_engine_spark.operators.compress import decode_blocks

    out: dict = {}
    for r in blocks_df.collect():
        ids, tfs, _ = decode_blocks([r["doc_ids"]], [r["tfs"]], [r["doc_lens"]])
        for i, t in zip(ids.tolist(), tfs.tolist()):
            out[(r["lemma"], i)] = t
    return out


@pytest.fixture(scope="module")
def full_run(spark, base_index_dir):
    """Job handle over the session-shared completed build (read-only)."""
    return IndexBuildJob(
        spark, base_index_dir["corpus"], base_index_dir["index"],
        n_buckets=4, docs_per_shard=256, run_id="shared-reader",
    )


def test_job_docs_match_oracle(full_run, small_pdf):
    exp = orc.build_docs(small_pdf)
    got = (
        full_run.tables()["docs"]
        .select("doc_id", "conv_id", "turn_idx", "scope", "doc_len", "text")
        .orderBy("doc_id")
        .collect()
    )
    assert len(got) == len(exp)
    for g, (_, e) in zip(got, exp.iterrows()):
        assert g["doc_id"] == e["doc_id"] and g["text"] == e["text"]


def test_job_rank_identical(full_run, oracle_idx):
    t = full_run.tables()
    # representative subset (full matrix runs in test_compressed.py over
    # the single-pass build; this guards the bucketed layout)
    cases = [QUERY_CASES[i] for i in (0, 2, 7, 8, 11)]
    for qid, query, scope, k, offset in cases:
        exp = orc.search(oracle_idx, query, scope=scope, k=k, offset=offset)
        got = _rows(
            bm25_search_blocks(
                t["postings"], t["lemma_stats"], t["doc_stats"],
                query, scope=scope, k=k, offset=offset, mode="wand",
            )
        )
        assert [(d, s) for d, s in got] == [(d, s) for d, s in exp], qid


def test_resume_equals_single_run(spark, full_run, tmp_path_factory):
    """Crash after 2 of 4 buckets, then resume with a NEW job instance:
    all tables identical to the uninterrupted run."""
    corpus_path = full_run.transcripts_path
    out = str(tmp_path_factory.mktemp("job") / "idx_resume")
    j1 = IndexBuildJob(
        spark, corpus_path, out, n_buckets=4, docs_per_shard=256, run_id="r1"
    )
    with pytest.raises(RuntimeError, match="simulated crash"):
        j1.run(fail_after_buckets=2)
    done = {
        (r["stage"], r["partition_id"])
        for r in spark.read.parquet(f"{out}/checkpoints").collect()
    }
    assert ("offsets", 0) in done and len(done) < 9  # partial progress

    j2 = IndexBuildJob(
        spark, corpus_path, out, n_buckets=4, docs_per_shard=256, run_id="r2"
    )
    summary = j2.run()
    assert 0 < summary["buckets_built"] <= 2  # only the missing buckets ran

    a, b = full_run.tables(), j2.tables()
    docs_a = {r["doc_id"]: r["text"] for r in a["docs"].collect()}
    docs_b = {r["doc_id"]: r["text"] for r in b["docs"].collect()}
    assert docs_a == docs_b
    assert _decoded_postings(a["postings"]) == _decoded_postings(b["postings"])
    ls_a = {(r["scope"], r["lemma"]): (r["df"], r["cf"]) for r in a["lemma_stats"].collect()}
    ls_b = {(r["scope"], r["lemma"]): (r["df"], r["cf"]) for r in b["lemma_stats"].collect()}
    assert ls_a == ls_b


def test_rerun_is_noop(full_run):
    """A second run() over a completed output builds nothing."""
    again = IndexBuildJob(
        full_run.spark, full_run.transcripts_path, full_run.out,
        n_buckets=4, docs_per_shard=256, run_id="again",
    ).run()
    assert again["buckets_built"] == 0


def test_cancel_resume_converges(spark, full_run, tmp_path_factory):
    """Cooperative cancel from another thread stops after the current
    bucket; a later run() completes the build and the tables equal an
    uninterrupted build's. Robust to timing: if the build outruns the
    cancel flag, the resume is a no-op and convergence still holds."""
    import threading
    import time as _time

    out = str(tmp_path_factory.mktemp("job") / "idx_cancel")
    j1 = IndexBuildJob(
        spark, full_run.transcripts_path, out, n_buckets=4,
        docs_per_shard=256, run_id="c1",
    )
    res: dict = {}
    t = threading.Thread(target=lambda: res.update(j1.run()))
    t.start()
    while j1.buckets_completed < 1 and t.is_alive():
        _time.sleep(0.02)
    j1.cancel()
    t.join()
    assert res["cancelled"] or res["buckets_built"] == 4

    j2 = IndexBuildJob(
        spark, full_run.transcripts_path, out, n_buckets=4,
        docs_per_shard=256, run_id="c2",
    )
    s2 = j2.run()
    assert not s2["cancelled"]

    a, b = full_run.tables(), j2.tables()
    docs_a = {r["doc_id"]: r["text"] for r in a["docs"].collect()}
    docs_b = {r["doc_id"]: r["text"] for r in b["docs"].collect()}
    assert docs_a == docs_b
    assert _decoded_postings(a["postings"]) == _decoded_postings(b["postings"])


def test_failed_bucket_writes_error_row(spark, full_run, tmp_path_factory):
    """An exception inside a bucket leaves a status='failed' checkpoint
    row carrying the error (Site.lastError analog); resume redoes exactly
    that bucket."""
    out = str(tmp_path_factory.mktemp("job") / "idx_fail")
    j = IndexBuildJob(
        spark, full_run.transcripts_path, out, n_buckets=4,
        docs_per_shard=256, run_id="f1",
    )
    orig = j._stage_bucket

    def boom(b, range_size, done):
        if b == 1:
            raise ValueError("disk exploded")
        return orig(b, range_size, done)

    j._stage_bucket = boom
    with pytest.raises(ValueError, match="disk exploded"):
        j.run()
    cps = spark.read.parquet(f"{out}/checkpoints").collect()
    failed = [r for r in cps if r["status"] == "failed"]
    assert len(failed) == 1
    assert failed[0]["partition_id"] == 1
    assert "disk exploded" in failed[0]["last_error"]

    s2 = IndexBuildJob(
        spark, full_run.transcripts_path, out, n_buckets=4,
        docs_per_shard=256, run_id="f2",
    ).run()
    assert s2["buckets_built"] == 3 and not s2["cancelled"]  # buckets 1-3
    done = {
        (r["stage"], r["partition_id"])
        for r in spark.read.parquet(f"{out}/checkpoints").collect()
        if r["status"] == "done"
    }
    assert {("docs", b) for b in range(4)} <= done


def test_metrics_and_lineage_present(full_run):
    t = full_run.tables()
    lineage = {r["key"]: r["value"] for r in t["lineage"].collect()}
    assert lineage["input_path"] == full_run.transcripts_path
    assert int(lineage["n_turns"]) > 0
    metrics = t["metrics"].collect()
    stages = {r["stage"] for r in metrics}
    assert {"offsets", "docs", "postings", "stats"} <= stages
    cps = t["checkpoints"].collect()
    assert all(r["status"] == "done" for r in cps)
    # per-partition coverage: one docs + one postings row per bucket
    docs_parts = {r["partition_id"] for r in cps if r["stage"] == "docs"}
    assert docs_parts == set(range(4))
