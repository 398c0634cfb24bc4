"""Snapshot/manifest layer (operators/snapshots.py): commits on every
mutation, time travel, rollback, expiry — Iceberg semantics over plain
parquet via hardlink manifests + an atomic CURRENT pointer."""

from __future__ import annotations

import json
import os

import pytest

from search_engine_spark.api import SearchEngine
from search_engine_spark.operators.snapshots import (
    create_snapshot,
    current_snapshot_id,
    expire_snapshots,
    list_snapshots,
    read_manifest,
    read_snapshot_tables,
    snapshot_dir,
)
from search_engine_spark.schemas import TRANSCRIPTS

CORE_FAMILIES = {
    "docs", "postings", "lemma_stats", "doc_stats", "conv_offsets",
    "lineage", "checkpoints", "metrics",
}


def test_build_commits_snapshot_v1(base_index_dir, spark):
    idx = base_index_dir["index"]
    assert current_snapshot_id(idx) == 1
    m = read_manifest(idx, 1)
    assert m["operation"] == "build" and m["parent_id"] is None
    assert CORE_FAMILIES <= set(m["families"])
    assert m["n_files"] > 0 and m["total_bytes"] > 0
    # hardlinks, not copies: a snapshotted part-file shares its inode
    docs_files = [e["path"] for e in m["families"]["docs"]
                  if e["path"].endswith(".parquet")]
    live = os.path.join(idx, "docs", docs_files[0])
    snap = os.path.join(snapshot_dir(idx, 1), "docs", docs_files[0])
    assert os.stat(live).st_ino == os.stat(snap).st_ino
    # the checkpoint table records the commit (SURVEY §7.4 item 4)
    cps = spark.read.parquet(f"{idx}/checkpoints").collect()
    snaps = [r for r in cps if r["stage"] == "snapshot"]
    assert [(r["partition_id"], r["status"]) for r in snaps] == [(1, "done")]


@pytest.fixture(scope="module")
def upserted(spark, small_pdf, copy_index):
    """Mutable index copy + an upsert that introduces 'zanzibar' (absent
    in the base corpus) — so snapshots v1 (build) and v2 (upsert) give
    observably different search results."""
    idx = copy_index["index"]
    eng = SearchEngine(spark, idx)
    assert eng.search("zanzibar")["count"] == 0
    mod = small_pdf.copy()
    victims = mod.index[[3, 50, 400]]
    for i, v in enumerate(victims):
        mod.loc[v, "text"] = f"replacement unique{i} zanzibar text"
    delta = spark.createDataFrame(mod.loc[victims], schema=TRANSCRIPTS)
    summary = eng.index_turns(delta)
    assert summary["snapshot_id"] == 2
    return {"index": idx, "engine": eng, "mod": mod}


def test_time_travel_reads_pre_upsert_state(upserted, spark):
    idx, eng = upserted["index"], upserted["engine"]
    assert eng.search("zanzibar")["count"] == 3  # live = post-upsert
    past = SearchEngine.at_snapshot(spark, idx, 1)
    assert past.search("zanzibar")["count"] == 0  # v1 = pre-upsert
    now = SearchEngine.at_snapshot(spark, idx, 2)
    assert now.search("zanzibar")["count"] == 3
    # table-level time travel too
    t1 = read_snapshot_tables(spark, idx, 1)
    t2 = read_snapshot_tables(spark, idx, 2)
    assert t1["docs"].count() == t2["docs"].count()  # updates, no inserts
    texts1 = {r["text"] for r in t1["docs"].collect()}
    assert not any("zanzibar" in t for t in texts1)


def test_time_travel_serving(upserted, spark):
    """QueryServer.at_snapshot: the serving session time-travels too —
    v1 serves the pre-upsert ranking (zanzibar unknown), v2/live serve
    the post-upsert one, across the local AND distributed venues, and a
    pinned-current server is immune to later commits. (Runs before the
    rollback/expire tests below, which rewrite the shared history.)"""
    from search_engine_spark.operators.serve import QueryServer

    idx = upserted["index"]
    past = QueryServer.at_snapshot(spark, idx, 1, cache_blocks=False)
    now = QueryServer.at_snapshot(spark, idx, None, cache_blocks=False)
    live = QueryServer(spark, idx, cache_blocks=False)
    assert past.search("zanzibar", k=10) == []
    got_now = now.search("zanzibar", k=10)
    assert got_now and got_now == live.search("zanzibar", k=10)
    # distributed venue over the snapshot tree answers identically
    past.local_df_budget = 0
    assert past.search("unique0", k=10) == []
    now.local_df_budget = 0
    assert now.search("zanzibar", k=10) == got_now


def test_snapshot_view_is_readonly(upserted, spark):
    past = SearchEngine.at_snapshot(spark, upserted["index"], 1)
    with pytest.raises(RuntimeError, match="read-only snapshot"):
        past.index_turns(None)
    with pytest.raises(RuntimeError, match="read-only snapshot"):
        past.rollback(1)


def test_rollback_restores_and_extends_history(upserted, spark):
    idx, eng = upserted["index"], upserted["engine"]
    m = eng.rollback(1)
    assert m["operation"] == "rollback(to=v1)" and m["snapshot_id"] == 3
    assert current_snapshot_id(idx) == 3
    # live state is the pre-upsert index again (engine was re-opened)
    assert eng.search("zanzibar")["count"] == 0
    # history is linear and never erased: v2 still time-travels
    assert SearchEngine.at_snapshot(spark, idx, 2).search("zanzibar")[
        "count"] == 3
    ops = [s["operation"] for s in list_snapshots(idx)]
    assert ops == ["build", "upsert", "rollback(to=v1)"]
    # roll FORWARD to the upsert state (pointer only moves forward)
    m2 = eng.rollback(2)
    assert m2["snapshot_id"] == 4
    assert eng.search("zanzibar")["count"] == 3


def test_expire_keeps_current_and_newest(upserted, spark):
    idx, eng = upserted["index"], upserted["engine"]
    expired = expire_snapshots(idx, keep_last=2)
    ids = [s["snapshot_id"] for s in list_snapshots(idx)]
    assert current_snapshot_id(idx) in ids
    assert len(ids) == 2 and set(expired) & set(ids) == set()
    # live reads are untouched by expiry (live files are their own links)
    assert eng.search("zanzibar")["count"] == 3


def test_manual_snapshot_and_crash_tmp_cleanup(spark, copy_index):
    idx = copy_index["index"]
    eng = SearchEngine(spark, idx)
    # simulate a crash mid-snapshot: a stale .tmp_v* must not block or
    # corrupt the next commit
    stale = os.path.join(idx, "snapshots", ".tmp_v99")
    os.makedirs(stale, exist_ok=True)
    with open(os.path.join(stale, "junk"), "w") as f:
        f.write("x")
    before = current_snapshot_id(idx)
    m = eng.snapshot(operation="manual")
    assert m["snapshot_id"] == (before or 0) + 1
    assert not os.path.exists(stale)
    with open(os.path.join(snapshot_dir(idx, m["snapshot_id"]),
                           "manifest.json")) as f:
        assert json.load(f)["operation"] == "manual"

