"""Snapshot CDC reader (operators/snapshots.py snapshot_diff): inserted /
updated / deleted docs between two snapshots, reading only the part-files
new in the target manifest plus bucket-pruned from-side rows."""

from __future__ import annotations

import pandas as pd
import pytest

from search_engine_spark.api import SearchEngine
from search_engine_spark.operators.snapshots import snapshot_diff
from search_engine_spark.schemas import TRANSCRIPTS


@pytest.fixture(scope="module")
def diffed(spark, small_pdf, copy_index):
    """v1 = build; v2 = upsert with 2 updated turns + 3 inserted turns
    of a brand-new conversation."""
    idx = copy_index["index"]
    eng = SearchEngine(spark, idx)
    mod = small_pdf.copy()
    victims = mod.index[[5, 77]]
    for i, v in enumerate(victims):
        mod.loc[v, "text"] = f"rewritten cdcprobe{i} text"
    new_rows = pd.DataFrame(
        {
            "conv_id": ["zz-cdc-new"] * 3,
            "turn_idx": [0, 1, 2],
            "role": ["user", "assistant", "user"],
            "text": ["cdc alpha", "cdc beta", "cdc gamma"],
            "tool": [None, None, None],
            "ts": pd.Series(
                [mod["ts"].max()] * 3, dtype="datetime64[us]"
            ),
        }
    )
    delta_pdf = pd.concat(
        [mod.loc[victims], new_rows], ignore_index=True
    )
    delta = spark.createDataFrame(delta_pdf, schema=TRANSCRIPTS)
    summary = eng.index_turns(delta)
    assert summary["snapshot_id"] == 2
    return {
        "index": idx,
        "victims": [
            (small_pdf.loc[v, "conv_id"], int(small_pdf.loc[v, "turn_idx"]))
            for v in victims
        ],
    }


def test_diff_reports_inserts_updates_no_deletes(spark, diffed):
    d = snapshot_diff(spark, diffed["index"], 1, 2)
    ins = d["inserted"].collect()
    assert sorted((r["conv_id"], r["turn_idx"]) for r in ins) == [
        ("zz-cdc-new", 0), ("zz-cdc-new", 1), ("zz-cdc-new", 2)
    ]
    assert {r["text"] for r in ins} == {"cdc alpha", "cdc beta", "cdc gamma"}
    upd = d["updated"].collect()
    assert sorted((r["conv_id"], r["turn_idx"]) for r in upd) == sorted(
        diffed["victims"]
    )
    assert all(r["text"].startswith("rewritten cdcprobe") for r in upd)
    assert d["deleted"].count() == 0


def test_diff_of_identical_snapshots_is_empty(spark, diffed):
    d = snapshot_diff(spark, diffed["index"], 2, 2)
    assert d["inserted"].count() == 0
    assert d["updated"].count() == 0
    assert d["deleted"].count() == 0


def test_diff_reads_only_changed_buckets(spark, diffed):
    """The update compare's from-side scan must be partition-pruned to
    the rewritten buckets (the manifest names the files — no full-table
    scan): the pushed plan filters on the bucket partition column."""
    d = snapshot_diff(spark, diffed["index"], 1, 2)
    plan = d["updated"]._jdf.queryExecution().executedPlan().toString()
    assert "bucket" in plan


def test_diff_rejects_unsnapshotted_index(spark, tmp_path):
    with pytest.raises((ValueError, FileNotFoundError)):
        snapshot_diff(spark, str(tmp_path), 1, None)
