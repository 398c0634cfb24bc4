"""QueryServer.refresh(): a long-lived server picks up an external
index mutation (upsert) on the explicit epoch switch — results equal a
freshly opened server and the oracle over the mutated corpus; until
refresh it keeps serving the opened epoch consistently."""

from __future__ import annotations

import shutil

import pandas as pd
import pytest

from oracle import oracle as orc
from search_engine_spark.operators.serve import QueryServer
from search_engine_spark.schemas import TRANSCRIPTS


@pytest.fixture()
def copy_index(base_index_dir, tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("idxsrv") / "idx")
    shutil.copytree(base_index_dir["index"], dst)
    return {"corpus": base_index_dir["corpus"], "index": dst}


def test_refresh_switches_epochs(spark, small_pdf, copy_index, oracle_idx):
    from search_engine_spark.operators.upsert import upsert_turns
    from search_engine_spark.plans.job import IndexBuildJob

    srv = QueryServer(spark, copy_index["index"], cache_blocks=False)
    # pick an under-cutoff mid lemma so both epochs return rows
    from search_engine_spark.functions.scoring import df_cutoff

    n_docs = sum(r["n_docs"] for r in srv._scope_rows)
    cut = df_cutoff(n_docs)
    gdf: dict[str, int] = {}
    for (s, l), v in srv._dfs.items():
        gdf[l] = gdf.get(l, 0) + v
    lemma = sorted(l for l, v in gdf.items() if 5 <= v <= cut // 2)[0]
    before = srv.search(lemma, k=10)
    assert before == [
        (d, s) for d, s in orc.search(oracle_idx, lemma, k=10)
    ]

    # mutate: insert two fresh turns that CONTAIN the probe lemma
    proto = small_pdf.iloc[0]
    delta = pd.DataFrame(
        [
            {
                "conv_id": "zzzz-refresh", "turn_idx": i, "role": "user",
                "text": f"{lemma} refresh probe {i}", "tool": proto["tool"],
                "ts": proto["ts"],
            }
            for i in range(2)
        ]
    )
    job = IndexBuildJob(
        spark, copy_index["corpus"], copy_index["index"],
        n_buckets=4, docs_per_shard=256, run_id="base",
    )
    summary = upsert_turns(job, spark.createDataFrame(delta, schema=TRANSCRIPTS))
    assert summary["inserted_turns"] == 2

    # oracle over the mutated corpus
    mut = pd.concat([small_pdf, delta], ignore_index=True)
    idx2 = orc.build_index(mut.sort_values(["conv_id", "turn_idx"]))
    exp2 = [(d, s) for d, s in orc.search(idx2, lemma, k=10)]
    assert exp2 != before  # the mutation is visible in the ranking

    srv.refresh()
    assert srv.search(lemma, k=10) == exp2
    fresh = QueryServer(spark, copy_index["index"], cache_blocks=False)
    assert fresh.search(lemma, k=10) == exp2
    # caches were really dropped and rebuilt
    assert srv._block_cache is not fresh._block_cache
    assert srv.search_prf(lemma, k=5) == fresh.search_prf(lemma, k=5)
