"""Index merge (operators/merge.py): merging two builds equals a fresh
build over the concatenated corpus (docs/stats identical, search
rank-identical incl. doc ids — B's convs sort after A's so the two-level
id scheme assigns the same ids either way); guards; upsert-after-merge."""

from __future__ import annotations

import pandas as pd
import pytest

from oracle import oracle as orc


def _build(spark, pdf, out, tmp, name):
    from search_engine_spark.plans.job import IndexBuildJob

    corpus = f"{tmp}/{name}.parquet"
    pdf.to_parquet(corpus, index=False, row_group_size=512)
    IndexBuildJob(
        spark, corpus, out, n_buckets=2, docs_per_shard=256, run_id=name
    ).run()
    return corpus


@pytest.fixture(scope="module")
def merged(spark, tmp_path_factory):
    from search_engine_spark.operators.merge import merge_indexes
    from search_engine_spark.sources.corpus import generate_transcripts

    tmp = str(tmp_path_factory.mktemp("merge"))
    a = generate_transcripts(120, seed=1)
    b = generate_transcripts(80, seed=2)
    b = b.assign(conv_id="zz" + b["conv_id"])  # sorts after every A conv
    _build(spark, a, f"{tmp}/ia", tmp, "a")
    _build(spark, b, f"{tmp}/ib", tmp, "b")
    res = merge_indexes(spark, f"{tmp}/ia", f"{tmp}/ib", f"{tmp}/merged")
    both = pd.concat([a, b], ignore_index=True)
    _build(spark, both, f"{tmp}/fresh", tmp, "fresh")
    return {
        "tmp": tmp, "res": res, "both": both,
        "merged": f"{tmp}/merged", "fresh": f"{tmp}/fresh",
        "ia": f"{tmp}/ia",
    }


def test_verify_index_passes_on_merged(spark, merged):
    """The fsck audit holds on a MERGED index — shard ids are shifted
    (not formula-aligned), which the per-bucket hull check must accept."""
    from search_engine_spark.operators.maintenance import verify_index

    rep = verify_index(spark, merged["merged"])
    bad = {k: v for k, v in rep.items() if isinstance(v, dict) and not v["ok"]}
    assert rep["ok"], bad
    assert rep["shards"]["ok"] and rep["blocks"]["bad_shard"] == 0


def _rows(spark, path, cols, order):
    return [
        tuple(r[c] for c in cols)
        for r in spark.read.parquet(path).select(*cols).orderBy(*order).collect()
    ]


def test_merge_docs_and_stats_equal_fresh_build(spark, merged):
    cols = ["doc_id", "conv_id", "turn_idx", "role", "scope", "doc_len"]
    got = _rows(spark, f"{merged['merged']}/docs", cols, ["doc_id"])
    want = _rows(spark, f"{merged['fresh']}/docs", cols, ["doc_id"])
    assert got and got == want
    for fam, cols, order in (
        ("lemma_stats", ["scope", "lemma", "df", "cf"], ["scope", "lemma"]),
        ("doc_stats",
         ["scope", "n_docs", "avg_doc_len", "sum_doc_len"], ["scope"]),
    ):
        assert _rows(spark, f"{merged['merged']}/{fam}", cols, order) == \
            _rows(spark, f"{merged['fresh']}/{fam}", cols, order), fam


def test_merge_search_rank_identity(spark, merged):
    """Searches on the merged index are bit-identical to the oracle over
    the concatenated corpus — including doc ids — in AND and OR mode,
    for terms living in A, in B, and in both."""
    from search_engine_spark.operators.serve import QueryServer

    idx = orc.build_index(merged["both"])
    srv = QueryServer(spark, merged["merged"], cache_blocks=False)
    boundary = merged["res"]["doc_offset"]
    by_rarity = sorted(idx.postings, key=lambda t: len(idx.postings[t]))
    picks = []
    for t in by_rarity:
        ids = idx.postings[t]
        side = (
            "a" if max(ids) <= boundary
            else "b" if min(ids) > boundary
            else "both"
        )
        if side not in [s for s, _ in picks] and 1 < len(ids):
            picks.append((side, t))
        if len(picks) == 3:
            break
    assert {s for s, _ in picks} == {"a", "b", "both"}
    hit_b_side = False
    for side, term in picks:
        for combine in ("and", "or"):
            want = orc.search(idx, term, k=10, combine=combine)
            got = srv.search(term, k=10, combine=combine)
            assert got == want, (side, term, combine)
            assert want
        if side in ("b", "both"):
            hit_b_side = hit_b_side or any(
                d > boundary for d, _ in orc.search(idx, term, k=10)
            )
    assert hit_b_side  # remapped B blocks actually served results


def test_merge_guards(spark, merged, tmp_path):
    from search_engine_spark.operators.merge import merge_indexes

    with pytest.raises(ValueError, match="conv_id"):
        merge_indexes(
            spark, merged["ia"], merged["ia"], str(tmp_path / "dup")
        )
    with pytest.raises(ValueError, match="out_dir exists"):
        merge_indexes(
            spark, merged["ia"], merged["merged"], merged["merged"]
        )


def test_merge_many_matches_pairwise_and_fresh(spark, merged):
    """3-way merge_many: (a) a 2-way call is table-identical to the
    pairwise merge_indexes; (b) with a third index whose convs sort last,
    the 3-way result equals a fresh build over all three corpora."""
    from search_engine_spark.operators.merge import merge_many
    from search_engine_spark.sources.corpus import generate_transcripts

    tmp = merged["tmp"]
    res2 = merge_many(spark, [f"{tmp}/ia", f"{tmp}/ib"], f"{tmp}/m2")
    assert res2["n_indexes"] == 2
    for fam, cols, order in (
        ("docs", ["doc_id", "conv_id", "turn_idx", "doc_len"], ["doc_id"]),
        ("lemma_stats", ["scope", "lemma", "df", "cf"], ["scope", "lemma"]),
        ("conv_offsets", ["conv_id", "_n", "_conv_offset"], ["conv_id"]),
    ):
        assert _rows(spark, f"{tmp}/m2/{fam}", cols, order) == \
            _rows(spark, f"{merged['merged']}/{fam}", cols, order), fam

    c = generate_transcripts(40, seed=3)
    c = c.assign(conv_id="zzzz" + c["conv_id"])  # sorts after a AND b
    _build(spark, c, f"{tmp}/ic", tmp, "c")
    merge_many(
        spark, [f"{tmp}/ia", f"{tmp}/ib", f"{tmp}/ic"], f"{tmp}/m3"
    )
    both3 = pd.concat([merged["both"], c], ignore_index=True)
    _build(spark, both3, f"{tmp}/fresh3", tmp, "fresh3")
    cols = ["doc_id", "conv_id", "turn_idx", "scope", "doc_len"]
    assert _rows(spark, f"{tmp}/m3/docs", cols, ["doc_id"]) == \
        _rows(spark, f"{tmp}/fresh3/docs", cols, ["doc_id"])
    assert _rows(
        spark, f"{tmp}/m3/lemma_stats",
        ["scope", "lemma", "df", "cf"], ["scope", "lemma"],
    ) == _rows(
        spark, f"{tmp}/fresh3/lemma_stats",
        ["scope", "lemma", "df", "cf"], ["scope", "lemma"],
    )
    # a C-range doc is findable with the fresh build's exact score
    idx = orc.build_index(both3)
    from search_engine_spark.operators.serve import QueryServer

    srv = QueryServer(spark, f"{tmp}/m3", cache_blocks=False)
    c_lemma = sorted(
        idx.postings, key=lambda t: -min(idx.postings[t])
    )[0]
    want = orc.search(idx, c_lemma, k=5)
    assert want and srv.search(c_lemma, k=5) == want

    import pytest

    with pytest.raises(ValueError, match="more than one index"):
        merge_many(
            spark, [f"{tmp}/ia", f"{tmp}/ia"], f"{tmp}/mdup"
        )


def test_upsert_after_merge(spark, merged):
    """The merged index is a first-class index: an insert upsert lands
    (new turn in a B conversation, id appended past the merged max) and
    is findable."""
    import shutil

    from search_engine_spark.api import SearchEngine
    from search_engine_spark.operators.upsert import upsert_turns
    from search_engine_spark.plans.job import IndexBuildJob
    from search_engine_spark.schemas import TRANSCRIPTS

    dst = f"{merged['tmp']}/merged_upsert"
    shutil.copytree(merged["merged"], dst)
    conv = "zz" + merged["both"]["conv_id"].iloc[-1][2:]
    delta = spark.createDataFrame(
        pd.DataFrame(
            {
                "conv_id": [conv],
                "turn_idx": [99],
                "role": ["user"],
                "text": ["xenomorphic quasar"],
                "tool": [None],
                "ts": merged["both"]["ts"].iloc[-1:].reset_index(drop=True),
            }
        ),
        TRANSCRIPTS,
    )
    job = IndexBuildJob(spark, "unused", dst, run_id="merge-upsert")
    upsert_turns(job, delta)
    eng = SearchEngine(spark, dst)
    res = eng.search("xenomorphic")
    assert res["count"] == 1
    assert res["data"][0]["uri"] == f"{conv}#99"


def test_merge_after_upsert_insert(spark, merged):
    """Merging an index that received INSERT upserts: upsert_turns
    refreshes lineage n_turns and registers never-seen convs in
    conv_offsets, and merge derives doc offsets from the docs family
    itself — so merged ids stay unique and dense, the inserted docs
    survive the remap, and the disjointness guard sees inserted
    conversations."""
    import shutil

    from pyspark.sql import functions as F

    from search_engine_spark.api import SearchEngine
    from search_engine_spark.operators.merge import merge_indexes
    from search_engine_spark.operators.upsert import upsert_turns
    from search_engine_spark.plans.job import IndexBuildJob
    from search_engine_spark.schemas import TRANSCRIPTS

    tmp = merged["tmp"]
    a_up = f"{tmp}/ia_up"
    shutil.copytree(merged["ia"], a_up)
    a_pdf = merged["both"][~merged["both"]["conv_id"].str.startswith("zz")]
    exist_conv = a_pdf["conv_id"].iloc[0]
    ts = merged["both"]["ts"].iloc[0]
    delta = spark.createDataFrame(
        pd.DataFrame(
            {
                "conv_id": ["gg-inserted", "gg-inserted", exist_conv],
                "turn_idx": [0, 1, 999],
                "role": ["user"] * 3,
                "text": [
                    "quixotic zephyr", "quixotic again", "glottal probe"
                ],
                "tool": [None] * 3,
                "ts": [ts] * 3,
            }
        ),
        TRANSCRIPTS,
    )
    job = IndexBuildJob(spark, "unused", a_up, run_id="up-a")
    summary = upsert_turns(job, delta)
    assert summary["inserted_turns"] == 3

    # upsert refreshed the metadata merge depends on
    lin = {
        r["key"]: r["value"]
        for r in spark.read.parquet(f"{a_up}/lineage").collect()
    }
    max_a = int(
        spark.read.parquet(f"{a_up}/docs").agg(F.max("doc_id")).head()[0]
    )
    assert int(lin["n_turns"]) == max_a
    reg = (
        spark.read.parquet(f"{a_up}/conv_offsets")
        .filter(F.col("conv_id") == "gg-inserted")
        .collect()
    )
    assert len(reg) == 1 and reg[0]["_n"] == 2

    # merge after inserts: ids unique AND dense, inserted docs searchable
    out = f"{tmp}/merged_up"
    merge_indexes(spark, a_up, f"{tmp}/ib", out)
    docs = spark.read.parquet(f"{out}/docs")
    n = docs.count()
    assert docs.select("doc_id").distinct().count() == n
    assert int(docs.agg(F.max("doc_id")).head()[0]) == n
    # B's ids shifted past A's TRUE max (lineage n_turns pre-fix was 120)
    zz_min = int(
        docs.filter(F.col("conv_id").startswith("zz"))
        .agg(F.min("doc_id")).head()[0]
    )
    assert zz_min == max_a + 1
    res = SearchEngine(spark, out).search("quixotic")
    assert res["count"] == 2

    # the disjointness guard sees the INSERTED conversation. Pad the
    # probe corpus with fresh convs so its range_size lineage matches
    # a_up's (shard_spec saturates at docs_per_shard only for >=256
    # turns; a 1-row probe would trip the range_size guard first)
    from search_engine_spark.sources.corpus import generate_transcripts

    pad = generate_transcripts(120, seed=9)
    pad = pad.assign(conv_id="qq" + pad["conv_id"])
    over = pd.concat(
        [
            pad,
            pd.DataFrame(
                {
                    "conv_id": ["gg-inserted"],
                    "turn_idx": [5],
                    "role": ["user"],
                    "text": ["overlap probe"],
                    "tool": [None],
                    "ts": [ts],
                }
            ),
        ],
        ignore_index=True,
    )
    # µs precision: Spark cannot read parquet TIMESTAMP(NANOS)
    over["ts"] = over["ts"].astype("datetime64[us]")
    _build(spark, over, f"{tmp}/iover", tmp, "iover")
    with pytest.raises(ValueError, match="conv_id"):
        merge_indexes(spark, a_up, f"{tmp}/iover", f"{tmp}/mover")


def test_merge_moves_a_families_by_hardlink(merged):
    """A's data families land in the merged index as HARDLINKS (Iceberg
    manifest-move analog — zero bytes copied): every A part-file shares
    its inode with the merged copy, and _SUCCESS markers are fresh files
    (a committer may O_TRUNC them, which would reach through a link)."""
    import os

    ia, out = merged["ia"], merged["merged"]
    linked = checked = 0
    for fam in ("docs", "postings"):
        for root, _d, files in os.walk(f"{ia}/{fam}"):
            rel = os.path.relpath(root, f"{ia}/{fam}")
            for fn in files:
                src = os.path.join(root, fn)
                dst = os.path.join(f"{out}/{fam}", "" if rel == "." else rel, fn)
                assert os.path.exists(dst), dst
                checked += 1
                if fn == "_SUCCESS":
                    assert os.stat(dst).st_ino != os.stat(src).st_ino
                elif os.stat(dst).st_ino == os.stat(src).st_ino:
                    linked += 1
    assert checked > 2 and linked > 0, (checked, linked)
