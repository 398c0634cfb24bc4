"""Trained language-ID: the Spark profile trainer matches the pure
Python twin bit-for-bit on the seed corpus (pinned count-desc/gram-asc
ranking), and the trained profiles actually identify languages —
held-out accuracy is asserted, which the hand-picked stand-in lists
never had."""

from __future__ import annotations

import pytest

from search_engine_spark.functions.langdata import (
    HELDOUT_SENTENCES,
    TRAIN_SENTENCES,
    TRAINED_LANG_PROFILES,
    train_profiles_py,
)


def test_train_corpus_shape():
    assert sorted(TRAIN_SENTENCES) == sorted(HELDOUT_SENTENCES)
    assert len(TRAIN_SENTENCES) == 10
    for lang, sents in TRAIN_SENTENCES.items():
        assert len(sents) >= 10, lang
        assert len(HELDOUT_SENTENCES[lang]) >= 4, lang
    for lang, prof in TRAINED_LANG_PROFILES.items():
        assert len(prof) == 40, lang
        assert len(set(prof)) == 40, lang  # distinct grams per language


def test_spark_trainer_matches_python_twin(spark):
    from search_engine_spark.operators.text import (
        profiles_from_table,
        train_lang_profiles,
    )

    rows = [
        (lang, s)
        for lang, sents in TRAIN_SENTENCES.items()
        for s in sents
    ]
    docs = spark.createDataFrame(rows, "lang string, text string")
    got = profiles_from_table(
        train_lang_profiles(docs, n_top=40).collect()
    )
    assert got == train_profiles_py(TRAIN_SENTENCES, n_top=40)
    assert got == TRAINED_LANG_PROFILES


def test_heldout_accuracy(spark):
    """The trained profiles identify HELD-OUT sentences: ≥ 90% overall
    accuracy, and every language gets at least one sentence right."""
    from search_engine_spark.operators.text import lang_id_ngram

    rows = [
        (i, lang, s)
        for i, (lang, s) in enumerate(
            (lang, s)
            for lang in sorted(HELDOUT_SENTENCES)
            for s in HELDOUT_SENTENCES[lang]
        )
    ]
    docs = spark.createDataFrame(rows, "doc_id long, want string, text string")
    got = {
        r["doc_id"]: r["lang"]
        for r in lang_id_ngram(docs).collect()
    }
    want = {i: lang for i, lang, _ in rows}
    hits_by_lang: dict[str, int] = {}
    correct = 0
    for i, lang in want.items():
        ok = got[i] == lang
        correct += ok
        hits_by_lang[lang] = hits_by_lang.get(lang, 0) + ok
    acc = correct / len(want)
    assert acc >= 0.9, (acc, {i: (want[i], got[i]) for i in want
                              if got[i] != want[i]})
    assert all(hits_by_lang.get(lang, 0) >= 1 for lang in HELDOUT_SENTENCES)


def test_trainer_duckdb_twin():
    """train_lang_profiles_oracle_sql replays the exact ranking on the
    same seed corpus in DuckDB — the cross-engine pin behind the
    ``lang_profiles`` contract twin."""
    import duckdb

    from search_engine_spark.operators.text import (
        train_lang_profiles_oracle_sql,
    )

    con = duckdb.connect()
    vals = ", ".join(
        "('{}', '{}')".format(lang, s.replace("'", "''"))
        for lang, sents in sorted(TRAIN_SENTENCES.items())
        for s in sents
    )
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM (VALUES {vals}) "
        "t(lang, text)"
    )
    got: dict[str, list[tuple[int, str]]] = {}
    for lang, tg, rank, _cnt in con.sql(
        train_lang_profiles_oracle_sql(n_top=40)
    ).fetchall():
        got.setdefault(lang, []).append((rank, tg))
    table = {
        lang: [tg for _, tg in sorted(pairs)]
        for lang, pairs in got.items()
    }
    assert table == TRAINED_LANG_PROFILES


def test_pipeline_twin_and_heldout_accuracy(spark):
    """lang_id_pipeline (train-then-score, one composed plan, no driver
    collect): DuckDB twin bit-identical, and scoring the HELD-OUT
    sentences with profiles trained on the train split stays >= 90%
    accurate — the same bar as the collected-profile path."""
    import duckdb
    import pandas as pd

    from search_engine_spark.operators.text import (
        lang_id_pipeline,
        lang_id_pipeline_oracle_sql,
    )

    train_pdf = pd.DataFrame(
        [(lang, s) for lang, ss in TRAIN_SENTENCES.items() for s in ss],
        columns=["lang", "text"],
    )
    held = [
        (i, lang, s)
        for i, (lang, s) in enumerate(
            (lang, s)
            for lang in sorted(HELDOUT_SENTENCES)
            for s in HELDOUT_SENTENCES[lang]
        )
    ]
    corpus_pdf = pd.DataFrame(held, columns=["doc_id", "true_lang", "text"])

    labeled = spark.createDataFrame(train_pdf)
    corpus = spark.createDataFrame(corpus_pdf[["doc_id", "text"]])
    got = (
        lang_id_pipeline(labeled, corpus, n_top=40)
        .orderBy("doc_id").toPandas().reset_index(drop=True)
    )

    con = duckdb.connect()
    con.register("train_t", train_pdf)
    con.register("corpus_t", corpus_pdf[["doc_id", "text"]])
    want = con.execute(
        lang_id_pipeline_oracle_sql(
            n_top=40, labeled_table="train_t", corpus_table="corpus_t"
        )
        + " ORDER BY doc_id"
    ).df().reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    acc = (got.lang == corpus_pdf.true_lang).mean()
    assert acc >= 0.9, acc
