"""Generate the pinned ranking goldens: tests/fixtures/queries.jsonl.

The reference ships no test data (no src/test/ in /root/reference), so
the "reference query-result fixtures" of the north rule are pinned HERE,
by the single-node oracle over the deterministic corpus (FIXTURES.md §3).
Checked into git; regenerate ONLY on a deliberate semantics change:

    python tools/gen_fixtures.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from oracle import oracle as orc
from search_engine_spark.sources.corpus import HOT_TERM, _build_vocab, generate_transcripts

N_CONVS = 300
SEED = 42

VOCAB = _build_vocab(np.random.default_rng(0))
RARE, MID, HOT2 = str(VOCAB[300]), str(VOCAB[30]), str(VOCAB[0])

# (qid, query, scope, k, offset, scorer, combine)
CASES = [
    ("q01_rare", RARE, None, 10, 0, "bm25", "and"),
    ("q02_hot_cutoff", HOT_TERM, None, 10, 0, "bm25", "and"),
    ("q03_conj_mixed", f"{HOT_TERM} {RARE}", None, 10, 0, "bm25", "and"),
    ("q04_conj_all_hot", f"{HOT_TERM} {HOT2}", None, 10, 0, "bm25", "and"),
    ("q05_absent", "zzqqxxunknown", None, 10, 0, "bm25", "and"),
    ("q06_yo_variant", "зелёный", None, 10, 0, "bm25", "and"),
    ("q07_particles_only", "the and of и в", None, 10, 0, "bm25", "and"),
    ("q08_scoped", MID, "scope-1", 10, 0, "bm25", "and"),
    ("q08b_global", MID, None, 10, 0, "bm25", "and"),
    ("q09_paginated", MID, None, 5, 5, "bm25", "and"),
    ("q10_k_gt_matches", RARE, None, 100, 0, "bm25", "and"),
    ("q11_multi3", f"{MID} {VOCAB[40]} {VOCAB[50]}", None, 10, 0, "bm25", "and"),
    ("r01_reftf_rare", RARE, None, 10, 0, "reftf", "and"),
    ("r02_reftf_conj", f"{HOT_TERM} {RARE}", None, 10, 0, "reftf", "and"),
    ("r03_reftf_scoped", MID, "scope-1", 10, 0, "reftf", "and"),
]


def _or_cases(idx) -> list[tuple]:
    """Disjunctive (weak-AND result set) cases. OR mode DROPS any term
    with df above the 5% cutoff, so the interesting queries need
    under-cutoff terms — selected deterministically by measured df."""
    from search_engine_spark.functions.analyze import query_lemmas
    from search_engine_spark.functions.scoring import df_cutoff

    def df_of(word: str, scope=None) -> int:
        terms = query_lemmas(word)
        return orc._df_of(idx, terms[0], scope) if terms else 0

    n = len(idx.doc_len)
    under = [str(w) for w in VOCAB if 0 < df_of(str(w)) <= df_cutoff(n) * 0.9]
    t1, t2, t3 = under[0], under[1], under[2]
    sc = "scope-2"
    sc_cut = df_cutoff(len(idx.scope_docs[sc]))
    sc_terms = [w for w in under if 0 < df_of(w, sc) <= sc_cut * 0.9]
    return [
        ("o01_or_two_rare", f"{t1} {t2}", None, 10, 0, "bm25", "or"),
        ("o02_or_hot_dropped", f"{HOT_TERM} {t1}", None, 10, 0, "bm25", "or"),
        ("o03_or_scoped", f"{sc_terms[0]} {sc_terms[1]}", sc, 10, 0, "bm25", "or"),
        ("o04_or_all_dropped", HOT_TERM, None, 10, 0, "bm25", "or"),
        ("o05_or_paginated", f"{t1} {t2}", None, 5, 5, "bm25", "or"),
        ("o06_or_multi3", f"{t1} {t2} {t3}", None, 10, 0, "bm25", "or"),
    ]


def main() -> None:
    idx = orc.build_index(generate_transcripts(N_CONVS, seed=SEED))
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "fixtures", "queries.jsonl",
    )
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    all_cases = CASES + _or_cases(idx)
    with open(out_path, "w") as f:
        for qid, query, scope, k, offset, scorer, combine in all_cases:
            expected = [
                {"doc_id": d, "score": s}
                for d, s in orc.search(
                    idx, query, scope=scope, k=k, offset=offset,
                    scorer=scorer, combine=combine,
                )
            ]
            record = {
                "qid": qid, "query": query, "scope": scope,
                "k": k, "offset": offset, "scorer": scorer,
                "corpus": {"n_convs": N_CONVS, "seed": SEED},
                "expected": expected,
            }
            if combine != "and":  # keep pre-existing lines byte-identical
                record["combine"] = combine
            f.write(json.dumps(record, ensure_ascii=False) + "\n")
    print(f"wrote {len(all_cases)} goldens to {out_path}")


if __name__ == "__main__":
    main()
