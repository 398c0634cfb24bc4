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

CASES = [
    ("q01_rare", RARE, None, 10, 0, "bm25"),
    ("q02_hot_cutoff", HOT_TERM, None, 10, 0, "bm25"),
    ("q03_conj_mixed", f"{HOT_TERM} {RARE}", None, 10, 0, "bm25"),
    ("q04_conj_all_hot", f"{HOT_TERM} {HOT2}", None, 10, 0, "bm25"),
    ("q05_absent", "zzqqxxunknown", None, 10, 0, "bm25"),
    ("q06_yo_variant", "зелёный", None, 10, 0, "bm25"),
    ("q07_particles_only", "the and of и в", None, 10, 0, "bm25"),
    ("q08_scoped", MID, "scope-1", 10, 0, "bm25"),
    ("q08b_global", MID, None, 10, 0, "bm25"),
    ("q09_paginated", MID, None, 5, 5, "bm25"),
    ("q10_k_gt_matches", RARE, None, 100, 0, "bm25"),
    ("q11_multi3", f"{MID} {VOCAB[40]} {VOCAB[50]}", None, 10, 0, "bm25"),
    ("r01_reftf_rare", RARE, None, 10, 0, "reftf"),
    ("r02_reftf_conj", f"{HOT_TERM} {RARE}", None, 10, 0, "reftf"),
    ("r03_reftf_scoped", MID, "scope-1", 10, 0, "reftf"),
]


def main() -> None:
    idx = orc.build_index(generate_transcripts(N_CONVS, seed=SEED))
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "fixtures", "queries.jsonl",
    )
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        for qid, query, scope, k, offset, scorer in CASES:
            expected = [
                {"doc_id": d, "score": s}
                for d, s in orc.search(
                    idx, query, scope=scope, k=k, offset=offset, scorer=scorer
                )
            ]
            f.write(
                json.dumps(
                    {
                        "qid": qid, "query": query, "scope": scope,
                        "k": k, "offset": offset, "scorer": scorer,
                        "corpus": {"n_convs": N_CONVS, "seed": SEED},
                        "expected": expected,
                    },
                    ensure_ascii=False,
                )
                + "\n"
            )
    print(f"wrote {len(CASES)} goldens to {out_path}")


if __name__ == "__main__":
    main()
