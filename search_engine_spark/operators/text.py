"""Text-analysis operators: n-gram language-ID, quality scoring, token
counting, document fingerprinting — the training-data text suite as a
public library API (contract.py's twins call these).

Everything is NATIVE Catalyst (higher-order functions + one broadcast
profile join) — no Python in the row path; the trigram explode is the
only row inflation and it is inherent to character-n-gram analysis.

Language-ID: classic character-n-gram profile scoring (Cavnar & Trenkle
"N-Gram-Based Text Categorization"), bigram+trigram mix. The default
profile table is TRAINED (``functions/langdata.py``): per language, the
top-40 most frequent character n-grams of a deterministic multilingual
seed corpus (10 languages incl. Cyrillic — lower() handles non-Latin
scripts natively), ranked (count desc, gram asc); held-out accuracy is
asserted in tests/test_langid.py. ``train_lang_profiles`` is the Spark
trainer for building such a table from any labeled corpus at scale
(identical ranking pins — parity-tested against the pure-Python twin).
The legacy hand-picked stand-in lists remain as ``LANG_PROFILES``. On
the synthetic contract corpus the ``lang`` column is an independent
random label (the text is English-ish word soup for every label), so
accuracy against it is not a meaningful target there — the contract
verifies ENGINE PARITY (Spark == DuckDB) of the scoring shape and of
the trainer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# pinned n-gram profiles (lowercase; trigrams may be space-padded for
# word boundaries) — common character bigrams + trigrams of each
# language, public knowledge (Cavnar & Trenkle profiles mix n=1..5; this
# 2+3 mix keeps row inflation bounded while bigrams add robustness on
# short texts where few trigrams fire)
LANG_PROFILES: dict[str, list[str]] = {
    "de": [" de", "der", "er ", "ie ", " di", "die", "sch", "ein", "ich",
           "nde", "en ", "ch ", "cht", "und", " un", "nd ", "ung", "ng ",
           "ten", "ber",
           "en", "er", "ch", "de", "ei", "nd", "te", "in", "ie", "ge"],
    "en": [" th", "the", "he ", " an", "and", "nd ", "ing", "ng ", " of",
           "of ", " to", "to ", "ion", " in", "in ", "ed ", " co", "er ",
           "es ", "ati",
           "th", "he", "in", "er", "an", "re", "on", "at", "en", "nd"],
    "es": [" de", "de ", " la", "la ", "os ", " el", "el ", "ión", "ció",
           "aci", "es ", " en", "en ", "as ", " qu", "que", "ue ", "ar ",
           " co", "nte",
           "de", "en", "el", "la", "os", "es", "ar", "ue", "ra", "al"],
    "fr": [" de", "de ", " le", "le ", "es ", "ent", "nt ", " la", "la ",
           "ion", "on ", "re ", " et", "et ", " pa", "ait", "que", " qu",
           "ue ", "eur",
           "es", "le", "de", "en", "re", "nt", "on", "er", "te", "an"],
    "it": [" di", "di ", "che", " ch", "to ", "la ", " la", "ere", "zio",
           "ion", "ne ", "are", "ta ", "el ", "con", " co", "per", " pe",
           "ent", "del",
           "di", "la", "to", "re", "er", "on", "ch", "co", "en", "le"],
    "nl": [" de", "de ", "en ", "et ", " he", "het", "van", " va", "an ",
           "een", " ee", "er ", "ing", "ng ", "der", "den", "ver", " ge",
           "aar", "oor",
           "en", "de", "er", "et", "an", "ge", "ij", "aa", "oo", "te"],
    "pt": [" de", "de ", "os ", "ão ", "ção", "açã", " co", "es ", "ent",
           " qu", "que", "ue ", "da ", " da", "do ", " do", "ar ", "nte",
           "ra ", "as ",
           "de", "os", "ar", "es", "ra", "en", "co", "do", "da", "nt"],
    "ru": [" пр", " на", " по", " не", "ого", "го ", "ени", "ние", "ие ",
           "ост", "сти", "ств", "ать", "ть ", "ет ", "ия ", " ст", "ово",
           "ой ", "льн",
           "ст", "но", "то", "на", "ен", "ов", "ни", "ра", "ко", "ро"],
    "pl": ["nie", " ni", "ie ", " po", "prz", "rze", "ych", "ch ", " pr",
           "owa", "ego", "go ", "ani", "cze", " za", "ej ", "ia ", "sta",
           " je", "dzi",
           "ie", "ni", "po", "rz", "na", "cz", "st", "ow", "ej", "sz"],
    "sv": [" de", "det", "et ", "en ", " oc", "och", "ch ", " at", "att",
           "tt ", "för", " fö", "ar ", "ing", "ng ", "er ", "som", " so",
           " ha", "de ",
           "en", "er", "ar", "de", "tt", "an", "et", "st", "om", "ör"],
}

# NB: guard the short-text case explicitly — Spark's sequence(1, 0) is a
# DESCENDING [1, 0], not empty
_TRIGRAMS_SQL = (
    "case when length(_lt) >= 3 then "
    "transform(sequence(1, length(_lt) - 2), i -> substring(_lt, i, 3)) "
    "else array() end"
)
_BIGRAMS_SQL = (
    "case when length(_lt) >= 2 then "
    "transform(sequence(1, length(_lt) - 1), i -> substring(_lt, i, 2)) "
    "else array() end"
)
_NGRAMS_SQL = f"concat({_BIGRAMS_SQL}, {_TRIGRAMS_SQL})"


def _profile_gram_tables(profiles: dict[str, list[str]], langs: list[str]):
    """Encode the profile grams as two sorted int64 key tables (bigrams
    and trigrams kept in SEPARATE key spaces so a 2-gram key can never
    collide with a 3-gram key) plus CSR lang-index lists — a gram shared
    by several languages' profiles credits each of them, exactly like
    the old per-(tg, lang) broadcast-join rows did.

    Key encoding: code points (< 2^21) packed big-endian, 21 bits each —
    a trigram key tops out below 2^63, so everything stays int64."""
    import numpy as np

    by_len: dict[int, dict[int, list[int]]] = {2: {}, 3: {}}
    for li, lang in enumerate(langs):
        for tg in profiles[lang]:
            cs = [ord(c) for c in tg]
            if len(cs) not in by_len:
                raise ValueError(
                    f"profile gram {tg!r} has length {len(cs)}; only "
                    "bigrams and trigrams are supported"
                )
            key = 0
            for c in cs:
                key = (key << 21) | c
            by_len[len(cs)].setdefault(key, []).append(li)
    tables = {}
    for n in (2, 3):
        items = sorted(by_len[n].items())
        keys = np.array([k for k, _ in items], dtype=np.int64)
        nl = np.array([len(v) for _, v in items], dtype=np.int64)
        starts = np.concatenate(
            [np.zeros(1, dtype=np.int64), np.cumsum(nl)]
        )
        flat = np.array(
            [li for _, v in items for li in v], dtype=np.int64
        )
        tables[n] = (keys, starts, nl, flat)
    return tables


def lang_id_ngram(
    docs: DataFrame,
    profiles: dict[str, list[str]] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, lang, match_ratio): per doc, the profile language whose
    n-gram list (bigrams + trigrams) matches the largest share of the
    doc's character n-grams; ties go to the lexicographically smaller
    language (encoded as a unique argmax key so both engines break ties
    identically); docs with no profile match (or fewer than 2 chars) →
    ('und', 0.0).

    Plan shape (round 4 — the counting-kernel rewrite the round-3
    verdict asked for): lower() Spark-side, then ONE narrow Arrow
    ``mapInPandas`` pass that counts overlapping profile-gram hits per
    (doc, lang) with NumPy — the whole batch's texts are concatenated
    into a single code-point array, sliding bigram/trigram windows are
    packed into int64 keys (windows crossing doc boundaries masked out),
    matched against the sorted profile key table via searchsorted, and
    accumulated with one bincount. No explode (the old plan multiplied
    row count by ~2× characters), no join, NO SHUFFLE: scan → map. The
    DuckDB twin (``lang_id_oracle_sql``) is byte-identical to round 3 —
    the contract hash-match is the proof the plans agree.

    Pins shared with the twin: match counts include OVERLAPPING
    occurrences (sliding windows, multiplicity kept); argmax key =
    cnt·(|langs|+1) − lang_idx (1-based, langs sorted); ratio =
    round6(cnt / total n-grams) — HALF_UP via functions/rounding."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from search_engine_spark.functions.rounding import round6

    if profiles is None:
        from search_engine_spark.functions.langdata import (
            TRAINED_LANG_PROFILES,
        )

        profiles = TRAINED_LANG_PROFILES
    langs = sorted(profiles)
    n_langs = len(langs)
    tables = _profile_gram_tables(profiles, langs)
    langs_arr = np.array(langs + ["und"], dtype=object)

    def _accumulate(cnts, doc_of_gram, gram_keys, table):
        keys, starts, nl, flat = table
        if len(keys) == 0 or len(gram_keys) == 0:
            return
        pos = np.searchsorted(keys, gram_keys)
        pos_c = np.minimum(pos, len(keys) - 1)
        ok = (pos < len(keys)) & (keys[pos_c] == gram_keys)
        ki = pos_c[ok]
        nk = nl[ki]
        total = int(nk.sum())
        if total == 0:
            return
        # ragged gather: for each matched gram, the slice of lang
        # indices flat[starts[ki] : starts[ki]+nk]
        cum = np.cumsum(nk)
        within = np.arange(total, dtype=np.int64) - np.repeat(cum - nk, nk)
        lang_e = flat[np.repeat(starts[ki], nk) + within]
        doc_e = np.repeat(doc_of_gram[ok], nk)
        cnts += np.bincount(
            doc_e * n_langs + lang_e, minlength=cnts.size
        ).reshape(cnts.shape)

    def run(batches):
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            texts = pdf["_lt"].fillna("").tolist()
            lens = np.fromiter(
                (len(t) for t in texts), dtype=np.int64, count=n
            )
            codes = np.frombuffer(
                "".join(texts).encode("utf-32-le"), dtype="<u4"
            ).astype(np.int64)
            docidx = np.repeat(np.arange(n, dtype=np.int64), lens)
            totals = np.maximum(lens - 1, 0) + np.maximum(lens - 2, 0)
            cnts = np.zeros((n, n_langs), dtype=np.int64)
            if len(codes) >= 2:
                k2 = (codes[:-1] << 21) | codes[1:]
                m2 = docidx[:-1] == docidx[1:]
                _accumulate(cnts, docidx[:-1][m2], k2[m2], tables[2])
            if len(codes) >= 3:
                k3 = (codes[:-2] << 42) | (codes[1:-1] << 21) | codes[2:]
                m3 = docidx[:-2] == docidx[2:]
                _accumulate(cnts, docidx[:-2][m3], k3[m3], tables[3])
            # unique argmax key: count dominates, lower lang index wins
            # ties; any cnt>0 key is ≥ 1 > every cnt==0 key (negative)
            key_mat = cnts * (n_langs + 1) - np.arange(
                1, n_langs + 1, dtype=np.int64
            )
            best = np.argmax(key_mat, axis=1)
            bc = cnts[np.arange(n), best]
            ratio = round6(bc / np.maximum(totals, 1).astype(np.float64))
            ratio[bc == 0] = 0.0
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "lang": langs_arr[np.where(bc > 0, best, n_langs)],
                    "match_ratio": ratio,
                }
            )

    base = docs.select(
        F.col(id_col), F.lower(F.col(text_col)).alias("_lt")
    )
    schema = T.StructType(
        [
            docs.schema[id_col],
            T.StructField("lang", T.StringType(), False),
            T.StructField("match_ratio", T.DoubleType(), False),
        ]
    )
    return base.mapInPandas(run, schema=schema)


def lang_id_oracle_sql(profiles: dict[str, list[str]] | None = None) -> str:
    """DuckDB twin of ``lang_id_ngram`` over the ``documents`` view."""
    if profiles is None:
        from search_engine_spark.functions.langdata import (
            TRAINED_LANG_PROFILES,
        )

        profiles = TRAINED_LANG_PROFILES
    langs = sorted(profiles)
    values = ", ".join(
        "('{}', '{}', {})".format(lang, tg.replace("'", "''"), i + 1)
        for i, lang in enumerate(langs)
        for tg in profiles[lang]
    )
    n = len(langs) + 1
    return f"""
        WITH prof(lang, tg, idx) AS (VALUES {values}),
        base AS (SELECT doc_id, lower(text) AS _lt FROM documents),
        tgs AS (
            SELECT doc_id, substr(_lt, i, 2) AS tg
            FROM base, (SELECT unnest(range(1, length(_lt))) AS i)
            WHERE length(_lt) >= 2
            UNION ALL
            SELECT doc_id, substr(_lt, i, 3) AS tg
            FROM base, (SELECT unnest(range(1, length(_lt) - 1)) AS i)
            WHERE length(_lt) >= 3),
        totals AS (SELECT doc_id, count(*) AS _total FROM tgs GROUP BY doc_id),
        counts AS (
            SELECT doc_id, lang, min(idx) AS idx, count(*) AS _cnt
            FROM tgs JOIN prof USING (tg) GROUP BY doc_id, lang),
        best AS (
            SELECT doc_id, arg_max(lang, _cnt * {n} - idx) AS lang,
                   max(_cnt * {n} - idx) AS _key, arg_max(_cnt, _cnt * {n} - idx) AS _cnt
            FROM counts GROUP BY doc_id)
        SELECT d.doc_id,
               coalesce(best.lang, 'und') AS lang,
               round(coalesce(best._cnt::DOUBLE / totals._total, 0.0), 6)
                   AS match_ratio
        FROM documents d
        LEFT JOIN best USING (doc_id)
        LEFT JOIN totals USING (doc_id)
    """


def train_lang_profiles(
    docs: DataFrame,
    lang_col: str = "lang",
    text_col: str = "text",
    n_top: int = 40,
) -> DataFrame:
    """(lang, tg, rank, cnt): per language label, the ``n_top`` most
    frequent character n-grams (bigrams + trigrams of the lowercased
    text) — the Cavnar & Trenkle profile TRAINER, producing exactly the
    table ``lang_id_ngram`` consumes (``{lang: [tg for rank asc]}``).

    Pins (shared with ``functions/langdata.py train_profiles_py`` and
    the DuckDB twin): integer counts only; rank = row_number under
    (cnt desc, tg asc) per language.

    Plan shape: n-gram explode → (lang, tg) hash count (partial aggs
    map-side; the post-shuffle state is VOCABULARY-sized — n-gram
    vocabulary is bounded by |charset|³, not corpus size) → top-n_top
    per language via a window partitioned by lang over that tiny
    aggregate. A 100-TB labeled corpus costs one narrow scan + one
    bounded-state aggregation."""
    from pyspark.sql import Window

    base = docs.select(
        F.col(lang_col).alias("lang"), F.lower(F.col(text_col)).alias("_lt")
    )
    tgs = base.select("lang", F.explode(F.expr(_NGRAMS_SQL)).alias("tg"))
    counts = tgs.groupBy("lang", "tg").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("lang").orderBy(F.desc("cnt"), F.asc("tg"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= int(n_top))
        .select("lang", "tg", "rank", "cnt")
    )


def lang_id_pipeline(
    labeled: DataFrame,
    corpus: DataFrame,
    lang_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    corpus_text_col: str = "text",
    n_top: int = 40,
) -> DataFrame:
    """Train-then-score language ID as ONE distributed pipeline
    (CLAUDE.md round-4 candidate (c)): ``train_lang_profiles`` over the
    labeled frame feeds the scorer directly as a DataFrame — the
    profile table never collects to the driver, so the composed plan is
    scan(labeled) → bounded profile agg → broadcast → scan(corpus) →
    n-gram counts → argmax. Returns (id_col, lang, match_ratio) like
    ``lang_id_ngram``.

    Argmax pin (simpler than lang_id_ngram's index-free twin): best =
    ``min(struct(-cnt, lang))`` — struct comparison is field-order in
    BOTH engines, so max count wins and ties go to the lexicographically
    smaller language; integers only until the one final round6 ratio.
    Docs with no profile match → ('und', 0.0)."""
    prof = train_lang_profiles(labeled, lang_col, text_col, n_top).select(
        "lang", "tg"
    )
    base = corpus.select(
        F.col(id_col), F.lower(F.col(corpus_text_col)).alias("_lt")
    )
    tgs = base.select(id_col, F.explode(F.expr(_NGRAMS_SQL)).alias("tg"))
    totals = tgs.groupBy(id_col).agg(F.count("*").alias("_total"))
    counts = (
        tgs.join(F.broadcast(prof), "tg")
        .groupBy(id_col, "lang")
        .agg(F.count("*").alias("_cnt"))
    )
    best = counts.groupBy(id_col).agg(
        F.min(
            F.struct(
                (-F.col("_cnt")).alias("nc"), F.col("lang").alias("lg")
            )
        ).alias("_b")
    )
    return (
        corpus.select(id_col)
        .join(best, id_col, "left")
        .join(totals, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("_b.lg"), F.lit("und")).alias("lang"),
            F.round(
                F.coalesce(
                    (-F.col("_b.nc")).cast("double") / F.col("_total"),
                    F.lit(0.0),
                ),
                6,
            ).alias("match_ratio"),
        )
    )


def lang_id_pipeline_oracle_sql(
    n_top: int = 40,
    labeled_table: str = "documents",
    corpus_table: str = "documents",
    lang_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    corpus_text_col: str = "text",
) -> str:
    """DuckDB twin of ``lang_id_pipeline`` — same trainer CTEs, same
    struct-min argmax (DuckDB struct comparison is field-order too)."""
    return f"""
        WITH base_l AS (
            SELECT {lang_col} AS lang, lower({text_col}) AS _lt
            FROM {labeled_table}),
        tgs_l AS (
            SELECT lang, substr(_lt, i, 2) AS tg
            FROM base_l, (SELECT unnest(range(1, length(_lt))) AS i)
            WHERE length(_lt) >= 2
            UNION ALL
            SELECT lang, substr(_lt, i, 3) AS tg
            FROM base_l, (SELECT unnest(range(1, length(_lt) - 1)) AS i)
            WHERE length(_lt) >= 3),
        counts_l AS (
            SELECT lang, tg, count(*) AS cnt FROM tgs_l GROUP BY lang, tg),
        prof AS (
            SELECT lang, tg FROM counts_l
            QUALIFY row_number() OVER (
                PARTITION BY lang ORDER BY cnt DESC, tg) <= {int(n_top)}),
        base AS (
            SELECT {id_col}, lower({corpus_text_col}) AS _lt
            FROM {corpus_table}),
        tgs AS (
            SELECT {id_col}, substr(_lt, i, 2) AS tg
            FROM base, (SELECT unnest(range(1, length(_lt))) AS i)
            WHERE length(_lt) >= 2
            UNION ALL
            SELECT {id_col}, substr(_lt, i, 3) AS tg
            FROM base, (SELECT unnest(range(1, length(_lt) - 1)) AS i)
            WHERE length(_lt) >= 3),
        totals AS (
            SELECT {id_col}, count(*) AS _total FROM tgs GROUP BY {id_col}),
        counts AS (
            SELECT {id_col}, lang, count(*) AS _cnt
            FROM tgs JOIN prof USING (tg) GROUP BY {id_col}, lang),
        best AS (
            SELECT {id_col}, min({{'nc': -_cnt, 'lg': lang}}) AS b
            FROM counts GROUP BY {id_col})
        SELECT d.{id_col},
               coalesce(b.lg, 'und') AS lang,
               round(coalesce((-b.nc)::DOUBLE / totals._total, 0.0), 6)
                   AS match_ratio
        FROM {corpus_table} d
        LEFT JOIN best USING ({id_col})
        LEFT JOIN totals USING ({id_col})
    """


def profiles_from_table(rows) -> dict[str, list[str]]:
    """Collected ``train_lang_profiles`` rows → the ``{lang: [tg]}``
    mapping ``lang_id_ngram`` takes (grams in rank order)."""
    by_lang: dict[str, list[tuple[int, str]]] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append((int(r["rank"]), r["tg"]))
    return {
        lang: [tg for _, tg in sorted(pairs)]
        for lang, pairs in by_lang.items()
    }


def train_lang_profiles_oracle_sql(
    n_top: int = 40, table: str = "documents",
    lang_col: str = "lang", text_col: str = "text",
) -> str:
    """DuckDB twin of ``train_lang_profiles`` over ``table``."""
    return f"""
        WITH base AS (
            SELECT {lang_col} AS lang, lower({text_col}) AS _lt
            FROM {table}),
        tgs AS (
            SELECT lang, substr(_lt, i, 2) AS tg
            FROM base, (SELECT unnest(range(1, length(_lt))) AS i)
            WHERE length(_lt) >= 2
            UNION ALL
            SELECT lang, substr(_lt, i, 3) AS tg
            FROM base, (SELECT unnest(range(1, length(_lt) - 1)) AS i)
            WHERE length(_lt) >= 3),
        counts AS (
            SELECT lang, tg, count(*) AS cnt FROM tgs GROUP BY lang, tg),
        ranked AS (
            SELECT lang, tg, cnt,
                   row_number() OVER (
                       PARTITION BY lang ORDER BY cnt DESC, tg
                   )::INT AS rank
            FROM counts)
        SELECT lang, tg, rank, cnt
        FROM ranked WHERE rank <= {int(n_top)}
    """


def text_quality(
    docs: DataFrame,
    tokens_sql: str,
    stop_terms: list[str],
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_tokens, avg_token_len, stop_ratio, digit_ratio) — the
    length/punct/stopword quality signals a pretraining filter keys on."""
    d = docs.select(id_col, F.expr(tokens_sql).alias("_t"))
    n_tok = F.size("_t")
    stop_pred = " or ".join(f"x = '{s}'" for s in stop_terms)
    n_stop = F.size(F.expr(f"filter(_t, x -> {stop_pred})"))
    n_dig = F.size(F.expr("filter(_t, x -> x rlike '^[0-9]+$')"))
    tok_chars = F.aggregate(
        F.expr("transform(_t, x -> length(x))"), F.lit(0), lambda a, x: a + x
    )
    ratio = lambda num: F.round(  # noqa: E731
        F.when(n_tok > 0, num.cast("double") / n_tok).otherwise(0.0), 6
    )
    return d.select(
        id_col,
        n_tok.cast("long").alias("n_tokens"),
        ratio(tok_chars).alias("avg_token_len"),
        ratio(n_stop).alias("stop_ratio"),
        ratio(n_dig).alias("digit_ratio"),
    )


def token_counts(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, n_ws_tokens, n_bpe_tokens): whitespace words and a BPE-ish
    pre-tokenization regex (letter runs / single digits / punctuation) —
    the two token budgets a training pipeline plans with."""
    ws = F.size(F.expr("regexp_extract_all(text, '[^\\\\s]+', 0)"))
    bpe = F.size(
        F.expr("regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9\\\\s]', 0)")
    )
    return docs.select(
        id_col,
        ws.cast("long").alias("n_ws_tokens"),
        bpe.cast("long").alias("n_bpe_tokens"),
    )


def fingerprint(
    docs: DataFrame, tokens_sql: str, tokhash_sql: str, mod: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, fingerprint): order-sensitive left-fold polynomial rolling
    hash over the token stream (acc*31 + hash(tok)) % mod."""
    d = docs.select(id_col, F.expr(tokens_sql).alias("_t"))
    th = tokhash_sql.format(col="x")
    fp = F.expr(
        f"aggregate(_t, cast(0 as bigint), "
        f"(acc, x) -> (acc * 31 + {th} % {mod}) % {mod})"
    )
    return d.select(id_col, fp.alias("fingerprint"))


# -- PII redaction -------------------------------------------------------------

# pinned redaction rules, applied IN THIS ORDER (email first: an address
# contains dots and digits that later rules must not see). Patterns are
# written in the syntax subset Java regex (Spark) and RE2 (DuckDB)
# interpret identically — no backrefs, no lookarounds.
PII_RULES: tuple[tuple[str, str, str], ...] = (
    ("email", r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("idnum", r"\b\d{9,}\b", "<ID>"),  # long digit runs (SSN/CC-shaped)
)


def redact_pii(
    docs: DataFrame,
    text_col: str = "text",
    rules: tuple[tuple[str, str, str], ...] = PII_RULES,
) -> DataFrame:
    """Training-data PII scrub: replace every rule match with its token
    and count matches per rule → original columns with ``text_col``
    redacted plus one ``n_<rule>`` long column per rule.

    Scale shape: pure native ``regexp_replace`` / ``regexp_extract_all``
    column expressions — whole-stage codegen, zero shuffle, zero Python;
    a map-only pass however wide the corpus. Counts are computed on the
    ORIGINAL text (before any replacement) so rule order can't hide a
    match from its own counter; replacements then apply sequentially in
    rule order (pinned)."""
    # column-API calls, NOT F.expr(f"... '{pat}' ..."): a pattern embedded
    # in a SQL string literal loses its backslashes to escape processing
    out = docs
    for name, pat, _ in rules:
        out = out.withColumn(
            f"n_{name}",
            F.size(
                F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0))
            ).cast("long"),
        )
    red = F.col(text_col)
    for name, pat, token in rules:
        red = F.regexp_replace(red, pat, token)
    return out.withColumn(text_col, red)


def redact_pii_oracle_sql(
    source_sql: str = "documents",
    text_col: str = "text",
    rules: tuple[tuple[str, str, str], ...] = PII_RULES,
) -> str:
    """DuckDB twin of ``redact_pii`` (counts + sequential replacement in
    the same pinned rule order), as a SELECT over ``source_sql``."""
    counts = ", ".join(
        f"len(regexp_extract_all({text_col}, '{pat}'))::BIGINT AS n_{name}"
        for name, pat, _ in rules
    )
    red = text_col
    for _, pat, token in rules:
        red = f"regexp_replace({red}, '{pat}', '{token}', 'g')"
    return (
        f"SELECT * EXCLUDE ({text_col}), {counts}, {red} AS {text_col} "
        f"FROM {source_sql}"
    )


# -- repetition signals (Gopher-style quality filter) ---------------------------


def repetition_signals(
    docs: DataFrame, tokens_sql: str, id_col: str = "doc_id"
) -> DataFrame:
    """(id, top_token_ratio, dup_bigram_ratio, dup_trigram_ratio):
    the within-document repetition signals the Gopher / MassiveText
    quality filter thresholds on (Rae et al. 2021, table A1) — the
    fraction of tokens claimed by the single most frequent token, and
    1 - distinct/total over the token 2- and 3-gram streams.

    Scale shape: pure higher-order-function column expressions over the
    per-row token array — whole-stage codegen, zero shuffle, zero
    Python; a map-only pass like ``text_quality``. Per-row cost is
    O(distinct × n) for the top-token count and O(n) for the n-gram
    ratios — bounded by document length, independent of corpus size.
    Ratios are single divisions (no float accumulation), so round(x, 6)
    is deterministic on both engines."""
    d = docs.select(id_col, F.expr(tokens_sql).alias("_t"))
    n = F.size("_t")
    top_cnt = F.array_max(
        F.expr("transform(array_distinct(_t), u -> size(filter(_t, x -> x = u)))")
    )

    def dup_ngram(k: int):
        grams = (
            f"transform(slice(_t, 1, greatest(size(_t) - {k - 1}, 0)), "
            f"(x, i) -> concat_ws(' ', slice(_t, i + 1, {k})))"
        )
        return F.expr(
            f"round(case when size({grams}) > 0 then "
            f"cast(1.0 as double) - cast(size(array_distinct({grams})) as double)"
            f" / size({grams}) else 0.0 end, 6)"
        )

    return d.select(
        id_col,
        F.round(
            F.when(n > 0, top_cnt.cast("double") / n).otherwise(0.0), 6
        ).alias("top_token_ratio"),
        dup_ngram(2).alias("dup_bigram_ratio"),
        dup_ngram(3).alias("dup_trigram_ratio"),
    )


def repetition_signals_oracle_sql(
    tokens_duck: str, source_sql: str = "documents", id_col: str = "doc_id"
) -> str:
    """DuckDB twin of ``repetition_signals`` (same pinned ratios over
    the same token stream), as a full SELECT over ``source_sql``."""
    return f"""
        WITH t AS (SELECT {id_col}, {tokens_duck} AS _t FROM {source_sql}),
        g AS (SELECT {id_col}, _t,
                list_transform(range(1, len(_t)),
                    i -> _t[i] || ' ' || _t[i + 1]) AS g2,
                list_transform(range(1, len(_t) - 1),
                    i -> _t[i] || ' ' || _t[i + 1] || ' ' || _t[i + 2]) AS g3
              FROM t)
        SELECT {id_col},
               round(CASE WHEN len(_t) > 0 THEN
                   list_max(list_transform(list_distinct(_t),
                       u -> len(list_filter(_t, x -> x = u))))::DOUBLE
                   / len(_t) ELSE 0.0 END, 6) AS top_token_ratio,
               round(CASE WHEN len(g2) > 0 THEN
                   1.0::DOUBLE - len(list_distinct(g2))::DOUBLE / len(g2)
                   ELSE 0.0 END, 6) AS dup_bigram_ratio,
               round(CASE WHEN len(g3) > 0 THEN
                   1.0::DOUBLE - len(list_distinct(g3))::DOUBLE / len(g3)
                   ELSE 0.0 END, 6) AS dup_trigram_ratio
        FROM g
    """


# -- collocations (bigram PMI) -------------------------------------------------


def collocations(
    docs: DataFrame,
    min_count: int = 5,
    k: int | None = None,
    text_col: str = "text",
) -> DataFrame:
    """(a, b, n_ab, pmi): adjacent-word collocations ranked by pointwise
    mutual information — the classic corpus-linguistics keyphrase signal
    (Church & Hanks 1990): pmi = ln(p(ab) / (p(a) p(b))) with p from the
    same lowercase ``[a-z]+`` token stream (p(ab) over adjacent bigram
    occurrences, p(a)/p(b) over unigram occurrences).

    Pinned float shape (the DuckDB contract twin computes the identical
    expression): ``round(ln((n_ab/N_bi) / ((n_a/N_uni) * (n_b/N_uni))),
    6)``; only bigrams with ``n_ab >= min_count`` qualify; optional
    top-``k`` by (pmi desc, a asc, b asc).

    Scale shape: two hash aggregations (unigrams, bigrams — both
    map-side-combined, keys are vocabulary-sized, not corpus-sized), the
    ``min_count`` filter cuts the bigram table BEFORE the two
    vocabulary joins, and the two scalar totals ride a broadcast
    crossJoin (the global-max-normalize pattern) — no collect, no
    single-partition stage; native higher-order functions only, zero
    Python in the row path."""
    toks = docs.select(
        F.expr(
            f"regexp_extract_all(lower({text_col}), '[a-z]+', 0)"
        ).alias("t")
    )
    uni = (
        toks.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("n"))
    )
    pairs = (
        toks.filter(F.size("t") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(slice(t, 1, size(t) - 1), "
                    "(x, i) -> struct(x AS a, t[i + 1] AS b))"
                )
            ).alias("p")
        )
        .select("p.a", "p.b")
    )
    bi = pairs.groupBy("a", "b").agg(F.count("*").alias("n_ab"))
    totals = uni.agg(F.sum("n").cast("double").alias("tot_uni")).crossJoin(
        bi.agg(F.sum("n_ab").cast("double").alias("tot_bi"))
    )
    ua = uni.select(F.col("w").alias("a"), F.col("n").alias("n_a"))
    ub = uni.select(F.col("w").alias("b"), F.col("n").alias("n_b"))
    pmi = F.round(
        F.log(
            (F.col("n_ab").cast("double") / F.col("tot_bi"))
            / (
                (F.col("n_a").cast("double") / F.col("tot_uni"))
                * (F.col("n_b").cast("double") / F.col("tot_uni"))
            )
        ),
        6,
    )
    out = (
        bi.filter(F.col("n_ab") >= min_count)
        .join(ua, "a")
        .join(ub, "b")
        .crossJoin(F.broadcast(totals))
        .select("a", "b", "n_ab", pmi.alias("pmi"))
    )
    if k is not None:
        out = out.orderBy(F.desc("pmi"), F.asc("a"), F.asc("b")).limit(k)
    return out


# -- interpolated bigram LM scoring (CCNet-style perplexity filter) ------------


def lm_logppl(
    docs: DataFrame,
    vocab_size: int = 256,
    lam: float = 0.7,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_tokens, logppl): per-document log10-perplexity under an
    interpolated bigram language model trained on the same corpus — the
    classic LM-quality filter of the CCNet / CC-100 pipeline (Wenzek et
    al. 2020 score documents with a KenLM 5-gram; this is the same
    filter shape with a self-trained, fully deterministic 2-gram model
    so both engines can reproduce it bit-for-bit).

    Pinned model (the DuckDB twin computes the identical expressions):

    - token stream: ``regexp_extract_all(lower(text), '[a-z]+')``;
      docs with zero tokens are excluded from the output;
    - vocab: top-``vocab_size`` tokens by (count desc, token asc);
      out-of-vocab tokens map to the literal ``<unk>`` (cannot collide
      with ``[a-z]+`` tokens);
    - unigram: add-one smoothing over the mapped stream,
      ``p_uni(w) = (n_w + 1.0) / (N + V + 1.0)`` with ``V`` = actual
      vocab row count and ``N`` = total mapped tokens;
    - bigram: ``p_bi(cur|prev) = n_prev_cur / n_prev`` (0 when the pair
      was never seen — ``prev`` itself is always seen);
    - interpolation: position 0 scores ``p_uni``; position i>0 scores
      ``lam * p_bi + (1 - lam) * p_uni`` (``lam`` and ``1 - lam`` are
      embedded as exact double literals on both engines);
    - ``logppl = round(-(Σ_i log10 p_i) / n_tokens, 6)`` with the sum
      folded LEFT-TO-RIGHT in position order (the repo-wide pinned
      float-fold shape).

    Scale shape: vocab selection is count-agg + TakeOrderedAndProject
    (no global window); the model tables are vocabulary-sized (≤ V+1
    unigram rows, ≤ V² bigram rows) and ride broadcast joins onto the
    per-position stream; the per-position explode is inherent to LM
    scoring (one row per token, like the lang-id trigram explode); the
    final per-doc fold is one hash aggregation. The docs scan is
    recomputed per model table (vocab/uni/bi) — a deployment training on
    a held-in slice would materialize the three tiny model tables once
    and only the scoring pass would touch the corpus."""
    mu = 1.0 - lam
    toks = docs.select(
        id_col,
        F.expr(f"regexp_extract_all(lower({text_col}), '[a-z]+', 0)").alias("_t"),
    ).filter(F.size("_t") > 0)
    vocab = (
        toks.select(F.explode("_t").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("w"))
        .limit(vocab_size)
    )
    vrow = vocab.agg(
        F.sort_array(F.collect_list("w")).alias("_vwords"),
        F.count("*").alias("_vsize"),
    )
    m = toks.crossJoin(F.broadcast(vrow.select("_vwords"))).select(
        id_col,
        F.expr(
            "transform(_t, x -> case when array_contains(_vwords, x) "
            "then x else '<unk>' end)"
        ).alias("_m"),
    )
    pos = m.select(
        id_col,
        F.explode(
            F.expr(
                "transform(_m, (x, i) -> struct(i as pos, x as cur, "
                "case when i > 0 then element_at(_m, i) "
                "else cast(null as string) end as prev))"
            )
        ).alias("p"),
    ).select(id_col, "p.pos", "p.cur", "p.prev")
    uni = pos.groupBy("cur").agg(F.count("*").alias("n")).select(
        F.col("cur").alias("w"), "n"
    )
    # one-row (N, V) constants frame (the broadcast global-max pattern)
    tot = uni.agg(F.sum("n").alias("_N")).crossJoin(vrow.select("_vsize"))
    bi = (
        pos.filter(F.col("prev").isNotNull())
        .groupBy("prev", "cur")
        .agg(F.count("*").alias("n_pc"))
    )
    p_uni = (F.col("n_cur") + F.lit(1.0)) / (
        F.col("_N") + F.col("_vsize") + F.lit(1.0)
    )
    p_bi = F.coalesce(F.col("n_pc"), F.lit(0)).cast("double") / F.col("n_prev")
    p = F.when(F.col("prev").isNull(), p_uni).otherwise(
        F.lit(lam) * p_bi + F.lit(mu) * p_uni
    )
    scored = (
        pos.join(
            F.broadcast(
                uni.select(F.col("w").alias("cur"), F.col("n").alias("n_cur"))
            ),
            "cur",
        )
        .join(
            F.broadcast(
                uni.select(F.col("w").alias("prev"), F.col("n").alias("n_prev"))
            ),
            "prev",
            "left",
        )
        .join(F.broadcast(bi), ["prev", "cur"], "left")
        .crossJoin(F.broadcast(tot))
        .select(id_col, "pos", F.log10(p).alias("_lp"))
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.sort_array(F.collect_list(F.struct("pos", "_lp"))).alias("_l"),
        )
        .select(
            id_col,
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.round(
                -F.aggregate(
                    "_l", F.lit(0.0), lambda a, s: a + s["_lp"]
                )
                / F.col("n_tokens"),
                6,
            ).alias("logppl"),
        )
    )


def lm_logppl_oracle_sql(
    vocab_size: int = 256,
    lam: float = 0.7,
    source_sql: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of ``lm_logppl`` — identical pinned model and float
    expression shapes (left-to-right ``list_reduce`` fold in position
    order; ``lam`` / ``1 - lam`` embedded via ``repr`` so both engines
    parse the exact same doubles)."""
    mu = 1.0 - lam
    return f"""
        WITH toks AS (
            SELECT {id_col} AS doc_id,
                   regexp_extract_all(lower({text_col}), '[a-z]+') AS _t
            FROM {source_sql}
            WHERE len(regexp_extract_all(lower({text_col}), '[a-z]+')) > 0),
        vocab AS (
            SELECT u.w, count(*) AS n
            FROM toks, unnest(_t) AS u(w)
            GROUP BY 1 ORDER BY n DESC, w ASC LIMIT {vocab_size}),
        vlist AS (
            SELECT list(w ORDER BY w) AS _vwords, count(*) AS _vsize FROM vocab),
        m AS (
            SELECT doc_id,
                   [CASE WHEN list_contains(_vwords, x) THEN x
                         ELSE '<unk>' END FOR x IN _t] AS _m
            FROM toks, vlist),
        pos AS (
            SELECT doc_id, i AS pos, _m[i + 1] AS cur,
                   CASE WHEN i > 0 THEN _m[i] END AS prev
            FROM m, unnest(range(0, len(_m))) AS r(i)),
        uni AS (SELECT cur AS w, count(*) AS n FROM pos GROUP BY 1),
        tot AS (SELECT sum(n) AS _N FROM uni),
        bi AS (
            SELECT prev, cur, count(*) AS n_pc FROM pos
            WHERE prev IS NOT NULL GROUP BY 1, 2),
        sc AS (
            SELECT p.doc_id, p.pos,
                   log10(CASE WHEN p.prev IS NULL
                         THEN (uc.n + 1.0) / (_N + _vsize + 1.0)
                         ELSE {lam!r} * (coalesce(b.n_pc, 0)::DOUBLE / up.n)
                              + {mu!r} * ((uc.n + 1.0) / (_N + _vsize + 1.0))
                         END) AS _lp
            FROM pos p
            JOIN uni uc ON uc.w = p.cur
            LEFT JOIN uni up ON up.w = p.prev
            LEFT JOIN bi b ON b.prev = p.prev AND b.cur = p.cur
            CROSS JOIN tot CROSS JOIN vlist)
        SELECT doc_id AS {id_col}, count(*)::BIGINT AS n_tokens,
               round(-list_reduce(list_prepend(0.0, list(_lp ORDER BY pos)),
                                  (a, x) -> a + x)
                     / count(*)::BIGINT, 6) AS logppl
        FROM sc GROUP BY doc_id
    """


# -- TextRank keyword extraction (weighted PageRank over word adjacency) -------


def textrank_keywords(
    docs: DataFrame,
    damping: float = 0.85,
    iters: int = 10,
    k: int | None = None,
    text_col: str = "text",
) -> DataFrame:
    """(term, score): corpus keywords by TextRank (Mihalcea & Tarau
    2004) — weighted PageRank over the undirected word-adjacency graph
    of the lowercase ``[a-z]+`` token stream.

    Pinned model (the DuckDB twin computes the identical expressions):

    - edges: adjacent token pairs with ``a != b`` (self-loops dropped),
      undirected — the weight of {a, b} is the total adjacency count in
      either order;
    - node set: words with at least one edge (isolated words drop, the
      standard TextRank convention);
    - ratio ``r(i←j) = w_ij / W_j`` with ``W_j`` = total incident
      weight of j (bigint / bigint → double on both engines);
    - iteration: ``s_i = round((1 - d) + d * Σ_j r(i←j) * s_j, 6)``
      from ``s = 1.0``, the Σ folded LEFT-TO-RIGHT over neighbors in
      lexicographic j order; the 6dp round after EVERY iteration is the
      cross-engine pin (the kmeans/PQ trick — operators/ann.py) — drop
      it and float drift compounds across iterations;
    - ``d`` and ``1 - d`` are embedded as exact double literals;
    - optional top-``k`` by (score desc, term asc) →
      TakeOrderedAndProject, no global window.

    Scale shape: the graph tables are vocabulary-sized (edges =
    distinct adjacent pairs), so each iteration is one
    vocabulary-keyed join + one hash aggregation — the canonical
    iterative-PageRank shuffle pattern; nothing is corpus-sized after
    the first two aggregations. The edge table is rebuilt lazily per
    iteration here (Catalyst ReusedExchange collapses the repeats
    within the one job); a long production run would materialize the
    flat (i, j, r) table once before iterating."""
    od = 1.0 - damping
    toks = docs.select(
        F.expr(f"regexp_extract_all(lower({text_col}), '[a-z]+', 0)").alias(
            "t"
        )
    )
    pairs = (
        toks.filter(F.size("t") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(slice(t, 1, size(t) - 1), "
                    "(x, i) -> struct(x AS a, t[i + 1] AS b))"
                )
            ).alias("p")
        )
        .select("p.a", "p.b")
        .filter(F.col("a") != F.col("b"))
    )
    und = (
        pairs.select(
            F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
        )
        .groupBy("u", "v")
        .agg(F.count("*").alias("w"))
    )
    adj = und.select(
        F.col("u").alias("i"), F.col("v").alias("j"), "w"
    ).unionByName(und.select(F.col("v").alias("i"), F.col("u").alias("j"), "w"))
    wj = adj.groupBy("i").agg(F.sum("w").alias("wj")).select(
        F.col("i").alias("j"), "wj"
    )
    ae = adj.join(wj, "j").select(
        "i", "j", (F.col("w").cast("double") / F.col("wj")).alias("r")
    )
    scores = adj.select("i").distinct().select("i", F.lit(1.0).alias("s"))
    for _ in range(iters):
        c = ae.join(
            scores.select(F.col("i").alias("j"), "s"), "j"
        ).select("i", "j", (F.col("r") * F.col("s")).alias("_c"))
        scores = (
            c.groupBy("i")
            .agg(
                F.sort_array(F.collect_list(F.struct("j", "_c"))).alias("_l")
            )
            .select(
                "i",
                F.round(
                    F.lit(od)
                    + F.lit(damping)
                    * F.aggregate(
                        "_l", F.lit(0.0), lambda a, s: a + s["_c"]
                    ),
                    6,
                ).alias("s"),
            )
        )
    out = scores.select(
        F.col("i").alias("term"), F.col("s").alias("score")
    )
    if k is not None:
        out = out.orderBy(F.desc("score"), F.asc("term")).limit(k)
    return out


def textrank_oracle_sql(
    damping: float = 0.85,
    iters: int = 10,
    k: int | None = None,
    source_sql: str = "documents",
    text_col: str = "text",
) -> str:
    """DuckDB twin of ``textrank_keywords`` — the ``iters`` iterations
    unrolled as chained CTEs, each summing neighbor contributions with
    the same lexicographic-j left-to-right ``list_reduce`` fold and 6dp
    round."""
    od = 1.0 - damping
    its = []
    for n in range(1, iters + 1):
        its.append(
            f"""s{n} AS (
            SELECT ae.i,
                   round({od!r} + {damping!r} *
                       list_reduce(list_prepend(0.0,
                           list(ae.r * s{n - 1}.s ORDER BY ae.j)),
                           (x, y) -> x + y), 6) AS s
            FROM ae JOIN s{n - 1} ON s{n - 1}.i = ae.j
            GROUP BY ae.i)"""
        )
    body = ",\n        ".join(its)
    lim = (
        f"ORDER BY score DESC, term ASC LIMIT {k}" if k is not None else ""
    )
    return f"""
        WITH toks AS (
            SELECT regexp_extract_all(lower({text_col}), '[a-z]+') AS t
            FROM {source_sql}),
        pairs AS (
            SELECT t[i] AS a, t[i + 1] AS b
            FROM toks, unnest(range(1, len(t))) AS r(i)
            WHERE t[i] <> t[i + 1]),
        e AS (
            SELECT least(a, b) AS u, greatest(a, b) AS v, count(*) AS w
            FROM pairs GROUP BY 1, 2),
        adj AS (
            SELECT u AS i, v AS j, w FROM e
            UNION ALL SELECT v, u, w FROM e),
        tot AS (SELECT i AS j, sum(w) AS wj FROM adj GROUP BY 1),
        ae AS (
            SELECT a.i, a.j, a.w::DOUBLE / t.wj AS r
            FROM adj a JOIN tot t ON t.j = a.j),
        s0 AS (SELECT DISTINCT i, 1.0::DOUBLE AS s FROM adj),
        {body}
        SELECT i AS term, s AS score FROM s{iters} {lim}
    """


def hashing_vectors(
    docs: DataFrame,
    dim: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_sql: str | None = None,
) -> DataFrame:
    """Feature-hashing document vectors (the hashing trick — Weinberger
    et al. 2009, ICML; sklearn ``HashingVectorizer`` shape): sparse
    L2-normalized term-frequency vectors with NO vocabulary table —
    embeddings for the ANN/dedup suite when no model embedding exists.

    Per token: h = the shared 60-bit md5 token hash (dedup.TOKHASH_SQL,
    exact in both engines); sign = +1 if h even else -1; bucket =
    (h div 2) mod dim. Per (doc, bucket): s = Σ sign (a signed INTEGER
    count — sign cancellation is the hashing trick's collision
    correction). Norm = sqrt(Σ s²) over the doc's buckets — an INTEGER
    sum, so no float fold order to pin. Output rows
    (id_col, bucket, weight = round(s / norm, 6)) for s ≠ 0.

    Scale shape: explode → one (doc, bucket) hash aggregation → one
    doc-partitioned window for the norm. Map-side combine applies to
    the agg; nothing is ever vocabulary- or dimension-exploded."""
    from pyspark.sql import Window

    from search_engine_spark.operators.dedup import TOKHASH_SQL

    toks = tokens_sql or f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)"
    h = TOKHASH_SQL.format(col="term")
    s = (
        docs.select(id_col, F.explode(F.expr(toks)).alias("term"))
        .select(
            id_col,
            F.expr(f"cast(({h} div 2) % {dim} as int)").alias("bucket"),
            F.expr(f"if({h} % 2 = 0, 1L, -1L)").alias("sign"),
        )
        .groupBy(id_col, "bucket")
        .agg(F.sum("sign").alias("s"))
        .filter(F.col("s") != 0)
    )
    w = Window.partitionBy(id_col)
    return s.select(
        id_col,
        "bucket",
        F.round(
            F.col("s")
            / F.sqrt(F.sum(F.col("s") * F.col("s")).over(w).cast("double")),
            6,
        ).alias("weight"),
    )


def hashing_vectors_oracle_sql(
    dim: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    table: str = "documents",
) -> str:
    """DuckDB twin of ``hashing_vectors`` (same hash / sign / bucket /
    integer-norm pins)."""
    h = "(('0x' || substr(md5(term), 1, 15))::BIGINT)"
    return f"""
        WITH tok AS (
            SELECT {id_col},
                   unnest(regexp_extract_all(lower({text_col}), '[a-z0-9]+'))
                     AS term
            FROM {table}),
        s AS (
            SELECT {id_col}, (({h} // 2) % {dim})::INT AS bucket,
                   sum(CASE WHEN {h} % 2 = 0 THEN 1 ELSE -1 END)::BIGINT AS s
            FROM tok GROUP BY 1, 2 HAVING s <> 0)
        SELECT {id_col}, bucket,
               round(s / sqrt((sum(s * s) OVER (
                   PARTITION BY {id_col}))::DOUBLE), 6) AS weight
        FROM s
    """
