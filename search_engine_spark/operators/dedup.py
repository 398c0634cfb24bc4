"""Deduplication operators: exact hash, n-gram Jaccard, MinHash+LSH,
SimHash — the training-data near-dup suite as a public library API
(previously these lived only as contract query functions).

Kernels are vectorized ``mapInPandas`` partial aggregations: a batch of
(doc, value) rows becomes ONE NumPy pass emitting per-doc partials in a
WIDE flat row (one column per hash/bit — never an array column through a
shuffle, see operators/compress.py design note), merged by a narrow
groupBy. No explode-by-seed or explode-by-bit row inflation anywhere.

All hash math is integer (exact in both engines): 60-bit md5 prefix
(``TOKHASH_SQL``, computed natively Spark-side) reduced mod 1e9+7; MinHash
permutations ``(a*x + b) % mod`` stay < 2^62 in int64.

References: MinHash/LSH per Broder; SimHash per Charikar — public
literature; the reference repo has no dedup (this suite extends it).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from search_engine_spark.functions.rounding import round6

# md5-based 60-bit token hash, identical in Spark and DuckDB (the contract
# embeds the DuckDB twin)
TOKHASH_SQL = (
    "cast(conv(substring(md5(cast({col} as binary)), 1, 15), 16, 10) as bigint)"
)


def exact_dedup_summary(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(n_docs, n_distinct_texts) — exact content-hash dedup summary."""
    return docs.agg(
        F.count("*").alias("n_docs"),
        F.countDistinct(F.md5(F.col(text_col).cast("binary"))).alias(
            "n_distinct_texts"
        ),
    )


def jaccard_pairs(
    shingles: DataFrame, threshold: float, candidates: DataFrame | None = None
) -> DataFrame:
    """(a_id, b_id, jaccard >= threshold) by EXACT shingle Jaccard.
    ``shingles`` = (doc_id, sh) distinct. With ``candidates`` (a_id, b_id)
    the quadratic work is restricted to those pairs (the LSH verify step);
    without, pairs come from the inverted shingle self-join — quadratic
    only within identical-shingle groups (ground-truth path)."""
    sizes = shingles.groupBy("doc_id").agg(F.count("*").alias("sz"))
    if candidates is None:
        common = (
            shingles.alias("a")
            .join(shingles.alias("b"), "sh")
            .filter(F.col("a.doc_id") < F.col("b.doc_id"))
            .groupBy(
                F.col("a.doc_id").alias("a_id"),
                F.col("b.doc_id").alias("b_id"),
            )
            .agg(F.count("*").alias("_c"))
        )
    else:
        sh_a = shingles.select(F.col("doc_id").alias("a_id"), "sh")
        sh_b = shingles.select(F.col("doc_id").alias("b_id"), "sh")
        common = (
            candidates.join(sh_a, "a_id")
            .join(sh_b, ["b_id", "sh"])
            .groupBy("a_id", "b_id")
            .agg(F.count("*").alias("_c"))
        )
    return (
        common.join(
            sizes.withColumnRenamed("doc_id", "a_id")
            .withColumnRenamed("sz", "_sa"), "a_id",
        )
        .join(
            sizes.withColumnRenamed("doc_id", "b_id")
            .withColumnRenamed("sz", "_sb"), "b_id",
        )
        .withColumn(
            "jaccard",
            F.round(
                F.col("_c").cast("double")
                / (F.col("_sa") + F.col("_sb") - F.col("_c")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "jaccard")
    )


def minhash_signatures(
    shingles: DataFrame,
    seeds_a: list[int],
    seeds_b: list[int],
    mod: int,
) -> DataFrame:
    """(doc_id, mh0..mh{n-1}): per-doc minima of the n hash permutations
    ``(a_i * x + b_i) % mod`` over the doc's shingle hashes — one NumPy
    pass per Arrow batch (n_rows × n_seeds), per-doc partial minima merged
    by a narrow groupBy (no seed crossJoin row inflation)."""
    n = len(seeds_a)
    A = np.asarray(seeds_a, dtype=np.int64)
    B = np.asarray(seeds_b, dtype=np.int64)
    cols = [f"mh{i}" for i in range(n)]
    schema = "doc_id long, " + ", ".join(f"{c} long" for c in cols)

    hashed = shingles.select(
        "doc_id",
        (F.expr(TOKHASH_SQL.format(col="sh")) % F.lit(mod)).alias("x"),
    )

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            doc = pdf["doc_id"].to_numpy(np.int64)
            order = np.argsort(doc, kind="stable")
            doc, x = doc[order], pdf["x"].to_numpy(np.int64)[order]
            H = (A[None, :] * x[:, None] + B[None, :]) % mod  # < 2^62: exact
            starts = np.flatnonzero(np.diff(doc, prepend=doc[0] - 1))
            mins = np.minimum.reduceat(H, starts, axis=0)
            out = {"doc_id": doc[starts]}
            for i, c in enumerate(cols):
                out[c] = mins[:, i]
            yield pd.DataFrame(out)

    partial = hashed.mapInPandas(kern, schema=schema)
    return partial.groupBy("doc_id").agg(
        *[F.min(c).alias(c) for c in cols]
    )


def lsh_candidate_pairs(
    sigs: DataFrame, n_bands: int, rows_per_band: int
) -> DataFrame:
    """(a_id, b_id) candidates: docs sharing one full band signature.
    Band signatures concatenate the band's minhash columns; candidates
    come from the band-bucket equi-join (the LSH shape that scales)."""
    band_sigs = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(band).alias("band"),
                        F.concat_ws(
                            ",",
                            *[
                                F.col(f"mh{band * rows_per_band + r}").cast(
                                    "string"
                                )
                                for r in range(rows_per_band)
                            ],
                        ).alias("sig"),
                    )
                    for band in range(n_bands)
                ]
            )
        ).alias("bs"),
    ).select("doc_id", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig"))
    return (
        band_sigs.alias("a")
        .join(band_sigs.alias("b"), ["band", "sig"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id")
        )
        .distinct()
    )


def minhash_lsh_pairs(
    shingles: DataFrame,
    threshold: float,
    seeds_a: list[int],
    seeds_b: list[int],
    mod: int,
    n_bands: int,
) -> DataFrame:
    """shingle → minhash → band → bucket-join → exact-Jaccard verify
    (the full 100-TB near-dup pipeline)."""
    sigs = minhash_signatures(shingles, seeds_a, seeds_b, mod)
    cand = lsh_candidate_pairs(sigs, n_bands, len(seeds_a) // n_bands)
    return jaccard_pairs(shingles, threshold, candidates=cand)


def simhash(tf_df: DataFrame, n_bits: int = 63) -> DataFrame:
    """(doc_id, simhash): tf-weighted token-hash SimHash fingerprint.
    ``tf_df`` = (doc_id, term, tf). Per batch: ONE (rows × bits) NumPy
    pass producing per-doc partial bit sums as a wide flat row; a narrow
    groupBy merges partials; the final bit-pack is native SQL. Replaces
    the 63×-per-posting explode form."""
    bits = np.arange(n_bits, dtype=np.int64)
    cols = [f"s{b}" for b in range(n_bits)]
    schema = "doc_id long, " + ", ".join(f"{c} long" for c in cols)

    hashed = tf_df.select(
        "doc_id",
        F.expr(TOKHASH_SQL.format(col="term")).alias("th"),
        F.col("tf").cast("long").alias("tf"),
    )

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            doc = pdf["doc_id"].to_numpy(np.int64)
            order = np.argsort(doc, kind="stable")
            doc = doc[order]
            th = pdf["th"].to_numpy(np.int64)[order]
            tf = pdf["tf"].to_numpy(np.int64)[order]
            W = (((th[:, None] >> bits[None, :]) & 1) * 2 - 1) * tf[:, None]
            starts = np.flatnonzero(np.diff(doc, prepend=doc[0] - 1))
            sums = np.add.reduceat(W, starts, axis=0)
            out = {"doc_id": doc[starts]}
            for b, c in enumerate(cols):
                out[c] = sums[:, b]
            yield pd.DataFrame(out)

    partial = hashed.mapInPandas(kern, schema=schema)
    merged = partial.groupBy("doc_id").agg(
        *[F.sum(c).alias(c) for c in cols]
    )
    packed = sum(
        F.when(F.col(f"s{b}") > 0, F.lit(1).cast("long") * (1 << b)).otherwise(
            F.lit(0).cast("long")
        )
        for b in range(n_bits)
    )
    return merged.select("doc_id", packed.alias("simhash"))


def duplicate_spans(
    docs: DataFrame,
    width: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 2,
) -> DataFrame:
    """Exact substring-level duplication (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better", at
    token-``width``-gram granularity): for every doc, how many of its
    ``width``-token windows also occur VERBATIM in at least
    ``min_docs - 1`` other docs. Doc-level dedup (MinHash/SimHash above)
    misses partial copies — a unique page quoting a boilerplate
    paragraph; this flags the copied spans themselves. Returns
    (doc_id, n_grams, dup_grams, dup_ratio) for docs with >= ``width``
    tokens; ``dup_ratio = round(dup_grams / n_grams, 6)``.

    Pinned semantics (the DuckDB twin computes the same): tokens =
    ``[a-z0-9]+`` of lower(text) (the dedup-suite rule); gram text =
    tokens joined by one space; identity = the 60-bit md5 prefix
    (``TOKHASH_SQL``); a gram is duplicated when it appears in >=
    ``min_docs`` DISTINCT docs (within-doc repeats alone don't count).

    Scale shape (the suffix-array MapReduce approximation): one
    map-only gram+hash pass (native HOFs, no Python), one hash agg
    keyed by the uniform 60-bit hash with a map-side distinct-doc
    combiner, one shuffle join back on the same hash, one per-doc agg.
    No pairwise comparisons anywhere — cost is O(total tokens), not
    O(docs^2); hot boilerplate grams concentrate only their own
    occurrence rows (count-distinct partials, never a cross join)."""
    if width < 2:
        raise ValueError("need width >= 2")
    gram_hash = TOKHASH_SQL.format(
        col=f"concat_ws(' ', slice(_t, i + 1, {width}))"
    )
    occ = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.expr(
                f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)"
            ).alias("_t"),
        )
        .filter(F.size("_t") >= width)
        .select(
            "doc_id",
            F.size("_t").alias("_n"),
            F.explode(
                F.expr(
                    f"transform(sequence(0, size(_t) - {width}), "
                    f"i -> {gram_hash})"
                )
            ).alias("h"),
        )
    )
    shared = (
        occ.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("_nd"))
        .filter(F.col("_nd") >= min_docs)
        .select("h")
    )
    per_doc = (
        occ.join(shared, "h")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("dup_grams"))
    )
    base = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.expr(
                f"size(regexp_extract_all(lower({text_col}), "
                f"'[a-z0-9]+', 0))"
            ).alias("_n"),
        )
        .filter(F.col("_n") >= width)
        .select(
            "doc_id", (F.col("_n") - width + 1).cast("long").alias("n_grams")
        )
    )
    return (
        base.join(per_doc, "doc_id", "left")
        .na.fill({"dup_grams": 0})
        .select(
            "doc_id",
            "n_grams",
            F.col("dup_grams").cast("long").alias("dup_grams"),
            F.round(F.col("dup_grams") / F.col("n_grams"), 6).alias(
                "dup_ratio"
            ),
        )
    )


def duplicate_spans_oracle_sql(
    width: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    table: str = "documents",
    min_docs: int = 2,
) -> str:
    """DuckDB twin of ``duplicate_spans`` (same token / gram / hash /
    threshold pins)."""
    gram = f"array_to_string(tk[i + 1 : i + {width}], ' ')"
    ghash = f"(('0x' || substr(md5({gram}), 1, 15))::BIGINT)"
    return f"""
        WITH t AS (
            SELECT {id_col} AS doc_id,
                   regexp_extract_all(lower({text_col}), '[a-z0-9]+') AS tk
            FROM {table}),
        occ AS (
            SELECT doc_id, len(tk)::BIGINT AS _n,
                   unnest([{ghash}
                           for i in range(0, len(tk) - {width} + 1)]) AS h
            FROM t WHERE len(tk) >= {width}),
        shared AS (
            SELECT h FROM occ GROUP BY h
            HAVING count(DISTINCT doc_id) >= {min_docs}),
        per_doc AS (
            SELECT doc_id, count(*)::BIGINT AS dup_grams
            FROM occ JOIN shared USING (h) GROUP BY doc_id),
        base AS (
            SELECT doc_id, (len(tk) - {width} + 1)::BIGINT AS n_grams
            FROM t WHERE len(tk) >= {width})
        SELECT base.doc_id, base.n_grams,
               coalesce(per_doc.dup_grams, 0)::BIGINT AS dup_grams,
               round(coalesce(per_doc.dup_grams, 0)::DOUBLE / base.n_grams,
                     6) AS dup_ratio
        FROM base LEFT JOIN per_doc USING (doc_id)
    """


def semdedup(
    emb: DataFrame,
    k: int = 4,
    iters: int = 2,
    threshold: float = 0.93,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_rows: int = 2048,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication = k-means topic clusters, then within-cluster cosine
    near-dup pruning — the embedding-space analog of MinHash dedup that
    catches paraphrases sharing no n-grams.

    Returns (id_col, centroid, keep): ``keep=false`` iff a LOWER-id
    member of the same cluster has cosine similarity ≥ ``threshold``
    (the pinned survivor rule — lowest id in each near-dup
    neighborhood survives).

    Pins (shared with the DuckDB contract twin ``semdedup``):
    - clustering = ``ann.kmeans`` (6dp init/centroid/distance rounds);
    - pair cosine = round(dot / (norm_a * norm_b), 6), every sum
      accumulated strictly left-to-right in dimension order (float64),
      compared ≥ threshold AFTER the round.

    Scale shape: clustering is the shuffle-free partial-agg kmeans;
    the pairwise stage shuffles each vector ONCE to its cluster's
    kernel (``applyInPandas`` by centroid). The quadratic term is
    confined within clusters — SemDeDup's defining trick: pick k so
    |cluster| ≈ n/k stays bounded (the paper uses k ≈ √n·const) —
    and the KERNEL's memory is bounded regardless: the similarity
    matrix streams in ``block_rows``-row blocks (the survivor rule
    only needs, per row, whether ANY lower-id member clears the
    threshold), so a skewed mega-cluster costs O(block_rows²)
    floats at a time, never |c|². The block decomposition is
    bit-identical to the full-matrix form: each (i, j) dot still
    accumulates left-to-right in dimension order."""
    from search_engine_spark.operators.ann import kmeans

    assign, _ = kmeans(emb, k=k, iters=iters, id_col=id_col, vec_col=vec_col)
    src = (
        emb.select(id_col, F.col(vec_col).cast("array<double>").alias("_v"))
        .join(assign, id_col)
    )
    B = int(block_rows)
    if B < 1:
        raise ValueError(f"block_rows must be >= 1, got {block_rows}")

    def kern(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        X = np.array(pdf["_v"].to_list(), dtype=np.float64)
        n, dim = X.shape
        # norms: left-to-right per-dimension accumulation (the same
        # fold the SQL list_reduce twin replays)
        sq = np.zeros(n, dtype=np.float64)
        for d in range(dim):
            sq += X[:, d] * X[:, d]
        norms = np.sqrt(sq)
        keep = np.ones(n, dtype=bool)
        for i0 in range(0, n, B):
            Xi = X[i0 : i0 + B]
            ni = Xi.shape[0]
            hit = np.zeros(ni, dtype=bool)
            # columns j <= current rows only (strict j < i inside the
            # diagonal block); each S element adds one per-dimension
            # product IN ORDER — identical sums to the full matrix
            for j0 in range(0, i0 + ni, B):
                Xj = X[j0 : j0 + B]
                nj = Xj.shape[0]
                S = np.zeros((ni, nj), dtype=np.float64)
                for d in range(dim):
                    S += np.outer(Xi[:, d], Xj[:, d])
                cos = round6(S / np.outer(norms[i0 : i0 + ni], norms[j0 : j0 + nj]))
                m = cos >= threshold
                if j0 == i0:
                    m = np.tril(m, k=-1)  # [i, j<i] near-dup
                # j0 < i0 blocks are entirely lower-id: whole block counts
                hit |= m.any(axis=1)
            keep[i0 : i0 + ni] = ~hit
        return pd.DataFrame(
            {
                id_col: pdf[id_col],
                "centroid": pdf["centroid"],
                "keep": keep,
            }
        )

    return src.groupBy("centroid").applyInPandas(
        kern, schema=f"{id_col} long, centroid int, keep boolean"
    )
