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
