"""Distributed linear classifier training over hashed features —
the fastText-style quality/topic probe of modern curation pipelines
(e.g. the DCLM / LLaMA-style "train a cheap classifier, score the
corpus, keep the top" recipe), on Spark with an integer-exact pinned
gradient.

Fixed-point contract (the cross-engine pin):
- features are 6dp-rounded weights (operators/text.py hashing_vectors)
  scaled to int64 ``X6 = round(weight * 1e6)``;
- model weights are 6dp-scaled int64 ``W6`` (init 0);
- margin ``M12 = Σ_b X6·W6`` is an INTEGER sum at scale 1e12 — exact
  under any partitioning/accumulation order (|M12| ≤ dim·1e6·|W6|max,
  far inside int64);
- sigmoid is the ONLY float op: ``p = round(1/(1+exp(-M12/1e12)), 6)``
  → ``P6 = p·1e6`` (the division, exp and 6dp round are the same IEEE
  ops in Spark and DuckDB; the round absorbs last-ulp exp differences
  — the lm_logppl/textrank pin family);
- gradient ``G12_b = Σ_d (P6_d − Y6_d)·X6_db`` is again an exact
  integer sum (distributed hash agg, order-free) — WIDENED to
  decimal(38,0) / HUGEINT: each term fits int64 (≤ 1e12) but the sum
  over a 10^9-doc training set would not, and exactness is the whole
  point (the float conversion at update time rounds the exact integer
  to the same nearest double in Python and SQL);
- update (driver-side, dim-sized): ``W6 ← W6 − floor(lr·G12/(n·1e6)
  + 0.5)`` — floor(x+0.5) is the pinned rounding (identical in
  Python and SQL; never a banker's-rounding mismatch).

Scale shape: each iteration is two narrow integer hash aggregations
over the (doc, bucket, X6) feature rows — per-doc margin, per-bucket
gradient — plus a dim-row driver update; the model ships back as a
BROADCAST (bucket, w6) join side (a dim-row frame stays small even at
a 2^18 hashing dim, where the earlier literal-array expression
exploded the plan). No windows, no ordered folds over the corpus, no
float accumulation anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SCALE = 1_000_000  # 6dp fixed-point


def _x6(features: DataFrame, id_col: str, weight_col: str) -> DataFrame:
    return features.select(
        id_col,
        "bucket",
        F.expr(f"cast(round({weight_col} * {SCALE}, 0) as bigint)").alias("x6"),
    )


def _margins(x: DataFrame, w6: list[int], id_col: str) -> DataFrame:
    """Per-doc integer margin ``m12 = Σ_b x6·w6`` under the current
    weights, via a BROADCAST join against a (bucket, w6) frame — a
    dim-row table is kilobytes-to-megabytes even at a production
    hashing dim (2^18+), where the previous
    ``element_at(array(<dim literals>), bucket+1)`` form exploded the
    expression tree / codegen. The arithmetic is unchanged: exact
    int64 products, order-free integer sum."""
    import pandas as pd

    spark = x.sparkSession
    w_df = spark.createDataFrame(
        pd.DataFrame({"bucket": range(len(w6)), "w6": w6})
    ).select(F.col("bucket").cast("int"), F.col("w6").cast("long"))
    return (
        x.join(F.broadcast(w_df), "bucket")
        .select(id_col, (F.col("x6") * F.col("w6")).alias("_t"))
        .groupBy(id_col)
        .agg(F.sum("_t").alias("m12"))
    )


def train_linear(
    features: DataFrame,
    labels: DataFrame,
    dim: int,
    iters: int = 3,
    lr: float = 1.0,
    id_col: str = "doc_id",
    weight_col: str = "weight",
    label_col: str = "label",
) -> list[int]:
    """Train logistic-regression weights over sparse hashed features.

    ``features``: (id_col, bucket, weight) — hashing_vectors output.
    ``labels``: (id_col, label∈{0,1}) — every doc to train on; docs
    with no feature rows train with margin 0 (the pinned convention).
    Returns the 6dp-scaled integer weight vector ``W6`` (length dim);
    divide by 1e6 for real weights."""
    x = _x6(features, id_col, weight_col).persist()
    y = labels.select(
        id_col, (F.col(label_col).cast("long") * SCALE).alias("y6")
    )
    n = y.count()
    if n == 0:
        raise ValueError("train_linear with no labeled docs")
    w6 = [0] * dim
    try:
        for _ in range(iters):
            m12 = _margins(x, w6, id_col)
            p6 = (
                y.join(m12, id_col, "left")
                .select(
                    id_col,
                    "y6",
                    F.expr(
                        f"cast(round(1.0 / (1.0 + exp(-(coalesce(m12, 0L)"
                        f" / 1e12))) * {SCALE}, 0) as bigint)"
                    ).alias("p6"),
                )
            )
            g_rows = (
                x.join(p6, id_col)
                .groupBy("bucket")
                .agg(
                    F.sum(
                        ((F.col("p6") - F.col("y6")) * F.col("x6"))
                        .cast("decimal(38,0)")
                    ).alias("g12")
                )
                .collect()
            )
            import math

            g = {int(r["bucket"]): int(r["g12"]) for r in g_rows}
            w6 = [
                w6[b] - math.floor(lr * g.get(b, 0) / (n * SCALE) + 0.5)
                for b in range(dim)
            ]
    finally:
        x.unpersist()
    return w6


def predict_linear(
    features: DataFrame,
    labels: DataFrame,
    w6: list[int],
    id_col: str = "doc_id",
    weight_col: str = "weight",
) -> DataFrame:
    """Score docs under trained weights: (id_col, score) with
    ``score = round(1/(1+exp(-margin)), 6)`` — the same pinned sigmoid;
    ``labels`` supplies the universe of docs (margin-0 docs score 0.5).
    One integer hash agg + a map-only sigmoid — scan-shaped, fit for
    scoring a 100 TB corpus under a trained filter."""
    x = _x6(features, id_col, weight_col)
    m12 = _margins(x, w6, id_col)
    return (
        labels.select(id_col)
        .join(m12, id_col, "left")
        .select(
            id_col,
            F.expr(
                "round(1.0 / (1.0 + exp(-(coalesce(m12, 0L) / 1e12))), 6)"
            ).alias("score"),
        )
    )


def logreg_oracle_sql(
    dim: int,
    iters: int,
    lr: float = 1.0,
    table: str = "documents",
    id_col: str = "doc_id",
    features_sql: str | None = None,
    label_sql: str = "CASE WHEN list_contains("
    "regexp_extract_all(lower(text), '[a-z0-9]+'), 'dup') "
    "THEN 1 ELSE 0 END",
) -> str:
    """Unrolled-CTE DuckDB twin of ``train_linear`` (+ final weights):
    the same fixed-point margins/gradients as integer sums, the same
    pinned sigmoid round and floor(x+0.5) update. ``features_sql``
    defaults to the hashing_vectors twin."""
    from search_engine_spark.operators.text import hashing_vectors_oracle_sql

    feats = features_sql or hashing_vectors_oracle_sql(
        dim, id_col=id_col, table=table
    )
    parts = [
        f"""
        WITH feats AS MATERIALIZED (
            SELECT {id_col}, bucket,
                   round(weight * {SCALE}, 0)::BIGINT AS x6
            FROM ({feats})),
        y AS MATERIALIZED (
            SELECT {id_col}, ({label_sql})::BIGINT * {SCALE} AS y6
            FROM {table}),
        n AS (SELECT count(*) AS n FROM y),
        w0 AS (SELECT unnest(range({dim}))::INT AS bucket, 0::BIGINT AS w6)"""
    ]
    for i in range(1, iters + 1):
        parts.append(f"""
        m{i} AS (
            SELECT f.{id_col}, sum(f.x6 * w.w6)::BIGINT AS m12
            FROM feats f JOIN w{i - 1} w USING (bucket)
            GROUP BY f.{id_col}),
        p{i} AS (
            SELECT y.{id_col}, y.y6,
                   round(1.0 / (1.0 + exp(-(coalesce(m.m12, 0)
                       / 1e12))) * {SCALE}, 0)::BIGINT AS p6
            FROM y LEFT JOIN m{i} m USING ({id_col})),
        g{i} AS (
            SELECT f.bucket, sum((p.p6 - p.y6) * f.x6) AS g12
            FROM feats f JOIN p{i} p USING ({id_col})
            GROUP BY f.bucket),
        w{i} AS (
            SELECT w.bucket,
                   (w.w6 - floor({lr!r} * coalesce(g.g12, 0)
                       / ((SELECT n FROM n) * {SCALE}) + 0.5))::BIGINT AS w6
            FROM w{i - 1} w LEFT JOIN g{i} g USING (bucket))""")
    return (
        ",".join(parts)
        + f"""
        SELECT bucket, round(w6 / {SCALE}.0, 6) AS weight
        FROM w{iters} ORDER BY bucket"""
    )


def logreg_scores_oracle_sql(
    dim: int,
    iters: int,
    lr: float = 1.0,
    table: str = "documents",
    id_col: str = "doc_id",
    features_sql: str | None = None,
    label_sql: str = "CASE WHEN list_contains("
    "regexp_extract_all(lower(text), '[a-z0-9]+'), 'dup') "
    "THEN 1 ELSE 0 END",
) -> str:
    """Twin of ``predict_linear`` under the twin-trained weights: the
    same integer margin + pinned sigmoid, one score per labeled doc
    (featureless docs score 0.5)."""
    body = logreg_oracle_sql(
        dim, iters, lr=lr, table=table, id_col=id_col,
        features_sql=features_sql, label_sql=label_sql,
    )
    head, _tail = body.rsplit("SELECT bucket,", 1)
    return (
        head
        + f""", m_final AS (
            SELECT f.{id_col}, sum(f.x6 * w.w6)::BIGINT AS m12
            FROM feats f JOIN w{iters} w USING (bucket)
            GROUP BY f.{id_col})
        SELECT y.{id_col},
               round(1.0 / (1.0 + exp(-(coalesce(m.m12, 0) / 1e12))), 6)
                 AS score
        FROM y LEFT JOIN m_final m USING ({id_col})"""
    )
