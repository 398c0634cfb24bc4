"""Sketches: KMV distinct-count estimation and Misra–Gries heavy hitters.

At 100-TB scale, exact ``COUNT(DISTINCT key)`` per group is a full
shuffle of every distinct key; the KMV sketch (Bar-Yossef et al. 2002,
"Counting distinct elements in a data stream"; the same estimator family
as DataSketches' theta sketch) answers it from the k smallest hash
values: with h uniform on (0, 1), the k-th smallest order statistic
estimates density, so ``distinct ≈ (k-1) / h_(k)``. Shuffled volume
drops from |distinct| rows to ≤ k rows per group per partition.

Determinism pins (the DuckDB contract twin reproduces every step):
- hash = the repo's pinned 60-bit md5 hash (``operators/dedup.TOKHASH_SQL``),
  identical in Spark and DuckDB; NULL keys are excluded.
- estimate = ``round((k-1) * 2^60 / h_k, 6)`` with h_k the k-th smallest
  DISTINCT hash (all intermediates exact in float64 for k ≤ 2^53/2^60-safe
  sizes; the division is one IEEE op, identical across engines).
- exact fallback: a group with fewer than k distinct hashes returns its
  exact distinct count (the standard KMV small-cardinality branch).

Scale shape: one Arrow ``mapInPandas`` combiner keeps the k smallest
distinct hashes per group per partition (bounded memory: k × |groups in
partition|), so the single shuffle moves ≤ k × partitions rows per
group; the final per-group fold is a tiny ``collect_set`` over those
survivors. The combiner is lossless for the k global minima: any hash
among the global k smallest is among the k smallest of every partition
it appears in.

``frequent_items`` is the heavy-hitters twin (Misra–Gries 1982): exact
counts of every key whose share is ≥ num/den of all rows, WITHOUT
shuffling the full key domain. Pass 1 runs a Misra–Gries summary with
k = ⌈den/num⌉ counters per partition and unions the survivors — by the
pigeonhole bound a key with global count > n/k must exceed n_p/k in at
least one partition, so the union is a guaranteed SUPERSET of the heavy
hitters; pass 2 exactly recounts only candidate-matched rows (map-side
partial agg over a broadcast IN filter) and applies the integer-exact
threshold ``cnt * den >= num * n`` (no float compare, identical in the
DuckDB twin, which is the plain full GROUP BY). Two narrow scans replace
one full-domain shuffle — at 10^12 tokens the domain is the problem, not
the row count.

The reference engine has no sketches — this extends it with the
cardinality telemetry a large-scale pipeline needs (vocabulary growth,
per-source dedup ratios, hot-term detection) without a COUNT(DISTINCT)
or full-vocabulary shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from search_engine_spark.operators.dedup import TOKHASH_SQL

_HASH_SPAN = 2.0 ** 60  # hashes are uniform on [0, 2^60)


def _prune_partitions(
    group_cols: Sequence[str], k: int
) -> "callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]]":
    """Per-partition KMV combiner: retain the k smallest distinct ``_h``
    per group. Trims lazily at 4k to keep the per-batch cost amortized."""
    gcols = list(group_cols)

    def prune(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: dict[tuple, set] = {}
        for pdf in it:
            if pdf.empty:
                continue
            if gcols:
                grouped = pdf.groupby(gcols, sort=False, dropna=False)
                items = ((g if isinstance(g, tuple) else (g,), sub)
                         for g, sub in grouped)
            else:
                items = [((), pdf)]
            for g, sub in items:
                s = acc.setdefault(g, set())
                s.update(sub["_h"].tolist())
                if len(s) > 4 * k:
                    acc[g] = set(sorted(s)[:k])
        for g, s in acc.items():
            kept = sorted(s)[:k]
            out = {c: [g[i]] * len(kept) for i, c in enumerate(gcols)}
            out["_h"] = kept
            yield pd.DataFrame(out)

    return prune


def kmv_distinct(
    df: DataFrame,
    key_col: str,
    k: int = 256,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Estimated ``COUNT(DISTINCT key_col)`` per ``group_cols`` group
    (one global row when no groups) as ``distinct_est`` (float64, 6dp;
    exact count when the group has < k distinct keys). NULL keys are
    excluded. See module docstring for the pins and the scale shape."""
    if k < 2:
        raise ValueError("k must be >= 2")
    gcols = list(group_cols)
    hashed = (
        df.filter(F.col(key_col).isNotNull())
        .select(*gcols, F.expr(TOKHASH_SQL.format(col=key_col)).alias("_h"))
    )
    fields = [hashed.schema[c] for c in gcols] + [
        T.StructField("_h", T.LongType())
    ]
    pruned = hashed.mapInPandas(
        _prune_partitions(gcols, k), schema=T.StructType(fields)
    )
    hs = F.slice(F.array_sort(F.collect_set("_h")), 1, k).alias("_hs")
    agg = pruned.groupBy(*gcols).agg(hs) if gcols else pruned.agg(hs)
    est = (
        F.when(F.size("_hs") < k, F.size("_hs").cast("double"))
        .otherwise(
            F.round(
                F.lit(float(k - 1)) * F.lit(_HASH_SPAN)
                / F.element_at("_hs", k).cast("double"),
                6,
            )
        )
        .alias("distinct_est")
    )
    return agg.select(*gcols, est)


def _mg_summary(counts: dict, budget: int) -> None:
    """In-place generalized Misra–Gries decrement: shrink ``counts`` to
    at most ``budget`` keys by subtracting the (budget+1)-th largest
    count from every key and dropping non-positives. Each surviving
    count is an UNDERCOUNT by at most n_partition/budget — only the
    superset property is used downstream, never these counts."""
    if len(counts) <= budget:
        return
    cut = sorted(counts.values(), reverse=True)[budget]
    for key in [k for k, v in counts.items() if v - cut <= 0]:
        del counts[key]
    for key in counts:
        counts[key] -= cut


def frequent_items(
    df: DataFrame,
    key_col: str,
    share_num: int = 1,
    share_den: int = 100,
) -> DataFrame:
    """All keys occurring in at least ``share_num/share_den`` of the
    non-null rows, with their EXACT counts, as ``(key_col, cnt)``.
    Misra–Gries candidate pass + exact recount of candidates only — see
    module docstring for the guarantee and the scale shape."""
    if not (0 < share_num < share_den):
        raise ValueError("need 0 < share_num < share_den")
    budget = -(-share_den // share_num)  # ceil: MG counters per partition
    rows = df.filter(F.col(key_col).isNotNull()).select(key_col)
    key_field = rows.schema[key_col]

    def mg(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: dict = {}
        for pdf in it:
            for key, c in pdf[key_col].value_counts().items():
                counts[key] = counts.get(key, 0) + int(c)
            _mg_summary(counts, budget)
        if counts:
            yield pd.DataFrame({key_col: list(counts.keys())})

    candidates = rows.mapInPandas(mg, schema=T.StructType([key_field]))
    n_total = rows.count()
    exact = (
        rows.join(F.broadcast(candidates.distinct()), key_col)
        .groupBy(key_col)
        .agg(F.count("*").alias("cnt"))
    )
    return exact.filter(
        F.col("cnt") * F.lit(share_den) >= F.lit(share_num) * F.lit(n_total)
    )


def frequent_items_sql(
    table_expr: str,
    key_col: str,
    share_num: int,
    share_den: int,
) -> str:
    """DuckDB twin of ``frequent_items``: the plain full GROUP BY with
    the same integer-exact threshold."""
    return f"""
        SELECT {key_col}, count(*) AS cnt
        FROM {table_expr}
        WHERE {key_col} IS NOT NULL
        GROUP BY {key_col}
        HAVING count(*) * {share_den} >= {share_num} * (
            SELECT count(*) FROM {table_expr} WHERE {key_col} IS NOT NULL
        )
    """


def kmv_distinct_sql(
    table_expr: str,
    key_col: str,
    k: int,
    group_cols: Sequence[str] = (),
) -> str:
    """The DuckDB twin of ``kmv_distinct`` (same hash, same order
    statistic, same 6dp estimate) — used by the driver contract and
    usable as a standalone oracle for any table."""
    gcols = list(group_cols)
    gsel = (", ".join(gcols) + ", ") if gcols else ""
    part = f"PARTITION BY {', '.join(gcols)} " if gcols else ""
    return f"""
        WITH h AS (
            SELECT DISTINCT {gsel}
                   (('0x' || substr(md5({key_col}), 1, 15))::BIGINT) AS hv
            FROM {table_expr}
            WHERE {key_col} IS NOT NULL
        ),
        r AS (
            SELECT {gsel} hv,
                   row_number() OVER ({part}ORDER BY hv) AS rn,
                   count(*) OVER ({part.rstrip() or 'PARTITION BY 1'}) AS n
            FROM h
        )
        SELECT {gsel}
               CASE WHEN n < {k} THEN n::DOUBLE
                    ELSE round({float(k - 1)} * pow(2.0, 60) / hv::DOUBLE, 6)
               END AS distinct_est
        FROM r
        WHERE rn = least(n, {k})
    """


# ---------------------------------------------------------------------------
# approximate quantiles via deterministic hash sampling
# ---------------------------------------------------------------------------


def sampled_quantiles(
    df: DataFrame,
    value_col: str,
    key_col: str,
    group_cols: list[str],
    ps: tuple[float, ...] = (0.5, 0.9, 0.99),
    fraction: float = 0.25,
) -> DataFrame:
    """Per-group approximate quantiles from a DETERMINISTIC hash sample —
    the scale path next to the exact ``percentile`` rollup (contract
    ``events_quantiles``): exact interpolated quantiles hold every group
    value in the aggregation state, which at 10^12 rows is the memory
    problem; sampling first caps the state at ~fraction·|group| and the
    estimator error concentrates as O(1/sqrt(fraction·n)) (the classic
    sample-quantile bound — the same accuracy/space dial as a KLL/
    t-digest sketch, but with a pinned, partition-invariant sample).

    Pins (the DuckDB twin reproduces every step):
    - sample: keep iff ``substring(md5(key), 1, 8) < threshold(fraction)``
      — the repo's md5-threshold Bernoulli device (curate.py): same
      sample at ANY partitioning/cluster size, no RNG state; the filter
      evaluates map-side AT the scan, so unsampled rows never reach the
      aggregation (they are read — md5 of a column can't prune pages —
      but neither shuffled nor held in state);
    - quantiles ON the sample: the exact (n-1)p sorted-order
      interpolation both engines share (Spark ``percentile`` ==
      DuckDB ``quantile_cont``), rounded 6dp.

    Output columns: group_cols + ``p<percent>`` per entry of ``ps``
    (0.5 → p50) + ``n_sampled``."""
    from search_engine_spark.operators.curate import _hex_threshold

    h = F.substring(
        F.md5(F.col(key_col).cast("string").cast("binary")), 1, 8
    )
    samp = df.filter(h < _hex_threshold(fraction))
    aggs = [
        F.round(
            F.expr(f"percentile({value_col}, {p!r})"), 6
        ).alias(_p_name(p))
        for p in ps
    ] + [F.count("*").alias("n_sampled")]
    return samp.groupBy(*group_cols).agg(*aggs)


def _p_name(p: float) -> str:
    s = f"{p * 100:g}".replace(".", "_")
    return f"p{s}"


def sampled_quantiles_oracle_sql(
    value_col: str,
    key_col: str,
    group_cols: list[str],
    ps: tuple[float, ...] = (0.5, 0.9, 0.99),
    fraction: float = 0.25,
    table: str = "events",
) -> str:
    """DuckDB twin of ``sampled_quantiles`` (same md5-threshold sample,
    same quantile_cont interpolation)."""
    from search_engine_spark.operators.curate import _hex_threshold

    g = ", ".join(group_cols)
    qs = ", ".join(
        f"round(quantile_cont({value_col}, {p!r}), 6) AS {_p_name(p)}"
        for p in ps
    )
    return f"""
        SELECT {g}, {qs}, count(*) AS n_sampled
        FROM {table}
        WHERE substring(md5({key_col}::VARCHAR), 1, 8)
              < '{_hex_threshold(fraction)}'
        GROUP BY {g}
    """
