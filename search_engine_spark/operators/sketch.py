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


# ---------------------------------------------------------------------------
# Mergeable log-linear quantile sketch (HdrHistogram layout / DDSketch family)
# ---------------------------------------------------------------------------

LOGHIST_SCALE = 1_000_000  # fixed-point scale: v = floor(|x|*scale + 0.5)
LOGHIST_K = 32             # linear sub-buckets per octave (rel. err <= 1/k)


def _shl(e: str, engine: str) -> str:
    """2^e as an EXACT bigint (never float pow): shiftleft both engines."""
    if engine == "spark":
        return f"shiftleft(cast(1 as bigint), cast({e} as int))"
    return f"(CAST(1 AS BIGINT) << CAST({e} AS BIGINT))"


def _idiv(a: str, b: str, engine: str) -> str:
    """Exact integer division (both operands non-negative bigints)."""
    if engine == "spark":
        return f"(({a}) div ({b}))"
    return f"(({a}) // ({b}))"


def loghist_rep_sql(b: str, engine: str,
                    scale: int = LOGHIST_SCALE, k: int = LOGHIST_K) -> str:
    """Representative value (bucket LOWER edge, signed) for bucket id
    ``b`` — integer-exact until one cast + one IEEE division + round6,
    so Spark and DuckDB agree bit-for-bit."""
    m = f"(abs({b}) - 1)"
    e = _idiv(m, str(k), engine)
    i = f"({m} - {e} * {k})"
    pe = _shl(e, engine)
    lo = f"({pe} + {_idiv(f'({i} * {pe})', str(k), engine)})"
    sgn = f"(case when ({b}) < 0 then -1.0 else 1.0 end)"
    return (
        f"case when ({b}) = 0 then cast(0.0 as double) "
        f"else round({sgn} * cast({lo} as double) / {scale}.0, 6) end"
    )


def loghist_sketch(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    scale: int = LOGHIST_SCALE,
    k: int = LOGHIST_K,
) -> DataFrame:
    """Mergeable quantile sketch: per-group integer counts over
    LOG-LINEAR value buckets (HdrHistogram's layout — Tene,
    github.com/HdrHistogram; the mergeability/accuracy contract of
    DDSketch, Masson et al., VLDB 2019). Complements the pinned-sample
    ``sampled_quantiles``: this one is MERGEABLE (bucket-wise integer
    add — associative, commutative, partition- and order-invariant), so
    shards/partitions/days sketch independently and combine exactly.

    Determinism pin (the DuckDB twin reproduces every step):
    - fixed-point: ``v = floor(|x|*scale + 0.5)`` — one IEEE multiply,
      exact add, exact floor (the repo's floor(x+0.5) device);
    - octave: e0 = floor(log2(v)) is only a GUESS (log/log2 is not
      correctly rounded and differs across libm implementations); it is
      then corrected by EXACT integer comparisons against shiftleft
      powers of two, after which e is engine-independent;
    - sub-bucket: ``i = ((v - 2^e) * k) div 2^e`` — pure int64;
    - bucket id: 0 for v==0, sign(x)*(1 + e*k + i) otherwise — bucket
      order == value order; counts are int64.

    Accuracy: bucket width is 2^e/k at magnitude >= 2^e, so any
    quantile read off bucket edges has relative error <= 1/k plus the
    1/scale fixed-point quantization. Domain: |x|*scale < 2^55 (with
    defaults, |x| <= 3.6e10); values past it — including inf and NaN —
    CLAMP deterministically into the top (e=55, i=0) bucket in both
    engines instead of overflowing int64 and failing the job (one
    outlier row must never kill a 100-TB aggregation).

    Scale shape: the bucket expression is native SQL at the scan
    (whole-stage codegen, no UDF), the only shuffle is the groupBy on
    (group, bucket) with map-side partial counts, and the sketch size
    is structurally bounded (<= ~56*k + 1 buckets per sign per group)
    regardless of row count — the property that makes it a sketch.

    Returns group_cols + (bucket, cnt)."""
    return loghist_bucketize(df, value_col, group_cols, scale, k).groupBy(
        *group_cols, "bucket"
    ).agg(F.count("*").cast("long").alias("cnt"))


def loghist_bucketize(
    df: DataFrame,
    value_col: str,
    keep_cols: Sequence[str] = (),
    scale: int = LOGHIST_SCALE,
    k: int = LOGHIST_K,
    with_value: bool = False,
) -> DataFrame:
    """The sketch's bucket mapping alone: keep_cols + ``bucket`` per
    input row (null values dropped) — shared by the batch sketch and
    the streaming windowed sketch (streaming/quantiles.py), so the
    determinism pin lives in exactly one place. ``with_value=True``
    additionally keeps the clamped fixed-point magnitude ``_v`` (the
    refined sums sketch aggregates it; the plain sketch never pays the
    column)."""
    engine = "spark"
    e0 = "cast(floor(log2(cast(greatest(_v, 1) as double))) as bigint)"
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(
            *keep_cols,
            F.col(value_col).cast("double").alias("_x"),
        )
        .withColumn(
            "_v",
            # clamp into the top octave: one outlier row past the 2^55
            # domain (|x| > ~3.6e10 at the default scale) lands in the
            # top bucket instead of overflowing int64 in the sub-bucket
            # multiply and killing a 100-TB job; the clamp is exact
            # integer math, identical in the DuckDB twin
            # the clamp runs in DOUBLE space so the bigint cast never
            # sees inf/overflow (NaN loses a least() in both engines'
            # NaN-is-greatest total order, so NaN also clamps); 2^55 is
            # exactly representable and its bucket is (e=55, i=0)
            F.expr(
                f"cast(floor(least(abs(_x) * {scale}.0 + 0.5, "
                f"{float(1 << 55)!r})) as bigint)"
            ),
        )
        .withColumn("_vv", F.expr("greatest(_v, 1)"))  # octave math never sees 0
        .withColumn("_e0", F.expr(e0))
        .withColumn(
            "_e",
            F.expr(
                f"case when _vv < {_shl('_e0', engine)} then _e0 - 1 "
                f"when _e0 < 62 and _vv >= {_shl('_e0 + 1', engine)} "
                f"then _e0 + 1 else _e0 end"
            ),
        )
        .withColumn("_pe", F.expr(_shl("_e", engine)))
        .withColumn("_i", F.expr(_idiv(f"(_vv - _pe) * {k}", "_pe", engine)))
        .withColumn(
            "bucket",
            F.expr(
                f"case when _v = 0 then cast(0 as bigint) "
                f"when _x < 0 then -(1 + _e * {k} + _i) "
                f"else 1 + _e * {k} + _i end"
            ),
        )
        .select(*keep_cols, "bucket", *(["_v"] if with_value else []))
    )


def loghist_merge(
    sketches: Sequence[DataFrame], group_cols: Sequence[str] = ()
) -> DataFrame:
    """Combine sketches by bucket-wise integer add — exact under ANY
    split of the input (associative + commutative), the property KLL /
    t-digest only approximate. ``merge(sketch(parts)) == sketch(whole)``
    bit-for-bit (tests/test_loghist.py pins it)."""
    if not sketches:
        raise ValueError("loghist_merge needs at least one sketch")
    u = sketches[0]
    for s in sketches[1:]:
        u = u.unionByName(s)
    return u.groupBy(*group_cols, "bucket").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )


def loghist_quantiles(
    sketch: DataFrame,
    group_cols: Sequence[str] = (),
    ps: tuple[float, ...] = (0.5, 0.9, 0.99),
    scale: int = LOGHIST_SCALE,
    k: int = LOGHIST_K,
) -> DataFrame:
    """Read quantiles off a ``loghist_sketch``: rank pin
    ``r = floor((n-1)*p) + 1`` (lower-rank selection, one IEEE multiply
    + exact floor), answer = representative (lower edge) of the first
    bucket whose cumulative count reaches r.

    The cumulative sum is a bounded THETA-JOIN (b.bucket <= a.bucket),
    never a window: per group the histogram is structurally <= ~2*56*k+1
    rows no matter the data size, so the join is O(buckets^2) tiny work
    and stays fully parallel — same device as rrf_fuse / the docs.py
    terminal cumsum (no single-partition WindowExec, pinned repo-wide).

    Output: group_cols + p<percent> per entry of ``ps`` + n_rows."""
    g = list(group_cols)
    a = sketch.select(
        *[F.col(c).alias(f"_g_{c}") for c in g],
        F.col("bucket").alias("_b"),
    )
    b = sketch.select(
        *[F.col(c).alias(f"_g2_{c}") for c in g],
        F.col("bucket").alias("_b2"),
        F.col("cnt").alias("_c2"),
    )
    cond = F.col("_b2") <= F.col("_b")
    for c in g:
        cond = cond & (F.col(f"_g_{c}") == F.col(f"_g2_{c}"))
    cum = (
        a.join(F.broadcast(b), cond)
        .groupBy(*[f"_g_{c}" for c in g], "_b")
        .agg(F.sum("_c2").alias("_cum"))
    )
    n = sketch.groupBy(
        *[F.col(c).alias(f"_gn_{c}") for c in g]
    ).agg(F.sum("cnt").alias("_n"))
    if g:
        ncond = None
        for c in g:
            eq = F.col(f"_g_{c}") == F.col(f"_gn_{c}")
            ncond = eq if ncond is None else (ncond & eq)
        cum = cum.join(F.broadcast(n), ncond)
    else:
        cum = cum.crossJoin(F.broadcast(n))
    aggs = []
    for p in ps:
        r = f"cast(floor((_n - 1) * {p!r}) as bigint) + 1"
        aggs.append(
            F.expr(
                f"min(case when _cum >= {r} then _b end)"
            ).alias(f"_qb_{_p_name(p)}")
        )
    out = cum.groupBy(*[f"_g_{c}" for c in g]).agg(
        *aggs, F.max("_n").alias("n_rows")
    )
    sel = [F.col(f"_g_{c}").alias(c) for c in g]
    for p in ps:
        nm = _p_name(p)
        sel.append(
            F.expr(
                loghist_rep_sql(f"_qb_{nm}", "spark", scale, k)
            ).alias(nm)
        )
    sel.append(F.col("n_rows"))
    return out.select(*sel)


def loghist_quantiles_from(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    ps: tuple[float, ...] = (0.5, 0.9, 0.99),
    scale: int = LOGHIST_SCALE,
    k: int = LOGHIST_K,
) -> DataFrame:
    """sketch + read-off in one call (the common non-incremental use)."""
    return loghist_quantiles(
        loghist_sketch(df, value_col, group_cols, scale, k),
        group_cols, ps, scale, k,
    )


def loghist_sketch_sums(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    scale: int = LOGHIST_SCALE,
    k: int = LOGHIST_K,
) -> DataFrame:
    """Refined sketch (CLAUDE.md round-4 #9d): ``loghist_sketch`` plus a
    per-bucket SUM of the clamped fixed-point magnitudes, so read-off
    can answer with the bucket MEAN instead of the lower edge. The
    merge contract stays bucket-wise integer add — (cnt, vsum) both add
    exactly under any input split — and the sum is WIDENED to
    decimal(38,0) (DuckDB's native HUGEINT sum in the twin, the logreg
    gradient device) so 2^38 rows of 2^55-magnitude values can't
    overflow an int64 at 100-TB scale.

    Returns group_cols + (bucket, cnt, vsum)."""
    return (
        loghist_bucketize(df, value_col, group_cols, scale, k,
                          with_value=True)
        .groupBy(*group_cols, "bucket")
        .agg(
            F.count("*").cast("long").alias("cnt"),
            F.sum(F.col("_v").cast("decimal(38,0)")).alias("vsum"),
        )
    )


def loghist_merge_sums(
    sketches: Sequence[DataFrame], group_cols: Sequence[str] = ()
) -> DataFrame:
    """Bucket-wise (cnt, vsum) add — same exact-merge property as
    ``loghist_merge``, refined columns included."""
    if not sketches:
        raise ValueError("loghist_merge_sums needs at least one sketch")
    u = sketches[0]
    for s in sketches[1:]:
        u = u.unionByName(s)
    return u.groupBy(*group_cols, "bucket").agg(
        F.sum("cnt").cast("long").alias("cnt"),
        F.sum("vsum").cast("decimal(38,0)").alias("vsum"),
    )


def loghist_quantiles_refined(
    sketch: DataFrame,
    group_cols: Sequence[str] = (),
    ps: tuple[float, ...] = (0.5, 0.9, 0.99),
    scale: int = LOGHIST_SCALE,
    k: int = LOGHIST_K,
) -> DataFrame:
    """Read quantiles off a ``loghist_sketch_sums`` with WITHIN-BUCKET
    refinement: the bucket is chosen by the SAME rank pin as
    ``loghist_quantiles`` (r = floor((n-1)*p)+1, first bucket whose
    cumulative count reaches r, bounded theta-join cumsum — no window),
    but the answer is the bucket's mean value ``round6(sgn · (vsum/cnt)
    / scale)`` instead of its lower edge. The mean lies inside the
    bucket, so the error bound ≤ one bucket width (2^e/k) is kept, and
    when a bucket holds a single distinct value — the common case for
    integer-ish metrics at small magnitudes — the refined answer is
    EXACT. Determinism pin: one decimal→double cast per operand, one
    IEEE division, one round6; DuckDB twin identical
    (``loghist_refined_oracle_sql``)."""
    g = list(group_cols)
    a = sketch.select(
        *[F.col(c).alias(f"_g_{c}") for c in g],
        F.col("bucket").alias("_b"),
    )
    b = sketch.select(
        *[F.col(c).alias(f"_g2_{c}") for c in g],
        F.col("bucket").alias("_b2"),
        F.col("cnt").alias("_c2"),
    )
    cond = F.col("_b2") <= F.col("_b")
    for c in g:
        cond = cond & (F.col(f"_g_{c}") == F.col(f"_g2_{c}"))
    cum = (
        a.join(F.broadcast(b), cond)
        .groupBy(*[f"_g_{c}" for c in g], "_b")
        .agg(F.sum("_c2").alias("_cum"))
    )
    n = sketch.groupBy(
        *[F.col(c).alias(f"_gn_{c}") for c in g]
    ).agg(F.sum("cnt").alias("_n"))
    if g:
        ncond = None
        for c in g:
            eq = F.col(f"_g_{c}") == F.col(f"_gn_{c}")
            ncond = eq if ncond is None else (ncond & eq)
        cum = cum.join(F.broadcast(n), ncond)
    else:
        cum = cum.crossJoin(F.broadcast(n))
    aggs = []
    for p in ps:
        r = f"cast(floor((_n - 1) * {p!r}) as bigint) + 1"
        aggs.append(
            F.expr(f"min(case when _cum >= {r} then _b end)").alias(
                f"_qb_{_p_name(p)}"
            )
        )
    out = cum.groupBy(*[f"_g_{c}" for c in g]).agg(
        *aggs, F.max("_n").alias("n_rows")
    )
    # join each chosen bucket back to its (cnt, vsum) for the mean rep
    for p in ps:
        nm = _p_name(p)
        side = sketch.select(
            *[F.col(c).alias(f"_s_{nm}_{c}") for c in g],
            F.col("bucket").alias(f"_sb_{nm}"),
            F.col("cnt").alias(f"_sc_{nm}"),
            F.col("vsum").alias(f"_sv_{nm}"),
        )
        jcond = F.col(f"_qb_{nm}") == F.col(f"_sb_{nm}")
        for c in g:
            jcond = jcond & (F.col(f"_g_{c}") == F.col(f"_s_{nm}_{c}"))
        out = out.join(F.broadcast(side), jcond, "left")
    sel = [F.col(f"_g_{c}").alias(c) for c in g]
    for p in ps:
        nm = _p_name(p)
        sel.append(
            F.expr(
                f"case when _qb_{nm} is null then cast(null as double) "
                f"when _qb_{nm} = 0 then cast(0.0 as double) else "
                f"round((case when _qb_{nm} < 0 then -1.0 else 1.0 end)"
                f" * (cast(_sv_{nm} as double) / cast(_sc_{nm} as double))"
                f" / {scale}.0, 6) end"
            ).alias(nm)
        )
    sel.append(F.col("n_rows"))
    return out.select(*sel)


def loghist_refined_oracle_sql(
    value_col: str,
    group_cols: Sequence[str] = (),
    ps: tuple[float, ...] = (0.5, 0.9, 0.99),
    scale: int = LOGHIST_SCALE,
    k: int = LOGHIST_K,
    table: str = "events",
) -> str:
    """DuckDB twin of ``loghist_sketch_sums`` → ``loghist_quantiles_
    refined``: same bucket pin, rank pin, HUGEINT vsum, and mean
    representative (one cast per operand, one division, one round)."""
    engine = "duck"
    g = ", ".join(group_cols)
    gcomma = f"{g}, " if g else ""
    part = f"PARTITION BY {g} " if g else ""
    gq = ", ".join(f"q.{c}" for c in group_cols)
    gqcomma = f"{gq}, " if gq else ""
    qs, reps, joins = [], [], []
    for p in ps:
        nm = _p_name(p)
        r = f"CAST(floor((n - 1) * {p!r}) AS BIGINT) + 1"
        qs.append(f"min(CASE WHEN cum >= {r} THEN bucket END) AS qb_{nm}")
        on = " AND ".join(
            [f"h_{nm}.bucket = q.qb_{nm}"]
            + [f"h_{nm}.{c} = q.{c}" for c in group_cols]
        )
        joins.append(f"LEFT JOIN h AS h_{nm} ON {on}")
        reps.append(
            f"CASE WHEN q.qb_{nm} IS NULL THEN CAST(NULL AS DOUBLE) "
            f"WHEN q.qb_{nm} = 0 THEN CAST(0.0 AS DOUBLE) ELSE "
            f"round((CASE WHEN q.qb_{nm} < 0 THEN -1.0 ELSE 1.0 END)"
            f" * (CAST(h_{nm}.vsum AS DOUBLE) / CAST(h_{nm}.cnt AS DOUBLE))"
            f" / {scale}.0, 6) END AS {nm}"
        )
    return f"""
        WITH s1 AS (
            SELECT {gcomma}CAST({value_col} AS DOUBLE) AS x,
                   CAST(floor(least(abs({value_col}) * {scale}.0 + 0.5,
                                    {float(1 << 55)!r})) AS BIGINT) AS v
            FROM {table} WHERE {value_col} IS NOT NULL
        ), s2 AS (
            SELECT *, CAST(floor(log2(CAST(greatest(v, 1) AS DOUBLE))) AS BIGINT) AS e0
            FROM s1
        ), s3 AS (
            SELECT *, CASE WHEN greatest(v, 1) < {_shl('e0', engine)} THEN e0 - 1
                           WHEN e0 < 62 AND greatest(v, 1) >= {_shl('e0 + 1', engine)} THEN e0 + 1
                           ELSE e0 END AS e
            FROM s2
        ), s4 AS (
            SELECT *, {_shl('e', engine)} AS pe FROM s3
        ), s5 AS (
            SELECT *, {_idiv(f'(greatest(v, 1) - pe) * {k}', 'pe', engine)} AS i FROM s4
        ), h AS (
            SELECT {gcomma}
                   CASE WHEN v = 0 THEN CAST(0 AS BIGINT)
                        WHEN x < 0 THEN -(1 + e * {k} + i)
                        ELSE 1 + e * {k} + i END AS bucket,
                   count(*) AS cnt, sum(v) AS vsum
            FROM s5 GROUP BY ALL
        ), c AS (
            SELECT {gcomma}bucket,
                   sum(cnt) OVER ({part}ORDER BY bucket) AS cum,
                   sum(cnt) OVER ({part}) AS n
            FROM h
        ), q AS (
            SELECT {gcomma}{', '.join(qs)}, max(n) AS n_rows
            FROM c GROUP BY ALL
        )
        SELECT * FROM (
            SELECT {gqcomma}{', '.join(reps)}, q.n_rows
            FROM q {' '.join(joins)}
        )
    """


def loghist_oracle_sql(
    value_col: str,
    group_cols: Sequence[str] = (),
    ps: tuple[float, ...] = (0.5, 0.9, 0.99),
    scale: int = LOGHIST_SCALE,
    k: int = LOGHIST_K,
    table: str = "events",
) -> str:
    """DuckDB twin of ``loghist_quantiles_from`` — same fixed-point
    scaler, same exact-corrected octave, same integer sub-bucket, same
    rank pin and lower-edge representative (DuckDB may use a windowed
    cumsum: the no-unpartitioned-window rule is a Spark-executor
    concern, not an oracle one)."""
    engine = "duck"
    g = ", ".join(group_cols)
    gcomma = f"{g}, " if g else ""
    part = f"PARTITION BY {g} " if g else ""
    qs, reps = [], []
    for p in ps:
        nm = _p_name(p)
        r = f"CAST(floor((n - 1) * {p!r}) AS BIGINT) + 1"
        qs.append(
            f"min(CASE WHEN cum >= {r} THEN bucket END) AS qb_{nm}"
        )
        reps.append(f"{loghist_rep_sql(f'qb_{nm}', engine, scale, k)} AS {nm}")
    return f"""
        WITH s1 AS (
            SELECT {gcomma}CAST({value_col} AS DOUBLE) AS x,
                   CAST(floor(least(abs({value_col}) * {scale}.0 + 0.5,
                                    {float(1 << 55)!r})) AS BIGINT) AS v
            FROM {table} WHERE {value_col} IS NOT NULL
        ), s2 AS (
            SELECT *, CAST(floor(log2(CAST(greatest(v, 1) AS DOUBLE))) AS BIGINT) AS e0
            FROM s1
        ), s3 AS (
            SELECT *, CASE WHEN greatest(v, 1) < {_shl('e0', engine)} THEN e0 - 1
                           WHEN e0 < 62 AND greatest(v, 1) >= {_shl('e0 + 1', engine)} THEN e0 + 1
                           ELSE e0 END AS e
            FROM s2
        ), s4 AS (
            SELECT *, {_shl('e', engine)} AS pe FROM s3
        ), s5 AS (
            SELECT *, {_idiv(f'(greatest(v, 1) - pe) * {k}', 'pe', engine)} AS i FROM s4
        ), h AS (
            SELECT {gcomma}
                   CASE WHEN v = 0 THEN CAST(0 AS BIGINT)
                        WHEN x < 0 THEN -(1 + e * {k} + i)
                        ELSE 1 + e * {k} + i END AS bucket,
                   count(*) AS cnt
            FROM s5 GROUP BY ALL
        ), c AS (
            SELECT {gcomma}bucket,
                   sum(cnt) OVER ({part}ORDER BY bucket) AS cum,
                   sum(cnt) OVER ({part}) AS n
            FROM h
        ), q AS (
            SELECT {gcomma}{', '.join(qs)}, max(n) AS n_rows
            FROM c GROUP BY ALL
        )
        SELECT {gcomma}{', '.join(reps)}, CAST(n_rows AS BIGINT) AS n_rows
        FROM q
    """
