"""Corpus-curation operators for training-data pipelines: duplicate-cluster
resolution (distributed connected components over near-dup pairs), offset-based
sequence packing, deterministic stratified sampling, and a quality-filter
funnel report.

These extend the dedup/ANN suite from *pair detection* to *resolution*: a
100-TB curation run needs "which docs form one duplicate cluster and who is
the canonical representative", not just the pair list.

Scale notes:

- ``connected_components`` is the alternating large-star / small-star
  algorithm (Kiveris et al., "Connected Components in MapReduce and Beyond",
  SoCC 2014): O(log^2 n) rounds, every round a pair of groupBy shuffles over
  NARROW (long, long) rows — no vertex ever holds its whole component in
  memory, unlike label propagation whose round count is the graph diameter.
  Near-dup graphs are mostly tiny cliques, so in practice 2-3 rounds.
- ``pack_sequences`` reuses the prefix-bucketed distributed cumulative sum
  from ``operators/docs.py`` (the doc-id machinery) — no single-partition
  window anywhere, same as the id-assignment path.
- ``stratified_sample`` is hash-deterministic (md5 threshold per stratum):
  re-running on the same input yields the same sample on any cluster size,
  and the filter is a plain predicate — pushes down, no shuffle at all.

The reference engine (AlekseyMG/search-engine) has no curation layer; this
suite extends it. All four operators are contract-twinned against DuckDB
(``contract.py``: dedup_clusters / pack_bins / stratified_sample /
quality_funnel).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# connected components (large-star / small-star)
# ---------------------------------------------------------------------------


def _symmetric(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Undirected edge set as (u, v) rows in BOTH orientations, self-loops
    dropped, deduped."""
    e = edges.select(
        F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
    )
    return (
        e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _min_neighbor(sym: DataFrame) -> DataFrame:
    """(u, _m) where _m = min(Γ(u) ∪ {u})."""
    return sym.groupBy("u").agg(
        F.least(F.min("v"), F.first("u")).alias("_m")
    )


def _large_star(sym: DataFrame) -> DataFrame:
    """Connect every neighbor LARGER than u to u's min: {(v, m(u)) : v>u}."""
    m = _min_neighbor(sym)
    return (
        sym.filter(F.col("v") > F.col("u"))
        .join(m, "u")
        .select(F.col("v").alias("u"), F.col("_m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(sym: DataFrame) -> DataFrame:
    """Connect every neighbor ≤ u (and u itself) to the min of that set."""
    small = sym.filter(F.col("v") < F.col("u"))
    m = small.groupBy("u").agg(
        F.least(F.min("v"), F.first("u")).alias("_m")
    )
    out = (
        small.join(m, "u")
        .select(F.col("v").alias("u"), F.col("_m").alias("v"))
        .union(m.select(F.col("u"), F.col("_m").alias("v")))
    )
    return out.filter(F.col("u") != F.col("v")).distinct()


def _fingerprint(e: DataFrame) -> tuple:
    # xor-of-hashes set fingerprint (edges are distinct) — unlike a sum it
    # cannot overflow under ANSI mode
    row = e.agg(
        F.count("*"),
        F.expr("bit_xor(xxhash64(u, v))"),
    ).collect()[0]
    return tuple(row)


def connected_components(
    edges: DataFrame,
    src: str = "a_id",
    dst: str = "b_id",
    max_iter: int = 32,
) -> DataFrame:
    """(node, component) for every node incident to an edge; ``component``
    is the MINIMUM node id in the node's connected component (so the label
    is deterministic and doubles as the canonical cluster representative).

    Alternating large-star / small-star to fixpoint. Each iteration is two
    distributed groupBy+join passes over narrow (long, long) rows with an
    eager ``localCheckpoint`` to truncate the iterative lineage. Singleton
    nodes (no edges) are not emitted — union them in as their own component
    if needed.

    Raises ``RuntimeError`` if ``max_iter`` rounds don't converge (the
    bound for n nodes is O(log^2 n) rounds; 32 covers any real graph).
    """
    e = _symmetric(edges, src, dst)
    if not e.take(1):
        return e.select(
            F.col("u").alias("node"), F.col("v").alias("component")
        )
    prev = None
    for _ in range(max_iter):
        e = _small_star(_large_star(_symmetric(e, "u", "v")))
        e = e.localCheckpoint(eager=True)
        fp = _fingerprint(e)
        if fp == prev:
            break
        prev = fp
    else:
        raise RuntimeError(f"connected_components: no fixpoint in {max_iter} rounds")
    # converged: e is a forest of depth-1 stars (child u -> root v = min)
    return (
        e.select(F.col("u").alias("node"), F.col("v").alias("component"))
        .union(
            e.select(F.col("v").alias("node"), F.col("v").alias("component"))
        )
        .distinct()
    )


def dedup_clusters(
    pairs: DataFrame, id_a: str = "a_id", id_b: str = "b_id"
) -> DataFrame:
    """Resolve verified near-dup PAIRS into duplicate CLUSTERS:
    (doc_id, component, cluster_size), component = min doc_id of the
    cluster (the canonical keeper — drop every doc_id != component)."""
    cc = connected_components(pairs, id_a, id_b)
    sizes = cc.groupBy("component").agg(
        F.count("*").cast("long").alias("cluster_size")
    )
    return (
        cc.join(sizes, "component")
        .select(F.col("node").alias("doc_id"), "component", "cluster_size")
    )


# ---------------------------------------------------------------------------
# offset-based sequence packing
# ---------------------------------------------------------------------------

# zero-pad width for numeric ids rendered as order-preserving strings; 18
# digits covers the full int64-positive range of dense doc ids
_PACK_PAD = 18
# prefix lengths (fine → coarse) for the bucketed cumsum over padded ids:
# each level buckets 1000 rows of the level below, so the non-windowed
# base case sees ≤ |docs|/10^9 rows — bounded even at 10^12 docs
PACK_PREFIX_LENS: tuple[int, ...] = (_PACK_PAD - 3, _PACK_PAD - 6, _PACK_PAD - 9)


def pack_sequences(
    docs: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    prefix_lens: tuple[int, ...] = PACK_PREFIX_LENS,
) -> DataFrame:
    """Assign each doc to a training-sequence bin by its START OFFSET in
    the token stream: docs are concatenated in ``id_col`` order and
    ``bin = floor(exclusive_cumsum(tokens) / budget)`` — the shard a
    sequence-packing writer would start this doc in. Offset-based (not
    greedy-reset) packing so the assignment is a pure prefix sum:
    distributed via the same prefix-bucketed cumsum as the doc-id scheme
    (``operators/docs.py:_exclusive_cumsum`` — no single-partition window).

    Input needs (id_col:int, tokens_col:int); returns
    (doc_id, n_tokens, bin).
    """
    from search_engine_spark.operators.docs import _exclusive_cumsum

    sizes = docs.select(
        F.lpad(F.col(id_col).cast("string"), _PACK_PAD, "0").alias("_k"),
        F.col(tokens_col).cast("long").alias("_tok"),
    )
    off = _exclusive_cumsum(sizes, "_k", "_tok", "_off", prefix_lens)
    return off.select(
        F.col("_k").cast("long").alias(id_col),
        F.col("_tok").alias(tokens_col),
        F.floor(F.col("_off") / budget).cast("long").alias("bin"),
    )


def pack_bins(
    docs: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Per-bin rollup of ``pack_sequences``: (bin, n_docs, tokens)."""
    return (
        pack_sequences(docs, budget, id_col, tokens_col)
        .groupBy("bin")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(tokens_col).cast("long").alias("tokens"),
        )
    )


# ---------------------------------------------------------------------------
# deterministic stratified sampling
# ---------------------------------------------------------------------------


def _hex_threshold(fraction: float) -> str:
    """fraction ∈ [0,1] → threshold; keep iff
    substring(md5(key),1,8) < threshold (string compare on lowercase hex —
    identical in Spark and DuckDB). fraction >= 1.0 returns "g", which
    sorts above every 8-hex-digit string on both engines, so a
    keep-everything stratum really keeps the ~2^-32 rows whose hash
    prefix is exactly "ffffffff" too (a strict < against "ffffffff"
    silently dropped them)."""
    n = int(fraction * 16**8)
    if n >= 16**8:
        return "g"
    return format(n, "08x")


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    strata_col: str = "lang",
    key_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-stratum Bernoulli sample: row kept iff the first 8
    hex digits of md5(key) fall under the stratum's threshold. Same input →
    same sample on any cluster size / partitioning (unlike
    ``DataFrame.sampleBy``, which is seed+partition dependent), and the
    predicate is scan-pushable — sampling 1% of 100 TB shuffles nothing."""
    h = F.substring(
        F.md5(F.col(key_col).cast("string").cast("binary")), 1, 8
    )
    cond = None
    for stratum, frac in sorted(fractions.items()):
        c = (F.col(strata_col) == stratum) & (h < _hex_threshold(frac))
        cond = c if cond is None else cond | c
    others = ~F.col(strata_col).isin(list(fractions)) & (
        h < _hex_threshold(default_fraction)
    )
    return df.filter(others if cond is None else cond | others)


def stratified_sample_oracle_sql(
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    strata_col: str = "lang",
    key_col: str = "doc_id",
    table: str = "documents",
) -> str:
    """DuckDB twin of ``stratified_sample`` (same md5-threshold math)."""
    h = f"substring(md5({key_col}::VARCHAR), 1, 8)"
    arms = " OR ".join(
        f"({strata_col} = '{s}' AND {h} < '{_hex_threshold(f)}')"
        for s, f in sorted(fractions.items())
    )
    known = ", ".join(f"'{s}'" for s in sorted(fractions))
    other = (
        f"({strata_col} NOT IN ({known}) "
        f"AND {h} < '{_hex_threshold(default_fraction)}')"
    )
    where = f"{arms} OR {other}" if arms else other
    return f"SELECT * FROM {table} WHERE {where}"


# ---------------------------------------------------------------------------
# sliding-window chunking (training-sample preparation)
# ---------------------------------------------------------------------------


def chunk_windows(
    docs: DataFrame,
    window: int,
    overlap: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document's whitespace-token stream into sliding windows
    of ``window`` tokens advancing by ``window - overlap`` — the
    fixed-context-chunk preparation step of a training pipeline (long
    docs become multiple samples, ``overlap`` preserves cross-boundary
    context). Returns (id, chunk_idx, n_tokens, chunk).

    Pinned semantics (the DuckDB contract twin computes the same):
    tokens = ``[^\\s]+`` runs of the RAW text (case/punctuation kept —
    chunking must not destroy the training text; same token rule as
    ``text.token_counts`` n_ws_tokens); starts = 0, step, 2·step, ...
    while start < n_tokens (so a doc with ≤ ``window`` tokens emits
    exactly one chunk, an empty doc none; the trailing chunk may be
    short — ``n_tokens`` lets consumers drop tails); chunk text =
    tokens joined by a single space.

    Scale shape: one map-only pass of native higher-order functions
    (regexp → sequence → transform/slice → explode) — whole-stage
    codegen, zero shuffle, zero Python; row inflation is exactly the
    chunk count, which is the point of the operator."""
    if window <= 0 or overlap < 0 or overlap >= window:
        raise ValueError("need window > 0 and 0 <= overlap < window")
    step = window - overlap
    toks = docs.select(
        id_col,
        F.expr(f"regexp_extract_all({text_col}, '[^\\\\s]+', 0)").alias("_t"),
    ).filter(F.size("_t") > 0)
    chunks = F.expr(
        f"transform(sequence(0, size(_t) - 1, {step}), s -> struct("
        f"cast(s / {step} as long) AS chunk_idx, "
        f"cast(least({window}, size(_t) - s) as long) AS n_tokens, "
        f"array_join(slice(_t, s + 1, {window}), ' ') AS chunk))"
    )
    return (
        toks.select(id_col, F.explode(chunks).alias("_c"))
        .select(id_col, "_c.chunk_idx", "_c.n_tokens", "_c.chunk")
    )


def chunk_windows_oracle_sql(
    window: int,
    overlap: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
    table: str = "documents",
) -> str:
    """DuckDB twin of ``chunk_windows`` (same pinned token/start rules)."""
    step = window - overlap
    return f"""
        WITH t AS (
            SELECT {id_col},
                   regexp_extract_all({text_col}, '[^\\s]+') AS tk
            FROM {table}),
        s AS (
            SELECT {id_col}, tk, unnest(range(0, len(tk), {step})) AS st
            FROM t WHERE len(tk) > 0)
        SELECT {id_col},
               (st / {step})::BIGINT AS chunk_idx,
               least({window}, len(tk) - st)::BIGINT AS n_tokens,
               array_to_string(tk[st + 1 : st + {window}], ' ') AS chunk
        FROM s
    """


# ---------------------------------------------------------------------------
# mixture rates (token-budget data mixing)
# ---------------------------------------------------------------------------


def mixture_rates(
    docs: DataFrame,
    target: dict[str, float],
    token_budget: int,
    source_col: str = "source",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Per-source Bernoulli keep-rates that hit a token-mixture target
    under a global budget — the data-mixing step of a training pipeline
    (choose how much of each domain/source goes into the run):
    ``rate = round(least(1, budget * prop / source_tokens), 6)``
    (pinned; the DuckDB contract twin computes the same expression).
    Returns (source, n_docs, n_tokens, target_prop, rate); only sources
    named in ``target`` appear. A source whose corpus holds fewer
    tokens than its budget share caps at rate 1 (the shortfall is
    reported, not silently redistributed).

    Composition: the ≤|sources| result rows collect into a dict and
    feed ``stratified_sample(docs, rates, strata_col=source_col)`` —
    the deterministic md5-threshold sample then materializes the mix
    with a scan-pushable predicate (nothing shuffles at any scale).
    The rollup itself is one map-side-combined hash agg keyed by
    source, joined to the broadcast target table."""
    spark = docs.sparkSession
    tgt = spark.createDataFrame(
        [(s, float(p)) for s, p in sorted(target.items())],
        f"{source_col} string, target_prop double",
    )
    per = docs.groupBy(source_col).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(tokens_col).cast("long").alias("n_tokens"),
    )
    rate = F.round(
        F.least(
            F.lit(1.0),
            F.lit(float(token_budget)) * F.col("target_prop")
            / F.col("n_tokens").cast("double"),
        ),
        6,
    )
    return per.join(F.broadcast(tgt), source_col).select(
        source_col, "n_docs", "n_tokens", "target_prop",
        rate.alias("rate"),
    )


def mixture_rates_oracle_sql(
    target: dict[str, float],
    token_budget: int,
    source_col: str = "source",
    tokens_col: str = "n_chars",
    table: str = "documents",
) -> str:
    """DuckDB twin of ``mixture_rates`` (same pinned rate expression)."""
    vals = ", ".join(
        f"('{s}', {float(p)!r})" for s, p in sorted(target.items())
    )
    return f"""
        WITH tgt({source_col}, target_prop) AS (VALUES {vals}),
        per AS (
            SELECT {source_col}, count(*) AS n_docs,
                   sum({tokens_col}) AS n_tokens
            FROM {table} GROUP BY 1)
        SELECT per.{source_col}, n_docs::BIGINT AS n_docs,
               n_tokens::BIGINT AS n_tokens, target_prop,
               round(least(1.0, {float(token_budget)!r} * target_prop
                     / n_tokens::DOUBLE), 6) AS rate
        FROM per JOIN tgt ON tgt.{source_col} = per.{source_col}
    """


# ---------------------------------------------------------------------------
# quality-filter funnel
# ---------------------------------------------------------------------------


def quality_funnel(
    docs: DataFrame,
    rules: list[tuple[str, str]],
    keep_label: str = "kept",
) -> DataFrame:
    """Curation funnel report: each doc is claimed by the FIRST rule whose
    SQL predicate it fails (rules are (stage_name, sql_bool_expr), ordered);
    docs passing every rule land in ``keep_label``. Returns
    (stage, n_docs) — one conditional aggregation pass, no UDFs."""
    stage = None
    for name, expr in rules:
        c = F.when(F.expr(expr), F.lit(name))
        stage = c if stage is None else stage.when(F.expr(expr), F.lit(name))
    stage = (
        F.lit(keep_label) if stage is None else stage.otherwise(F.lit(keep_label))
    )
    return docs.groupBy(stage.alias("stage")).agg(
        F.count("*").cast("long").alias("n_docs")
    )


# ---------------------------------------------------------------------------
# benchmark decontamination (n-gram overlap)
# ---------------------------------------------------------------------------


def decontaminate(
    doc_shingles: DataFrame,
    eval_shingles: DataFrame,
    threshold_num: int = 4,
    threshold_den: int = 5,
    max_shingle_df: int | None = None,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Benchmark-decontamination report: every (training doc, eval item)
    pair whose DISTINCT-shingle overlap covers at least
    ``threshold_num/threshold_den`` of the eval item's shingles →
    (doc_id, eval_id, n_shared, eval_total), ordered (doc_id, eval_id).
    The flagged doc_ids are the ones a training run must drop so the
    benchmark stays a held-out measurement — the n-gram-overlap rule is
    the published decontamination recipe of the GPT-3 / Gopher / PaLM
    training-set appendices (public technique).

    Inputs must be DISTINCT (doc_id, sh) / (eval_id, sh) pairs (shingle
    builders like contract._shingles already are); counts assume it.

    Scale shape — the reasons this survives 100 TB:

    - The eval side is a *benchmark*, thousands of items, not a corpus:
      with ``broadcast_eval`` (default) both the shingle join and the
      totals join are BroadcastHashJoins, so the corpus-sized side
      streams map-side with NO shuffle at all; the only shuffle is the
      (doc_id, eval_id) count agg, whose input is already pruned to
      matching shingles.
    - ``max_shingle_df`` drops shingles present in more than that many
      training docs before matching: boilerplate n-grams (licence
      headers, navigation chrome) are not contamination evidence, and
      they are exactly the skewed join keys that would hot-spot the agg.
      The heavy-hitter set is by definition small → broadcast anti-join.
      ``eval_total`` counts only surviving (matchable) shingles, so the
      threshold stays a fraction of what COULD match.
    - Integer cross-multiplication (``n_shared * den >= total * num``)
      keeps the threshold exact — no float ratio to disagree across
      engines.
    """
    ds, ev = doc_shingles, eval_shingles
    if max_shingle_df is not None:
        hot = (
            ds.groupBy("sh")
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") > max_shingle_df)
            .select("sh")
        )
        ds = ds.join(F.broadcast(hot), "sh", "left_anti")
        ev = ev.join(F.broadcast(hot), "sh", "left_anti")
    totals = ev.groupBy("eval_id").agg(
        F.count("*").cast("long").alias("eval_total")
    )
    if broadcast_eval:
        ev, totals = F.broadcast(ev), F.broadcast(totals)
    return (
        ds.join(ev, "sh")
        .groupBy("doc_id", "eval_id")
        .agg(F.count("*").cast("long").alias("n_shared"))
        .join(totals, "eval_id")
        .filter(
            F.col("n_shared") * F.lit(threshold_den)
            >= F.col("eval_total") * F.lit(threshold_num)
        )
        .select("doc_id", "eval_id", "n_shared", "eval_total")
        .orderBy("doc_id", "eval_id")
    )


def shuffle_assign(
    docs: DataFrame,
    n_shards: int,
    key_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Deterministic global training-data shuffle (the webdataset /
    T5-span-corruption export shape): every row gets a pseudorandom
    ``shard`` (0..n_shards-1) and a ``sort_key`` defining a pseudorandom
    TOTAL order within its shard — the classic hash-shuffle that
    decorrelates adjacent training examples without any RNG state.

    Pins (DuckDB contract twin ``shuffle_shards``): h = md5(salt ||
    key) hex; shard = int(h[:8], 16) % n_shards; sort_key = h. Same
    input + salt → identical shards and order at ANY partitioning or
    cluster size (the md5 keys are the shuffle — no seed to thread
    through executors); a new salt is a fresh epoch permutation.

    Scale shape: map-only. The companion ``write_training_shards``
    turns it into one repartition-by-shard + in-partition sort — one
    shuffle to materialize a fully shuffled 100 TB export."""
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    h = F.md5(
        F.concat(F.lit(salt), F.col(key_col).cast("string")).cast("binary")
    )
    return docs.withColumn("_h", h).select(
        "*",
        (F.expr("cast(conv(substring(_h, 1, 8), 16, 10) as bigint)")
         % n_shards).cast("int").alias("shard"),
        F.col("_h").alias("sort_key"),
    ).drop("_h")


def write_training_shards(
    docs: DataFrame,
    out_dir: str,
    n_shards: int,
    key_col: str = "doc_id",
    salt: str = "",
) -> None:
    """Materialize the deterministic shuffle: ONE hash repartition to
    shard granularity + an in-partition sort (no global sort — the
    total order lives inside each shard file), written as
    ``shard=<i>/`` parquet partitions any loader can stream."""
    assigned = shuffle_assign(docs, n_shards, key_col=key_col, salt=salt)
    (
        assigned.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "sort_key")
        .write.partitionBy("shard")
        .mode("overwrite")
        .parquet(out_dir)
    )


def shuffle_assign_oracle_sql(
    n_shards: int,
    key_col: str = "doc_id",
    salt: str = "",
    table: str = "documents",
) -> str:
    """DuckDB twin of ``shuffle_assign`` (same md5 shard/sort pins)."""
    h = f"md5('{salt}' || {key_col}::VARCHAR)"
    return f"""
        SELECT {key_col},
               (('0x' || substring({h}, 1, 8))::BIGINT % {n_shards})::INT
                 AS shard,
               {h} AS sort_key
        FROM {table}
    """
