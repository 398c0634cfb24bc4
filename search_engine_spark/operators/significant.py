"""Significant-terms aggregation: which terms are disproportionately
frequent in a FOREGROUND doc set (e.g. a query's matched docs) versus
the whole corpus — Elasticsearch's significant_terms aggregation as
public prior art, scored with its default JLH heuristic:

    fgPct = fg_df / n_fg        bgPct = bg_df / n_docs
    jlh   = (fgPct - bgPct) * (fgPct / bgPct)

(the product of the absolute lift and the relative lift — rewards both
"common in the sample" and "rare in the corpus" without collapsing to
singletons the way raw relative lift does).

Pinned semantics (oracle.significant_terms is the twin):

- the foreground is a bounded SAMPLE (a search's top-N doc ids) — the
  ES "sampler aggregation" shape: the corpus-scale side is never
  re-aggregated; background df comes from the index DICTIONARY
  (lemma_stats), so the whole computation is
  O(sample × avg_terms_per_doc) + one broadcast join against stats;
- only terms with fgPct > bgPct (positive signal) and
  fg_df ≥ min_fg_df (default 2 — kills one-doc noise) qualify;
- jlh is computed with ONE pinned float expression shape
  ``(fg/nf - bg/nd) * ((fg/nf) / (bg/nd))`` and rounded to 6dp;
- output order: (jlh desc, term asc), top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def significant_terms(
    fg_tf: DataFrame,
    bg_stats: DataFrame,
    n_fg: int,
    n_docs: int,
    k: int = 10,
    min_fg_df: int = 2,
    term_col: str = "lemma",
) -> DataFrame:
    """``fg_tf``: one row per (doc, term) pair of the FOREGROUND sample
    (already restricted — ≤ sample × avg_terms rows). ``bg_stats``:
    (term_col, df) background document frequencies from the dictionary.
    Returns (term_col, fg_df, bg_df, jlh) top-k.

    The foreground aggregate is tiny, so it broadcasts into the join
    against the (much larger) dictionary — no corpus shuffle at any
    scale."""
    if n_fg <= 0 or n_docs <= 0:
        raise ValueError("need n_fg > 0 and n_docs > 0")
    fg = (
        fg_tf.select(term_col)
        .groupBy(term_col)
        .agg(F.count("*").alias("fg_df"))
        .filter(F.col("fg_df") >= min_fg_df)
    )
    joined = bg_stats.select(
        term_col, F.col("df").alias("bg_df")
    ).join(F.broadcast(fg), term_col)
    fg_pct = F.col("fg_df").cast("double") / F.lit(float(n_fg))
    bg_pct = F.col("bg_df").cast("double") / F.lit(float(n_docs))
    return (
        joined.withColumn(
            "jlh", F.round((fg_pct - bg_pct) * (fg_pct / bg_pct), 6)
        )
        .filter(fg_pct > bg_pct)
        .select(term_col, "fg_df", "bg_df", "jlh")
        .orderBy(F.desc("jlh"), F.asc(term_col))
        .limit(k)
    )


def significant_for_ids(
    docs: DataFrame,
    lemma_stats: DataFrame,
    ids: list[int],
    scope: str | None,
    n_docs: int,
    k: int = 10,
    min_fg_df: int = 2,
) -> DataFrame:
    """Significant-terms panel for a foreground given as doc ids (a
    search's top-N sample): fg (doc, lemma) pairs come from the docs
    table's ``lemma_counts`` (pushed ``doc_id IN`` point reads — lemma
    entries are unique per doc, so exploding them IS the distinct-lemma
    stream), background df from the dictionary semi-joined down to the
    foreground's lemmas BEFORE aggregating scopes — the shuffle is over
    ≤ |fg lemmas| rows, never the whole dictionary. Shared by
    ``SearchEngine.significant_terms`` and ``QueryServer`` so the pins
    live once."""
    fg_tf = (
        docs.filter(F.col("doc_id").isin(ids))
        .select(F.explode("lemma_counts").alias("lc"))
        .select(F.col("lc.lemma").alias("lemma"))
    )
    stats = lemma_stats
    if scope is not None:
        stats = stats.filter(F.col("scope") == scope)
    bg = (
        stats.join(F.broadcast(fg_tf.distinct()), "lemma", "left_semi")
        .groupBy("lemma")
        .agg(F.sum("df").alias("df"))
    )
    return significant_terms(
        fg_tf, bg, n_fg=len(ids), n_docs=n_docs, k=k, min_fg_df=min_fg_df
    )
