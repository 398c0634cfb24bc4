"""Attribute-filtered search: non-scoring filter postings (the Lucene
FILTER-occur / Elasticsearch ``post_filter``-less ``filter`` clause
analog — the reference engine has no equivalent; semantics are pinned by
``oracle.oracle.search(filters=...)``).

Docs carry low-cardinality attributes (``role``, ``tool`` in the
transcripts input schema). A filtered query — ``search("merge sort",
filters={"role": "assistant"})`` — must restrict the candidate set
WITHOUT touching scoring (survivors keep their unfiltered BM25 scores)
and WITHOUT scanning the docs table at query time. The classic inverted-
index answer is FILTER POSTINGS: per attribute value, the sorted doc_id
posting list, stored in the SAME compressed block format and the SAME
doc-range sharding as term postings (operators/compress.py), in a
separate ``filters/`` table so dictionary stats (df/cf, the 5% cutoff,
``statistics()``) never see them.

Query plan shape (scale-critical): the filter lemmas' blocks ride the
same pruned parquet scan as the query terms' blocks (a ``lemma IN``
pushed filter on ``filters/`` unioned into the kernel input); each WAND
kernel intersects its shard's candidates with the shard-local filter
set — no join against docs, no broadcast of a corpus-sized id set. A
filter lemma is hot (df ≈ corpus/|values|), so its block list is long,
but the kernels only DECODE blocks that can still matter (the
conjunctive kernel's touched-block discipline; the membership set is
one linear decode of the shard's filter blocks, same as ``-term``
exclusions).

Pinned semantics (oracle.search ``filters`` is the twin):
- ``filters``: {column: value-or-list}. A doc survives iff for EVERY
  filtered column its value is one of the listed values (AND across
  columns, OR within a column).
- NULL attribute values emit no filter posting → never match a filter.
- Non-scoring: idf, avgdl and the df-cutoff gates are computed from the
  positive terms exactly as if unfiltered; application point is after
  the gates, before the top-k cut (the same slot as ``-term``
  exclusions — the two compose).

Lifecycle: built per bucket by IndexBuildJob (checkpointed ``filters``
stage), rebuilt per TOUCHED bucket on upsert/rebalance — maintenance is
O(changed buckets), like every other index family.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# attribute columns indexed as filter postings (the transcripts input
# schema's low-cardinality doc attributes). "date" is the calendar
# family derived from ``ts``: every non-NULL-ts doc posts under its
# day, month and year lemmas (3 rows/doc), so a date-range query
# expands to the MINIMAL mixed-granularity cover of the range — a full
# year is 1 lemma, not 365 (the Lucene/ES date-histogram rollup idea
# applied to filter postings; at 10^12 turns a multi-year range stays
# a handful of hot posting lists instead of thousands).
FILTER_COLS = ("date", "role", "tool")

_SEP = "="  # filter lemma = "col=value"; analyzed lemmas ([a-zа-я0-9]+,
# functions/analyze.TOKEN_RE) can never contain '=', so filter lemmas
# cannot collide with scored or excluded terms inside a kernel group.


def filter_lemma(col: str, value: str) -> str:
    return f"{col}{_SEP}{value}"


def date_cover(frm: str, to: str) -> tuple[str, ...]:
    """Minimal mixed-granularity lemma cover of the INCLUSIVE calendar-day
    range [frm, to] (ISO 'YYYY-MM-DD', UTC — the session timezone is
    pinned UTC in sources/session.py). Greedy left-to-right: a whole year
    inside the range emits its year lemma, a whole month its month lemma,
    anything else day lemmas. The union of the covered docs is EXACTLY
    the docs whose ts-day falls in the range, because every doc posts
    under all three granularities (build_filter_flat)."""
    from datetime import date, timedelta

    cur, end = date.fromisoformat(frm), date.fromisoformat(to)
    if cur > end:
        raise ValueError(f"empty date range: {frm!r} > {to!r}")
    out: list[str] = []
    while cur <= end:
        if cur.month == 1 and cur.day == 1 and date(cur.year, 12, 31) <= end:
            out.append(f"date{_SEP}y:{cur.year:04d}")
            cur = date(cur.year + 1, 1, 1)
            continue
        nxt = (
            date(cur.year + 1, 1, 1)
            if cur.month == 12
            else date(cur.year, cur.month + 1, 1)
        )
        if cur.day == 1 and nxt - timedelta(days=1) <= end:
            out.append(f"date{_SEP}m:{cur:%Y-%m}")
            cur = nxt
        else:
            out.append(f"date{_SEP}d:{cur:%Y-%m-%d}")
            cur += timedelta(days=1)
    return tuple(out)


def filter_groups(
    filters: dict | None, available: tuple[str, ...] = FILTER_COLS
) -> tuple[tuple[str, ...], ...]:
    """Normalize a user filter mapping into pinned-order lemma groups:
    one group per column (columns sorted), values sorted unique within a
    group. AND across groups, OR within. Raises on unindexed columns."""
    if not filters:
        return ()
    groups = []
    for col in sorted(filters):
        if col not in available:
            raise ValueError(
                f"filter column {col!r} is not indexed (available: "
                f"{sorted(available)})"
            )
        vals = filters[col]
        if col == "date":
            groups.append(_date_group(vals))
            continue
        if isinstance(vals, str):
            vals = [vals]
        if not vals:
            raise ValueError(f"filter column {col!r} has no values")
        groups.append(
            tuple(filter_lemma(col, v) for v in sorted(set(map(str, vals))))
        )
    return tuple(groups)


def _date_group(vals) -> tuple[str, ...]:
    """The "date" family's group: {"from": day, "to": day} → minimal
    cover; a day string or list of day strings → their day lemmas.
    Days are ISO 'YYYY-MM-DD' (validated); NULL ts never matches."""
    from datetime import date

    if isinstance(vals, dict):
        extra = set(vals) - {"from", "to"}
        if extra or "from" not in vals or "to" not in vals:
            raise ValueError(
                'date range filter is {"from": "YYYY-MM-DD", "to": '
                f'"YYYY-MM-DD"}}; got keys {sorted(vals)}'
            )
        return date_cover(vals["from"], vals["to"])
    if isinstance(vals, str):
        vals = [vals]
    if not vals:
        raise ValueError("filter column 'date' has no values")
    days = sorted(set(map(str, vals)))
    for d in days:
        date.fromisoformat(d)  # raises on malformed days
    return tuple(f"date{_SEP}d:{d}" for d in days)


def split_field_quals(
    query: str, available: tuple[str, ...] = FILTER_COLS
) -> tuple[str, dict]:
    """Lucene-style field qualifiers inside the query string:
    ``merge role:assistant`` ≡ ``search("merge", filters={"role":
    "assistant"})``. Pinned syntax (whole whitespace tokens only):

    - ``col:value`` — col must be an indexed filter column; repeated
      quals on one column OR together (the filter_groups semantics);
    - ``date:YYYY-MM-DD..YYYY-MM-DD`` — inclusive day range (the
      minimal-cover expansion); a range must be the column's only qual;
    - ``col:`` (empty value), ``-col:value`` (negated qual — filters
      are non-scoring INCLUDES; use ``-term`` for scoring exclusions)
      and an unknown ``word:...`` field prefix all raise — a typo'd
      field must not silently become a search term.

    Returns (query without the qual tokens, {col: value-or-list-or-
    range}) ready to merge into ``filters=``."""
    import re

    rest: list[str] = []
    out: dict[str, object] = {}
    for tok in query.split():
        body, neg = (tok[1:], True) if tok.startswith("-") else (tok, False)
        m = re.match(r"^([A-Za-z_][A-Za-z0-9_]*):(.*)$", body)
        if not m:
            rest.append(tok)
            continue
        col, val = m.group(1), m.group(2)
        if col not in available:
            raise ValueError(
                f"unknown field qualifier {col!r} (available: "
                f"{sorted(available)})"
            )
        if neg:
            raise ValueError(
                f"negated field qualifier {tok!r}: filters are "
                "non-scoring includes — use -term for exclusions"
            )
        if not val:
            raise ValueError(f"empty value in field qualifier {tok!r}")
        if col == "date" and ".." in val:
            frm, _, to = val.partition("..")
            if col in out:
                raise ValueError(
                    "a date range qualifier must be the only date: qual"
                )
            out[col] = {"from": frm, "to": to}
            continue
        if col in out:
            prev = out[col]
            if isinstance(prev, dict):
                raise ValueError(
                    "a date range qualifier must be the only date: qual"
                )
            out[col] = prev + [val] if isinstance(prev, list) else [prev, val]
        else:
            out[col] = val
    return " ".join(rest), out


def build_filter_flat(
    docs: DataFrame, cols: tuple[str, ...] = FILTER_COLS
) -> DataFrame:
    """docs → flat filter postings (lemma, doc_id, tf, scope, doc_len):
    one row per (doc, non-NULL attribute); the "date" family posts each
    non-NULL-ts doc under its day, month AND year lemmas (UTC — pinned
    session timezone) so range queries hit the minimal ``date_cover``.
    tf/doc_len are constant 1 — filter postings are never scored; the
    columns exist only so the stream feeds the SAME block encoder as
    term postings."""

    def _part(src: DataFrame, lemma_col) -> DataFrame:
        return src.select(
            lemma_col.alias("lemma"),
            "doc_id",
            F.lit(1).cast("long").alias("tf"),
            "scope",
            F.lit(1).cast("int").alias("doc_len"),
        )

    parts = []
    for c in cols:
        if c == "date":
            dated = docs.filter(F.col("ts").isNotNull())
            for tag, fmt in (
                ("d", "yyyy-MM-dd"), ("m", "yyyy-MM"), ("y", "yyyy")
            ):
                parts.append(_part(
                    dated,
                    F.concat(
                        F.lit(f"date{_SEP}{tag}:"),
                        F.date_format("ts", fmt),
                    ),
                ))
            continue
        parts.append(_part(
            docs.filter(F.col(c).isNotNull()),
            F.concat(F.lit(c + _SEP), F.col(c).cast("string")),
        ))
    return reduce(DataFrame.unionByName, parts)


def build_filter_blocks(
    docs: DataFrame, range_size: int, cols: tuple[str, ...] = FILTER_COLS
) -> DataFrame:
    """docs → compressed filter-posting blocks (POSTINGS schema), doc-
    range-sharded with the SAME ``range_size`` as the term postings so a
    query's filter blocks land in the same kernel groups as its term
    blocks."""
    from search_engine_spark.operators.compress import (
        build_postings_compressed,
    )

    return build_postings_compressed(
        build_filter_flat(docs, cols), range_size=range_size
    )
