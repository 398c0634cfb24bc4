"""Physical-plan audit over every contract query: the plan-quality
checks a scale review performs by hand — pushed filters, column-pruned
scans, exchange (shuffle) counts, whole-stage-codegen coverage, and the
repo-wide ban on unpartitioned windows — swept across all registered
queries and emitted as one JSON line per query plus a summary.

Usage: python tools/plan_audit.py [sf_dir] [--fail-on-window]

The unpartitioned-window check is the hard gate (CLAUDE.md: a constant
or missing partitionBy folds to a single-partition WindowExec — the
round-1 scale killer class). Everything else is evidence, not a gate:
a query legitimately carries N exchanges when it aggregates N times.
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def audit_plan(plan: str) -> dict:
    # Window specs print as e.g.
    #   Window [sum(x) ... windowspecdefinition(part, ord, ...)], [part], [ord]
    # An UNPARTITIONED window prints an empty partition list: "], [], ["
    # after the operator name; match conservatively on the Window line.
    win_lines = [
        ln for ln in plan.splitlines() if re.search(r"\bWindow(Group)?\b", ln)
    ]
    unpart = [
        ln.strip()[:160]
        for ln in win_lines
        if re.search(r"\],\s*\[\s*\],\s*\[", ln)
    ]
    return {
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "broadcast_joins": len(re.findall(r"BroadcastHashJoin", plan)),
        "sortmerge_joins": len(re.findall(r"SortMergeJoin", plan)),
        "wholestage_spans": len(re.findall(r"WholeStageCodegen", plan)),
        "pushed_filter_scans": len(
            re.findall(r"PushedFilters: \[[^\]]", plan)
        ),
        "scans": len(re.findall(r"FileScan", plan)),
        "windows": len(win_lines),
        "unpartitioned_windows": unpart,
        "take_ordered": len(re.findall(r"TakeOrderedAndProject", plan)),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith(
        "--") else "/root/testdata/sf0.01"
    fail_on_window = "--fail-on-window" in sys.argv

    from search_engine_spark.contract import spark_queries
    from search_engine_spark.sources.session import get_spark

    spark = get_spark("plan_audit")
    spark.sparkContext.setLogLevel("ERROR")
    rows, bad = [], []
    for name, fn in sorted(spark_queries().items()):
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # audit must cover every query or say why
            rows.append({"query": name, "error": str(e)[:200]})
            bad.append(name)
            continue
        rows.append({"query": name, **audit_plan(plan)})
    print(json.dumps({"sf_dir": sf_dir, "queries": rows}, indent=1))

    unpart = [
        (r["query"], r["unpartitioned_windows"])
        for r in rows
        if r.get("unpartitioned_windows")
    ]
    n_ex = sum(r.get("exchanges", 0) for r in rows)
    print(
        f"\n{len(rows)} queries audited; {n_ex} exchanges total; "
        f"{len(unpart)} with unpartitioned windows; {len(bad)} errored",
        file=sys.stderr,
    )
    for q, lines in unpart:
        print(f"  UNPARTITIONED WINDOW in {q}: {lines[0]}", file=sys.stderr)
    if bad:
        print(f"  errored: {bad}", file=sys.stderr)
        sys.exit(2)
    if fail_on_window and unpart:
        sys.exit(1)


if __name__ == "__main__":
    main()
