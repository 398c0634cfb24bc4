"""Profile the bench build: where does the non-scaling time go?

Runs the exact bench build-worker pipeline at a given parallelism with
the Spark event log enabled, then parses the log into a timeline:

- per-job wall spans (and the GAPS between jobs = pure driver time:
  plan analysis, commit protocol, python-side orchestration),
- per-stage task concurrency (sum of task run time / stage span), which
  exposes stages that run at 1 task while the rest of the box idles.

Usage: python tools/build_profile.py [cpus]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH_DIR = os.path.join(REPO, ".bench")


def run_build(cpus: int) -> dict:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    import bench

    path = bench._corpus_path()
    out = os.path.join(BENCH_DIR, f"index_prof_c{cpus}")
    logdir = os.path.join(BENCH_DIR, "eventlog")
    os.makedirs(logdir, exist_ok=True)
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"profile_build_{cpus}")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", logdir)
        .config("spark.driver.memory", "16g")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            os.environ.get("ARROW_BATCH", "10000"),
        )
        .getOrCreate()
    )
    app_id = spark.sparkContext.applicationId
    transcripts = spark.read.parquet(path)
    n_turns = transcripts.count()
    from search_engine_spark.functions.udfs import tokenize_lemmatize_counts

    spark.range(cpus * 4, numPartitions=cpus).select(
        tokenize_lemmatize_counts(F.col("id").cast("string"))
    ).write.format("noop").mode("overwrite").save()

    from search_engine_spark.operators.build import (
        build_doc_stats,
        build_postings_flat,
        lemma_stats_from_blocks,
    )
    from search_engine_spark.operators.compress import (
        build_postings_compressed,
        shard_spec,
    )
    from search_engine_spark.operators.docs import build_docs

    marks = []

    def mark(name):
        marks.append((name, time.perf_counter()))

    t_begin = time.perf_counter()
    mark("t0")
    docs_tok = build_docs(transcripts, with_lemmas=True)
    docs_tok.write.mode("overwrite").parquet(f"{out}/docs")
    mark("docs_written")
    docs_r = spark.read.parquet(f"{out}/docs")

    from concurrent.futures import ThreadPoolExecutor

    def _postings_then_lemma_stats():
        pf = build_postings_flat(docs_r)
        blocks = build_postings_compressed(
            pf, range_size=shard_spec(n_turns, 65_536)
        )
        blocks.write.mode("overwrite").parquet(f"{out}/postings")
        mark("postings_written")
        lemma_stats_from_blocks(
            spark.read.parquet(f"{out}/postings")
        ).write.mode("overwrite").parquet(f"{out}/lemma_stats")
        mark("lemma_stats_written")

    def _doc_stats():
        build_doc_stats(docs_r).write.mode("overwrite").parquet(
            f"{out}/doc_stats"
        )
        mark("doc_stats_written")

    with ThreadPoolExecutor(2) as ex:
        futs = [ex.submit(_postings_then_lemma_stats), ex.submit(_doc_stats)]
        for f in futs:
            f.result()
    wall = time.perf_counter() - t_begin
    spark.stop()
    return {
        "cpus": cpus,
        "turns": n_turns,
        "wall": round(wall, 2),
        "marks": [(n, round(t - t_begin, 2)) for n, t in marks],
        "eventlog": os.path.join(logdir, app_id),
    }


def parse_log(path: str, cpus: int) -> dict:
    jobs = {}
    stages = {}
    task_spans = []
    import glob
    import io

    if os.path.isdir(path):
        path = glob.glob(os.path.join(path, "events_*"))[0]
    if path.endswith(".zstd"):
        import pyarrow as pa

        fh = io.TextIOWrapper(
            pa.CompressedInputStream(pa.OSFile(path, "rb"), "zstd")
        )
    else:
        fh = open(path)
    with fh:
        for line in fh:
            ev = json.loads(line)
            k = ev.get("Event")
            if k == "SparkListenerJobStart":
                jobs[ev["Job ID"]] = [ev["Submission Time"], None]
            elif k == "SparkListenerJobEnd":
                if ev["Job ID"] in jobs:
                    jobs[ev["Job ID"]][1] = ev["Completion Time"]
            elif k == "SparkListenerTaskEnd":
                ti = ev["Task Info"]
                task_spans.append((ti["Launch Time"], ti["Finish Time"]))
                sid = ev["Stage ID"]
                st = stages.setdefault(sid, [None, None, 0.0, 0, 0.0, 0, 0])
                st[2] += (ti["Finish Time"] - ti["Launch Time"]) / 1000.0
                st[3] += 1
                st[0] = min(st[0] or ti["Launch Time"], ti["Launch Time"])
                st[1] = max(st[1] or 0, ti["Finish Time"])
                tm = ev.get("Task Metrics") or {}
                st[4] += tm.get("JVM GC Time", 0) / 1000.0
                st[5] += tm.get("Memory Bytes Spilled", 0)
                st[6] += tm.get("Disk Bytes Spilled", 0)
    spans = sorted((s, e) for s, e in jobs.values() if e)
    if not spans:
        return {}
    t0, t1 = spans[0][0], max(e for _, e in spans)
    # merge job spans -> covered time; uncovered = driver-only gaps
    covered = 0
    cur_s, cur_e = spans[0]
    merged = []
    for s, e in spans[1:]:
        if s <= cur_e:
            cur_e = max(cur_e, e)
        else:
            merged.append((cur_s, cur_e))
            cur_s, cur_e = s, e
    merged.append((cur_s, cur_e))
    covered = sum(e - s for s, e in merged) / 1000.0
    wall = (t1 - t0) / 1000.0
    # task concurrency over the whole run
    total_task = sum(e - s for s, e in task_spans) / 1000.0
    # low-concurrency time: sweep-line over task spans
    events = sorted(
        [(s, 1) for s, _ in task_spans] + [(e, -1) for _, e in task_spans]
    )
    low_time = 0.0  # time with < cpus/2 tasks running, inside job spans
    one_time = 0.0
    prev, depth = None, 0
    for t, d in events:
        if prev is not None:
            dt = (t - prev) / 1000.0
            if depth <= max(1, cpus // 2):
                low_time += dt
            if depth <= 1:
                one_time += dt
        prev = t
        depth += d
    stage_rows = sorted(
        (
            (sid, round(st[2], 1), st[3],
             round((st[1] - st[0]) / 1000.0, 1),
             round(st[4], 1), round(st[5] / 1e6), round(st[6] / 1e6))
            for sid, st in stages.items()
        ),
        key=lambda r: -r[1],
    )[:12]
    return {
        "jobs_wall": round(wall, 1),
        "covered_by_jobs": round(covered, 1),
        "driver_gaps": round(wall - covered, 1),
        "n_jobs": len(spans),
        "total_task_sec": round(total_task, 1),
        "avg_concurrency": round(total_task / wall, 2),
        "time_at_le_half_cpus": round(low_time, 1),
        "time_at_le_1_task": round(one_time, 1),
        "top_stages (sid, task_sec, n_tasks, span, gc_sec, "
        "mem_spill_mb, disk_spill_mb)": stage_rows,
    }


if __name__ == "__main__":
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    r = run_build(cpus)
    print(json.dumps(r, indent=1))
    print(json.dumps(parse_log(r["eventlog"], cpus), indent=1))
