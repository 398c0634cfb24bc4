"""spark-submit entry point for the checkpointed index build.

Cluster usage (north rule: "runs via spark-submit --py-files on
multi-executor clusters"):

    cd /root/repo && zip -r /tmp/engine.zip search_engine_spark oracle
    spark-submit --master <cluster> --py-files /tmp/engine.zip \
        tools/submit_build.py --input <transcripts parquet/iceberg path> \
        --out <index dir> --buckets 64 --docs-per-shard 65536

Local smoke:

    spark-submit --master 'local[8]' tools/submit_build.py \
        --input .bench/transcripts_50000_42.parquet --out /tmp/idx

Re-running with the same --out resumes from the checkpoint table.
No master/parallelism is hard-coded here — spark-submit owns deployment.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--buckets", type=int, default=8)
    ap.add_argument("--docs-per-shard", type=int, default=65_536)
    ap.add_argument("--run-id", default=None)
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pyspark.sql import SparkSession

    from search_engine_spark.plans.job import IndexBuildJob

    spark = (
        SparkSession.builder.appName("search_engine_spark.build")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    job = IndexBuildJob(
        spark,
        args.input,
        args.out,
        n_buckets=args.buckets,
        docs_per_shard=args.docs_per_shard,
        run_id=args.run_id,
    )
    summary = job.run()
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
