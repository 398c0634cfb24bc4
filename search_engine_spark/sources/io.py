"""Table IO abstraction: Iceberg catalog when available, parquet fallback.

SURVEY.md §7.4 item 5: the production deployment reads/writes Iceberg
tables (snapshot commits = resume points); this sandbox has no Iceberg
jars, so paths fall back to plain parquet directories. Everything above
this module is format-agnostic: schemas are identical either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def is_catalog_table(name_or_path: str) -> bool:
    """Heuristic: catalog table names are dotted identifiers, not paths."""
    return "/" not in name_or_path and not name_or_path.startswith("file:")


def read_table(spark: SparkSession, name_or_path: str) -> DataFrame:
    if is_catalog_table(name_or_path):
        return spark.read.table(name_or_path)
    return spark.read.parquet(name_or_path)


def write_table(df: DataFrame, name_or_path: str, mode: str = "overwrite") -> None:
    if is_catalog_table(name_or_path):
        df.writeTo(name_or_path).createOrReplace()
    else:
        df.write.mode(mode).parquet(name_or_path)


def read_transcripts(
    spark: SparkSession,
    path: str,
    fmt: str | None = None,
) -> DataFrame:
    """Ingest the transcripts table from any of the supported batch
    formats, normalized to the pinned ``schemas.TRANSCRIPTS`` shape
    (column order, names, types — including the microsecond timestamp).

    ``fmt=None`` infers from the extension (.parquet/.orc/.json/.jsonl/
    .csv — a directory defaults to parquet, Spark's native layout).
    JSON/CSV read with the EXPLICIT transcripts schema, never inference:
    at 100 TB a schema-inference pass is a full extra scan, and a
    drifting inferred type (ts as string) would poison every downstream
    pin. CSV expects a header and reads timestamps as
    ``yyyy-MM-dd HH:mm:ss[.SSSSSS]``. ORC/parquet are the columnar
    production paths (predicate pushdown + column pruning at the scan);
    JSON/CSV are interchange paths — ingest once, write parquet, index
    from that."""
    from search_engine_spark.schemas import TRANSCRIPTS

    if fmt is None:
        low = path.lower().rstrip("/")
        for ext, f in ((".parquet", "parquet"), (".orc", "orc"),
                       (".jsonl", "json"), (".json", "json"),
                       (".csv", "csv")):
            if low.endswith(ext):
                fmt = f
                break
        else:
            fmt = "parquet"
    fmt = fmt.lower()
    if fmt == "parquet":
        df = spark.read.schema(TRANSCRIPTS).parquet(path)
    elif fmt == "orc":
        df = spark.read.schema(TRANSCRIPTS).orc(path)
    elif fmt == "json":
        df = spark.read.schema(TRANSCRIPTS).json(path)
    elif fmt == "csv":
        df = (
            spark.read.schema(TRANSCRIPTS)
            .option("header", "true")
            .option("timestampFormat", "yyyy-MM-dd HH:mm:ss[.SSSSSS]")
            .csv(path)
        )
    else:
        raise ValueError(f"unsupported transcripts format: {fmt}")
    # pinned column order regardless of source column order
    return df.select(*[f.name for f in TRANSCRIPTS.fields])
