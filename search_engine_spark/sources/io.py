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
