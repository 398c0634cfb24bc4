"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB over
the same sf dir; compare row-count + column names + values exactly.

Usage: python tools/check_contract.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def duck_con(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, spark_df, duck_df) -> list[str]:
    problems = []
    a, b = normalize(spark_df), normalize(duck_df)
    if list(a.columns) != list(b.columns):
        problems.append(f"columns: spark={list(a.columns)} duck={list(b.columns)}")
        return problems
    if len(a) != len(b):
        problems.append(f"rows: spark={len(a)} duck={len(b)}")
        return problems
    for c in a.columns:
        av, bv = a[c], b[c]
        try:
            if av.dtype.kind == "f" or bv.dtype.kind == "f":
                import numpy as np

                af = av.astype(float).to_numpy()
                bf = bv.astype(float).to_numpy()
                if not np.array_equal(af, bf, equal_nan=True):
                    d = np.nanmax(np.abs(af - bf))
                    problems.append(f"col {c}: max float diff {d}")
            else:
                if not av.astype(str).equals(bv.astype(str)):
                    n = (av.astype(str) != bv.astype(str)).sum()
                    problems.append(f"col {c}: {n} value mismatches")
        except Exception as ex:
            problems.append(f"col {c}: compare error {ex}")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import __spark_entry__ as e
    from search_engine_spark.sources.session import get_spark

    spark = get_spark("check_contract", shuffle_partitions=8)
    con = duck_con(sf_dir)
    qs, osql = e.queries(), e.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
            ddf = con.sql(osql[name]).df()
            problems = compare(name, sdf, ddf)
        except Exception as ex:
            problems = [f"EXCEPTION {type(ex).__name__}: {str(ex)[:400]}"]
        status = "OK " if not problems else "FAIL"
        print(f"{status} {name}" + ("" if not problems else f"  {problems}"))
        if problems:
            failed.append(name)
    print(f"\n{len(qs) - len(failed)}/{len(qs)} queries match")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
