"""Local replica of the driver's correctness gate.

Runs every __spark_entry__.queries()[name] on Spark and the matching
oracle_sql()[name] on DuckDB over the same sf dir, then compares
row count, schema (column names), and order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)

    def cell(v):
        # DuckDB list columns arrive as numpy arrays; normalize to Python
        # lists BEFORE the None/NaN test (ndarray truth-value ambiguity)
        if hasattr(v, "tolist") and not isinstance(v, (str, bytes)):
            v = v.tolist()
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "<null>"
        if isinstance(v, float):
            return f"{v:.6f}"
        if isinstance(v, (list, tuple)):
            return "[" + ",".join(cell(x) for x in v) + "]"
        return str(v)

    out = df.apply(lambda col: col.map(cell))
    out = out.sort_values(by=list(out.columns)).reset_index(drop=True)
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows (no oracle, rows-only)")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            failures.append(name)
            continue
        sc, oc = canon(sdf), canon(odf)
        if list(sc.columns) != list(oc.columns):
            print(f"FAIL  {name}: columns spark={list(sc.columns)} oracle={list(oc.columns)}")
            failures.append(name)
            continue
        if len(sc) != len(oc):
            print(f"FAIL  {name}: rowcount spark={len(sc)} oracle={len(oc)}")
            failures.append(name)
            continue
        if not sc.equals(oc):
            diff_mask = (sc != oc).any(axis=1)
            n_bad = int(diff_mask.sum())
            print(f"FAIL  {name}: {n_bad}/{len(sc)} rows differ; first diffs:")
            bad = diff_mask[diff_mask].index[:3]
            for i in bad:
                print(f"  spark : {sc.loc[i].to_dict()}")
                print(f"  oracle: {oc.loc[i].to_dict()}")
            failures.append(name)
            continue
        print(f"OK    {name}: {len(sc)} rows")
    print()
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        return 1
    print("all queries match their oracles")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
