"""10x end-to-end scale rehearsal for the heaviest registry queries
(round-9 verdict item 6): materialize 1x/3x/10x unions of the input
parquet tables into a temp dir, run each query through the REAL
``__spark_entry__.queries()`` callables against the scaled dir, and
report per-query wall time plus the fitted scaling exponent
``alpha`` in ``t ~ n^alpha`` (log-log least squares over the sweep).
alpha near 1 = linear data scaling (the 100 TB claim); >= ~1.7 flags
a quadratic term that plan-shape review missed.

Copies get shifted ids (and slightly perturbed embeddings / suffixed
document text) so dedup-style queries see a genuinely larger corpus,
not m exact replicas of every row.

Usage: python tools/bench_scale_sweep.py [sf_dir] [multipliers...]
Default sf_dir /root/testdata/sf0.1, multipliers 1 3 10.
"""

from __future__ import annotations

import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

QUERIES = os.environ.get(
    "SCALE_SWEEP_QUERIES",
    "semantic_dedup_two_level_embeddings,"
    "corpus_prep_end_to_end,"
    "zorder_quantile_events,"
    "schema_match_distribution_orders_lineitem,"
    "lsh_tuning_documents",
).split(",")

# every table a swept query reads, with its id columns to shift
TABLES = {
    "embeddings": ["vec_id"],
    "documents": ["doc_id"],
    "events": ["event_id", "user_id"],
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey"],
}


def _scaled(spark, sf_dir: str, table: str, m: int, out_dir: str) -> int:
    src = spark.read.parquet(os.path.join(sf_dir, f"{table}.parquet"))
    n0 = src.count()
    parts = []
    for i in range(m):
        p = src
        for c in TABLES[table]:
            p = p.withColumn(c, F.col(c) + F.lit(i * n0))
        if table == "embeddings":
            p = p.withColumn(
                "embedding",
                F.transform("embedding", lambda x: x + F.lit(float(i)) * 0.001),
            )
        if table == "documents" and "text" in p.columns:
            # distinct suffix per copy: near-dup families stay families
            # without collapsing the copies into exact duplicates
            p = p.withColumn(
                "text", F.concat(F.col("text"), F.lit(f" copytag{i}"))
            )
        parts.append(p)
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    df.write.mode("overwrite").parquet(os.path.join(out_dir, f"{table}.parquet"))
    return n0 * m


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    mults = [int(x) for x in sys.argv[2:]] or [1, 3, 10]
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry

    qs = entry.queries()
    # warm-up: one untimed pass over the plain sf_dir so the 1x point
    # doesn't absorb JVM/codegen startup and bias alpha downward
    for q in QUERIES:
        qs[q](spark, sf_dir).collect()
    results: dict = {q: [] for q in QUERIES}
    sizes: dict = {}
    for m in mults:
        out_dir = tempfile.mkdtemp(prefix=f"scale_sweep_{m}x_")
        try:
            for t in TABLES:
                sizes[(t, m)] = _scaled(spark, sf_dir, t, m, out_dir)
            for q in QUERIES:
                t0 = time.monotonic()
                qs[q](spark, out_dir).collect()
                dt = time.monotonic() - t0
                results[q].append((m, dt))
                print(f"{q} @ {m}x: {dt:.2f}s", flush=True)
        finally:
            shutil.rmtree(out_dir, ignore_errors=True)
    print("\nquery,"
          + ",".join(f"t_{m}x" for m in mults) + ",alpha")
    for q in QUERIES:
        ts = results[q]
        xs = [math.log(m) for m, _ in ts]
        ys = [math.log(t) for _, t in ts]
        n = len(xs)
        mx, my = sum(xs) / n, sum(ys) / n
        denom = sum((x - mx) ** 2 for x in xs)
        alpha = (
            sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / denom
            if denom
            else float("nan")
        )
        print(
            q + "," + ",".join(f"{t:.2f}" for _, t in ts) + f",{alpha:.2f}"
        )


if __name__ == "__main__":
    main()
